package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Prefix-filtered weighted APSS vs a driver-side brute-force cosine,
  * and the no-cartesian plan pin.
  */
class ApssSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val docs = Seq(
    0L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda",
    2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    3L -> "one two three four five six seven eight nine ten",
    4L -> "one two three four five xx yy zz alpha beta gamma",
    5L -> "completely unrelated words in this document only here")

  /** Brute tf-idf trigram cosine over all pairs, double arithmetic in
    * the same shapes (rational idf, token-sorted folds).
    */
  private def brute(ds: Seq[(Long, String)], theta: Double): Set[(Long, Long)] = {
    val n = ds.size.toDouble
    val feats = ds.map { case (id, t) =>
      val w = t.split(' ')
      val grams = (0 until w.length - 2).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
      id -> grams.groupBy(identity).map { case (g, o) => g -> o.size.toDouble }
    }.toMap
    val dfm = feats.values.flatMap(_.keys).groupBy(identity).map { case (g, o) => g -> o.size.toDouble }
    val u = feats.map { case (id, m) =>
      val w = m.map { case (g, tf) => g -> tf * (n / dfm(g)) }
      val nrm = math.sqrt(w.toSeq.sortBy(_._1).map(x => x._2 * x._2).sum)
      id -> w.map { case (g, x) => g -> x / nrm }
    }
    (for {
      a <- ds.map(_._1); b <- ds.map(_._1) if a < b
      cos = u(a).toSeq.sortBy(_._1).map { case (g, ua) => ua * u(b).getOrElse(g, 0.0) }.sum
      if cos >= theta
    } yield (a, b)).toSet
  }

  test("matches brute force at several thresholds") {
    import spark.implicits._
    val ddf = docs.toDF("doc_id", "text")
    for (theta <- Seq(0.3, 0.6, 0.9)) {
      val got = Apss.tfidfCosineSelfJoin(ddf, theta)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(docs, theta), s"theta=$theta")
    }
  }

  test("docs with fewer than 3 words form no trigram and cannot crash the join") {
    import spark.implicits._
    // 1- and 2-word docs: sequence(1, size-2) would be DESCENDING and
    // element_at(ws, 0) would throw without the size guard; the brute
    // reference simply gives them zero grams
    val short = docs ++ Seq(6L -> "solo", 7L -> "two words")
    val ddf = short.toDF("doc_id", "text")
    val got = Apss.tfidfCosineSelfJoin(ddf, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = {
      val n = short.size.toDouble
      // brute() derives n from ds.size, which must count short docs too
      // (idf is over ALL documents) — so inline the gram-capable subset
      val gramDocs = short.filter(_._2.split(' ').length >= 3)
      val feats = gramDocs.map { case (id, t) =>
        val w = t.split(' ')
        val grams = (0 until w.length - 2).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
        id -> grams.groupBy(identity).map { case (g, o) => g -> o.size.toDouble }
      }.toMap
      val dfm = feats.values.flatMap(_.keys).groupBy(identity).map { case (g, o) => g -> o.size.toDouble }
      val u = feats.map { case (id, m) =>
        val w = m.map { case (g, tf) => g -> tf * (n / dfm(g)) }
        val nrm = math.sqrt(w.toSeq.sortBy(_._1).map(x => x._2 * x._2).sum)
        id -> w.map { case (g, x) => g -> x / nrm }
      }
      (for {
        a <- gramDocs.map(_._1); b <- gramDocs.map(_._1) if a < b
        cos = u(a).toSeq.sortBy(_._1).map { case (g, ua) => ua * u(b).getOrElse(g, 0.0) }.sum
        if cos >= 0.6
      } yield (a, b)).toSet
    }
    assert(got == expected)
  }

  test("exact duplicates score 1.0 and the plan has no cartesian product") {
    import spark.implicits._
    val ddf = docs.toDF("doc_id", "text")
    val out = Apss.tfidfCosineSelfJoin(ddf, 0.99)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoop"))
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((0L, 2L, 1.0)))
  }
}
