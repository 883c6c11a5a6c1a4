package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-preparation operators (q42–q45). The DuckDB oracle gate pins
  * exact values; these tests pin the operator PROPERTIES that the oracle
  * can't see — determinism across runs, stratification direction, and
  * ranking shape.
  */
class CorpusQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q42 sampling is deterministic, stratified, and fully split") {
    val a = CorpusQueries.q42(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val b = CorpusQueries.q42(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(a.nonEmpty && a.sameElements(b)) // content-keyed, no RNG
    assert(a.forall(r => Set("train", "val", "test").contains(r._3)))
    // per-stratum rates: en keeps 16/256, others 32/256 — so the en
    // sample fraction must be below the non-en fraction.
    val total = graft.Tables.documents(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val enRate = kept.getOrElse("en", 0.0) / total("en")
    val otherRate = (kept - "en").values.sum /
      (total - "en").values.sum.toDouble
    assert(enRate < otherRate,
      s"en rate $enRate should be below non-en rate $otherRate")
  }

  test("q45 vocabulary is df-descending with deterministic ties") {
    val rows = CorpusQueries.q45(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.forall(_._2 <= nDocs)) // df counts docs, not occurrences
    rows.sliding(2).foreach { case Array((t1, d1), (t2, d2)) =>
      assert(d1 > d2 || (d1 == d2 && t1 < t2))
    case _ => }
  }

  test("q46 puts every member of a near-dup cluster in one split") {
    val rows = CorpusQueries.q46(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    // one split per cluster — the leakage guarantee
    rows.groupBy(_._2).values.foreach { members =>
      assert(members.map(_._3).distinct.length == 1)
    }
    // singletons (cluster_id == doc_id) get exactly their q42 split
    val q42Splits = CorpusQueries.q42(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val singletons = rows.filter(r => r._1 == r._2)
    assert(singletons.nonEmpty)
    singletons.foreach { case (id, _, split) =>
      q42Splits.get(id).foreach(s => assert(s == split))
    }
  }

  test("PrefixSum matches a single-partition window over any partition count") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i % 7 + 1)).toDF("id", "v")
    val expected = df.withColumn("cum",
        sum("v").over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    for (parts <- Seq(1, 3, 32, 100)) {
      val got = graft.operators.PrefixSum
        .withRunningTotal(df, "id", "v", "cum", parts)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(got == expected, s"numPartitions=$parts")
    }
  }

  test("PrefixSum counts NULL value cells as zero") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L))).toDF("id", "v")
    val got = graft.operators.PrefixSum
      .withRunningTotal(df, "id", "v", "cum", 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(1L -> 5L, 2L -> 5L, 3L -> 12L))
  }

  test("q48 chunks tile the corpus: offsets contiguous, chunk ids consistent") {
    val rows = CorpusQueries.q48(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((_, n1, s1, _, _), (_, _, s2, _, _)) => assert(s2 == s1 + n1)
      case _ =>
    }
    rows.foreach { case (_, n, s, first, last) =>
      assert(first == s / 2048 && last == (s + n - 1) / 2048 && first <= last)
    }
  }

  test("q49 mixing weights: shares sum to 1, weights equalize tokens") {
    val rows = CorpusQueries.q49(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    val k = rows.length
    // weight_i * share_i == 1/k: weighted sampling equalizes token mass
    rows.foreach { case (_, _, share, w) =>
      assert(math.abs(w * share - 1.0 / k) < 1e-12)
    }
  }

  test("q44 repetition bounds: distinct <= total, max freq consistent") {
    val rows = CorpusQueries.q44(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, d, f) =>
      assert(d <= n && f >= 1 && f <= n - d + 1)
    }
  }
}
