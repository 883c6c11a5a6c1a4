package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LabelProp: the determinism contract q153's exact oracle depends on —
  * synchronous rounds, clamped seeds, majority with ties to the
  * smallest label — pinned on hand-checkable graphs, plus partition
  * invariance and a full driver-side replay over the real near-dup
  * graph.
  */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  import scala.jdk.CollectionConverters._

  private def edgesDf(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toSeq.toDF("src", "dst")
  }
  private def seedsDf(rows: (Long, Int)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("v", "label")
  }
  private def run(edges: org.apache.spark.sql.DataFrame,
                  seeds: org.apache.spark.sql.DataFrame,
                  iters: Int): Map[Long, Int] =
    LabelProp.propagate(edges, seeds, iters).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("chain spreads one hop per round; equidistant tie goes to the smaller label") {
    val e = edgesDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val seeds = seedsDf((1L, 10), (5L, 20))
    assert(run(e, seeds, 1) == Map(1L -> 10, 5L -> 20, 2L -> 10, 4L -> 20))
    // round 2: node 3 sees 2(10) and 4(20) — one vote each, min label wins
    assert(run(e, seeds, 2) ==
      Map(1L -> 10, 5L -> 20, 2L -> 10, 4L -> 20, 3L -> 10))
  }

  test("majority beats the tie rule; seeds are clamped") {
    // node 9 has three labeled neighbors: two 7s, one 3 — majority 7
    // even though 3 < 7. Seed 2 keeps label 99 despite neighbors.
    val e = edgesDf((9L, 1L), (9L, 2L), (9L, 3L), (2L, 1L))
    val seeds = seedsDf((1L, 7), (3L, 7), (2L, 99))
    val got = run(e, seeds, 2)
    assert(got(9L) == 7)
    assert(got(2L) == 99, "seed must never be re-labeled")
  }

  test("propagation is partition-invariant") {
    val emb = graft.Tables.embeddings(spark, dir)
    val pairs = Dedup.embedNearDup(emb, "vec_id", "embedding", 0.45)
      .select(col("vec_a").as("src"), col("vec_b").as("dst"))
    val seeds = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("v"), col("label"))
    val a = run(pairs, seeds, 3)
    val b = run(pairs.repartition(17), seeds.repartition(5), 3)
    assert(a == b)
  }

  test("q153 agrees with a driver-side synchronous replay on the real graph") {
    val emb = graft.Tables.embeddings(spark, dir)
    val pairs = Dedup.embedNearDup(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq).toMap
    val seeds = emb.filter(col("vec_id") % 5 === 0).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    var labels = seeds
    (1 to 3).foreach { _ =>
      val prev = labels
      val updated = adj.keys.filterNot(seeds.contains).flatMap { v =>
        val votes = adj(v).flatMap(prev.get)
        if (votes.isEmpty) None
        else {
          val counted = votes.groupBy(identity).view.mapValues(_.size).toSeq
          Some(v -> counted.minBy { case (l, c) => (-c, l) }._1)
        }
      }.toMap
      labels = seeds ++ updated
    }
    val got = graft.queries.EmbeddingQueries.q153(spark, dir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)), r.getString(2)))
    got.foreach { case (v, l, status) =>
      assert(l == labels.get(v), s"vec $v: got $l want ${labels.get(v)}")
      val wantStatus =
        if (v % 5 == 0) "seed"
        else if (labels.contains(v)) "propagated" else "unlabeled"
      assert(status == wantStatus, s"vec $v status")
    }
    assert(got.map(_._1).toSet == emb.collect().map(_.getLong(0)).toSet)
    // the graph genuinely propagates something at this SF
    assert(got.exists(_._3 == "propagated"), "no propagation happened")
  }
}
