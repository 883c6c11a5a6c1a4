package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Incremental CC ≡ full recompute on crafted deltas: cluster merges,
  * chains through new nodes, a new node becoming the min label, and
  * the untouched-cluster invariant.
  */
class IncrementalCCSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def run(oldEdges: Seq[(Long, Long)], delta: Seq[(Long, Long)],
                  oldVerts: Seq[Long], newVerts: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    def edf(e: Seq[(Long, Long)]): DataFrame =
      if (e.isEmpty) Seq.empty[(Long, Long)].toDF("src", "dst")
      else e.toDF("src", "dst")
    val old = Dedup.connectedComponents(edf(oldEdges), oldVerts.toDF("id"))
    val got = IncrementalCC.merge(old, edf(delta), newVerts.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Dedup.connectedComponents(
        edf(oldEdges ++ delta), (oldVerts ++ newVerts).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"incremental diverged from full recompute")
    got
  }

  test("delta edge merges two existing clusters; bystander untouched") {
    val got = run(
      oldEdges = Seq((1L, 2L), (5L, 6L), (8L, 9L)),
      delta = Seq((2L, 5L)),
      oldVerts = Seq(1L, 2L, 5L, 6L, 8L, 9L), newVerts = Nil)
    assert(got(6L) == 1L && got(9L) == 8L)
  }

  test("new node chains three clusters together") {
    val got = run(
      oldEdges = Seq((1L, 2L), (5L, 6L), (8L, 9L)),
      delta = Seq((2L, 50L), (50L, 5L), (50L, 8L)),
      oldVerts = Seq(1L, 2L, 5L, 6L, 8L, 9L), newVerts = Seq(50L))
    assert(Seq(1L, 2L, 5L, 6L, 8L, 9L, 50L).forall(got(_) == 1L))
  }

  test("a new node with the smallest id becomes the label") {
    val got = run(
      oldEdges = Seq((10L, 11L)),
      delta = Seq((0L, 10L)),
      oldVerts = Seq(10L, 11L), newVerts = Seq(0L))
    assert(got(0L) == 0L && got(10L) == 0L && got(11L) == 0L)
  }

  test("unlinked new nodes come out as singletons") {
    val got = run(
      oldEdges = Seq((1L, 2L)),
      delta = Nil,
      oldVerts = Seq(1L, 2L, 3L), newVerts = Seq(7L))
    assert(got(7L) == 7L && got(3L) == 3L && got(2L) == 1L)
  }

  test("delta-only edges among brand-new nodes") {
    val got = run(
      oldEdges = Seq((1L, 2L)),
      delta = Seq((20L, 21L), (21L, 22L)),
      oldVerts = Seq(1L, 2L), newVerts = Seq(20L, 21L, 22L))
    assert(got(22L) == 20L && got(2L) == 1L)
  }
}
