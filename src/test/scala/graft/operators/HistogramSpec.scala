package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Equi-depth invariants beyond the q115 oracle: balanced counts,
  * contiguous coverage, and deterministic tie handling at a boundary.
  */
class HistogramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("buckets are balanced, contiguous, and cover all rows") {
    import spark.implicits._
    val df = (1 to 103).map(i => (i * 7 % 103, i.toLong)).toDF("v", "id")
    val h = Histogram.equiDepth(df, "v", "id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(h.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(h.map(_._2).sum == 103)
    // depth within 1 of n/B
    assert(h.forall(b => math.abs(b._2 - 103.0 / 4) <= 1))
    // ranges are ordered and non-overlapping
    h.sliding(2).foreach { case Array(a, b) => assert(a._4 <= b._3) }
  }

  test("ties straddling a boundary split deterministically by tiebreaker") {
    import spark.implicits._
    // 8 identical values, 4 buckets: every bucket must get exactly 2
    val df = (1L to 8L).map(id => (42, id)).toDF("v", "id")
    val h = Histogram.equiDepth(df, "v", "id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(h.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L)))
  }
}
