package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Unit cases for the frequency-compressed exact median/MAD beyond the
  * q119 oracle: percentile_disc rank on even counts, a constant group
  * (MAD = 0, everything equal to the median), and the strict `>` on
  * the k·MAD outlier cut.
  */
class RobustStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(String, Long)], k: Int = 3) = {
    import spark.implicits._
    RobustStats.groupedMedianMad(rows.toDF("g", "v"), "g", "v", k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
  }

  test("odd and even counts use the ceil(n/2) disc rank") {
    // odd: median of 1,2,100 is 2; deviations 1,0,98 -> mad 1
    // even: disc median of 1,2,3,100 is the rank-2 element = 2;
    //       deviations 1,0,1,98 -> disc mad at rank 2 = 1; only 98 > 3
    val got = run(Seq(("a", 1L), ("a", 2L), ("a", 100L),
      ("b", 1L), ("b", 2L), ("b", 3L), ("b", 100L)))
    assert(got == Seq(("a", 3L, 2L, 1L, 1L), ("b", 4L, 2L, 1L, 1L)))
  }

  test("constant group: mad 0, no outliers despite strict cut") {
    val got = run(Seq.fill(5)(("c", 7L)))
    assert(got == Seq(("c", 5L, 7L, 0L, 0L)))
  }

  test("outlier cut is strict: |v-med| == k*mad is NOT an outlier") {
    // values 0,10,20: median 10, deviations 10,0,10 -> mad 10
    // with k=1 the deviations equal k*mad exactly -> zero outliers
    val got = run(Seq(("d", 0L), ("d", 10L), ("d", 20L)), k = 1)
    assert(got == Seq(("d", 3L, 10L, 10L, 0L)))
  }
}
