package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Unit cases for the one-pass profiler beyond the q109 oracle:
  * null accounting, numeric (not lexical) extremes, and the
  * approximate-distinct scale path.
  */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("profile counts nulls, orders extremes numerically, measures length") {
    import spark.implicits._
    val df = Seq(
      (Some(9L), Some("bb")), (Some(10L), None),
      (None, Some("a")), (Some(2L), Some("bb")))
      .toDF("num", "str")
    val rows = Profile.profile(df, Seq("num", "str")).collect()
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    val num = byCol("num")
    assert(num.getLong(1) == 4 && num.getLong(2) == 3 && num.getLong(3) == 3)
    // numeric min/max: 2 and 10 (lexical would give "10" as min)
    assert(num.getString(4) == "2" && num.getString(5) == "10")
    val str = byCol("str")
    assert(str.getLong(2) == 3 && str.getLong(3) == 2)
    assert(str.getString(4) == "a" && str.getString(5) == "bb")
    // avg_len over non-null strings: (2+1+2)/3
    assert(math.abs(str.getDouble(6) - 5.0 / 3.0) < 1e-12)
  }

  test("exact=false (HLL) stays within its documented error on distincts") {
    import spark.implicits._
    val df = (1 to 5000).map(i => i % 997).toDF("k")
    val nd = Profile.profile(df, Seq("k"), exact = false)
      .collect()(0).getLong(3)
    assert(math.abs(nd - 997.0) / 997.0 < 0.05, s"approx distinct $nd vs 997")
  }
}
