package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Negative cases for the data-contract audit: every declared
  * constraint must actually catch its violation, with the exact
  * fractional metric.
  */
class AuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def report(rows: Seq[(java.lang.Long, java.lang.Long, String, java.lang.Double)],
                     custKeys: Seq[Long]): Map[String, (Double, Boolean)] = {
    import spark.implicits._
    val o = rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val c = custKeys.toDF("c_custkey")
    Audit.ordersContract(o, c).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
  }

  test("clean frame passes every constraint at metric 1.0") {
    val rep = report(
      Seq((1L, 10L, "O", 5.0), (2L, 11L, "F", 6.0)), Seq(10L, 11L))
    assert(rep("row_count") == ((2.0, true)))
    Seq("completeness", "uniqueness", "domain", "range", "ref_integrity")
      .foreach(k => assert(rep(k) == ((1.0, true)), k))
  }

  test("each corruption is caught with the exact metric") {
    // 4 rows: null custkey; duplicate orderkey; bad status; price out of
    // range; custkey 99 missing from the dimension
    val rep = report(
      Seq((1L, 10L, "O", 5.0),
        (1L, null, "X", 5.0),
        (2L, 99L, "F", -1.0),
        (3L, 10L, "P", 2000000.0)),
      Seq(10L))
    assert(rep("completeness") == ((3.0 / 4, false)))
    assert(rep("uniqueness") == ((3.0 / 4, false)))
    assert(rep("domain") == ((3.0 / 4, false)))
    assert(rep("range") == ((2.0 / 4, false)))
    // null custkey rows can't match the dimension either: 2 of 4 resolve
    assert(rep("ref_integrity") == ((2.0 / 4, false)))
    assert(rep("row_count") == ((4.0, true)))
  }
}
