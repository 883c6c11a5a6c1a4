package graft.queries

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q32's re-aggregation rewrite must agree with GROUP BY ROLLUP even when
  * group keys are NULL: the oracle COALESCEs NULLs to 'ALL' at every level,
  * so the rewrite has to do the same on its fine/by-flag levels. The sf
  * testdata has no NULL keys, so this parity is only observable here.
  */
class RollupNullKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q32 matches ROLLUP+COALESCE on NULL group keys") {
    import spark.implicits._
    val dir = Files.createTempDirectory("rollup-null").toFile.getAbsolutePath
    val rows = Seq(
      ("A", "F", 100.0, 0.10),
      ("A", null, 200.0, 0.00),
      (null, "O", 300.0, 0.05),
      (null, null, 400.0, 0.20),
      ("B", "F", 500.0, 0.15))
    rows.toDF("l_returnflag", "l_linestatus", "l_extendedprice", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")

    val got = RelationalQueries.q32(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        r.getLong(3)))
      .toSeq.sorted

    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("li_null")
    val expected = spark.sql(
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        | COALESCE(l_linestatus, 'ALL') AS linestatus,
        | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(6,4)) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n
        |FROM li_null GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        r.getLong(3)))
      .toSeq.sorted

    assert(got == expected && got.nonEmpty)
  }
}
