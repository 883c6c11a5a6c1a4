package graft
import org.apache.spark.sql.SparkSession

/** Scratch runner for local iteration (not part of the driver contract). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q01_pricing_summary", "q02_revenue_by_nation",
        "q05_incremental_scan", "q08_semi_join", "q16_hourly_rollup")) {
      println(s"==== $name")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
