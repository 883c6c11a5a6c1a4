package graft
import org.apache.spark.sql.SparkSession

/** Scratch runner for local iteration (not part of the driver contract). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // t1 smoke path: flagship entry on sf0.001, driver checks rows > 0
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()}")
    df.show(5, false)
    spark.stop()
  }
}
