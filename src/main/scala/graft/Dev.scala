package graft
import org.apache.spark.sql.SparkSession

/** Scratch runner for local iteration (not part of the driver contract).
  * Edit freely: point it at whatever flow is under verification, run with
  * `sbt "runMain graft.Dev"` (see .claude/skills/verify/SKILL.md).
  */
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
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()}")
    spark.stop()
  }
}
