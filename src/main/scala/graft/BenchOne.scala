package graft
import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query: `runMain graft.BenchOne <name> [sfDir]`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (p <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      graft.operators.TransientPersists.releaseAll()
      println(f"[bench] $name pass$p ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
