package graft
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Scratch runner for local iteration (not part of the driver contract). */
object Dev {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val small = Tables.documents(spark, "/root/testdata/sf0.001")
    time("warmup_small")(println(Dedup.minhashLsh(small, "doc_id", "text", 3, 0.7).count()))
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    time("q25_after_small_warm")(println(Dedup.minhashLsh(docs, "doc_id", "text", 3, 0.7).count()))
    time("q25_again")(println(Dedup.minhashLsh(docs, "doc_id", "text", 3, 0.7).count()))
    spark.stop()
  }
}
