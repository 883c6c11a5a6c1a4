package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement runner for local iteration (not part of the
  * driver contract): per-change wall-clock + intermediate cardinality
  * probes for the operator currently being tuned.
  */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def run(name: String, d: String): Unit =
      SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, dir)
    def build(kc: Int): Unit =
      graft.operators.SuffixArray.build(docs, startKeyChars = kc)
        .write.format("noop").mode("overwrite").save()
    build(32) // warm
    for (i <- 1 to 2; kc <- Seq(32, 64, 128))
      time(s"SA build k0=$kc pass$i")(build(kc))
    spark.stop()
  }
}
