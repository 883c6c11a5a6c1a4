package graft

import org.apache.spark.sql.SparkSession

/** Scratch measurement runner for local iteration (not part of the
  * driver contract): per-change wall-clock + intermediate cardinality
  * probes for the operator currently being tuned.
  *
  * Current probe: the two 100×-tier OOM fixes (q114's merge-hint spill
  * path; q137's spill-aware SA partition count) under the rehearsal
  * child's session config — single timed runs at scale/sf10.
  */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, dir: String): Unit = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"[scratch] $name @ $dir: ${(System.nanoTime() - t0) / 1e9}%.1f s OK")
      } catch { case e: Throwable =>
        println(s"[scratch] $name @ $dir FAILED: ${e.getMessage.take(200)}")
      }
    }
    time("q114_fuzzy_lookup", "scale/sf10")
    time("q137_suffix_array", "scale/sf10")
    spark.stop()
  }
}
