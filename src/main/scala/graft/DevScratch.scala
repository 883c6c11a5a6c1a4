package graft

import org.apache.spark.sql.SparkSession

/** Scratch measurement runner for local iteration (not part of the
  * driver contract): per-change wall-clock + intermediate cardinality
  * probes for the operator currently being tuned.
  *
  * Current probe: the round-11 q110 regression replay — three headline
  * passes of the SA family at sf0.1 (what leaves checkpoints behind),
  * then q110 at the 10× tier, with and without the clearCaches
  * boundary Bench now runs.
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def run(name: String, d: String): Unit =
      SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
    val sf = "/root/testdata/sf0.1"
    for (p <- 1 to 3) {
      time(s"q137 pass$p")(run("q137_suffix_array", sf))
      time(s"q138 pass$p")(run("q138_longest_dup_substring", sf))
    }
    System.setProperty("graft.lcp.path", "hash")
    time("q138 1x pinned-hash")(run("q138_longest_dup_substring", sf))
    println(s"[scratch] persisted RDD blocks before clear: " +
      spark.sparkContext.getPersistentRDDs.size)
    time("clearCaches")(graft.operators.SuffixArray.clearCaches(spark))
    println(s"[scratch] persisted RDD blocks after clear: " +
      spark.sparkContext.getPersistentRDDs.size)
    time("q110 at 10x after SA passes + clear")(run("q110_triangle_count", "scale/sf1"))
    time("q137 at 10x")(run("q137_suffix_array", "scale/sf1"))
    time("q138 at 10x pinned-hash")(run("q138_longest_dup_substring", "scale/sf1"))
    System.clearProperty("graft.lcp.path")
    spark.stop()
  }
}
