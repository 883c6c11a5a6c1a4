package graft

import org.apache.spark.sql.SparkSession

/** Scratch measurement runner for local iteration (not part of the
  * driver contract).
  *
  * Current probe (r14, residual tier-10 gate marks q107/q123 at
  * 1.10–1.12): hypothesis — the 1× base session shuffles at 32
  * partitions (Bench main) while the rehearsal child starts shuffles
  * at initialPartitionNum=256, and lz4 shuffle blocks compress worse
  * at 8× smaller block size, inflating the measured write bytes
  * ~15–25% independent of data volume. Measure the SAME query on the
  * SAME 1× data under both granularities and compare write bytes.
  */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q107_fuzzy_join", "q123_doc_novelty")
    for (initNum <- Seq("32", "256")) {
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initNum)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val shuffle = new ShuffleBytesListener
      spark.sparkContext.addSparkListener(shuffle)
      for (name <- names) {
        // same pin the rehearsal applies
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        val b0 = shuffle.bytes.get()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save()
        println(f"[gran] $name%-24s initialPartitionNum=$initNum%-4s " +
          f"${(System.nanoTime() - t0) / 1e9}%6.2f s writeMB=${(shuffle.bytes.get() - b0) / 1e6}%8.2f")
        graft.operators.TransientPersists.releaseAll()
      }
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
