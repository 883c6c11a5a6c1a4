package graft.tools

import graft.{ScaleData, ScaleRehearsal, Tables}
import graft.operators.SuffixArray
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured answer to "what does maxConcurrentShards = 2 actually cost?"
  * (r17 verdict #3: the k·shard working-set claim was comment-ware).
  * Runs the sharded exact dedup-cut kernel on the 10× corpus twice —
  * k = 1 (the strictly-sequential rehearsal form) and k = 2 (two
  * shards in flight on isolated `newSession()`s) — with the same peak
  * disk/heap-storage sampler the autoShards probe uses, and publishes:
  *
  *  - output identity: row count + an order-invariant xxhash64 row
  *    checksum must match bit-for-bit (the concurrency knob is an
  *    execution knob, never a semantics knob — and under the FORCED
  *    hash-walk path this also exercises the r17-ADVICE release race
  *    end-to-end at real scale, where the per-round checkpoints are
  *    corpus-fraction-sized);
  *  - peak storage: k = 2's peak vs k = 1's, against the one-shard
  *    working-set envelope (walkWorkingSetBytes(sumLen/4, maxLen)) —
  *    the published claim is peak(k) ≲ k × one-shard envelope ×
  *    the 4× machine-allowance factor the feasibility convention uses.
  *
  * Conf pinning: the no-broadcast pin (the per-shard doc-length join
  * flips broadcast→shuffle with data — q174's NoBroadcastBase entry)
  * is applied at SESSION-BUILDER level, not session-conf level, so the
  * k = 2 worker sessions INHERIT it — the documented conf-propagation
  * footgun (`newSession()` starts from the SparkContext conf, not the
  * parent session's runtime conf) is exactly why the pin lives here.
  * `graft.lcp.path=hash` is a system property and reaches every walk.
  *
  * Peak-disk attribution caveat (same as the autoShards probe): the
  * sampler reads whole-tmpdir usage at 4 Hz, so concurrent unrelated
  * disk activity is attributed to the probe — run on a quiet box.
  *
  * args: [outJson]  (default concurrent_shards_probe.json; 10× data is
  * derived from /root/testdata/sf0.1 under scale/sf1 as usual)
  */
object ConcurrentShardsProbe {

  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("concurrent_shards_probe.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      // builder-level no-broadcast pin: inherited by newSession() workers
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.lcp.path", "hash")
    // the probe's k·shard envelope claim is about the distributed
    // kernel — pin the SA build path like every rehearsal tier
    System.setProperty("graft.sa.path", "distributed")
    try {
      ScaleData.ensure(spark, "/root/testdata/sf0.1",
        ScaleRehearsal.ScaledDir10, 10)
      val docs = Tables.documents(spark, ScaleRehearsal.ScaledDir10)
      val statsRow = docs.agg(sum(length(col("text"))),
        max(length(col("text")))).head
      val sumLen = if (statsRow.isNullAt(0)) 0L else statsRow.getLong(0)
      val maxLen = if (statsRow.isNullAt(1)) 0 else statsRow.getInt(1)
      val nShards = 4
      val shardEnvelope =
        SuffixArray.walkWorkingSetBytes(sumLen / nShards, maxLen)
      val tmpFile =
        new java.io.File(System.getProperty("java.io.tmpdir", "/tmp"))

      /** (rows, checksum, wallSecs, peakDiskBytes, peakMemBytes) */
      def measure(k: Int): (Long, Long, Double, Long, Long) = {
        SuffixArray.clearCaches(spark)
        System.gc()
        val disk0 = tmpFile.getTotalSpace - tmpFile.getUsableSpace
        def storageNow: (Long, Long) = {
          var mem = 0L; var dsk = 0L
          spark.sparkContext.getRDDStorageInfo
            .foreach { i => mem += i.memSize; dsk += i.diskSize }
          (mem, dsk)
        }
        val (mem0, bdisk0) = storageNow
        val peakDisk = new java.util.concurrent.atomic.AtomicLong(0L)
        val peakMem = new java.util.concurrent.atomic.AtomicLong(0L)
        @volatile var sampling = true
        val sampler = new Thread(() => {
          while (sampling) {
            val tmpDelta = math.max(0L,
              tmpFile.getTotalSpace - tmpFile.getUsableSpace - disk0)
            val (mem, dsk) = storageNow
            peakDisk.accumulateAndGet(
              tmpDelta + math.max(0L, dsk - bdisk0), math.max(_, _))
            peakMem.accumulateAndGet(math.max(0L, mem - mem0), math.max(_, _))
            Thread.sleep(250)
          }
        }, s"graft-concshards-sampler-k$k")
        sampler.setDaemon(true)
        val t0 = System.nanoTime()
        sampler.start()
        val agg =
          try SuffixArray.shardedDedupCut(docs, minLen = 40,
              nShards = nShards, maxConcurrentShards = k)
            // order-invariant row checksum; hashes are mod-reduced so
            // the Long sum cannot overflow (ANSI mode aborts on it)
            .agg(count(lit(1)).as("n"),
              coalesce(sum(pmod(xxhash64(col("doc_id"), col("cut_start"),
                col("cut_end")), lit(1000000007L))), lit(0L)).as("h"))
            .head
          finally { sampling = false; sampler.join(2000) }
        val wall = (System.nanoTime() - t0) / 1e9
        SuffixArray.clearCaches(spark) // release this run's sidecars
        (agg.getLong(0), agg.getLong(1), wall, peakDisk.get(), peakMem.get())
      }

      val (rows1, sum1, wall1, disk1, mem1) = measure(1)
      val (rows2, sum2, wall2, disk2, mem2) = measure(2)
      val identical = rows1 == rows2 && sum1 == sum2
      def f(d: Double): String = f"$d%.1f"
      val json =
        s"""{"probe":"concurrent_shards","n_shards":$nShards,
           |"sum_len":$sumLen,"max_len":$maxLen,
           |"one_shard_envelope_bytes":$shardEnvelope,
           |"machine_allowance_factor":4,
           |"k1":{"rows":$rows1,"checksum":$sum1,"wall_secs":${f(wall1)},"peak_disk_bytes":$disk1,"peak_mem_bytes":$mem1},
           |"k2":{"rows":$rows2,"checksum":$sum2,"wall_secs":${f(wall2)},"peak_disk_bytes":$disk2,"peak_mem_bytes":$mem2},
           |"identical_output":$identical,
           |"peak_disk_ratio_k2_over_k1":${f(if (disk1 > 0) disk2.toDouble / disk1 else -1.0)},
           |"k1_within_allowance":${disk1 <= 4L * shardEnvelope},
           |"k2_within_allowance":${disk2 <= 2L * 4L * shardEnvelope},
           |"peak_disk_method":"whole-tmpdir usage delta at 4 Hz + spilled block bytes; concurrent unrelated disk activity is attributed to the probe"}"""
          .stripMargin.replace("\n", "")
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(json)
    } finally spark.stop()
  }
}
