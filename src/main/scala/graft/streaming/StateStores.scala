package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-store provider selection.
  *
  * The default HDFSBackedStateStoreProvider keeps every partition's
  * ENTIRE key map on executor heap — fine for bounded watermarked
  * windows, but the pipeline's long-running dedup states
  * ([[PatronStream]] run-scoped patron ids,
  * [[DocStreams.dedupAgainstHistory]] content hashes) grow with run
  * size: at 100 TB-scale runs that map is the one streaming OOM risk.
  * RocksDB (bundled with Spark 4) keeps state on executor local disk
  * with a block cache, and changelog checkpointing uploads per-batch
  * deltas instead of full snapshots, so state size is bounded by disk,
  * not heap.
  *
  * Provider choice is a session conf read at QUERY START and recorded
  * in the checkpoint — switching providers requires a fresh checkpoint
  * (same rule as the state-schema note in PatronStream); configure
  * before the first `start()`.
  */
object StateStores {

  val RocksDbProviderClass =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Select the provider for subsequently-started streaming queries on
    * this session: `rocksdb` or `hdfs` (the built-in default).
    */
  def configure(spark: SparkSession, provider: String): Unit =
    provider match {
      case "rocksdb" =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          RocksDbProviderClass)
        spark.conf.set(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          "true")
      case "hdfs" =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      case other => throw new IllegalArgumentException(
        s"unknown state-store provider '$other' (want rocksdb | hdfs)")
    }
}
