package graft.streaming

import graft.operators.{Diff, IncrementalAgg}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming materialized-view change feed — the composition of
  * [[IncrementalAgg.merge]] (incremental MV upkeep, q106) and
  * [[Diff.snapshotDiff]] (keyed snapshot diff, q125) into the standard
  * incremental-view primitive: each micro-batch folds its per-key
  * partial states into a persistent keyed snapshot, and the SINK
  * receives the batch's effect on the view — `added` and `changed`
  * keys with old and new values side by side — rather than the view
  * itself. Downstream consumers (caches, serving indexes, alerting)
  * apply deltas instead of re-reading a corpus-sized table; with an
  * additive merge a key can never regress, so the feed is exactly
  * `added ∪ changed`.
  *
  * Per-batch cost scales with |batch keys| + |state| through ONE
  * key-co-partitioned merge join and one diff join — never with stream
  * history. State is versioned (`<stateDir>/v<batchId>`, latest wins)
  * because the merged snapshot lazily READS the prior version while
  * being written — an in-place overwrite would corrupt its own input.
  *
  * Crash-replay is idempotent: foreachBatch is at-least-once, so a
  * crash after `v<batchId>` commits but before the streaming
  * checkpoint advances re-delivers the SAME batchId. Re-merging then
  * would double-count the delta (prior would be the already-merged
  * v<batchId>) and the overwrite would target its own input. Instead,
  * an existing `v<batchId>` is taken as the committed merge and the
  * feed is REBUILT as diff(v<prev>, v<batchId>) — which is why
  * cleanup keeps the immediate predecessor version and deletes only
  * older ones (the predecessor dies when the NEXT batch commits).
  * Sink-before-state (the at-least-once rule used across
  * graft.streaming): a crash between sink and state write re-emits
  * one batch's feed rather than losing it.
  */
object ChangeFeed {

  /** @param keys       grouping keys of the view
    * @param aggs       (valueCol, op) merge spec per [[IncrementalAgg.merge]]
    *                   (`sum` | `max` | `min`)
    * @param buildState batch → per-key partial states (same schema as
    *                   the persistent view: keys ++ value cols)
    * @param sink       receives keys, `change`, `old_<c>`/`new_<c>`
    *                   pairs, and `batch_id` for added/changed keys
    */
  def streamingChangeFeed(incoming: DataFrame, stateDir: String,
                          keys: Seq[String], aggs: Seq[(String, String)],
                          buildState: DataFrame => DataFrame,
                          checkpoint: String)
                         (sink: DataFrame => Unit): StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, stateDir, keys, aggs,
          buildState)(sink)
      }
      .start()

  /** One micro-batch of the feed — the foreachBatch body, exposed so
    * crash-replay (same batchId delivered twice) is directly testable.
    */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
                                      stateDir: String, keys: Seq[String],
                                      aggs: Seq[(String, String)],
                                      buildState: DataFrame => DataFrame)
                                     (sink: DataFrame => Unit): Unit = {
    val s = batch.sparkSession
    val dir = new java.io.File(stateDir)
    val versions = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .sortBy(f => f.getName.drop(1).toLong)
    val priorVersions = versions.filter(_.getName.drop(1).toLong < batchId)
    def readPrior(fallback: DataFrame): DataFrame = priorVersions.lastOption
      .map(f => s.read.parquet(f.getAbsolutePath))
      .getOrElse(fallback.limit(0))
    val (prior, merged, alreadyCommitted) =
      versions.find(_.getName == s"v$batchId")
        // a v<batchId> without _SUCCESS is a crash DURING the write —
        // partial parquet that must be re-merged, not trusted as the
        // committed snapshot (reading it would silently commit a
        // truncated view); mode(overwrite) below replaces it cleanly
        .filter(f => new java.io.File(f, "_SUCCESS").exists()) match {
        case Some(f) =>
          // Crash-replay: v<batchId> committed before the checkpoint
          // advanced. Re-merging would double-count the delta AND
          // overwrite a path the plan is reading; read the committed
          // merge and rebuild the feed as diff(v<prev>, v<batchId>).
          val m = s.read.parquet(f.getAbsolutePath)
          (readPrior(m), m, true)
        case None =>
          val delta = buildState(batch)
          val p = readPrior(delta)
          (p, IncrementalAgg.merge(p, delta, keys, aggs), false)
      }
    val feed = Diff.snapshotDiff(prior, merged, keys, aggs.map(_._1))
      .filter(col("change") =!= "unchanged")
      .withColumn("batch_id", lit(batchId))
    sink(feed)
    if (!alreadyCommitted)
      merged.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
      f.delete(): Unit
    }
    // Keep the immediate predecessor (crash-replay of THIS batch needs
    // it to rebuild the feed); delete only versions older than that.
    priorVersions.dropRight(1)
      .foreach(f => try rm(f) catch { case _: Exception => () })
  }
}
