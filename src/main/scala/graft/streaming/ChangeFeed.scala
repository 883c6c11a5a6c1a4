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
  * being written — an in-place overwrite would corrupt its own input;
  * old versions are dropped once the new one commits (best-effort —
  * a crash between commit and cleanup leaves garbage versions, never
  * a corrupt state). Sink-before-state (the at-least-once rule used
  * across graft.streaming): a crash between sink and state write
  * re-emits one batch's feed rather than losing it.
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
        val s = batch.sparkSession
        val delta = buildState(batch.toDF())
        val dir = new java.io.File(stateDir)
        val versions = Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("v"))
          .sortBy(f => f.getName.drop(1).toLong)
        val prior = versions.lastOption
          .map(f => s.read.parquet(f.getAbsolutePath))
          .getOrElse(delta.limit(0))
        val merged = IncrementalAgg.merge(prior, delta, keys, aggs)
        val feed = Diff.snapshotDiff(prior, merged, keys, aggs.map(_._1))
          .filter(col("change") =!= "unchanged")
          .withColumn("batch_id", lit(batchId))
        sink(feed)
        merged.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
          f.delete(): Unit
        }
        versions.foreach(f => try rm(f) catch { case _: Exception => () })
      }
      .start()
}
