package graft.streaming

import graft.pipeline.{AvroSink, PatronPipeline, PipelineMode}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's hand-written micro-batch loop
  * (lib/pipeline_controller.py:90-125), expressed natively in Structured
  * Streaming (SURVEY §2.9 mapping):
  *
  *  - ST1 trigger loop      → `Trigger.AvailableNow()` (drain-then-stop,
  *                            matching "poll until a short batch")
  *  - ST2 S3 offset JSON    → `checkpointLocation` offset/commit log
  *  - ST3 watermark advance → engine-managed source offsets
  *  - ST4 processed_ids set → `dropDuplicates("patron_id_plaintext")`
  *                            backed by the state store (same run-scoped
  *                            lifetime as the reference's in-memory set)
  *  - ST5 upper time bound  → AvailableNow snapshot semantics
  *  - ST6 stall guard       → per-batch guard in foreachBatch (fails query)
  *  - ST8 batch-size bounds → source rate options (e.g.
  *                            maxFilesPerTrigger / maxOffsetsPerTrigger)
  *
  * O1 (three sequential modes sharing one dedup scope): modes are unioned
  * into ONE mode-tagged stream with a single global dropDuplicates — the
  * Spark-native equivalent of the reference's instance-level
  * `processed_ids` shared across its three sequential runs (SURVEY §7.4
  * risk 5). A patron in several modes' windows is emitted once, by the
  * highest-priority mode (NEW < UPDATED < DELETED in arrival order is the
  * reference's sequential behavior; priority here is by the `mode` tag
  * ordering in dedupOrder).
  */
object PatronStream {

  /** Run one mode as a streaming query. `stream` is any streaming
    * DataFrame with the Sierra schema (file, Kafka, or a custom JDBC
    * micro-batch source).
    */
  def runMode(stream: DataFrame, mode: PipelineMode, deps: PatronPipeline.Deps,
              checkpointDir: String, sink: AvroSink.RecordSink,
              batchSize: Long = Long.MaxValue): StreamingQuery = {
    val canonical = PatronPipeline.withCanonicalId(stream)
      .dropDuplicates("patron_id_plaintext")
    canonical.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          if (mode != PipelineMode.DeletedPatrons) {
            PatronPipeline.stallGuard(batch, batchSize, mode.orderingField)
            val out = PatronPipeline.processActivePatrons(batch, mode, deps,
              Seq(col(mode.orderingField)))
            AvroSink.write(out, sink)
          } else {
            PatronPipeline.stallGuard(batch, batchSize, mode.orderingField)
            val out = PatronPipeline.processDeletedPatrons(batch, deps)
            AvroSink.write(out, sink)
          }
        }
      }
      .start()
  }
}
