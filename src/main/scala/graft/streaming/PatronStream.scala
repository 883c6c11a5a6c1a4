package graft.streaming

import graft.pipeline.{AvroSink, PatronPipeline, PipelineMode, Schemas}
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

  /** Run all three modes as ONE streaming query over mode-tagged unioned
    * sources, with a single global dropDuplicates — the Spark-native form
    * of the reference's shared `processed_ids` across its three sequential
    * runs (O1; SURVEY §7.4 risk 5): a patron appearing in several modes'
    * windows is emitted exactly once. Mode priority at equal keys follows
    * the reference's sequential order (NEW first) via min(mode_rank)
    * pre-aggregation inside each micro-batch plus the cross-batch state.
    *
    * `newStream`/`updatedStream` carry the Sierra active schema;
    * `deletedStream` the 2-column deleted schema (padded to match).
    */
  def runAll(newStream: DataFrame, updatedStream: DataFrame,
             deletedStream: DataFrame, deps: PatronPipeline.Deps,
             checkpointDir: String, sink: AvroSink.RecordSink,
             schemaJson: String = Schemas.patronInfoAvroJson,
             runId: String = java.util.UUID.randomUUID().toString): StreamingQuery = {
    def tag(df: DataFrame, rank: Int) =
      PatronPipeline.withCanonicalId(df).withColumn("__mode_rank", lit(rank))
    val unioned = tag(newStream, 0)
      .unionByName(tag(updatedStream, 1), allowMissingColumns = true)
      .unionByName(tag(deletedStream, 2), allowMissingColumns = true)
    // Seen-keys state lives as parquet beside the checkpoint (the
    // reference's `processed_ids` set, but distributed: the unseen filter
    // is a left-anti join, not a driver-side set). Stream-level
    // dropDuplicates can't express mode priority — it would keep an
    // arbitrary mode's row when one patron lands in two modes in the same
    // micro-batch. The set is RUN-scoped (a fresh subdir per `runId`),
    // matching the reference's `processed_ids` lifetime
    // (lib/pipeline_controller.py:74): the poller watermark persists in
    // the checkpoint across runs, but a patron re-updated in a LATER run
    // is re-emitted. Stale run subdirs are bounded by run count, not data.
    val seenPath = s"$checkpointDir/seen_keys/run_$runId"
    unioned.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // Only a MISSING state dir means "first run, nothing seen" — any
          // other failure (corrupt files, transient IO) must fail the batch,
          // or processed patrons would silently re-emit.
          val seen =
            try spark.read.parquet(seenPath)
            catch {
              case e: org.apache.spark.sql.AnalysisException
                  if e.getCondition == "PATH_NOT_FOUND" =>
                spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
                  org.apache.spark.sql.types.StructType(Seq(
                    org.apache.spark.sql.types.StructField("patron_id_plaintext",
                      org.apache.spark.sql.types.StringType))))
            }
          // within a batch: highest-priority mode wins (NEW < UPDATED <
          // DELETED — the reference's sequential run order); at equal mode,
          // the lowest (display_order, patron_record_address_type_id)
          // address row survives (the reference's SQL-order keep='first',
          // helpers/query_helper.py:30). Deleted rows carry nulls there
          // (2-col schema padded by unionByName) — nulls sort last.
          val best = PatronPipeline.dedupKeepFirst(
            PatronPipeline.filterUnseen(batch, seen),
            col("__mode_rank") +: PatronPipeline.addressPriority)
            .persist()
          try {
            val newRows = best.filter(col("__mode_rank") === 0)
            val updRows = best.filter(col("__mode_rank") === 1)
            val delRows = best.filter(col("__mode_rank") === 2)
              .select("patron_id_plaintext", "deletion_date_et")
            if (!newRows.isEmpty) AvroSink.write(
              PatronPipeline.processActivePatrons(newRows, PipelineMode.NewPatrons,
                deps, col(PipelineMode.NewPatrons.orderingField) +:
                  PatronPipeline.addressPriority), sink, schemaJson = schemaJson)
            if (!updRows.isEmpty) AvroSink.write(
              PatronPipeline.processActivePatrons(updRows, PipelineMode.UpdatedPatrons,
                deps, col(PipelineMode.UpdatedPatrons.orderingField) +:
                  PatronPipeline.addressPriority), sink, schemaJson = schemaJson)
            if (!delRows.isEmpty) AvroSink.write(
              PatronPipeline.processDeletedPatrons(delRows, deps), sink,
              schemaJson = schemaJson)
            // one file per batch, not one per shuffle partition: the key
            // set is bounded by the batch size, and an append-only state
            // dir otherwise accumulates numPartitions small files per
            // micro-batch — the classic small-files leak on long runs
            best.select("patron_id_plaintext")
              .coalesce(1).write.mode("append").parquet(seenPath)
          } finally best.unpersist()
        }
      }
      .start()
  }

  /** Run one mode as a streaming query. `stream` is any streaming
    * DataFrame with the Sierra schema (file, Kafka, or a custom JDBC
    * micro-batch source).
    *
    * ST6 ownership (intentional deviation from the reference's guard,
    * lib/pipeline_controller.py:150-162): the reference stalls on ANY full
    * batch sharing one timestamp because its next `>=` scan would loop.
    * Here the SOURCE owns stall detection — [[graft.sources.PollingSource]]
    * polls `limit+1` rows and fails only when a watermark group alone
    * exceeds the page (the one case its strict-`>` offset genuinely cannot
    * advance past), and file/Kafka sources define batches by offsets that
    * always advance. Re-checking count==batchSize here would kill the
    * legitimate final full page whose rows share one watermark, and after
    * the per-address `dropDuplicates` the batch count no longer equals the
    * page size anyway. `batchSize` applies [[PatronPipeline.stallGuard]]
    * for sources with no guard of their own (the reference's batch-mode
    * parity path); pass the default to delegate ST6 to the source.
    */
  def runMode(stream: DataFrame, mode: PipelineMode, deps: PatronPipeline.Deps,
              checkpointDir: String, sink: AvroSink.RecordSink,
              batchSize: Long = Long.MaxValue,
              schemaJson: String = Schemas.patronInfoAvroJson,
              runId: String = java.util.UUID.randomUUID().toString): StreamingQuery = {
    // Cross-batch suppression is PATRON-keyed (suppressSeenPatrons), not
    // per-address: the polling source never splits a watermark group
    // across pages, so all of a patron's address rows land in one
    // micro-batch, and any later delivery of the same patron — identical,
    // partially changed, or fully changed address set — is suppressed
    // entirely, exactly like the reference's processed_ids. Suppression is
    // RUN-scoped (`runId`): each runMode invocation is one drain (one
    // reference poller run), and a patron re-updated in a LATER run is
    // re-emitted — the reference resets processed_ids per run while its
    // S3 watermark persists (lib/pipeline_controller.py:74). NOTE:
    // upgrading from the boolean-state version changes the
    // flatMapGroupsWithState state schema — existing checkpoints written
    // by dropDuplicates-era or boolean-state builds must be restarted
    // fresh (state store schemas are not migratable).
    val canonical = PatronPipeline.withCanonicalId(stream)
    val deduped =
      if (mode == PipelineMode.DeletedPatrons)
        canonical.dropDuplicates("patron_id_plaintext")
      else suppressSeenPatrons(canonical, runId)
    deduped.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          if (mode != PipelineMode.DeletedPatrons) {
            PatronPipeline.stallGuard(batch, batchSize, mode.orderingField)
            val out = PatronPipeline.processActivePatrons(batch, mode, deps,
              col(mode.orderingField) +: PatronPipeline.addressPriority)
            AvroSink.write(out, sink, schemaJson = schemaJson)
          } else {
            PatronPipeline.stallGuard(batch, batchSize, mode.orderingField)
            val out = PatronPipeline.processDeletedPatrons(batch, deps)
            AvroSink.write(out, sink, schemaJson = schemaJson)
          }
        }
      }
      .start()
  }

  /** Patron-keyed cross-batch suppression — the reference's run-scoped
    * `processed_ids` set (lib/pipeline_controller.py:74,165-174), expressed
    * as streaming state: within one run, the FIRST micro-batch that
    * delivers a patron passes ALL of that patron's address rows through
    * (the downstream ordered keep-first then picks the top-priority
    * address, helpers/query_helper.py:30); every later delivery of the
    * same patron IN THE SAME RUN is suppressed wholesale. A per-address
    * `dropDuplicates` key cannot express this: novel (patron,
    * display_order, type_id) rows of an already-emitted patron would leak
    * through, and the batch-level keep-first could then emit a
    * non-top-priority address.
    *
    * State holds the `runId` that last emitted the patron, NOT a plain
    * seen-bit: the reference resets `processed_ids` at every poller run
    * while the S3 watermark persists, so a patron updated again in a
    * later run must be RE-emitted. A boolean under NoTimeout would
    * suppress it for the checkpoint's whole lifetime — silent data loss
    * relative to the reference. Comparing the stored runId to the current
    * one reproduces the run-scoped lifetime exactly while the state store
    * itself stays checkpoint-persistent (which is what keeps the SOURCE
    * watermark durable). Footprint is one string per patron id — same
    * asymptotics as `dropDuplicates`' key set.
    */
  private def suppressSeenPatrons(df: DataFrame, runId: String): DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val idx = df.schema.fieldIndex("patron_id_plaintext")
    implicit val rowEnc: Encoder[Row] = Encoders.row(df.schema)
    df.groupByKey(_.getString(idx))(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Row], state: GroupState[String]) =>
          if (state.exists && state.get == runId) Iterator.empty
          else { state.update(runId); rows })(Encoders.STRING, rowEnc)
  }
}
