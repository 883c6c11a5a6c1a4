package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming data-contract audit — the Deequ-on-streams gate: evaluate
  * the declared constraints ([[graft.operators.Audit]]) on EVERY
  * micro-batch before it reaches downstream consumers, emitting one
  * report frame per batch tagged with its batch id. The caller's sink
  * decides policy (append to an audit table, alert, quarantine the
  * batch) — the operator only measures.
  *
  * `foreachBatch` is the right vehicle: the audit is one
  * conditional-aggregation pass + a broadcast semi-join per batch
  * (per-batch cost scales with the batch, never with history), and the
  * report must be transactionally paired with the batch that produced
  * it, not windowed state. An empty micro-batch reports
  * `row_count = 0 / passed = false` and ratio metrics NULL — surfaced,
  * not skipped, since a silent empty drop is itself a contract
  * violation worth alerting on.
  */
object AuditStreams {

  def streamingContractAudit(orders: DataFrame, customerDim: DataFrame,
      checkpoint: String, sink: DataFrame => Unit): StreamingQuery =
    orders.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val report = graft.operators.Audit
          .ordersContract(batch.toDF(), customerDim)
          .withColumn("batch_id", lit(batchId))
        sink(report)
      }
      .start()
}
