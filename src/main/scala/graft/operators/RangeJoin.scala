package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Bucketed interval (range) join — assign point rows to the intervals
  * containing them. Spark has no native range-join operator; the naive
  * form is an inequality join that Catalyst can only plan as a
  * broadcast-nested-loop or cartesian + filter, both of which die at
  * scale. This is the standard bucketed rewrite (the same trick
  * Databricks' range-join hints apply): both sides are binned to a fixed
  * width, intervals EXPLODE across every bin they cover (`sequence`),
  * the join runs as an ordinary hash equi-join on (key, bin) — map-side
  * partial, co-partitioned, AQE-skew-splittable — and the exact
  * containment predicate filters afterwards. A point lands in exactly
  * one bin and an interval covers each of its bins once, so no pair is
  * produced twice and no distinct is needed.
  *
  * `binWidthSec` trades shuffle volume against join fan-in: each
  * interval produces span/binWidth + 1 rows; pick it near the median
  * interval length so most intervals explode into ~2 bins. Degenerate
  * guard: intervals with end < start are dropped (sequence would throw).
  */
object RangeJoin {

  /** Join `points` (carrying `tsCol`) to the `intervals` rows (carrying
    * `startCol`/`endCol`, inclusive bounds) of the same `key` whose span
    * contains the point. Inner join: points in no interval are dropped.
    * All three ts columns are TIMESTAMP; comparison is on microseconds.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, key: String,
                   tsCol: String, startCol: String, endCol: String,
                   binWidthSec: Long = 1800L): DataFrame = {
    val binUs = binWidthSec * 1000000L
    // exact integer floor division (SQL `div` = IntegralDivide): double
    // division skews bins past ~2^53 µs; pmod makes truncation a true
    // floor for pre-epoch timestamps. Same binning as RangeJoinRewrite.
    def bin(c: String): Column = {
      val us = unix_micros(col(c))
      call_function("div", us - pmod(us, lit(binUs)), lit(binUs))
    }
    val p = points.withColumn("__bin", bin(tsCol))
    val iv = intervals
      .filter(unix_micros(col(endCol)) >= unix_micros(col(startCol)))
      .withColumn("__bin", explode(sequence(bin(startCol), bin(endCol))))
    p.join(iv, Seq(key, "__bin"))
      .filter(unix_micros(col(tsCol)).between(
        unix_micros(col(startCol)), unix_micros(col(endCol))))
      .drop("__bin")
  }

  /** Streaming interval join against a SLOWLY-GROWING interval table:
    * each micro-batch of points joins the intervals AS OF that batch,
    * because `loadIntervals` is re-invoked inside `foreachBatch` — a
    * fresh DataFrame re-lists the dimension source every trigger
    * (a plain stream-static join would freeze the interval side's file
    * listing at query start and silently miss every interval added
    * while the stream runs — the dimension-refresh gap this wrapper
    * exists to close). This is the standard slowly-changing-dimension
    * pattern for streams: points are exactly-once via the checkpoint;
    * the interval side is read-committed per batch. State is ZERO —
    * unlike a stream-stream join there is no buffering, the trade
    * being that a point arriving before its interval is NOT retro-
    * matched (that semantics needs the watermarked stream-stream form,
    * `EventStreams.streamingAttribution`).
    */
  def streamingIntervalJoinRefreshed(
      points: DataFrame, loadIntervals: () => DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String,
      checkpoint: String, sink: DataFrame => Unit,
      binWidthSec: Long = 1800L): StreamingQuery =
    points.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        sink(intervalJoin(batch.toDF(), loadIntervals(), key,
          tsCol, startCol, endCol, binWidthSec))
      }
      .start()
}
