package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream operators (SURVEY §2.9 ST7 extension inventory) in their
  * native Structured Streaming form. Each works on both batch and
  * streaming DataFrames — the batch analogues (q16/q17) are the DuckDB
  * oracle surface; these are what a production stream would run, with
  * watermarked state eviction so state is bounded at 100 TB/day rates.
  */
object EventStreams {

  /** Tumbling-window rollup with watermark (`groupBy(window(...))`). On a
    * stream, late events beyond `watermark` are dropped and window state is
    * evicted once the watermark passes — the scale-safe form of q16.
    */
  def tumblingRollup(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding-window rollup (len > slide ⇒ each event lands in len/slide
    * windows) with watermarked eviction — the streaming form of q40.
    */
  def slidingRollup(events: DataFrame, windowLen: String = "1 hour",
                    slide: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"))

  /** Session windows per user with a gap timeout (`session_window`) — the
    * native form of the reference-shaped gaps-and-islands batch query q17.
    */
  def sessionRollup(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
}
