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

  /** Watermarked STREAM-STREAM attribution join — the streaming form of
    * the batch q65: purchases joined to same-user clicks at most
    * `horizon` older, with BOTH sides streaming. The time-range
    * condition lets the engine bound state: buffered clicks are evicted
    * once the purchase-side watermark passes `click_ts + horizon`, so
    * state holds one horizon's worth of clicks per user, not the
    * stream's history — the canonical Structured Streaming
    * stream-stream inner join (the one streaming operator class a
    * hand-rolled micro-batch loop like the reference's cannot express
    * at all, because it needs cross-batch buffering of BOTH inputs).
    */
  def streamingAttribution(clicks: DataFrame, purchases: DataFrame,
                           horizon: String = "1 hour",
                           watermark: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(c, expr(
        s"""p_user_id = user_id
           |AND purchase_ts >= click_ts
           |AND purchase_ts <= click_ts + INTERVAL $horizon""".stripMargin))
      .select(col("purchase_id"), col("click_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("delay_us"))
  }

  /** Streaming ordered-funnel progression — the incremental form of the
    * batch q67: per user, a 3-slot state machine (earliest view, earliest
    * later click, earliest later purchase) advanced by each arriving
    * event; a row `(user_id, step, t_us)` is emitted exactly when a step
    * first completes. Within a micro-batch events are processed in
    * (ts, event_id) order; across batches the state carries the
    * partially-completed funnel, so the emitted steps equal the batch
    * query's per-user (t1, t2, t3) when events arrive time-ordered
    * (the same in-order-arrival contract as [[streamingDeltas]]).
    * State footprint: three longs per user — independent of event
    * volume, the property that matters when the event stream is the
    * 100 TB side. Production would add a state timeout for users whose
    * funnels never complete.
    */
  def streamingFunnel(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("step", StringType),
      StructField("t_us", LongType)))
    implicit val enc = Encoders.row(outSchema)
    type FunnelState = (Option[Long], Option[Long], Option[Long])
    val uIdx = events.schema.fieldIndex("user_id")
    val eIdx = events.schema.fieldIndex("event_id")
    val tIdx = events.schema.fieldIndex("ts")
    val kIdx = events.schema.fieldIndex("event_type")
    events
      .groupByKey(_.getLong(uIdx))(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[Row], state: GroupState[FunnelState]) => {
          val sorted = rows.toSeq.sortBy(r =>
            (r.getTimestamp(tIdx).getTime, r.getLong(eIdx)))
          var (t1, t2, t3) =
            if (state.exists) state.get else (None: Option[Long], None: Option[Long], None: Option[Long])
          val out = Seq.newBuilder[Row]
          sorted.foreach { r =>
            val us = r.getTimestamp(tIdx).getTime * 1000L +
              (r.getTimestamp(tIdx).getNanos / 1000L) % 1000L
            r.getString(kIdx) match {
              case "view" if t1.isEmpty =>
                t1 = Some(us); out += Row(user, "1_view", us)
              case "click" if t2.isEmpty && t1.exists(us > _) =>
                t2 = Some(us); out += Row(user, "2_click", us)
              case "purchase" if t3.isEmpty && t2.exists(us > _) =>
                t3 = Some(us); out += Row(user, "3_purchase", us)
              case _ => ()
            }
          }
          state.update((t1, t2, t3))
          out.result().iterator
        })(Encoders.product[(Option[Long], Option[Long], Option[Long])], enc)
  }

  /** Streaming time-since-last-event per user — the incremental form of
    * the batch lag window (q56): state is ONE timestamp per user
    * (`mapGroupsWithState`), each arriving event emits its gap to the
    * user's previous event and updates the state. Events inside one
    * micro-batch are processed in (ts, event_id) order, so a batch
    * containing several of a user's events produces exactly the batch
    * window's gaps; across micro-batches the state carries the last
    * timestamp forward. lead-style columns are NOT expressible
    * incrementally (the next event hasn't arrived) — the streaming
    * surface is deliberately the lag half only. State footprint: 16
    * bytes per active user, no watermark eviction needed for the
    * bounded test universe; production would add
    * `GroupStateTimeout.ProcessingTimeTimeout` to expire idle users.
    */
  def streamingDeltas(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("gap_us", LongType)))
    implicit val enc = Encoders.row(outSchema)
    val uIdx = events.schema.fieldIndex("user_id")
    val eIdx = events.schema.fieldIndex("event_id")
    val tIdx = events.schema.fieldIndex("ts")
    events
      .groupByKey(_.getLong(uIdx))(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[Row], state: GroupState[Long]) => {
          val sorted = rows.toSeq.sortBy(r =>
            (r.getTimestamp(tIdx).getTime, r.getLong(eIdx)))
          var prev = if (state.exists) Some(state.get) else None
          val out = sorted.map { r =>
            val us = r.getTimestamp(tIdx).getTime * 1000L +
              (r.getTimestamp(tIdx).getNanos / 1000L) % 1000L
            val gap = prev.map(us - _)
            prev = Some(us)
            Row(user, r.getLong(eIdx), gap.map(Long.box).orNull)
          }
          prev.foreach(state.update)
          out.iterator
        })(Encoders.scalaLong, enc)
  }

  /** Streaming recency-decayed activity score — q134's incremental form.
    * Per-user state is (anchorDay, nEvents, rawScore) where rawScore =
    * Σ value · 2^-(anchorDay − eventDay), anchored at the user's max
    * event day seen so far; each batch re-anchors by an EXACT
    * power-of-two rescale (`Math.scalb` — never `pow`, q117's
    * transcendental rule) and adds the batch's contributions. Emits the
    * user's current (anchor_day, n_events, decay_score) snapshot each
    * batch (Update mode). A consumer comparing against the batch q134
    * (global-max-day anchor) rescales by 2^-(globalMaxDay − anchor_day)
    * — the parity pinned in StreamingSpec. State is three fixed-width
    * fields per user: bounded by |users|, not stream length.
    */
  def streamingDecayScore(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("anchor_day", LongType),
      StructField("n_events", LongType), StructField("decay_score", DoubleType)))
    implicit val enc = Encoders.row(outSchema)
    val uIdx = events.schema.fieldIndex("user_id")
    val tIdx = events.schema.fieldIndex("ts")
    val vIdx = events.schema.fieldIndex("value")
    def dayOf(r: Row): Long = {
      val t = r.getTimestamp(tIdx)
      val us = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      us / 86400000000L
    }
    def decay(x: Double, days: Long): Double =
      if (days >= 63) 0.0 else Math.scalb(x, -days.toInt)
    events
      .groupByKey(_.getLong(uIdx))(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[Row], state: GroupState[(Long, Long, Double)]) => {
          val batch = rows.toSeq.map(r => (dayOf(r), r.getDouble(vIdx)))
          val (a0, n0, s0) =
            if (state.exists) state.get else (Long.MinValue, 0L, 0.0)
          val anchor = math.max(a0, batch.iterator.map(_._1).max)
          val rescaled = if (n0 == 0L) 0.0 else decay(s0, anchor - a0)
          val added = batch.iterator
            .map { case (d, v) => decay(v, anchor - d) }.sum
          val next = (anchor, n0 + batch.length, rescaled + added)
          state.update(next)
          Row(user, next._1, next._2, next._3)
        })(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaDouble), enc)
  }
}
