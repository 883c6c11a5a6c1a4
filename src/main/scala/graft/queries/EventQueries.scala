package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream operator coverage over the `events` table: tumbling-window
  * rollups, sessionization, JSON extraction (SURVEY §2.9 batch analogues;
  * the true Structured Streaming forms live in graft.streaming and are
  * exercised in ScalaTest, since the DuckDB oracle is batch-only).
  */
object EventQueries {
  private val dec6 = DecimalType(18, 6)

  /** q16 — tumbling 1h window rollup per event_type: the batch shape of
    * `groupBy(window($"ts", "1 hour"), $"event_type")`. Emitted as a
    * formatted string hour so parquet tz encodings can't skew the compare.
    */
  def q16(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec6)).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour", "event_type")

  val q16Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
      | COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
      | COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** q17 — sessionization via gaps-and-islands: a new session starts when
    * the gap to the previous event of the same user exceeds 30 minutes.
    * Batch analogue of `session_window($"ts", "30 minutes")`; at scale this
    * is one shuffle on user_id and a sorted window within partitions.
    */
  def q17(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  val q17Sql: String =
    """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events FROM (
      | SELECT user_id,
      |  CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |        OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           > 1800 * 1000000
      |       THEN 1 ELSE 0 END AS new_session
      | FROM events) t
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q40 — SLIDING window rollup (1 h length, 30 min slide): completes
    * the window family beside tumbling (q16) and session (q17). Spark's
    * `window(ts, len, slide)` assigns each event to len/slide
    * epoch-aligned windows; with len = 2·slide the oracle replays that as
    * a 2-row expansion per event (k ∈ {0,1} shifted 30-min floors) — no
    * window-containment filter needed since both shifted windows always
    * cover the event.
    */
  def q40(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("event_type"), col("n_events"))
      .orderBy("window_start", "event_type")

  val q40Sql: String =
    """SELECT strftime(make_timestamp((epoch_us(ts) // 1800000000 - k) * 1800000000),
      |   '%Y-%m-%d %H:%M') AS window_start,
      | event_type, COUNT(*) AS n_events
      |FROM events, range(2) t(k)
      |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** q18 — JSON property extraction + rollup (events.props is a JSON
    * string; SURVEY §1.2 — from_json into a typed struct on the Spark
    * side, regex-equivalent in the oracle to avoid extension dependence).
    */
  def q18(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(col("k")).as("n_k"))
      .orderBy("event_type")

  val q18Sql: String =
    """SELECT event_type,
      | CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k, COUNT(k) AS n_k
      |FROM (SELECT event_type,
      |        CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k
      |      FROM events) t
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q33 — as-of join: each click enriched with the user's most recent
    * prior (ts-inclusive) purchase. Spark has no native as-of join;
    * graft.operators.AsOfJoin composes it as one shuffle + one window
    * (see its scaladoc for why that beats a custom SparkPlan here).
    * Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  def q33(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"),
        col("value").as("p_value"))
    graft.operators.AsOfJoin.lastPrior(
      clicks, purchases, Seq("user_id"), "ts",
      valueCols = Seq("p_value", "p_event_id"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
        col("value"),
        col("asof_p_value").as("last_purchase_value"),
        col("asof_p_event_id").as("last_purchase_event"))
      .orderBy("event_id")
  }

  val q33Sql: String =
    """SELECT e.event_id, e.user_id,
      | strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, e.value,
      | p.value AS last_purchase_value, p.event_id AS last_purchase_event
      |FROM (SELECT * FROM events WHERE event_type = 'click') e
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON e.user_id = p.user_id AND e.ts >= p.ts
      |ORDER BY e.event_id""".stripMargin

  /** q56 — per-entity lag/lead navigation: for every event, the
    * microsecond gap since the same user's previous event and the type of
    * their next one — the feature-engineering primitive behind
    * time-since-last-action and next-action-prediction labels. One
    * shuffle on user_id, then both offsets come out of a single sorted
    * window pass (Spark plans one Window operator for lag AND lead over
    * the same frame). The ordering (ts, event_id) is total, so NULL
    * boundaries and values are deterministic.
    */
  def q56(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select("user_id", "event_id", "gap_us", "next_type")
      .orderBy("user_id", "event_id")
  }

  val q56Sql: String =
    """SELECT user_id, event_id,
      | epoch_us(ts) - lag(epoch_us(ts))
      |   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us,
      | lead(event_type)
      |   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Per-user session spans (gaps-and-islands, q17's island assignment
    * kept as [start, end] intervals instead of collapsed to counts) —
    * the interval side of the range join below. One shuffle on user_id;
    * both windows share the same (ts, event_id) frame so Spark plans a
    * single sort.
    */
  def sessionSpans(events: DataFrame, gapMin: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session", when(col("prev_us").isNull ||
        unix_micros(col("ts")) - col("prev_us") > gapMin * 60000000L, 1L)
        .otherwise(0L))
      .withColumn("session_seq",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("session_n_events"))
  }

  /** q60 — interval (range) join: assign each purchase event to the
    * session span containing it — "which browsing session did this
    * conversion happen in", the canonical point-in-interval lookup.
    * Uses [[graft.operators.RangeJoin.intervalJoin]]: both sides bin to
    * 30 min, intervals explode across covered bins, and the join is an
    * ordinary co-partitioned hash equi-join on (user_id, bin) + exact
    * containment filter — never a broadcast-nested-loop inequality join
    * (the plan Spark would pick unaided, which dies at scale). The
    * oracle replays it as DuckDB's native inequality join.
    */
  def q60(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    graft.operators.RangeJoin.intervalJoin(
        purchases, sessionSpans(events), "user_id",
        "ts", "session_start", "session_end")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        col("session_n_events"))
      .orderBy("event_id")
  }

  val q60Sql: String =
    """WITH o AS (
      | SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |f AS (
      | SELECT user_id, event_id, event_type, us,
      |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
      |        OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |           > 30 * 60000000 THEN 1 ELSE 0 END AS new_session
      | FROM o),
      |g AS (
      | SELECT *, SUM(new_session) OVER (PARTITION BY user_id
      |   ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
      | FROM f),
      |s AS (
      | SELECT user_id, session_seq, MIN(us) AS start_us, MAX(us) AS end_us,
      |  CAST(COUNT(*) AS BIGINT) AS session_n_events
      | FROM g GROUP BY user_id, session_seq)
      |SELECT p.event_id, p.user_id, s.start_us AS session_start_us,
      | s.session_n_events
      |FROM (SELECT * FROM o WHERE event_type = 'purchase') p
      |JOIN s ON p.user_id = s.user_id AND p.us BETWEEN s.start_us AND s.end_us
      |ORDER BY event_id""".stripMargin

  /** q65 — time-bounded attribution join: every (click, purchase) pair
    * of the same user where the purchase lands within one hour of the
    * click — the pattern behind conversion attribution and any
    * "A followed by B within T" correlation. The batch form derives
    * [click, click+1h] intervals and reuses
    * [[graft.operators.RangeJoin.intervalJoin]] (co-partitioned hash
    * equi-join on (user, bin), never a nested-loop inequality join);
    * [[graft.streaming.EventStreams.streamingAttribution]] is the same
    * semantics as a watermarked STREAM-STREAM join, where the engine
    * evicts click state once the purchase-side watermark passes the
    * horizon.
    */
  def q65(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("click_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    graft.operators.RangeJoin.intervalJoin(
        purchases, clicks, "user_id", "purchase_ts", "click_ts", "click_end")
      .select(col("purchase_id"), col("click_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("delay_us"))
      .orderBy("purchase_id", "click_id")
  }

  val q65Sql: String =
    """WITH c AS (
      | SELECT user_id, event_id AS click_id, epoch_us(ts) AS cus
      | FROM events WHERE event_type = 'click'),
      |p AS (
      | SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pus
      | FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id, c.click_id, p.pus - c.cus AS delay_us
      |FROM p JOIN c ON p.user_id = c.user_id
      | AND p.pus >= c.cus AND p.pus <= c.cus + 3600000000
      |ORDER BY purchase_id, click_id""".stripMargin

  /** q67 — ordered funnel analysis: how many users complete
    * view → click → purchase IN ORDER (each step strictly after the
    * previous one's earliest completion), with the median completion
    * time per step. The implementation is the scalable chained-agg
    * shape: step N's user set is `events ⋈ stepN−1` filtered to
    * later timestamps and re-aggregated to a min — every intermediate
    * is a (user, timestamp) pair, aggregations shrink monotonically
    * down the funnel, and each join is a co-partitioned hash join on
    * user_id (broadcastable once the funnel narrows). No per-user
    * event-list collection, no window over the full event stream —
    * the two shapes that die on power-law users at 100 TB.
    */
  def q67(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val view = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t1"))
    val click = ev.filter(col("event_type") === "click")
      .join(view, "user_id").filter(col("us") > col("t1"))
      .groupBy("user_id").agg(min("us").as("t2"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(click, "user_id").filter(col("us") > col("t2"))
      .groupBy("user_id").agg(min("us").as("t3"))
    def step(df: DataFrame, tCol: String, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"),
        expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY $tCol)")
          .cast("long").as("p50_us"))
        .select(lit(name).as("step"), col("n_users"), col("p50_us"))
    step(view, "t1", "1_view")
      .unionByName(step(click, "t2", "2_click"))
      .unionByName(step(purchase, "t3", "3_purchase"))
      .orderBy("step")
  }

  val q67Sql: String =
    """WITH v AS (
      | SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
      | WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      | SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
      | FROM events e JOIN v ON e.user_id = v.user_id
      | WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
      | GROUP BY e.user_id),
      |p AS (
      | SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
      | FROM events e JOIN c ON e.user_id = c.user_id
      | WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
      | GROUP BY e.user_id)
      |SELECT * FROM (
      | SELECT '1_view' AS step, COUNT(*) AS n_users,
      |        CAST(quantile_disc(t1, 0.5) AS BIGINT) AS p50_us FROM v
      | UNION ALL
      | SELECT '2_click', COUNT(*), CAST(quantile_disc(t2, 0.5) AS BIGINT) FROM c
      | UNION ALL
      | SELECT '3_purchase', COUNT(*), CAST(quantile_disc(t3, 0.5) AS BIGINT) FROM p)
      |ORDER BY step""".stripMargin

  /** q69 — weekly cohort retention: users grouped by the week of their
    * first event; for each (cohort week, week offset) the count of users
    * active that week — the retention matrix behind every engagement
    * dashboard. Plan: the first-touch week comes from a per-user
    * `min() OVER (PARTITION BY user_id)` window rather than an
    * aggregate-plus-join-back, so the event table is scanned ONCE and
    * shuffled once (an unframed partition-min needs no sort — Spark
    * plans a hash-partitioned window without ordering); then a distinct
    * on the narrow (user, cohort, offset) triple piggybacks on the same
    * partitioning, and the final rollup is tiny.
    */
  def q69(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    Tables.events(s, dir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .withColumn("cohort", min("wk").over(w))
      .select(col("user_id"), col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("long").as("week_offset"))
      .distinct()
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val q69Sql: String =
    """WITH e AS (
      | SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
      |f AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id),
      |a AS (
      | SELECT DISTINCT e.user_id, f.cohort,
      |  date_diff('day', f.cohort, e.wk) // 7 AS week_offset
      | FROM e JOIN f USING (user_id))
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
      | CAST(week_offset AS BIGINT) AS week_offset, COUNT(*) AS n_users
      |FROM a GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** q76 — trailing-window event rate: for every event, how many events
    * the same user produced in the preceding hour (inclusive) — the
    * rate-limiting / burst-detection primitive. A RANGE frame over
    * event-time microseconds (not a ROWS frame: simultaneous events
    * must count together regardless of tie order, which also makes the
    * result deterministic under ties). One shuffle on user_id + one
    * sorted pass; Spark evaluates the sliding frame incrementally, so
    * cost is O(events), not O(events × window size).
    */
  def q76(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("n_trailing_1h", count(lit(1)).over(w))
      .select("user_id", "event_id", "n_trailing_1h")
      .orderBy("user_id", "event_id")
  }

  val q76Sql: String =
    """SELECT user_id, event_id,
      | COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_trailing_1h
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** q77 — top event paths: the most frequent ordered 3-step
    * event-type sequences across users (path/sequence mining lite —
    * "what do users actually do, in what order"). Both lead() offsets
    * come out of ONE sorted window pass over the same (ts, event_id)
    * frame (Spark plans a single Window operator), the path string is
    * built map-side, and the count + top-10 is the q70 shape: one
    * shuffle keyed by the small distinct-path space, then
    * `TakeOrderedAndProject`.
    */
  def q77(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("path"))
      .limit(10)
  }

  val q77Sql: String =
    """WITH p AS (
      | SELECT event_type || '>' ||
      |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |  || '>' ||
      |  lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |  AS path
      | FROM events
      | QUALIFY lead(event_type, 2) OVER
      |   (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NOT NULL)
      |SELECT path, COUNT(*) AS n FROM p
      |GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin

  /** q79 — ratio-to-report: each (user, event_type)'s share of that
    * user's total spend — the windowed percent-of-total every BI layer
    * ships. Computed OVER THE AGGREGATE (a per-user window on the
    * already-grouped table), so the window input is one row per
    * (user, type), not per event — the cheap shape. Sums ride the
    * decimal pattern (exact, order-free); the final share divides two
    * exact doubles and is rounded (summation-order guard is unneeded
    * for the values but keeps the oracle compare byte-stable).
    */
  def q79(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("value").cast(dec6)).as("sv"))
      .withColumn("share",
        round(col("sv").cast("double") /
          sum(col("sv")).over(w).cast("double"), 6))
      .select(col("user_id"), col("event_type"),
        col("sv").cast("double").as("sum_value"), col("share"))
      .orderBy("user_id", "event_type")
  }

  val q79Sql: String =
    """WITH a AS (
      | SELECT user_id, event_type, SUM(CAST(value AS DECIMAL(18,6))) AS sv
      | FROM events GROUP BY user_id, event_type)
      |SELECT user_id, event_type, CAST(sv AS DOUBLE) AS sum_value,
      | round(CAST(sv AS DOUBLE)
      |   / CAST(SUM(sv) OVER (PARTITION BY user_id) AS DOUBLE), 6) AS share
      |FROM a ORDER BY user_id, event_type""".stripMargin

  /** q120 — first-order Markov transition matrix over the event stream:
    * `P(next_type | event_type)` from per-user consecutive pairs — the
    * model behind next-action prediction, anomalous-session scoring,
    * and the q77 path report's probabilistic upgrade. One shuffle on
    * user_id for the lead window (same frame as q56, so a shared-scan
    * pipeline would reuse its sort), then the pair counts collapse into
    * a |types|²-bounded aggregate with map-side combine; row
    * probabilities join the per-row totals BROADCAST (the matrix is
    * tiny at any corpus size). The count ratio is one double division
    * rounded to 4 decimals — q51's determinism rule.
    */
  def q120(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("cur"), col("next_type").as("nxt"))
      .agg(count(lit(1)).as("cnt"))
    val tot = trans.groupBy("cur").agg(sum("cnt").as("tot"))
    trans.join(broadcast(tot), "cur")
      .select(col("cur"), col("nxt"), col("cnt"),
        round(col("cnt").cast("double") / col("tot").cast("double"), 4).as("p"))
      .orderBy("cur", "nxt")
  }

  val q120Sql: String =
    """WITH t AS (
      | SELECT event_type AS cur, lead(event_type) OVER (
      |   PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS nxt
      | FROM events),
      |c AS (
      | SELECT cur, nxt, count(*) AS cnt FROM t
      | WHERE nxt IS NOT NULL GROUP BY cur, nxt),
      |tot AS (SELECT cur, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY cur)
      |SELECT cur, nxt, cnt,
      | round(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE), 4) AS p
      |FROM c JOIN tot USING (cur) ORDER BY cur, nxt""".stripMargin

  /** q125 — keyed snapshot diff ([[graft.operators.Diff.snapshotDiff]]):
    * per-(user, event_type) activity state observed in the first half of
    * January vs the second, classified added / removed / changed /
    * unchanged with old and new counts side by side — the table-diff
    * every replication checker and backfill audit runs, and the INVERSE
    * of q116 (CDC applies a log; the diff derives one). All four
    * classes are genuinely populated: users active only-early, only-late,
    * with shifted counts, and with identical counts.
    *
    * Scale shape: each snapshot is one keyed agg with map-side combine;
    * the diff itself is ONE full outer join with both sides
    * co-partitioned on the same key — the minimal movement a keyed diff
    * can have; classification is a map-side CASE.
    */
  def q125(s: SparkSession, dir: String): DataFrame = {
    val split = "2024-01-16"
    val ev = Tables.events(s, dir)
    def counts(f: org.apache.spark.sql.Column): DataFrame = ev.filter(f)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    graft.operators.Diff.snapshotDiff(
      counts(col("ts") < lit(split)), counts(col("ts") >= lit(split)),
      Seq("user_id", "event_type"), Seq("cnt"))
      .orderBy("user_id", "event_type")
  }

  val q125Sql: String =
    """WITH a AS (
      | SELECT user_id, event_type, COUNT(*) AS cnt FROM events
      | WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1, 2),
      |b AS (
      | SELECT user_id, event_type, COUNT(*) AS cnt FROM events
      | WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1, 2)
      |SELECT coalesce(a.user_id, b.user_id) AS user_id,
      | coalesce(a.event_type, b.event_type) AS event_type,
      | CASE WHEN a.user_id IS NULL THEN 'added'
      |      WHEN b.user_id IS NULL THEN 'removed'
      |      WHEN a.cnt = b.cnt THEN 'unchanged'
      |      ELSE 'changed' END AS change,
      | a.cnt AS old_cnt, b.cnt AS new_cnt
      |FROM a FULL OUTER JOIN b
      |  ON a.user_id = b.user_id AND a.event_type = b.event_type
      |ORDER BY user_id, event_type""".stripMargin

  /** q134 — recency-decayed user activity score (feature-engineering /
    * mixing-weight op): per user, `Σ value · 2^-(days since event)`,
    * anchored at the corpus-wide max event day. Two determinism rules
    * compose here:
    *  - the decay base is a POWER OF TWO on an INTEGER day delta —
    *    division by 2^d is EXACT in IEEE (q117's lesson: no
    *    transcendental ever reaches a hash-compared column; exp(-λΔ)
    *    would diverge between libm implementations). Deltas cap at 62
    *    (shift-safe; far below that the terms vanish numerically);
    *  - the per-user sum is a FIXED-ORDER left fold over the terms
    *    sorted by event_id (`sort_array(collect_list)` + `aggregate`,
    *    replayed by DuckDB `list_sum(list(... ORDER BY event_id))` —
    *    the q27-family fold-parity pattern). The decimal-sum pattern
    *    does NOT work for these terms: value/2^d has up to 64 decimal
    *    digits, so any fixed decimal scale rounds, and the engines'
    *    tie rules differ (HALF_UP vs HALF_EVEN — observed 1-ulp
    *    divergence at DECIMAL(18,9)).
    * Scale: one scan, broadcast one-row max-day, one user-keyed agg
    * (per-user term list held once during the fold — same memory class
    * as the per-user sorted windows used across the event queries).
    */
  def q134(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"), col("event_id"),
      col("value"), expr("unix_micros(ts) div 86400000000").as("day"))
    val maxDay = e.agg(max(col("day")).as("maxday"))
    e.crossJoin(broadcast(maxDay))
      .withColumn("term", col("value") /
        expr("cast(shiftleft(1L, cast(least(maxday - day, 62L) as int)) as double)"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col("event_id"), col("term")))).as("arr"))
      .select(col("user_id"), col("n_events"),
        aggregate(col("arr"), lit(0.0),
          (acc, x) => acc + x.getField("term")).as("decay_score"))
      .orderBy("user_id")
  }

  val q134Sql: String =
    """WITH e AS (
      | SELECT user_id, event_id, value,
      |  epoch_us(ts) // 86400000000 AS day FROM events),
      |m AS (SELECT MAX(day) AS maxday FROM e)
      |SELECT user_id, COUNT(*) AS n_events,
      | list_sum(list(value / CAST(1::BIGINT << LEAST(maxday - day, 62) AS DOUBLE)
      |   ORDER BY event_id)) AS decay_score
      |FROM e, m GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q154 — time-series gap fill + forward fill: each sampled user's
    * hourly activity is densified to a complete hour grid between that
    * user's first and last event, absent hours are FILLED with the last
    * observed hourly sum carried forward (the standard
    * state-metric/resample treatment before any per-hour model sees the
    * series — a learner reading the sparse table would silently treat
    * "no row" as "no signal"). Output: the grid row, the raw hour's
    * sum (NULL on gaps), the carried value, and the filled flag.
    *
    * Determinism: the hourly sum uses the decimal-sum pattern (q16's
    * dec6 rule) so the carried double is bit-identical in both engines;
    * the user sample is the deterministic `user_id % 20` cut (the q42
    * content-keyed principle — no RNG).
    *
    * Scale shape: the grid explodes map-side from each user's (min,
    * max) hour pair — never a global calendar cross join; the observed
    * join is a (user, hour) equi-join; the forward-fill window is
    * per-user ordered by hour, bounded by one user's activity span
    * (the q56 lag/lead discipline: a user's history fits a partition;
    * billions of USERS distribute, hours per user do not explode).
    */
  def q154(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("user_id") % 20 === 0)
    val hourly = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec6)).cast("double").as("sum_value"))
    val grid = ev
      .groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("ffill_value", last(col("sum_value"), ignoreNulls = true).over(w))
      .select(col("user_id"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm").as("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("sum_value"), col("ffill_value"),
        col("sum_value").isNull.as("filled"))
      .orderBy("user_id", "hour")
  }

  val q154Sql: String =
    """WITH ev AS (
      | SELECT user_id, ts, value FROM events WHERE user_id % 20 = 0),
      |hourly AS (
      | SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      | FROM ev GROUP BY 1, 2),
      |grid AS (
      | SELECT user_id,
      |  unnest(generate_series(date_trunc('hour', MIN(ts)),
      |                         date_trunc('hour', MAX(ts)),
      |                         INTERVAL 1 HOUR)) AS hour
      | FROM ev GROUP BY user_id),
      |j AS (
      | SELECT g.user_id, g.hour, h.n_events, h.sum_value
      | FROM grid g LEFT JOIN hourly h
      |   ON g.user_id = h.user_id AND g.hour = h.hour)
      |SELECT user_id, strftime(hour, '%Y-%m-%d %H:%M') AS hour,
      | COALESCE(n_events, 0) AS n_events, sum_value,
      | last_value(sum_value IGNORE NULLS)
      |   OVER (PARTITION BY user_id ORDER BY hour
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value,
      | sum_value IS NULL AS filled
      |FROM j ORDER BY user_id, hour""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q154_gap_fill" -> (q154 _),
    "q134_decay_score" -> (q134 _),
    "q125_snapshot_diff" -> (q125 _),
    "q120_markov_transitions" -> (q120 _),
    "q16_hourly_rollup" -> (q16 _),
    "q17_sessionization" -> (q17 _),
    "q18_json_extract" -> (q18 _),
    "q33_asof_join" -> (q33 _),
    "q40_sliding_window" -> (q40 _),
    "q56_event_deltas" -> (q56 _),
    "q60_interval_join" -> (q60 _),
    "q65_attribution_join" -> (q65 _),
    "q67_funnel" -> (q67 _),
    "q69_cohort_retention" -> (q69 _),
    "q76_trailing_rate" -> (q76 _),
    "q77_event_paths" -> (q77 _),
    "q79_share_of_user" -> (q79 _))

  val oracles: Map[String, String] = Map(
    "q154_gap_fill" -> q154Sql,
    "q134_decay_score" -> q134Sql,
    "q125_snapshot_diff" -> q125Sql,
    "q120_markov_transitions" -> q120Sql,
    "q16_hourly_rollup" -> q16Sql,
    "q17_sessionization" -> q17Sql,
    "q18_json_extract" -> q18Sql,
    "q33_asof_join" -> q33Sql,
    "q40_sliding_window" -> q40Sql,
    "q56_event_deltas" -> q56Sql,
    "q60_interval_join" -> q60Sql,
    "q65_attribution_join" -> q65Sql,
    "q67_funnel" -> q67Sql,
    "q69_cohort_retention" -> q69Sql,
    "q76_trailing_rate" -> q76Sql,
    "q77_event_paths" -> q77Sql,
    "q79_share_of_user" -> q79Sql)
}
