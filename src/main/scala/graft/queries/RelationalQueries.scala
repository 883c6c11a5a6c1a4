package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator coverage (SURVEY.md §2.1–§2.7) expressed over the
  * driver testdata, each with a DuckDB oracle.
  *
  * Float-sum determinism: every SUM over doubles first casts each addend to
  * DECIMAL (exact, associative) and casts the final sum back to DOUBLE, so
  * Spark's partition-order-dependent summation matches the oracle
  * bit-for-bit. Per-row double arithmetic needs no such care (IEEE ops are
  * deterministic). Dates/timestamps are emitted as formatted strings to
  * avoid tz-encoding mismatches between parquet writers.
  */
object RelationalQueries {
  // Exact-decimal money arithmetic: inputs are cast to decimal ONCE (a
  // deterministic rounding of each double, far from any half-boundary with
  // overwhelming probability), then every multiply/sum stays in exact
  // decimal — associative, so Spark's partition order can't change the
  // result — and only the final value is cast back to double.
  // Widths chosen so the triple product eps*disc*tax stays under Spark's
  // decimal precision cap (38): (12,2)*(6,4)*(6,4) → (26,10) — no silent
  // precision-loss rounding on either engine.
  private val money = DecimalType(12, 2)
  private val rate = DecimalType(8, 4)
  private val factor = DecimalType(6, 4)
  // Products are re-cast to scale 6 before SUM: at scale 6 the scaled sum
  // stays < 2^53, where decimal→double conversion is correctly rounded in
  // every engine (DuckDB's cast at scale 10 is off by 1 ulp for ~1e18-scaled
  // sums). Lossless: inputs are 2-decimal, so products have scale ≤ 6.
  private val sumable = DecimalType(18, 6)
  private def eps = col("l_extendedprice").cast(money)
  private def discFactor = (lit(1) - col("l_discount").cast(rate)).cast(factor)
  private def taxFactor = (lit(1) + col("l_tax").cast(rate)).cast(factor)

  /** q01 — TPC-H Q1-style pricing summary. Covers: group-agg with map-side
    * partial aggregation, predicate pushdown to parquet (SURVEY §2.4, P4).
    */
  def q01(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") < to_timestamp(lit("1998-09-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(money)).cast("double").as("sum_qty"),
        sum(eps).cast("double").as("sum_base_price"),
        sum((eps * discFactor).cast(sumable)).cast("double").as("sum_disc_price"),
        sum((eps * discFactor * taxFactor).cast(sumable)).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(6,4)) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(6,4)) * CAST(1 + CAST(l_tax AS DECIMAL(8,4)) AS DECIMAL(6,4)) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      | COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — TPC-H Q5-style revenue by nation: 4-way join with broadcast
    * dimensions (J1/J2 chain; SURVEY §2.3). nation/region are broadcast so
    * the only shuffle is the final group-by.
    */
  def q02(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(
        sum((eps * discFactor).cast(sumable)).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  val q02Sql: String =
    """SELECT n_name,
      | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(6,4)) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** q03 — top-10 orders by revenue (TPC-H Q3 shape): join + agg + global
    * top-k (TakeOrderedAndProject — no full sort at scale; SURVEY §2.5 W1).
    * Revenue summed in decimal so the ORDER BY is engine-independent.
    */
  def q03(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    // Aggregate BELOW the join (Catalyst won't push it): revenue is fully
    // determined by l_orderkey alone (o_orderdate is functionally
    // dependent on the join key), so the join consumes |orders| pre-
    // aggregated rows instead of |lineitem| raw rows — the gap widens
    // with scale (lineitem is ~4× orders in TPC-H).
    val rev = li.groupBy(col("l_orderkey"))
      .agg(sum((eps * discFactor).cast(sumable)).as("rev_dec"))
    rev.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("rev_dec").cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(6,4)) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** q04 — keep-first-per-key dedup via row_number window (the reference's
    * primary-address dedup, SURVEY §2.4 A4 / lib/pipeline_controller.py:176-181).
    */
  def q04(s: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in this testdata — the order
    // must be total (tie-broken to a unique key) for keep-first to be
    // deterministic across engines.
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .orderBy("l_orderkey")
  }

  val q04Sql: String =
    """SELECT l_orderkey, l_partkey, l_suppkey, l_quantity FROM (
      | SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |   ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity) AS rn
      | FROM lineitem) t
      |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin

  /** q05 — incremental watermark scan: half-open time range + IS NOT NULL +
    * ORDER BY + LIMIT, the reference's Sierra poll query shape
    * (helpers/query_helper.py:16-25; SURVEY §2.1 S1, §2.2 P4, §2.5 W1).
    */
  def q05(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1996-07-01")) &&
        col("o_orderdate").isNotNull)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("order_ts"),
        col("o_totalprice"))
      .orderBy(col("order_ts"), col("o_orderkey"))
      .limit(500)

  val q05Sql: String =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts, o_totalprice
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND o_orderdate IS NOT NULL
      |ORDER BY order_ts, o_orderkey LIMIT 500""".stripMargin

  /** q06 — IN-list predicate (reference's Redshift IN-list pushdown shape,
    * SURVEY §2.2 P5).
    */
  def q06(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  val q06Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      |ORDER BY c_custkey""".stripMargin

  /** q07 — anti join: customers with no orders (the reference's
    * missing-key set difference, SURVEY §2.6 SO1 / §2.3 J7).
    */
  def q07(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val q07Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** q08 — semi join: orders of BUILDING-segment customers (IN-list
    * semi-join pushdown S3; SURVEY §2.1).
    */
  def q08(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy("o_orderkey")
  }

  val q08Sql: String =
    """SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM customer
      |              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
      |ORDER BY o_orderkey""".stripMargin

  /** q09 — stream-static-style broadcast left join + coalesce enrichment
    * (the reference's Redshift lookup joins J3/J5; SURVEY §2.3).
    */
  def q09(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("c_name"), lit("UNKNOWN")).as("cust_name"),
        coalesce(col("c_mktsegment"), lit("none")).as("segment"),
        col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  val q09Sql: String =
    """SELECT o_orderkey, COALESCE(c_name, 'UNKNOWN') AS cust_name,
      | COALESCE(c_mktsegment, 'none') AS segment, o_totalprice
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** q10 — the reference's empty/'none' → NULL normalization rule applied
    * verbatim (helpers/query_helper.py:8-10; SURVEY §2.2 P1), then a
    * null-grouping aggregate.
    */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val norm = when(length(trim(col("event_type"))) === 0 ||
        trim(col("event_type")) === "none", lit(null))
      .otherwise(trim(col("event_type")))
    Tables.events(s, dir)
      .select(norm.as("event_type_norm"))
      .groupBy("event_type_norm")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type_norm")
  }

  val q10Sql: String =
    """SELECT CASE WHEN LENGTH(TRIM(event_type)) = 0 OR TRIM(event_type) = 'none'
      |            THEN NULL ELSE TRIM(event_type) END AS event_type_norm,
      | COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY event_type_norm""".stripMargin

  /** q11 — null-safe '_'-separated concat + digest, the reference's
    * address_hash_plaintext construction (lib/pipeline_controller.py:189-194;
    * SURVEY §2.7 F2). concat+coalesce (NOT concat_ws) preserves empty slots.
    */
  def q11(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        md5(concat(
          col("c_custkey").cast("string"), lit("_"),
          coalesce(col("c_name"), lit("")), lit("_"),
          coalesce(col("c_mktsegment"), lit("")))).as("row_hash"))
      .orderBy("c_custkey")

  val q11Sql: String =
    """SELECT c_custkey,
      | md5(CAST(c_custkey AS VARCHAR) || '_' || COALESCE(c_name, '') || '_' ||
      |     COALESCE(c_mktsegment, '')) AS row_hash
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** q12 — min/max/count stall guard (the reference's watermark-advance
    * check, lib/pipeline_controller.py:150-162; SURVEY §2.4 A1).
    */
  def q12(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .agg(
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("min_ts"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("max_ts"),
        count(lit(1)).as("n_rows"))

  val q12Sql: String =
    """SELECT strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_ts,
      | strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_ts,
      | COUNT(*) AS n_rows
      |FROM orders""".stripMargin

  /** q13 — conditional counting (geocode success-rate counter A6;
    * SURVEY §2.4).
    */
  def q13(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("n_big"),
        sum(when(col("l_discount") === 0.0, 1L).otherwise(0L)).as("n_nodisc"),
        count(lit(1)).as("n_total"))
      .orderBy("l_returnflag")

  val q13Sql: String =
    """SELECT l_returnflag,
      | CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      | CAST(SUM(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nodisc,
      | COUNT(*) AS n_total
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q14 — multi-key sort + limit (the reference's dedup-priority ORDER BY,
    * helpers/query_helper.py:30; SURVEY §2.5 W2). Tie-broken to a unique
    * key so row order is engine-independent.
    */
  def q14(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
      .orderBy(asc("l_returnflag"), desc("ship_date"), asc("l_orderkey"), asc("l_linenumber"))
      .limit(100)

  val q14Sql: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag,
      | strftime(l_shipdate, '%Y-%m-%d') AS ship_date
      |FROM lineitem
      |ORDER BY l_returnflag ASC, ship_date DESC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 100""".stripMargin

  /** q15 — scalar shaping: substring, regex strip, two-step int→string cast
    * (SURVEY §2.7 F4/F5/F13).
    */
  def q15(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        substring(col("p_name"), 1, 10).as("name10"),
        regexp_replace(col("p_type"), "[aeiou]", "").as("type_novowel"),
        upper(col("p_brand")).as("brand_upper"),
        col("p_size").cast("long").cast("string").as("size_str"))
      .orderBy("p_partkey")

  val q15Sql: String =
    """SELECT p_partkey, substr(p_name, 1, 10) AS name10,
      | regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel,
      | upper(p_brand) AS brand_upper,
      | CAST(CAST(p_size AS BIGINT) AS VARCHAR) AS size_str
      |FROM part ORDER BY p_partkey""".stripMargin

  /** q31 — relational set operations (EXCEPT / INTERSECT / UNION ALL;
    * extension beyond the reference's set-difference SO1, SURVEY §2.6).
    */
  def q31(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val withOrders = Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")).distinct()
    val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val machinery = c.filter(col("c_mktsegment") === "MACHINERY").select("c_custkey")
    val exceptCount = building.except(withOrders)
      .agg(count(lit(1)).as("n")).withColumn("tag", lit("building_no_orders"))
    val intersectCount = machinery.intersect(withOrders)
      .agg(count(lit(1)).as("n")).withColumn("tag", lit("machinery_with_orders"))
    exceptCount.unionByName(intersectCount)
      .select("tag", "n").orderBy("tag")
  }

  val q31Sql: String =
    """SELECT 'building_no_orders' AS tag, COUNT(*) AS n FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  EXCEPT SELECT DISTINCT o_custkey FROM orders)
      |UNION ALL
      |SELECT 'machinery_with_orders' AS tag, COUNT(*) AS n FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      |  INTERSECT SELECT DISTINCT o_custkey FROM orders)
      |ORDER BY tag""".stripMargin

  /** q32 — ROLLUP aggregation (grouping-sets family; extension — the
    * reference has no grouped aggregation at all, SURVEY §2.4). Subtotal
    * rows surface via coalesce to 'ALL' so null-ordering differences
    * between engines can't skew the compare.
    *
    * Plan choice: built-in `rollup` replicates every input row once per
    * grouping set (3× the scan feeding the shuffle). The finest-level
    * aggregate is tiny and the decimal sums are associative, so subtotals
    * are RE-aggregated from it instead — one pass over the data, then
    * ~|groups| rows of extra work. Bit-identical results.
    */
  def q32(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum((eps * discFactor).cast(sumable)).as("rev_dec"),
        count(lit(1)).as("n"))
    // NULL group keys must surface as 'ALL' at every level, exactly as the
    // oracle's COALESCE does — raw NULLs here would hash-diverge on data
    // with nullable keys even though the aggregates match.
    val fine = base.select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
      coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
      col("rev_dec"), col("n"))
    val byFlag = base.groupBy(col("l_returnflag"))
      .agg(sum(col("rev_dec")).as("rev_dec"), sum(col("n")).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        lit("ALL").as("linestatus"), col("rev_dec"), col("n"))
    val total = base.agg(sum(col("rev_dec")).as("rev_dec"), sum(col("n")).as("n"))
      .select(lit("ALL").as("returnflag"), lit("ALL").as("linestatus"),
        col("rev_dec"), col("n"))
    fine.unionByName(byFlag).unionByName(total)
      .select(col("returnflag"), col("linestatus"),
        col("rev_dec").cast("double").as("revenue"), col("n"))
      .orderBy("returnflag", "linestatus")
  }

  val q32Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      | COALESCE(l_linestatus, 'ALL') AS linestatus,
      | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(6,4)) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      | COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** q39 — correlated subqueries from pure SQL: a scalar COUNT subquery
    * and an EXISTS predicate per customer row. Exercises Catalyst's
    * decorrelation (RewriteCorrelatedScalarSubquery / RewritePredicate-
    * Subquery): both rewrite to aggregated/semi left joins — a plan shape
    * nothing else in the inventory produces. COUNT/EXISTS are exact, so
    * the oracle is dialect-safe (no float aggregation).
    */
  val q39Sql: String =
    """SELECT c_custkey,
      | (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
      | CAST(EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 200000) AS INT) AS has_big_order
      |FROM customer c ORDER BY c_custkey""".stripMargin

  def q39(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(q39Sql)
  }

  /** q62 — per-group running total: cumulative customer spend in order
    * date order (SURVEY §2.5 window family, the frame-aggregate
    * complement to q53's ranking and q48's GLOBAL prefix sum — here the
    * window HAS a partition key, so Spark plans a hash-partitioned
    * per-group sort, which scales; only the partitionless form needs
    * PrefixSum's two-pass rewrite). Decimal-sum pattern for the running
    * double aggregate (see class Scaladoc).
    */
  def q62(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("cum_spend"))
      .orderBy("o_custkey", "order_date", "o_orderkey")
  }

  val q62Sql: String =
    """SELECT o_orderkey, o_custkey,
      | strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_spend
      |FROM orders ORDER BY o_custkey, order_date, o_orderkey""".stripMargin

  /** q102 — Morton (Z-order) key encoding over
    * `(l_orderkey, l_partkey)` ([[graft.functions.ZOrder]]): the
    * z-value every multi-column clustered layout sorts by
    * ([[graft.operators.Bucketing.zOrderedWrite]] is the write-side
    * consumer; BucketingSpec proves the two-dimensional file-pruning
    * win). Gated here as a query because the code itself must be
    * engine-exact: 16-bit proportional bucketization (exact BIGINT
    * product, one correctly-rounded division, floor) then the
    * magic-number bit-interleave — all codegen'd bitwise builtins,
    * map-side, zero shuffle beyond the one-row domain agg broadcast
    * back.
    */
  def q102(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ZOrder
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val st = li.agg(min("l_orderkey").as("mna"), max("l_orderkey").as("mxa"),
      min("l_partkey").as("mnb"), max("l_partkey").as("mxb"))
    li.crossJoin(broadcast(st))
      .select(col("l_orderkey"), col("l_linenumber"),
        ZOrder.morton16(
          ZOrder.bucket16(col("l_orderkey"), col("mna"), col("mxa")),
          ZOrder.bucket16(col("l_partkey"), col("mnb"), col("mxb"))).as("zval"))
      .orderBy("l_orderkey", "l_linenumber", "zval")
  }

  val q102Sql: String =
    """WITH st AS (
      | SELECT min(l_orderkey) AS mna, max(l_orderkey) AS mxa,
      |        min(l_partkey) AS mnb, max(l_partkey) AS mxb
      | FROM lineitem),
      |b AS (
      | SELECT l_orderkey, l_linenumber,
      |  CAST(floor((l_orderkey - mna) * 65536 / (mxa - mna + 1)) AS BIGINT) AS ba,
      |  CAST(floor((l_partkey - mnb) * 65536 / (mxb - mnb + 1)) AS BIGINT) AS bb
      | FROM lineitem, st),
      |c1 AS (SELECT l_orderkey, l_linenumber,
      |  ((ba | (ba << 8)) & 16711935) AS sa, ((bb | (bb << 8)) & 16711935) AS sb
      | FROM b),
      |c2 AS (SELECT l_orderkey, l_linenumber,
      |  ((sa | (sa << 4)) & 252645135) AS sa, ((sb | (sb << 4)) & 252645135) AS sb
      | FROM c1),
      |c3 AS (SELECT l_orderkey, l_linenumber,
      |  ((sa | (sa << 2)) & 858993459) AS sa, ((sb | (sb << 2)) & 858993459) AS sb
      | FROM c2),
      |c4 AS (SELECT l_orderkey, l_linenumber,
      |  ((sa | (sa << 1)) & 1431655765) AS sa, ((sb | (sb << 1)) & 1431655765) AS sb
      | FROM c3)
      |SELECT l_orderkey, l_linenumber, (sa | (sb << 1)) AS zval
      |FROM c4 ORDER BY l_orderkey, l_linenumber, zval""".stripMargin

  /** q103 — data-contract audit (the Deequ/expectations pattern): one
    * report row per declared constraint — row count, per-column
    * completeness, key uniqueness, value-domain membership, numeric
    * range, referential integrity against a dimension — with the
    * measured metric and a pass/fail verdict. The pre-ingest gate every
    * production pipeline runs before trusting a new drop of data.
    *
    * Scale shape: ALL per-row checks ride ONE conditional-aggregation
    * pass over the fact table (map-side partials to a single row);
    * uniqueness is the one exact distinct-count (key-bounded shuffle);
    * referential integrity is a broadcast left-semi count against the
    * dimension. The report itself is a `stack` unpivot of that
    * one-row frame — adding a constraint adds a column to the agg, not
    * a pass over the data. Metrics are exact count ratios (single IEEE
    * division) — engine-identical with no rounding.
    */
  def q103(s: SparkSession, dir: String): DataFrame =
    graft.operators.Audit.ordersContract(
      Tables.orders(s, dir), Tables.customer(s, dir))

  /** q135 — join-key skew audit ([[graft.operators.Audit.keySkew]]):
    * heaviest-key share and key-frequency Gini for the two keys this
    * schema would actually shuffle on at scale (events.user_id — fan-in
    * stream key; lineitem.l_suppkey — fact-to-dim join key). The
    * pre-join skew diagnosis that decides whether a key needs
    * `Skew.adaptiveSaltedAggregate` before a 100 TB shuffle. Oracle
    * replays the rank with a window (oracle-side only; the operator
    * uses PrefixSum's two-pass scan precisely to avoid that single-task
    * global window at scale).
    */
  def q135(s: SparkSession, dir: String): DataFrame =
    graft.operators.Audit.keySkew(Tables.events(s, dir), "user_id", "events.user_id")
      .unionAll(graft.operators.Audit.keySkew(
        Tables.lineitem(s, dir), "l_suppkey", "lineitem.l_suppkey"))
      .orderBy("dataset")

  val q135Sql: String = {
    def ctes(i: Int, table: String, key: String): String =
      s"""f$i AS (SELECT CAST($key AS BIGINT) AS k, COUNT(*) AS cnt
         |        FROM $table WHERE $key IS NOT NULL GROUP BY 1),
         |r$i AS (SELECT k, cnt, row_number() OVER (ORDER BY cnt, k) AS rk FROM f$i),
         |t$i AS (SELECT k AS top_key, cnt AS top_cnt FROM f$i
         |        ORDER BY cnt DESC, k DESC LIMIT 1),
         |a$i AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
         |          CAST(SUM(rk * cnt) AS BIGINT) AS s FROM r$i)""".stripMargin
    def sel(i: Int, label: String): String =
      s"""SELECT '$label' AS dataset, n_rows, n_keys, top_key, top_cnt,
         | round(CAST(top_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE), 4) AS top_share,
         | round((2.0 * CAST(s AS DOUBLE))
         |     / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE))
         |   - CAST(n_keys + 1 AS DOUBLE) / CAST(n_keys AS DOUBLE), 4) AS gini
         |FROM a$i, t$i""".stripMargin
    "WITH " + ctes(1, "events", "user_id") + ",\n" +
      ctes(2, "lineitem", "l_suppkey") + "\n" +
      sel(1, "events.user_id") + "\nUNION ALL\n" +
      sel(2, "lineitem.l_suppkey") + "\nORDER BY dataset"
  }

  val q103Sql: String =
    """WITH b AS (
      | SELECT count(*) AS n, count(o_custkey) AS nn_cust,
      |  count(DISTINCT o_orderkey) AS nd_ok,
      |  sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS dom_ok,
      |  sum(CASE WHEN o_totalprice BETWEEN 0 AND 1000000 THEN 1 ELSE 0 END) AS rng_ok
      | FROM orders),
      |r AS (SELECT count(*) AS ri_ok FROM orders o
      |      WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |SELECT * FROM (
      | SELECT 'row_count' AS check_name, 'orders' AS target,
      |        CAST(n AS DOUBLE) AS metric, n > 0 AS passed FROM b
      | UNION ALL SELECT 'completeness', 'o_custkey',
      |        CAST(nn_cust AS DOUBLE) / n, nn_cust = n FROM b
      | UNION ALL SELECT 'uniqueness', 'o_orderkey',
      |        CAST(nd_ok AS DOUBLE) / n, nd_ok = n FROM b
      | UNION ALL SELECT 'domain', 'o_orderstatus',
      |        CAST(dom_ok AS DOUBLE) / n, dom_ok = n FROM b
      | UNION ALL SELECT 'range', 'o_totalprice',
      |        CAST(rng_ok AS DOUBLE) / n, rng_ok = n FROM b
      | UNION ALL SELECT 'ref_integrity', 'o_custkey',
      |        CAST(ri_ok AS DOUBLE) / n, ri_ok = n FROM b, r
      |) ORDER BY check_name, target""".stripMargin

  /** q106 — incremental aggregate maintenance
    * ([[graft.operators.IncrementalAgg]]): split orders at 2000-01-01
    * into "history" and "delta", aggregate each HALF independently into
    * per-customer partial states (count, exact decimal spend total,
    * last order date), and MERGE the states by key — the
    * materialized-view upkeep pattern where a daily run scans one day,
    * not the lake. The oracle aggregates the whole table in one pass:
    * green means state-merge ≡ recompute, which is exactly the
    * correctness contract incremental maintenance must prove. Decimal
    * sums make the totals order-independent, so the split point
    * provably doesn't leak into the result.
    */
  def q106(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def state(df: DataFrame): DataFrame = df.groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total"),
        max(col("o_orderdate")).as("last_order"))
    val split = "2000-01-01"
    val merged = graft.operators.IncrementalAgg.merge(
      state(o.filter(col("o_orderdate") < lit(split))),
      state(o.filter(col("o_orderdate") >= lit(split))),
      Seq("o_custkey"),
      Seq(("cnt", "sum"), ("total", "sum"), ("last_order", "max")))
    merged.select(col("o_custkey"), col("cnt"),
      col("total").cast("double").as("total"), col("last_order"))
      .orderBy("o_custkey")
  }

  val q106Sql: String =
    """SELECT o_custkey, COUNT(*) AS cnt,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      | MAX(o_orderdate) AS last_order
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** q107 — edit-distance-1 fuzzy self-join over customer names
    * ([[graft.operators.FuzzyJoin]]): SymSpell deletion-key bucketing +
    * candidate-only `levenshtein` verification, gated against the
    * brute-force all-pairs oracle — proving the bucketed plan loses no
    * pair while never forming the |rows|² cross join the oracle pays
    * for. The entity-resolution primitive for near-identical
    * names/titles/URLs.
    */
  def q107(s: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyJoin
      .selfJoinDist1(Tables.customer(s, dir), "c_custkey", "c_name")
      .orderBy("id_a", "id_b")

  val q107Sql: String =
    """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      | CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY id_a, id_b""".stripMargin

  /** q108 — SCD type-2 temporal dimension build
    * ([[graft.operators.Scd]]): collapse each customer's order-status
    * change log into versioned `[valid_from, valid_to)` intervals —
    * the table shape q33's as-of join and q60's interval join consume.
    * One hash shuffle on the key, two window passes on the same
    * partitioning (change-lag, then closing-lead), no self-join: the
    * build is bounded by the widest key's history at any corpus size.
    * Oracle replays the identical lag-filter-lead algebra in SQL —
    * green proves change collapse, interval closure, and version
    * ordinals all match exactly.
    */
  def q108(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scd.buildType2(
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          col("o_orderstatus")),
      keys = Seq("o_custkey"), seqCol = "o_orderdate",
      tie = Seq("o_orderkey"), attrs = Seq("o_orderstatus"))
      .orderBy("o_custkey", "version")

  val q108Sql: String =
    """WITH chg AS (
      | SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
      |  LAG(o_orderstatus) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev,
      |  ROW_NUMBER() OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      | FROM orders),
      |v AS (
      | SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
      | FROM chg WHERE rn = 1 OR prev IS DISTINCT FROM o_orderstatus)
      |SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
      | LEAD(o_orderdate) OVER (
      |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to,
      | ROW_NUMBER() OVER (
      |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS version
      |FROM v ORDER BY o_custkey, version""".stripMargin

  /** q141 — SCD2 as-of enrichment: each order annotated with the
    * customer's status VERSION standing 30 days earlier — the
    * canonical warehouse probe into the type-2 dimension q108 builds
    * (composition of [[graft.operators.Scd]] with the as-of interval
    * predicate). The probe is an equi-join on the entity key plus the
    * half-open interval filter (`valid_from ≤ d < valid_to`, open
    * version = null valid_to): per-key version counts are bounded by
    * per-key history, so the key hash join IS the scale-correct plan
    * (q60's binned interval join is for interval sides without a
    * selective key). At most one version matches (intervals partition
    * each key's timeline); early orders predate version 1 and keep
    * NULLs via the left join. All-exact types (timestamps, strings,
    * longs) — nothing to drift.
    */
  def q141(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val scd = graft.operators.Scd.buildType2(
      orders.select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderstatus")),
      keys = Seq("o_custkey"), seqCol = "o_orderdate",
      tie = Seq("o_orderkey"), attrs = Seq("o_orderstatus"))
      .select(col("o_custkey").as("k"), col("o_orderstatus").as("st"),
        col("valid_from"), col("valid_to"), col("version"))
    val facts = orders.select(col("o_orderkey"), col("o_custkey"),
      (col("o_orderdate") - expr("INTERVAL 30 DAYS")).as("asof"))
    facts.join(scd,
        facts("o_custkey") === scd("k") &&
          scd("valid_from") <= facts("asof") &&
          (scd("valid_to").isNull || scd("valid_to") > facts("asof")),
        "left")
      .select(col("o_orderkey"), col("o_custkey"),
        col("st").as("status_30d"), col("version").as("version_30d"))
      .orderBy("o_orderkey")
  }

  val q141Sql: String =
    """WITH chg AS (
      | SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
      |  LAG(o_orderstatus) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev,
      |  ROW_NUMBER() OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      | FROM orders),
      |v AS (
      | SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
      | FROM chg WHERE rn = 1 OR prev IS DISTINCT FROM o_orderstatus),
      |scd AS (
      | SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
      |  LEAD(o_orderdate) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to,
      |  CAST(ROW_NUMBER() OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS version
      | FROM v)
      |SELECT o.o_orderkey, o.o_custkey, s.o_orderstatus AS status_30d,
      | s.version AS version_30d
      |FROM orders o LEFT JOIN scd s ON s.o_custkey = o.o_custkey
      | AND s.valid_from <= o.o_orderdate - INTERVAL 30 DAY
      | AND (s.valid_to IS NULL OR s.valid_to > o.o_orderdate - INTERVAL 30 DAY)
      |ORDER BY o.o_orderkey""".stripMargin

  /** q109 — one-pass column profiler ([[graft.operators.Profile]]):
    * per-column row/non-null/exact-distinct counts, min/max (rendered
    * to string in one shared report schema), and mean rendered length,
    * over six `orders` columns in ONE aggregation pass. Exact distincts
    * make Catalyst plan the agg via `Expand` (×6 row stream before the
    * partial agg — the documented price of exactness; `exact = false`
    * swaps in HLL++ and collapses the plan back to one no-Expand pass
    * for 100 TB profiling). The float `o_totalprice` is pre-cast to
    * DECIMAL(18,2) so the min/max rendering is engine-portable.
    */
  def q109(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.profile(
      Tables.orders(s, dir)
        .withColumn("o_price", col("o_totalprice").cast(DecimalType(18, 2))),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
        "o_orderpriority", "o_price"))

  val q109Sql: String = {
    def block(c: String, src: String): String =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         | count($src) AS n_nonnull, count(DISTINCT $src) AS n_distinct,
         | CAST(min($src) AS VARCHAR) AS min_value,
         | CAST(max($src) AS VARCHAR) AS max_value,
         | avg(length(CAST($src AS VARCHAR))) AS avg_len FROM o2""".stripMargin
    val cols = Seq(
      "o_orderkey" -> "o_orderkey", "o_custkey" -> "o_custkey",
      "o_orderstatus" -> "o_orderstatus", "o_orderdate" -> "o_orderdate",
      "o_orderpriority" -> "o_orderpriority", "o_price" -> "o_price")
    s"""WITH o2 AS (
       | SELECT *, CAST(o_totalprice AS DECIMAL(18,2)) AS o_price FROM orders)
       |${cols.map { case (n, src) => block(n, src) }.mkString("\nUNION ALL\n")}
       |ORDER BY col_name""".stripMargin
  }

  /** q110 — per-node triangle counts over the part co-purchase graph
    * ([[graft.operators.Triangles]]): parts are linked when they appear
    * in the same order, and each node's triangle count — the local
    * clustering ingredient — comes from the degree-oriented
    * edge-iterator (adjacency intersection), the shape that bounds
    * per-key fanout by sqrt(m) instead of letting a celebrity node emit
    * degree² wedges. The edge list itself is built WITHOUT a fact-table
    * self-join: one groupBy collects each order's distinct parts
    * (map-side partial sets, lists bounded by TPC-H's ≤7 lineitems per
    * order) and the pairs form map-side from the sorted list — at
    * 100 TB the fact table shuffles once, keyed by order, instead of
    * twice through a join. The oracle replays the naive a<b<c
    * three-way join in SQL: green proves the oriented plan counts
    * exactly the same triangles while never materializing a hot node's
    * quadratic wedge set.
    */
  def q110(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey")
    // pair formation via double position explode + codegen element_at
    // projection (the r18 #5 form — the nested transform/flatten lambda
    // was interpreted per element); size >= 2 keeps both sequences
    // ascending. Pairs are (p[i], p[j]) for 1 <= i < j <= size, u < v
    // by the sort.
    val edges = li.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("p"))
      .filter(size(col("p")) >= 2)
      .select(col("p"), explode(sequence(lit(1), size(col("p")) - 1)).as("i"))
      .select(col("p"), col("i"),
        explode(sequence(col("i") + 1, size(col("p")))).as("j"))
      .select(element_at(col("p"), col("i")).as("u"),
        element_at(col("p"), col("j")).as("v"))
    graft.operators.Triangles.perNodeTriangles(edges, "u", "v")
  }

  val q110Sql: String =
    """WITH pairs AS (
      | SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      | FROM lineitem a JOIN lineitem b
      |   ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |tri AS (
      | SELECT e1.u AS a, e1.v AS b, e2.v AS c
      | FROM pairs e1
      | JOIN pairs e2 ON e1.v = e2.u
      | JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v)
      |SELECT node, count(*) AS n_tri FROM (
      | SELECT a AS node FROM tri
      | UNION ALL SELECT b FROM tri
      | UNION ALL SELECT c FROM tri)
      |GROUP BY node ORDER BY node""".stripMargin

  /** q114 — fuzzy dictionary lookup at edit distance ≤ 2
    * ([[graft.operators.FuzzyJoin.lookupDist]]): a 1%-of-table query
    * set (`c_custkey % 97 = 0` — deterministic, no RNG) corrected
    * against the full customer-name dictionary via 2-deletion SymSpell
    * keys + codegen levenshtein verification. The oracle brute-forces
    * |queries|×|dict| in DuckDB: green proves the deletion-key theorem
    * held at distance 2 (no lost match) while the Spark plan never
    * forms that product.
    */
  def q114(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val q = c.filter(col("c_custkey") % 97 === 0)
    graft.operators.FuzzyJoin
      .lookupDist(q, "c_custkey", "c_name", c, "c_custkey", "c_name", 2)
      .orderBy("q_id", "d_id")
  }

  val q114Sql: String =
    """SELECT q.c_custkey AS q_id, d.c_custkey AS d_id,
      | CAST(levenshtein(q.c_name, d.c_name) AS BIGINT) AS dist
      |FROM customer q JOIN customer d
      |  ON levenshtein(q.c_name, d.c_name) <= 2
      |WHERE q.c_custkey % 97 = 0
      |ORDER BY q_id, d_id""".stripMargin

  /** q115 — exact equi-depth histogram of order totals
    * ([[graft.operators.Histogram]]): 8 buckets of equal row count
    * under the total order (o_totalprice, o_orderkey), each reporting
    * its count and data-value extremes. Global rank rides PrefixSum's
    * two-pass parallel scan — the partitionless-window shape that
    * would otherwise single-task — and bucket cuts are exact integer
    * arithmetic on the rank, mirrored by the oracle's floor division.
    */
  def q115(s: SparkSession, dir: String): DataFrame =
    graft.operators.Histogram.equiDepth(
      Tables.orders(s, dir), "o_totalprice", "o_orderkey", 8)

  val q115Sql: String =
    """WITH r AS (
      | SELECT o_totalprice AS v,
      |  row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
      |  count(*) OVER () AS n
      | FROM orders)
      |SELECT CAST((rn - 1) * 8 // n AS BIGINT) + 1 AS bucket,
      | count(*) AS cnt, min(v) AS lo, max(v) AS hi
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** q116 — CDC log application ([[graft.operators.Cdc]]): the
    * lakehouse MERGE-INTO shape. The customer snapshot absorbs a
    * change log derived from orders (each order an upsert of its
    * customer's segment-attribute to the order priority; 'P'-status
    * orders are delete tombstones), last-writer-wins per key under
    * (o_orderdate, o_orderkey). The log collapses via struct-max — one
    * delta-bounded key shuffle with map-side partials, NO window sort —
    * and the untouched base arrives through a left anti join AQE can
    * broadcast. Oracle replays last-entry selection with a window +
    * NOT-IN in SQL: green proves upsert/tombstone/untouched routing and
    * the last-writer tiebreak all match exactly.
    */
  def q116(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("attr"))
    val log = Tables.orders(s, dir).select(
      col("o_custkey").as("k"), col("o_orderdate"), col("o_orderkey"),
      when(col("o_orderstatus") === "P", "D").otherwise("U").as("op"),
      col("o_orderpriority").as("attr"))
    graft.operators.Cdc.applyLog(base, log, Seq("k"),
      Seq("o_orderdate", "o_orderkey"), "op", Seq("attr"))
      .orderBy("k")
  }

  val q116Sql: String =
    """WITH log AS (
      | SELECT o_custkey AS k, o_orderdate, o_orderkey,
      |  CASE WHEN o_orderstatus = 'P' THEN 'D' ELSE 'U' END AS op,
      |  o_orderpriority AS attr
      | FROM orders),
      |last AS (
      | SELECT k, op, attr FROM (
      |  SELECT k, op, attr, row_number() OVER (
      |    PARTITION BY k ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM log) WHERE rn = 1)
      |SELECT c_custkey AS k, c_mktsegment AS attr, 'base' AS origin
      | FROM customer WHERE c_custkey NOT IN (SELECT k FROM last)
      |UNION ALL
      |SELECT k, attr, 'log' AS origin FROM last WHERE op <> 'D'
      |ORDER BY k""".stripMargin

  /** q119 — robust outlier report per order priority
    * ([[graft.operators.RobustStats]]): exact median, exact MAD
    * (`median(|v − median|)`), and the count of `> 3·MAD` outliers over
    * DECIMAL(18,2) order totals. The exact quantiles ride a
    * frequency-compressed `(group, value) → count` table — one
    * map-side-combined shuffle bounded by DISTINCT values, with the
    * per-group rank scan serialized only over that compressed table,
    * never the raw rows (the naive exact median sorts whole groups; at
    * 100 TB a handful of hot groups would each be one full-corpus-sized
    * task). percentile_disc rank semantics (element at ceil(n/2)) and
    * decimal arithmetic make every value exact — no interpolation, no
    * float, nothing for engine-ulp to flip.
    */
  def q119(s: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.groupedMedianMad(
      Tables.orders(s, dir).select(col("o_orderpriority"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("v")),
      "o_orderpriority", "v", k = 3)
      // exact decimals inside; double only at the output boundary (the
      // decimal→double cast is a single exactly-defined IEEE rounding,
      // mirrored in the oracle)
      .withColumn("median", col("median").cast("double"))
      .withColumn("mad", col("mad").cast("double"))

  val q119Sql: String =
    """WITH o AS (
      | SELECT o_orderpriority AS g, CAST(o_totalprice AS DECIMAL(18,2)) AS v
      | FROM orders),
      |m AS (
      | SELECT g, count(*) AS n,
      |  percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS med
      | FROM o GROUP BY g),
      |d AS (SELECT o.g, abs(v - med) AS dev FROM o JOIN m USING (g)),
      |m2 AS (
      | SELECT g, percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) AS mad
      | FROM d GROUP BY g)
      |SELECT g AS o_orderpriority, n,
      | CAST(med AS DOUBLE) AS median,
      | CAST(mad AS DOUBLE) AS mad,
      | (SELECT count(*) FROM d WHERE d.g = m.g AND d.dev > 3 * mad)
      |   AS n_outliers
      |FROM m JOIN m2 USING (g) ORDER BY g""".stripMargin

  /** q118 — sorted-neighborhood entity resolution
    * ([[graft.operators.FuzzyJoin.sortedNeighborhood]]): rank customers
    * by lowercased name (PrefixSum two-pass rank — no single-task
    * window), compare each against the next 5 in rank order via an
    * equi-join on rank blocks, keep pairs within edit distance 2. The
    * oracle replays the identical rank + windowed self-join in SQL
    * (row_number + rank-range join): green proves the block equi-join
    * finds exactly the in-window pairs the rank-range predicate
    * defines, while the Spark plan hashes blocks instead of
    * range-joining ranks.
    */
  def q118(s: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyJoin.sortedNeighborhood(
      Tables.customer(s, dir), "c_custkey", "c_name",
      window = 5, maxDist = 2)
      .orderBy("id_a", "id_b")

  val q118Sql: String =
    """WITH r AS (
      | SELECT c_custkey AS id, c_name AS name,
      |  row_number() OVER (ORDER BY lower(c_name), c_custkey) AS rn
      | FROM customer)
      |SELECT a.id AS id_a, b.id AS id_b,
      | CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
      |FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5
      |WHERE levenshtein(a.name, b.name) <= 2
      |ORDER BY id_a, id_b""".stripMargin

  /** q170 — sole-late-supplier attribution (the TPC-H Q21 shape over
    * this schema's columns: "late" = shipped > 60 days after the order
    * date): for multi-supplier orders where EXACTLY ONE supplier
    * shipped late, count the orders attributed to each such supplier —
    * the classic EXISTS / NOT-EXISTS composition, expressed as one
    * left_semi (another supplier exists on the order) and one
    * left_anti (no OTHER supplier is also late) against the same
    * distinct (order, supplier) frame.
    *
    * Scale shape: everything is keyed on l_orderkey — the semi and
    * anti probes co-shuffle with the late set on the same key (one
    * partitioning reused across both joins, AQE broadcasts the probe
    * sides when small); the supplier name attach is a broadcast; the
    * final count is a top-20 TakeOrderedAndProject, never a global
    * sort.
    */
  def q170(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"))
    val pairs = l.select("l_orderkey", "l_suppkey").distinct()
    val late = l
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("l_orderkey", "l_suppkey").distinct()
      .localCheckpoint()
    val hasOther = late.as("l1").join(
      pairs.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2")),
      col("l1.l_orderkey") === col("ok2") && col("l1.l_suppkey") =!= col("sk2"),
      "left_semi")
    val sole = hasOther.as("l1").join(
      late.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3")),
      col("l1.l_orderkey") === col("ok3") && col("l1.l_suppkey") =!= col("sk3"),
      "left_anti")
    sole.groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        Seq("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), asc("s_suppkey"))
      .limit(20)
  }

  val q170Sql: String =
    """WITH pairs AS (
      | SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      |late AS (
      | SELECT DISTINCT l_orderkey, l_suppkey
      | FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      | WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
      |sole AS (
      | SELECT l1.l_orderkey, l1.l_suppkey
      | FROM late l1
      | WHERE EXISTS (SELECT 1 FROM pairs p
      |               WHERE p.l_orderkey = l1.l_orderkey
      |                 AND p.l_suppkey <> l1.l_suppkey)
      |   AND NOT EXISTS (SELECT 1 FROM late l3
      |                   WHERE l3.l_orderkey = l1.l_orderkey
      |                     AND l3.l_suppkey <> l1.l_suppkey))
      |SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM sole JOIN supplier s ON sole.l_suppkey = s.s_suppkey
      |GROUP BY s.s_suppkey, s.s_name
      |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin

  /** q172 — RFM customer segmentation: each customer scored 1–4 on
    * Recency (days since last order, relative to the corpus max
    * date), Frequency (order count) and Monetary (total spend), each
    * by EXACT integer quartile rank (the q148 convention:
    * `(rank−1)·4 div n + 1` — no ntile, no percentile estimate), then
    * counted per RFM cell — the standard customer-base health matrix.
    *
    * Scale shape: one orders aggregation to customer grain; the three
    * quartile ranks come from PrefixSum two-pass scans (never a
    * global window over the customer table — the q148/q161/q163
    * discipline, three ranked orders so three scans); one final
    * map-side-combined cell count. All-integer once the per-customer
    * aggregates (counts, decimal-summed spend, day diffs) are fixed.
    */
  def q172(s: SparkSession, dir: String): DataFrame = {
    val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val o = Tables.orders(s, dir)
    val maxDateRow = o.agg(max(col("o_orderdate"))).head.get(0)
    val cust = o.groupBy(col("o_custkey"))
      .agg(datediff(lit(maxDateRow), max(col("o_orderdate"))).cast("long").as("rec_days"),
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast(dec2)).as("spend"))
    val n = cust.count()
    def quartile(df: DataFrame, orderCols: Seq[String], out: String): DataFrame = {
      val ranked = graft.operators.PrefixSum.withRunningTotalOrdered(
        df.withColumn("__one", lit(1)), orderCols, "__one", "__rank", 32)
      ranked.withColumn(out, expr(s"((__rank - 1L) * 4L) div ${n}L") + lit(1L))
        .drop("__one", "__rank")
    }
    // recency: smaller = better = quartile 1 → rank ascending on days;
    // frequency/monetary: larger = better = quartile 1 → rank descending
    val r1 = quartile(cust, Seq("rec_days", "o_custkey"), "r")
    val r2 = quartile(r1.withColumn("neg_freq", -col("freq")),
      Seq("neg_freq", "o_custkey"), "f").drop("neg_freq")
    val r3 = quartile(r2.withColumn("neg_spend", -col("spend")),
      Seq("neg_spend", "o_custkey"), "m").drop("neg_spend")
    r3.groupBy("r", "f", "m")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).cast("double").as("cell_spend"))
      .orderBy("r", "f", "m")
  }

  val q172Sql: String =
    """WITH mx AS (SELECT MAX(o_orderdate) AS md FROM orders),
      |c AS (
      | SELECT o_custkey,
      |   CAST(date_diff('day', MAX(o_orderdate), (SELECT md FROM mx)) AS BIGINT) AS rec_days,
      |   CAST(COUNT(*) AS BIGINT) AS freq,
      |   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      | FROM orders GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM c),
      |r AS (
      | SELECT *,
      |  ((row_number() OVER (ORDER BY rec_days, o_custkey) - 1) * 4)
      |    // (SELECT n FROM n) + 1 AS r,
      |  ((row_number() OVER (ORDER BY freq DESC, o_custkey) - 1) * 4)
      |    // (SELECT n FROM n) + 1 AS f,
      |  ((row_number() OVER (ORDER BY spend DESC, o_custkey) - 1) * 4)
      |    // (SELECT n FROM n) + 1 AS m
      | FROM c)
      |SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
      | CAST(m AS BIGINT) AS m,
      | CAST(COUNT(*) AS BIGINT) AS n_customers,
      | CAST(SUM(spend) AS DOUBLE) AS cell_spend
      |FROM r GROUP BY 1, 2, 3 ORDER BY r, f, m""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q170_sole_late_supplier" -> (q170 _),
    "q172_rfm_segments" -> (q172 _),
    "q118_sorted_neighborhood" -> (q118 _),
    "q119_robust_outliers" -> (q119 _),
    "q116_cdc_apply" -> (q116 _),
    "q115_equidepth_hist" -> (q115 _),
    "q114_fuzzy_lookup" -> (q114 _),
    "q110_triangle_count" -> (q110 _),
    "q109_profile" -> (q109 _),
    "q108_scd2_build" -> (q108 _),
    "q141_scd2_asof_enrich" -> (q141 _),
    "q107_fuzzy_join" -> (q107 _),
    "q106_incremental_agg" -> (q106 _),
    "q103_data_audit" -> (q103 _),
    "q135_key_skew" -> (q135 _),
    "q102_zorder_code" -> (q102 _),
    "q62_running_total" -> (q62 _),
    "q39_subqueries" -> (q39 _),
    "q31_set_ops" -> (q31 _),
    "q32_rollup" -> (q32 _),
    "q01_pricing_summary" -> (q01 _),
    "q02_revenue_by_nation" -> (q02 _),
    "q03_top_orders" -> (q03 _),
    "q04_dedup_keepfirst" -> (q04 _),
    "q05_incremental_scan" -> (q05 _),
    "q06_inlist_filter" -> (q06 _),
    "q07_anti_join" -> (q07 _),
    "q08_semi_join" -> (q08 _),
    "q09_left_join_enrich" -> (q09 _),
    "q10_norm_casewhen" -> (q10 _),
    "q11_concat_hash" -> (q11 _),
    "q12_minmax_guard" -> (q12 _),
    "q13_conditional_count" -> (q13 _),
    "q14_multikey_sort" -> (q14 _),
    "q15_scalar_shaping" -> (q15 _))

  val oracles: Map[String, String] = Map(
    "q170_sole_late_supplier" -> q170Sql,
    "q172_rfm_segments" -> q172Sql,
    "q118_sorted_neighborhood" -> q118Sql,
    "q119_robust_outliers" -> q119Sql,
    "q116_cdc_apply" -> q116Sql,
    "q115_equidepth_hist" -> q115Sql,
    "q114_fuzzy_lookup" -> q114Sql,
    "q110_triangle_count" -> q110Sql,
    "q109_profile" -> q109Sql,
    "q108_scd2_build" -> q108Sql,
    "q141_scd2_asof_enrich" -> q141Sql,
    "q107_fuzzy_join" -> q107Sql,
    "q106_incremental_agg" -> q106Sql,
    "q103_data_audit" -> q103Sql,
    "q135_key_skew" -> q135Sql,
    "q102_zorder_code" -> q102Sql,
    "q62_running_total" -> q62Sql,
    "q39_subqueries" -> q39Sql,
    "q31_set_ops" -> q31Sql,
    "q32_rollup" -> q32Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_revenue_by_nation" -> q02Sql,
    "q03_top_orders" -> q03Sql,
    "q04_dedup_keepfirst" -> q04Sql,
    "q05_incremental_scan" -> q05Sql,
    "q06_inlist_filter" -> q06Sql,
    "q07_anti_join" -> q07Sql,
    "q08_semi_join" -> q08Sql,
    "q09_left_join_enrich" -> q09Sql,
    "q10_norm_casewhen" -> q10Sql,
    "q11_concat_hash" -> q11Sql,
    "q12_minmax_guard" -> q12Sql,
    "q13_conditional_count" -> q13Sql,
    "q14_multikey_sort" -> q14Sql,
    "q15_scalar_shaping" -> q15Sql)
}
