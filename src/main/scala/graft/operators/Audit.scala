package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-contract audit (the Deequ/expectations pattern; q103's engine):
  * evaluate a fixed set of declared constraints over a fact table in
  * ONE conditional-aggregation pass plus one broadcast semi-join, and
  * emit a (check, target, metric, passed) report row per constraint.
  * See `RelationalQueries.q103` for the oracle-gated instance and the
  * scale analysis; AuditSpec drives the negative cases (every
  * constraint violation is actually caught).
  */
object Audit {

  /** The orders-table contract: row count, `o_custkey` completeness,
    * `o_orderkey` uniqueness, `o_orderstatus` domain membership,
    * `o_totalprice` range, `o_custkey` referential integrity against
    * `customer(c_custkey)`.
    */
  def ordersContract(o: DataFrame, customer: DataFrame): DataFrame = {
    val cust = customer.select(col("c_custkey"))
    val base = o.agg(
      count(lit(1)).as("n"),
      count(col("o_custkey")).as("nn_cust"),
      countDistinct(col("o_orderkey")).as("nd_ok"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("dom_ok"),
      sum(when(col("o_totalprice").between(0.0, 1000000.0), 1L).otherwise(0L)).as("rng_ok"))
    val ri = o.join(broadcast(cust), o("o_custkey") === cust("c_custkey"), "left_semi")
      .agg(count(lit(1)).as("ri_ok"))
    base.crossJoin(ri).select(expr(
      """stack(6,
        | 'row_count', 'orders', CAST(n AS DOUBLE), n > 0,
        | 'completeness', 'o_custkey', CAST(nn_cust AS DOUBLE) / n, nn_cust = n,
        | 'uniqueness', 'o_orderkey', CAST(nd_ok AS DOUBLE) / n, nd_ok = n,
        | 'domain', 'o_orderstatus', CAST(dom_ok AS DOUBLE) / n, dom_ok = n,
        | 'range', 'o_totalprice', CAST(rng_ok AS DOUBLE) / n, rng_ok = n,
        | 'ref_integrity', 'o_custkey', CAST(ri_ok AS DOUBLE) / n, ri_ok = n
        |) AS (check_name, target, metric, passed)""".stripMargin))
      .orderBy("check_name", "target")
  }

  /** Join-key skew audit: one report row per audited key — row count,
    * distinct keys, the heaviest key and its share, and the Gini
    * coefficient of the key-frequency distribution (0 = uniform,
    * → 1 = one key owns everything). The pre-join diagnosis for every
    * shuffle-key decision this library makes (salting thresholds, AQE
    * skew-join expectations): run it BEFORE keying a 100 TB join.
    *
    * Exact, deterministic, scale-shaped: one map-side-combined
    * frequency agg per key (the only corpus-sized shuffle), then the
    * Gini rank Σ rank·cnt over the DISTINCT-KEY table via
    * [[PrefixSum]]'s two-pass scan in total (cnt, key) order — never a
    * single-task global window (the distinct-key table can be billions
    * of rows when auditing a user-id key). Heaviest key via one
    * `max(struct)` agg (ties → larger key value, mirrored in the
    * oracle). Gini = (2·Σrank·cnt)/(k·n) − (k+1)/k — integer sums
    * until two final divisions, rounded at 4 like every reported
    * ratio.
    */
  def keySkew(df: DataFrame, keyCol: String, label: String): DataFrame = {
    val freq = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("long").as("k"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = PrefixSum.withRunningTotalOrdered(
      freq.withColumn("one", lit(1L)), Seq("cnt", "k"), "one", "rank")
    ranked.agg(
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(struct(col("cnt"), col("k"))).as("top"),
      sum(col("rank") * col("cnt")).as("s"))
      .select(
        lit(label).as("dataset"),
        col("n_rows"), col("n_keys"),
        col("top.k").as("top_key"), col("top.cnt").as("top_cnt"),
        round(col("top.cnt").cast("double") / col("n_rows").cast("double"), 4)
          .as("top_share"),
        round((lit(2.0) * col("s").cast("double")) /
          (col("n_keys").cast("double") * col("n_rows").cast("double")) -
          (col("n_keys") + lit(1L)).cast("double") / col("n_keys").cast("double"), 4)
          .as("gini"))
  }
}
