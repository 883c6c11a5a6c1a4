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
}
