package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler — the "describe this drop of data" report
  * every ingest pipeline runs before trusting a new source: per column,
  * row count, non-null count, exact distinct count, min/max (rendered
  * to string so heterogeneous column types share one report schema),
  * and mean rendered length. The profiling complement to
  * [[graft.operators.Audit]]: Audit checks DECLARED expectations,
  * Profile DISCOVERS the shape you'd declare them from.
  *
  * Scale shape: ALL metrics ride ONE aggregation over the table.
  * The exact per-column distinct counts make Catalyst plan the agg via
  * `Expand` (one duplicated row-stream per distinct aggregate, i.e. a
  * ×|cols| row multiplication before the partial agg — visible in the
  * plan, and the price of exactness; min/max/count piggyback on the
  * same pass). For 100 TB profiling where ±2% distincts are fine, pass
  * `exact = false`: `approx_count_distinct` (HLL++, the q55 sketch
  * family) collapses the plan back to a single no-Expand pass with
  * map-side partials. The report itself is a `stack` unpivot of the
  * one aggregated row — adding a column widens the agg, never adds a
  * pass over the data.
  *
  * Min/max/length are computed in NATIVE column type and rendered with
  * `cast(string)` afterwards, so numeric columns order numerically
  * ("9" < "10"), and callers profiling floating-point columns should
  * pre-cast them to a fixed-scale decimal if they need engine-portable
  * rendering of the extremes.
  */
object Profile {

  /** Profile `cols` of `df` in one aggregation pass. Output one row per
    * profiled column: `(col_name, n_rows, n_nonnull, n_distinct,
    * min_value, max_value, avg_len)`, ordered by column name.
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    val aggs: Seq[Column] = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"),
        avg(length(col(c).cast("string"))).as(s"__al_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __n, __nn_$c, __nd_$c, __mn_$c, __mx_$c, __al_$c"
    }.mkString(",\n")
    one.select(expr(
      s"""stack(${cols.size},
         |$stackArgs
         |) AS (col_name, n_rows, n_nonnull, n_distinct, min_value, max_value, avg_len)""".stripMargin))
      .orderBy("col_name")
  }
}
