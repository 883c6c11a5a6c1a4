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
  * Scale shape: the exact per-column distinct counts make Catalyst
  * plan their aggregation via `Expand` (one duplicated row-stream per
  * distinct aggregate, a ×|cols| row multiplication before the
  * partial agg — visible in the plan, and the price of exactness).
  * The non-distinct metrics deliberately DO NOT ride that plan: a
  * combined distinct + non-distinct aggregation drags every
  * min/max/count/avg buffer through the multi-distinct rewrite's
  * 4-operator agg chain over the expanded stream, and measured 4×
  * slower than the same work split in two (sf0.1, min-of-3: combined
  * 4.0 s; split 1.07 s — and pre-projecting the per-row `length(cast)`
  * chains out of the Expand did NOT close the gap, 4.0 s, so the cost
  * is the rewrite's buffer carriage, not expression re-evaluation).
  * So exact profiling runs TWO aggregations — a narrow no-Expand scan
  * for count/min/max/length and the ×|cols| Expand pass for distincts
  * alone — joined by a 1-row × 1-row crossJoin; at scale that trades
  * one extra (column-pruned, parquet) scan for not pushing 4·|cols|
  * extra agg buffers through the expanded stream's agg chain. For
  * 100 TB profiling where ±2% distincts are fine, pass
  * `exact = false`: `approx_count_distinct` (HLL++, the q55 sketch
  * family) needs no Expand, so everything rides literally ONE pass.
  * The report itself is a `stack` unpivot of the one combined row —
  * adding a column widens the aggs, never adds a pass over the data.
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
    val ndAggs: Seq[Column] = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"),
        avg(length(col(c).cast("string"))).as(s"__al_$c"))
    }
    val dAggs: Seq[Column] = cols.map { c =>
      (if (exact) countDistinct(col(c))
       else approx_count_distinct(col(c))).as(s"__nd_$c")
    }
    // exact: keep the distinct tier's Expand plan free of the
    // non-distinct buffers (measured 4× — see scaladoc) and re-attach
    // via a 1-row crossJoin; approx: no Expand exists, one agg is one
    // pass, keep it combined
    val one =
      if (exact)
        df.agg(ndAggs.head, ndAggs.tail: _*)
          .crossJoin(df.agg(dAggs.head, dAggs.tail: _*))
      else {
        val all = ndAggs ++ dAggs
        df.agg(all.head, all.tail: _*)
      }
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
