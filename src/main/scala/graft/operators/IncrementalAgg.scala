package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view upkeep
  * pattern: keep a per-key partial-aggregation STATE table, and on each
  * new data drop aggregate ONLY the delta and merge the two states by
  * key, instead of rescanning history. Works for any aggregate with a
  * commutative mergeable partial (sum/count/min/max here — the same
  * algebra Spark's own partial aggregation and the repo's sketch
  * aggregates rely on; avg = sum/count at read time).
  *
  * At 100 TB this is the difference between a daily job that scans one
  * day and one that scans the lake: per-run cost is the delta scan plus
  * a key-bounded state join. The merge is a full-outer equi-join on the
  * key — broadcastable while the state is small, shuffle-on-key once it
  * isn't, and either way bounded by |keys|, never by history rows.
  */
object IncrementalAgg {

  /** Merge two partial states sharing `keys` + the spec'd value
    * columns. `spec` maps each value column to its merge kind:
    * "sum" (also counts: null on one side = identity 0) or
    * "min"/"max" (least/greatest, which skip nulls).
    */
  def merge(base: DataFrame, delta: DataFrame, keys: Seq[String],
      spec: Seq[(String, String)]): DataFrame = {
    val d2 = spec.foldLeft(delta) { case (df, (c, _)) =>
      df.withColumnRenamed(c, s"__d_$c")
    }
    val joined = base.join(d2, keys, "full_outer")
    spec.foldLeft(joined) { case (df, (c, kind)) =>
      val merged = kind match {
        case "sum" =>
          when(col(c).isNull && col(s"__d_$c").isNull, lit(null))
            .otherwise(coalesce(col(c), lit(0)) + coalesce(col(s"__d_$c"), lit(0)))
        case "min" => least(col(c), col(s"__d_$c"))
        case "max" => greatest(col(c), col(s"__d_$c"))
        case other => throw new IllegalArgumentException(s"unknown merge kind: $other")
      }
      df.withColumn(c, merged).drop(s"__d_$c")
    }
  }
}
