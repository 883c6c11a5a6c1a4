package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    val p = points.withColumn("__bin", floor(unix_micros(col(tsCol)) / binUs))
    val iv = intervals
      .filter(unix_micros(col(endCol)) >= unix_micros(col(startCol)))
      .withColumn("__bin", explode(sequence(
        floor(unix_micros(col(startCol)) / binUs),
        floor(unix_micros(col(endCol)) / binUs))))
    p.join(iv, Seq(key, "__bin"))
      .filter(unix_micros(col(tsCol)).between(
        unix_micros(col(startCol)), unix_micros(col(endCol))))
      .drop("__bin")
  }
}
