package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact robust location/scale statistics (median, MAD, outlier
  * counts) per group, computed on a FREQUENCY-COMPRESSED table.
  *
  * The naive exact median sorts every group — with a handful of huge
  * groups that is one task per group over the full corpus. Here the
  * corpus first collapses to `(group, value) → count` with map-side
  * combine (one shuffle bounded by the number of DISTINCT values, not
  * rows), and all rank arithmetic — cumulative counts, the
  * `percentile_disc` rank `ceil(n/2)`, deviation re-aggregation —
  * runs on that compressed table. The per-group window still
  * serializes per group, but over distinct values only: at 100 TB a
  * price-like column has millions of distinct values against billions
  * of rows, so the serialized portion is the compressed tail, not the
  * corpus. All arithmetic must be exact (use DECIMAL inputs): the
  * median is percentile_disc semantics (smallest value whose
  * cumulative count reaches ceil(n/2)), never an interpolated float.
  */
object RobustStats {

  /** Per-group `(n, median, mad, n_outliers)` for `valueCol`, where
    * `mad = median(|v - median|)` and an outlier is `|v - median| >
    * k·mad`. `valueCol` should be an exact type (integer/decimal).
    */
  def groupedMedianMad(df: DataFrame, grp: String, valueCol: String,
                       k: Int = 3): DataFrame = {
    val freq = df.groupBy(col(grp), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val totals = freq.groupBy(grp).agg(sum("__c").as("n"))
    val rank = expr("(n + 1) div 2") // = ceil(n/2), exact integer arithmetic
    val cum = Window.partitionBy(grp).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = freq.withColumn("__cum", sum("__c").over(cum))
      .join(broadcast(totals), grp)
      .filter(col("__cum") >= rank)
      .groupBy(grp).agg(min("__v").as("median"))
    val dev = freq.join(broadcast(med), grp)
      .groupBy(col(grp), abs(col("__v") - col("median")).as("__d"))
      .agg(sum("__c").as("__c"))
    val cumD = Window.partitionBy(grp).orderBy("__d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mad = dev.withColumn("__cum", sum("__c").over(cumD))
      .join(broadcast(totals), grp)
      .filter(col("__cum") >= rank)
      .groupBy(grp).agg(min("__d").as("mad"))
    val outliers = dev.join(broadcast(mad), grp)
      .groupBy(grp)
      .agg(sum(when(col("__d") > col("mad") * k, col("__c"))
        .otherwise(0L)).as("n_outliers"))
    totals.join(med, grp).join(mad, grp).join(outliers, grp)
      .select(col(grp), col("n"), col("median"), col("mad"),
        col("n_outliers"))
      .orderBy(grp)
  }
}
