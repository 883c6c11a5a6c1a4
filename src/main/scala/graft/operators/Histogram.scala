package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact equi-depth (equi-height) histogram — the optimizer-statistics
  * and data-profiling structure where every bucket holds the same
  * number of rows and the BOUNDARIES move with the data (the
  * complement of a fixed-width histogram, which a single skewed tail
  * renders useless). Bucket b of B covers global ranks
  * `((b−1)·n/B, b·n/B]` under a TOTAL order (value, tiebreaker), so
  * the report — per-bucket count, low and high value — is fully
  * deterministic even when ties straddle a boundary.
  *
  * Scale shape: global rank is the partitionless-window case that a
  * naive `Window.orderBy` plans as a SINGLE-task sort; it rides
  * [[PrefixSum.withRunningTotalOrdered]]'s two-pass parallel scan
  * instead (range partition + in-partition sort, partition totals to
  * the driver, per-partition rebase — one shuffle, never one task).
  * Bucket assignment is exact integer arithmetic on the rank; the
  * final per-bucket agg shuffles B keys. The bucket extremes are data
  * values with zero interpolation (q104's percentile_disc rule), so
  * nothing drifts between engines.
  */
object Histogram {

  /** Equi-depth histogram of `valueCol` with `buckets` buckets.
    * `tieCol` must make (valueCol, tieCol) unique. Output:
    * `(bucket, cnt, lo, hi)` ordered by bucket, where lo/hi are the
    * smallest/largest values landing in the bucket.
    */
  def equiDepth(df: DataFrame, valueCol: String, tieCol: String,
                buckets: Int, numPartitions: Int = 32): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val n = df.count()
    val ranked = PrefixSum.withRunningTotalOrdered(
      df.select(col(valueCol), col(tieCol)).withColumn("__one", lit(1)),
      Seq(valueCol, tieCol), "__one", "__rank", numPartitions)
    ranked
      .withColumn("bucket",
        expr(s"((__rank - 1L) * ${buckets}L) div ${n}L") + lit(1L))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
      .orderBy("bucket")
  }
}
