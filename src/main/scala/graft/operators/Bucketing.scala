package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins — the 100 TB
  * answer to repeatedly joining fact tables on the same key: pay the
  * shuffle once at write time (`bucketBy` + `sortBy`), then every
  * subsequent equi-join on the bucket key planss as a sort-merge join
  * over co-located buckets with NO Exchange on either side.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key. With equal bucket
    * counts Catalyst elides both shuffle exchanges (verify via
    * `.explain`: SortMergeJoin with FileScan children, no Exchange).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
