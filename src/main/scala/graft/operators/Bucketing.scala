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

  /** Z-order clustered parquet layout on TWO key columns
    * ([[graft.functions.ZOrder]]): bucketize each key to 16 bits over
    * its observed domain, interleave to a Morton code, range-partition
    * and sort by it, write. Each output file then covers a RECTANGLE
    * of the (a, b) space, so parquet min/max stats on BOTH columns are
    * tight per file and a reader filtering on either key (or both)
    * skips most files — single-column range clustering can only serve
    * one of the two predicates. The domain scan is an agg to one row
    * (broadcast back); the z computation is map-side codegen bitwise
    * ops; the only shuffle is the range partitioner every clustered
    * write pays.
    */
  def zOrderedWrite(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.ZOrder
    val st = df.agg(min(colA).as("mna"), max(colA).as("mxa"),
      min(colB).as("mnb"), max(colB).as("mxb"))
    val z = df.crossJoin(broadcast(st))
      .withColumn("__z", ZOrder.morton16(
        ZOrder.bucket16(col(colA), col("mna"), col("mxa")),
        ZOrder.bucket16(col(colB), col("mnb"), col("mxb"))))
      .drop("mna", "mxa", "mnb", "mxb")
    z.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
