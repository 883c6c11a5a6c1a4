package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the table-diff primitive of every lakehouse
  * workflow: given two snapshots of the same keyed table, classify every
  * key as `added` (only in the new snapshot), `removed` (only in the
  * old), `changed` (in both with different compared values), or
  * `unchanged`, carrying the old and new values side by side. This is
  * the inverse of [[Cdc.applyLog]]: CDC *applies* a change log to a
  * snapshot; the diff *derives* the log from two snapshots — the pair
  * round-trips (applying a diff's add/change/remove rows to the old
  * snapshot reproduces the new one), which is how backfill audits and
  * replication checkers use it.
  *
  * Plan shape: ONE full outer join on the key — both sides shuffle once,
  * co-partitioned on the same key; at 100 TB this is the minimal
  * movement any keyed diff needs (and bucketed/pre-partitioned
  * snapshots make it exchange-free). Classification is a map-side CASE
  * over null-ness and value equality; no window, no driver state.
  */
object Diff {

  /** Diff two snapshots on `keys`, comparing `compareCols`.
    * Output: keys, `change` ∈ added/removed/changed/unchanged, then
    * `old_<c>` / `new_<c>` for each compared column.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(true))
      .select(keys.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")) :+
        col("__in_old"): _*)
    val n = newSnap.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_new", lit(true))
      .select(keys.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")) :+
        col("__in_new"): _*)
    val same = compareCols
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    o.join(n, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed").as("change")) ++
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
