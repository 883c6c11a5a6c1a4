package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture log application — the MERGE-INTO / lakehouse
  * upsert shape: given a base snapshot and an ordered change log of
  * upserts and delete tombstones, produce the post-log snapshot.
  *
  * Scale shape: the log collapses to ONE entry per key via a plain
  * `max(struct(seq..., op, attrs...))` aggregation — map-side partials,
  * one key shuffle bounded by the DELTA's key count, no window (a
  * window would sort every key's full history; the struct-max ships one
  * row per key out of each map task). The base joins the collapsed log
  * with a left anti join, which AQE turns into a broadcast when the
  * delta is small — the common case for incremental maintenance, where
  * a run costs one base scan plus a delta-bounded shuffle.
  */
object Cdc {

  /** Apply `log` to `base`.
    *
    * @param base  snapshot with columns `keys ++ attrs`
    * @param log   change log with columns `keys ++ seqCols ++ (opCol, attrs)`;
    *              `(keys, seqCols)` must be unique (seqCols break ties)
    * @param keys  primary-key columns
    * @param seqCols ordering columns — the LAST entry per key wins
    * @param opCol 'D' = delete tombstone; anything else = upsert
    * @param attrs payload columns carried by both base and log
    * @return the post-log snapshot: base rows whose key never appears
    *         in the log, plus the last upsert per logged key; keys whose
    *         last entry is a tombstone are absent
    */
  def applyLog(base: DataFrame, log: DataFrame, keys: Seq[String],
               seqCols: Seq[String], opCol: String,
               attrs: Seq[String]): DataFrame = {
    // seq fields lead the struct so lexicographic max == last-by-seq;
    // op/attrs ride along and never participate in the comparison
    // because (keys, seqCols) is unique.
    val packed = struct(
      (seqCols.map(col) :+ col(opCol).as("__op")) ++
        attrs.map(c => col(c).as(c)): _*)
    val last = log.groupBy(keys.map(col): _*)
      .agg(max(packed).as("__last"))
      .select(keys.map(col) ++ Seq(col("__last.__op").as("__op")) ++
        attrs.map(c => col(s"__last.$c").as(c)): _*)
    val untouched = base.join(last.select(keys.map(col): _*),
      keys, "left_anti")
      .select((keys ++ attrs).map(col): _*)
    val upserts = last.filter(col("__op") =!= "D")
      .select((keys ++ attrs).map(col): _*)
    untouched.withColumn("origin", lit("base"))
      .unionByName(upserts.withColumn("origin", lit("log")))
  }
}
