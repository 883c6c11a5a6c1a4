package graft.operators

import org.apache.spark.sql.DataFrame

/** Tracked `localCheckpoint` for iterative operators (the SuffixArray
  * id-delta discipline, factored out): `Dataset.unpersist` cannot free
  * a localCheckpoint through the CacheManager (measured in r11: the
  * blocks survive), and waiting for GC-driven ContextCleaner ties
  * executor storage to driver GC timing — so every operator that
  * checkpoints per round must track the persistent-RDD ids each
  * checkpoint creates and free them explicitly once the round's output
  * is superseded. Without this, repeated runs in one session
  * accumulate un-evictable storage: r13 measured q153's rehearsal runs
  * rising 8.8 → 12.8 → 20.1 s across three same-JVM executions from
  * exactly this leak.
  *
  * Id-delta tracking assumes no concurrent persist activity on the
  * same SparkContext during the tracked call — the single-driver-loop
  * usage every iterative operator here has.
  */
private[graft] object Checkpoints {

  /** Eagerly localCheckpoint `df`; returns the checkpointed frame plus
    * the persistent-RDD ids the checkpoint created (pass to [[release]]
    * when the frame is superseded).
    */
  def tracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val ck = df.localCheckpoint()
    (ck, sc.getPersistentRDDs.keySet.toSet -- before)
  }

  /** [[tracked]] + rebuild from the checkpointed RDD: cuts lineage AND
    * inherited statistics (LogicalRDD checkpoints carry the origin
    * plan's sizeInBytes forward and join estimates multiply — see
    * Dedup.ccDistributed for the measured Catalyst stats blowup).
    */
  def trackedFresh(df: DataFrame): (DataFrame, Set[Int]) = {
    val (ck, ids) = tracked(df)
    (ck.sparkSession.createDataFrame(ck.rdd, ck.schema), ids)
  }

  def release(df: DataFrame, ids: Set[Int]): Unit = {
    val sc = df.sparkSession.sparkContext
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }
}
