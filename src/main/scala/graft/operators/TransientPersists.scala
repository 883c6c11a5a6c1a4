package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for QUERY-TRANSIENT persists — cached intermediates (the
  * banded-LSH shingle/signature tables) whose lifetime extends into the
  * operator's RETURNED lazy frame, so the operator itself has no safe
  * point to unpersist them: the caller materializes the result at some
  * later action the operator never sees.
  *
  * Why it exists (r14, the q112 variance root cause): each
  * `Dedup.minhashLsh`-family call persisted its shingle table
  * MEMORY_AND_DISK and nothing ever released it, so a bench session
  * running 173 queries × 3 passes (plus the scale rehearsal's 2–3
  * samples per 10× query) accumulated dozens of multi-hundred-MB
  * un-evicted tables. The resulting storage-memory pressure made
  * byte-identical runs swing 4.6–25.2 s (the committed
  * scale_rehearsal_out.json shows BOTH q25 and q112 spiking only in
  * pass 2, after the storage had filled). This is the same leak class
  * as [[Checkpoints]] (r13) for `.persist` instead of
  * `.localCheckpoint`.
  *
  * Usage contract: operators call [[track]] instead of `.persist`;
  * harnesses (Bench / ScaleRehearsal / Verify) call [[releaseAll]]
  * after fully materializing each query. Releasing is SAFE at any
  * point — an unpersisted plan re-executes from source if a dependent
  * frame is re-used later (correctness unaffected, only the dedup of
  * compute) — so a long-lived session that uses these operators should
  * releaseAll whenever it is done with a result.
  */
object TransientPersists {
  private val reg = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` at `level` and register it for the next
    * [[releaseAll]].
    */
  def track(df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    reg.add(df)
    df
  }

  /** Unpersist every tracked frame (non-blocking) and clear the
    * registry.
    */
  def releaseAll(): Unit = {
    var df = reg.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Exception => /* session already stopped */ }
      df = reg.poll()
    }
  }
}
