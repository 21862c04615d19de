package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of the DataFrames graft operators persist.
  *
  * Several operators ([[graft.operators.Similarity]],
  * [[graft.operators.NearDup]], [[graft.operators.DiaryPipeline]],
  * [[graft.sources.DelimitedSource.quarantine]]) cache an intermediate
  * frame that feeds multiple consumers of one returned LAZY plan. The
  * operator cannot unpersist it — the final action happens at the
  * caller, and an eager unpersist would silently recompute the shared
  * subtree (the exact cost the persist exists to kill). Before this
  * registry the contract was "call `spark.catalog.clearCache()`
  * between pipelines", which nukes every cache in the session
  * including the caller's own.
  *
  * Operators now persist through [[persist]] (or the
  * [[TrackedPersist.persistTracked]] syntax), and a long-lived session
  * calls [[release]] once each operator result is materialized —
  * freeing exactly the operator-internal blocks, nothing else. The
  * bench does this between queries; leaving blocks registered is
  * still safe (MEMORY_AND_DISK spills rather than OOMs and LRU
  * eviction reclaims memory) but fills disk eventually.
  *
  * Registry entries are identity-keyed (Dataset does not override
  * equals), so re-registering the same logical plan from two calls
  * tracks both frames — release unpersists each exactly once.
  */
object OpCache {
  private val registry = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())

  /** Persist MEMORY_AND_DISK and remember the frame for [[release]]. */
  def persist(df: DataFrame): DataFrame = {
    // sweep entries whose blocks were freed behind our back (a session
    // keeping the old spark.catalog.clearCache() habit) — otherwise the
    // registry pins their analyzed plan trees on the driver forever
    registry.removeIf(_.storageLevel == StorageLevel.NONE)
    df.persist(StorageLevel.MEMORY_AND_DISK)
    registry.add(df)
    df
  }

  /** Unpersist every registered frame and forget them. `blocking =
    * true` waits for the blocks to actually drop (deterministic for
    * tests); the default returns immediately.
    *
    * Entries are removed ONE BY ONE as they are unpersisted (not a
    * blanket clear after the loop): a frame registered concurrently —
    * between the iteration snapshot and a trailing clear() — would be
    * forgotten while still persisted, resurrecting the exact leak this
    * registry exists to kill. The CHM-backed iterator is weakly
    * consistent, so a concurrent registration is either released now
    * or stays registered for the next release; never dropped silently.
    *
    * Release is still SESSION-GLOBAL: it unpersists every operator's
    * intermediates, so with two interleaved operator calls, releasing
    * after the first result materializes drops the blocks backing the
    * second, still-lazy result (correct, but it recomputes). Call it
    * at pipeline boundaries, not mid-flight.
    */
  def release(blocking: Boolean = false): Unit = {
    val it = registry.iterator()
    while (it.hasNext) {
      try it.next().unpersist(blocking) catch { case _: Throwable => () }
      it.remove()
    }
  }

  /** Number of currently registered frames (diagnostics/specs). */
  def registered: Int = registry.size

  implicit class TrackedPersist(private val df: DataFrame) extends AnyVal {
    def persistTracked: DataFrame = OpCache.persist(df)
  }
}
