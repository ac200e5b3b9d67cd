package graft.quality

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Action-scoped cache lifetime for operator-internal intermediates.
  *
  * Operators like BM25 or the MinHash family cache a multi-consumer
  * intermediate (postings, hashed shingles) that several branches of
  * ONE returned plan share. A bare `.cache()` there leaks: the method
  * returns a lazy frame, so it can never unpersist, and in a
  * long-lived session every call accumulates an InMemoryRelation
  * until someone remembers `clearCache()`.
  *
  * [[cachedUntilAction]] pins the lifetime to what these operators
  * actually need — the materialize-once window of the query the
  * caller is about to run: the cache is dropped (async, non-blocking)
  * as soon as the NEXT query execution on the session completes,
  * success or failure. Re-running the returned frame afterwards
  * recomputes instead of reading the cache — correct, just unscoped —
  * so this is for single-materialization operator internals, not for
  * frames a caller iterates over.
  *
  * If the frame's plan is already cached (an enclosing pipeline such
  * as the curation compositions holds the same prefix), it is
  * returned untouched: no double-cache (silences Spark's "Asked to
  * cache already cached data" warning) and no release — the outer
  * owner keeps its lifetime. */
object CacheScope {

  /** Cache unless the plan is already cached; `owned` tells the caller
    * whether the unpersist duty is theirs. For the eager
    * cache → act → unpersist methods: re-caching an already-cached
    * plan warns and double-counts ownership (the classic case is
    * atomicAppend receiving the frame appendNew already cached for its
    * count). */
  def acquire(df: DataFrame): (DataFrame, Boolean) =
    if (df.storageLevel != StorageLevel.NONE) (df, false)
    else (df.cache(), true)

  def cachedUntilAction(df: DataFrame): DataFrame =
    if (df.storageLevel != StorageLevel.NONE) df
    else {
      val cached = df.cache()
      val spark = df.sparkSession
      val released = new AtomicBoolean(false)
      val listener: QueryExecutionListener = new QueryExecutionListener {
        private def release(): Unit =
          if (released.compareAndSet(false, true)) {
            cached.unpersist(blocking = false)
            spark.listenerManager.unregister(this)
          }
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          release()
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
          release()
      }
      spark.listenerManager.register(listener)
      cached
    }
}
