package graft.quality

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.columnar.InMemoryRelation
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
  * as soon as a query execution that actually CONSUMED this cache
  * completes (matched by the cached relation's builder inside the
  * consumer's substituted plan — an unrelated query on the session,
  * e.g. a concurrently-verifying sibling, never releases it), success
  * or failure. Re-running the returned frame afterwards recomputes
  * instead of reading the cache — correct, just unscoped — so this is
  * for single-materialization operator internals, not for frames a
  * caller iterates over. A frame the caller never materializes keeps
  * its (unfilled) cache entry until `clearCache()` — same hygiene as
  * any abandoned cache.
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
      // The cache's identity inside any consuming query's plan: after
      // substitution the consumer carries an InMemoryRelation sharing
      // this builder instance (reference equality — canonicalization
      // games can't confuse two caches).
      val builder = cached.queryExecution.withCachedData.collectFirst {
        case r: InMemoryRelation => r.cacheBuilder
      }
      val released = new AtomicBoolean(false)
      val listener: QueryExecutionListener = new QueryExecutionListener {
        private def maybeRelease(qe: QueryExecution): Unit = {
          // fail open on both edges (no builder found / plan access
          // throws): release rather than leak
          val consumed = builder.isEmpty ||
            (try qe.withCachedData
              .collect { case r: InMemoryRelation => r.cacheBuilder }
              .exists(b => builder.exists(_ eq b))
            catch { case _: Exception => true })
          if (consumed && released.compareAndSet(false, true)) {
            cached.unpersist(blocking = false)
            spark.listenerManager.unregister(this)
          }
        }
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          maybeRelease(qe)
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
          maybeRelease(qe)
      }
      spark.listenerManager.register(listener)
      cached
    }
}
