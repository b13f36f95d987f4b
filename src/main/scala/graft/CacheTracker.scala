package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import scala.util.DynamicVariable

/** Scoped tracking of the `Dataset.cache()` blocks builders create, so a
  * multi-query runner can release EXACTLY the caches a finished query
  * introduced without touching sibling queries' in-flight plans.
  *
  * The global alternative, `spark.catalog.clearCache()`, is unsafe under
  * concurrency (unpersisting a shared InMemoryRelation mid-execution has
  * corrupted sibling results — see Verify), and "never unpersist" leaves
  * the pool bounded only by MEMORY_AND_DISK eviction for the whole run.
  * Builders opt in by routing their caches through [[cached]]; a runner
  * wraps each query in [[scope]], which releases the recorded Datasets
  * (non-blocking) when the query's write finishes. Outside any scope,
  * [[cached]] is exactly `ds.cache()` — library callers keep full control
  * of cache lifetime, as the Similarity/Dedup docs promise.
  *
  * Release is REFERENCE-COUNTED on the canonicalized analyzed plan — the
  * same identity Spark's CacheManager dedupes on. Two concurrent queries
  * that cache plan-identical Datasets (e.g. the contamination pair both
  * caching `shingleHashDf`) share ONE InMemoryRelation; unpersisting it
  * when the first scope exits would yank blocks out from under the
  * sibling mid-execution. A scope therefore only unpersists an entry when
  * it holds the LAST reference.
  *
  * Thread model: builders construct their plans on the runner thread that
  * entered [[scope]] (a DynamicVariable is thread-local), which is how
  * Verify's per-query futures behave; Spark's own executor threads never
  * call [[cached]].
  *
  * Ownership: a plan whose CacheManager entry existed BEFORE its first
  * in-scope reference is treated as foreign — an outside-scope caller
  * created it, and scope exits will never unpersist it. The converse
  * (a library caller cache()-ing a plan a scope already holds) is
  * undetectable — their cache() no-ops on the scope's entry — so
  * long-lived external caches should be created before scoped work
  * probes them (the write-once/probe-many index pattern already does).
  */
object CacheTracker {
  private val current = new DynamicVariable[java.util.List[Dataset[_]]](null)
  private val currentCp = new DynamicVariable[java.util.List[Dataset[_]]](null)
  private val refs = new java.util.HashMap[LogicalPlan, Int]()
  // plans whose CacheManager entry PRE-EXISTED the first in-scope
  // reference: an outside-scope caller (library user holding an index)
  // owns those — scopes borrow them and must never unpersist them
  private val foreign = new java.util.HashSet[LogicalPlan]()

  private def keyOf(ds: Dataset[_]): LogicalPlan =
    ds.queryExecution.analyzed.canonicalized

  /** Is a [[scope]] active on this thread? Builders whose cache is a pure
    * internal optimization (no handle escapes to the caller) use this to
    * skip caching entirely outside a scope — otherwise the entry would be
    * unreleasable for the session's lifetime (the caller never receives
    * the cached Dataset, so it cannot unpersist it).
    */
  def inScope: Boolean = current.value != null

  /** `ds.cache()`, recorded in the enclosing [[scope]] if one is active.
    *
    * Register + cache happen under the refs lock, paired with the
    * decrement + unpersist in [[scope]]'s exit: without that pairing, a
    * scope exiting between a sibling's register and its cache() call
    * could unpersist the shared entry the sibling just adopted (its
    * cache() no-ops against the still-present CacheManager entry), and
    * the sibling would run uncached — or worse, lose blocks mid-job.
    */
  def cached[T](ds: Dataset[T]): Dataset[T] = {
    val buf = current.value
    if (buf != null) {
      refs.synchronized {
        val k = keyOf(ds)
        val live = ds.storageLevel != org.apache.spark.storage.StorageLevel.NONE
        val n = refs.merge(k, 1, (a, b) => a + b)
        // first in-scope reference to an ALREADY-cached plan: an
        // outside-scope caller owns the entry (e.g. a write-once index
        // cached by a library user, probed by scoped queries) — mark it
        // so no scope ever drops it out from under them
        if (n == 1 && live) foreign.add(k)
        // a LATER reference finding NO live entry means the outside owner
        // unpersisted while scopes still held refs — this call's cache()
        // re-creates the entry, and the scopes now own it; a stale
        // foreign bit would make the final scope exit skip the unpersist
        // of an entry no external owner holds (session-lifetime leak)
        if (n > 1 && !live) foreign.remove(k)
        // refcount must not outlive a FAILED cache(): an orphaned +1
        // (no paired buf entry, so no scope ever decrements it) would pin
        // every future entry for this plan at refcount >= 1 forever
        try ds.cache()
        catch { case e: Throwable =>
          refs.merge(k, -1, (a, b) => a + b)
          refs.remove(k, 0)
          throw e
        }
      }
      buf.add(ds)
    } else ds.cache()
    ds
  }

  /** [[cached]] only under an active [[scope]], passthrough otherwise —
    * for caches that are a builder's PRIVATE optimization (the handle
    * never escapes to the caller): outside a scope nobody could ever
    * release the entry, so the builder pays the recompute instead of
    * leaking session-lifetime storage. The one definition of the pattern
    * Bpe hand-rolled as `internallyCached`, now shared with Bm25.
    */
  def cachedInScope[T](ds: Dataset[T]): Dataset[T] =
    if (inScope) cached(ds) else ds

  /** Record a `localCheckpoint()`-ed Dataset for release when the
    * enclosing [[scope]] exits — the checkpoint sibling of [[cached]].
    * No refcounting: unlike cache() plans, every localCheckpoint call
    * materializes its own RDD, so entries are never shared between
    * scopes. Outside any scope this is a passthrough (the library caller
    * owns the checkpoint's lifetime, and Bench's between-query
    * getPersistentRDDs sweep reclaims it there).
    */
  def settled[T](ds: Dataset[T]): Dataset[T] = {
    val buf = currentCp.value
    if (buf != null) buf.add(ds)
    ds
  }

  /** Eagerly free the storage blocks of a `localCheckpoint()`-ed Dataset.
    * `Dataset.unpersist` only uncaches CacheManager entries (`cache()`
    * plans); a checkpoint's blocks belong to the underlying RDD and would
    * otherwise linger until the ContextCleaner GCs the RDD object — an
    * unbounded storage tail for iterative operators that checkpoint every
    * round. No-op for non-checkpointed plans.
    */
  def releaseLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Run `body`, then release every Dataset it [[cached]]: each entry's
    * refcount drops by one and the underlying cache is unpersisted only
    * at zero (non-blocking — the blocks drop asynchronously, the caller
    * does not stall on block-manager round-trips).
    */
  def scope[A](body: => A): A = {
    val buf = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Dataset[_]]())
    val cpBuf = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Dataset[_]]())
    try current.withValue(buf)(currentCp.withValue(cpBuf)(body))
    finally {
      buf.forEach { ds =>
        // decrement AND unpersist inside the lock — see [[cached]] for
        // the register-side pairing (unpersist is non-blocking, so the
        // critical section stays short)
        refs.synchronized {
          val k = keyOf(ds)
          val n = refs.getOrDefault(k, 1) - 1
          if (n <= 0) {
            refs.remove(k)
            val ownedOutside = foreign.remove(k)
            if (!ownedOutside) ds.unpersist(blocking = false)
          } else refs.put(k, n)
        }
      }
      cpBuf.forEach(releaseLocalCheckpoint)
    }
  }
}
