package graft

import org.apache.spark.sql.Dataset
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
  * wraps each query in [[scope]], which unpersists the recorded Datasets
  * (non-blocking) when the query's write finishes. Outside any scope,
  * [[cached]] is exactly `ds.cache()` — library callers keep full control
  * of cache lifetime, as the Similarity/Dedup docs promise.
  *
  * Thread model: builders construct their plans on the runner thread that
  * entered [[scope]] (a DynamicVariable is thread-local), which is how
  * Verify's per-query futures behave; Spark's own executor threads never
  * call [[cached]].
  */
object CacheTracker {
  private val current = new DynamicVariable[java.util.List[Dataset[_]]](null)

  /** `ds.cache()`, recorded in the enclosing [[scope]] if one is active. */
  def cached[T](ds: Dataset[T]): Dataset[T] = {
    ds.cache()
    val buf = current.value
    if (buf != null) buf.add(ds)
    ds
  }

  /** Run `body`, then unpersist every Dataset it [[cached]]. Unpersist is
    * non-blocking: the blocks drop asynchronously, the caller does not
    * stall on block-manager round-trips.
    */
  def scope[A](body: => A): A = {
    val buf = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Dataset[_]]())
    try current.withValue(buf)(body)
    finally buf.forEach(ds => ds.unpersist(blocking = false))
  }
}
