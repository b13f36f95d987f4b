package graft.graph

import graft.CacheTracker
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded multi-hop reachability over the edge set (SURVEY §2.C6
  * generalized): BFS by iterated equi-join, one shuffle per hop, frontier
  * deduplicated per round so a node is expanded once regardless of how
  * many paths reach it.
  *
  * Scale notes: each round joins |frontier| against the edge set
  * partitioned by from_id — never materializes path multiplicity; `visited`
  * grows monotonically and bounds total work at |V| per round. For deep
  * traversals (> ~10 hops) checkpoint the frontier to cut lineage; hop
  * counts here are small (resource hierarchies are shallow).
  */
object GraphTraversal {

  /** @param edges  (from_id, to_id)
    * @param starts (id) seed set
    * @return (id, hops) — every node reachable within `maxHops`, with the
    *         minimal hop count (starts themselves at hop 0)
    */
  def reachableWithin(edges: DataFrame, starts: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val e = edges.select(col("from_id"), col("to_id"))
    // each hop's frontier is cached and materialized by the isEmpty probe,
    // so hop k never re-executes hops 1..k-1 (uncached, the chained lineage
    // would cost Θ(h²) join executions); `visited` is a union of cached
    // nodes, cheap to scan at the end. Inside a CacheTracker scope the
    // runner releases the per-hop caches at scope exit; outside one they
    // are consolidated below so the CALLER can release everything.
    val hops = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var visited = starts.select(col("id")).distinct().withColumn("hops", lit(0)).transform(CacheTracker.cached)
    hops += visited
    var frontier = visited
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val next = frontier.join(e, frontier("id") === e("from_id"))
        .select(col("to_id").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("hops", lit(hop))
        .transform(CacheTracker.cached)
      hops += next
      visited = visited.unionByName(next)
      frontier = next // isEmpty materializes the cache on the next loop test
    }
    if (CacheTracker.inScope) visited
    else {
      // library caller, no scope to release the per-hop caches — and the
      // returned union is the only handle they'd have, which unpersists
      // NONE of them. Consolidate: materialize the result as ONE cache,
      // drop the hop frontiers, and `result.unpersist()` now releases
      // everything this call pinned.
      val out = visited.cache()
      out.count()
      hops.foreach(_.unpersist(false))
      out
    }
  }
}
