package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the closure step that turns
  * dedup candidate PAIRS into CLUSTERS with a deterministic canonical
  * representative (the minimum id in each component).
  *
  * Algorithm: iterated min-label propagation ("hash-to-min" style) on
  * DataFrames. Every round each node's label becomes the min of its own
  * label, its neighbors' labels, AND the labels held by nodes it currently
  * points at (label-graph hop) — the extra hop lets labels shortcut through
  * already-labeled chains, so convergence is O(log diameter) rounds rather
  * than O(diameter), each round one equi-join shuffle partitioned by id.
  * Near-duplicate clusters are dense and shallow (a handful of rounds); for
  * adversarial long-chain graphs the same loop converges in log₂(diameter)
  * rounds. Lineage is cut with `localCheckpoint` every round — without it
  * the iterated plan tree grows exponentially and re-executes from scratch.
  *
  * Scale: state per round is exactly one (id, comp) row per node, shuffled
  * by id; messages are one row per directed edge. Nothing driver-side,
  * nothing O(component²).
  */
object ConnectedComponents {

  /** Components of the undirected graph `edges` (src, dst) over `nodes`
    * (id). Returns (id, comp) with comp = min node id reachable from id;
    * isolated nodes keep comp = id. The labeled set is nodes ∪ edge
    * endpoints — an endpoint missing from `nodes` still gets a correct
    * row (and still links its neighbors) rather than silently corrupting
    * the convergence probe; callers wanting exactly `nodes` filter after.
    * Throws if not converged in `maxIter` rounds (each round at least
    * halves the remaining label distance, so the default 25 covers any
    * graph up to 2²⁵-diameter chains).
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // Integral ids only, enforced loudly: the convergence probe below sums
    // `comp` as a decimal, and for a STRING id column every cast is null —
    // the null initial sum would take the "no edges" early return and
    // silently label every node its own component (and even numeric
    // strings would pair a lexicographic min with a numeric probe,
    // risking a premature "converged"). Hash or dense-rank string ids to
    // longs first (GraphNormalizer exports string ids — map them before
    // clustering).
    Seq("nodes.id" -> nodes.schema("id").dataType,
        "edges.src" -> edges.schema("src").dataType,
        "edges.dst" -> edges.schema("dst").dataType).foreach { case (what, dt) =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val integral = dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
      require(integral,
        s"ConnectedComponents.run needs integral ids; $what is ${dt.simpleString}")
    }
    // materialized ONCE: each round's action would otherwise re-execute
    // the whole upstream edge derivation (for dedup, the candidate-pair
    // join) — the loop must re-read a settled edge set, not re-plan it
    // a NULL endpoint references no node: such an edge can link nothing
    // (SQL equality never matches NULL), and unfiltered it would emit a
    // phantom (null, comp) row while leaving the real neighbors unlinked
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    // settled like the label checkpoints below: the returned plan
    // references sym through attach(), so its blocks must live until the
    // query finishes — and then be freed by the runner scope, not linger
    // until ContextCleaner GC
    val sym = graft.CacheTracker.settled(e
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint())
    // Isolated nodes (no incident edge) can never change label — they keep
    // comp = id by definition. The loop therefore iterates ONLY over edge
    // endpoints: for dedup graphs that is the near-dup subgraph, orders of
    // magnitude smaller than the corpus, so each round's shuffles carry a
    // few thousand rows even when `nodes` is the full 100 TB document set.
    // Isolated nodes are attached once, at the end, with a single left join.
    def attach(looped: DataFrame): DataFrame =
      nodes.select(col("id"))
        .union(sym.select(col("src").as("id")))
        .distinct()
        .join(looped, Seq("id"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    // Convergence probe: labels are per-id monotone NON-INCREASING (every
    // update takes a min over a set containing the current label), so the
    // decimal label total strictly decreases until the fixpoint. The probe
    // rides the checkpoint job as an `observe` metric — one job per round,
    // not a checkpoint job plus a separate aggregate scan.
    def checkpointWithSum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation()
      // settled: the FINAL round's checkpoint outlives the loop (it backs
      // the returned labels) — a runner scope frees it at query end;
      // intermediate rounds are additionally freed eagerly below (the
      // scope's second release of those is a safe no-op)
      val out = graft.CacheTracker.settled(df
        .observe(obs, sum(col("comp").cast("decimal(38,0)")).as("s"))
        .localCheckpoint())
      (out, obs.get("s").asInstanceOf[java.math.BigDecimal])
    }
    // Seed labels at min(id, min neighbor) — one aggregate over sym,
    // equivalent to pre-running the edge-hop half of round 1 (labels stay
    // a monotone upper bound of the fixpoint, so correctness is
    // unchanged). For the common shallow near-dup cluster (pairs, small
    // stars) the seed IS the fixpoint, and the loop exits after a single
    // confirming round instead of two — one fewer
    // join+aggregate+checkpoint materialization per clustering query
    // (r17; guide §1.2 "remove passes").
    var (labels, prevSum) = checkpointWithSum(
      sym.groupBy(col("src"))
        .agg(least(col("src"), min(col("dst"))).as("comp"))
        .select(col("src").as("id"), col("comp")))
    if (prevSum == null) return attach(labels) // no edges: all isolated
    var rounds = 0
    while (rounds < maxIter) {
      val (updated, curSum) = checkpointWithSum(round(labels, sym))
      val prev = labels
      labels = updated
      // a localCheckpoint's blocks are NOT freed by Dataset.unpersist
      // (that only uncaches cache() plans) — release the checkpoint RDD
      // itself, or every round's label snapshot lingers until GC
      graft.CacheTracker.releaseLocalCheckpoint(prev)
      rounds += 1
      if (curSum.compareTo(prevSum) == 0) return attach(labels)
      prevSum = curSum
    }
    throw new IllegalStateException(
      s"connected components did not converge in $maxIter rounds")
  }

  /** One label round, un-materialized — the plan PlanAuditSpec audits:
    * every id's label becomes the min of its own label, its neighbors'
    * labels (edge hop), and the label held by its current label target
    * (label-graph hop — what collapses chains logarithmically). Both hops
    * are equi-joins on id; nothing here may plan a cartesian product.
    */
  private[graft] def round(labels: DataFrame, sym: DataFrame): DataFrame = {
    // neighbor labels: dst learns src's current comp
    val viaEdge = sym.join(labels, sym("src") === labels("id"))
      .select(sym("dst").as("id"), col("comp"))
    // label-graph hop: if x points at m, x also learns m's current comp
    val viaLabel = labels.as("a")
      .join(labels.as("b"), col("a.comp") === col("b.id"))
      .select(col("a.id").as("id"), col("b.comp").as("comp"))
    labels.union(viaEdge).union(viaLabel)
      .groupBy("id").agg(min("comp").as("comp"))
  }
}
