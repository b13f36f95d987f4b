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
    * isolated nodes keep comp = id. Throws if not converged in `maxIter`
    * rounds (each round at least halves the remaining label distance, so
    * the default 25 covers any graph up to 2²⁵-diameter chains).
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    var labels = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
    // Convergence probe: labels are per-id monotone NON-INCREASING (every
    // update takes a min over a set containing the current label), so the
    // decimal label total strictly decreases until the fixpoint — one
    // aggregate scan per round detects convergence with no alignment join.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    if (prevSum == null) return labels // no nodes
    var round = 0
    while (round < maxIter) {
      // neighbor labels: dst learns src's current comp
      val viaEdge = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), col("comp"))
      // label-graph hop: if x points at m, x also learns m's current comp —
      // this is what collapses chains logarithmically
      val viaLabel = labels.as("a")
        .join(labels.as("b"), col("a.comp") === col("b.id"))
        .select(col("a.id").as("id"), col("b.comp").as("comp"))
      val updated = labels.union(viaEdge).union(viaLabel)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      val curSum = labelSum(updated)
      val prev = labels
      labels = updated
      prev.unpersist()
      round += 1
      if (curSum.compareTo(prevSum) == 0) return labels
      prevSum = curSum
    }
    throw new IllegalStateException(
      s"connected components did not converge in $maxIter rounds")
  }
}
