package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe range join (SURVEY §2.C4 at 100 TB): a band predicate like
  * `probe BETWEEN build - r AND build + r` has no equi-key, so Spark plans
  * it as a broadcast nested-loop join — fine while the build side fits a
  * broadcast, but at scale it degrades to a partitioned NLJ, effectively
  * all-pairs.
  *
  * The banded rewrite manufactures the equi-key: bucket both sides by
  * `floor(value / r)`. In EXACT arithmetic two values within distance `r`
  * sit in buckets differing by at most 1 (for b(probe) ≥ b(build)+2 one
  * needs probe − build > r, and symmetrically). The COMPUTED quotient adds
  * one more: `value / r` rounds to nearest, and a quotient within half an
  * ulp below an integer crosses it, pushing the computed floor one ABOVE
  * the exact floor (never below — round-to-nearest of y ∈ [m, m+1) is
  * ≥ m while m is representable, so floors only flip upward). One side
  * flipping while the other holds widens the reachable gap to ±2; both
  * flipping shifts the buckets together. Replicating the build side to
  * bucket ±2 therefore finds every qualifying pair exactly once even at
  * these FP bucket edges (the probe side keeps a single bucket, so no
  * pair can match on two keys and no DISTINCT is needed). The exact
  * BETWEEN runs as a post-filter. The plan becomes a shuffled (or
  * broadcast, if the 5× build side is still small) HASH join partitioned
  * by bucket: work scales with per-bucket occupancy, never O(n·m).
  */
object BandJoin {

  /** Inner join of `probe` and `build` on
    * `probeVal BETWEEN buildVal - radius AND buildVal + radius`,
    * executed as a bucket equi-join. The build side (replicated 5×)
    * should be the smaller input. Column names must be disjoint.
    */
  def range(probe: DataFrame, build: DataFrame,
            probeVal: Column, buildVal: Column, radius: Double): DataFrame = {
    require(radius > 0, s"radius must be > 0, got $radius")
    require(!(probe.columns ++ build.columns).contains("__band"),
      "__band is reserved by BandJoin.range")
    // enforce (not just document) the disjointness: overlapping names
    // would join fine and then fail far downstream with
    // AMBIGUOUS_REFERENCE on first use — the deferred failure the
    // reserved-name requires exist to prevent
    val overlap = probe.columns.intersect(build.columns)
    require(overlap.isEmpty,
      s"BandJoin.range: probe and build share column name(s): " +
        s"${overlap.mkString(", ")} — rename one side")
    val p = probe.withColumn("__band", floor(probeVal / radius).cast("long"))
    // ±2, not ±1: covers the one-sided upward floor flip at FP bucket
    // edges (object doc) — a pair exactly at the radius boundary with a
    // quotient half an ulp under an integer would otherwise silently miss
    val b = build.withColumn("__band",
      explode(array(Seq(-2, -1, 0, 1, 2).map(d => floor(buildVal / radius).cast("long") + d): _*)))
    p.join(b, Seq("__band"))
      .filter(probeVal.between(buildVal - radius, buildVal + radius))
      .drop("__band")
  }
}
