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
  * `floor(value / r)`. Two values within distance `r` sit in the same or
  * adjacent buckets (their bucket indices differ by at most 1 — for
  * b(probe) ≥ b(build)+2 one needs probe − build > r, and symmetrically),
  * so replicating the build side to its bucket ±1 and equi-joining on the
  * bucket finds every qualifying pair exactly once (the probe side keeps a
  * single bucket, so no pair can match on two keys and no DISTINCT is
  * needed). The exact BETWEEN runs as a post-filter. The plan becomes a
  * shuffled (or broadcast, if the 3× build side is still small) HASH join
  * partitioned by bucket: work scales with per-bucket occupancy, never
  * O(n·m).
  */
object BandJoin {

  /** Inner join of `probe` and `build` on
    * `probeVal BETWEEN buildVal - radius AND buildVal + radius`,
    * executed as a bucket equi-join. The build side (replicated 3×)
    * should be the smaller input. Column names must be disjoint.
    */
  def range(probe: DataFrame, build: DataFrame,
            probeVal: Column, buildVal: Column, radius: Double): DataFrame = {
    require(radius > 0, s"radius must be > 0, got $radius")
    require(!(probe.columns ++ build.columns).contains("__band"),
      "__band is reserved by BandJoin.range")
    val p = probe.withColumn("__band", floor(probeVal / radius).cast("long"))
    val b = build.withColumn("__band",
      explode(array(Seq(-1, 0, 1).map(d => floor(buildVal / radius).cast("long") + d): _*)))
    p.join(b, Seq("__band"))
      .filter(probeVal.between(buildVal - radius, buildVal + radius))
      .drop("__band")
  }
}
