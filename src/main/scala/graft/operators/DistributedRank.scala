package graft.operators

import graft.CacheTracker
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking / ntile over a total order WITHOUT a
  * single-partition window.
  *
  * `ntile(k) OVER (ORDER BY score DESC, id)` with no `PARTITION BY` plans a
  * SINGLE-partition WindowExec in Spark: every row moves through one task —
  * trivially green at test scale, a one-task ~160 GB sort at 10¹⁰ rows.
  * This operator computes the identical result with a partition-parallel
  * plan, the classic two-level distributed-rank construction:
  *
  *   1. One bounded aggregate collects `P-1` approximate percentile
  *     thresholds of the score (`P` = `spark.sql.shuffle.partitions`, the
  *     cluster-parallelism knob). Once collected they are FIXED literals,
  *     so every later step is deterministic regardless of the sketch's
  *     merge order.
  *   2. Each row is assigned a range group by counting thresholds ≥ its
  *     score — a codegen'd fold over a cluster-bounded literal array (the
  *     same bounded-literal kernel shape as CentroidAssign), no join, no
  *     extra shuffle beyond the group-window's own exchange.
  *   3. `row_number` over `Window.partitionBy(group)` ranks WITHIN each
  *     group — P parallel window tasks of ~N/P rows each.
  *   4. A ≤P-row `groupBy(group).count` collect (bounded by cluster
  *     parallelism, the accepted driver-artifact class) yields exact
  *     per-group rank offsets; global rank = offset + local rank.
  *
  * Exactness: group assignment is monotone in the sort order (equal scores
  * share a group; the within-group window breaks ties by `idCol`), so
  * offset + local rank IS the exact global `row_number` — and the ntile
  * buckets derived from it match the SQL window function bit-for-bit,
  * including the first-(N mod k)-buckets-get-one-extra rule. Threshold
  * QUALITY only affects group balance, never correctness; a worst-case
  * all-equal score column degenerates to one group (inherent to any
  * value-range split — no order-based method can parallelize a key with
  * one distinct value).
  *
  * The input is cached through [[CacheTracker]] for the two bounded
  * actions + final consumption; runner scopes release it.
  *
  * `scoreCol` must be non-null (null comparisons would land rows in group
  * 0 with undefined order vs the SQL window's NULLS LAST).
  */
object DistributedRank {

  /** Exact `row_number() OVER (ORDER BY scoreCol DESC, idCol ASC)` as a
    * partition-parallel plan. `idCol` must be a tie-breaking unique key.
    */
  def rankDesc(df: DataFrame, scoreCol: String, idCol: String,
               rankCol: String = "rk"): DataFrame =
    // r18: reverted to the bounded offsets COLLECT (the r16 shape). r17
    // moved the offsets in-plan (triangular self-join of the ≤P-row group
    // totals) to save one driver round-trip, but both the driver's bench
    // tail and the builder's own table showed the consumers regressing
    // (q_shuffle_epoch +22%, q_shard_stored +27%, q_sample_quality_budget
    // +22%): the extra aggregate + two broadcast joins cost more than the
    // ≤P-row collect — the accepted driver-artifact class — at every
    // measured size.
    rankCore(df, scoreCol, idCol, rankCol)._1

  /** [[rankDesc]] with the range-group thresholds supplied by the CALLER
    * as literals instead of collected via a `percentile_approx` pass —
    * for score columns whose distribution is KNOWN by construction (the
    * engine's epoch-shuffle and curriculum keys are uniform 48-bit
    * content hashes). Correctness never depends on threshold quality
    * (see the object doc: thresholds only set group BALANCE), so a
    * known-uniform domain can skip the sketch: one bounded action and —
    * at production scale — one full pass over the input fewer per rank
    * (guide §1.2: remove passes; the sketch aggregate scans every row).
    * `ths` need not be sorted or deduplicated.
    */
  def rankDescWithThresholds(df: DataFrame, scoreCol: String, idCol: String,
                             ths: Seq[Double], rankCol: String = "rk"): DataFrame =
    prefixCore(df, scoreCol, idCol, lit(1L), rankCol, Some(ths))._1

  /** Equal-width thresholds over a known-uniform score domain
    * `[lo, hi)`, sized to the cluster-parallelism knob like the
    * percentile sketch they replace.
    */
  def uniformThresholds(spark: org.apache.spark.sql.SparkSession,
                        lo: Double, hi: Double): Seq[Double] = {
    val p = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt.max(1)
    (1 until p).map(i => lo + (hi - lo) * i / p)
  }

  /** Exact `ntile(n) OVER (ORDER BY scoreCol DESC, idCol ASC)` (standard
    * SQL bucket-size rule) as a partition-parallel plan.
    */
  def ntileDesc(df: DataFrame, scoreCol: String, idCol: String, n: Int,
                bucketCol: String = "bucket"): DataFrame = {
    require(n >= 1, s"ntile bucket count must be >= 1, got $n")
    require(!df.columns.contains(bucketCol),
      s"ntileDesc output column '$bucketCol' already exists on the input — " +
        "it would be silently clobbered; pass a different bucketCol")
    val (ranked, total) = rankCore(df, scoreCol, idCol, "__graft_rk")
    // standard ntile sizing: q = N/n rows per bucket, the first N%n
    // buckets take one extra; k(i) = cumulative row count of buckets 1..i
    val q = total / n
    val r = total % n
    val ks = (1 to n).map(i => i.toLong * q + math.min(i.toLong, r))
    var bucket: Column = lit(n)
    for (i <- n - 1 to 1 by -1)
      bucket = when(col("__graft_rk") <= ks(i - 1), i).otherwise(bucket)
    ranked.withColumn(bucketCol, bucket.cast("int")).drop("__graft_rk")
  }

  /** The tercile/quantile CUT POINTS of the ranked order as driver scalars:
    * for each bucket boundary i (1..n-1) the (score, id) pair of the LAST
    * row of bucket i. A row belongs to bucket ≤ i iff it orders at-or-before
    * that pair — which is how a streaming admission gate applies a
    * batch-trained cut with zero windows: compare (score, id) against two
    * broadcast scalars. Returns (boundary score, boundary id) pairs,
    * ascending bucket index — ALWAYS n-1 entries for a non-empty input.
    * When N < n several boundary ranks coincide (empty buckets); the
    * shared cut pair is REPLICATED per boundary index rather than
    * collapsed, so [[bucketByBoundaries]] keeps stable bucket numbering
    * (the open tail is always bucket n) even on degenerate inputs. Empty
    * input returns Seq.empty.
    */
  def boundariesDesc(df: DataFrame, scoreCol: String, idCol: String,
                     n: Int): Seq[(Double, Long)] = {
    require(n >= 2, s"boundary extraction needs n >= 2, got $n")
    requireIntegralId(df, idCol, "boundariesDesc")
    val (ranked, total) = rankCore(df, scoreCol, idCol, "__graft_rk")
    val q = total / n
    val r = total % n
    val ks = (1 until n).map(i => i.toLong * q + math.min(i.toLong, r))
      .filter(k => k >= 1 && k <= total)
    if (ks.isEmpty) Seq.empty
    else {
      val pairOf: Map[Long, (Double, Long)] = ranked
        .filter(col("__graft_rk").isin(ks.distinct: _*))
        .select(col("__graft_rk"), col(scoreCol).cast("double"), col(idCol).cast("long"))
        .collect()
        .map(row => row.getLong(0) -> ((row.getDouble(1), row.getLong(2))))
        .toMap
      ks.map(pairOf)
    }
  }

  /** Projection-only bucket assignment from [[boundariesDesc]] cut points
    * — the streaming/serving face of [[ntileDesc]]: zero windows, zero
    * state, streaming-safe. A row orders at-or-before boundary i iff
    * `score > b_i.score OR (score == b_i.score AND id <= b_i.id)`; its
    * bucket is the first such i, else `boundaries.size + 1`. Applying
    * batch-trained boundaries to the SAME rows reproduces ntileDesc
    * exactly (the tie-break carries through); on NEW rows it is the
    * frozen admission cut — the same artifact pattern as the classifier
    * weights or the BPE vocab.
    */
  def bucketByBoundaries(df: DataFrame, scoreCol: String, idCol: String,
                         boundaries: Seq[(Double, Long)],
                         bucketCol: String = "bucket"): DataFrame = {
    requireIntegralId(df, idCol, "bucketByBoundaries")
    require(!df.columns.contains(bucketCol),
      s"bucketByBoundaries output column '$bucketCol' already exists on " +
        "the input — it would be silently clobbered; pass a different bucketCol")
    val score = col(scoreCol)
    val id = col(idCol)
    var bucket: Column = lit(boundaries.size + 1)
    for (((bs, bi), idx) <- boundaries.zipWithIndex.reverse)
      bucket = when(score > bs || (score === bs && id <= bi), idx + 1)
        .otherwise(bucket)
    df.withColumn(bucketCol, bucket.cast("int"))
  }

  /** The boundary-scalar pair (score, id) stores the id as a LONG and
    * [[bucketByBoundaries]] compares `id <= bi` against a long literal —
    * NUMERIC order. [[rankDesc]]/[[ntileDesc]] order `idCol` by its OWN
    * type; for a numeric-string id the two orders disagree ("10" < "9"
    * lexicographically), so serving would diverge from training exactly
    * at tied boundary scores — silently. Restrict the boundary path to
    * integral ids up front (string-keyed ranking stays supported in
    * rankDesc, e.g. LmGate.capBigrams).
    */
  private def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op needs an integral idCol (its boundary scalars store ids as " +
        s"long and compare numerically); '$idCol' is $dt — rank on a " +
        "surrogate integral key instead")
  }

  /** Range-group index for a score against the sorted threshold literals:
    * `grp = |{t : score <= t}| = n - lowerBound(ths, score)`, emitted as a
    * BALANCED nested-CASE binary search — O(log P) comparisons per row
    * (vs O(P) for a literal-array fold), O(P) expression nodes, fully
    * codegen'd. At cluster scale P tracks spark.sql.shuffle.partitions
    * (thousands); a linear per-row scan there would cost more than the
    * rank windows themselves.
    */
  private def grpExpr(ths: Seq[Double], score: Column): Column = {
    if (ths.isEmpty) return lit(0)
    val sorted = ths.sorted.toIndexedSeq
    val n = sorted.size
    // binary-search i0 = first index with ths(i0) >= score (n = none);
    // the matching suffix {i0..n-1} has size n - i0 = grp
    def search(lo: Int, hi: Int): Column =
      if (lo == hi) lit(n - lo)
      else {
        val mid = (lo + hi) / 2
        when(score <= lit(sorted(mid)), search(lo, mid))
          .otherwise(search(mid + 1, hi))
      }
    search(0, n)
  }

  /** Exact running total of an integral weight over
    * `(scoreCol DESC, idCol ASC)` — semantically
    * `sum(weight) OVER (ORDER BY score DESC, id ROWS UNBOUNDED PRECEDING)`
    * — as the same partition-parallel two-level construction as
    * [[rankDesc]], with per-group WEIGHT TOTALS instead of row counts as
    * the offsets. The canonical curation use is the quality-ranked budget
    * cut: keep the best documents while the running token total stays
    * under budget, a plain filter on the result. `weightCol` must be
    * non-null integral (summed exactly as long); `rankDesc` is this
    * operator with weight ≡ 1.
    */
  def cumSumDesc(df: DataFrame, scoreCol: String, idCol: String,
                 weightCol: String, cumCol: String = "cum"): DataFrame =
    // ≤P-row offsets COLLECT: r17 A/B'd in-plan triangular-join offsets
    // (both here and in rankDesc) and they cost more than the bounded
    // driver round-trip at every measured size — reverted everywhere in
    // r18 (see rankDesc)
    prefixCore(df, scoreCol, idCol, col(weightCol).cast("long"), cumCol)._1

  private def rankCore(df: DataFrame, scoreCol: String, idCol: String,
                       rankCol: String): (DataFrame, Long) =
    prefixCore(df, scoreCol, idCol, lit(1L), rankCol, None)

  /** Shared two-level prefix-aggregate core: running sum of `weight` in
    * the (scoreCol DESC, idCol ASC) total order, plus the grand total.
    * With weight ≡ 1 the running sum IS `row_number` and the total is N.
    */
  private def prefixCore(df: DataFrame, scoreCol: String, idCol: String,
                         weight: Column, outCol: String,
                         thsOverride: Option[Seq[Double]] = None): (DataFrame, Long) = {
    // fail fast instead of silently clobbering-then-dropping a caller
    // column — the same reserved-name contract as BandJoin's __band and
    // AsofJoin's __k/__ts/__tag/__rp (__graft_rk is ntileDesc's temp,
    // which feeds its input back through this core)
    val clash = df.columns.filter(c =>
      c == "__graft_grp" || c == "__graft_rk" || c == "__graft_off")
    require(clash.isEmpty,
      s"DistributedRank reserves column name(s) ${clash.mkString(", ")}; " +
        "rename them on the input")
    // the OUTPUT column gets the same fail-fast as the reserved temps: a
    // caller whose input already carries `rk`/`cum` (or a custom outCol)
    // would otherwise have that data column silently replaced
    require(outCol == "__graft_rk" || !df.columns.contains(outCol),
      s"DistributedRank output column '$outCol' already exists on the " +
        "input — it would be silently clobbered; pass a different name")
    val spark = df.sparkSession
    val cached = CacheTracker.cached(df)
    val p = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt.max(1)
    val score = col(scoreCol)

    // bounded action 1: P-1 approximate percentile thresholds, collected
    // once so the group assignment below is a deterministic literal fold.
    // The sketch input is cast to double because percentile_approx returns
    // its INPUT type — an integral scoreCol would otherwise hand back
    // longs where the threshold literals expect doubles. Integral scores
    // up to 2^53 stay exact in the comparison domain.
    // … unless the caller supplied literal thresholds for a
    // known-distribution score ([[rankDescWithThresholds]]): the sketch
    // action AND its full input pass are skipped outright
    val ths: Seq[Double] = thsOverride.getOrElse {
      if (p <= 1) Seq.empty
      else {
        val fr = (1 until p).map(_.toDouble / p)
        val row = cached
          .agg(percentile_approx(score.cast("double"), typedLit(fr), lit(10000)).as("t"))
          .head()
        if (row.isNullAt(0)) Seq.empty else row.getSeq[Double](0)
      }
    }
    val withGrp = cached.withColumn("__graft_grp", grpExpr(ths, score))

    // exact per-group weight totals (≤ P rows) → prefix offsets in group
    // order: bounded action 2, the accepted driver-artifact class. The
    // collected offsets become a literal map lookup; global rank =
    // offset + within-group running sum. (r17's in-plan triangular-join
    // alternative — offsets computed as a ≤P-row self-join broadcast back
    // — measured WORSE than this collect for every consumer family and
    // was removed in r18.)
    val w = Window.partitionBy("__graft_grp")
      .orderBy(score.desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cnts = withGrp.groupBy("__graft_grp")
      .agg(sum(weight).cast("long").as("__graft_w"))
      .collect()
      .map(row => (row.getInt(0), row.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offs: Map[Int, Long] =
      cnts.map { case (g, c) => val o = acc; acc += c; g -> o }.toMap
    val total = acc
    val offset: Column =
      if (offs.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offs), col("__graft_grp")), lit(0L))
    val ranked = withGrp
      .withColumn(outCol, offset + sum(weight).over(w).cast("long"))
      .drop("__graft_grp")
    (ranked, total)
  }
}
