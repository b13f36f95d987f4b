package graft.ext

import graft.{CacheTracker, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the embedding column
  * (`Array[Float]`, 64-dim).
  *
  *  - `q_embed_topk`: brute-force cosine top-k — the correctness baseline.
  *    The probe set is broadcast, so the scan side streams once with no
  *    shuffle; cost O(|Q|·N) compute, O(N) IO.
  *  - `q_embed_lsh`: sign-LSH over L=4 hash tables × b=16 seeded
  *    pseudo-random hyperplanes each (64 planes total, 2^16 buckets per
  *    table) with 1-bit multi-probe on the query side. Candidates come from
  *    an equi-join on (table, bucket) — work per probe scales with bucket
  *    occupancy (N/2^16 per table), not with N. Scaling rule: grow b with
  *    log2(N) to hold bucket occupancy constant; grow L / probe radius to
  *    buy recall.
  *
  * The hyperplanes are integer-arithmetic-derived (exact in both engines,
  * no libm calls), so the DuckDB oracle reproduces them bit-for-bit.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** (vec_id, v): embeddings widened to double for exact-order parity. */
  private[ext] def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private val DotSql = "list_dot_product"
  private def cosSql(a: String, b: String): String =
    s"round($DotSql($a, $b) / (sqrt($DotSql($a, $a)) * sqrt($DotSql($b, $b))), 6)"
  private def cosRawSql(a: String, b: String): String =
    s"$DotSql($a, $b) / (sqrt($DotSql($a, $a)) * sqrt($DotSql($b, $b)))"

  // ---------------- sign-LSH: seeded hyperplanes ----------------
  val Tables_L = 4  // hash tables
  val Bits_B   = 16 // hyperplane bits per table -> 2^16 buckets/table
  val Dim      = 64

  /** Plane weights from pure integer arithmetic: exactly reproducible in
    * SQL (no RNG, no libm). w(i,j) ∈ [-1, 1] with ~uniform spread.
    */
  private def planeWeight(i: Int, j: Int): Double =
    ((((i * 2654435761L + j * 40503L) * 69069L + 12345L) % 2147483647L) % 2001L - 1000L) / 1000.0

  private[ext] val Planes: IndexedSeq[Seq[Double]] =
    (0 until Tables_L * Bits_B).map(i => (0 until Dim).map(j => planeWeight(i, j)))

  /** Per-row bucket array, one 16-bit bucket per hash table. Evaluated as
    * 64 codegen'd dot products — columnar, zero shuffle.
    */
  private def bucketArray(v: Column): Column =
    array((0 until Tables_L).map { t =>
      (0 until Bits_B).map { b =>
        when(dot(v, typedLit(Planes(t * Bits_B + b))) > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)

  /** (vec_id, v, tbl, bucket): LSH index rows, L per vector. */
  def lshSignatures(vecDf: DataFrame): DataFrame =
    vecDf.select(col("vec_id"), col("v"), posexplode(bucketArray(col("v"))).as(Seq("tbl", "bucket")))

  /** 1-bit multi-probe: the probe's own bucket plus every 1-bit flip —
    * 17 lookup keys per (probe, table), query-side only.
    */
  private def probeBuckets(bucket: Column): Column =
    array(bucket +: (0 until Bits_B).map(f => bucket.bitwiseXOR(lit(1L << f))): _*)

  /** Distinct (qid, cand) candidate pairs for probes selected by `probePred`
    * — an equi-join on (tbl, bucket), shuffled by bucket: the sublinear
    * scale path (never compares a probe against the full corpus).
    */
  def lshCandidates(sigs: DataFrame, probePred: Column): DataFrame = {
    val probes = sigs.filter(probePred)
      .select(col("vec_id").as("qid"), col("tbl"),
              explode(probeBuckets(col("bucket"))).as("bucket"))
    probes.join(sigs.select(col("vec_id").as("cand"), col("tbl"), col("bucket")),
                Seq("tbl", "bucket"))
      .filter(col("cand") =!= col("qid"))
      .select("qid", "cand").distinct()
  }

  /** Cosine-scored top-k among LSH candidates.
    *
    * Cache lifetime: the signature index is `.cache()`d because both sides
    * of the candidate join read it; the blocks live until the session drops
    * them (Bench clears between queries). Long-lived sessions issuing many
    * probe batches should build `lshSignatures(v).cache()` ONCE, reuse it
    * via [[lshCandidates]], and `unpersist()` when done — that is the
    * write-once/probe-many shape a production index has anyway.
    */
  def lshTopK(vecDf: DataFrame, probePred: Column, k: Int): DataFrame = {
    // cached: probe side and index side of the candidate join share these
    // signature rows; at cluster scale this materialization is the LSH
    // index build (write once, probe many)
    val sigs = lshSignatures(vecDf).transform(CacheTracker.cached)
    val cands = lshCandidates(sigs, probePred)
    val scored = cands
      .join(vecDf.select(col("vec_id").as("qid"), col("v").as("qv")), Seq("qid"))
      .join(vecDf.select(col("vec_id").as("cand"), col("v").as("cv")), Seq("cand"))
      .select(col("qid"), col("cand"), round(cosine(col("qv"), col("cv")), 6).as("cos_r"))
    val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("cand").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  // ---------------- IVF (inverted-file) coarse quantization ----------------

  /** Centroid set as one array literal: metadata-scale (≈ sqrt(N) rows,
    * the same data a broadcast would ship), collected once driver-side.
    * Each entry carries its pre-computed norm — sqrt of the SAME
    * left-to-right dot accumulation the Catalyst expression evaluates, so
    * downstream cosines are bit-identical to computing the norm per row
    * (but ~half the per-centroid work).
    */
  private[graft] def centroidSet(vecDf: DataFrame, centroidStride: Int): Seq[(Long, Seq[Double], Double)] = {
    // stride 0 would make `vec_id % stride` NULL: the filter drops every
    // row and downstream IVF/semdedup/kNN return EMPTY results posing as
    // "no neighbors found" — fail loudly like the other knobs
    require(centroidStride >= 1,
      s"centroidStride must be >= 1, got $centroidStride")
    vecDf.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id"), col("v"))
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1)
        var acc = 0.0; v.foreach(x => acc += x * x)
        (r.getLong(0), v, math.sqrt(acc))
      }
      .sortBy(_._1)
      .toSeq
  }

  /** Max centroids carried by one expression / literal. Past this the
    * assignment and probe-side selection switch to the chunked forms
    * (per-chunk argmax, then max-of-maxima) — still projection-only and
    * bit-identical (SimilaritySpec property-tests both). √N centroids at
    * billion-vector scale is ~3·10⁴: a handful of chunks.
    */
  private[ext] val CentroidChunk = 4096

  /** Top-`nprobe` (cos, −cid) cells for a probe vector — the codegen'd
    * [[graft.functions.CentroidTopCells]] kernel (probe norm computed
    * once per row, primitive scoring loop, partial selection sort);
    * per-chunk top-nprobe then a struct-sort merge when the centroid set
    * is chunked (top-n of the union of per-chunk top-n IS the global
    * top-n: struct ordering compares cos first, and on ties the larger
    * −cid is the smaller cid — identical to the kernel's tie-break).
    * Empty centroid set → empty cell array (every consumer explodes it:
    * zero candidate rows, matching [[cidExpr]]'s null assignment).
    */
  private[graft] def topCells(cents: Seq[(Long, Seq[Double], Double)], v: Column,
                              nprobe: Int, chunk: Int = CentroidChunk): Column = {
    if (cents.isEmpty)
      array().cast("array<struct<cos:double,ncid:bigint>>")
    else {
      val chunks = cents.grouped(chunk).toSeq
      if (chunks.lengthCompare(1) <= 0)
        graft.functions.CentroidAssign.centroid_top_cells(v, cents, nprobe)
      else {
        val merged = concat(chunks.map(ch =>
          graft.functions.CentroidAssign.centroid_top_cells(v, ch, nprobe)): _*)
        slice(sort_array(merged, asc = false), 1, nprobe)
      }
    }
  }

  def ivfAssign(vecDf: DataFrame, centroidStride: Int): DataFrame =
    assignWith(centroidSet(vecDf, centroidStride), vecDf)

  /** Assignment against an already-collected centroid set (so ivfTopK
    * collects it once, not once per use). The hot full-corpus loop is the
    * codegen'd [[graft.functions.CentroidAssign]] expression — same
    * projection-only plan, primitive nested loop instead of an
    * interpreted higher-order transform.
    */
  private def assignWith(cents: Seq[(Long, Seq[Double], Double)],
                         vecDf: DataFrame): DataFrame = {
    // no centroids (empty/filtered corpus): every assignment is null, the
    // same rows the pre-expression struct-max form produced
    vecDf.select(col("vec_id"), cidExpr(cents).as("cid"))
  }

  /** Nearest-centroid id expression, auto-chunked past [[CentroidChunk]]. */
  private[graft] def cidExpr(cents: Seq[(Long, Seq[Double], Double)]): Column =
    if (cents.isEmpty) lit(null).cast("long")
    else if (cents.lengthCompare(CentroidChunk) <= 0)
      graft.functions.CentroidAssign.centroid_assign(col("v"), cents)
    else
      graft.functions.CentroidAssign.centroid_assign_chunked(col("v"), cents, CentroidChunk)

  /** Default occupancy cap for [[semDedup]]'s within-cell pair scan. */
  val SemDedupCellCap = 64

  /** Semantic dedup (SemDeDup shape) with a skew guard: vectors are
    * clustered by the IVF coarse quantizer (projection-only assignment),
    * pairs are scored ONLY within a cell, and any vector with a lower-id
    * neighbor at cosine ≥ `simThreshold` is reported dropped, with its
    * lowest-id lower neighbor and the strongest similarity.
    *
    * Skew guard: the within-cell self-join is quadratic in CELL size, and
    * a dense embedding cluster — exactly the corpus region semantic dedup
    * exists to prune — can inflate one cell far past the balanced ≈√N
    * envelope, making a single partition do O(cell²) work. So any cell
    * above `cellCap` is split into ⌈cnt/cellCap⌉ sub-cells before the
    * pairwise pass, and pairs join on (cid, sub): per-sub-cell occupancy
    * is HARD-bounded by `cellCap` (round-robin on the within-cell
    * row_number, not a hash — no probabilistic tail), so per-cell pair
    * work is ≤ ⌈cnt/cap⌉·cap² ≈ cnt·cap, linear in the dense cluster's
    * size instead of quadratic. Cells at or under the cap get exactly one
    * sub-cell — the guard is a no-op on balanced data. Splitting a
    * cluster costs recall only across sub-cell boundaries of oversized
    * cells, the same granularity/recall trade the coarse quantizer itself
    * makes; the split is deterministic (row_number ordered by vec_id), so
    * results are reproducible and the DuckDB oracle reproduces them
    * exactly.
    *
    * Plan shape: assignment is the codegen'd projection; the sub split
    * rides the SAME cid window pass (row_number + per-cell count — one
    * corpus shuffle by cid, reused by both join legs since
    * HashPartitioning(cid) satisfies the (cid, sub) clustering); the
    * report is one aggregate on the surviving pairs. Nothing
    * corpus-quadratic, no new Exchange vs the unguarded form.
    */
  def semDedup(vecDf: DataFrame, cents: Seq[(Long, Seq[Double], Double)],
               simThreshold: Double, cellCap: Int = SemDedupCellCap): DataFrame = {
    val cells = semDedupCells(vecDf, cents, cellCap)
    cells.select(col("cid"), col("sub"), col("vec_id").as("id_a"), col("v").as("va"))
      .join(cells.select(col("cid"), col("sub"), col("vec_id").as("id_b"), col("v").as("vb")),
            Seq("cid", "sub"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
              round(cosine(col("va"), col("vb")), 6).as("cos_r"))
      .filter(col("cos_r") >= simThreshold)
      .groupBy(col("id_b").as("dropped"))
      .agg(min("id_a").as("kept"), max("cos_r").as("max_cos"))
  }

  /** (vec_id, v, cid, sub) — the guarded cell assignment behind
    * [[semDedup]], exposed for the occupancy-bound spec. */
  private[graft] def semDedupCells(vecDf: DataFrame,
                                   cents: Seq[(Long, Seq[Double], Double)],
                                   cellCap: Int): DataFrame = {
    require(cellCap > 0, "cellCap must be positive")
    val wp = Window.partitionBy("cid")
    val nsub = ceil(count(lit(1)).over(wp) / lit(cellCap.toDouble))
    val rn = row_number().over(wp.orderBy("vec_id")).cast("long")
    vecDf.select(col("vec_id"), col("v"), cidExpr(cents).as("cid"))
      .withColumn("sub", pmod(rn - 1, nsub))
  }

  /** Cosine top-k via IVF: probe the `nprobe` nearest cells per query.
    * Probe→cell selection is the same projection-only centroid scoring as
    * [[ivfAssign]] (sort the scored array, keep `nprobe`) — no join, no
    * shuffle, on either side of the cell assignment.
    */
  def ivfTopK(vecDf: DataFrame, probePred: Column, centroidStride: Int,
              nprobe: Int, k: Int): DataFrame =
    ivfTopKWith(vecDf, centroidSet(vecDf, centroidStride), probePred, nprobe, k)

  /** [[ivfTopK]] against an explicit centroid set — the entry point for
    * k-means-refined centroids ([[refineCentroids]]). */
  def ivfTopKWith(vecDf: DataFrame, cents: Seq[(Long, Seq[Double], Double)],
                  probePred: Column, nprobe: Int, k: Int): DataFrame = {
    val asn = assignWith(cents, vecDf)
    val probes = vecDf.filter(probePred)
      .select(col("vec_id").as("qid"),
        explode(topCells(cents, col("v"), nprobe)).as("sc"))
      .select(col("qid"), (-col("sc.ncid")).as("cid"))
    // each candidate lives in exactly ONE cell and a probe's nprobe cells
    // are distinct (topCells slices distinct centroids), so (qid, cand)
    // pairs are already unique — no dedup Exchange (same invariant as
    // probeIndex)
    val cands = probes.join(asn, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand"))
    val scored = cands
      .join(vecDf.select(col("vec_id").as("qid"), col("v").as("qv")), Seq("qid"))
      .join(vecDf.select(col("vec_id").as("cand"), col("v").as("cv2")), Seq("cand"))
      .select(col("qid"), col("cand"), round(cosine(col("qv"), col("cv2")), 6).as("cos_r"))
    val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("cand").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  // ---------------- k-means (Lloyd) centroid refinement ----------------

  /** A few Lloyd rounds over the corpus, as DataFrame iterations:
    *
    *  - assign: the codegen'd [[graft.functions.CentroidAssign]] projection
    *    (auto-chunked) — no join, no shuffle;
    *  - update: per-cell element-wise mean via `Dim` decimal sums + a
    *    count — ONE map-side-combined shuffle of #cells × Dim partial
    *    aggregates per round, then a #cells-row collect (metadata-scale,
    *    the same data the next round's expression would broadcast anyway).
    *
    * Determinism: elements are rounded to 9dp then summed as
    * DECIMAL(28,12) (order-independent), and the mean is
    * `round(sum/count, 9)` computed IN the engine — so the DuckDB oracle's
    * unrolled rounds derive bit-identical centroids, and reruns are exact.
    * Empty cells keep their previous centroid (standard Lloyd). Each
    * round's plan is re-rooted at `vecDf` with the new centroids as plain
    * reference data — no growing lineage, nothing to checkpoint.
    */
  def refineCentroids(vecDf: DataFrame, init: Seq[(Long, Seq[Double], Double)],
                      rounds: Int): Seq[(Long, Seq[Double], Double)] = {
    var cents = init
    var r = 0
    while (r < rounds && cents.nonEmpty) {
      // Dim parallel decimal buffers beat the oracle's unnest/GROUP BY(j)
      // shape in-engine (measured 2.3 s vs 3.0 s at sf0.1: the x64 explode
      // costs more row overhead than wide aggregation buffers save); both
      // shuffle the same <= #cells x Dim partials
      val sums = (0 until Dim).map(j =>
        sum(round(col("v")(j), 9).cast("decimal(28,12)")).as(s"s$j"))
      val means = (0 until Dim).map(j =>
        round(col(s"s$j").cast("double") / col("n"), 9).as(s"m$j"))
      val rows = vecDf
        .select(cidExpr(cents).as("cid"), col("v"))
        .groupBy("cid")
        .agg(count(lit(1)).as("n"), sums: _*)
        .select(col("cid") +: means: _*)
        .collect()
      val upd = rows.map(row =>
        row.getLong(0) -> (1 to Dim).map(row.getDouble).toIndexedSeq).toMap
      cents = cents.map { case (cid, v, nrm) =>
        upd.get(cid) match {
          case Some(mu) =>
            // same left-to-right accumulation as list_dot_product / the
            // CentroidAssign kernel, so the stored norm is bit-exact
            var acc = 0.0; mu.foreach(x => acc += x * x)
            (cid, mu, math.sqrt(acc))
          case None => (cid, v, nrm)
        }
      }
      r += 1
    }
    cents
  }

  // ---------------- product quantization (PQ) ----------------
  val PqM = 8       // subspaces
  val PqSub = 8     // dims per subspace (PqM * PqSub = Dim)
  val PqK = 16      // codewords per subspace -> 4-bit codes

  /** Codebook(m)(k) = subspace m of the k-th training vector, where k is
    * the POSITION in the vec_id-sorted training set (the vectors with
    * vec_id < PqK), NOT the vec_id itself — the codeword index stays dense
    * 0..K-1 for any id set (ids starting past 0, gaps below PqK). The
    * oracle mirror ([[pqCodeSql]]) uses the same positional rule via
    * DENSE_RANK. Deterministic no-training baseline (sampled codewords),
    * collected once driver-side (metadata-scale: ≤ PqK vectors). A
    * k-means-refined codebook drops in behind the same interface.
    */
  private[graft] def pqCodebook(vecDf: DataFrame): Seq[Seq[Seq[Double]]] = {
    val train = vecDf.filter(col("vec_id") < PqK)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    (0 until PqM).map(m => train.toSeq.map {
      case (_, v) => v.slice(m * PqSub, (m + 1) * PqSub)
    })
  }

  /** Per-subspace Lloyd rounds for the PQ codebook: assign is the
    * codegen'd [[graft.functions.PqEncode]] projection (each subspace's
    * 4-bit code IS its cluster id), update is the per-(m, k) subvector
    * mean — one map-side-combined shuffle of ≤ PqM·PqK·PqSub partial
    * aggregates per round, then a ≤ PqM·PqK-row collect. Same
    * 9dp-round/decimal-sum determinism as [[refineCentroids]]; empty
    * codewords keep their previous value.
    */
  def refinePqCodebook(vecDf: DataFrame, init: Seq[Seq[Seq[Double]]],
                       rounds: Int): Seq[Seq[Seq[Double]]] = {
    var cb = init
    var r = 0
    while (r < rounds) {
      val coded = vecDf
        .select(col("v"),
          graft.functions.PqEncode.pq_encode(col("v"), cb, PqSub).as("code"))
        .select(col("v"), explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("code"))
        .select(col("m"),
          expr("cast(shiftright(code, 4 * m) & 15 as int)").as("k"), col("v"))
      val sums = (0 until PqSub).map(j =>
        sum(round(expr(s"v[m * $PqSub + $j]"), 9).cast("decimal(28,12)")).as(s"s$j"))
      val means = (0 until PqSub).map(j =>
        round(col(s"s$j").cast("double") / col("n"), 9).as(s"u$j"))
      val rows = coded.groupBy("m", "k")
        .agg(count(lit(1)).as("n"), sums: _*)
        .select(col("m") +: col("k") +: means: _*)
        .collect()
      val upd = rows.map(row => (row.getInt(0), row.getInt(1)) ->
        (0 until PqSub).map(j => row.getDouble(2 + j))).toMap
      cb = cb.zipWithIndex.map { case (ks, m) =>
        ks.zipWithIndex.map { case (cw, k) => upd.getOrElse((m, k), cw.toSeq) }
      }
      r += 1
    }
    cb
  }

  /** [[pqCodes]] against an explicit codebook (for refined codebooks). */
  def pqCodesWith(vecDf: DataFrame, cb: Seq[Seq[Seq[Double]]]): DataFrame =
    vecDf.select(col("vec_id"),
      graft.functions.PqEncode.pq_encode(col("v"), cb, PqSub).as("pq_code"))

  /** (vec_id, pq_code): every vector encoded to ONE packed long (4 bits
    * per subspace code) — 8 bytes instead of 512, the 64× compression an
    * ADC scan exploits. Pure projection via the codegen'd [[
    * graft.functions.PqEncode]] expression: no join, no shuffle, at any
    * corpus size.
    */
  def pqCodes(vecDf: DataFrame): DataFrame =
    pqCodesWith(vecDf, pqCodebook(vecDf))

  /** ADC (asymmetric distance) top-k over the FULL corpus: probes keep
    * their raw vectors, every candidate is scanned as its packed 8-byte
    * code. Scoring is the codegen'd [[graft.functions.PqAdc]] kernel — one
    * projection per (probe, candidate) row with a FIXED accumulation order
    * (per-subspace inner fold, outer fold over subspaces), so rankings are
    * bit-identical to the oracle's nested `list_reduce` without decimal
    * order-independence tricks, and the old explode(m)+codebook-join+
    * groupBy shape (an extra shuffle per probe batch) is gone.
    *
    * This remains the exhaustive-ADC BASELINE (every probe scores every
    * code): correct at any size but O(|Q|·N) compute. The scale path is
    * [[ivfPqTopK]], which restricts the same kernel to `nprobe` IVF cells.
    */
  def pqTopK(vecDf: DataFrame, probePred: Column, k: Int): DataFrame = {
    val cb = pqCodebook(vecDf)
    val probes = vecDf.filter(probePred)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    // reuse the already-collected codebook: pqCodes(vecDf) would rebuild
    // it — a second driver-side collect over the corpus plan per call
    val scored = pqCodesWith(vecDf, cb)
      .join(broadcast(probes), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand"),
        graft.functions.PqAdc.pq_adc(col("qv"), col("pq_code"), cb, PqSub).as("adc"))
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("cand").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("cand"),
              round(col("adc"), 6).as("adc_r"))
  }

  /** IVF-PQ (IVFADC) top-k — the composition of the coarse quantizer with
    * the PQ code scan, the industry-standard billion-scale ANN plan:
    *
    *  - Index build is ONE projection over the corpus: coarse cell id
    *    (codegen'd [[graft.functions.CentroidAssign]]) + packed 8-byte code
    *    (codegen'd [[graft.functions.PqEncode]]) per row — no join, no
    *    shuffle, at any corpus size. At rest the index is stored
    *    partitioned by `cid`, so probing maps to partition pruning.
    *  - Probe→cell selection is the same projection-only centroid scoring
    *    as [[ivfTopK]] (top `nprobe` cells per probe).
    *  - Candidates come from an EQUI-join on `cid` (broadcast probes): work
    *    per probe scales with `nprobe` × cell size (≈ nprobe·√N), never the
    *    corpus — the fix for the exhaustive-ADC shape of [[pqTopK]].
    *  - Scoring reads candidate CODES only ([[graft.functions.PqAdc]], one
    *    codegen'd projection); raw vectors never leave the probe side.
    */
  def ivfPqTopK(vecDf: DataFrame, probePred: Column, centroidStride: Int,
                nprobe: Int, k: Int): DataFrame =
    ivfPqTopKWith(vecDf, centroidSet(vecDf, centroidStride), pqCodebook(vecDf),
                  probePred, nprobe, k)

  /** [[ivfPqTopK]] against explicit (possibly k-means-refined) centroids
    * and codebook — the production composition: train once
    * ([[refineCentroids]] / [[refinePqCodebook]]), index + probe many.
    */
  def ivfPqTopKWith(vecDf: DataFrame, cents: Seq[(Long, Seq[Double], Double)],
                    cb: Seq[Seq[Seq[Double]]], probePred: Column,
                    nprobe: Int, k: Int): DataFrame =
    probeIndex(indexRows(vecDf, cents, cb), vecDf.filter(probePred), cents, cb,
               nprobe, k)

  /** THE IVF-PQ index row — (vec_id, cell id, packed 8-byte code), one
    * codegen'd projection per vector. The single definition behind the
    * in-memory operator ([[ivfPqTopKWith]]), the at-rest index
    * ([[AnnIndex.write]]), and the streaming maintainer
    * ([[graft.streaming.StreamingOps.annIndexRows]]) — asserted equivalent
    * by their specs, so they must share this code.
    */
  def indexRows(vecDf: DataFrame, cents: Seq[(Long, Seq[Double], Double)],
                cb: Seq[Seq[Seq[Double]]]): DataFrame =
    vecDf.select(col("vec_id"), cidExpr(cents).as("cid"),
      graft.functions.PqEncode.pq_encode(col("v"), cb, PqSub).as("pq_code"))

  /** The shared scoring/ranking tail of every IVF-PQ probe path
    * (in-memory, at-rest, batch side of streaming): projection-only cell
    * selection for the probes, broadcast equi-join on cid, PqAdc scoring
    * of codes, (adc ASC, cand ASC) top-k. One definition so the tie-break
    * and rounding contract cannot drift between the variants.
    */
  private[graft] def probeIndex(index: DataFrame, probeVecs: DataFrame,
                                cents: Seq[(Long, Seq[Double], Double)],
                                cb: Seq[Seq[Seq[Double]]],
                                nprobe: Int, k: Int,
                                excludeSelf: Boolean = true): DataFrame = {
    val probes = probeVecs
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        explode(topCells(cents, col("v"), nprobe)).as("sc"))
      .select(col("qid"), col("qv"), (-col("sc.ncid")).as("cid"))
    // each candidate lives in exactly one cell and a probe's nprobe cells
    // are distinct, so (qid, cand) pairs need no dedup
    val joined = index.join(broadcast(probes), Seq("cid"))
    // excludeSelf drops the probe's own corpus row — correct when probes
    // ARE corpus rows (the declared queries); set false for an EXTERNAL
    // probe set, whose ids are a different id space and an equal id is a
    // coincidence, not self (dropping it would silently lose a true
    // neighbor)
    val scored = (if (excludeSelf) joined.filter(col("vec_id") =!= col("qid")) else joined)
      .select(col("qid"), col("vec_id").as("cand"),
        graft.functions.PqAdc.pq_adc(col("qv"), col("pq_code"), cb, PqSub).as("adc"))
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("cand").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("cand"),
              round(col("adc"), 6).as("adc_r"))
  }

  /** IVF-PQ with exact-cosine re-ranking — the standard two-stage
    * production probe (FAISS's IVFADC + refine): the ADC scan shortlists
    * `shortlist` candidates per probe from the `nprobe` probed cells, then
    * ONLY those rows fetch their raw vectors for an exact cosine, and the
    * final top-k ranks on the exact score. Recall equals the exact
    * in-cell scan ([[ivfTopKWith]]) whenever the true in-cell top-k
    * survives the shortlist (shortlist ≈ 4k suffices in practice — the
    * committed RECALL.json curves pin it), while the scan cost stays the
    * 8-byte-code ADC pass: raw vectors are touched for |Q|·shortlist rows
    * only, an equi-join on vec_id that at 100 TB is a point-lookup-shaped
    * shuffle-hash join, never a corpus re-scan.
    */
  def ivfPqTopKRescoredWith(vecDf: DataFrame,
                            cents: Seq[(Long, Seq[Double], Double)],
                            cb: Seq[Seq[Seq[Double]]], probePred: Column,
                            nprobe: Int, k: Int, shortlist: Int): DataFrame = {
    // a shortlist below k silently truncates the rerank output to
    // shortlist rows where the caller asked for k
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k): the rescore stage can " +
        "only return candidates the ADC shortlist produced")
    val short = ivfPqTopKWith(vecDf, cents, cb, probePred, nprobe, shortlist)
      .select("qid", "cand")
    val rescored = short
      .join(vecDf.select(col("vec_id").as("cand"), col("v").as("cv")), Seq("cand"))
      .join(broadcast(vecDf.filter(probePred)
              .select(col("vec_id").as("qid"), col("v").as("qv"))), Seq("qid"))
      .select(col("qid"), col("cand"),
        round(cosine(col("qv"), col("cv")), 6).as("cos_r"))
    val w2 = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("cand").asc)
    rescored.withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("cand"), col("cos_r"))
  }

  /** Shared oracle fragments: codebook, per-subspace encoding, packed
    * codes — the SQL mirror of [[pqCodes]].
    */
  private val pqCodeSql = {
    val d2 = "list_reduce(list_transform(range(8), j -> " +
      "(x.v[c.m*8+j+1] - c.sub[j+1]) * (x.v[c.m*8+j+1] - c.sub[j+1])), (a, t) -> a + t)"
    s"""cb AS (
       |  SELECT (DENSE_RANK() OVER (ORDER BY vec_id) - 1) AS k, m,
       |    v[m*8+1 : m*8+8] AS sub
       |  FROM e, range($PqM) r(m) WHERE vec_id < $PqK
       |),
       |enc AS (
       |  SELECT vec_id, m, k FROM (
       |    SELECT x.vec_id, c.m, c.k,
       |      row_number() OVER (PARTITION BY x.vec_id, c.m
       |        ORDER BY $d2 ASC, c.k ASC) AS rn
       |    FROM e x, cb c
       |  ) WHERE rn = 1
       |),
       |code AS (
       |  SELECT vec_id, CAST(sum(k << (4*m)) AS BIGINT) AS pq_code
       |  FROM enc GROUP BY vec_id
       |)""".stripMargin
  }

  /** Reconstructed vector per packed code — the concatenation of its
    * PqM subspace codewords — plus the nested-fold ADC distance, the SQL
    * mirror of [[graft.functions.PqAdc]]: inner fold per subspace, outer
    * fold over subspaces, both left-to-right, so the IEEE accumulation
    * sequence matches the expression exactly and rankings agree without
    * decimal tricks.
    */
  private val reconSql =
    s"""recon AS (
       |  SELECT c.vec_id, flatten(list(w.sub ORDER BY w.m)) AS rv
       |  FROM code c JOIN cb w ON w.k = (c.pq_code >> (4*w.m)) & 15
       |  GROUP BY c.vec_id
       |)""".stripMargin
  private def adcSql(qv: String, rv: String): String =
    s"list_reduce(list_transform(range($PqM), m -> " +
      s"list_reduce(list_transform(range($PqSub), j -> " +
      s"($qv[m*$PqSub+j+1] - $rv[m*$PqSub+j+1]) * ($qv[m*$PqSub+j+1] - $rv[m*$PqSub+j+1])), " +
      s"(a, t) -> a + t)), (a, t) -> a + t)"

  /** The full IVF-PQ replay (nprobe=3, top-3) against an arbitrary
    * centroid-CTE chain whose FINAL centroid set is named `c` — shared by
    * q_embed_ivfpq (the in-memory operator), q_embed_ann_append /
    * q_embed_ann_maint (the at-rest tree: stride-25 centroids) and
    * q_embed_ann_retrain (Lloyd-refined centroids): a maintained or
    * retrained index must serve EXACTLY what a from-scratch build under
    * the same artifacts serves, so all the rows share one replay skeleton
    * and cannot drift.
    */
  private def ivfPqOracleSqlWith(centCtes: String) =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$centCtes,
       |$pqCodeSql,
       |$reconSql,
       |asn AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
       |    FROM e, c
       |  ) WHERE rn = 1
       |),
       |pc AS (
       |  SELECT qid, cid FROM (
       |    SELECT e.vec_id AS qid, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
       |    FROM e, c WHERE e.vec_id < 10
       |  ) WHERE rn <= 3
       |),
       |scored AS (
       |  SELECT p.qid, a.vec_id AS cand, ${adcSql("q.v", "r.rv")} AS adc
       |  FROM pc p
       |  JOIN asn a ON a.cid = p.cid AND a.vec_id <> p.qid
       |  JOIN recon r ON r.vec_id = a.vec_id
       |  JOIN e q ON q.vec_id = p.qid
       |)
       |SELECT qid, rn, cand, adc_r FROM (
       |  SELECT qid, cand, round(adc, 6) AS adc_r,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc ASC, cand ASC) AS rn
       |  FROM scored
       |) WHERE rn <= 3 ORDER BY qid, rn""".stripMargin

  /** The frozen-artifact instance: stride-25 sampled centroids. */
  private lazy val ivfPqOracleSql = ivfPqOracleSqlWith(
    "c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 25 = 0)")

  /** The retrained-artifact instance: the serving centroids are the
    * 2-round Lloyd refinement of the stride-25 seed over the FULL corpus
    * (the q_embed_ivf_kmeans arithmetic, bit-identical on both engines),
    * codebook unchanged — the oracle mirror of [[AnnIndex.retrain]] run
    * after the corpus grew.
    */
  private lazy val ivfPqRetrainOracleSql = ivfPqOracleSqlWith(
    s"""c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 25 = 0),
       |${lloydRoundSql("c0", "r1", "cr1")},
       |${lloydRoundSql("cr1", "r2", "cr2")},
       |c AS (SELECT cid, cv FROM cr2)""".stripMargin)

  /** One unrolled Lloyd round as DuckDB CTEs — the SQL mirror of a
    * [[refineCentroids]] iteration: assign every vector to its
    * cosine-nearest centroid of `prevC`, then `newC` = per-cell
    * element-wise mean (9dp-rounded decimal sums, mean re-rounded to 9dp —
    * the identical arithmetic the Spark side performs in-engine), with
    * empty cells keeping their previous centroid.
    */
  private def lloydRoundSql(prevC: String, tag: String, newC: String): String =
    s"""a$tag AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
       |    FROM e, $prevC c
       |  ) WHERE rn = 1
       |),
       |u$tag AS (
       |  SELECT a.cid, r.j,
       |    round(CAST(sum(CAST(round(e.v[r.j+1], 9) AS DECIMAL(28,12))) AS DOUBLE)
       |          / count(*), 9) AS mu
       |  FROM a$tag a JOIN e USING (vec_id) CROSS JOIN range($Dim) r(j)
       |  GROUP BY a.cid, r.j
       |),
       |$newC AS (
       |  SELECT c.cid, coalesce(u.cv, c.cv) AS cv
       |  FROM $prevC c LEFT JOIN (
       |    SELECT cid, list(mu ORDER BY j) AS cv FROM u$tag GROUP BY cid
       |  ) u USING (cid)
       |)""".stripMargin

  /** The same plane/signature/probe pipeline as DuckDB SQL fragments. */
  private val planesSql =
    s"""SELECT i, j,
       |  ((((i*2654435761 + j*40503) * 69069 + 12345) % 2147483647) % 2001 - 1000) / 1000.0 AS w
       |FROM range(${Tables_L * Bits_B}) t(i), range($Dim) u(j)""".stripMargin
  // dp is a LEFT-TO-RIGHT fold over j (list_reduce after an ORDER BY j
  // list build), matching the engine's DotProduct accumulation sequence —
  // an unordered SQL sum() could round a near-zero dot to the other side
  // of the `dp > 0` sign test and flip a bucket bit between engines
  private val sigsSql =
    s"""SELECT vec_id, tbl, CAST(sum(CASE WHEN dp > 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS bucket
       |FROM (
       |  SELECT e.vec_id, p.i // $Bits_B AS tbl, p.i % $Bits_B AS bit,
       |    list_reduce(list_transform(range($Dim), j -> e.v[j + 1] * p.wv[j + 1]),
       |                (a, b) -> a + b) AS dp
       |  FROM e, (SELECT i, list(w ORDER BY j) AS wv FROM planes GROUP BY i) p
       |) GROUP BY vec_id, tbl""".stripMargin

  /** Neighbors per probe for `q_embed_knn_classify`'s majority vote
    * (declared BEFORE `queries`: the oracle strings interpolate it at
    * object init, which runs top-to-bottom).
    */
  val KnnK = 10

  val queries: Seq[Q] = Seq(

    // ---- brute-force cosine top-3 for 20 probe vectors ----
    Q("q_embed_topk",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT * FROM e WHERE vec_id < 20),
         |sims AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cand, ${cosSql("q.v", "c.v")} AS cos_r
         |  FROM q JOIN e c ON c.vec_id <> q.vec_id
         |)
         |SELECT qid, rn, cand, cos_r FROM (
         |  SELECT qid, cand, cos_r,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cand) AS rn
         |  FROM sims
         |) WHERE rn <= 3 ORDER BY qid, rn""".stripMargin) { (s, d) =>
      val q = vecs(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val sims = vecs(s, d).select(col("vec_id").as("cand"), col("v"))
        .join(broadcast(q), col("cand") =!= col("qid"))
        .select(col("qid"), col("cand"), round(cosine(col("qv"), col("v")), 6).as("cos_r"))
      val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("cand").asc)
      sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("qid", "rn", "cand", "cos_r")
        .orderBy("qid", "rn")
    },

    // ---- int8 scalar quantization of embeddings + reconstruction error ----
    // The storage-compression step an embedding corpus goes through before
    // ANN serving (4x smaller than float32): per-vector min/max scaling to
    // 0..255, with the quantized checksum and reconstruction-error stats
    // as the auditable output. Everything is a PER-ROW projection over the
    // array — zero shuffle at any corpus size — and stays hash-checkable
    // because array folds run in array order: the double additions happen
    // in the identical sequence in both engines (plus exact-integer q_sum).
    Q("q_embed_quantize",
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    list_aggregate(CAST(embedding AS DOUBLE[]), 'min') AS mn,
         |    list_aggregate(CAST(embedding AS DOUBLE[]), 'max') AS mx
         |  FROM embeddings WHERE vec_id < 100
         |)
         |SELECT vec_id, CAST(len(v) AS INT) AS n_dims,
         |  CAST(list_reduce(list_transform(v,
         |    x -> CAST(round((x - mn) * 255 / (mx - mn)) AS INT)), (a, b) -> a + b) AS BIGINT) AS q_sum,
         |  round(mx - mn, 6) AS vrange,
         |  round(list_reduce(list_transform(v,
         |    x -> abs(x - (mn + round((x - mn) * 255 / (mx - mn)) * (mx - mn) / 255))),
         |    (a, b) -> a + b) / len(v), 6) AS mean_abs_err
         |FROM e WHERE mx > mn ORDER BY vec_id""".stripMargin) { (s, d) =>
      val base = vecs(s, d).filter(col("vec_id") < 100)
        .select(col("vec_id"), col("v"),
          array_min(col("v")).as("mn"), array_max(col("v")).as("mx"))
        .filter(col("mx") > col("mn"))
      def quant(x: Column) = round((x - col("mn")) * 255 / (col("mx") - col("mn")), 0)
      base.select(col("vec_id"),
          size(col("v")).as("n_dims"),
          aggregate(transform(col("v"), x => quant(x).cast("int")),
            lit(0), (a, b) => a + b).cast("long").as("q_sum"),
          round(col("mx") - col("mn"), 6).as("vrange"),
          round(aggregate(transform(col("v"), x =>
              abs(x - (col("mn") + quant(x) * (col("mx") - col("mn")) / 255))),
            lit(0.0), (a, b) => a + b) / size(col("v")), 6).as("mean_abs_err"))
        .orderBy("vec_id")
    },

    // ---- embedding-cosine near-duplicate pairs (dedup blocking pass) ----
    // All-pairs near-dup detection via the LSH index itself: candidates are
    // pairs sharing ANY (table, bucket) — an equi-join on the index, never
    // O(n²) — then exact cosine scoring and a similarity threshold. This is
    // the embedding-side analogue of MinHash-LSH document dedup.
    Q("q_dedup_embed",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |planes AS ($planesSql),
         |sigs AS ($sigsSql),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM sigs a JOIN sigs b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         |),
         |scored AS (
         |  SELECT id_a, id_b, ${cosSql("x.v", "y.v")} AS cos_r
         |  FROM cand JOIN e x ON x.vec_id = id_a JOIN e y ON y.vec_id = id_b
         |)
         |SELECT id_a, id_b, cos_r FROM scored WHERE cos_r >= 0.2
         |ORDER BY cos_r DESC, id_a, id_b LIMIT 20""".stripMargin) { (s, d) =>
      // single-pass consumer: spread the 64-dot-product signature pipeline
      // (§2.5; the shared vecs stays bare for the Lloyd-loop consumers)
      val v = Tables.spreadSmall(vecs(s, d), col("vec_id"))
      // cached: both sides of the self-join read the same 64-dot-product
      // signature set — without the cache the planes are evaluated twice
      val sigs = lshSignatures(v).transform(CacheTracker.cached)
      val pairs = sigs.select(col("vec_id").as("id_a"), col("tbl"), col("bucket"))
        .join(sigs.select(col("vec_id").as("id_b"), col("tbl"), col("bucket")),
              Seq("tbl", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      pairs
        .join(v.select(col("vec_id").as("id_a"), col("v").as("va")), Seq("id_a"))
        .join(v.select(col("vec_id").as("id_b"), col("v").as("vb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), round(cosine(col("va"), col("vb")), 6).as("cos_r"))
        .filter(col("cos_r") >= 0.2)
        .orderBy(col("cos_r").desc, col("id_a").asc, col("id_b").asc)
        .limit(20)
    },

    // ---- semantic dedup (SemDeDup shape): within-IVF-cell cosine pruning ----
    // The embedding-cluster dedup pass of a curation pipeline: cluster the
    // corpus with the IVF coarse quantizer (projection-only assignment),
    // compare vectors ONLY within their cell, and drop every vector that
    // has a lower-id in-cell neighbor above the similarity threshold.
    // Output is the audit table: each dropped id with its LOWEST-ID lower
    // neighbor (which may itself be dropped further up a similarity chain —
    // resolve chains to surviving representatives with the q_dedup_clusters
    // closure when that matters) and the strongest similarity that doomed
    // it. Cells above [[Similarity.SemDedupCellCap]] are split into
    // sub-cells ([[Similarity.semDedup]] skew guard), so per-cell pair work
    // is ≤ cap² regardless of how dense one embedding cluster is; the
    // oracle models the identical split, so the comparison stays exact at
    // any scale factor.
    Q("q_dedup_semdedup", {
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 25 = 0),
         |asn AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e, c
         |  ) WHERE rn = 1
         |),
         |cells AS (
         |  SELECT vec_id, cid,
         |    (row_number() OVER (PARTITION BY cid ORDER BY vec_id) - 1)
         |      % CAST(CEIL((COUNT(*) OVER (PARTITION BY cid)) / $SemDedupCellCap.0) AS BIGINT) AS sub
         |  FROM asn
         |),
         |p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosSql("x.v", "y.v")} AS cos_r
         |  FROM cells a JOIN cells b
         |    ON a.cid = b.cid AND a.sub = b.sub AND a.vec_id < b.vec_id
         |  JOIN e x ON x.vec_id = a.vec_id JOIN e y ON y.vec_id = b.vec_id
         |)
         |SELECT id_b AS dropped, min(id_a) AS kept, max(cos_r) AS max_cos
         |FROM p WHERE cos_r >= 0.2 GROUP BY id_b ORDER BY dropped""".stripMargin
    }) { (s, d) =>
      val v = vecs(s, d)
      semDedup(v, centroidSet(v, 25), simThreshold = 0.2).orderBy("dropped")
    },

    // ---- IVF-quantized cosine top-1: centroid-literal projection for
    // assignment (no Exchange), nprobe=2 cells scanned per probe ----
    Q("q_embed_ivf", {
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 25 = 0),
         |asn AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e, c
         |  ) WHERE rn = 1
         |),
         |probes AS (
         |  SELECT qid, cid FROM (
         |    SELECT e.vec_id AS qid, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e, c WHERE e.vec_id < 20
         |  ) WHERE rn <= 2
         |),
         |cand AS (
         |  SELECT DISTINCT p.qid, a.vec_id AS cand
         |  FROM probes p JOIN asn a ON a.cid = p.cid AND a.vec_id <> p.qid
         |),
         |scored AS (
         |  SELECT qid, cand, ${cosSql("x.v", "y.v")} AS cos_r
         |  FROM cand JOIN e x ON x.vec_id = qid JOIN e y ON y.vec_id = cand
         |)
         |SELECT qid, cand, cos_r FROM (
         |  SELECT qid, cand, cos_r,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cand) AS rn
         |  FROM scored
         |) WHERE rn = 1 ORDER BY qid""".stripMargin
    }) { (s, d) =>
      // cell assignment and probe→cell selection use the UNROUNDED cosine
      // in both engines (identical IEEE doubles, left-to-right dot
      // accumulation — rounding there would manufacture assignment ties);
      // the final candidate ranking then orders by the 6dp-rounded cos_r,
      // again identically on both sides
      ivfTopK(vecs(s, d), col("vec_id") < 20, centroidStride = 25, nprobe = 2, k = 1)
        .select("qid", "cand", "cos_r")
        .orderBy("qid")
    },

    // ---- IVF with k-means-refined centroids: 2 Lloyd rounds then search ----
    // The training step a real IVF index runs before serving: assign is the
    // same projection-only CentroidAssign, the update is Dim decimal sums
    // per cell (map-side combined, metadata-scale collect), and the search
    // is identical to q_embed_ivf against the refined cells. The oracle
    // unrolls both Lloyd rounds as CTEs with the identical 9dp/decimal
    // arithmetic, so centroids — and therefore cells, candidates, and
    // ranking — match bit-for-bit.
    Q("q_embed_ivf_kmeans",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 25 = 0),
         |${lloydRoundSql("c0", "1", "c1")},
         |${lloydRoundSql("c1", "2", "c2")},
         |asn AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e, c2 c
         |  ) WHERE rn = 1
         |),
         |probes AS (
         |  SELECT qid, cid FROM (
         |    SELECT e.vec_id AS qid, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e, c2 c WHERE e.vec_id < 20
         |  ) WHERE rn <= 2
         |),
         |cand AS (
         |  SELECT DISTINCT p.qid, a.vec_id AS cand
         |  FROM probes p JOIN asn a ON a.cid = p.cid AND a.vec_id <> p.qid
         |),
         |scored AS (
         |  SELECT qid, cand, ${cosSql("x.v", "y.v")} AS cos_r
         |  FROM cand JOIN e x ON x.vec_id = qid JOIN e y ON y.vec_id = cand
         |)
         |SELECT qid, cand, cos_r FROM (
         |  SELECT qid, cand, cos_r,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cand) AS rn
         |  FROM scored
         |) WHERE rn = 1 ORDER BY qid""".stripMargin) { (s, d) =>
      val v = vecs(s, d)
      val refined = refineCentroids(v, centroidSet(v, 25), rounds = 2)
      ivfTopKWith(v, refined, col("vec_id") < 20, nprobe = 2, k = 1)
        .select("qid", "cand", "cos_r")
        .orderBy("qid")
    },

    // ---- PQ encoding: 64 floats -> one packed 8-byte code ----
    // The compression step of a PQ index, checked end-to-end: every
    // vector's 8 subspace codes (nearest of 16 sampled codewords each,
    // exact left-to-right L2 folds) packed 4 bits apiece into a single
    // BIGINT. Spark side is one codegen'd projection (PqEncode), so
    // encoding streams map-side at any corpus size.
    Q("q_embed_pq_codes",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |$pqCodeSql
         |SELECT vec_id, pq_code FROM code ORDER BY vec_id""".stripMargin) { (s, d) =>
      pqCodes(vecs(s, d)).orderBy("vec_id")
    },

    // ---- PQ/ADC search: probes scan CODES, never raw vectors ----
    // Asymmetric distance: the probe keeps its raw subvectors, every
    // candidate is represented by its 8-byte code; distance is the sum of
    // per-subspace (probe-subvector ↔ codeword) L2 terms, accumulated in
    // the same nested left-to-right order in both engines (PqAdc kernel ↔
    // nested list_reduce over the reconstructed codeword vector).
    Q("q_embed_pq",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |$pqCodeSql,
         |$reconSql,
         |probes AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         |scored AS (
         |  SELECT p.qid, r.vec_id AS cand, ${adcSql("p.qv", "r.rv")} AS adc
         |  FROM probes p JOIN recon r ON r.vec_id <> p.qid
         |)
         |SELECT qid, rn, cand, adc_r FROM (
         |  SELECT qid, cand, round(adc, 6) AS adc_r,
         |    row_number() OVER (PARTITION BY qid ORDER BY adc ASC, cand ASC) AS rn
         |  FROM scored
         |) WHERE rn <= 3 ORDER BY qid, rn""".stripMargin) { (s, d) =>
      pqTopK(vecs(s, d), col("vec_id") < 10, 3).orderBy("qid", "rn")
    },

    // ---- IVF-PQ (IVFADC): the billion-scale ANN composition ----
    // Candidates come from the probe's nprobe=3 nearest IVF cells via an
    // equi-join on cid (work per probe ≈ nprobe·√N, never the corpus), and
    // are scored from packed 8-byte codes only (PqAdc). The index is one
    // projection per row (cell id + code, both codegen'd).
    Q("q_embed_ivfpq", ivfPqOracleSql) { (s, d) =>
      ivfPqTopK(vecs(s, d), col("vec_id") < 10,
                centroidStride = 25, nprobe = 3, k = 3)
        .orderBy("qid", "rn")
    },

    // ---- incremental append to the IVF-PQ index AT REST ----
    // The index-maintenance face [[DedupIndex]] already has
    // (q_dedup_incremental) and [[AnnIndex]] lacked: a production vector
    // index is write-once per TRAINING (centroids + codebook frozen), but
    // grows by BATCH — re-encoding the base corpus per arriving batch
    // would be a full-index rewrite at every ingest. [[AnnIndex.append]]
    // encodes ONLY the new batch under the frozen artifacts
    // (marker-verified: appending under retrained centroids would corrupt
    // the tree silently — every old assignment wrong, recall collapses
    // with no error) and appends its rows into the existing cell
    // directories; base files are never rewritten (AnnIndexSpec pins
    // that, plus the refusal). Serving the merged tree must be
    // INDISTINGUISHABLE from a from-scratch build over base ∪ batch —
    // this row proves it end-to-end: the even-id half is written, the
    // odd-id half appended, and the probe result hash-matches the SAME
    // oracle as q_embed_ivfpq (the full-corpus replay). Cell-directory
    // reads stay dynamic-partition-pruned on the merged tree. Build is
    // memoized per JVM+dataset (write-once convention); timed reps
    // measure serving.
    Q("q_embed_ann_append", ivfPqOracleSql) { (s, d) =>
      val v = vecs(s, d)
      val cents = centroidSet(v, 25)
      val cb = pqCodebook(v)
      val root = StoredArtifacts.of(s"ann-append|$d") { r =>
        AnnIndex.write(v.filter(col("vec_id") % 2 === 0), cents, cb, r)
        AnnIndex.append(v.filter(col("vec_id") % 2 =!= 0), cents, cb, r)
      }
      AnnIndex.probe(AnnIndex.load(s, root, cents, cb),
                     v.filter(col("vec_id") < 10), cents, cb,
                     nprobe = 3, k = 3)
        .orderBy("qid", "rn")
    },

    // ---- ANN index maintenance: atomic swap-append + compaction ----
    // The crash-intolerant ingest face plus the post-churn cleanup,
    // driver-verified: a THIRD of the corpus is written, a third folded in
    // via [[AnnIndex.appendSwapped]] (the staging-copy-and-swap variant —
    // a kill at any point leaves the pre- or post-append tree complete,
    // never the partial batch a torn parquet append strands), a third via
    // the plain O(batch) append, and the fragmented tree is then
    // COMPACTED back to one chunky file per cell (crash-safe swap, marker
    // preserved). Probing the maintained tree must hash-match the SAME
    // full-corpus oracle as q_embed_ivfpq/q_embed_ann_append — the
    // maintenance operations are invisible to every query — and the cell
    // scan stays partition-pruned (IndexMaintenanceSpec asserts plans and
    // the stranded-crash heal states directly).
    Q("q_embed_ann_maint", ivfPqOracleSql) { (s, d) =>
      val v = vecs(s, d)
      val cents = centroidSet(v, 25)
      val cb = pqCodebook(v)
      val root = StoredArtifacts.of(s"ann-maint|$d") { r =>
        AnnIndex.write(v.filter(col("vec_id") % 3 === 0), cents, cb, r)
        AnnIndex.appendSwapped(v.filter(col("vec_id") % 3 === 1), cents, cb, r)
        AnnIndex.append(v.filter(col("vec_id") % 3 === 2), cents, cb, r)
        AnnIndex.compact(s, r, cents, cb)
      }
      AnnIndex.probe(AnnIndex.load(s, root, cents, cb),
                     v.filter(col("vec_id") < 10), cents, cb,
                     nprobe = 3, k = 3)
        .orderBy("qid", "rn")
    },

    // ---- retrain-and-reindex: the drifting-model maintenance face ----
    // The lifecycle gap the maintenance rows left open: every append and
    // compaction serves under the centroids/codebook FROZEN at build time
    // (markers refuse mismatches — correctly), so a corpus that drifts
    // from the build distribution degrades recall with no operation to
    // fix it. [[AnnIndex.retrain]] is that operation: the tree is built
    // under the stride-25 seed artifacts on HALF the corpus, grown by an
    // O(batch) append (the drift: the index now holds a corpus the
    // artifacts were never trained on), then retrained — re-encoded from
    // the source vectors under 2-round-Lloyd-refined centroids via the
    // crash-safe tree swap, new fingerprint stamped with the data. The
    // probe must (a) be REFUSED under the old artifacts (stale-probe
    // window closed — AnnIndexSpec) and (b) hash-match the from-scratch
    // IVF-PQ replay under the refined centroids — the same skeleton
    // oracle as q_embed_ivfpq with the q_embed_ivf_kmeans Lloyd CTEs
    // supplying the centroid chain, so a retrain that lost rows, kept
    // stale encodings, or drifted arithmetically cannot match. The recall
    // number that justifies running it is measured on the same grown
    // corpus by RecallCurve's retrain block (RECALL.json).
    Q("q_embed_ann_retrain", ivfPqRetrainOracleSql) { (s, d) =>
      val v = vecs(s, d)
      val seedCents = centroidSet(v, 25)
      val cb = pqCodebook(v)
      val refined = refineCentroids(v, seedCents, rounds = 2)
      val root = StoredArtifacts.of(s"ann-retrain|$d") { r =>
        AnnIndex.write(v.filter(col("vec_id") % 2 === 0), seedCents, cb, r)
        AnnIndex.append(v.filter(col("vec_id") % 2 =!= 0), seedCents, cb, r)
        AnnIndex.retrain(v, seedCents, cb, refined, cb, r)
      }
      AnnIndex.probe(AnnIndex.load(s, root, refined, cb),
                     v.filter(col("vec_id") < 10), refined, cb,
                     nprobe = 3, k = 3)
        .orderBy("qid", "rn")
    },

    // ---- two-stage IVF-PQ: ADC shortlist, exact-cosine re-rank ----
    // The production probe (FAISS IVFADC+refine): the code scan shortlists
    // 12 candidates per probe, ONLY those fetch raw vectors for the exact
    // cosine, and the final top-3 ranks on the exact score. The committed
    // RECALL.json curves pin the shortlist knob's recall recovery; this
    // query pins the exact two-stage semantics against the oracle.
    Q("q_embed_ivfpq_rescore",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 25 = 0),
         |$pqCodeSql,
         |$reconSql,
         |asn AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e, c
         |  ) WHERE rn = 1
         |),
         |pc AS (
         |  SELECT qid, cid FROM (
         |    SELECT e.vec_id AS qid, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e, c WHERE e.vec_id < 10
         |  ) WHERE rn <= 3
         |),
         |scored AS (
         |  SELECT p.qid, a.vec_id AS cand, ${adcSql("q.v", "r.rv")} AS adc
         |  FROM pc p
         |  JOIN asn a ON a.cid = p.cid AND a.vec_id <> p.qid
         |  JOIN recon r ON r.vec_id = a.vec_id
         |  JOIN e q ON q.vec_id = p.qid
         |),
         |short AS (
         |  SELECT qid, cand FROM (
         |    SELECT qid, cand,
         |      row_number() OVER (PARTITION BY qid ORDER BY adc ASC, cand ASC) AS rn
         |    FROM scored
         |  ) WHERE rn <= 12
         |),
         |resc AS (
         |  SELECT s.qid, s.cand, ${cosSql("q.v", "cv.v")} AS cos_r
         |  FROM short s JOIN e q ON q.vec_id = s.qid JOIN e cv ON cv.vec_id = s.cand
         |)
         |SELECT qid, rn, cand, cos_r FROM (
         |  SELECT qid, cand, cos_r,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cand ASC) AS rn
         |  FROM resc
         |) WHERE rn <= 3 ORDER BY qid, rn""".stripMargin) { (s, d) =>
      val v = vecs(s, d)
      ivfPqTopKRescoredWith(v, centroidSet(v, 25), pqCodebook(v),
        col("vec_id") < 10, nprobe = 3, k = 3, shortlist = 12)
        .orderBy("qid", "rn")
    },

    // ---- multi-table multi-probe sign-LSH top-1 ----
    Q("q_embed_lsh",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |planes AS ($planesSql),
         |sigs AS ($sigsSql),
         |probes AS (
         |  SELECT s.vec_id AS qid, s.tbl,
         |    CAST(xor(s.bucket, CASE WHEN f < 0 THEN 0 ELSE 1 << f END) AS BIGINT) AS bucket
         |  FROM (SELECT * FROM sigs WHERE vec_id < 20) s, range(-1, $Bits_B) r(f)
         |),
         |cand AS (
         |  SELECT DISTINCT p.qid, c.vec_id AS cand
         |  FROM probes p JOIN sigs c ON p.tbl = c.tbl AND p.bucket = c.bucket AND c.vec_id <> p.qid
         |),
         |scored AS (
         |  SELECT qid, cand, ${cosSql("qv.v", "cv.v")} AS cos_r
         |  FROM cand JOIN e qv ON qv.vec_id = qid JOIN e cv ON cv.vec_id = cand
         |)
         |SELECT qid, cand, cos_r FROM (
         |  SELECT qid, cand, cos_r,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cand) AS rn
         |  FROM scored
         |) WHERE rn = 1 ORDER BY qid""".stripMargin) { (s, d) =>
      lshTopK(Tables.spreadSmall(vecs(s, d), col("vec_id")), col("vec_id") < 20, 1)
        .select("qid", "cand", "cos_r")
        .orderBy("qid")
    },

    // ---- kNN label classification over embeddings ----
    // Model-based curation without a model: label the unlabeled part of a
    // corpus by majority vote of its k nearest labeled neighbors (the
    // standard kNN classifier, here over the embedding column). Every
    // fifth vector is held out as the "unlabeled" probe set and classified
    // against the labeled rest; the output carries the held-out true label
    // so the query doubles as an accuracy audit.
    //
    // Candidate generation is [[knnClassify]]'s pluggable seam: this
    // query feeds it the exact brute-force pairs (probes broadcast, corpus
    // streamed once — the declared correctness baseline, like
    // q_embed_topk); at 100 TB swap in [[probeIndex]]'s IVF-PQ candidates
    // and the vote logic is unchanged. The vote itself is one
    // (qid,label) hash aggregate over |probes|·k rows — never corpus-
    // scale — with an integer-only deterministic tie-break
    // (votes desc, label asc).
    Q("q_embed_knn_classify",
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT * FROM e WHERE vec_id % 5 = 0),
         |c AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
         |knn AS (
         |  SELECT qid, label, cos_r FROM (
         |    SELECT q.vec_id AS qid, c.label, ${cosSql("q.v", "c.v")} AS cos_r,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.v", "c.v")} DESC, c.vec_id) AS rn
         |    FROM q, c
         |  ) WHERE rn <= $KnnK
         |),
         |votes AS (
         |  SELECT qid, label, count(*) AS votes,
         |    CAST(sum(CAST(cos_r AS DECIMAL(18,6))) AS DOUBLE) AS sum_cos
         |  FROM knn GROUP BY qid, label
         |)
         |SELECT v.qid, v.label AS pred_label, CAST(v.votes AS BIGINT) AS votes, v.sum_cos,
         |  q.label AS true_label, v.label = q.label AS correct
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY votes DESC, label) AS vr
         |  FROM votes
         |) v JOIN q ON q.vec_id = v.qid
         |WHERE v.vr = 1 ORDER BY v.qid""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
                col("embedding").cast("array<double>").as("v"))
      val probes = e.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("qid"), col("label").as("true_label"),
                col("v").as("qv"))
      // brute-force leg: the whole corpus-side cosine pipeline sits
      // before any exchange — spread the single-row-group scan (§2.5)
      val corpus = Tables.spreadSmall(e.filter(col("vec_id") % 5 =!= 0), col("vec_id"))
        .select(col("vec_id").as("cand"), col("label"), col("v"))
      val pairs = corpus.join(broadcast(probes.drop("true_label")), lit(true))
        .select(col("qid"), col("cand"), col("label"),
                round(cosine(col("qv"), col("v")), 6).as("cos_r"))
      knnClassify(pairs, KnnK)
        .join(broadcast(probes.select(col("qid"), col("true_label"))), Seq("qid"))
        .select(col("qid"), col("pred_label"), col("votes"), col("sum_cos"),
                col("true_label"),
                (col("pred_label") === col("true_label")).as("correct"))
        .orderBy("qid")
    },

    // ---- kNN classification over IVF-PQ candidates: the 100 TB shape ----
    // The SAME classifier as q_embed_knn_classify but with candidate
    // generation swapped from brute force to the production ANN tier:
    // IVF-PQ ADC shortlist (nprobe=3, shortlist=24) over an index built on
    // the labeled corpus only, exact-cosine re-rank of the shortlist, then
    // the unchanged knnClassify vote. This oracle-checks the scale path
    // itself — index build, cell probing, ADC ranking, re-rank, vote —
    // end-to-end, not just the vote over exact pairs. Work per probe is
    // nprobe x cell size + shortlist; never corpus-scale. (Predictions may
    // legitimately differ from the brute-force query where the true
    // neighbors fall outside probed cells — that recall trade-off is the
    // measured RECALL.json operating point, and both engines replay the
    // identical candidate rule, so the check is exact.)
    Q("q_embed_knn_ann",
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 25 = 0),
         |$pqCodeSql,
         |$reconSql,
         |asn AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e, c WHERE e.vec_id % 5 <> 0
         |  ) WHERE rn = 1
         |),
         |pc AS (
         |  SELECT qid, cid FROM (
         |    SELECT e.vec_id AS qid, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e, c WHERE e.vec_id % 5 = 0
         |  ) WHERE rn <= 3
         |),
         |scored AS (
         |  SELECT p.qid, a.vec_id AS cand, ${adcSql("q.v", "r.rv")} AS adc
         |  FROM pc p
         |  JOIN asn a ON a.cid = p.cid
         |  JOIN recon r ON r.vec_id = a.vec_id
         |  JOIN e q ON q.vec_id = p.qid
         |),
         |short AS (
         |  SELECT qid, cand FROM (
         |    SELECT qid, cand,
         |      row_number() OVER (PARTITION BY qid ORDER BY adc ASC, cand ASC) AS rn
         |    FROM scored
         |  ) WHERE rn <= 24
         |),
         |resc AS (
         |  SELECT s.qid, s.cand, cv.label, ${cosSql("q.v", "cv.v")} AS cos_r
         |  FROM short s JOIN e q ON q.vec_id = s.qid JOIN e cv ON cv.vec_id = s.cand
         |),
         |knn AS (
         |  SELECT qid, label, cos_r FROM (
         |    SELECT qid, label, cos_r,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cand) AS rn
         |    FROM resc
         |  ) WHERE rn <= $KnnK
         |),
         |votes AS (
         |  SELECT qid, label, count(*) AS votes,
         |    CAST(sum(CAST(cos_r AS DECIMAL(18,6))) AS DOUBLE) AS sum_cos
         |  FROM knn GROUP BY qid, label
         |)
         |SELECT v.qid, v.label AS pred_label, CAST(v.votes AS BIGINT) AS votes, v.sum_cos,
         |  q.label AS true_label, v.label = q.label AS correct
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY votes DESC, label) AS vr
         |  FROM votes
         |) v JOIN e q ON q.vec_id = v.qid
         |WHERE v.vr = 1 ORDER BY v.qid""".stripMargin) { (s, d) =>
      val all = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
                col("embedding").cast("array<double>").as("v"))
      val corpus = all.filter(col("vec_id") % 5 =!= 0)
      val probes = all.filter(col("vec_id") % 5 === 0)
      val cents = centroidSet(vecs(s, d), 25)
      val cb = pqCodebook(vecs(s, d))
      val index = indexRows(corpus.select("vec_id", "v"), cents, cb)
      annKnnClassify(index, corpus, probes, cents, cb,
                     nprobe = 3, shortlist = 24, k = KnnK)
        .join(broadcast(probes.select(col("vec_id").as("qid"),
                col("label").as("true_label"))), Seq("qid"))
        .select(col("qid"), col("pred_label"), col("votes"), col("sum_cos"),
                col("true_label"),
                (col("pred_label") === col("true_label")).as("correct"))
        .orderBy("qid")
    },

    // ---- ANN recall@k, hash-checked: the RECALL.json headline as a row ----
    // The recall measurement itself is deterministic — exact brute-force
    // top-10 per probe, the ivf_refined candidate-rule top-10 (2 Lloyd
    // rounds, the q_embed_ivf_kmeans machinery), and the per-probe overlap
    // count — so both engines can replay it and the ANN quality claim
    // becomes an oracle-checked row instead of a committed offline
    // artifact. Operating point: 50 probes, nprobe=8 of the 20 sf0.01
    // cells = the same ~0.4 candidate fraction as the headline
    // ivf_refined nprobe=32-of-80 point RECALL.json records at sf0.1.
    // Plan shape: the ANN leg is all equi-joins (cell-probe candidate
    // join + two id lookups); the only NLJ is the exact-baseline
    // bounded-probe broadcast — ground truth is BY DEFINITION a per-probe
    // corpus scan, and it broadcasts the fixed 50-probe batch, never the
    // corpus (the q_embed_knn_classify baseline shape).
    Q("q_embed_recall",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 25 = 0),
         |${lloydRoundSql("c0", "1", "c1")},
         |${lloydRoundSql("c1", "2", "c2")},
         |asn AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e, c2 c
         |  ) WHERE rn = 1
         |),
         |probes AS (
         |  SELECT qid, cid FROM (
         |    SELECT e.vec_id AS qid, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e, c2 c WHERE e.vec_id % 5 = 0 AND e.vec_id < 250
         |  ) WHERE rn <= 8
         |),
         |cand AS (
         |  SELECT DISTINCT p.qid, a.vec_id AS cand
         |  FROM probes p JOIN asn a ON a.cid = p.cid AND a.vec_id <> p.qid
         |),
         |annscored AS (
         |  SELECT qid, cand, ${cosSql("x.v", "y.v")} AS cos_r
         |  FROM cand JOIN e x ON x.vec_id = qid JOIN e y ON y.vec_id = cand
         |),
         |ann AS (
         |  SELECT qid, cand FROM (
         |    SELECT qid, cand,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cand) AS rn
         |    FROM annscored
         |  ) WHERE rn <= 10
         |),
         |ex AS (
         |  SELECT qid, cand FROM (
         |    SELECT q.vec_id AS qid, t.vec_id AS cand,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.v", "t.v")} DESC, t.vec_id) AS rn
         |    FROM e q JOIN e t ON t.vec_id <> q.vec_id
         |    WHERE q.vec_id % 5 = 0 AND q.vec_id < 250
         |  ) WHERE rn <= 10
         |),
         |hits AS (
         |  SELECT qid, count(*) AS hits FROM ex JOIN ann USING (qid, cand)
         |  GROUP BY qid
         |)
         |SELECT q.vec_id AS qid, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
         |  round(coalesce(h.hits, 0) / 10.0, 6) AS recall
         |FROM (SELECT vec_id FROM e WHERE vec_id % 5 = 0 AND vec_id < 250) q
         |LEFT JOIN hits h ON h.qid = q.vec_id
         |ORDER BY qid""".stripMargin) { (s, d) =>
      val v = vecs(s, d)
      val probePred = col("vec_id") % 5 === 0 && col("vec_id") < 250
      val refined = refineCentroids(v, centroidSet(v, 25), rounds = 2)
      val ann = ivfTopKWith(v, refined, probePred, nprobe = 8, k = 10)
        .select("qid", "cand")
      val probes = v.filter(probePred)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      // exact-baseline leg: per-probe corpus scan — spread it so the
      // cosine ranking runs cluster-wide (§2.5); the IVF legs keep the
      // bare scan (their Lloyd collects would re-pay the exchange per
      // round)
      val pairs = Tables.spreadSmall(v, col("vec_id"))
        .select(col("vec_id").as("cand"), col("v").as("cv"))
        .join(broadcast(probes), col("cand") =!= col("qid"))
        .select(col("qid"), col("cand"),
          round(cosine(col("qv"), col("cv")), 6).as("cos_r"))
      val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("cand").asc)
      val exact = pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10).select("qid", "cand")
      val hits = exact.join(ann, Seq("qid", "cand"))
        .groupBy("qid").agg(count(lit(1)).as("hits"))
      probes.select("qid").join(hits, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
          round(coalesce(col("hits"), lit(0L)) / lit(10.0), 6).as("recall"))
        .orderBy("qid")
    },

    // ---- corpus cartography: per-cluster document profile ----
    // The "map of the corpus" step of a curation recipe: assign every
    // document's embedding to a semantic cell, join the text table, and
    // profile each cell — population, token mass, and the dominant source
    // domain. This is where a curator spots that one cell is 90% a single
    // crawl domain (a boilerplate island) or that token mass concentrates
    // in few cells (a diversity problem); the downstream knobs are
    // q_sample_cluster_cap and q_dedup_semdedup over the same cells.
    //
    // Plan shape: assignment is the projection-only CentroidAssign; the
    // doc join is a 1-1 equi-join on the id (co-partitioned at scale);
    // stats are ONE hash aggregate keyed by (cid, source) — output
    // bounded by cells × domains — and the dominant-source pick is a
    // window over that metadata-scale aggregate, never over the corpus.
    Q("q_embed_cluster_profile",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 25 = 0),
         |asn AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosRawSql("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e, c
         |  ) WHERE rn = 1
         |),
         |per_src AS (
         |  SELECT a.cid, d.source, count(*) AS n,
         |    CAST(sum(length(d.text) - length(replace(d.text, ' ', '')) + 1) AS BIGINT) AS toks
         |  FROM asn a JOIN documents d ON d.doc_id = a.vec_id
         |  GROUP BY a.cid, d.source
         |)
         |SELECT cid, CAST(sum(n) AS BIGINT) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS total_tokens,
         |  count(*) AS n_sources,
         |  max(CASE WHEN rk = 1 THEN source END) AS top_source,
         |  CAST(max(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS top_source_n
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY cid
         |    ORDER BY n DESC, source) AS rk
         |  FROM per_src
         |) GROUP BY cid ORDER BY cid""".stripMargin) { (s, d) =>
      val asn = vecs(s, d)
        .select(col("vec_id"), cidExpr(centroidSet(vecs(s, d), 25)).as("cid"))
      val perSrc = asn
        .join(Tables.documents(s, d), col("doc_id") === col("vec_id"))
        .groupBy("cid", "source")
        .agg(count(lit(1)).as("n"),
             sum(expr("length(text) - length(replace(text, ' ', '')) + 1"))
               .cast("long").as("toks"))
      val rk = Window.partitionBy("cid").orderBy(col("n").desc, col("source").asc)
      perSrc.withColumn("rk", row_number().over(rk))
        .groupBy("cid")
        .agg(sum("n").cast("long").as("n_docs"),
             sum("toks").cast("long").as("total_tokens"),
             count(lit(1)).as("n_sources"),
             max(when(col("rk") === 1, col("source"))).as("top_source"),
             max(when(col("rk") === 1, col("n"))).cast("long").as("top_source_n"))
        .orderBy("cid")
    }
  )

  /** Majority-vote classification over scored candidate pairs
    * `(qid, cand, label, cos_r)` — candidate generation is the caller's
    * choice (exact pairs, [[lshTopK]] buckets, or [[probeIndex]] IVF-PQ
    * cells), so the vote composes with every ANN tier. Keeps the `k`
    * nearest by `(cos_r desc, cand)` per probe, then picks the label with
    * the most votes (`votes desc, label` tie-break).
    */
  /** kNN classification over IVF-PQ candidates — THE single definition of
    * the ANN-tier classifier shape: ADC shortlist from the probed cells
    * of a (possibly pre-materialized) index, exact-cosine re-rank of the
    * shortlist against the labeled corpus, then the [[knnClassify]] vote.
    * Shared by the declared q_embed_knn_ann and the ScaleCheck serving
    * measurement so tie-breaks and rounding cannot drift between them.
    * `corpus`/`probes` carry (vec_id, label, v); `index` is
    * [[indexRows]] over the corpus (pass a cached/materialized frame to
    * measure serving cost without the build).
    */
  def annKnnClassify(index: DataFrame, corpus: DataFrame, probes: DataFrame,
                     cents: Seq[(Long, Seq[Double], Double)],
                     cb: Seq[Seq[Seq[Double]]],
                     nprobe: Int, shortlist: Int, k: Int): DataFrame = {
    val short = probeIndex(index, probes.select("vec_id", "v"), cents, cb,
                           nprobe, shortlist)
    val pairs = short.select("qid", "cand")
      .join(corpus.select(col("vec_id").as("cand"), col("label"),
                          col("v").as("cv")), Seq("cand"))
      .join(broadcast(probes.select(col("vec_id").as("qid"), col("v").as("qv"))),
            Seq("qid"))
      .select(col("qid"), col("cand"), col("label"),
              round(cosine(col("qv"), col("cv")), 6).as("cos_r"))
    knnClassify(pairs, k)
  }

  def knnClassify(pairs: DataFrame, k: Int): DataFrame = {
    val nn = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("cand").asc)
    val knn = pairs.withColumn("rn", row_number().over(nn)).filter(col("rn") <= k)
    val votes = knn.groupBy("qid", "label")
      .agg(count(lit(1)).as("votes"),
           // the neighbor-similarity mass, NOT its mean: sums of 6dp
           // decimals are exact doubles in both engines, while mean's
           // sum/count lands on half-ulp round-to-6 boundaries whenever
           // count divides the sum evenly (systematic cross-engine skew)
           graft.operators.Relational.dsum(col("cos_r")).as("sum_cos"))
    val vw = Window.partitionBy("qid").orderBy(col("votes").desc, col("label").asc)
    votes.withColumn("vr", row_number().over(vw)).filter(col("vr") === 1)
      .select(col("qid"), col("label").as("pred_label"), col("votes"),
              col("sum_cos"))
  }

  /** [[knnClassify]]'s vote in streaming-safe form: one `collect_list`
    * aggregation per probe (legal in update-mode streaming, where window
    * functions are not), then the top-k cut AND the majority vote as pure
    * array expressions — `array_sort` on (dist, cand, label) structs
    * gives the deterministic (dist asc, cand asc) neighbor order, and the
    * winner is `array_max` over per-label (votes, −label) structs
    * (lexicographic struct ordering ⇒ most votes, ties to the SMALLEST
    * label — the same tie-break as knnClassify). State per probe is its
    * candidate list, bounded by nprobe × cell occupancy.
    *
    * `cands` needs (qid, cand, label, dist) with dist ascending-better
    * (e.g. [[probeIndex]]/incrementalAnn ADC distances).
    */
  def knnVoteByDistance(cands: DataFrame, k: Int): DataFrame = {
    val sorted = array_sort(col("cs"))
    val labels = transform(slice(sorted, 1, k), c => c.getField("label"))
    val win = array_max(transform(array_distinct(labels), l =>
      struct(size(filter(labels, x => x === l)).as("votes"),
             (-l).as("negl"))))
    cands
      .groupBy("qid")
      .agg(collect_list(struct(col("dist"), col("cand"), col("label"))).as("cs"))
      .select(col("qid"), win.as("win"))
      .select(col("qid"), (-col("win.negl")).as("pred_label"),
              col("win.votes").as("votes"))
  }
}
