package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** LSH quality properties (SURVEY §2.I3). The driver testdata embeddings
  * are near-orthogonal random vectors — there, ANY sublinear method has
  * low recall because no true near neighbors exist. Recall is therefore
  * measured on planted near-duplicates (seeded, deterministic): each base
  * vector gets a noisy twin at cosine ≈ 0.95+, and the LSH index must
  * retrieve the twin as top-1 for most probes while examining only a small
  * fraction of the corpus.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val nBase = 60
  private lazy val planted = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val rows = (0 until nBase).flatMap { i =>
      val base = unit(Array.fill(Similarity.Dim)(rnd.nextGaussian()))
      // per-dim sigma 0.03 -> ||noise|| ~ 0.03*sqrt(64) = 0.24 -> cos ~ 0.97
      val noisy = unit(base.zip(Array.fill(Similarity.Dim)(rnd.nextGaussian() * 0.03))
        .map { case (b, e) => b + e })
      Seq((2L * i, base.toSeq), (2L * i + 1, noisy.toSeq))
    }
    rows.toDF("vec_id", "v")
  }

  test("planted near-duplicates: LSH top-1 recall >= 0.8, candidates sublinear") {
    val probePred = col("vec_id") % 2 === 0 // probe with the clean vectors
    val sigs = Similarity.lshSignatures(planted)
    val cands = Similarity.lshCandidates(sigs, probePred).cache()

    // sublinearity: no probe examines more than 25% of the corpus, and the
    // average candidate set is far below it
    val perProbe = cands.groupBy("qid").agg(count(lit(1)).as("n"))
      .agg(max("n").as("mx"), avg("n").as("av")).head()
    assert(perProbe.getLong(0) <= (2L * nBase) / 4, s"max candidates ${perProbe.getLong(0)}")

    // recall@1: the noisy twin must surface as the top-scored candidate
    val top1 = Similarity.lshTopK(planted, probePred, 1)
      .select(col("qid"), col("cand")).collect()
    val hits = top1.count(r => r.getLong(1) == r.getLong(0) + 1)
    assert(hits >= (nBase * 0.8).toInt, s"recall@1 = $hits/$nBase")
  }

  test("planted near-duplicates: IVF top-1 recall, cells sublinear") {
    val probePred = col("vec_id") % 2 === 0
    // stride 4 -> 30 centroids over 120 vectors; nprobe 2 scans ~2 cells
    val top1 = Similarity.ivfTopK(planted, probePred, centroidStride = 4, nprobe = 2, k = 1)
      .select(col("qid"), col("cand")).collect()
    val hits = top1.count(r => r.getLong(1) == r.getLong(0) + 1)
    // a twin at cos ~0.97 lands in the same or an adjacent cell most of the
    // time; nprobe=2 recovers the bulk of them
    assert(hits >= (nBase * 0.6).toInt, s"IVF recall@1 = $hits/$nBase")
    // cell size bound: no cell holds more than half the corpus
    val maxCell = Similarity.ivfAssign(planted, 4)
      .groupBy("cid").agg(count(lit(1)).as("n")).agg(max("n")).head().getLong(0)
    assert(maxCell <= nBase, s"max IVF cell $maxCell")
  }

  test("semDedup skew guard: a planted dense cluster splits, occupancy and pair work stay bounded") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // 300 near-copies of one direction — the dense semantic cluster
    // SemDeDup exists to prune, and exactly the shape that inflates one
    // IVF cell — plus scattered background vectors
    val hub = unit(Array.fill(Similarity.Dim)(rnd.nextGaussian()))
    val dense = (0 until 300).map { i =>
      (i.toLong, unit(hub.zip(Array.fill(Similarity.Dim)(rnd.nextGaussian() * 0.02))
        .map { case (b, e) => b + e }).toSeq)
    }
    val bg = (300 until 360).map(i =>
      (i.toLong, unit(Array.fill(Similarity.Dim)(rnd.nextGaussian())).toSeq))
    val corpus = (dense ++ bg).toDF("vec_id", "v")
    // stride 300 -> centroids are vec 0 (the hub) and vec 300 (background):
    // the whole dense cluster lands in cid 0
    val cents = Similarity.centroidSet(corpus, 300)
    val cap = 16

    val cells = Similarity.semDedupCells(corpus, cents, cap).cache()
    try {
      val occ = cells.groupBy("cid", "sub").agg(count(lit(1)).as("n")).cache()
      // hard occupancy bound: no (cell, sub) group exceeds the cap even
      // though cid 0 holds ~300 vectors
      val maxOcc = occ.agg(max("n")).head().getLong(0)
      assert(maxOcc <= cap, s"sub-cell occupancy $maxOcc exceeds cap $cap")
      val denseCell = cells.filter(col("vec_id") < 300)
        .groupBy("cid").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc).head()
      assert(denseCell.getLong(1) >= 290, "planting failed: dense cluster scattered")
      // pair work is linear in N, not quadratic in the dense cell:
      // sum n_i(n_i-1) <= N*(cap-1) << cnt_dense^2
      val pairsDoubled = occ.agg(sum(col("n") * (col("n") - 1))).head().getLong(0)
      assert(pairsDoubled <= 360L * (cap - 1),
        s"pair work $pairsDoubled exceeds the linear bound ${360L * (cap - 1)}")

      // semantics survive the split: within every sub-cell of the dense
      // cluster all but the lowest id drop (pairwise cos ~0.99 >= 0.9).
      // Survivors are at most one per sub-cell: 300/16 -> <= 19 + slack.
      val res = Similarity.semDedup(corpus, cents, simThreshold = 0.9, cellCap = cap)
      val droppedDense = res.filter(col("dropped") < 300).count()
      assert(droppedDense >= 270, s"only $droppedDense of ~300 dense near-dups dropped")
    } finally { cells.unpersist(); () }
  }

  test("semDedup skew guard is a no-op on balanced data") {
    // every cell at or under the cap -> one sub-cell each -> identical
    // report to the unguarded (effectively-infinite-cap) form
    val cents = Similarity.centroidSet(planted, 4)
    val guarded = Similarity.semDedup(planted, cents, 0.5)
      .orderBy("dropped").collect().toSeq
    val unguarded = Similarity.semDedup(planted, cents, 0.5, cellCap = Int.MaxValue)
      .orderBy("dropped").collect().toSeq
    assert(guarded == unguarded)
    assert(guarded.nonEmpty, "planted twins should produce drops")
  }

  test("planted near-duplicates: IVF-PQ top-1 recall, equi-join plan, codes-only scan") {
    val probePred = col("vec_id") % 2 === 0
    val df = Similarity.ivfPqTopK(planted, probePred, centroidStride = 4, nprobe = 2, k = 1)
    df.collect()
    // plan shape: candidates come from a broadcast-hash EQUI-join on cid —
    // never a nested-loop scan of the corpus (the q_embed_pq baseline shape)
    val plan = {
      val s = df.queryExecution.executedPlan.toString
      val i = s.indexOf("== Initial Plan =="); if (i >= 0) s.take(i) else s
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "IVF-PQ must join candidates on cid, not scan the corpus")
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast equi-join on cid")

    // recall@1: ADC over 4-bit codes is lossy (16 sampled codewords per
    // subspace), so the bound is looser than IVF-flat's 0.6 — but the twin
    // must still surface for the majority of probes
    val hits = df.select(col("qid"), col("cand")).collect()
      .count(r => r.getLong(1) == r.getLong(0) + 1)
    assert(hits >= (nBase * 0.5).toInt, s"IVF-PQ recall@1 = $hits/$nBase")

    // cell containment: IVF-PQ candidates are exactly the IVF candidates
    // for the same (stride, nprobe) — PQ changes scoring, never the
    // candidate set
    val ivfCands = Similarity.ivfTopK(planted, probePred, 4, 2, Int.MaxValue)
      .select(col("qid"), col("cand"))
    val pqCands = Similarity.ivfPqTopK(planted, probePred, 4, 2, Int.MaxValue)
      .select(col("qid"), col("cand"))
    assert(pqCands.except(ivfCands).isEmpty && ivfCands.except(pqCands).isEmpty,
      "IVF-PQ and IVF-flat must probe identical candidate sets")
  }

  test("PqAdc equals the exact distance to the reconstructed codeword vector") {
    import spark.implicits._
    import graft.functions.{PqAdc, PqEncode}
    val rnd = new scala.util.Random(17)
    val M = 8; val S = 8; val K = 16
    val cb: Seq[Seq[Seq[Double]]] =
      Seq.fill(M)(Seq.fill(K)(Seq.fill(S)(rnd.nextDouble() - 0.5)))
    val vecs = (0 until 50).map(i => (i.toLong, Seq.fill(M * S)(rnd.nextDouble() - 0.5)))
      .toDF("vec_id", "v").withColumn("v", col("v").cast("array<double>"))
    val q = Seq.fill(M * S)(rnd.nextDouble() - 0.5)
    val got = vecs
      .select(col("vec_id"), PqEncode.pq_encode(col("v"), cb, S).as("code"))
      .select(col("vec_id"), col("code"),
        PqAdc.pq_adc(typedLit(q), col("code"), cb, S).as("adc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.foreach { case (id, code, adc) =>
      // reference: decode the packed code, rebuild the codeword vector, and
      // accumulate in the same nested order as the kernel
      var expected = 0.0
      (0 until M).foreach { m =>
        val cw = cb(m)(((code >>> (4 * m)) & 15L).toInt)
        var d = 0.0
        (0 until S).foreach { j => val t = q(m * S + j) - cw(j); d += t * t }
        expected += d
      }
      assert(adc == expected, s"PqAdc diverges for vec $id")
    }
    // null inputs -> null
    val nul = Seq((Option.empty[Seq[Double]], Option.empty[Long])).toDF("v", "code")
      .withColumn("v", col("v").cast("array<double>"))
    assert(nul.select(PqAdc.pq_adc(col("v"), lit(0L), cb, S)).head.isNullAt(0))
    assert(nul.select(PqAdc.pq_adc(typedLit(q), col("code"), cb, S)).head.isNullAt(0))
  }

  test("k-means refinement: recall at least matches the strided baseline, cells stay balanced") {
    import spark.implicits._
    val probePred = col("vec_id") % 2 === 0
    val corpus = planted.cache()
    val init = corpus.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("v")).collect()
      .map { r =>
        val v = r.getSeq[Double](1)
        var acc = 0.0; v.foreach(x => acc += x * x)
        (r.getLong(0), v, math.sqrt(acc))
      }.sortBy(_._1).toSeq
    val refined = Similarity.refineCentroids(corpus, init, rounds = 3)
    assert(refined.size == init.size, "Lloyd must preserve the centroid count")

    def recall(cents: Seq[(Long, Seq[Double], Double)]): Int =
      Similarity.ivfTopKWith(corpus, cents, probePred, nprobe = 2, k = 1)
        .select(col("qid"), col("cand")).collect()
        .count(r => r.getLong(1) == r.getLong(0) + 1)
    val base = recall(init)
    val ref = recall(refined)
    // Lloyd tightens cells around the data, so twin-recall must not regress
    // (and the strided baseline itself must clear the IVF test's 0.6 bar)
    assert(ref >= base, s"k-means recall $ref regressed below strided $base")
    assert(ref >= (nBase * 0.6).toInt, s"k-means recall@1 = $ref/$nBase")
    corpus.unpersist()
  }

  test("trained IVF-PQ composition: refined artifacts drop in, recall holds") {
    val probePred = col("vec_id") % 2 === 0
    val corpus = planted.cache()
    val initCents = Similarity.centroidSet(corpus, 4)
    val cents = Similarity.refineCentroids(corpus, initCents, rounds = 2)
    val cb = Similarity.refinePqCodebook(corpus, Similarity.pqCodebook(corpus), rounds = 2)

    // candidate sets are governed by the centroids alone: IVF-PQ with the
    // refined artifacts probes exactly the cells IVF-flat probes
    val pqCands = Similarity.ivfPqTopKWith(corpus, cents, cb, probePred, 2, Int.MaxValue)
      .select(col("qid"), col("cand"))
    val ivfCands = Similarity.ivfTopKWith(corpus, cents, probePred, 2, Int.MaxValue)
      .select(col("qid"), col("cand"))
    assert(pqCands.except(ivfCands).isEmpty && ivfCands.except(pqCands).isEmpty)

    // end-to-end recall of the trained composition at least matches the
    // untrained one (better cells + tighter codewords)
    def hits(df: org.apache.spark.sql.DataFrame): Int =
      df.select(col("qid"), col("cand")).collect()
        .count(r => r.getLong(1) == r.getLong(0) + 1)
    val trained = hits(Similarity.ivfPqTopKWith(corpus, cents, cb, probePred, 2, 1))
    val untrained = hits(Similarity.ivfPqTopK(corpus, probePred, 4, 2, 1))
    assert(trained >= untrained,
      s"trained IVF-PQ recall $trained below untrained $untrained")
    assert(trained >= (nBase * 0.5).toInt, s"trained IVF-PQ recall@1 = $trained/$nBase")
    corpus.unpersist()
  }

  test("PQ codebook refinement: reconstruction error never regresses") {
    import graft.functions.{PqAdc, PqEncode}
    val corpus = planted.cache()
    val init = Similarity.pqCodebook(corpus) // first-16-vectors baseline
    val refined = Similarity.refinePqCodebook(corpus, init, rounds = 2)
    assert(refined.length == init.length && refined.head.length == init.head.length,
      "Lloyd must preserve codebook shape")

    // mean ||v - recon(v)||^2 over the corpus: PqAdc against a vector's OWN
    // code is exactly the quantization error; Lloyd must not increase it
    def err(cb: Seq[Seq[Seq[Double]]]): Double = corpus
      .select(PqAdc.pq_adc(col("v"),
        PqEncode.pq_encode(col("v"), cb, Similarity.PqSub), cb, Similarity.PqSub).as("e"))
      .agg(avg("e")).head().getDouble(0)
    val e0 = err(init)
    val e1 = err(refined)
    assert(e1 <= e0 + 1e-9, s"refined codebook error $e1 above baseline $e0")
    // and on this corpus the improvement is substantial, not epsilon
    assert(e1 < e0 * 0.9, s"expected >10% error reduction, got $e0 -> $e1")
    corpus.unpersist()
  }

  test("chunked centroid/codebook forms are bit-identical to the single-shot forms") {
    import spark.implicits._
    import graft.functions.{CentroidAssign, PqEncode}
    val rnd = new scala.util.Random(23)
    val dim = Similarity.Dim
    def norm(v: Seq[Double]): Double = {
      var acc = 0.0; v.foreach(x => acc += x * x); math.sqrt(acc)
    }
    // 37 centroids (deliberately not a multiple of any chunk size below)
    val cents = (0 until 37).map { i =>
      val v = Seq.fill(dim)(rnd.nextDouble() - 0.5)
      (i * 3L, v, norm(v))
    }
    val vecs = (0 until 300).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() - 0.5)))
      .toDF("vec_id", "v").withColumn("v", col("v").cast("array<double>"))
      .cache()

    // assignment: per-chunk argmax + greatest-of-maxima == global scan,
    // at chunk sizes that leave 1-element tails, even splits, and a
    // single-chunk degenerate case
    val single = vecs.select(col("vec_id"),
      CentroidAssign.centroid_assign(col("v"), cents).as("cid"))
    Seq(4, 9, 10, 36, 37, 100).foreach { cs =>
      val chunked = vecs.select(col("vec_id"),
        CentroidAssign.centroid_assign_chunked(col("v"), cents, cs).as("cid"))
      assert(chunked.except(single).isEmpty && single.except(chunked).isEmpty,
        s"chunked assignment diverges at chunkSize=$cs")
    }

    // probe-side top-nprobe cells: per-chunk top-n + merge == global top-n
    val singleCells = vecs.select(col("vec_id"),
      Similarity.topCells(cents, col("v"), 3, chunk = cents.size + 1).as("sc"))
    Seq(4, 9, 36, 37).foreach { cs =>
      val chunkedCells = vecs.select(col("vec_id"),
        Similarity.topCells(cents, col("v"), 3, chunk = cs).as("sc"))
      assert(chunkedCells.except(singleCells).isEmpty
          && singleCells.except(chunkedCells).isEmpty,
        s"chunked cell selection diverges at chunk=$cs")
    }

    // PQ: per-subspace-group encode + bitwise OR == one-shot encode
    val M = 8; val S = 8; val K = 16
    val cb: Seq[Seq[Seq[Double]]] =
      Seq.fill(M)(Seq.fill(K)(Seq.fill(S)(rnd.nextDouble() - 0.5)))
    val oneShot = vecs.select(col("vec_id"),
      PqEncode.pq_encode(col("v"), cb, S).as("code"))
    Seq(1, 3, 5, 8).foreach { mc =>
      val chunked = vecs.select(col("vec_id"),
        PqEncode.pq_encode_chunked(col("v"), cb, S, mc).as("code"))
      assert(chunked.except(oneShot).isEmpty && oneShot.except(chunked).isEmpty,
        s"chunked PQ encode diverges at mChunk=$mc")
    }
    vecs.unpersist()
  }

  test("LSH agrees with brute force whenever the true top-1 is a candidate") {
    import spark.implicits._
    val probePred = col("vec_id") % 2 === 0
    // brute-force ground truth over the planted corpus
    val q = planted.filter(probePred).select(col("vec_id").as("qid"), col("v").as("qv"))
    val bf = planted.select(col("vec_id").as("cand"), col("v"))
      .join(broadcast(q), col("cand") =!= col("qid"))
      .select(col("qid"), col("cand"),
        Similarity.cosine(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cand").asc)
    val bfTop = bf.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("qid"), col("cand").as("bf_cand"))

    val lshTop = Similarity.lshTopK(planted, probePred, 1)
      .select(col("qid"), col("cand").as("lsh_cand"))
    val cands = Similarity.lshCandidates(Similarity.lshSignatures(planted), probePred)

    // whenever LSH's candidate set contains the true neighbor, its top-1 IS
    // the true neighbor (scoring is exact; only candidate recall is approx)
    val joined = bfTop
      .join(cands.withColumnRenamed("cand", "bf_cand"), Seq("qid", "bf_cand"), "left_semi")
      .join(lshTop, Seq("qid"))
    val disagree = joined.filter(col("bf_cand") =!= col("lsh_cand")).count()
    assert(disagree == 0)
  }

  test("CentroidAssign codegen matches interpreted eval and the struct-max form") {
    import spark.implicits._
    import graft.functions.CentroidAssign.centroid_assign
    val rnd = new scala.util.Random(11)
    val dim = 8
    def norm(v: Seq[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    val cents = (0 until 7).map { i =>
      val v = Seq.fill(dim)(rnd.nextDouble() - 0.5)
      (i * 10L, v, norm(v))
    }
    val vecs = (0 until 200).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() - 0.5)))
      .toDF("vec_id", "v").withColumn("v", col("v").cast("array<double>"))

    // oracle: the transform + array_max struct form the expression replaced
    val cArr = typedLit(cents)
    val vnorm = sqrt(Similarity.dot(col("v"), col("v")))
    val structMax = array_max(transform(cArr, c => struct(
      (Similarity.dot(col("v"), c("_2")) / (vnorm * c("_3"))).as("cos"),
      (-c("_1")).as("ncid"))))
    val expected = vecs.select(col("vec_id"), (-structMax("ncid")).as("cid"))
    val got = vecs.select(col("vec_id"), centroid_assign(col("v"), cents).as("cid"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)

    // interpreted path: nullSafeEval is a hand-written twin of the codegen
    // template — drive it directly so the two loops can't silently drift
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val expectedMap = expected.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    rows.foreach { case (id, v) =>
      val e = graft.functions.CentroidAssign(
        Literal.create(v, ArrayType(DoubleType)),
        cents.map(_._1), cents.map(_._2.toIndexedSeq), cents.map(_._3))
      assert(e.eval(null) == expectedMap(id), s"interpreted eval diverges for vec $id")
    }

    // tie-break: identical centroids under different ids -> smallest cid wins
    val dup = Seq((5L, Seq(1.0, 0.0), 1.0), (3L, Seq(1.0, 0.0), 1.0),
                  (9L, Seq(0.0, 1.0), 1.0))
    val one = Seq((0L, Seq(2.0, 0.0))).toDF("vec_id", "v")
      .withColumn("v", col("v").cast("array<double>"))
    assert(one.select(centroid_assign(col("v"), dup)).head.getLong(0) == 3L)

    // null vector -> null assignment
    val nul = Seq((0L, Option.empty[Seq[Double]])).toDF("vec_id", "v")
      .withColumn("v", col("v").cast("array<double>"))
    assert(nul.select(centroid_assign(col("v"), cents)).head.isNullAt(0))
  }

  test("CentroidTopCells matches the transform+sort_array struct form") {
    import spark.implicits._
    import graft.functions.CentroidAssign.centroid_top_cells
    val rnd = new scala.util.Random(17)
    val dim = 8
    def norm(v: Seq[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    val cents = (0 until 9).map { i =>
      val v = Seq.fill(dim)(rnd.nextDouble() - 0.5)
      (i * 10L, v, norm(v))
    }
    val vecs = (0 until 200).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() - 0.5)))
      .toDF("vec_id", "v").withColumn("v", col("v").cast("array<double>"))

    // oracle: the interpreted slice(sort_array(transform(...))) pipeline
    // the kernel replaced — bit-identical cos doubles, same tie-break
    Seq(1, 3, 9, 12).foreach { np =>
      val cArr = typedLit(cents)
      val vnorm = sqrt(Similarity.dot(col("v"), col("v")))
      val oldForm = slice(sort_array(transform(cArr, c => struct(
        (Similarity.dot(col("v"), c("_2")) / (vnorm * c("_3"))).as("cos"),
        (-c("_1")).as("ncid"))), asc = false), 1, np)
      val expected = vecs.select(col("vec_id"), oldForm.as("sc"))
        .select(col("vec_id"), explode(col("sc")).as("s"))
        .select(col("vec_id"), col("s.cos"), col("s.ncid"))
      val got = vecs.select(col("vec_id"),
          centroid_top_cells(col("v"), cents, np).as("sc"))
        .select(col("vec_id"), explode(col("sc")).as("s"))
        .select(col("vec_id"), col("s.cos"), col("s.ncid"))
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
        s"top-cells diverges from the struct-sort form at nprobe=$np")
    }

    // interpreted eval is the codegen template's twin
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val v0 = vecs.filter(col("vec_id") === 0).head.getSeq[Double](1)
    val e = graft.functions.CentroidTopCells(
      Literal.create(v0, ArrayType(DoubleType)),
      cents.map(_._1), cents.map(_._2.toIndexedSeq), cents.map(_._3), 3)
    val interp = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val fromDf = vecs.filter(col("vec_id") === 0)
      .select(explode(centroid_top_cells(col("v"), cents, 3)).as("s"))
      .select(col("s.cos"), col("s.ncid")).collect()
    assert(interp.numElements() == fromDf.length)
    (0 until interp.numElements()).foreach { i =>
      val row = interp.getStruct(i, 2)
      assert(row.getDouble(0) == fromDf(i).getDouble(0)
          && row.getLong(1) == fromDf(i).getLong(1),
        s"interpreted eval diverges at position $i")
    }

    // null vector -> null cell array (consumers explode: zero candidates)
    val nul = Seq((0L, Option.empty[Seq[Double]])).toDF("vec_id", "v")
      .withColumn("v", col("v").cast("array<double>"))
    assert(nul.select(centroid_top_cells(col("v"), cents, 2)).head.isNullAt(0))
  }

  test("PqEncode: self-codes, codegen/interpreted agreement, tie-break, null") {
    import spark.implicits._
    import graft.functions.PqEncode
    val rnd = new scala.util.Random(13)
    val M = 4; val S = 4; val K = 8
    // codebook(m)(k): distinct random codewords
    val cb: Seq[Seq[Seq[Double]]] =
      Seq.fill(M)(Seq.fill(K)(Seq.fill(S)(rnd.nextDouble() - 0.5)))
    // a vector assembled FROM codeword k in every subspace must encode to
    // (k, k, k, k): every subspace distance is exactly 0 to its own word
    val self = (0 until K).map { k =>
      (k.toLong, (0 until M).flatMap(m => cb(m)(k)))
    }.toDF("vec_id", "v").withColumn("v", col("v").cast("array<double>"))
    val selfCodes = self.select(col("vec_id"),
      PqEncode.pq_encode(col("v"), cb, S).as("code")).collect()
    selfCodes.foreach { r =>
      val k = r.getLong(0)
      val expected = (0 until M).map(m => k << (4 * m)).sum
      assert(r.getLong(1) == expected, s"self-code of $k")
    }

    // interpreted eval (nullSafeEval) is a hand-written twin of the
    // codegen template — drive it directly on random vectors
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val vecs = (0 until 100).map(i => (i.toLong, Seq.fill(M * S)(rnd.nextDouble() - 0.5)))
    val viaDf = vecs.toDF("vec_id", "v")
      .withColumn("v", col("v").cast("array<double>"))
      .select(col("vec_id"), PqEncode.pq_encode(col("v"), cb, S).as("code"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      val e = PqEncode(Literal.create(v, ArrayType(DoubleType)),
        cb.map(_.map(_.toIndexedSeq)), S)
      assert(e.eval(null) == viaDf(id), s"interpreted eval diverges for vec $id")
    }

    // tie-break: duplicate codewords -> the smaller k wins
    val dupCb = Seq(Seq(Seq(1.0, 0.0), Seq(5.0, 5.0), Seq(1.0, 0.0)))
    val one = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "v")
      .withColumn("v", col("v").cast("array<double>"))
    assert(one.select(PqEncode.pq_encode(col("v"), dupCb, 2)).head.getLong(0) == 0L)

    // null vector -> null code
    val nul = Seq((0L, Option.empty[Seq[Double]])).toDF("vec_id", "v")
      .withColumn("v", col("v").cast("array<double>"))
    assert(nul.select(PqEncode.pq_encode(col("v"), dupCb, 2)).head.isNullAt(0))
  }
}
