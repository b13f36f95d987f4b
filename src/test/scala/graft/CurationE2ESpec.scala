package graft

import graft.ext.{MixtureSample, SubstringDedup}
import graft.operators.ConnectedComponents
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end curation: a raw corpus with planted near-duplicates, a
  * verbatim eval-set leak, and boilerplate-heavy junk flows through the
  * REAL operator chain (docs/CURATION.md stages 2→3→4) and comes out with
  * exactly the planted problems removed — the composition test the
  * per-operator specs can't express.
  */
class CurationE2ESpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val rnd = new scala.util.Random(20260814)
  private def words(n: Int): String =
    Seq.fill(n)("w" + rnd.nextInt(5000)).mkString(" ")

  test("planted dups, leaks and repetition are removed; clean docs survive intact") {
    import spark.implicits._

    val evalQuestion = words(12) // 12 tokens ≈ 70+ chars — leak detectable at k=32
    val goodA = words(60)
    val goodB = words(60)
    val nearDupOfA = goodA.split(" ").toSeq.updated(3, "changed").mkString(" ")
    val leaky = words(10) + " " + evalQuestion + " " + words(8)

    val corpus = Seq(
      (0L, "src0", goodA),
      (1L, "src0", goodB),
      (2L, "src1", nearDupOfA),   // near-dup of doc 0 → dropped by LSH closure
      (3L, "src1", leaky),        // contains the eval question verbatim → trimmed
      (4L, "src1", words(55))
    ).toDF("doc_id", "source", "text")
    val evalSet = Seq((100L, evalQuestion)).toDF("doc_id", "text")

    // ---- stage 2: whole-doc near-dedup (MinHash-LSH pairs → closure keep-set)
    val banded = StreamingOps.minhashBanded(corpus)
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst")).distinct()
    val labels = ConnectedComponents.run(corpus.select(col("doc_id").as("id")), pairs)
    val keep = labels.filter(col("id") === col("comp")).select(col("id").as("doc_id"))
    val deduped = corpus.join(keep, Seq("doc_id"), "leftsemi")
    val dedupedIds = deduped.select("doc_id").as[Long].collect().toSet
    assert(!dedupedIds.contains(2L), "near-dup survived LSH closure")
    assert(Set(0L, 1L, 3L, 4L).subsetOf(dedupedIds), "a unique doc was dropped")

    // ---- stage 3: span-level decontamination against the eval set
    val spans = SubstringDedup.crossCorpusSpans(deduped, evalSet)
    val cleaned = SubstringDedup.trimSpans(deduped, spans)
      .join(deduped.select("doc_id", "source"), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("text_clean").as("text"))
    // the leak is gone from doc 3, and nothing of the clean docs moved
    val residual = SubstringDedup.crossCorpusSpans(cleaned, evalSet)
    assert(residual.count() === 0L, "eval text survived decontamination")
    val textOf = cleaned.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(textOf(0L) === goodA && textOf(1L) === goodB && textOf(4L).length > 0)
    assert(!textOf(3L).contains(evalQuestion))
    assert(textOf(3L).startsWith("w"), "doc 3 should keep its own prefix")

    // ---- stage 4: deterministic mixture over the surviving corpus
    val mixed = MixtureSample.mixtureSample(cleaned, Map("src0" -> 2.0), defaultWeight = 1.0)
    val copies = mixed.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(copies(0L) === 2L && copies(1L) === 2L, "src0 docs upsample 2x")
    assert(copies(3L) === 1L && copies(4L) === 1L)
    assert(!copies.contains(2L), "the dropped near-dup reappeared")
  }

  test("admission-to-tokens: LM gate + quality budget + at-rest tokenizer compose") {
    import spark.implicits._
    import graft.ext.{Bpe, LmGate}
    import graft.operators.DistributedRank
    // a small corpus with distinct per-doc texts; the chain under test is
    // the round-10/11 tail of the pipeline: score every doc under the
    // corpus LM, cut by tercile, spend a token budget on the best-scored
    // docs, then tokenize exactly the admitted set with a STORED tokenizer
    val corpus = (0L until 9L).map { i =>
      (i, Seq.fill(6 + (i % 3).toInt)("w" + ((i * 7) % 11) + " v" + (i % 5)).mkString(" "))
    }.toDF("doc_id", "text")

    // ---- LM gate: every doc gets a score and a bucket
    val tmp = java.nio.file.Files.createTempDirectory("graft-e2e-lm").toString
    LmGate.write(corpus, tmp, mode = LmGate.Mode.Addone)
    val gate = LmGate.load(spark, tmp)
    val bucketed = gate.bucketed(corpus).cache()
    val buckets = bucketed.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_logprob"), r.getAs[Int]("bucket"))).toMap
    assert(buckets.size == 9 && buckets.values.forall { case (_, b) => b >= 1 && b <= 3 })

    // ---- budget cut over the gate's admitted docs (head+middle terciles):
    // spend a token budget on the best-scored docs first (exact prefix sum)
    val admitted = bucketed.filter(col("bucket") <= 2)
      .join(corpus, Seq("doc_id"))
      .withColumn("n_tokens", size(graft.ext.TextHash.tokens(col("text"))))
    val budget = 30L
    val kept = DistributedRank
      .cumSumDesc(admitted, "avg_logprob", "doc_id", "n_tokens")
      .filter(col("cum") <= budget)
    val keptRows = kept.select("doc_id", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    // reference: the same greedy cut computed driver-side
    val ref = admitted.select("doc_id", "avg_logprob", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .sortBy { case (id, s, _) => (-s, id) }
    var acc = 0L
    val refKept = ref.takeWhile { case (_, _, n) => { acc += n; acc <= budget } }
      .map(_._1).toSet
    assert(keptRows.keySet == refKept, s"budget cut diverged: ${keptRows.keySet} vs $refKept")
    assert(keptRows.values.map(_.toLong).sum <= budget)

    // ---- tokenize EXACTLY the admitted+budgeted set with a stored tokenizer
    val finalDocs = corpus.join(kept.select("doc_id"), Seq("doc_id"))
    val (_, words2) = Bpe.train(finalDocs, rounds = 2)
    val tokDir = java.nio.file.Files.createTempDirectory("graft-e2e-tok").toString
    Bpe.writeTokenizer(words2, tokDir)
    val (wS, idsS) = Bpe.loadTokenizer(spark, tokDir)
    val encoded = Bpe.encodeWith(finalDocs, wS, idsS).cache()
    assert(encoded.count() == refKept.size, "a budgeted doc failed to tokenize")
    // lossless round-trip: decode gives each admitted doc's token stream
    val decoded = Bpe.decode(encoded, idsS).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = finalDocs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").mkString("")).toMap
    assert(decoded == expect, "tokenizer round-trip diverged on the admitted set")
    spark.catalog.clearCache()
  }

  test("model-gated pipeline: classifier gate + DSIR selection compose with the funnel") {
    import spark.implicits._
    import graft.ext.{CurationReport, Dsir, QualityClassifier}
    // planted corpus: a reference-quality domain (vocab A), junk (vocab B),
    // and a raw pool mixing both — plus one exact duplicate and one leak
    val a = Vector("clear", "useful", "precise", "sound", "direct", "plain")
    val b = Vector("zz1", "zz2", "zz3", "zz4", "zz5", "zz6")
    def doc(v: Vector[String], n: Int = 55) =
      Seq.fill(n)(v(rnd.nextInt(v.size))).mkString(" ")
    val benchText = words(12)
    val ref = (0 until 40).map(i => (500L + i, "src0", doc(a)))
    val junkTrain = (0 until 40).map(i => (600L + i, "junk", doc(b)))
    val rawGood = (0 until 20).map(i => (i.toLong, "raw", doc(a)))
    val rawJunk = (20 until 40).map(i => (i.toLong, "raw", doc(b)))
    val dupBody = doc(a)
    val extras = Seq(
      (40L, "raw", dupBody), (41L, "raw", dupBody),         // exact dup pair
      (42L, "raw", doc(a, 45) + " " + benchText),           // leaked bench text
      (43L, "bench", benchText))                            // the bench doc
    val all = (ref ++ junkTrain ++ rawGood ++ rawJunk ++ extras)
      .toDF("doc_id", "source", "text")

    // the funnel counts the structural problems per domain...
    val rep = CurationReport.report(all, col("source") === "bench")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 43 raw docs in; all pass quality; the dup pair loses one; the leak
    // doc falls at decontamination
    assert(rep("raw") == ((43L, 43L, 42L, 41L)),
      s"raw funnel should cut 1 dup + 1 leak: ${rep("raw")}")

    // ...the trained classifier gates the raw pool on LEARNED quality.
    // Train on the LABELED sets only (reference positives + known junk) —
    // folding the unlabeled raw pool in as negatives would teach the
    // model that its own vocabulary is junk...
    val (w, bias) = QualityClassifier.train(
      all.filter(col("source").isin("src0", "junk")))
    val gated = all.filter(col("source") === "raw")
      .filter(QualityClassifier.scoreInline(col("text"), w, bias) >= 0.5)
    val gatedIds = gated.select("doc_id").as[Long].collect().toSet
    assert((0L until 20L).forall(gatedIds), "classifier dropped reference-like raw docs")
    assert((20L until 40L).forall(i => !gatedIds(i)), "classifier kept junk raw docs")

    // ...and DSIR ranks what the gate kept by target-distribution fit:
    // its top picks must be the reference-like docs too (independent
    // signals agreeing on planted data)
    val sel = Dsir.select(all.filter(col("source").isin("src0", "raw")),
                          col("source") === "src0", k = 15)
      .select("doc_id").as[Long].collect().toSet
    assert(sel.forall(id => id < 20L || id == 40L || id == 41L || id == 42L),
      s"DSIR selected junk-vocabulary docs: $sel")
  }

  test("at-rest artifacts compose: served funnel == rebuilt funnel, probe prunes") {
    import graft.ext.{CurationReport, Dedup, DedupIndex, LmGate, TextAnalysis}
    // the steady-state admission run: the corpus is already ingested (its
    // LM gate, band index, and the eval suite's Bloom bits are ON DISK),
    // and an incoming batch flows through quality -> novelty -> decontam
    // served ENTIRELY from those artifacts. Pinned against the identical
    // composition over in-memory-rebuilt pieces: the at-rest forms must
    // compose, not just exist individually.
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val isBench = col("doc_id") % 97 === 0
    val isBatch = col("doc_id") % 2 === 1
    val bench = docs.filter(isBench)
    val corpusDocs = docs.filter(!isBench && !isBatch)
    val batch = docs.filter(!isBench && isBatch)
    val banded = Dedup.mhBandedDf(spark, sf).cache()
    try {
      val bandedCorpus = banded.filter(!isBench && !isBatch)
      val bandedBatch = banded.filter(!isBench && isBatch)
      val tmp = java.nio.file.Files.createTempDirectory("graft-funnel").toString
      LmGate.write(corpusDocs, s"$tmp/gate", mode = LmGate.Mode.Addone, maxBigrams = 500)
      DedupIndex.write(bandedCorpus, s"$tmp/dedup")
      TextAnalysis.writeBloomBits(Dedup.shingleHash(bench), s"$tmp/bloom")

      def served() = CurationReport.servedReport(batch, bandedBatch,
        DedupIndex.load(spark, s"$tmp/dedup"),
        LmGate.load(spark, s"$tmp/gate"),
        TextAnalysis.loadBloomBits(spark, s"$tmp/bloom"))

      val (c12, c1) = LmGate.cappedTables(corpusDocs, 500)
      val bs = graft.operators.DistributedRank.boundariesDesc(
        LmGate.scoreSmoothed(corpusDocs, c12, c1)
          .select(col("doc_id"), col("avg_logprob")),
        "avg_logprob", "doc_id", 3)
      val rebuilt = CurationReport.servedReport(batch, bandedBatch,
        DedupIndex.indexRows(bandedCorpus),
        LmGate.Gate(c12, c1, bs, mode = LmGate.Mode.Addone, maxBigrams = 500),
        TextAnalysis.bloomBits(Dedup.shingleHash(bench)))

      val sRows = served().collect().map(_.toSeq).toSeq
      val rRows = rebuilt.collect().map(_.toSeq).toSeq
      assert(sRows == rRows,
        s"served funnel diverges from rebuilt:\n$sRows\nvs\n$rRows")

      // the funnel is a funnel: per-source counts monotone, raw total
      // covers the batch, and at least one stage actually cut something
      // (all-pass would vacuously satisfy the equivalence)
      val byCols = served().collect()
      assert(byCols.map(_.getAs[Long]("n_raw")).sum == batch.count())
      byCols.foreach { r =>
        val (raw, q, nv, cl) = (r.getAs[Long]("n_raw"), r.getAs[Long]("n_quality"),
          r.getAs[Long]("n_novel"), r.getAs[Long]("n_clean"))
        assert(raw >= q && q >= nv && nv >= cl, s"non-monotone funnel row: $r")
      }
      assert(byCols.map(_.getAs[Long]("n_clean")).sum <
             byCols.map(_.getAs[Long]("n_raw")).sum,
        "funnel cut nothing — the composition check is vacuous")

      // executed plan: the index probe leg keeps dynamic partition
      // pruning inside the composed funnel, and composition introduces no
      // cartesian pairing
      val df = served()
      df.collect()
      // grade only the FINAL AQE-resolved plan (PlanAuditSpec.planOf
      // rule): AdaptiveSparkPlanExec.toString appends the initial plan,
      // which would mask a final-plan pruning loss and report pre-AQE
      // join shapes
      val fullPlan = df.queryExecution.executedPlan.toString
      val cut = fullPlan.indexOf("== Initial Plan ==")
      val plan = if (cut >= 0) fullPlan.take(cut) else fullPlan
      assert(plan.contains("dynamicpruning"),
        s"composed funnel lost partition pruning on the index probe:\n${plan.take(2000)}")
      assert(!plan.contains("CartesianProduct"), "composed funnel plans a cartesian")
    } finally { banded.unpersist(); spark.catalog.clearCache(); () }
  }
}
