package graft

import graft.ext.{Dsir, QualityClassifier, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-shaped curation operators: DSIR importance resampling, the
  * trained logistic-regression quality classifier, and kNN label
  * classification — all on planted data where the right answer is known.
  */
class CurationModelSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // Two disjoint vocabularies: "good" docs draw from A, "junk" from B.
  // Deterministic synthesis (seeded) — same corpus every run.
  private val VocabA = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
  private val VocabB = Vector("crash", "spam", "junk", "noise", "click", "blob")

  private def doc(rnd: scala.util.Random, vocab: Vector[String], n: Int): String =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  /** 40 target docs (vocab A), 80 raw-good (A), 80 raw-junk (B). */
  private lazy val planted = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows =
      (0 until 40).map(i => (i.toLong, "target", doc(rnd, VocabA, 30))) ++
      (0 until 80).map(i => (100L + i, "rawgood", doc(rnd, VocabA, 30))) ++
      (0 until 80).map(i => (300L + i, "rawjunk", doc(rnd, VocabB, 30)))
    rows.toDF("doc_id", "source", "text")
  }

  test("DSIR: selection prefers target-distribution docs, deterministic") {
    val sel = Dsir.select(planted, col("source") === "target", 60)
    val picked = sel.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(picked.size == 60)
    // target docs are excluded from the candidate pool by construction
    assert(picked.forall(_ >= 100L))
    // the A-vocabulary candidates must dominate the selection: their log
    // importance weight is strongly positive, junk's strongly negative,
    // and the Gumbel noise is O(1) against a large margin
    val fromGood = picked.count(_ < 300L)
    assert(fromGood >= 55, s"only $fromGood/60 picks from the target-like pool")
    // deterministic: the draw is a hash, not an RNG
    val again = Dsir.select(planted, col("source") === "target", 60)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == picked)
    // a different salt is an independent redraw of the same distribution:
    // still target-heavy, not necessarily identical
    val redraw = Dsir.select(planted, col("source") === "target", 60, salt = "v2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(redraw.count(_ < 300L) >= 55)
  }

  /** Balanced, linearly separable corpus for the classifier tests: the
    * positive domain uses vocab A, the negative vocab B, 100 docs each.
    * (The DSIR corpus above is unusable here: its "rawgood" docs share the
    * positive class's vocabulary but carry the negative label 2:1, so no
    * classifier can mark the targets positive on it.)
    */
  private lazy val classifierDocs = {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows =
      (0 until 100).map(i => (i.toLong, "src0", doc(rnd, VocabA, 30))) ++
      (0 until 100).map(i => (200L + i, "junk", doc(rnd, VocabB, 30)))
    rows.toDF("doc_id", "source", "text")
  }

  test("quality classifier: trained weights separate the domains") {
    val docs = classifierDocs
    val (w, bias) = QualityClassifier.train(docs)
    assert(w.length == QualityClassifier.D)
    assert(w.forall(x => !x.isNaN && !x.isInfinite) && !bias.isNaN)
    // scoreInline is the serving-path projection; accuracy on the planted
    // corpus must beat 0.9 (vocabularies are disjoint — an easy problem;
    // failure means training moved weights the wrong way)
    val scored = docs.select(col("doc_id"), col("source"),
      QualityClassifier.scoreInline(col("text"), w, bias).as("p")).collect()
    val acc = scored.count { r =>
      (r.getDouble(2) >= 0.5) == (r.getString(1) == "src0")
    }.toDouble / scored.length
    assert(acc >= 0.9, s"classifier accuracy $acc")
    // and the score ORDERING must separate cleanly, not just the 0.5 cut
    val posMin = scored.filter(_.getString(1) == "src0").map(_.getDouble(2)).min
    val negMax = scored.filter(_.getString(1) != "src0").map(_.getDouble(2)).max
    assert(posMin > negMax, s"score ranges overlap: posMin $posMin <= negMax $negMax")
    // the training knobs are live, not decorative: more rounds at a lower
    // rate must produce a DIFFERENT model that still separates
    val (w3, bias3) = QualityClassifier.train(docs, rounds = 3, eta = 1.0)
    assert(w3 != w, "rounds/eta knobs produced the default model")
    val scored3 = docs.select(col("source"),
      QualityClassifier.scoreInline(col("text"), w3, bias3).as("p")).collect()
    val acc3 = scored3.count { r =>
      (r.getDouble(1) >= 0.5) == (r.getString(0) == "src0")
    }.toDouble / scored3.length
    assert(acc3 >= 0.9, s"knob-trained classifier accuracy $acc3")
  }

  test("quality classifier: inline serving score tracks the training-shaped score") {
    val docs = classifierDocs
    val (w, bias) = QualityClassifier.train(docs)
    val warr = typedLit(w)
    val grouped = QualityClassifier.featDf(docs)
      .select(col("doc_id"), col("b"), (col("cnt").cast("double") / col("n")).as("x"))
      .withColumn("w", element_at(warr, col("b").cast("int") + 1))
      .groupBy("doc_id")
      .agg((sum(round(col("x") * col("w"), 12).cast("decimal(28,12)"))
             .cast("double") + bias).as("z"))
      .select(col("doc_id"), (lit(1.0) / (lit(1.0) + exp(-col("z")))).as("pg"))
    val inline = docs.select(col("doc_id"),
      QualityClassifier.scoreInline(col("text"), w, bias).as("pi"))
    val joined = grouped.join(inline, Seq("doc_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val d = math.abs(r.getDouble(1) - r.getDouble(2))
      assert(d < 1e-6, s"doc ${r.getLong(0)}: grouped ${r.getDouble(1)} vs inline ${r.getDouble(2)}")
    }
  }

  test("BM25: rare terms dominate, term frequency saturates, length-normalized") {
    import spark.implicits._
    // "needle" appears in 2 docs, "common" in all 40; doc 0 has both
    val docs = ((0 until 40).map { i =>
      val body = Seq.fill(20)("filler") ++ Seq("common") ++
        (if (i < 2) Seq("needle") else Nil) ++
        (if (i == 1) Seq.fill(5)("needle") else Nil) // doc 1: tf=6
      (i.toLong, body.mkString(" "))
    }).toDF("doc_id", "text")
    val hits = ext.Bm25.search(docs, Seq("needle", "common"), 40).collect()
    val score = hits.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every doc matches "common"; only 0 and 1 match the rare term too
    assert(hits.length == 40)
    assert(score(1L) > score(0L), "higher tf on the rare term must score higher")
    assert(score(0L) > score(2L), "a rare-term match must beat common-only docs")
    // saturation: tf=6 on the rare term is worth far less than 6x tf=1
    val needleIdf = math.log(1.0 + (40.0 - 2 + 0.5) / (2 + 0.5))
    assert(score(1L) - score(2L) < 3.0 * (score(0L) - score(2L)),
      s"tf saturation violated: ${score(1L)} vs ${score(0L)} (idf $needleIdf)")
    // deterministic rerun
    val again = ext.Bm25.search(docs, Seq("needle", "common"), 40).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again == score)
  }

  test("properties: BM25 order-invariance, DSIR monotonicity, vote tie-breaks") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)

    // --- BM25: token order cannot matter (tf is a bag count) -------------
    val words = Vector("sun", "moon", "star", "void", "dust")
    val bags = (0 until 25).map { i =>
      Seq.fill(20 + rnd.nextInt(10))(words(rnd.nextInt(words.size)))
    }
    val orig = bags.zipWithIndex.map { case (b, i) => (i.toLong, b.mkString(" ")) }
      .toDF("doc_id", "text")
    val perm = bags.zipWithIndex.map { case (b, i) =>
      (i.toLong, rnd.shuffle(b).mkString(" ")) }.toDF("doc_id", "text")
    val terms = Seq("sun", "void")
    val s1 = ext.Bm25.search(orig, terms, 25)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val s2 = ext.Bm25.search(perm, terms, 25)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s1 == s2, "BM25 is order-sensitive (tf must be a bag count)")

    // --- DSIR: appending a target-exclusive token raises the weight ------
    // target vocabulary disjoint from candidate vocabulary except "pivot"
    val tgt = (0 until 20).map(i => (1000L + i, "tgt",
      Seq.fill(20)("pivot").mkString(" ")))
    // IDENTICAL base content for every candidate: the only difference is
    // the pivot count, so the log-weight comparison is confound-free
    // (λ of the raw-common buckets is negative — longer docs score lower —
    // and per-doc random bases would drown the pivot signal in that)
    val baseToks = Seq.fill(15)(words(rnd.nextInt(words.size)))
    val cnd = (0 until 20).map(i => (i.toLong, "raw",
      (baseToks ++ Seq.fill(i % 4)("pivot")).mkString(" ")))
    val docs = (tgt ++ cnd).toDF("doc_id", "source", "text")
    val lam = ext.Dsir.lambdaTable(docs, col("source") === "tgt")
    val scoresByPivots = docs.filter(col("source") === "raw")
      .select(col("doc_id"), ext.Dsir.scoreInline(col("text"), lam).as("w"))
      .collect().map(r => (r.getLong(0) % 4, r.getDouble(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum / v.size }
    // log-weight strictly increases with the target-token count FROM k=1:
    // each increment beyond the first adds exactly the same feature pair
    // (the pivot unigram + the "pivot pivot" bigram, both target-heavy).
    // k=0 -> 1 is deliberately excluded: the first pivot also introduces
    // the raw-only boundary bigram "base15 pivot" (never seen in the
    // target), whose strongly negative log-ratio can outweigh the
    // unigram gain — correct DSIR behavior, not a bug.
    (1L to 2L).foreach { k =>
      assert(scoresByPivots(k) < scoresByPivots(k + 1),
        s"DSIR not monotone in target-token count: $scoresByPivots")
    }
    // and the increment is the SAME feature pair each time, so the deltas
    // match exactly (up to the 6dp output rounding)
    val d12 = scoresByPivots(2L) - scoresByPivots(1L)
    val d23 = scoresByPivots(3L) - scoresByPivots(2L)
    assert(math.abs(d12 - d23) < 1e-5, s"per-pivot delta drifts: $d12 vs $d23")

    // --- vote tie-break: equal votes resolve to the SMALLEST label, both
    // in the window form and the streaming-safe array form ---------------
    val tied = Seq(
      (1L, 10L, 7, 0.90), (1L, 11L, 3, 0.89), // k=2: labels {7,3}, 1 vote each
      (1L, 12L, 9, 0.10))
      .toDF("qid", "cand", "label", "cos_r")
    val w = Similarity.knnClassify(tied, k = 2).collect()(0)
    assert(w.getAs[Int]("pred_label") == 3, "window vote tie must pick smallest label")
    val d = Similarity.knnVoteByDistance(
        tied.select(col("qid"), col("cand"), col("label"),
                    (lit(1.0) - col("cos_r")).as("dist")), k = 2)
      .collect()(0)
    assert(d.getAs[Int]("pred_label") == 3, "array vote tie must pick smallest label")
  }

  test("empty-input contracts: DSIR empty target fails loud, BM25 empty corpus rejected") {
    import spark.implicits._
    val docs = Seq((1L, "raw", "some tokens here")).toDF("doc_id", "source", "text")
    // an empty target used to NULL the whole λ table (every score null,
    // silently); now it names the problem
    val e = intercept[Exception] {
      Dsir.select(docs, col("source") === "nonexistent", 5).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("target set has no features"),
      s"wrong error: ${e.getMessage}")
    intercept[IllegalArgumentException] {
      ext.Bm25.termStats(docs.filter(col("doc_id") < 0), Seq("x"))
    }
  }

  test("MMR: redundant near-duplicate demoted below a diverse lower-relevance pick") {
    import spark.implicits._
    // pool for one probe: A (top), B (near-dup of A, almost as relevant),
    // C (clearly distinct, lower relevance)
    val cands = Seq((1L, 10L, 0.99), (1L, 11L, 0.98), (1L, 12L, 0.80))
      .toDF("qid", "cand", "rel")
    val simPairs = Seq(
      (1L, 10L, 11L, 0.99), (1L, 11L, 10L, 0.99),
      (1L, 10L, 12L, 0.10), (1L, 12L, 10L, 0.10),
      (1L, 11L, 12L, 0.10), (1L, 12L, 11L, 0.10))
      .toDF("qid", "a", "b", "sim")
    val order = ext.Mmr.rerank(cands, simPairs, k = 3)
      .orderBy("step").collect().map(_.getLong(1)).toSeq
    // relevance order would be A,B,C; MMR must slot the diverse C second:
    // score(B@2) = .7*.98 - .3*.99 = 0.389 < score(C@2) = .7*.80 - .3*.10 = 0.53
    assert(order == Seq(10L, 12L, 11L), s"MMR order $order")
    // pure-relevance control: with lambda-free scoring the dup would win —
    // sanity that the pool itself ranks A,B,C
    val relOrder = cands.orderBy(col("rel").desc).collect().map(_.getLong(1)).toSeq
    assert(relOrder == Seq(10L, 11L, 12L))
  }

  test("curation report: every funnel stage bites on planted problems") {
    import spark.implicits._
    val good = (1 to 60).map(i => s"tok$i").mkString(" ") // 60 tokens, passes
    val short = "too short"                               // fails quality
    val benchText = (100 to 160).map(i => s"eval$i").mkString(" ")
    val rows = Seq(
      (0L, "bench", benchText),          // the held-out eval doc
      (1L, "web", good),                 // clean survivor
      (2L, "web", good),                 // exact dup of 1 -> cut at dedup
      (3L, "web", short),                // cut at quality
      (4L, "web", s"prefix $benchText"), // contains the eval text -> cut at decontam
      (5L, "books", good + " extra")     // clean survivor, other domain
    )
    val docs = rows.toDF("doc_id", "source", "text")
    val rep = ext.CurationReport.report(docs, col("source") === "bench")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // web: 4 raw -> 3 pass quality -> 2 unique -> 1 clean
    assert(rep("web") == ((4L, 3L, 2L, 1L)), s"web funnel ${rep("web")}")
    // books: untouched at every stage
    assert(rep("books") == ((1L, 1L, 1L, 1L)), s"books funnel ${rep("books")}")
    // the bench doc itself is not part of the corpus report
    assert(!rep.contains("bench"))
  }

  test("BM25 inline serving score equals the search operator's bm25 exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val vocab = Vector("oak", "pine", "elm", "fir", "ash", "yew")
    val docs = (0 until 50).map(i =>
      (i.toLong, Seq.fill(15 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val terms = Seq("oak", "elm")
    val (stats, avgdl) = ext.Bm25.termStats(docs, terms)
    val inline = docs.select(col("doc_id"),
        ext.Bm25.scoreInline(col("text"), stats, avgdl).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val searched = ext.Bm25.search(docs, terms, 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(searched.nonEmpty)
    // exact on every doc the search surfaces; non-matching docs score 0.0
    searched.foreach { case (id, s) =>
      assert(inline(id) == s, s"doc $id: inline ${inline(id)} vs search $s")
    }
    (inline.keySet -- searched.keySet).foreach { id =>
      assert(inline(id) == 0.0, s"non-matching doc $id scored ${inline(id)}")
    }
  }

  test("kNN classify: planted clusters recover their labels, tie-break deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // 4 well-separated cluster centers; 30 members each, labeled by cluster
    val centers = (0 until 4).map(_ => unit(Array.fill(Similarity.Dim)(rnd.nextGaussian())))
    val rows = for {
      c <- 0 until 4
      i <- 0 until 30
    } yield {
      val noise = Array.fill(Similarity.Dim)(rnd.nextGaussian() * 0.05)
      val v = unit(centers(c).zip(noise).map { case (a, b) => a + b })
      ((c * 30 + i).toLong, c, v.toSeq)
    }
    val e = rows.toDF("vec_id", "label", "v")
    val probes = e.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("qid"), col("label").as("true_label"), col("v").as("qv"))
    val corpus = e.filter(col("vec_id") % 5 =!= 0)
      .select(col("vec_id").as("cand"), col("label"), col("v"))
    val pairs = corpus.join(broadcast(probes.drop("true_label")), lit(true))
      .select(col("qid"), col("cand"), col("label"),
              round(Similarity.cosine(col("qv"), col("v")), 6).as("cos_r"))
    val pred = Similarity.knnClassify(pairs, Similarity.KnnK)
      .join(probes.select("qid", "true_label"), Seq("qid"))
      .collect()
    assert(pred.length == e.filter(col("vec_id") % 5 === 0).count())
    pred.foreach { r =>
      assert(r.getAs[Int]("pred_label") == r.getAs[Int]("true_label"),
        s"probe ${r.getAs[Long]("qid")} misclassified")
      // with k=10 and tight clusters, the vote should be unanimous
      assert(r.getAs[Long]("votes") == Similarity.KnnK)
    }

    // ---- the scale path: the SAME vote over IVF-PQ candidates ----
    // q_embed_knn_classify's Scaladoc claims candidate generation is a
    // pluggable seam; prove it — swap the brute-force pairs for
    // probeIndex's cell candidates (sublinear: nprobe cells per probe)
    // with an exact-cosine rescore, and the classifier must still
    // recover the planted labels.
    val corpusV = corpus.select(col("cand").as("vec_id"), col("v"))
    val cents = Similarity.centroidSet(corpusV, 8)
    val cb = Similarity.pqCodebook(corpusV)
    val index = Similarity.indexRows(corpusV, cents, cb)
    val probeV = probes.select(col("qid").as("vec_id"), col("qv").as("v"))
    val cand = Similarity.probeIndex(index, probeV, cents, cb,
                                     nprobe = 3, k = 20)
      .select(col("qid"), col("cand"))
    val rescored = cand
      .join(corpus.select(col("cand"), col("label"), col("v")), Seq("cand"))
      .join(broadcast(probes.select(col("qid"), col("qv"))), Seq("qid"))
      .select(col("qid"), col("cand"), col("label"),
              round(Similarity.cosine(col("qv"), col("v")), 6).as("cos_r"))
    val annPred = Similarity.knnClassify(rescored, Similarity.KnnK)
      .join(probes.select("qid", "true_label"), Seq("qid"))
      .collect()
    assert(annPred.length == pred.length, "ANN path lost probes")
    val annAcc = annPred.count(r =>
      r.getAs[Int]("pred_label") == r.getAs[Int]("true_label")).toDouble / annPred.length
    assert(annAcc >= 0.9, s"ANN-candidate kNN accuracy $annAcc")
  }
}
