package graft

import graft.ext.LmGate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The at-rest LM gate must serve EXACTLY the declared query's semantics:
  * write → load → bucket on the trained corpus reproduces
  * q_text_ppl_buckets bit-for-bit, and the closed-world drop contract for
  * all-unseen documents is pinned.
  */
class LmGateSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = "/root/testdata/sf0.001"

  test("stored gate reproduces q_text_ppl_buckets on the trained corpus") {
    val docs = Tables.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm-gate").toString
    LmGate.write(docs, tmp)
    val gate = LmGate.load(spark, tmp)
    val served = gate.bucketed(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_logprob"), r.getAs[Int]("bucket"))).toMap
    spark.catalog.clearCache()
    val declared = SparkEntry.queries("q_text_ppl_buckets")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_logprob"), r.getAs[Int]("bucket"))).toMap
    assert(served == declared, "at-rest gate diverges from the declared query")
    spark.catalog.clearCache()
  }

  test("stored CAPPED gate reproduces q_text_ppl_capped, and the artifact is bounded by the cap") {
    val docs = Tables.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm-capped").toString
    LmGate.write(docs, tmp, mode = LmGate.Mode.Addone, maxBigrams = 500)
    val gate = LmGate.load(spark, tmp)
    assert(gate.mode == LmGate.Mode.Addone && gate.maxBigrams == 500,
      "cap + scoring mode must travel with the artifact")
    // the whole stored model is bounded by the cap — the property that
    // makes serving two broadcast joins at any corpus size
    assert(gate.c12.count() <= 500 && gate.c1.count() <= 500)
    val served = gate.bucketed(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_logprob"), r.getAs[Int]("bucket"))).toMap
    spark.catalog.clearCache()
    val declared = SparkEntry.queries("q_text_ppl_capped")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_logprob"), r.getAs[Int]("bucket"))).toMap
    assert(served == declared, "at-rest capped gate diverges from the declared query")
    spark.catalog.clearCache()
  }

  test("r17 meta-stamped serving scalars ≡ the counted fallback (addone + kneser)") {
    // write() now freezes vsz / kn_denom into meta so Gate.bucketed pays
    // zero scalar actions per serve; a pre-stamp artifact (scalars = -1)
    // must bucket identically via the counted fallback
    val docs = Tables.documents(spark, dir)
    Seq(LmGate.Mode.Addone, LmGate.Mode.Kneser).foreach { mode =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-lm-stamp").toString
      LmGate.write(docs, tmp, mode = mode, maxBigrams = 200)
      val stamped = LmGate.load(spark, tmp)
      assert((if (mode == LmGate.Mode.Addone) stamped.vsz
              else stamped.knDenomStored) >= 0,
        s"$mode gate missing its meta stamp")
      val legacy = stamped.copy(vsz = -1L, knDenomStored = -1L)
      val a = stamped.bucketed(docs).collect().map(_.toSeq).toSet
      val b = legacy.bucketed(docs).collect().map(_.toSeq).toSet
      assert(a === b, s"$mode: stamped serving diverges from counted fallback")
      spark.catalog.clearCache()
    }
  }

  test("capBigrams keeps exactly the deterministic top-N (count desc, key asc)") {
    import spark.implicits._
    val c12 = Seq(
      ("a", "b", 5L), ("a", "c", 3L), ("b", "a", 3L),
      ("c", "d", 3L), ("d", "e", 1L)).toDF("w1", "w2", "c12")
    val kept = LmGate.capBigrams(c12, 3).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // ties at c12=3 break on "w1 w2" string order: "a c" < "b a" < "c d"
    assert(kept == Set(("a", "b"), ("a", "c"), ("b", "a")), s"got $kept")
    spark.catalog.clearCache()
  }

  test("boundary scalars round-trip through parquet bit-exactly") {
    import spark.implicits._
    val docsDf = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the dog sat on the log"),
      (2L, "a cat and a dog"),
      (3L, "the bird sat on the dog"),
      (4L, "a dog on a log"),
      (5L, "the cat and the bird")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm-bounds").toString
    LmGate.write(docsDf, tmp)
    val (c12, c1) = LmGate.countTables(docsDf)
    val scored = LmGate.score(docsDf, c12, c1)
      .select(col("doc_id"), col("avg_logprob"))
    val direct = graft.operators.DistributedRank
      .boundariesDesc(scored, "avg_logprob", "doc_id", 3)
    spark.catalog.clearCache()
    assert(LmGate.load(spark, tmp).boundaries == direct)
  }

  test("load: absent meta falls back to MLE; a CORRUPT meta propagates instead of silently degrading") {
    import spark.implicits._
    val docsDf = Seq((0L, "the cat sat on the mat"),
      (1L, "the dog sat on the log")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm-meta").toString
    LmGate.write(docsDf, tmp, mode = LmGate.Mode.Addone)
    assert(LmGate.load(spark, tmp).mode == LmGate.Mode.Addone,
      "scoring mode must travel with the artifact")
    // pre-meta artifact (genuine absence): MLE fallback
    val metaDir = java.nio.file.Paths.get(tmp, "meta.parquet")
    val backup = java.nio.file.Paths.get(tmp, "meta.parquet.bak")
    java.nio.file.Files.move(metaDir, backup)
    assert(LmGate.load(spark, tmp).mode == LmGate.Mode.Mle,
      "absent meta must read as pre-meta MLE artifact")
    // corrupt meta (present but unreadable): must THROW, not degrade to MLE
    java.nio.file.Files.move(backup, metaDir)
    val part = java.nio.file.Files.list(metaDir).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    java.nio.file.Files.write(part, "not a parquet file".getBytes)
    intercept[Exception](LmGate.load(spark, tmp).mode)
  }

  test("smoothed scoring keeps all-unseen documents with a defined low score") {
    import spark.implicits._
    val corpus = Seq((0L, "the cat sat on the mat"),
      (1L, "the dog sat on the log")).toDF("doc_id", "text")
    val (c12, c1) = LmGate.countTables(corpus)
    val vsz = c1.count()
    val serve = Seq(
      (10L, "the cat sat"),                   // known bigrams
      (11L, "zq zork blurp entirely novel"))  // every bigram unseen
      .toDF("doc_id", "text")
    val got = LmGate.scoreSmoothed(serve, c12, c1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(10L, 11L), s"smoothed scoring dropped a doc: ${got.toSeq}")
    // the all-unseen doc scores exactly ln(1/V) per bigram (c12=0, c1=0)
    val perBigram = BigDecimal(math.rint(math.log(1.0 / vsz) * 1e9) / 1e9)
    val expected = (perBigram * got(1)._2 / got(1)._2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(1)._3 - expected) < 1e-6,
      s"all-unseen score ${got(1)._3} != ln(1/V) = $expected")
    // known-bigram doc scores strictly higher than the novel one
    assert(got(0)._3 > got(1)._3)
    spark.catalog.clearCache()
  }

  test("smoothed gate lifecycle: OOV docs land in the tail bucket, never drop") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "the cat sat on the mat today"),
      (1L, "the dog sat on the log today"),
      (2L, "a cat and a dog and a bird"),
      (3L, "the bird sat on the dog"),
      (4L, "a dog on a log on a mat"),
      (5L, "the cat and the bird today")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm-smooth").toString
    LmGate.write(corpus, tmp, mode = LmGate.Mode.Addone)
    val gate = LmGate.load(spark, tmp)
    assert(gate.mode == LmGate.Mode.Addone,
      "scoring mode must round-trip through the artifact")
    // serving the trained corpus reproduces the smoothed-trained terciles
    val (c12, c1) = LmGate.countTables(corpus)
    val expected = graft.operators.DistributedRank.ntileDesc(
        LmGate.scoreSmoothed(corpus, c12, c1)
          .select(col("doc_id"), col("avg_logprob")),
        "avg_logprob", "doc_id", 3)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    spark.catalog.clearCache()
    val served = gate.bucketed(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("bucket")).toMap
    assert(served == expected)
    spark.catalog.clearCache()
    // an all-unseen serving document scores ln(1/V) per bigram — the
    // worst possible score — and lands in the tail bucket, NOT dropped
    val novel = Seq((99L, "zq zork blurp entirely novel")).toDF("doc_id", "text")
    val gatedNovel = gate.bucketed(novel).collect()
    assert(gatedNovel.length == 1 && gatedNovel.head.getAs[Int]("bucket") == 3,
      s"all-unseen doc must gate into the tail bucket: ${gatedNovel.toSeq}")
    spark.catalog.clearCache()
  }

  test("documents with only unseen bigrams drop (closed-world contract)") {
    import spark.implicits._
    val corpus = Seq((0L, "the cat sat on the mat"),
      (1L, "the dog sat on the log")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm-oov").toString
    LmGate.write(corpus, tmp)
    val gate = LmGate.load(spark, tmp)
    val serve = Seq(
      (10L, "the cat sat"),              // known bigrams -> scored
      (11L, "zq zork blurp entirely novel")) // no known bigram -> dropped
      .toDF("doc_id", "text")
    val got = gate.bucketed(serve).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == Set(10L), s"expected only doc 10 scored, got $got")
    spark.catalog.clearCache()
  }

  test("scoreKneser matches hand-computed interpolated Kneser-Ney on a tiny corpus") {
    import spark.implicits._
    val raw = Seq((0L, "a b a b c"), (1L, "a b c a"), (2L, "b c b a"))
    val docs = raw.toDF("doc_id", "text")
    // reference implementation in plain Scala over plain maps
    val bgs = raw.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).sliding(2).collect { case Array(x, y) => (id, (x, y)) } }
    val c12 = bgs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val n1f = c12.groupBy(_._1._1).map { case (k, v) => k -> v.size.toLong }
    val n1b = c12.groupBy(_._1._2).map { case (k, v) => k -> v.size.toLong }
    val np = c12.size.toLong
    val D = LmGate.KnDiscount
    def p(w1: String, w2: String): Double =
      math.max(c12((w1, w2)) - D, 0.0) / c1(w1) +
        (D * n1f(w1) / c1(w1)) * (n1b(w2).toDouble / np)
    def round(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val expect = bgs.groupBy(_._1).map { case (id, bs) =>
      val terms = bs.map { case (_, (w1, w2)) => round(math.log(p(w1, w2)), 9) }
      id -> (bs.size.toLong, round(terms.sum.toDouble / bs.size, 6).toDouble)
    }
    val (c12df, c1df) = LmGate.countTables(docs)
    val got = LmGate.scoreKneser(docs, c12df, c1df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob"))).toMap
    assert(got == expect, s"got $got expected $expect")
    spark.catalog.clearCache()
  }

  test("Kneser-Ney probabilities normalize: sum over the vocabulary is 1 per context") {
    import spark.implicits._
    val docs = Seq((0L, "the cat sat on the mat while the cat ran"),
      (1L, "a dog sat on a log and the dog ran home")).toDF("doc_id", "text")
    val (c12, c1) = LmGate.countTables(docs)
    val rows = c12.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val c1m = c1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n1f = rows.groupBy(_._1).map { case (k, v) => k -> v.length }
    val n1b = rows.groupBy(_._2).map { case (k, v) => k -> v.length }
    val np = rows.length.toDouble
    val vocab = rows.map(_._2).distinct // every word that can continue a context
    val D = LmGate.KnDiscount
    // interpolated KN's defining property: discounted mass + continuation
    // backoff is a PROPER distribution over the continuation vocabulary
    c1m.keys.foreach { w1 =>
      val mass = vocab.map { w2 =>
        val joint = rows.collectFirst { case (`w1`, `w2`, c) => c }.getOrElse(0L)
        math.max(joint - D, 0.0) / c1m(w1) +
          (D * n1f(w1) / c1m(w1)) * (n1b(w2) / np)
      }.sum
      assert(math.abs(mass - 1.0) < 1e-12, s"context '$w1' mass $mass != 1")
    }
    spark.catalog.clearCache()
  }

  test("stored KNESER gate: mode round-trips, artifact bounded by cap, serving equals from-scratch") {
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm-kn").toString
    LmGate.write(corpus, tmp, mode = LmGate.Mode.Kneser, maxBigrams = 500)
    val gate = LmGate.load(spark, tmp)
    assert(gate.mode == LmGate.Mode.Kneser && gate.maxBigrams == 500,
      "KN mode + cap must travel with the artifact")
    // the whole stored model — and the continuation marginals derived
    // from it at serve time — is bounded by the cap
    assert(gate.c12.count() <= 500 && gate.c1.count() <= 500)
    val served = gate.bucketed(batch).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_logprob"), r.getAs[Int]("bucket"))).toMap
    spark.catalog.clearCache()
    // from-scratch replay: capped tables, OOV-robust KN scoring, tercile
    // boundaries trained on the corpus under the SAME scoring
    val (c12, c1) = LmGate.cappedTables(corpus, 500)
    val bs = graft.operators.DistributedRank.boundariesDesc(
      LmGate.scoreKneserSmoothed(corpus, c12, c1)
        .select(col("doc_id"), col("avg_logprob")),
      "avg_logprob", "doc_id", 3)
    val direct = graft.operators.DistributedRank.bucketByBoundaries(
        LmGate.scoreKneserSmoothed(batch, c12, c1)
          .select(col("doc_id"), col("avg_logprob")),
        "avg_logprob", "doc_id", bs)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_logprob"), r.getAs[Int]("bucket"))).toMap
    assert(served == direct, "stored KN gate diverges from from-scratch serving")
    spark.catalog.clearCache()
  }

  test("scoreKneserSmoothed matches hand-computed OOV-robust KN: unseen bigram, context, and word") {
    import spark.implicits._
    val raw = Seq((0L, "a b a b c"), (1L, "a b c a"), (2L, "b c b a"))
    val docs = raw.toDF("doc_id", "text")
    val bgs = raw.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).sliding(2).collect { case Array(x, y) => (id, (x, y)) } }
    val c12 = bgs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val n1f = c12.groupBy(_._1._1).map { case (k, v) => k -> v.size.toLong }
    val n1b = c12.groupBy(_._1._2).map { case (k, v) => k -> v.size.toLong }
    val np = c12.size.toLong
    val v2 = c12.keys.map(_._2).toSet.size.toLong
    val D = LmGate.KnDiscount
    def pc(w2: String): Double = (n1b.getOrElse(w2, 0L) + 1).toDouble / (np + v2)
    def p(w1: String, w2: String): Double =
      if (c1.contains(w1))
        math.max(c12.getOrElse((w1, w2), 0L) - D, 0.0) / c1(w1) +
          (D * n1f(w1) / c1(w1)) * pc(w2)
      else pc(w2)
    def round(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    // serving batch exercises every OOV case: seen bigram, seen context +
    // unseen word, unseen context, and a fully novel document
    val serveRaw = Seq((10L, "a b z c q b"), (11L, "zq zork blurp"))
    val serve = serveRaw.toDF("doc_id", "text")
    val serveBgs = serveRaw.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).sliding(2).collect { case Array(x, y) => (id, (x, y)) } }
    val expect = serveBgs.groupBy(_._1).map { case (id, bs) =>
      val terms = bs.map { case (_, (w1, w2)) => round(math.log(p(w1, w2)), 9) }
      id -> (bs.size.toLong, round(terms.sum.toDouble / bs.size, 6).toDouble)
    }
    val (c12df, c1df) = LmGate.countTables(docs)
    val got = LmGate.scoreKneserSmoothed(serve, c12df, c1df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob"))).toMap
    assert(got == expect, s"got $got expected $expect")
    // per seen context the served mass stays a proper distribution over
    // the SEEN continuation vocabulary: sum_{w2 seen} Pc(w2) = 1 exactly
    val vocab = c12.keys.map(_._2).toSet
    c1.keys.foreach { w1 =>
      val mass = vocab.toSeq.map(w2 => p(w1, w2)).sum
      assert(math.abs(mass - 1.0) < 1e-12, s"context '$w1' mass $mass != 1")
    }
    spark.catalog.clearCache()
  }

  test("write refuses a capped MLE gate; load refuses an unknown scoring mode") {
    import spark.implicits._
    val docsDf = Seq((0L, "the cat sat on the mat"),
      (1L, "the dog sat on the log")).toDF("doc_id", "text")
    // capped + closed-world MLE = silent mass-reject; must not build
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm-refuse").toString
    intercept[IllegalArgumentException](
      LmGate.write(docsDf, tmp, maxBigrams = 10))
    // a mode NAME this engine doesn't know (artifact from a future
    // version) must fail loudly at load, never degrade to MLE silently
    LmGate.write(docsDf, tmp, mode = LmGate.Mode.Addone)
    val meta = spark.read.parquet(s"$tmp/meta.parquet").collect().head
    Seq(("zork", true, meta.getAs[Int]("n_buckets"), meta.getAs[Int]("max_bigrams")))
      .toDF("mode", "smoothed", "n_buckets", "max_bigrams")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta.parquet")
    val e = intercept[RuntimeException](LmGate.load(spark, tmp))
    assert(e.getMessage.contains("zork"), s"unexpected error: ${e.getMessage}")
  }

  test("q_text_pmi matches hand-computed PMI and orders by association strength") {
    import graft.ext.TextHash
    // PMI of the declared query on sf0.001 must equal ln(c12)+ln(N)-ln(c1)-ln(c2)
    // recomputed independently from raw bigram counts (no LmGate reuse here —
    // a bug in countTables would otherwise cancel out)
    val docs = Tables.documents(spark, dir)
    val bg = docs.select(
        explode(TextHash.shinglesFromTokens(TextHash.tokens(col("text")), 2)).as("b"))
      .select(split(col("b"), " ").getItem(0).as("w1"),
        split(col("b"), " ").getItem(1).as("w2"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val c12 = bg.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = bg.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val c2 = bg.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val n = bg.length.toLong
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = c12.filter(_._2 >= 5).toSeq.map { case ((w1, w2), c) =>
      (round6(math.log(c.toDouble) + math.log(n.toDouble)
        - math.log(c1(w1).toDouble) - math.log(c2(w2).toDouble)), w1, w2, c)
    }.sortBy { case (pmi, w1, w2, _) => (-pmi, w1, w2) }.take(30)
      .map { case (pmi, w1, w2, c) => (w1, w2, c, pmi) }
    val got = SparkEntry.queries("q_text_pmi")(spark, dir).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c12"), r.getAs[Double]("pmi"))).toSeq
    assert(got == expect, s"got ${got.take(5)}... expected ${expect.take(5)}...")
    spark.catalog.clearCache()
  }
}
