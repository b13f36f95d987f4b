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
    LmGate.write(docs, tmp, smoothed = true, maxBigrams = 500)
    val gate = LmGate.load(spark, tmp)
    assert(gate.smoothed && gate.maxBigrams == 500,
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
    LmGate.write(docsDf, tmp, smoothed = true)
    assert(LmGate.load(spark, tmp).smoothed, "smoothed mode must travel with the artifact")
    // pre-meta artifact (genuine absence): MLE fallback
    val metaDir = java.nio.file.Paths.get(tmp, "meta.parquet")
    val backup = java.nio.file.Paths.get(tmp, "meta.parquet.bak")
    java.nio.file.Files.move(metaDir, backup)
    assert(!LmGate.load(spark, tmp).smoothed, "absent meta must read as pre-meta MLE artifact")
    // corrupt meta (present but unreadable): must THROW, not degrade to MLE
    java.nio.file.Files.move(backup, metaDir)
    val part = java.nio.file.Files.list(metaDir).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    java.nio.file.Files.write(part, "not a parquet file".getBytes)
    intercept[Exception](LmGate.load(spark, tmp).smoothed)
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
    LmGate.write(corpus, tmp, smoothed = true)
    val gate = LmGate.load(spark, tmp)
    assert(gate.smoothed, "scoring mode must round-trip through the artifact")
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
}
