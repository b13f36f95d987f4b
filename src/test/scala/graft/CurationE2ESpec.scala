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
}
