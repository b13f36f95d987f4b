package graft

import graft.ext.{Bm25, Bm25Index}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The BM25 inverted index at rest: stored-index serving must be
  * bit-identical to the from-scratch operator, the postings scan must
  * actually prune to the query's term buckets, and a tree written under a
  * different bucket fan must be refused loudly (the silent-miss class the
  * IndexVersion markers exist for).
  */
class Bm25IndexSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("stored-index search equals the from-scratch operator, prunes, and refuses a fan mismatch") {
    val dir = Files.createTempDirectory("graft-bm25idx").toString
    val d = docs.cache()
    Bm25Index.write(d, dir)
    val idx = Bm25Index.load(spark, dir)

    // bit-identical to the from-scratch operator over the same corpus —
    // including a term ABSENT from the corpus (no postings row, no idf
    // row, contributes nothing in either path)
    val terms = Seq("join", "scan", "sort", "quantum")
    val stored = Bm25Index.search(idx, terms, 20)
    val scratch = Bm25.search(d, terms, 20)
    assert(stored.exceptAll(scratch).isEmpty && scratch.exceptAll(stored).isEmpty,
      "stored-index search diverges from Bm25.search")

    // a single-term query must still rank (df from the pruned bucket)
    val one = Bm25Index.search(idx, Seq("join"), 5)
    val oneScratch = Bm25.search(d, Seq("join"), 5)
    assert(one.exceptAll(oneScratch).isEmpty && oneScratch.exceptAll(one).isEmpty)

    // the plan-time bucket computation must agree with the engine-written
    // column for every indexed term — catalyst-eval drift here would make
    // probes read the wrong directory and silently miss
    val engineBuckets = idx.postings.select("t", "tb").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    engineBuckets.foreach { case (t, tb) =>
      assert(Bm25Index.bucketOf(t, Bm25Index.Buckets) == tb,
        s"bucketOf('$t') diverges from the stored row's bucket")
    }

    // static partition pruning: the plan-time literal `tb IN (…)` reaches
    // the postings scan as PartitionFilters — unprobed bucket directories
    // are never listed
    val pruned = {
      val df = Bm25Index.search(idx, terms, 20)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(pruned.contains("PartitionFilters: [") &&
        "PartitionFilters: \\[[^\\]]*tb".r.findFirstIn(pruned).isDefined,
      s"expected a static tb partition filter on the postings scan:\n${pruned.take(2000)}")

    // a tree written under a different fan is refused by marker name —
    // probing it would hash terms to the wrong directories and silently
    // miss every posting
    val e = intercept[IllegalArgumentException](
      Bm25Index.load(spark, dir, buckets = 32))
    assert(e.getMessage.contains("BM25 postings index"))
    d.unpersist()
  }

  test("an all-absent term set returns zero rows, not an error") {
    val dir = Files.createTempDirectory("graft-bm25idx0").toString
    Bm25Index.write(docs, dir)
    val idx = Bm25Index.load(spark, dir)
    assert(Bm25Index.search(idx, Seq("qqq_nope", "zzz_absent"), 5).count() == 0)
  }

  test("append: write(base) + append(batch) serves exactly write(base ∪ batch)") {
    val dir = Files.createTempDirectory("graft-bm25app").toString
    val full = Files.createTempDirectory("graft-bm25full").toString
    val d = docs.cache()
    Bm25Index.write(d.filter(col("doc_id") % 2 === 0), dir)

    // base part files survive the append untouched — ingest is O(batch)
    def dataFiles(p: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$p/postings.parquet"))
        .map(_.getPath).filter(_.endsWith(".parquet")).toSet
    }
    val baseFiles = dataFiles(dir)
    Bm25Index.append(d.filter(col("doc_id") % 2 =!= 0), dir)
    assert(baseFiles.subsetOf(dataFiles(dir)),
      "append rewrote base postings files — ingest must be O(batch)")

    // the merged tree's scalars and scores are bit-identical to a
    // from-scratch build over the union (additive integer scalars)
    Bm25Index.write(d, full)
    val appended = Bm25Index.load(spark, dir)
    val scratch = Bm25Index.load(spark, full)
    assert(appended.n == scratch.n && appended.avgdl == scratch.avgdl,
      s"appended scalars (${appended.n}, ${appended.avgdl}) != " +
        s"from-scratch (${scratch.n}, ${scratch.avgdl})")
    val terms = Seq("hash", "batch", "filter")
    val a = Bm25Index.search(appended, terms, 20)
    val f = Bm25Index.search(scratch, terms, 20)
    assert(a.exceptAll(f).isEmpty && f.exceptAll(a).isEmpty,
      "appended-tree search diverges from the from-scratch build")
    // ... and from the from-scratch OPERATOR over the union corpus
    val op = Bm25.search(d, terms, 20)
    assert(a.exceptAll(op).isEmpty && op.exceptAll(a).isEmpty,
      "appended-tree search diverges from Bm25.search")

    // appending under a mismatched fan is refused BEFORE rows land
    val before = dataFiles(dir)
    val e = intercept[IllegalArgumentException](
      Bm25Index.append(d, dir, buckets = 32))
    assert(e.getMessage.contains("refusing to append"))
    assert(dataFiles(dir) == before, "refused append still wrote rows")
    d.unpersist()
  }
}
