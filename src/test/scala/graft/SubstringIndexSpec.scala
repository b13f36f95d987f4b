package graft

import graft.ext.{SubstringDedup, SubstringIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The substring window index at rest: probing the stored index must equal
  * the in-memory cross-corpus span scan, and the probe must actually prune
  * the stored scan (dynamic partition pruning from the broadcast batch) —
  * the SubstringDedup counterpart of DedupIndexSpec.
  */
class SubstringIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"

  test("stored window index equals the in-memory cross-corpus scan and prunes") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val batch = docs.filter(col("doc_id") % 7 === 0)
    val dir = Files.createTempDirectory("graft-subidx").toString

    SubstringIndex.write(corpus, dir)
    val index = SubstringIndex.load(spark, dir)

    // layout: bucket directories with one chunky file each
    val bucketDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket=")).toSeq
    assert(bucketDirs.nonEmpty, "no bucket= directories written")

    // stored probe ≡ in-memory cross-corpus span scan
    val fromDisk = SubstringIndex.probe(index, batch)
    val inMemory = SubstringDedup.crossCorpusSpans(batch, corpus)
    assert(fromDisk.exceptAll(inMemory).isEmpty && inMemory.exceptAll(fromDisk).isEmpty,
      "stored-index probe diverges from crossCorpusSpans")
    // and it finds something at this sf (non-vacuous equivalence)
    assert(fromDisk.count() > 0, "fixture produced no cross-corpus spans")

    // dynamic partition pruning: the broadcast batch plants a runtime
    // partition filter on the index scan
    val dpPlan = {
      val df = SubstringIndex.probe(index, batch)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(dpPlan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the index scan:\n${dpPlan.take(2000)}")
  }

  test("append: probing the appended tree equals a from-scratch rebuild, double-append safe") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val batch = docs.filter(col("doc_id") % 7 === 0)
    val dir = Files.createTempDirectory("graft-subapp").toString
    val full = Files.createTempDirectory("graft-subfull").toString

    val a = corpus.filter(col("doc_id") % 2 === 0)
    val b = corpus.filter(col("doc_id") % 2 =!= 0)
    SubstringIndex.write(a, dir)
    def dataFiles(p: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).map(_.getPath).filter(_.endsWith(".parquet")).toSet
    }
    val baseFiles = dataFiles(dir)
    // append the second half TWICE — the at-least-once replay plants
    // guaranteed duplicate window keys; span output must not change
    SubstringIndex.append(b, dir)
    SubstringIndex.append(b, dir)
    assert(baseFiles.subsetOf(dataFiles(dir)),
      "append rewrote base part files — ingest must be O(batch)")

    SubstringIndex.write(corpus, full)
    val appended = SubstringIndex.probe(SubstringIndex.load(spark, dir), batch)
    val scratch = SubstringIndex.probe(SubstringIndex.load(spark, full), batch)
    assert(appended.exceptAll(scratch).isEmpty && scratch.exceptAll(appended).isEmpty,
      "appended-tree probe diverges from the from-scratch rebuild")
    assert(appended.count() > 0, "fixture produced no spans — vacuous parity")

    // appending under a mismatched layout is refused before rows land
    val before = dataFiles(dir)
    val e = intercept[IllegalArgumentException](
      SubstringIndex.append(b, dir, sample = 4))
    assert(e.getMessage.contains("refusing to append"))
    assert(dataFiles(dir) == before, "refused append still wrote rows")
  }

  test("sampled mode: index and probe stay consistent (content-defined both sides)") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val batch = docs.filter(col("doc_id") % 7 === 0)
    val dir = Files.createTempDirectory("graft-subidx-s").toString
    SubstringIndex.write(corpus, dir, sample = 4)
    // the layout parameters are part of the load contract now: loading a
    // sample=4 tree at the default sample must refuse, not silently
    // probe half-empty
    val eMismatch = intercept[IllegalArgumentException](
      SubstringIndex.load(spark, dir))
    assert(eMismatch.getMessage.contains("sample=1"))
    val index = SubstringIndex.load(spark, dir, sample = 4)
    val fromDisk = SubstringIndex.probe(index, batch, sample = 4)
    val inMemory = SubstringDedup.crossCorpusSpans(batch, corpus, sample = 4)
    assert(fromDisk.exceptAll(inMemory).isEmpty && inMemory.exceptAll(fromDisk).isEmpty,
      "sampled stored-index probe diverges from sampled crossCorpusSpans")
  }

  test("bucket fan survives mod-sampling (sample = buckets power of two)") {
    // mod-sampling keeps h1 ≡ 0 (mod s); a bucket of plain h1 mod buckets
    // was fully correlated with it — sample = buckets = 16 funneled the
    // whole index into bucket=0 (one writer, nothing prunable). The murmur
    // mix must spread the sampled keys across (nearly) the full fan.
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val dir = Files.createTempDirectory("graft-subidx-fan").toString
    SubstringIndex.write(corpus, dir, sample = 16, buckets = 16)
    val bucketDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket=")).toSeq
    assert(bucketDirs.length > 8,
      s"sampled index collapsed to ${bucketDirs.length} of 16 buckets")
  }

  test("load refuses a tree without the bucketing-version marker") {
    // write/probe derive the bucket independently; a tree written under a
    // different bucket function probes to ZERO hits with no error — the
    // marker turns that silent miss into a loud load failure
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val dir = Files.createTempDirectory("graft-subidx-ver").toString
    SubstringIndex.write(corpus, dir)
    val marker = new java.io.File(dir,
      SubstringIndex.markerOf(graft.ext.SubstringDedup.K, 1, SubstringIndex.Buckets))
    assert(marker.isFile, "write() must stamp the bucketing marker")
    assert(marker.delete())
    val e = intercept[IllegalArgumentException](SubstringIndex.load(spark, dir))
    assert(e.getMessage.contains("bucket-function"),
      s"marker-less load must explain the stale-layout risk: ${e.getMessage}")
  }
}
