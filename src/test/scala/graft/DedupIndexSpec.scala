package graft

import graft.ext.{Dedup, DedupIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The MinHash band index at rest: the docstring claim "stored partitioned
  * by (band, bucket), so probing maps to partition pruning" made
  * executable — the dedup counterpart of AnnIndexSpec. Probing the stored
  * index must equal the in-memory band join, and the scan must actually
  * prune: dynamically under the probe join, statically under a literal
  * band predicate.
  */
class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"

  test("stored band index equals the in-memory join and prunes partitions") {
    val banded = Dedup.mhBandedDf(spark, sf).cache()
    try {
      val dir = Files.createTempDirectory("graft-dedupidx").toString
      val corpus = banded.filter(col("doc_id") % 2 === 0)
      val batch = banded.filter(col("doc_id") % 2 === 1)
      DedupIndex.write(corpus, dir)
      val index = DedupIndex.load(spark, dir)

      // layout: band directories, bucket directories inside them
      val bandDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("band=")).toSeq
      assert(bandDirs.nonEmpty, "no band= directories written")
      assert(bandDirs.forall(_.listFiles().exists(_.getName.startsWith("bucket="))),
        "band directories missing bucket= subdirectories")

      // the stored probe reproduces the in-memory band join
      val fromDisk = DedupIndex.probe(index, batch)
      val inMemory = batch
        .join(corpus.select("band", "key").distinct(), Seq("band", "key"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_bands_hit"))
      assert(fromDisk.exceptAll(inMemory).isEmpty && inMemory.exceptAll(fromDisk).isEmpty,
        "stored-index probe diverges from the in-memory join")

      // dynamic partition pruning: the broadcast batch plants a runtime
      // partition filter on the index scan — only the batch's
      // (band, bucket) directories are read
      val dpPlan = {
        val df = DedupIndex.probe(index, batch)
        df.collect()
        df.queryExecution.executedPlan.toString
      }
      assert(dpPlan.contains("dynamicpruning"),
        s"expected dynamic partition pruning on the index scan:\n${dpPlan.take(2000)}")

      // static pruning: a literal band predicate shows up as PartitionFilters
      val stPlan = DedupIndex.probeBand(index, 0)
        .queryExecution.executedPlan.toString
      assert(stPlan.contains("PartitionFilters: [") && stPlan.contains("band"),
        s"expected static partition filters on band:\n${stPlan.take(2000)}")
    } finally { banded.unpersist(); () }
  }

  test("append: probing the appended tree equals a from-scratch rebuild, even with duplicate keys") {
    val banded = Dedup.mhBandedDf(spark, sf).cache()
    try {
      val dir = Files.createTempDirectory("graft-dedupapp").toString
      val full = Files.createTempDirectory("graft-dedupfull").toString
      val a = banded.filter(col("doc_id") % 3 === 0)
      val b = banded.filter(col("doc_id") % 3 === 1)
      val probe = banded.filter(col("doc_id") % 3 === 2)

      DedupIndex.write(a, dir)
      def dataFiles(p: String): Set[String] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(p)).map(_.getPath).filter(_.endsWith(".parquet")).toSet
      }
      val baseFiles = dataFiles(dir)
      // append the SECOND slice TWICE: an at-least-once replay plants
      // guaranteed duplicate keys in the tree — probe must still count
      // each hit band once
      DedupIndex.append(b, dir)
      DedupIndex.append(b, dir)
      assert(baseFiles.subsetOf(dataFiles(dir)),
        "append rewrote base part files — ingest must be O(batch)")

      DedupIndex.write(a.unionByName(b), full)
      val appended = DedupIndex.probe(DedupIndex.load(spark, dir), probe)
      val scratch = DedupIndex.probe(DedupIndex.load(spark, full), probe)
      assert(appended.exceptAll(scratch).isEmpty && scratch.exceptAll(appended).isEmpty,
        "appended-tree probe diverges from the from-scratch rebuild")

      // pruning survives the append: the probe join still plants a
      // runtime partition filter on the (now multi-file) index scan
      val plan = {
        val df = DedupIndex.probe(DedupIndex.load(spark, dir), probe)
        df.collect()
        df.queryExecution.executedPlan.toString
      }
      assert(plan.contains("dynamicpruning"),
        s"appended tree lost dynamic partition pruning:\n${plan.take(2000)}")

      // appending into an unstamped dir is refused before rows land
      val bare = Files.createTempDirectory("graft-dedupbare").toString
      val e = intercept[IllegalArgumentException](DedupIndex.append(b, bare))
      assert(e.getMessage.contains("refusing to append"))
    } finally { banded.unpersist(); () }
  }
}
