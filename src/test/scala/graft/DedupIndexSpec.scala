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
}
