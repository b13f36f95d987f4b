package graft

import graft.ext.{AnnIndex, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The IVF-PQ index at rest: the docstring claim "stored partitioned by
  * cid, so probing maps to partition pruning" made executable. Results
  * from the stored index must equal the in-memory operator, and the scan
  * must actually prune — dynamically under the probe join, statically
  * under a literal cell predicate.
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("stored index equals the in-memory operator and prunes partitions") {
    val dir = Files.createTempDirectory("graft-annidx").toString
    val c = corpus.cache()
    val cents = Similarity.centroidSet(c, 10)
    val cb = Similarity.pqCodebook(c)
    AnnIndex.write(c, cents, cb, dir)

    val index = AnnIndex.load(spark, dir, cents, cb)
    // a stale tree (different training artifacts) is refused by name
    val retrained = Similarity.refineCentroids(c, cents, rounds = 1)
    val e = intercept[IllegalArgumentException](
      AnnIndex.load(spark, dir, retrained, cb))
    assert(e.getMessage.contains("ANN index"))
    // one directory per cell on disk
    val cells = index.select("cid").distinct().count()
    val dirs = new java.io.File(dir).listFiles().count(_.getName.startsWith("cid="))
    assert(dirs == cells, s"$dirs cell dirs for $cells cells")

    // probing the stored index reproduces the in-memory plan's results
    val probeVecs = c.filter(col("vec_id") < 8)
    val fromDisk = AnnIndex.probe(index, probeVecs, cents, cb, nprobe = 2, k = 3)
    val inMemory = Similarity.ivfPqTopKWith(c, cents, cb, col("vec_id") < 8, 2, 3)
    assert(fromDisk.exceptAll(inMemory).isEmpty && inMemory.exceptAll(fromDisk).isEmpty,
      "stored-index probe diverges from the in-memory operator")

    // dynamic partition pruning: the probe join plants a runtime partition
    // filter on the index scan — only probed cell directories are read
    val dpPlan = {
      val df = AnnIndex.probe(index, probeVecs, cents, cb, 2, 3)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(dpPlan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the index scan:\n${dpPlan.take(2000)}")

    // static pruning: a literal cell predicate shows up as PartitionFilters
    // the partition column reads back as the narrowest inferred type
    // (int for small cell ids) — normalize via Number
    val someCids = index.select("cid").distinct().limit(2)
      .collect().map(_.getAs[Number](0).longValue).toSeq
    val stPlan = AnnIndex.probeCells(index, someCids)
      .queryExecution.executedPlan.toString
    assert(stPlan.contains("PartitionFilters: [cid"),
      s"expected static partition filters:\n${stPlan.take(2000)}")
    c.unpersist()
  }

  test("append: write(base) + append(batch) serves exactly write(base ∪ batch)") {
    val dir = Files.createTempDirectory("graft-annapp").toString
    val full = Files.createTempDirectory("graft-annfull").toString
    val c = corpus.cache()
    val cents = Similarity.centroidSet(c, 10)
    val cb = Similarity.pqCodebook(c)

    AnnIndex.write(c.filter(col("vec_id") % 2 === 0), cents, cb, dir)
    // base part files must survive the append untouched (ingest is
    // O(batch), not an index rewrite)
    def dataFiles(d: String): Set[String] = {
      val root = new java.io.File(d)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).map(_.getPath).filter(_.endsWith(".parquet")).toSet
    }
    val baseFiles = dataFiles(dir)
    AnnIndex.append(c.filter(col("vec_id") % 2 =!= 0), cents, cb, dir)
    assert(baseFiles.subsetOf(dataFiles(dir)),
      "append rewrote base part files — ingest must be O(batch)")

    // the merged tree is indistinguishable from a from-scratch build
    AnnIndex.write(c, cents, cb, full)
    val probeVecs = c.filter(col("vec_id") < 8)
    val appended = AnnIndex.probe(AnnIndex.load(spark, dir, cents, cb),
                                  probeVecs, cents, cb, nprobe = 2, k = 3)
    val scratch = AnnIndex.probe(AnnIndex.load(spark, full, cents, cb),
                                 probeVecs, cents, cb, nprobe = 2, k = 3)
    assert(appended.exceptAll(scratch).isEmpty && scratch.exceptAll(appended).isEmpty,
      "appended tree diverges from the from-scratch build")

    // appending under retrained artifacts is refused BEFORE bad rows land
    val retrained = Similarity.refineCentroids(c, cents, rounds = 1)
    val before = dataFiles(dir)
    val e = intercept[IllegalArgumentException](
      AnnIndex.append(c.filter(col("vec_id") % 2 =!= 0), retrained, cb, dir))
    assert(e.getMessage.contains("refusing to append"))
    assert(dataFiles(dir) == before, "refused append still wrote rows")
    c.unpersist()
  }
}
