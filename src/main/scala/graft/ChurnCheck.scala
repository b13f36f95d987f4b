package graft

import graft.ext.{Bm25Index, Dedup, DedupIndex, SubstringIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Append-churn scale instrument: the declared append rows prove ONE
  * batch; production is K successive batches, and the honest cost curve is
  * "probe latency after each append" — every append adds part files to the
  * touched bucket directories, so probe cost grows with FILE count even
  * when row count barely moves. This main drives 10 successive appends
  * into the band and BM25 trees, measures probe/search latency and the
  * tree's data-file count after each, then compacts and measures once more
  * — the motivating curve for the round-15 maintenance work (where
  * compaction pays is read directly off the output).
  *
  * Also runs the substring BACKFILL probe — a corpus-sized slice re-checked
  * against the stored window tree with `broadcastBatch = false` (the
  * production caller of the escape hatch: a forced broadcast would
  * materialize the slice's full window set on the driver via the DPP
  * subquery — the 100×-observed OOM) — against the same probe with the
  * default broadcast at this bounded scale, recording both times.
  *
  * Usage: `sbt "runMain graft.ChurnCheck [sfDir]"`, knobs SPARK_GRAFT_CPUS
  * / SPARK_GRAFT_REPS (min-of-reps, the ScaleCheck estimator). Prints one
  * JSON line (merged into SCALING.json as the `append_churn` block).
  */
object ChurnCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_CHURN_BATCHES", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-churn")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(fn: => Unit): Double =
      (1 to reps).map { _ =>
        spark.sparkContext.getPersistentRDDs // no-op touch
        val t0 = System.nanoTime()
        fn
        (System.nanoTime() - t0) / 1e9
      }.min

    def dataFiles(p: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).count(_.getName.endsWith(".parquet"))
    }
    def fresh(tag: String): String = {
      val d = java.nio.file.Files.createTempDirectory(s"graft-churn-$tag")
      d.toFile.deleteOnExit(); d.toString
    }
    def fmt(d: Double): String = BigDecimal(d)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

    // ---- band-index churn: write 2/12, append one /12-slice at a time ----
    val banded = Dedup.mhBandedDf(spark, sfDir).cache()
    val probeBatch = banded.filter(col("doc_id") % 101 === 0).cache()
    probeBatch.count()
    val dedupDir = fresh("dedup")
    DedupIndex.write(banded.filter(pmod(col("doc_id"), lit(12)) < 2), dedupDir)
    val dedupCurve = (0 until batches).map { i =>
      DedupIndex.append(
        banded.filter(pmod(col("doc_id"), lit(12)) === i + 2), dedupDir)
      val t = timed {
        DedupIndex.probe(DedupIndex.load(spark, dedupDir), probeBatch).count(): Unit
      }
      (t, dataFiles(dedupDir))
    }
    val tDedupCompact = timed { DedupIndex.compact(spark, dedupDir) }
    val dedupAfter = (
      timed { DedupIndex.probe(DedupIndex.load(spark, dedupDir), probeBatch).count(): Unit },
      dataFiles(dedupDir))

    // ---- BM25 churn: same slicing, search latency after each append ----
    val docs = Tables.documents(spark, sfDir)
    val terms = Seq("vector", "stream", "window", "merge")
    val bmDir = fresh("bm25")
    Bm25Index.write(docs.filter(pmod(col("doc_id"), lit(12)) < 2), bmDir)
    val bmCurve = (0 until batches).map { i =>
      Bm25Index.append(
        docs.filter(pmod(col("doc_id"), lit(12)) === i + 2), bmDir)
      val t = timed {
        Bm25Index.search(Bm25Index.load(spark, bmDir), terms, 20).collect(): Unit
      }
      (t, dataFiles(s"$bmDir/postings.parquet"))
    }
    val tBmCompact = timed { Bm25Index.compact(spark, bmDir) }
    val bmAfter = (
      timed { Bm25Index.search(Bm25Index.load(spark, bmDir), terms, 20).collect(): Unit },
      dataFiles(s"$bmDir/postings.parquet"))

    // ---- substring backfill: corpus-sized re-check, both join modes ----
    val subDir = fresh("substr")
    SubstringIndex.write(docs.filter(col("doc_id") % 2 === 0), subDir)
    val subIdx = SubstringIndex.load(spark, subDir)
    val backfill = docs.filter(col("doc_id") % 2 =!= 0)
    val tNoBc = timed {
      SubstringIndex.probe(subIdx, backfill, broadcastBatch = false).count(): Unit
    }
    val tBc = timed {
      SubstringIndex.probe(subIdx, backfill).count(): Unit
    }

    def curveJson(c: Seq[(Double, Int)]): String =
      c.map { case (t, f) => s"""{"sec":${fmt(t)},"files":$f}""" }
        .mkString("[", ",", "]")
    println(
      s"""{"kind":"append_churn","sf":"$sfDir","reps":$reps,"stat":"min",""" +
      s""""batches":$batches,""" +
      s""""dedup":{"after_each_append":${curveJson(dedupCurve)},""" +
      s""""compact_sec":${fmt(tDedupCompact)},""" +
      s""""after_compact":{"sec":${fmt(dedupAfter._1)},"files":${dedupAfter._2}}},""" +
      s""""bm25":{"after_each_append":${curveJson(bmCurve)},""" +
      s""""compact_sec":${fmt(tBmCompact)},""" +
      s""""after_compact":{"sec":${fmt(bmAfter._1)},"files":${bmAfter._2}}},""" +
      s""""substr_backfill":{"no_broadcast_sec":${fmt(tNoBc)},"broadcast_sec":${fmt(tBc)}}}""")
    spark.stop()
  }
}
