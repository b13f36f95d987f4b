package graft

import graft.ext.{Dedup, DedupIndex, LmGate, Pipeline, StoredArtifacts, SubstringIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed pipeline's internal contracts — the pieces the driver's
  * q_pipeline_stored oracle checks only in aggregate:
  *
  *  - the persisted admission DECISION equals a fresh re-derivation
  *    against the pre-append trees (the decision artifact exists exactly
  *    because deriving it lazily against the post-append tree silently
  *    shrinks it — this spec pins that the recorded set is the pre-append
  *    truth, by rebuilding the pre-append state separately);
  *  - the shard tree honors the writer contract (one file per shard dir,
  *    in-file row order = curriculum position order);
  *  - admission is non-vacuous at fixture scale: every gate drops
  *    somebody and somebody survives all three.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"

  test("recorded admission decision = fresh pre-append derivation; shards honor the writer contract") {
    // force the build (memoized — the declared query path)
    SparkEntry.queries("q_pipeline_stored")(spark, sf).collect()
    val root = StoredArtifacts.of(s"pipeline|$sf")(_ =>
      fail("pipeline artifact should already exist"))

    val docs = Tables.documents(spark, sf)
    val isBatch = col("doc_id") % 4 === 3 && col("doc_id") < Pipeline.BatchIdBound
    val corpus = docs.filter(!isBatch)
    val batch = docs.filter(isBatch)

    // fresh PRE-append state in its own directories
    val pre = java.nio.file.Files.createTempDirectory("graft-pipe-pre").toString
    val banded = Dedup.mhBandedDf(spark, sf).cache()
    try {
      DedupIndex.write(banded.filter(!isBatch), s"$pre/dedup")
      SubstringIndex.write(corpus, s"$pre/substr")
      val gate = LmGate.load(spark, s"$root/gate")
      val qIds = gate.bucketed(batch).filter(col("bucket") <= 2).select("doc_id")
      val dup = DedupIndex.probe(DedupIndex.load(spark, s"$pre/dedup"),
        banded.filter(isBatch).join(qIds, Seq("doc_id"))).select("doc_id")
      val dirty = SubstringIndex.probe(SubstringIndex.load(spark, s"$pre/substr"),
        batch.join(qIds, Seq("doc_id"))).select("doc_id").distinct()
      val fresh = qIds
        .join(dup, Seq("doc_id"), "left_anti")
        .join(dirty, Seq("doc_id"), "left_anti")
        .collect().map(_.getLong(0)).toSet
      val recorded = spark.read.parquet(s"$root/admitted1.parquet")
        .collect().map(_.getLong(0)).toSet
      assert(recorded == fresh,
        "persisted admission decision diverges from the pre-append derivation")

      // non-vacuous: every gate did work and somebody survived
      val nBatch = batch.count()
      val nQ = qIds.count()
      assert(nQ > 0 && nQ < nBatch, s"quality gate vacuous: $nQ of $nBatch")
      assert(dup.count() > 0, "novelty gate vacuous: no band hits at fixture scale")
      assert(dirty.count() > 0, "decontam gate vacuous: no window hits at fixture scale")
      assert(recorded.nonEmpty, "nothing admitted — downstream stages vacuous")
    } finally { banded.unpersist(); () }

    // writer contract on the shipped epoch: one file per shard, in-file
    // order = curriculum position order (single small file => single
    // input split => scan preserves row order)
    (0 until Pipeline.Shards).foreach { i =>
      val dir = new java.io.File(s"$root/shards/epoch1/shard=$i")
      assert(dir.isDirectory, s"missing shard dir $i")
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $i should be ONE file, got ${files.length}")
      val pos = spark.read.parquet(files.head.getPath)
        .select("pos").collect().map(_.getLong(0)).toSeq
      assert(pos == pos.sorted, s"shard $i rows not in curriculum position order")
    }
  }

  test("cycles: cycle-2 rejections exist that are attributable ONLY to cycle-1's fold") {
    // The q_pipeline_cycles oracle proves the two-cycle semantics in
    // aggregate; this pins that the interesting case is NON-VACUOUS at
    // the driver's gate scale — some cycle-2 document is rejected because
    // of what cycle 1 APPENDED (its band keys / windows exist nowhere in
    // the original corpus), i.e. the loop really feeds forward. Run at
    // sf0.01: the cross-cycle near-dup pairs exist there (the
    // Cycle2Start doc makes sure of it), not at sf0.001.
    val sf01 = "/root/testdata/sf0.01"
    SparkEntry.queries("q_pipeline_cycles")(spark, sf01).collect()
    val root = StoredArtifacts.of(s"pipeline-cycles|$sf01")(_ =>
      fail("pipeline-cycles artifact should already exist"))

    val docs = Tables.documents(spark, sf01)
    val isB2 = col("doc_id") % 4 === 3 &&
      col("doc_id") >= Pipeline.Cycle2Start &&
      col("doc_id") < Pipeline.BatchIdBound
    val corpusPred = !(col("doc_id") % 4 === 3 &&
      col("doc_id") < Pipeline.BatchIdBound)
    val batch2 = docs.filter(isB2)
    val banded = Dedup.mhBandedDf(spark, sf01).cache()
    try {
      // the cycles row is the dedup-gated ingest variant: EVERY batch-2
      // doc is probed (quality belongs to the curriculum gate there)
      val q2 = batch2.select("doc_id").cache()
      // what cycle 2 would have rejected against the ORIGINAL corpus only
      val pre = java.nio.file.Files.createTempDirectory("graft-cyc-pre").toString
      DedupIndex.write(banded.filter(corpusPred), s"$pre/dedup")
      SubstringIndex.write(docs.filter(corpusPred), s"$pre/substr")
      val dupC = DedupIndex.probe(DedupIndex.load(spark, s"$pre/dedup"),
        banded.filter(isB2).join(q2, Seq("doc_id")))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val dirtyC = SubstringIndex.probe(SubstringIndex.load(spark, s"$pre/substr"),
        batch2.join(q2, Seq("doc_id")))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val q2Ids = q2.collect().map(_.getLong(0)).toSet
      val admitted2 = spark.read.parquet(s"$root/admitted2.parquet")
        .collect().map(_.getLong(0)).toSet
      val rejectedByFoldOnly = q2Ids -- admitted2 -- dupC -- dirtyC
      assert(rejectedByFoldOnly.nonEmpty,
        "no cycle-2 rejection is attributable to cycle-1's appends — the " +
          "feed-forward case is vacuous at this scale; adjust Cycle2Start")
      q2.unpersist()
    } finally { banded.unpersist(); () }
  }

  test("maint: the mid-loop compaction trigger fires and is invisible to every cycle's recorded admission") {
    // q_pipeline_maint shares q_pipeline_cycles' exact replay oracle — the
    // driver proves the END state matches; this pins the two internal
    // claims the oracle can't see: (a) the fragmentation trigger actually
    // FIRED between the cycles (a no-op maintenance pass would be a
    // vacuous row), with the dedup churn counters recorded at fire time,
    // and (b) the recorded per-cycle admission decisions are bit-identical
    // with and without the mid-loop compaction — maintenance is invisible
    // to admission, not just to the final report.
    val sf01 = "/root/testdata/sf0.01"
    SparkEntry.queries("q_pipeline_cycles")(spark, sf01).collect()
    SparkEntry.queries("q_pipeline_maint")(spark, sf01).collect()
    val cyc = StoredArtifacts.of(s"pipeline-cycles|$sf01")(_ =>
      fail("pipeline-cycles artifact should already exist"))
    val mnt = StoredArtifacts.of(s"pipeline-maint|$sf01")(_ =>
      fail("pipeline-maint artifact should already exist"))

    val log = spark.read.parquet(s"$mnt/maint_log.parquet").collect()
    assert(log.nonEmpty, "maintenance pass left no audit log")
    assert(log.exists(_.getAs[Boolean]("compacted")),
      "no tree crossed the fragmentation threshold — the maintenance row is vacuous")
    log.filter(r => r.getAs[Boolean]("compacted")).foreach { r =>
      assert(r.getAs[Int]("max_files_per_leaf") > 1,
        s"${r.getAs[String]("tree")}: compacted without a fragmentation signal")
    }
    log.filter(r => r.getAs[String]("tree") == "dedup" &&
        r.getAs[Boolean]("compacted")).foreach { r =>
      assert(r.getAs[Long]("n_rows") >= r.getAs[Long]("n_keys") &&
        r.getAs[Long]("n_keys") > 0,
        "dedup churn counters not recorded at fire time")
    }

    for (i <- 1 to 2) {
      val a = spark.read.parquet(s"$cyc/admitted$i.parquet")
        .collect().map(_.getLong(0)).toSet
      val b = spark.read.parquet(s"$mnt/admitted$i.parquet")
        .collect().map(_.getLong(0)).toSet
      assert(a == b, s"cycle-$i admission diverged under mid-loop maintenance")
    }
  }

  test("refresh: the re-fit gate changes the curriculum (non-vacuous) while admission stays frozen") {
    // q_pipeline_refresh's oracle proves the refreshed-gate curriculum is
    // the one a from-scratch re-train derives; this pins the two claims
    // the oracle alone can't distinguish from the unrefreshed row: (a)
    // the ADMISSION decision is identical to q_pipeline_stored's (the
    // batch was gated by the artifact frozen at arrival — refresh must
    // not rewrite history), and (b) the refresh actually MOVED the
    // curriculum at the driver's gate scale (some shard's permutation
    // signature differs) — otherwise the row would pass vacuously even
    // if refresh() were a no-op.
    val sf01 = "/root/testdata/sf0.01"
    val stored = SparkEntry.queries("q_pipeline_stored")(spark, sf01)
      .collect().map(r => r.getAs[Int]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("order_sig"))).toMap
    val refreshed = SparkEntry.queries("q_pipeline_refresh")(spark, sf01)
      .collect().map(r => r.getAs[Int]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("order_sig"))).toMap

    val sroot = StoredArtifacts.of(s"pipeline|$sf01")(_ =>
      fail("pipeline artifact should already exist"))
    val rroot = StoredArtifacts.of(s"pipeline-refresh|$sf01")(_ =>
      fail("pipeline-refresh artifact should already exist"))
    val a = spark.read.parquet(s"$sroot/admitted1.parquet")
      .collect().map(_.getLong(0)).toSet
    val b = spark.read.parquet(s"$rroot/admitted1.parquet")
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "gate refresh must not rewrite the recorded admission")

    assert(stored.keySet == refreshed.keySet)
    assert(stored.values.map(_._1).sum == refreshed.values.map(_._1).sum,
      "refresh changed the corpus size — it must only re-phase")
    assert(stored != refreshed,
      "the refreshed gate produced the identical curriculum permutation — " +
        "the refresh row is vacuous at this scale")
  }
}
