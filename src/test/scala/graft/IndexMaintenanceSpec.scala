package graft

import graft.ext.{AnnIndex, Bm25Index, Dedup, DedupIndex, Similarity, SubstringDedup, SubstringIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The maintenance half of the at-rest index lifecycle, across all four
  * families: compaction collapses the part files (and duplicate keys) K
  * appends accumulate, rebucketing migrates a tree to a new partition fan,
  * and both serve bit-for-bit what the pre-maintenance tree served — with
  * the crash-safe staging/retire swap ([[graft.ext.IndexMaintenance]])
  * proven by simulating the stranded states directly. Plus the
  * Bm25Index.fsck detect-and-repair of the append crash window (postings
  * landed, scalar fold lost).
  */
class IndexMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"

  private def dataFiles(p: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(p)).map(_.getPath).filter(_.endsWith(".parquet")).toSet
  }

  /** Every leaf partition directory under `p` holds exactly one data file
    * — the post-compaction layout (and write()'s own, via the pre-write
    * repartition on the partition columns).
    */
  private def leavesAreChunky(p: String): Boolean = {
    def leaves(f: java.io.File): Seq[java.io.File] = {
      val subs = f.listFiles().filter(_.isDirectory)
      if (subs.isEmpty) Seq(f) else subs.toSeq.flatMap(leaves)
    }
    leaves(new java.io.File(p)).forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1)
  }

  test("DedupIndex: compact collapses appended files + duplicate keys, probe parity holds") {
    val banded = Dedup.mhBandedDf(spark, sf).cache()
    try {
      val dir = Files.createTempDirectory("graft-dedupcomp").toString
      val a = banded.filter(col("doc_id") % 3 === 0)
      val b = banded.filter(col("doc_id") % 3 === 1)
      val probe = banded.filter(col("doc_id") % 3 === 2)
      DedupIndex.write(a, dir)
      DedupIndex.append(b, dir)
      DedupIndex.append(b, dir) // replay → guaranteed duplicate keys on disk
      val before = DedupIndex.probe(DedupIndex.load(spark, dir), probe)
        .orderBy("doc_id").collect().toSeq
      assert(!leavesAreChunky(dir), "appends should fragment some leaf dir")

      DedupIndex.compact(spark, dir)
      assert(leavesAreChunky(dir), "compaction must leave one file per leaf")
      val idx = DedupIndex.load(spark, dir)
      // duplicate keys are gone: the tree is distinct again (streaming-safe)
      assert(idx.count() ==
        idx.select("band", "k1", "k2").distinct().count(),
        "compaction must collapse cross-batch duplicate keys")
      val after = DedupIndex.probe(idx, probe).orderBy("doc_id").collect().toSeq
      assert(after == before, "probe-after-compact diverged from probe-before")

      // pruning still holds on the compacted tree
      val plan = {
        val df = DedupIndex.probe(DedupIndex.load(spark, dir), probe)
        df.collect(); df.queryExecution.executedPlan.toString
      }
      assert(plan.contains("dynamicpruning"),
        s"compacted tree lost dynamic partition pruning:\n${plan.take(1500)}")
    } finally { banded.unpersist(); () }
  }

  test("DedupIndex: rebucket(16→32) serves identically; the old fan is refused") {
    val banded = Dedup.mhBandedDf(spark, sf).cache()
    try {
      val dir = Files.createTempDirectory("graft-dedupreb").toString
      val a = banded.filter(col("doc_id") % 3 < 2)
      val probe = banded.filter(col("doc_id") % 3 === 2)
      DedupIndex.write(a, dir)
      val before = DedupIndex.probe(DedupIndex.load(spark, dir), probe)
        .orderBy("doc_id").collect().toSeq

      DedupIndex.rebucket(spark, dir, 16, 32)
      // a probe still assuming the old fan is refused loudly, not silently empty
      val e = intercept[IllegalArgumentException](DedupIndex.load(spark, dir))
      assert(e.getMessage.contains("_b16"))
      val after = DedupIndex.probe(DedupIndex.load(spark, dir, 32), probe, 32)
        .orderBy("doc_id").collect().toSeq
      assert(after == before, "rebucketed tree diverged from the original fan")
      val dpPlan = {
        val df = DedupIndex.probe(DedupIndex.load(spark, dir, 32), probe, 32)
        df.collect(); df.queryExecution.executedPlan.toString
      }
      assert(dpPlan.contains("dynamicpruning"),
        s"rebucketed tree lost dynamic partition pruning:\n${dpPlan.take(1500)}")
    } finally { banded.unpersist(); () }
  }

  test("SubstringIndex: compact + rebucket(16→32) preserve spans bit-for-bit") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val batch = docs.filter(col("doc_id") % 7 === 0)
    val dir = Files.createTempDirectory("graft-subcomp").toString
    SubstringIndex.write(corpus.filter(col("doc_id") % 2 === 0), dir)
    SubstringIndex.append(corpus.filter(col("doc_id") % 2 =!= 0), dir)
    SubstringIndex.append(corpus.filter(col("doc_id") % 2 =!= 0), dir)
    val before = SubstringIndex.probe(SubstringIndex.load(spark, dir), batch)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(before.nonEmpty, "fixture produced no spans — vacuous parity")

    SubstringIndex.compact(spark, dir)
    assert(leavesAreChunky(dir), "compaction must leave one file per leaf")
    val idx = SubstringIndex.load(spark, dir)
    assert(idx.count() == idx.select("h1", "h2").distinct().count(),
      "compaction must collapse cross-batch duplicate keys")
    assert(SubstringIndex.probe(idx, batch)
      .orderBy("doc_id", "span_start").collect().toSeq == before,
      "probe-after-compact diverged")

    SubstringIndex.rebucket(spark, dir, SubstringDedup.K, 1, 16, 32)
    intercept[IllegalArgumentException](SubstringIndex.load(spark, dir))
    assert(SubstringIndex.probe(
        SubstringIndex.load(spark, dir, buckets = 32), batch, buckets = 32)
      .orderBy("doc_id", "span_start").collect().toSeq == before,
      "rebucketed tree diverged")
  }

  test("SubstringIndex: the non-broadcast backfill probe matches the broadcast one") {
    // broadcastBatch = false is the backfill escape hatch (a corpus-sized
    // re-check would OOM the driver through the DPP subquery's broadcast
    // materialization) — it must trade pruning away WITHOUT changing the
    // answer. ChurnCheck's backfill leg is the production caller.
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val batch = docs.filter(col("doc_id") % 7 === 0)
    val dir = Files.createTempDirectory("graft-subnb").toString
    SubstringIndex.write(corpus, dir)
    val idx = SubstringIndex.load(spark, dir)
    val bc = SubstringIndex.probe(idx, batch)
      .orderBy("doc_id", "span_start").collect().toSeq
    val nb = SubstringIndex.probe(idx, batch, broadcastBatch = false)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(nb == bc, "non-broadcast probe diverged from the broadcast probe")
    assert(bc.nonEmpty, "fixture produced no spans — vacuous parity")
  }

  test("Bm25Index: fsck detects and repairs the append crash window; rebuild-in-place cleans stale markers") {
    val docs = Tables.documents(spark, sf)
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 =!= 0)
    val terms = Seq("vector", "stream", "window", "merge")
    val dir = Files.createTempDirectory("graft-bmfsck").toString
    val full = Files.createTempDirectory("graft-bmfull").toString

    Bm25Index.write(evens, dir)
    assert(Bm25Index.fsck(spark, dir).consistent, "fresh tree must fsck clean")

    // the crash window: postings landed, the scalar fold never ran
    Bm25Index.appendPostings(odds, dir)
    val broken = Bm25Index.fsck(spark, dir)
    assert(!broken.consistent, "fsck must detect stale meta after a torn append")
    assert(broken.derivedN > broken.storedN, "the postings tree holds the extra docs")

    val repaired = Bm25Index.fsck(spark, dir, repair = true)
    assert(repaired.repaired && Bm25Index.fsck(spark, dir).consistent,
      "repair must restore meta from the postings tree")
    // repaired tree serves exactly the from-scratch rebuild (every testdata
    // doc has tokens, so the derived scalars are exact — the documented
    // precondition)
    Bm25Index.write(docs, full)
    assert(Bm25Index.search(Bm25Index.load(spark, dir), terms, 20).collect().toSeq ==
      Bm25Index.search(Bm25Index.load(spark, full), terms, 20).collect().toSeq,
      "repaired tree diverges from a from-scratch rebuild")

    // meta-swap crash: retired next to a missing live meta is the only
    // copy — the next read must heal and serve it
    val meta = new java.io.File(dir, "meta.parquet")
    val retired = new java.io.File(dir,
      "meta.parquet" + graft.ext.IndexMaintenance.RetiredSuffix)
    assert(meta.renameTo(retired))
    assert(Bm25Index.search(Bm25Index.load(spark, dir), terms, 20).collect().toSeq ==
      Bm25Index.search(Bm25Index.load(spark, full), terms, 20).collect().toSeq,
      "load must heal a crashed meta swap")

    // rebuild-in-place under a DIFFERENT fan must remove the old fan's
    // marker: otherwise load(dir, 16) would pass the check against an
    // 8-fan tree and every probe would silently miss
    Bm25Index.write(docs, dir, buckets = 8)
    intercept[IllegalArgumentException](Bm25Index.load(spark, dir))
    assert(Bm25Index.search(Bm25Index.load(spark, dir, 8), terms, 20).collect().toSeq ==
      Bm25Index.search(Bm25Index.load(spark, full), terms, 20).collect().toSeq,
      "8-fan rebuild diverges")
  }

  test("Bm25Index: compact + rebucket(16→8) serve identically with static pruning intact") {
    val docs = Tables.documents(spark, sf)
    val terms = Seq("join", "scan", "sort", "quantum")
    val dir = Files.createTempDirectory("graft-bmreb").toString
    Bm25Index.write(docs.filter(col("doc_id") % 2 === 0), dir)
    Bm25Index.append(docs.filter(col("doc_id") % 2 =!= 0), dir)
    val before = Bm25Index.search(Bm25Index.load(spark, dir), terms, 20)
      .collect().toSeq

    Bm25Index.compact(spark, dir)
    assert(leavesAreChunky(s"$dir/postings.parquet"),
      "compaction must leave one file per bucket")
    assert(Bm25Index.search(Bm25Index.load(spark, dir), terms, 20)
      .collect().toSeq == before, "post-compact serving diverged")

    Bm25Index.rebucket(spark, dir, 16, 8)
    intercept[IllegalArgumentException](Bm25Index.load(spark, dir))
    val idx8 = Bm25Index.load(spark, dir, 8)
    val q = Bm25Index.search(idx8, terms, 20)
    assert(q.collect().toSeq == before, "post-rebucket serving diverged")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("tb"),
      s"rebucketed tree lost static bucket pruning:\n${plan.take(1500)}")
  }

  test("empty trees: a fresh-corpus bootstrap index serves zero hits and survives maintenance") {
    // A steady-state pipeline bootstrapping from NOTHING writes its index
    // trees before anything is ingested. An empty tree must load (the
    // explicit at-rest schema — inference throws UNABLE_TO_INFER_SCHEMA
    // on a data-less directory), probe to zero hits, append its first
    // batch normally, and tolerate compact/rebucket at any point.
    val banded = Dedup.mhBandedDf(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    try {
      val emptyB = banded.filter(col("doc_id") < -1)
      val batch = banded.filter(col("doc_id") % 5 === 0)

      val d1 = Files.createTempDirectory("graft-empty-dedup").toString
      DedupIndex.write(emptyB, d1)
      assert(DedupIndex.load(spark, d1).count() == 0)
      assert(DedupIndex.probe(DedupIndex.load(spark, d1), batch).count() == 0,
        "probe of an empty tree must report zero hits, not fail")
      DedupIndex.compact(spark, d1)          // maintenance on empty: no-op
      DedupIndex.rebucket(spark, d1, 16, 32)
      DedupIndex.append(batch, d1, 32)       // first real ingest
      assert(DedupIndex.probe(DedupIndex.load(spark, d1, 32), batch, 32)
        .count() > 0, "the bootstrap tree must serve its first batch")

      val d2 = Files.createTempDirectory("graft-empty-sub").toString
      SubstringIndex.write(docs.filter(col("doc_id") < -1), d2)
      assert(SubstringIndex.load(spark, d2).count() == 0)
      assert(SubstringIndex.probe(SubstringIndex.load(spark, d2),
        docs.filter(col("doc_id") % 7 === 0)).count() == 0)
      SubstringIndex.compact(spark, d2)

      // BM25 deliberately REFUSES an empty tree: a retrieval index over
      // nothing can answer no query — load's avgdl guard fires loudly
      val d3 = Files.createTempDirectory("graft-empty-bm").toString
      Bm25Index.write(docs.filter(col("doc_id") < -1), d3)
      val e = intercept[IllegalArgumentException](Bm25Index.load(spark, d3))
      assert(e.getMessage.contains("empty or token-less"))
    } finally { banded.unpersist(); () }
  }

  test("DedupIndex.stats: churn accounting matches, compaction zeroes the duplicate volume") {
    val banded = Dedup.mhBandedDf(spark, sf).cache()
    try {
      val dir = Files.createTempDirectory("graft-stats").toString
      val a = banded.filter(col("doc_id") % 3 === 0)
      val b = banded.filter(col("doc_id") % 3 === 1)
      DedupIndex.write(a, dir)
      DedupIndex.append(b, dir)
      DedupIndex.append(b, dir)
      val churned = DedupIndex.stats(spark, dir).collect()
        .map(r => r.getAs[Int]("band") ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"))).toMap
      val ka = DedupIndex.indexRows(a).groupBy("band").count().collect()
        .map(r => r.getAs[Int]("band") -> r.getAs[Long]("count")).toMap
      val kb = DedupIndex.indexRows(b).groupBy("band").count().collect()
        .map(r => r.getAs[Int]("band") -> r.getAs[Long]("count")).toMap
      churned.foreach { case (band, (rows, keys)) =>
        assert(rows == ka(band) + 2 * kb(band),
          s"band $band: churned rows $rows != ${ka(band)} + 2*${kb(band)}")
        assert(keys <= rows && rows > keys,
          s"band $band: double-append must leave duplicate volume")
      }
      DedupIndex.compact(spark, dir)
      DedupIndex.stats(spark, dir).collect().foreach { r =>
        assert(r.getAs[Long]("n_rows") == r.getAs[Long]("n_keys"),
          "compaction must zero the duplicate volume")
      }
    } finally { banded.unpersist(); () }
  }

  test("AnnIndex: appendSwapped is atomic-or-old, equals the plain append, compact collapses files") {
    val c = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
    try {
      val cents = Similarity.centroidSet(c, 10)
      val cb = Similarity.pqCodebook(c)
      val dir = Files.createTempDirectory("graft-annswap").toString
      val full = Files.createTempDirectory("graft-annfull2").toString
      val probeVecs = c.filter(col("vec_id") < 8)
      def serve(p: String) =
        AnnIndex.probe(AnnIndex.load(spark, p, cents, cb), probeVecs, cents, cb,
          nprobe = 2, k = 3).orderBy("qid", "rn").collect().toSeq

      AnnIndex.write(c.filter(col("vec_id") % 2 === 0), cents, cb, dir)
      AnnIndex.appendSwapped(c.filter(col("vec_id") % 2 =!= 0), cents, cb, dir)
      AnnIndex.write(c, cents, cb, full)
      assert(serve(dir) == serve(full),
        "swap-appended tree diverges from the from-scratch build")
      // the swap variant is also a compaction: one chunky file per cell
      assert(leavesAreChunky(dir), "appendSwapped must leave one file per cell")

      // swap-append under retrained artifacts refused BEFORE the rewrite
      val retrained = Similarity.refineCentroids(c, cents, rounds = 1)
      val before = dataFiles(dir)
      intercept[IllegalArgumentException](
        AnnIndex.appendSwapped(c.filter(col("vec_id") < 4), retrained, cb, dir))
      assert(dataFiles(dir) == before, "refused swap still rewrote the tree")

      // a crash stranded between retire and promote: the retired root is
      // the only copy — the next load must heal and serve it
      val live = new java.io.File(dir)
      val retiredRoot = new java.io.File(
        dir + graft.ext.IndexMaintenance.RetiredSuffix)
      assert(live.renameTo(retiredRoot))
      assert(serve(dir) == serve(full), "load must heal a crashed tree swap")

      // plain appends fragment; compact restores the chunky layout with
      // identical serving
      val dir2 = Files.createTempDirectory("graft-anncomp").toString
      AnnIndex.write(c.filter(col("vec_id") % 3 === 0), cents, cb, dir2)
      AnnIndex.append(c.filter(col("vec_id") % 3 === 1), cents, cb, dir2)
      AnnIndex.append(c.filter(col("vec_id") % 3 === 2), cents, cb, dir2)
      val pre = serve(dir2)
      assert(!leavesAreChunky(dir2), "appends should fragment some cell dir")
      AnnIndex.compact(spark, dir2, cents, cb)
      assert(leavesAreChunky(dir2), "compaction must leave one file per cell")
      assert(serve(dir2) == pre, "post-compact serving diverged")
    } finally { c.unpersist(); () }
  }

  test("AnnIndex.retrain: re-encodes under new artifacts atomically; stale probes refused; crash leaves old serving") {
    import graft.ext.IndexMaintenance
    val c = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
    try {
      val seed = Similarity.centroidSet(c, 10)
      val cb = Similarity.pqCodebook(c)
      val refined = Similarity.refineCentroids(c, seed, rounds = 1)
      val probeVecs = c.filter(col("vec_id") < 8)
      def serve(p: String, cs: Seq[(Long, Seq[Double], Double)]) =
        AnnIndex.probe(AnnIndex.load(spark, p, cs, cb), probeVecs, cs, cb,
          nprobe = 2, k = 3).orderBy("qid", "rn").collect().toSeq

      val dir = Files.createTempDirectory("graft-annretrain").toString
      AnnIndex.write(c.filter(col("vec_id") % 2 === 0), seed, cb, dir)
      AnnIndex.append(c.filter(col("vec_id") % 2 =!= 0), seed, cb, dir)

      // retrain refuses a tree not stamped with the claimed old artifacts
      intercept[IllegalArgumentException](
        AnnIndex.retrain(c, refined, cb, refined, cb, dir))

      AnnIndex.retrain(c, seed, cb, refined, cb, dir)
      // the stale-probe window is closed: old artifacts now refused
      intercept[IllegalArgumentException](AnnIndex.load(spark, dir, seed, cb))
      // serving equals a from-scratch build under the new artifacts
      val fresh = Files.createTempDirectory("graft-annretrain-fresh").toString
      AnnIndex.write(c, refined, cb, fresh)
      assert(serve(dir, refined) == serve(fresh, refined),
        "retrained tree diverges from a from-scratch build under the new artifacts")
      assert(leavesAreChunky(dir), "retrain must leave one file per cell")

      // crash stranded between retire and promote: the retired root is the
      // only copy — the next load heals and serves (under the NEW marker,
      // since promote-side stranding happens after the staging build)
      val live = new java.io.File(dir)
      assert(live.renameTo(new java.io.File(dir + IndexMaintenance.RetiredSuffix)))
      assert(serve(dir, refined) == serve(fresh, refined),
        "load must heal a crashed retrain swap")

      // the codebook half drifts too: retrain under BOTH refreshed
      // artifacts (the full re-fit) equals a from-scratch build under them
      val cb2 = Similarity.refinePqCodebook(c, cb, rounds = 1)
      AnnIndex.retrain(c, refined, cb, refined, cb2, dir)
      intercept[IllegalArgumentException](AnnIndex.load(spark, dir, refined, cb))
      val fresh2 = Files.createTempDirectory("graft-annretrain-cb").toString
      AnnIndex.write(c, refined, cb2, fresh2)
      def serve2(p: String) =
        AnnIndex.probe(AnnIndex.load(spark, p, refined, cb2), probeVecs,
          refined, cb2, nprobe = 2, k = 3).orderBy("qid", "rn").collect().toSeq
      assert(serve2(dir) == serve2(fresh2),
        "codebook retrain diverges from a from-scratch build under the new artifacts")
    } finally { c.unpersist(); () }
  }

  // ---------------- round 16: the writer lease ----------------

  test("writer lease: a second writer is refused on all four families; release and stale takeover work") {
    import graft.ext.IndexMaintenance
    val banded = Dedup.mhBandedDf(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    val c = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
    try {
      val cents = Similarity.centroidSet(c, 10)
      val cb = Similarity.pqCodebook(c)
      val half = banded.filter(col("doc_id") % 2 === 0)
      val rest = banded.filter(col("doc_id") % 2 =!= 0)

      // one helper: hold the lease as a simulated concurrent maintainer,
      // assert the mutator refuses, release, assert it then succeeds
      def holdAndRefuse(dir: String)(mutate: => Unit): Unit = {
        val lease = new java.io.File(dir + IndexMaintenance.LeaseSuffix)
        assert(lease.createNewFile(), s"test could not plant lease at $lease")
        val e = intercept[IllegalStateException](mutate)
        assert(e.getMessage.contains("another writer holds the lease"),
          s"wrong refusal message: ${e.getMessage}")
        assert(lease.delete())
        mutate // released → the same operation must go through
      }

      val d1 = Files.createTempDirectory("graft-lease-dedup").toString
      DedupIndex.write(half, d1)
      holdAndRefuse(d1)(DedupIndex.append(rest, d1))
      holdAndRefuse(d1)(DedupIndex.compact(spark, d1))

      val d2 = Files.createTempDirectory("graft-lease-sub").toString
      SubstringIndex.write(docs.filter(col("doc_id") % 2 === 0), d2)
      holdAndRefuse(d2)(SubstringIndex.append(docs.filter(col("doc_id") % 2 =!= 0), d2))
      holdAndRefuse(d2)(SubstringIndex.compact(spark, d2))

      val d3 = Files.createTempDirectory("graft-lease-bm").toString
      Bm25Index.write(docs.filter(col("doc_id") % 2 === 0), d3)
      holdAndRefuse(d3)(Bm25Index.append(docs.filter(col("doc_id") % 2 =!= 0), d3))
      // the repair path writes meta → leased; detect-only is a read → not
      Bm25Index.appendPostings(docs.filter(col("doc_id") % 3 === 0), d3)
      holdAndRefuse(d3) { Bm25Index.fsck(spark, d3, repair = true); () }
      val lease3 = new java.io.File(d3 + IndexMaintenance.LeaseSuffix)
      assert(lease3.createNewFile())
      assert(!Bm25Index.fsck(spark, d3, repair = false).repaired,
        "detect-only fsck must run (read) under a foreign lease")
      assert(lease3.delete())

      val d4 = Files.createTempDirectory("graft-lease-ann").toString
      AnnIndex.write(c.filter(col("vec_id") % 2 === 0), cents, cb, d4)
      holdAndRefuse(d4)(AnnIndex.append(c.filter(col("vec_id") % 2 =!= 0), cents, cb, d4))
      holdAndRefuse(d4)(AnnIndex.compact(spark, d4, cents, cb))

      // reads NEVER need the lease: load + probe under a held lease
      val lease4 = new java.io.File(d4 + IndexMaintenance.LeaseSuffix)
      assert(lease4.createNewFile())
      assert(AnnIndex.probe(AnnIndex.load(spark, d4, cents, cb),
        c.filter(col("vec_id") < 4), cents, cb, 2, 3).count() > 0,
        "probes must not be blocked by a writer lease")
      assert(lease4.delete())

      // stale takeover: a lease whose mtime is past the stale age is
      // presumed abandoned (kill -9'd writer) and taken over
      val staleLease = new java.io.File(d1 + IndexMaintenance.LeaseSuffix)
      assert(staleLease.createNewFile())
      assert(staleLease.setLastModified(
        System.currentTimeMillis - IndexMaintenance.LeaseStaleMs - 60000))
      DedupIndex.append(rest, d1) // must take over, not refuse
      assert(!staleLease.exists(), "takeover must release the lease after commit")

      // a crashed writer (exception inside the leased body) releases too
      intercept[IllegalArgumentException](
        DedupIndex.append(rest, d1, buckets = 99)) // marker mismatch throws inside
      assert(!new java.io.File(d1 + IndexMaintenance.LeaseSuffix).exists(),
        "an in-process failure must release the lease")
    } finally { banded.unpersist(); c.unpersist(); () }
  }

  test("load-path heal leaves a maintainer's staging tree alone; swapTree still clears stale staging") {
    import graft.ext.IndexMaintenance
    val banded = Dedup.mhBandedDf(spark, sf).cache()
    try {
      val dir = Files.createTempDirectory("graft-healstg").toString
      DedupIndex.write(banded.filter(col("doc_id") % 2 === 0), dir)
      // an in-flight maintainer's staging sibling (between its data write
      // and marker stamp — the ADVICE race window)
      val staging = new java.io.File(dir + IndexMaintenance.StagingSuffix)
      assert(staging.mkdir())
      val partial = new java.io.File(staging, "part-in-flight.parquet")
      assert(partial.createNewFile())
      DedupIndex.load(spark, dir).count() // a concurrent reader
      assert(partial.exists() && staging.exists(),
        "a load must NOT delete a maintainer's in-flight staging tree " +
          "(promote could install a gutted index)")
      // the next WRITER clears the (now genuinely stale) debris safely
      DedupIndex.compact(spark, dir)
      assert(!new java.io.File(dir + IndexMaintenance.StagingSuffix, "part-in-flight.parquet").exists(),
        "swapTree must have rebuilt staging from scratch")
      assert(DedupIndex.load(spark, dir).count() > 0)
    } finally { banded.unpersist(); () }
  }

  test("Bm25Index: rebucket retry and fsck self-heal the stranded retire state instead of demanding a rebuild") {
    import graft.ext.IndexMaintenance
    val docs = Tables.documents(spark, sf)
    val terms = Seq("join", "scan", "sort")
    val dir = Files.createTempDirectory("graft-bmheal").toString
    Bm25Index.write(docs, dir)
    val before = Bm25Index.search(Bm25Index.load(spark, dir), terms, 10)
      .collect().toSeq

    // crash stranded between retire and promote: live root missing,
    // retired sibling is the only copy
    def strand(): Unit = {
      val live = new java.io.File(dir)
      val retired = new java.io.File(dir + IndexMaintenance.RetiredSuffix)
      assert(live.renameTo(retired))
    }
    strand()
    assert(Bm25Index.fsck(spark, dir).consistent,
      "fsck must heal the stranded retire state, not fail its marker check")
    strand()
    Bm25Index.rebucket(spark, dir, 16, 8) // retry after the crash must work
    assert(Bm25Index.search(Bm25Index.load(spark, dir, 8), terms, 10)
      .collect().toSeq == before, "healed rebucket diverged")
  }

  test("structural fsck: band/substring/ANN trees describe each detectable corruption without throwing") {
    import graft.ext.IndexMaintenance
    val banded = Dedup.mhBandedDf(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    val c = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
    try {
      def issuesOf(r: IndexMaintenance.TreeReport) = r.issues.mkString("; ")

      // ---- DedupIndex ----
      val d1 = Files.createTempDirectory("graft-fsck-dedup").toString
      DedupIndex.write(banded, d1)
      assert(DedupIndex.fsck(spark, d1, deep = true).ok,
        s"fresh tree must fsck clean: ${issuesOf(DedupIndex.fsck(spark, d1, deep = true))}")

      // wrong claimed fan → marker mismatch, described not thrown
      assert(DedupIndex.fsck(spark, d1, buckets = 32).issues
        .exists(_.contains("does not match the expected")))
      // a second (stale) marker → ambiguity flagged
      val stale = new java.io.File(d1, "_GRAFT_BUCKETING_1_b32")
      assert(stale.createNewFile())
      assert(DedupIndex.fsck(spark, d1).issues.exists(_.contains("multiple layout markers")))
      assert(stale.delete())
      // a bucket directory beyond the fan → orphaned-rows class
      val band0 = new java.io.File(d1).listFiles().filter(_.getName.startsWith("band=")).head
      val someBucket = band0.listFiles().filter(_.getName.startsWith("bucket=")).head
      val orphan = new java.io.File(band0, "bucket=99")
      assert(someBucket.renameTo(orphan))
      assert(DedupIndex.fsck(spark, d1).issues.exists(_.contains("outside the fan")))
      assert(orphan.renameTo(someBucket))
      // foreign-fan rows: a data file moved between bucket dirs passes
      // every structural check — only the deep row-level re-derivation
      // catches it
      val buckets0 = band0.listFiles().filter(_.getName.startsWith("bucket="))
      val (src, dst) = (buckets0(0), buckets0(1))
      val part = src.listFiles().filter(_.getName.endsWith(".parquet")).head
      val moved = new java.io.File(dst, part.getName)
      // the local FS keeps a .crc sidecar per data file — move it along or
      // the checksum layer (correctly) screams about the wrong pairing
      def withCrc(f: java.io.File) = new java.io.File(f.getParent, s".${f.getName}.crc")
      assert(part.renameTo(moved))
      if (withCrc(part).exists()) assert(withCrc(part).renameTo(withCrc(moved)))
      assert(DedupIndex.fsck(spark, d1).ok, "structure-only fsck should not see a moved data file")
      assert(DedupIndex.fsck(spark, d1, deep = true).issues
        .exists(_.contains("does not hash to")), "deep fsck must catch misfiled rows")
      assert(moved.renameTo(part))
      if (withCrc(moved).exists()) assert(withCrc(moved).renameTo(withCrc(part)))
      // stranded maintenance siblings surfaced
      val retired = new java.io.File(d1 + IndexMaintenance.RetiredSuffix)
      assert(retired.mkdir())
      assert(DedupIndex.fsck(spark, d1).issues.exists(_.contains("stranded retired")))
      assert(retired.delete())
      // missing marker (torn write) → described
      val marker = new java.io.File(d1, DedupIndex.markerOf(16))
      assert(marker.delete())
      assert(DedupIndex.fsck(spark, d1).issues.exists(_.contains("no layout marker")))

      // ---- SubstringIndex ----
      val d2 = Files.createTempDirectory("graft-fsck-sub").toString
      SubstringIndex.write(docs, d2)
      assert(SubstringIndex.fsck(spark, d2, deep = true).ok)
      assert(SubstringIndex.fsck(spark, d2, sample = 4).issues
        .exists(_.contains("does not match the expected")))
      val sb = new java.io.File(d2).listFiles().filter(_.getName.startsWith("bucket=")).head
      val sOrphan = new java.io.File(d2, "bucket=777")
      assert(sb.renameTo(sOrphan))
      assert(SubstringIndex.fsck(spark, d2).issues.exists(_.contains("outside")))
      assert(sOrphan.renameTo(sb))
      // a foreign (non-partition) entry at the root
      val alien = new java.io.File(d2, "notes.txt")
      assert(alien.createNewFile())
      assert(SubstringIndex.fsck(spark, d2).issues.exists(_.contains("foreign entry")))
      assert(alien.delete())

      // ---- AnnIndex ----
      val cents = Similarity.centroidSet(c, 10)
      val cb = Similarity.pqCodebook(c)
      val d3 = Files.createTempDirectory("graft-fsck-ann").toString
      AnnIndex.write(c, cents, cb, d3)
      assert(AnnIndex.fsck(spark, d3, cents, cb).ok)
      // retrained artifacts → fingerprint mismatch described, not thrown
      val refined = Similarity.refineCentroids(c, cents, rounds = 1)
      assert(AnnIndex.fsck(spark, d3, refined, cb).issues
        .exists(_.contains("does not match the expected")))
      // a cell directory whose id is not in the centroid set is
      // unreachable — no probe ever selects it
      val cid0 = new java.io.File(d3).listFiles().filter(_.getName.startsWith("cid=")).head
      val cOrphan = new java.io.File(d3, "cid=999999")
      assert(cid0.renameTo(cOrphan))
      assert(AnnIndex.fsck(spark, d3, cents, cb).issues.exists(_.contains("outside")))
      assert(cOrphan.renameTo(cid0))
    } finally { banded.unpersist(); c.unpersist(); () }
  }

  test("model dirs: a torn classifier/DSIR re-train is impossible by construction; crash states heal or serve old") {
    import graft.ext.{Dsir, IndexMaintenance, QualityClassifier}
    val dir = Files.createTempDirectory("graft-model").toString + "/clf"
    val w1 = (0 until QualityClassifier.D).map(_ * 0.001)
    val w2 = (0 until QualityClassifier.D).map(_ * 0.002)
    QualityClassifier.writeModel(spark, dir, w1, 0.25)
    assert(QualityClassifier.loadModel(spark, dir) == ((w1, 0.25)))

    // re-train: both files move together through the dir swap
    QualityClassifier.writeModel(spark, dir, w2, 0.5)
    assert(QualityClassifier.loadModel(spark, dir) == ((w2, 0.5)))

    // crash state A: stranded retired next to a missing live dir — the
    // next load must heal and serve
    val live = new java.io.File(dir)
    val retired = new java.io.File(dir + IndexMaintenance.RetiredSuffix)
    assert(live.renameTo(retired))
    assert(QualityClassifier.loadModel(spark, dir) == ((w2, 0.5)),
      "loadModel must heal a crashed model swap")

    // crash state B: a staging dir that never promoted (kill between the
    // two file writes — the exact ADVICE torn-commit window) — the live
    // model keeps serving, the half-written staging is invisible
    val staging = new java.io.File(dir + IndexMaintenance.StagingSuffix)
    assert(staging.mkdirs())
    assert(new java.io.File(staging, "meta.parquet").mkdir())
    assert(QualityClassifier.loadModel(spark, dir) == ((w2, 0.5)),
      "a never-promoted staging dir must not affect serving")

    val ddir = Files.createTempDirectory("graft-model-dsir").toString + "/lam"
    val l1 = (0 until Dsir.D).map(_ * 0.0001)
    Dsir.writeTable(spark, ddir, l1)
    assert(Dsir.loadTable(spark, ddir) == l1)
    val dlive = new java.io.File(ddir)
    assert(dlive.renameTo(new java.io.File(ddir + IndexMaintenance.RetiredSuffix)))
    assert(Dsir.loadTable(spark, ddir) == l1, "loadTable must heal a crashed swap")
  }
}
