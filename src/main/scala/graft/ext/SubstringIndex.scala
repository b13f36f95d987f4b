package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The exact-substring window index AT REST — the [[SubstringDedup]]
  * analogue of [[DedupIndex]]/[[AnnIndex]], completing the same
  * batch ≡ at-rest lifecycle: a production corpus maintains the distinct
  * window-hash set incrementally, and each incoming batch is checked for
  * verbatim overlap against the stored corpus WITHOUT re-scanning it.
  *
  *  - [[write]] stores DISTINCT (h1, h2) window hashes partitioned by
  *    `bucket = pmod(h1, Buckets)` — a deterministic function of the key,
  *    so a probe computes the same bucket and bucket equality is implied
  *    by key equality. The index is O(total_chars / sample) 16-byte rows:
  *    the price a suffix-array pipeline also pays, here horizontally
  *    partitioned and probed via partition pruning.
  *  - [[probe]] equi-joins the stored index against the broadcast window
  *    hashes of an incoming batch on (bucket, h1, h2); the partition
  *    column is a join key, so dynamic partition pruning restricts the
  *    index scan to the batch's buckets (SubstringIndexSpec asserts
  *    `dynamicpruning` in the executed plan). Hit positions island-merge
  *    into the SAME maximal spans [[SubstringDedup.crossCorpusSpans]]
  *    yields against the full corpus — one definition, two storage
  *    layouts (equivalence pinned by spec).
  *
  * The index is key-only: a window hit means "this k-gram exists in the
  * ingested corpus", which is exactly the incremental-dedup /
  * decontamination contract. `k` and `sample` must match between write
  * and probe — content-defined sampling keeps the two sides consistent
  * at any alignment.
  *
  * Probe-cost model, measured at 40× (SCALING.json `substr40x`): a batch
  * with more window hashes than the bucket fan touches EVERY partition,
  * so pruning cannot shrink the scan and probe cost grows with the index
  * (exp 0.66 at 40×, pruning asserted) — the win over re-scanning the
  * corpus is the CONSTANT FACTOR of reading 16-byte hash rows instead of
  * re-hashing text (~6× at 40×) plus skipping the corpus-side window
  * build. Pruning is asymptotic only when the batch's window count is
  * below `buckets`; raise the fan with corpus size (and with `sample` > 1
  * the batch's selected-window count drops by ~s, widening that regime).
  */
object SubstringIndex {

  /** Default partition fan. Same trade-off as [[DedupIndex.Buckets]]:
    * directory count is a fixed per-write cost, directory size is the
    * probe's scan unit — raise with corpus size.
    */
  val Buckets = 16

  // The bucket is a murmur MIX of h1, not h1 mod buckets: mod-sampling
  // keeps only h1 ≡ 0 (mod sample), and a plain `pmod(h1, buckets)` is
  // CORRELATED with that filter — with sample=s only buckets/gcd(s,
  // buckets) directories are ever used, and a power-of-two s >= buckets
  // (both knobs the scale docs say to raise together) funnels the ENTIRE
  // index into bucket 0: one writer task, nothing for partition pruning
  // to prune. hash() decorrelates for any (sample, buckets) pair while
  // staying a pure function of the key, so bucket equality is still
  // implied by key equality and probes compute it identically.
  private def bucketOf(buckets: Int) =
    pmod(hash(col("h1")), lit(buckets)).cast("int")

  /** Bucket-function version marker ([[IndexVersion]]): v2 = the murmur
    * mix above (v1, the unstamped h1-mod layout, changed in round 11).
    * The stamped name additionally carries the LAYOUT PARAMETERS
    * (k, sample, buckets): all three are derived independently on the
    * write and probe sides, and a mismatch (e.g. a fan raised at write
    * time but probed at the default) silently loses hits the same way a
    * changed bucket function would — load() verifies the caller's
    * parameters against the stored tree's.
    */
  private[graft] val BucketingMarker = "_GRAFT_BUCKETING_2"
  private[graft] def markerOf(k: Int, sample: Int, buckets: Int): String =
    s"${BucketingMarker}_k${k}_s${sample}_b$buckets"

  /** Attach the partition-bucket column to a window-hash frame — the one
    * definition write, batch probe, and streaming probe all derive the
    * bucket from.
    */
  def withBucket(windowHashes: DataFrame, buckets: Int = Buckets): DataFrame =
    windowHashes.withColumn("bucket", bucketOf(buckets))

  /** Distinct (h1, h2, bucket) window-hash rows of a corpus. */
  def indexRows(docs: DataFrame, k: Int = SubstringDedup.K, sample: Int = 1,
                buckets: Int = Buckets): DataFrame =
    SubstringDedup.windowHashes(docs, k, sample)
      .select("h1", "h2").distinct()
      .withColumn("bucket", bucketOf(buckets))

  /** The pre-write repartition on the partition column is load-bearing —
    * without it every shuffle task writes a sliver into every bucket
    * directory (tasks × buckets tiny files).
    */
  def write(docs: DataFrame, path: String, k: Int = SubstringDedup.K,
            sample: Int = 1, buckets: Int = Buckets): Unit =
    IndexMaintenance.withLease(docs.sparkSession, path, "substr-write") {
      indexRows(docs, k, sample, buckets)
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
      IndexVersion.stamp(docs.sparkSession, path, markerOf(k, sample, buckets))
    }

  /** Incremental append: fold a new corpus batch's window hashes into the
    * stored tree — O(batch) ingest, base part files never rewritten (the
    * same maintenance face [[DedupIndex.append]]/[[AnnIndex.append]]/
    * [[Bm25Index.append]] give the other three at-rest indexes). Keys the
    * stored tree already holds are appended again rather than anti-joined
    * away (the anti-join would cost an index-side shuffle per ingest);
    * the duplicate is harmless for [[probe]]'s OUTPUT because span
    * merging is min/max aggregation over hit positions — a position hit
    * via two index rows lands in the same island and the same span
    * (pinned by a double-append in SubstringIndexSpec). The marker check
    * runs BEFORE any write: appending windows derived under a different
    * (k, sample, buckets) layout would scatter them into directories
    * probes never read.
    */
  def append(docs: DataFrame, path: String, k: Int = SubstringDedup.K,
             sample: Int = 1, buckets: Int = Buckets): Unit =
    IndexMaintenance.withLease(docs.sparkSession, path, "substr-append") {
      IndexVersion.check(docs.sparkSession, path, markerOf(k, sample, buckets),
        s"substring index (refusing to append windows derived under layout " +
          s"k=$k sample=$sample buckets=$buckets into a tree stamped " +
          "otherwise — probes would silently miss them)")
      indexRows(docs, k, sample, buckets)
        .repartition(col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(path)
    }

  /** Partition columns come back through directory-name inference — pin
    * bucket to int so the at-rest schema matches [[indexRows]] exactly.
    * Fails loudly on a tree without the current [[BucketingMarker]]: a
    * stale layout probed with today's bucket function returns zero hits
    * with no error — the one failure mode an at-rest index must never
    * have.
    */
  /** The at-rest schema, pinned EXPLICITLY (partition column included):
    * inference would throw on an EMPTY tree, and an empty tree is a
    * legitimate bootstrap state (a fresh corpus writes its window index
    * before anything is ingested — the first probe must report zero
    * spans, not UNABLE_TO_INFER_SCHEMA).
    */
  private val AtRestSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "h1 BIGINT, h2 BIGINT, bucket INT")

  def load(spark: SparkSession, path: String, k: Int = SubstringDedup.K,
           sample: Int = 1, buckets: Int = Buckets): DataFrame = {
    IndexMaintenance.heal(spark, path)
    IndexVersion.check(spark, path, markerOf(k, sample, buckets),
      s"substring index (expected layout k=$k sample=$sample buckets=$buckets)")
    spark.read.schema(AtRestSchema).parquet(path)
  }

  /** Maintenance observability: row/key/bucket counts of the stored tree
    * — `n_rows − n_keys` is the cross-batch duplicate volume appends
    * accumulate (compaction collapses it to zero), and `n_buckets_used`
    * vs the fan is the rebucket signal.
    */
  def stats(spark: SparkSession, path: String, k: Int = SubstringDedup.K,
            sample: Int = 1, buckets: Int = Buckets): DataFrame =
    load(spark, path, k, sample, buckets)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("h1"), col("h2")).as("n_keys"),
        countDistinct(col("bucket")).as("n_buckets_used"))

  /** Collapse the tree after K appends — every touched bucket directory
    * holds up to K part files plus the cross-batch duplicate keys
    * [[append]] tolerates by design; compaction rewrites each to one
    * chunky DISTINCT file ([[rebucket]] under the unchanged fan),
    * restoring the exact layout [[write]] produces.
    */
  def compact(spark: SparkSession, path: String, k: Int = SubstringDedup.K,
              sample: Int = 1, buckets: Int = Buckets): Unit =
    rebucket(spark, path, k, sample, buckets, buckets)

  /** Migrate the tree to a new bucket fan — the knob the probe-cost model
    * above says to raise with corpus size (pruning is asymptotic only
    * while the batch's window count stays below the fan), frozen at write
    * time until now. Reads the stored hashes under the old fan's marker,
    * re-derives `bucket` under `toBuckets` (the same [[withBucket]]
    * definition probes compute — k and sample are properties of the
    * stored hashes themselves and never change here), collapses duplicate
    * keys, and rewrites into a staging root stamped with the new layout's
    * marker, atomically promoted ([[IndexMaintenance]] — data and marker
    * move together; a crash leaves the old fan serving and self-heals at
    * the next [[load]]).
    */
  def rebucket(spark: SparkSession, path: String, k: Int, sample: Int,
               fromBuckets: Int, toBuckets: Int): Unit = {
    require(toBuckets >= 1, s"bucket fan must be >= 1, got $toBuckets")
    IndexMaintenance.withLease(spark, path, "substr-rebucket") {
      val rows = withBucket(
        load(spark, path, k, sample, fromBuckets).select("h1", "h2").distinct(),
        toBuckets)
      IndexMaintenance.swapTree(spark, path) { staging =>
        rows.repartition(col("bucket"))
          .write.partitionBy("bucket").parquet(staging)
        IndexVersion.stamp(spark, staging, markerOf(k, sample, toBuckets))
      }
    }
  }

  /** Structural fsck (the [[DedupIndex.fsck]] shape for the window tree):
    * exactly one layout marker matching the claimed (k, sample, buckets),
    * every root entry a `bucket=<0..fan)` directory or hidden file,
    * stranded maintenance siblings surfaced. `deep = true` re-derives
    * every stored hash's bucket (O(index) read of 16-byte rows — catches
    * rows copied in from a foreign-layout tree, which probes would
    * silently never read).
    */
  def fsck(spark: SparkSession, path: String, k: Int = SubstringDedup.K,
           sample: Int = 1, buckets: Int = Buckets,
           deep: Boolean = false): IndexMaintenance.TreeReport = {
    val issues = scala.collection.mutable.ArrayBuffer.empty[String]
    issues ++= IndexMaintenance.structuralIssues(spark, path,
      s"${BucketingMarker}_*", markerOf(k, sample, buckets), "bucket",
      v => v >= 0 && v < buckets)
    if (deep && issues.isEmpty) {
      val bad = spark.read.schema(AtRestSchema).parquet(path)
        .filter(col("bucket") =!= bucketOf(buckets)).count()
      if (bad > 0)
        issues += s"$bad rows are filed under a bucket their hash does not " +
          "map to under this layout — foreign-layout rows; probes miss them"
    }
    IndexMaintenance.TreeReport(issues.toSeq)
  }

  /** Maximal spans of `batch` documents whose text occurs verbatim in the
    * indexed corpus — identical output to
    * `SubstringDedup.crossCorpusSpans(batch, corpusDocs)`, but the corpus
    * side is the partition-pruned stored scan instead of a re-scan.
    * Incremental batches are small by definition, so their window hashes
    * broadcast — the broadcast is also what plants the dynamic partition
    * filter on the stored scan. `broadcastBatch = false` is the escape
    * hatch for a probe that is NOT a bounded ingest batch (a backfill
    * re-check of a corpus-sized slice): the forced broadcast would
    * otherwise collect the batch's full window set on the driver (the
    * DPP subquery materializes the build side — OOM at corpus scale,
    * observed live at a 100× synthesis) — the shuffle join trades the
    * pruning away, which is the honest cost model once the batch's
    * window count exceeds the bucket fan anyway (see the class doc).
    */
  def probe(index: DataFrame, batch: DataFrame, k: Int = SubstringDedup.K,
            sample: Int = 1, buckets: Int = Buckets,
            mergeGap: Int = -1, broadcastBatch: Boolean = true): DataFrame = {
    val gap = SubstringDedup.resolvedGap(mergeGap, k, sample)
    val bw = withBucket(SubstringDedup.windowHashes(batch, k, sample), buckets)
    val hits = index
      .join(if (broadcastBatch) broadcast(bw) else bw, Seq("bucket", "h1", "h2"))
      .select("doc_id", "pos")
    SubstringDedup.mergeSpans(hits, k, gap)
  }
}
