package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MinHash-LSH band index AT REST — the dedup analogue of
  * [[AnnIndex]]: the distinct (band, key) rows a production pipeline
  * maintains incrementally, stored so a probe reads only the directories
  * its own keys can live in, instead of re-reading the full index.
  *
  *  - [[write]] stores the DISTINCT index rows partitioned by
  *    `(band, bucket)` where `bucket = pmod(hash(k1, k2), Buckets)` —
  *    a deterministic function of the key, so a probe computes the same
  *    bucket for its keys and bucket equality is implied by key equality.
  *    Band and bucket are directories; at corpus scale each holds
  *    ≈ |index|/(4·Buckets) 16-byte key rows.
  *  - [[probe]] equi-joins the stored index against a broadcast incoming
  *    batch on (band, bucket, k1, k2). The two partition columns are join
  *    keys, so Spark's dynamic partition pruning turns the broadcast
  *    batch into a runtime partition filter on the index scan
  *    (DedupIndexSpec asserts `dynamicpruning` in the executed plan) —
  *    a small batch touching b distinct buckets reads b directories, not
  *    the corpus index.
  *  - [[probeBand]] is the static variant: a literal band predicate
  *    prunes at planning time (`PartitionFilters` in the scan).
  *
  * The index is key-only (no doc ids): a band hit means "near-dup of
  * something already ingested", which is the incremental-dedup contract
  * (cf. q_dedup_incremental and the streaming variant in
  * [[graft.streaming.StreamingOps]]). Keeping doc ids per key is a
  * one-line change (drop the distinct) the audit-table variant would use.
  */
object DedupIndex {

  /** Default partition fan per band (4 bands × 16 buckets = 64
    * directories). Directory COUNT is a fixed per-write/per-listing cost
    * (commit protocol and file listing both walk it — measured: 256 dirs
    * cost ~2× 64 dirs end-to-end at sf0.1), while directory SIZE is the
    * probe's scan unit — so pick the smallest fan whose directories stay
    * ≤ one HDFS-block-ish file and raise it with corpus size. Write and
    * probe must agree on the fan; both default to this.
    */
  val Buckets = 16

  /** The bucket derivation — ONE definition shared by [[indexRows]]
    * (write/append), [[probe]] (lookup) and [[rebucket]] (migration), so
    * the three can never drift.
    */
  private def bucketCol(buckets: Int) =
    pmod(hash(col("k1"), col("k2")), lit(buckets))

  /** Distinct (band, k1, k2, bucket) index rows of a banded corpus
    * ((doc_id, band, key struct) — the [[Dedup]] LSH shape). */
  def indexRows(banded: DataFrame, buckets: Int = Buckets): DataFrame =
    banded
      .select(col("band"), col("key.k1").as("k1"), col("key.k2").as("k2"))
      .distinct()
      .withColumn("bucket", bucketCol(buckets))

  /** The pre-write repartition on the partition columns is load-bearing:
    * without it every shuffle task writes its own sliver into every
    * (band, bucket) directory — up to tasks×directories tiny files.
    * With it each directory gets one chunky file, which is also the
    * layout a cluster-scale probe wants to list.
    */
  /** Bucket-function version marker ([[IndexVersion]]): v1 = the
    * `pmod(hash(k1, k2), buckets)` derivation above, with the bucket FAN
    * baked into the stamped name since [[rebucket]] made the fan mutable:
    * the fan is derived independently on the write and probe sides, and a
    * tree migrated to fan 64 but probed at the default 16 would compute
    * wrong buckets for most keys and silently admit duplicates — exactly
    * the drift class the marker exists to refuse. (Pre-fan `…_1` stamps
    * are refused too: they never recorded which fan wrote them.) A probe
    * against a tree written under a DIFFERENT derivation reports every
    * true near-dup as novel — silent duplicate admission — so [[load]]
    * refuses unstamped trees.
    */
  private[graft] def markerOf(buckets: Int): String = s"_GRAFT_BUCKETING_1_b$buckets"

  def write(banded: DataFrame, path: String, buckets: Int = Buckets): Unit =
    IndexMaintenance.withLease(banded.sparkSession, path, "dedup-write") {
      indexRows(banded, buckets).repartition(col("band"), col("bucket"))
        .write.mode("overwrite")
        .partitionBy("band", "bucket").parquet(path)
      IndexVersion.stamp(banded.sparkSession, path, markerOf(buckets))
    }

  /** Collapse the tree after K appends: each touched (band, bucket)
    * directory holds up to K part files plus the cross-batch duplicate
    * keys [[append]] tolerates by design — compaction rewrites every
    * directory to one chunky DISTINCT file ([[rebucket]] under the
    * unchanged fan), restoring the exact layout [[write]] produces.
    */
  def compact(spark: SparkSession, path: String, buckets: Int = Buckets): Unit =
    rebucket(spark, path, buckets, buckets)

  /** Migrate the tree to a new bucket fan — the scale knob the fan doc
    * says to raise with corpus size, frozen at write time until now: read
    * the stored keys under the old fan's marker, re-derive `bucket` under
    * `toBuckets` (same one [[bucketCol]] definition the probes compute),
    * collapse cross-batch duplicate keys, and rewrite into a staging root
    * stamped with the NEW fan's marker, atomically promoted over the live
    * tree ([[IndexMaintenance]] — data and marker change together or not
    * at all; a crash leaves the old fan serving and self-heals at the
    * next [[load]]).
    */
  def rebucket(spark: SparkSession, path: String,
               fromBuckets: Int, toBuckets: Int): Unit = {
    require(toBuckets >= 1, s"bucket fan must be >= 1, got $toBuckets")
    IndexMaintenance.withLease(spark, path, "dedup-rebucket") {
      val rows = load(spark, path, fromBuckets)
        .select("band", "k1", "k2").distinct()
        .withColumn("bucket", bucketCol(toBuckets))
      IndexMaintenance.swapTree(spark, path) { staging =>
        rows.repartition(col("band"), col("bucket"))
          .write.partitionBy("band", "bucket").parquet(staging)
        IndexVersion.stamp(spark, staging, markerOf(toBuckets))
      }
    }
  }

  /** Incremental append: fold a new batch's band keys into the stored
    * tree — O(batch), base part files never rewritten (the ingest loop a
    * production dedup pipeline runs after each probe-admit). The batch's
    * keys are deduped WITHIN the batch ([[indexRows]] is distinct), but a
    * key the stored tree already holds is appended AGAIN rather than
    * anti-joined away: the anti-join would cost an index-side shuffle per
    * ingest (O(index), exactly what append exists to avoid), while the
    * duplicate is harmless — [[probe]] dedupes its (doc, band, key) hits
    * before counting (spec-pinned), so hit counts are identical on an
    * appended tree and a from-scratch rebuild. Storage growth from
    * cross-batch duplicate keys is bounded by the duplicate RATE of
    * ingested batches; [[compact]] collapses both the duplicates and the
    * accumulated part files in place (crash-safe swap). The marker is
    * checked BEFORE any write — appending keys bucketed under a
    * different derivation would scatter them into directories probes
    * never read.
    */
  def append(batchBanded: DataFrame, path: String, buckets: Int = Buckets): Unit =
    IndexMaintenance.withLease(batchBanded.sparkSession, path, "dedup-append") {
      IndexVersion.check(batchBanded.sparkSession, path, markerOf(buckets),
        "dedup band index (refusing to append keys bucketed under a " +
          "different derivation or fan than the stored tree's — they would " +
          "land in directories probes never read, silently admitting duplicates)")
      indexRows(batchBanded, buckets).repartition(col("band"), col("bucket"))
        .write.mode("append")
        .partitionBy("band", "bucket").parquet(path)
    }

  /** The at-rest schema, pinned EXPLICITLY (partition columns included):
    * inference would (a) type the directory-name partition columns by
    * their narrowest parse and (b) THROW on an empty tree — and an empty
    * tree is a legitimate bootstrap state (a fresh corpus writes its
    * index before anything is ingested; the first probe must return zero
    * hits, not UNABLE_TO_INFER_SCHEMA). Matches [[indexRows]] exactly.
    */
  private val AtRestSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "k1 BIGINT, k2 BIGINT, band INT, bucket INT")

  /** Explicit-schema read (see [[AtRestSchema]] — empty-tree-safe, no
    * directory-name type inference).
    */
  def load(spark: SparkSession, path: String, buckets: Int = Buckets): DataFrame = {
    IndexMaintenance.heal(spark, path)
    IndexVersion.check(spark, path, markerOf(buckets), "dedup band index")
    spark.read.schema(AtRestSchema).parquet(path)
  }

  /** Maintenance observability: per-band row/key counts of the stored
    * tree — the report that tells an operator WHEN to [[compact]]
    * (`n_rows − n_keys` is exactly the cross-batch duplicate volume
    * appends accumulate; after compaction the two are equal). Declared
    * as q_dedup_index_stats with the churned-stage report persisted as a
    * maintenance-log artifact and both stages oracle-checked.
    */
  def stats(spark: SparkSession, path: String, buckets: Int = Buckets): DataFrame =
    load(spark, path, buckets)
      .groupBy("band")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("k1"), col("k2")).as("n_keys"))

  /** Structural fsck — validate the tree WITHOUT a corpus scan (the
    * metadata-only health check an operator runs before the 3 a.m. page;
    * the load-path marker check can only refuse, this DESCRIBES): exactly
    * one `_GRAFT_BUCKETING_*` marker matching the claimed fan, every root
    * entry a `band=<0..bands)` directory (or hidden file), every nested
    * entry a `bucket=<0..fan)` directory, stranded maintenance siblings
    * surfaced. A bucket directory outside the fan is the
    * orphaned-rows corruption class: probes compute buckets inside the
    * fan, so rows there are silently invisible. `deep = true` adds the
    * one O(index) data check structure can't see — every stored row's
    * bucket column equals the probe-side derivation (catches rows copied
    * in from a foreign-fan tree) — priced honestly as a full index read.
    */
  def fsck(spark: SparkSession, path: String, buckets: Int = Buckets,
           deep: Boolean = false): IndexMaintenance.TreeReport = {
    val bands = TextHash.MinhashBands
    val issues = scala.collection.mutable.ArrayBuffer.empty[String]
    issues ++= IndexMaintenance.structuralIssues(spark, path,
      "_GRAFT_BUCKETING_*", markerOf(buckets), "band",
      v => v >= 0 && v < bands)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("band="))
      .foreach { band =>
        fs.listStatus(band.getPath).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith("bucket=")) {
            scala.util.Try(n.stripPrefix("bucket=").toLong).toOption match {
              case Some(v) if v >= 0 && v < buckets => ()
              case _ => issues += s"${band.getPath.getName}/$n is outside " +
                s"the fan [0, $buckets) — its rows are invisible to probes"
            }
          } else if (!n.startsWith("_") && !n.startsWith("."))
            issues += s"foreign entry ${band.getPath.getName}/$n inside a band directory"
        }
      }
    if (deep && issues.isEmpty) {
      val bad = spark.read.schema(AtRestSchema).parquet(path)
        .filter(col("bucket") =!= bucketCol(buckets) ||
          col("band") < 0 || col("band") >= bands)
        .count()
      if (bad > 0)
        issues += s"$bad rows are filed under a bucket their key does not " +
          "hash to under this fan — foreign-fan rows; probes miss them silently"
    }
    IndexMaintenance.TreeReport(issues.toSeq)
  }

  /** (doc_id, n_bands_hit) for every incoming document that shares at
    * least one band key with the stored corpus: any hit flags the doc as
    * a near-dup of something already ingested. The batch is broadcast
    * (incremental batches are small by definition); the index side is
    * the partitioned scan that dynamic partition pruning restricts to
    * the batch's (band, bucket) directories. A probe doc holds ONE key
    * per band, so the distinct hit count IS the number of bands hit —
    * the dropDuplicates (over the probe-bounded join output, metadata-
    * scale) makes the count exact on APPENDED trees too, where a key
    * ingested by two batches legitimately exists twice
    * (see [[append]]).
    */
  def probe(index: DataFrame, batchBanded: DataFrame,
            buckets: Int = Buckets): DataFrame = {
    val batch = batchBanded
      .select(col("doc_id"), col("band"),
              col("key.k1").as("k1"), col("key.k2").as("k2"))
      .withColumn("bucket", bucketCol(buckets))
    index.join(broadcast(batch), Seq("band", "bucket", "k1", "k2"))
      .select(col("doc_id"), col("band"), col("k1"), col("k2")).dropDuplicates()
      .groupBy("doc_id").agg(count(lit(1)).as("n_bands_hit"))
  }

  /** Static-pruning scan of one band's directories: the literal predicate
    * reaches the scan as `PartitionFilters`, so other bands are never
    * listed.
    */
  def probeBand(index: DataFrame, band: Int): DataFrame =
    index.filter(col("band") === band)

  /** The stored index in the (band, key struct) shape the in-memory band
    * join and the STREAMING probe consume
    * ([[graft.streaming.StreamingOps.incrementalDedup]]): the same stored
    * bytes serve batch probes (partition-pruned) and stream-static joins —
    * at-rest ≡ in-memory ≡ streaming, one definition (StreamingSpec pins
    * the equivalence).
    */
  def asBandKey(index: DataFrame): DataFrame =
    index.select(col("band"),
      struct(col("k1").as("k1"), col("k2").as("k2")).as("key"))
}
