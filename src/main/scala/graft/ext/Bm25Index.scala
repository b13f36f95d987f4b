package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import TextHash._

/** The BM25 inverted index AT REST — the retrieval member of the
  * at-rest-artifact family ([[DedupIndex]] bands, [[SubstringIndex]]
  * shingles, [[AnnIndex]] cells, [[LmGate]] counts):
  *
  *  - [[write]] tokenizes the corpus ONCE and stores one postings row per
  *    (term, document) — `(t, doc_id, dl, tf)` — PARTITIONED BY
  *    `tb = pmod(xxhash64(t), Buckets)`. A term's postings land in
  *    exactly one bucket directory, so term selectivity becomes
  *    file-listing selectivity: a query touching q distinct buckets reads
  *    q directories, never the corpus. The two corpus scalars the ranking
  *    needs — document count `n` (the idf numerator) and average document
  *    length `avgdl` (the length normalizer) — are frozen properties of
  *    the indexed corpus, stored in a 1-row meta file.
  *  - [[search]] joins the stored postings against the broadcast term set
  *    on `(tb, t)`; the partition column is a join key, so Spark's
  *    dynamic partition pruning turns the broadcast into a runtime
  *    partition filter on the scan (Bm25IndexSpec asserts `dynamicpruning`
  *    on the executed plan). df/idf are per-term aggregates of the pruned
  *    rows (≤ |terms| output rows); the stored scalars ride as literals —
  *    the served plan has NO corpus-wide aggregate and no scalar cross
  *    join. Arithmetic is [[Bm25.termScore]] itself (one shared
  *    definition), so stored serving is bit-identical to
  *    [[Bm25.search]]'s from-scratch scores — pinned by spec and by the
  *    shared driver oracle (q_text_bm25_stored).
  *
  * Contrast at 100 TB: [[Bm25.search]] re-tokenizes and re-explodes the
  * corpus per query (fine for one-off slicing); this index pays that scan
  * once at build and serves every subsequent query from q bucket
  * directories. The bucket fan is a version-stamped layout parameter
  * (same [[IndexVersion]] discipline as the other trees): probing a tree
  * written under a different fan or hash would read the wrong directories
  * and silently miss every posting, so [[load]] refuses a marker
  * mismatch.
  */
object Bm25Index {

  /** Term-bucket fan. Same sizing logic as [[DedupIndex.Buckets]]:
    * directory count is a fixed listing/commit cost, directory size is
    * the probe's scan unit — raise with corpus size so each bucket stays
    * ~one chunky file.
    */
  val Buckets = 16

  /** Layout marker: v2 = `pmod(xxhash64(t), buckets)` bucketing with the
    * fan baked into the name, meta scalars in ADDITIVE long form
    * (n, sum_dl, n_dl — v1 stored pre-divided doubles, which an
    * incremental append cannot update exactly). A tree written under a
    * different fan or meta layout fails the name check, not just a
    * doc-comment contract.
    */
  private[graft] def markerOf(buckets: Int): String = s"_GRAFT_BM25_2_b$buckets"

  /** The postings rows: whole-corpus tokenize → explode → per-(doc, term)
    * tf, with the document length denormalized onto each row (it rides
    * the groupBy key — no second tokenize pass, no join at serve time).
    * Exactly [[Bm25.search]]'s tf table plus the bucket column.
    */
  private[ext] def postings(docs: DataFrame, buckets: Int): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(col("doc_id"), size(toks).cast("double").as("dl"),
        explode(toks).as("t"))
      .groupBy("doc_id", "dl", "t").agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("tb", pmod(xxhash64(col("t")), lit(buckets)))
  }

  /** The corpus scalars, in their ADDITIVE form: total doc count (the idf
    * numerator), the exact integer sum of document token lengths, and the
    * count of docs contributing a length (null-text docs count toward `n`
    * but not toward the average — the same semantics as
    * `avg(size(tokens))`). Stored as longs so [[append]]'s update is pure
    * integer addition — bit-identical to a from-scratch recompute at any
    * corpus below 2⁵³ total tokens (integer sums are exact in doubles
    * there, which is also why the from-scratch `avg` agrees with the
    * oracle regardless of summation order).
    */
  private def scalars(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n"),
      coalesce(sum(size(tokens(col("text"))).cast("long")), lit(0L)).as("sum_dl"),
      count(size(tokens(col("text")))).as("n_dl"))

  /** Build and persist: one corpus scan for the postings (the pre-write
    * repartition on the partition column is load-bearing — without it
    * every task writes a sliver into every bucket directory), one for the
    * additive scalars. Marker lands LAST, so a killed write is refused at
    * load (the [[LmGate]] partial-write lesson).
    */
  def write(docs: DataFrame, path: String, buckets: Int = Buckets): Unit = {
    scalars(docs)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta.parquet")
    postings(docs, buckets).repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings.parquet")
    IndexVersion.stamp(docs.sparkSession, path, markerOf(buckets))
  }

  /** Incremental append: index a batch of NEW documents into the stored
    * tree — O(batch), base part files never rewritten. A new doc's
    * postings rows are new (doc, term) pairs by construction, so the
    * parquet append is exact; the corpus scalars update by integer
    * addition of the batch's own (n, sum_dl, n_dl), which is
    * bit-identical to a from-scratch rebuild (spec-pinned, and the
    * declared q_text_bm25_append row proves it against the full-corpus
    * oracle). The meta REWRITE is the ordering hazard here, not the
    * postings append: new meta lands only after the postings rows do, so
    * a crash between the two leaves the old scalars with extra postings —
    * df/tf correct, idf/avgdl slightly stale — rather than scalars
    * counting documents whose postings never landed. PRECONDITION (the
    * [[AnnIndex.append]] contract): the batch's doc_ids are disjoint from
    * the indexed corpus — a replayed doc would double its tf rows;
    * at-least-once dedup belongs upstream. The marker is checked BEFORE
    * any write, so appending into a tree bucketed under a different fan
    * is refused before bad rows land.
    */
  def append(docs: DataFrame, path: String, buckets: Int = Buckets): Unit = {
    val s = docs.sparkSession
    IndexVersion.check(s, path, markerOf(buckets),
      "BM25 postings index (refusing to append under a different bucket " +
        "fan or hash than the stored tree's — the mixed tree would route " +
        "probes to the wrong directories)")
    postings(docs, buckets).repartition(col("tb"))
      .write.mode("append").partitionBy("tb").parquet(s"$path/postings.parquet")
    val old = s.read.parquet(s"$path/meta.parquet").collect()(0)
    val b = scalars(docs).collect()(0)
    import s.implicits._
    Seq((old.getAs[Long]("n") + b.getAs[Long]("n"),
         old.getAs[Long]("sum_dl") + b.getAs[Long]("sum_dl"),
         old.getAs[Long]("n_dl") + b.getAs[Long]("n_dl")))
      .toDF("n", "sum_dl", "n_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta.parquet")
  }

  /** A loaded index: the postings scan plus the frozen corpus scalars
    * (re-derived from their additive form: `avgdl = sum_dl / n_dl`, one
    * double division of exact integers — the identical value Spark's
    * `avg` and DuckDB's `avg` reach).
    */
  final case class Index(postings: DataFrame, n: Double, avgdl: Double,
                         buckets: Int) {
    require(avgdl > 0,
      "bm25 index: stored avgdl is not positive — the indexed corpus was " +
        "empty or token-less; no query can be answered from it")
  }

  /** The partition column comes back through directory-name inference
    * (int for small fans) — pin it to long so the probe join never leans
    * on implicit casts (same rule as [[AnnIndex.load]]).
    */
  def load(spark: SparkSession, path: String, buckets: Int = Buckets): Index = {
    IndexVersion.check(spark, path, markerOf(buckets),
      "BM25 postings index (the stored tree was bucketed under a " +
        "different fan or hash than the probe computes — every lookup " +
        "would read the wrong directory and silently miss)")
    val m = spark.read.parquet(s"$path/meta.parquet").collect()(0)
    Index(spark.read.parquet(s"$path/postings.parquet")
            .withColumn("tb", col("tb").cast("long")),
          m.getAs[Long]("n").toDouble,
          m.getAs[Long]("sum_dl").toDouble / m.getAs[Long]("n_dl"), buckets)
  }

  /** The bucket of a literal term, computed at PLAN time with the same
    * catalyst expressions the write side's column uses (XxHash64 seed-42 →
    * Pmod) — `eval()` runs the identical hash codepath codegen compiles,
    * so a driver-computed bucket can never drift from a stored row's
    * (Bm25IndexSpec pins the agreement against engine-computed rows).
    */
  private[graft] def bucketOf(term: String, buckets: Int): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Pmod, XxHash64}
    Pmod(new XxHash64(Seq(Literal(term))), Literal(buckets.toLong))
      .eval().asInstanceOf[Long]
  }

  /** Top-`k` documents for `terms`, served entirely from the stored tree:
    * the query's buckets are computed at plan time ([[bucketOf]]), so the
    * postings scan carries a LITERAL `tb IN (…)` partition filter —
    * static pruning, stronger than the dynamic variant (no runtime
    * subquery; unprobed bucket directories are never listed; Bm25IndexSpec
    * asserts `PartitionFilters` on the executed plan). df comes from the
    * pruned rows (postings are one row per (doc, term), so the per-term
    * row count IS the document frequency), idf/avgdl ride as literals of
    * the frozen scalars, and the per-term contribution is
    * [[Bm25.termScore]] — the identical 9dp-round/decimal-sum contract,
    * so results hash-match [[Bm25.search]] over the same corpus. An
    * absent term has no postings and therefore no df/idf row — it simply
    * never scores, in both engines. The pruned scan runs twice (df, then
    * the score join) — both legs read only the q probed buckets, which is
    * the cheap side of the trade (caching would pin partitions and hide
    * the pruning the spec asserts).
    */
  def search(idx: Index, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val tbs = terms.map(bucketOf(_, idx.buckets)).distinct
    val tf = idx.postings
      .filter(col("tb").isin(tbs: _*) && col("t").isin(terms: _*))
      .select(col("doc_id"), col("dl"), col("t"), col("tf"))
    val idf = tf.groupBy("t").agg(count(lit(1)).cast("double").as("df"))
      .select(col("t"),
        round(log(lit(1.0) + (lit(idx.n) - col("df") + 0.5) / (col("df") + 0.5)), 9)
          .as("idf"))
    tf.join(broadcast(idf), Seq("t"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        round(sum(Bm25.termScore(col("tf"), col("dl"), lit(idx.avgdl), col("idf"))
                    .cast("decimal(20,9)")).cast("double"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }
}
