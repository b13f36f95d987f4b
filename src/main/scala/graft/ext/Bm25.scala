package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextHash._

/** BM25 keyword retrieval over the documents table — the classic
  * Robertson/Okapi ranking function (public; Lucene's variant of the idf
  * is used: `ln(1 + (N − df + 0.5)/(df + 0.5))`, never negative). A
  * curation stack uses this to pull topical slices out of a corpus
  * without embeddings (e.g. seed-set expansion for a domain filter).
  *
  * Plan shape at 100 TB: the term filter `t ∈ query` lands directly on
  * the exploded token stream, so only matching (doc, term) rows survive
  * into the tf aggregate — the heavy explode never shuffles. Document
  * length is a per-row projection (`size(tokens)`), no second explode.
  * The df/idf table is ≤ |query| rows and the average-doc-length is one
  * scalar — both ride 1-row/broadcast joins (the legitimate
  * scalar-broadcast shape, same exemption as q_text_tfidf's corpus
  * scalar). Top-k compiles to TakeOrderedAndProject.
  *
  * Cross-engine exactness: tf and df are integers; dl/avgdl and the
  * saturation term are IEEE-identical double math; each per-term score is
  * rounded to 9dp BEFORE the per-doc decimal sum (order-independent), and
  * the final score re-rounds to 6dp.
  */
object Bm25 {

  /** Okapi parameters (the standard defaults). */
  val K1 = 1.2
  val B = 0.75

  /** Per-term BM25 contribution, 9dp-rounded for order-independent
    * summation: `idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`.
    * Shared with [[Bm25Index.search]] — one definition, so the at-rest
    * serving path cannot drift from the declared operator's arithmetic.
    */
  private[ext] def termScore(tf: Column, dl: Column, avgdl: Column, idf: Column): Column =
    round(idf * (tf * (K1 + 1.0)) /
      (tf + lit(K1) * (lit(1.0 - B) + lit(B) * dl / avgdl)), 9)

  /** Top-`k` documents for `terms` by BM25. `docs` needs (doc_id, text). */
  def search(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val toks = tokens(col("text"))
    val base = graft.Tables.spreadSmall(docs, col("doc_id"))
      .select(col("doc_id"), size(toks).cast("double").as("dl"),
      explode(toks).as("t"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n"),
      avg(size(tokens(col("text")))).as("avgdl"))
    // cached: tf feeds BOTH the df/idf aggregate and the final join —
    // without it the corpus-wide tokenize+explode scan runs twice per
    // search (same multi-consumer materialization as lshTopK's signature
    // table). In-scope ONLY: the handle never escapes search(), so
    // outside a CacheTracker scope the entry would be unreleasable for
    // the session lifetime (one leak per distinct term set) — there we
    // pay the second scan instead.
    val tf = graft.CacheTracker.cachedInScope(base.filter(col("t").isin(terms: _*))
      .groupBy("doc_id", "dl", "t").agg(count(lit(1)).cast("double").as("tf")))
    val df = tf.groupBy("t").agg(count(lit(1)).cast("double").as("df"))
    val idf = df.crossJoin(broadcast(stats))
      .select(col("t"),
        round(log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)), 9)
          .as("idf"),
        col("avgdl"))
    tf.join(broadcast(idf), Seq("t"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
           round(sum(termScore(col("tf"), col("dl"), col("avgdl"), col("idf"))
                       .cast("decimal(20,9)")).cast("double"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }

  /** The frozen retrieval model for a fixed term set: per-term idf plus
    * the corpus average document length — two metadata-scale numbers per
    * term, the artifact [[scoreInline]] serves from.
    */
  def termStats(docs: DataFrame, terms: Seq[String]): (Seq[(String, Double)], Double) = {
    require(terms.nonEmpty, "terms must be non-empty")
    val toks = tokens(col("text"))
    val base = graft.Tables.spreadSmall(docs, col("doc_id"))
      .select(col("doc_id"), explode(toks).as("t"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n"),
      avg(size(tokens(col("text")))).as("avgdl")).collect()(0)
    require(!stats.isNullAt(1) && stats.getDouble(1) > 0,
      "bm25: corpus is empty or token-less — no model to build")
    val (n, avgdl) = (stats.getDouble(0), stats.getDouble(1))
    val dfMap = base.filter(col("t").isin(terms: _*))
      .select(col("doc_id"), col("t")).distinct()
      .groupBy("t").agg(count(lit(1)).cast("double").as("df"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val idf = terms.map { t =>
      val df = dfMap.getOrElse(t, 0.0)
      t -> BigDecimal(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    (idf, avgdl)
  }

  /** Serving-path BM25: per-term tf via an array count, the same
    * 9dp-rounded saturation arithmetic as [[search]], summed as decimals
    * — ONE projection, zero shuffle, the streaming-admission/100 TB
    * scoring form. For documents matching at least one term this is
    * EXACTLY [[search]]'s `bm25` (unmatched terms contribute a rounded
    * 0.0, which the decimal sum ignores); non-matching documents score
    * 0.0 instead of being absent. Pinned by spec.
    */
  def scoreInline(text: Column, stats: Seq[(String, Double)], avgdl: Double): Column = {
    require(stats.nonEmpty, "stats must be non-empty")
    val toks = tokens(text)
    val dl = size(toks).cast("double")
    val parts = stats.map { case (t, idf) =>
      val tf = size(filter(toks, x => x === t)).cast("double")
      termScore(tf, dl, lit(avgdl), lit(idf)).cast("decimal(20,9)")
    }
    round(parts.reduce((a, b) => (a + b).cast("decimal(20,9)")).cast("double"), 6)
  }

  /** The flagship query's search terms — words from the synthetic vocab. */
  private val Terms = Seq("vector", "stream", "window", "merge")

  /** The stored-index row's term set — deliberately DIFFERENT from
    * [[Terms]] (the index holds postings for the whole vocabulary, so it
    * must answer any query, not the build-time one) and including a term
    * absent from the corpus ("quantum"): an absent term has no postings
    * row, contributes no df/idf entry, and must simply not score — the
    * same closed-form both engines reach independently.
    */
  private val StoredTerms = Seq("join", "scan", "sort", "quantum")

  /** The appended-index row's term set — a third set, so the three BM25
    * rows together pin that the index answers arbitrary queries at every
    * lifecycle stage (fresh build, stored serve, post-append serve).
    */
  private val AppendTerms = Seq("hash", "batch", "filter")

  /** The maintenance row's term set — a fourth, completing the lifecycle
    * coverage (build / stored / appended / compacted+rebucketed).
    */
  private val MaintTerms = Seq("column", "query", "table")

  /** One oracle for the from-scratch and the stored-index faces — the
    * full BM25 replay from the base table, parameterized by term set.
    * The stored index must serve EXACTLY this (idf from the stored doc
    * count, dl/avgdl from the stored postings/meta), so the two rows
    * share the SQL builder and cannot drift.
    */
  private def bm25OracleSql(terms: Seq[String], k: Int): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
       |base AS (
       |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, unnest(toks) AS t
       |  FROM toks
       |),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(toks)) AS avgdl FROM toks
       |),
       |tf AS (
       |  SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
       |  FROM base WHERE t IN ($termList) GROUP BY doc_id, dl, t
       |),
       |idf AS (
       |  SELECT t, round(ln(1.0 + (n - df + 0.5) / (df + 0.5)), 9) AS idf, avgdl
       |  FROM (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY t), stats
       |)
       |SELECT doc_id, count(*) AS n_terms,
       |  round(CAST(sum(CAST(round(idf * (tf * ${K1 + 1.0}) /
       |    (tf + $K1 * (${1.0 - B} + $B * dl / avgdl)), 9) AS DECIMAL(20,9))) AS DOUBLE), 6) AS bm25
       |FROM tf JOIN idf USING (t)
       |GROUP BY doc_id
       |ORDER BY bm25 DESC, doc_id LIMIT $k""".stripMargin
  }

  val queries: Seq[Q] = Seq(

    Q("q_text_bm25", bm25OracleSql(Terms, 20)) { (s, d) =>
      search(Tables.documents(s, d), Terms, 20)
    },

    // ---- BM25 served from the inverted index AT REST ----
    // The retrieval analogue of the at-rest family (DedupIndex /
    // SubstringIndex / AnnIndex / LmGate): a production corpus keeps its
    // postings ON DISK — (term, doc, tf, dl) rows partitioned by
    // pmod(xxhash64(term), B) term-buckets, plus the two frozen corpus
    // scalars (N, avgdl) in a meta file — and a query reads only the
    // bucket directories its own terms hash to (dynamic partition
    // pruning via the broadcast term-set join; Bm25IndexSpec asserts it
    // on the executed plan). Per-query work at 100 TB: b ≤ |terms|
    // directory scans + term-bounded aggregates + one top-k — the corpus
    // explode happens ONCE at build (write-once, memoized per
    // JVM+dataset here), never per query; [[search]] by contrast
    // re-tokenizes the corpus on every call. The term set differs from
    // q_text_bm25's and includes an absent term, so the row also proves
    // the index answers arbitrary queries, not the build-time one. The
    // oracle replays everything from the base table.
    Q("q_text_bm25_stored", bm25OracleSql(StoredTerms, 20)) { (s, d) =>
      val root = StoredArtifacts.of(s"bm25-index|$d") { r =>
        Bm25Index.write(Tables.documents(s, d), r)
      }
      Bm25Index.search(Bm25Index.load(s, root), StoredTerms, 20)
    },

    // ---- the APPENDED postings index serves the grown corpus ----
    // Index maintenance closes the retrieval loop: a corpus grows by
    // document batch, and re-exploding 100 TB per ingest is the cost the
    // index exists to avoid. [[Bm25Index.append]] adds ONLY the batch's
    // postings (new doc_ids → new (doc, term) rows; base files untouched)
    // and folds the batch's (n, Σdl, n_dl) into the stored scalars by
    // integer addition — bit-identical to a from-scratch rebuild below
    // 2⁵³ total tokens, so idf/avgdl are EXACTLY the grown corpus's, not
    // an approximation that drifts per ingest. Here the even-id half is
    // indexed, the odd-id half appended, and a third term set is served
    // from the merged tree; the oracle replays BM25 over the full corpus
    // from the base table, so stale scalars, lost postings, or a
    // double-counted batch cannot match. Serving stays statically
    // bucket-pruned (same plan as q_text_bm25_stored).
    Q("q_text_bm25_append", bm25OracleSql(AppendTerms, 20)) { (s, d) =>
      val root = StoredArtifacts.of(s"bm25-append|$d") { r =>
        val docs = Tables.documents(s, d)
        Bm25Index.write(docs.filter(col("doc_id") % 2 === 0), r)
        Bm25Index.append(docs.filter(col("doc_id") % 2 =!= 0), r)
      }
      Bm25Index.search(Bm25Index.load(s, root), AppendTerms, 20)
    },

    // ---- the COMPACTED + FAN-MIGRATED postings tree serves unchanged ----
    // The maintenance half of the lifecycle, driver-verified: after the
    // same write → append sequence as q_text_bm25_append the tree is
    // compacted (one chunky file per bucket again) and rebucketed 16 → 8
    // — a DOWN-migration, so every posting provably moves to a directory
    // a 16-fan probe would never read: serving at the old fan is
    // marker-refused (IndexMaintenanceSpec), serving at the new fan must
    // hash-match the same full-corpus oracle as the append row, on a
    // fourth term set. Meta scalars ride the swap verbatim; pruning stays
    // static (`tb IN` literals computed at the new fan).
    Q("q_text_bm25_maint", bm25OracleSql(MaintTerms, 20)) { (s, d) =>
      val root = StoredArtifacts.of(s"bm25-maint|$d") { r =>
        val docs = Tables.documents(s, d)
        Bm25Index.write(docs.filter(col("doc_id") % 2 === 0), r)
        Bm25Index.append(docs.filter(col("doc_id") % 2 =!= 0), r)
        Bm25Index.compact(s, r)
        Bm25Index.rebucket(s, r, Bm25Index.Buckets, Bm25Index.Buckets / 2)
      }
      Bm25Index.search(Bm25Index.load(s, root, Bm25Index.Buckets / 2),
        MaintTerms, 20)
    }
  )
}
