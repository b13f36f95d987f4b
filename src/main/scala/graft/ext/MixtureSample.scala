package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic data-mixture sampling: re-weight a corpus to target
  * per-domain sampling rates, the standard LLM-training "data mixing"
  * step (domain weights as in The Pile / DoReMi-style recipes — public
  * technique; the reference has no curation surface).
  *
  * A weight w means each document of that domain appears
  * `floor(w) + Bernoulli(w - floor(w))` times: w = 2.5 duplicates every
  * doc twice and keeps a third copy for half of them; w = 0.25 keeps a
  * quarter; w = 0 drops the domain.
  *
  * The Bernoulli draw is a HASH THRESHOLD, not an RNG: keep the extra
  * copy iff the first 8 hex chars of `md5(doc_id ‖ ':' ‖ salt)` compare
  * below the weight's fractional part rendered as 8 hex chars. That makes
  * the sample
  *
  *  - exactly reproducible (same inputs → same corpus, across engines —
  *    the DuckDB oracle replays the identical arithmetic),
  *  - stable under corpus growth (a doc's fate never depends on other
  *    rows — no global count, no shuffle, no RNG seed-order sensitivity),
  *  - re-drawable (change `salt` to get an independent sample).
  *
  * Plan shape: one narrow codegen'd projection + `explode(sequence)` for
  * the copy fan-out. Zero shuffles, zero collects; the weights map is a
  * literal `CASE` chain. At 100 TB this is a pure map stage that fuses
  * into whatever consumes it.
  */
object MixtureSample {

  /** Fractional part f ∈ [0, 1) as 8 lowercase hex chars, the comparison
    * threshold against the md5 prefix (uniform over [0, 2³²)).
    */
  private[ext] def fracHex(w: Double): String = {
    val f = w - math.floor(w)
    f"${(f * 4294967296.0).toLong}%08x"
  }

  /** `(doc_id, source, copy)` — one row per retained copy, `copy` in
    * 1..copies. Domains absent from `weights` use `defaultWeight`.
    */
  def mixtureSample(docs: DataFrame, weights: Map[String, Double],
                    defaultWeight: Double = 1.0, salt: String = "mix"): DataFrame = {
    require(weights.values.forall(_ >= 0.0) && defaultWeight >= 0.0,
      "weights must be non-negative")
    val base: Column = weights.foldLeft(lit(math.floor(defaultWeight).toLong)) {
      case (acc, (dom, w)) => when(col("source") === dom, lit(math.floor(w).toLong)).otherwise(acc)
    }
    val thr: Column = weights.foldLeft(lit(fracHex(defaultWeight))) {
      case (acc, (dom, w)) => when(col("source") === dom, lit(fracHex(w))).otherwise(acc)
    }
    val hx = substring(md5(concat(col("doc_id").cast("string"), lit(":" + salt))), 1, 8)
    docs
      .select(col("doc_id"), col("source"),
        (base + when(hx < thr, 1L).otherwise(0L)).as("copies"))
      .filter(col("copies") >= 1)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("copies"))).as("copy"))
  }

  /** Token-budget sampling: downsample each domain so its expected kept
    * token mass hits `budgetTokens × share(domain)` — the "sample the
    * corpus to B tokens with these proportions" step of a pretraining
    * data recipe. Rates are DERIVED IN-QUERY from the actual per-domain
    * token mass (`least(1, B·share / domain_tokens)`), so the operator is
    * a pure function of corpus + literals; a domain already under budget
    * keeps everything (rate caps at 1 — this op never upsamples; compose
    * [[mixtureSample]] for that).
    *
    * Same hash-threshold draw as [[mixtureSample]], but the threshold is
    * a COMPUTED column: the rate renders to 8 hex chars via
    * `format_string` and compares against the md5 prefix — both engines
    * produce identical lowercase hex, and the rate arithmetic is
    * identical IEEE-754 double math, so the DuckDB oracle replays the
    * draw bit-exactly. Token count is the whitespace estimate
    * `length(text) − length(replace(text,' ','')) + 1`, computed with the
    * same expression on both sides.
    *
    * Plan shape: one metadata-scale aggregate (#domains rows) broadcast
    * back onto a pure projection — no corpus-wide shuffle, no collect.
    */
  def tokenBudgetSample(docs: DataFrame, budgetTokens: Long,
                        shares: Map[String, Double], defaultShare: Double,
                        salt: String = "budget"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(shares.values.forall(_ >= 0.0) && defaultShare >= 0.0,
      "shares must be non-negative")
    val tok = docs.select(col("doc_id"), col("source"),
      TextHash.wsTokenCount(col("text")).as("n_tokens"))
    val dom = tok.groupBy("source")
      .agg(sum(col("n_tokens")).cast("long").as("dom_tokens"))
    val share: Column = shares.foldLeft(lit(defaultShare)) {
      case (acc, (d, s)) => when(col("source") === d, lit(s)).otherwise(acc)
    }
    val rate = least(lit(1.0),
      lit(budgetTokens.toDouble) * share / col("dom_tokens"))
    val hx = substring(md5(concat(col("doc_id").cast("string"), lit(":" + salt))), 1, 8)
    tok.join(broadcast(dom), Seq("source"))
      .withColumn("rate", rate)
      .filter(col("rate") >= 1.0 ||
        hx < format_string("%08x", floor(col("rate") * 4294967296.0).cast("long")))
      .select(col("doc_id"), col("source"), col("n_tokens"))
  }

  // Flagship mixture: upsample src0 2.5×, keep a quarter of src1, drop
  // src2 entirely, pass everything else through at 1×.
  private val W: Map[String, Double] = Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0)
  private val MaxCopies = 3 // static series bound for the oracle: max ceil(w)

  /** Docs kept per cluster by `q_sample_cluster_cap` (declared before
    * `queries`: the oracle string interpolates it at object init).
    */
  val ClusterCapM = 3

  val queries: Seq[Q] = Seq(
    Q("q_sample_mixture", {
      val baseCase = W.map { case (d, w) => s"WHEN '$d' THEN ${math.floor(w).toLong}" }
        .mkString(" ")
      val thrCase = W.map { case (d, w) => s"WHEN '$d' THEN '${fracHex(w)}'" }
        .mkString(" ")
      s"""WITH c AS (
         |  SELECT doc_id, source,
         |    CAST(CASE source $baseCase ELSE 1 END AS BIGINT)
         |    + CASE WHEN substr(md5(doc_id::varchar || ':mix'), 1, 8) <
         |             (CASE source $thrCase ELSE '${fracHex(1.0)}' END)
         |           THEN 1 ELSE 0 END AS copies
         |  FROM documents)
         |SELECT doc_id, source, t.i AS copy
         |FROM c JOIN generate_series(1, $MaxCopies) t(i) ON t.i <= copies
         |ORDER BY doc_id, copy""".stripMargin
    }) { (s, d) =>
      mixtureSample(Tables.documents(s, d), W).orderBy("doc_id", "copy")
    },

    // ---- sample to a token budget with target domain shares ----
    Q("q_sample_token_budget",
      s"""WITH tok AS (
        |  SELECT doc_id, source,
        |    ${TextHash.wsTokenCountSql("text")} AS n_tokens
        |  FROM documents
        |),
        |dom AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS dom_tokens FROM tok GROUP BY source),
        |rated AS (
        |  SELECT t.doc_id, t.source, t.n_tokens,
        |    least(1.0, (8000.0 * (CASE t.source WHEN 'src0' THEN 0.3 WHEN 'src1' THEN 0.1 ELSE 0.03 END)) / d.dom_tokens) AS rate
        |  FROM tok t JOIN dom d USING (source)
        |)
        |SELECT doc_id, source, n_tokens
        |FROM rated
        |WHERE rate >= 1.0
        |   OR substr(md5(doc_id::varchar || ':budget'), 1, 8) <
        |      printf('%08x', CAST(floor(rate * 4294967296.0) AS BIGINT))
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      tokenBudgetSample(Tables.documents(s, d), budgetTokens = 8000L,
        shares = Map("src0" -> 0.3, "src1" -> 0.1), defaultShare = 0.03)
        .orderBy("doc_id")
    },

    // ---- semantic-diversity cap: at most m docs per embedding cluster ----
    // Flattens semantic skew: a corpus region that is over-represented in
    // embedding space (one dense IVF cell) contributes at most
    // [[ClusterCapM]] documents, while sparse regions keep everything — the
    // "cluster-then-cap" diversity sampling step of a curation recipe
    // (complement of SemDeDup, which removes only near-identical pairs).
    //
    // The keep-order within a cell is a HASH of the id, not an RNG and not
    // arrival order: deterministic, engine-portable, and unbiased w.r.t.
    // document content. Plan shape: cell assignment is the same
    // projection-only CentroidAssign as q_embed_ivf (no join, no
    // shuffle), then ONE window keyed by cid — a single exchange whose
    // per-cell work is linear in cell size, safe under skew at any N.
    Q("q_sample_cluster_cap",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 25 = 0),
         |asn AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_dot_product(e.v, c.cv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC, c.cid) AS rn
         |    FROM e, c
         |  ) WHERE rn = 1
         |)
         |SELECT cid, vec_id, rk, cell_n FROM (
         |  SELECT cid, vec_id,
         |    row_number() OVER (PARTITION BY cid
         |      ORDER BY md5(vec_id::varchar || ':cap'), vec_id) AS rk,
         |    count(*) OVER (PARTITION BY cid) AS cell_n
         |  FROM asn
         |) WHERE rk <= $ClusterCapM ORDER BY cid, rk""".stripMargin) { (s, d) =>
      val vecs = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      clusterCap(vecs, Similarity.centroidSet(vecs, 25), ClusterCapM)
        .orderBy("cid", "rk")
    }
  )

  /** At most `m` rows per embedding cluster, hash-ordered within the
    * cell. `vecDf` needs (vec_id, v); centroids come from the caller so
    * the cap composes with strided or k-means-refined cells alike.
    */
  def clusterCap(vecDf: DataFrame,
                 cents: Seq[(Long, Seq[Double], Double)], m: Int): DataFrame = {
    require(m > 0, "m must be positive")
    // empty centroids would make cidExpr lit(null): every row lands in one
    // null-cid partition and m hash-arbitrary rows survive with cid=null —
    // silently wrong where the oracle shape yields zero rows
    require(cents.nonEmpty, "clusterCap needs a non-empty centroid set")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cid")
    val ord = w.orderBy(md5(concat(col("vec_id").cast("string"), lit(":cap"))),
                        col("vec_id"))
    vecDf.select(col("vec_id"), Similarity.cidExpr(cents).as("cid"))
      .withColumn("rk", row_number().over(ord))
      .withColumn("cell_n", count(lit(1)).over(w))
      .filter(col("rk") <= m)
      .select("cid", "vec_id", "rk", "cell_n")
  }
}
