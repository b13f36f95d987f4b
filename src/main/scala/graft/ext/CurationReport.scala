package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The curation funnel as ONE oracle-checked report: every candidate
  * document annotated with its fate at each gate — quality cut, exact
  * keep-first dedup, benchmark decontamination — then counted per source
  * domain. This is the governance artifact a corpus build publishes
  * ("how much did each domain lose at each stage"), and it proves the
  * individual operators COMPOSE inside the driver-verified surface, not
  * just in specs.
  *
  * Plan shape: one corpus pass computes the flags — the quality gate is a
  * projection; keep-first is one window keyed by the content hash; the
  * contamination flag joins the exploded shingle stream against the
  * (broadcastable) benchmark shingle set, aggregated back to one row per
  * doc. The report itself is a per-source hash aggregate over the flags —
  * output bounded by #domains. Nothing pairs documents; every join is an
  * equi-join on a derived key.
  */
object CurationReport {

  /** Quality gate: minimum whitespace-token count. */
  val MinTokens = 50

  val queries: Seq[Q] = Seq(

    Q("q_curation_report", {
      s"""WITH base AS (
         |  SELECT doc_id, source, text,
         |    ${TextHash.wsTokenCountSql("text")} AS n_toks
         |  FROM documents
         |),
         |cand AS (SELECT * FROM base WHERE doc_id % 97 <> 0),
         |q AS (SELECT * FROM cand WHERE n_toks >= $MinTokens),
         |u AS (
         |  SELECT doc_id, CASE WHEN rn = 1 THEN 1 ELSE 0 END AS first_keep FROM (
         |    SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM q
         |  )
         |),
         |sh AS (${Dedup.shingleHashFrom}),
         |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0),
         |dirty AS (
         |  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (h)
         |  JOIN q ON q.doc_id = s.doc_id
         |),
         |flags AS (
         |  SELECT c.source, c.n_toks,
         |    CASE WHEN c.n_toks >= $MinTokens THEN 1 ELSE 0 END AS pass_q,
         |    coalesce(u.first_keep, 0) AS uniq,
         |    CASE WHEN coalesce(u.first_keep, 0) = 1 AND d.doc_id IS NULL
         |         THEN 1 ELSE 0 END AS clean
         |  FROM cand c
         |  LEFT JOIN u ON u.doc_id = c.doc_id
         |  LEFT JOIN dirty d ON d.doc_id = c.doc_id
         |)
         |SELECT source, count(*) AS n_raw,
         |  CAST(sum(pass_q) AS BIGINT) AS n_quality,
         |  CAST(sum(uniq) AS BIGINT) AS n_unique,
         |  CAST(sum(clean) AS BIGINT) AS n_clean,
         |  CAST(sum(CASE WHEN clean = 1 THEN n_toks ELSE 0 END) AS BIGINT) AS clean_tokens
         |FROM flags GROUP BY source ORDER BY source""".stripMargin
    }) { (s, d) =>
      report(Tables.documents(s, d), col("doc_id") % 97 === 0)
    },

    // ---- the funnel SERVED from the at-rest artifacts, declared ----
    // The steady-state admission run (see [[servedReport]]): the corpus
    // (non-bench, even ids) is already ingested — its capped smoothed LM
    // gate, its MinHash band index, and the eval suite's Bloom bits all
    // live ON DISK (built once per JVM+dataset, like the dedup index
    // queries) — and the incoming batch (non-bench, odd ids) flows
    // quality → novelty → decontamination served ENTIRELY from those
    // artifacts. The oracle re-derives every stage from the base tables:
    // the capped/smoothed scores and the frozen tercile cut pair replay
    // q_text_ppl_capped's chain, the band-hit probe replays
    // q_dedup_incremental's EXISTS, and the Bloom membership replays
    // q_text_bloom_decontam's bit arithmetic — so the DRIVER (not just
    // CurationE2ESpec) verifies that the composed at-rest serving path
    // equals the from-scratch semantics.
    Q("q_curation_stored", {
      val m = TextAnalysis.BloomM
      def bitSql(i: Int, e: String) = {
        val (a, b) = TextHash.MinhashPerms(i)
        s"(((($e % ${TextHash.Mersenne31}) * $a + $b) % ${TextHash.Mersenne31}) % $m)"
      }
      val benchBits = (0 until 3).map(i =>
        s"SELECT DISTINCT ${bitSql(i, "h")} AS bit FROM bench_sh")
        .mkString(" UNION ")
      val bandHit = (0 until TextHash.MinhashBands).map { b =>
        s"""EXISTS (SELECT 1 FROM sigs e
           |      WHERE e.doc_id % 97 <> 0 AND e.doc_id % 2 = 0
           |        AND e.sig_${2 * b} = i.sig_${2 * b}
           |        AND e.sig_${2 * b + 1} = i.sig_${2 * b + 1})""".stripMargin
      }.mkString("\n    OR ")
      val smoothedScore =
        """round(CAST(sum(CAST(round(ln(CAST(coalesce(c12, 0) + 1 AS DOUBLE)
          |      / CAST(coalesce(c1, 0) + vsz AS DOUBLE)), 9) AS DECIMAL(20,9))) AS DOUBLE)
          |      / count(*), 6)""".stripMargin
      s"""WITH toks AS (SELECT doc_id, ${TextHash.tokensSql("text")} AS toks FROM documents),
         |bg AS (
         |  SELECT doc_id, sh[1] AS w1, sh[2] AS w2 FROM (
         |    SELECT doc_id, string_split(b, ' ') AS sh FROM (
         |      SELECT doc_id, unnest(${TextHash.shinglesFromTokensSql("toks", 2)}) AS b FROM toks
         |    )
         |  )
         |),
         |cbg AS (SELECT * FROM bg WHERE doc_id % 97 <> 0 AND doc_id % 2 = 0),
         |c12full AS (SELECT w1, w2, count(*) AS c12 FROM cbg GROUP BY w1, w2),
         |c12 AS (
         |  SELECT w1, w2, c12 FROM (
         |    SELECT w1, w2, c12,
         |      row_number() OVER (ORDER BY c12 DESC, w1 || ' ' || w2) AS rn
         |    FROM c12full
         |  ) WHERE rn <= 500
         |),
         |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
         |v AS (SELECT count(*) AS vsz FROM c1),
         |corpus_scored AS (
         |  SELECT doc_id, $smoothedScore AS s
         |  FROM cbg LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)
         |  CROSS JOIN v GROUP BY doc_id
         |),
         |bnd AS (
         |  SELECT s AS bs, doc_id AS bi FROM (
         |    SELECT doc_id, s,
         |      row_number() OVER (ORDER BY s DESC, doc_id) AS rk,
         |      count(*) OVER () AS total
         |    FROM corpus_scored
         |  ) WHERE rk = 2 * (total // 3) + least(2, total % 3)
         |),
         |batch_scored AS (
         |  SELECT doc_id, $smoothedScore AS s
         |  FROM (SELECT * FROM bg WHERE doc_id % 97 <> 0 AND doc_id % 2 = 1)
         |  LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)
         |  CROSS JOIN v GROUP BY doc_id
         |),
         |q AS (
         |  SELECT b.doc_id FROM batch_scored b, bnd
         |  WHERE b.s > bnd.bs OR (b.s = bnd.bs AND b.doc_id <= bnd.bi)
         |),
         |sigs AS ($minhashSigsSql),
         |dup AS (
         |  SELECT i.doc_id FROM sigs i
         |  WHERE i.doc_id % 97 <> 0 AND i.doc_id % 2 = 1
         |    AND ($bandHit)
         |),
         |sh AS (${Dedup.shingleHashFrom}),
         |bench_sh AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0),
         |bits AS ($benchBits),
         |dirty AS (
         |  SELECT DISTINCT p.doc_id FROM (
         |    SELECT doc_id, ${bitSql(0, "h")} AS bit0, ${bitSql(1, "h")} AS bit1,
         |      ${bitSql(2, "h")} AS bit2
         |    FROM sh WHERE doc_id % 97 <> 0 AND doc_id % 2 = 1
         |  ) p
         |  JOIN bits b0 ON b0.bit = p.bit0
         |  JOIN bits b1 ON b1.bit = p.bit1
         |  JOIN bits b2 ON b2.bit = p.bit2
         |),
         |base AS (
         |  SELECT doc_id, source, ${TextHash.wsTokenCountSql("text")} AS n_toks
         |  FROM documents WHERE doc_id % 97 <> 0 AND doc_id % 2 = 1
         |),
         |flags AS (
         |  SELECT b.source, b.n_toks,
         |    CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END AS pq,
         |    CASE WHEN q.doc_id IS NOT NULL AND dup.doc_id IS NULL
         |         THEN 1 ELSE 0 END AS nv,
         |    CASE WHEN q.doc_id IS NOT NULL AND dup.doc_id IS NULL
         |              AND dirty.doc_id IS NULL THEN 1 ELSE 0 END AS cl
         |  FROM base b
         |  LEFT JOIN q ON q.doc_id = b.doc_id
         |  LEFT JOIN dup ON dup.doc_id = b.doc_id
         |  LEFT JOIN dirty ON dirty.doc_id = b.doc_id
         |)
         |SELECT source, count(*) AS n_raw,
         |  CAST(sum(pq) AS BIGINT) AS n_quality,
         |  CAST(sum(nv) AS BIGINT) AS n_novel,
         |  CAST(sum(cl) AS BIGINT) AS n_clean,
         |  CAST(sum(CASE WHEN cl = 1 THEN n_toks ELSE 0 END) AS BIGINT) AS clean_tokens
         |FROM flags GROUP BY source ORDER BY source""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val isBench = col("doc_id") % 97 === 0
      val isOdd = col("doc_id") % 2 === 1
      // cache ONLY the batch's bands: the ingested-corpus half is needed
      // once, inside the memoized artifact build — caching the full banded
      // frame re-computed the corpus bands on every timed rep (r17)
      val batchBands = Dedup.mhBandedDf(s, d).filter(!isBench && isOdd)
        .transform(graft.CacheTracker.cached)
      val root = StoredArtifacts.of(s"curation-funnel|$d") { r =>
        LmGate.write(docs.filter(!isBench && !isOdd), s"$r/gate",
          mode = LmGate.Mode.Addone, maxBigrams = 500)
        DedupIndex.write(Dedup.mhBandedDf(s, d).filter(!isBench && !isOdd),
          s"$r/dedup")
        TextAnalysis.writeBloomBits(
          Dedup.shingleHash(docs.filter(isBench)), s"$r/bloom")
      }
      servedReport(docs.filter(!isBench && isOdd),
        batchBands,
        DedupIndex.load(s, s"$root/dedup"),
        LmGate.load(s, s"$root/gate"),
        TextAnalysis.loadBloomBits(s, s"$root/bloom"))
    }
  )

  /** SQL mirror of the minhash signature table ([[Dedup.minhashSelect]]),
    * aliased locally so the oracle string above reads as one chain.
    */
  private def minhashSigsSql: String = Dedup.minhashSelect

  /** The funnel over any `(doc_id, source, text)` frame; `benchPred`
    * marks the held-out evaluation documents (excluded from the corpus,
    * their shingles form the contamination set). `q_curation_report` is
    * this over the documents table.
    *
    * The dirty flag is [[TextAnalysis.contaminationScore]] membership —
    * ONE definition of the decontamination check across the engine.
    * `strategy` defaults to [[TextAnalysis.ContamStrategy.Exact]] (the
    * declared oracle replays exact membership); pass `Auto()`/`Bloom` to
    * bound the shipped benchmark side when the eval suite outgrows a sane
    * broadcast — Bloom's deterministic false positives then over-flag
    * dirty, never under-flag.
    */
  def report(docs: org.apache.spark.sql.DataFrame,
             benchPred: org.apache.spark.sql.Column,
             strategy: TextAnalysis.ContamStrategy =
               TextAnalysis.ContamStrategy.Exact): org.apache.spark.sql.DataFrame = {
      val base = docs
        .select(col("doc_id"), col("source"), col("text"),
          TextHash.wsTokenCount(col("text")).as("n_toks"), benchPred.as("is_bench"))
      val cand = base.filter(!col("is_bench"))
      val q = cand.filter(col("n_toks") >= MinTokens)
      val u = q.select(col("doc_id"),
          row_number().over(
            Window.partitionBy(md5(col("text"))).orderBy("doc_id")).as("rn"))
        .select(col("doc_id"),
          when(col("rn") === 1, 1).otherwise(0).as("first_keep"))
      // only quality-passed docs can be flagged dirty (the clean flag
      // already requires first_keep, which requires the quality gate), so
      // the shingle explode — the funnel's heaviest stage — skips every
      // document whose fate the first gate already sealed. Membership is
      // the shared contaminationScore operator over the shared
      // shingle-hash shape — not a re-derivation that could drift.
      val dirty = TextAnalysis.contaminationScore(
          Dedup.shingleHash(q),
          Dedup.shingleHash(base.filter(col("is_bench"))),
          strategy)
        .filter(col("n_hit") > 0)
        .select(col("doc_id").as("dirty_id"))
      cand
        .join(u, Seq("doc_id"), "left")
        .join(dirty, col("doc_id") === col("dirty_id"), "left")
        .select(col("source"), col("n_toks"),
          when(col("n_toks") >= MinTokens, 1).otherwise(0).as("pass_q"),
          coalesce(col("first_keep"), lit(0)).as("uniq"),
          when(coalesce(col("first_keep"), lit(0)) === 1 &&
               col("dirty_id").isNull, 1).otherwise(0).as("clean"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_raw"),
             sum("pass_q").cast("long").as("n_quality"),
             sum("uniq").cast("long").as("n_unique"),
             sum("clean").cast("long").as("n_clean"),
             sum(when(col("clean") === 1, col("n_toks")).otherwise(0L))
               .cast("long").as("clean_tokens"))
        .orderBy("source")
  }

  /** The funnel SERVED from the stored artifacts — what a production
    * admission run looks like once the corpus is in steady state: instead
    * of re-deriving every gate from scratch like [[report]], an incoming
    * batch is scored against the trained [[LmGate.Gate]] (quality:
    * head/middle terciles pass, tail drops), probed against the at-rest
    * [[DedupIndex]] (any band hit means "near-dup of something already
    * ingested" — not novel), and decontaminated against the stored Bloom
    * bit artifact ([[TextAnalysis.loadBloomBits]]). This is the
    * composition proof for the at-rest pieces: each leg is the SAME
    * serving method its individual artifact ships, so the funnel cannot
    * drift from the per-artifact semantics.
    *
    * Plan shape at 100 TB: the gate legs are broadcast equi-joins plus a
    * CASE projection (zero windows — [[LmGate.Gate.bucketed]] serves from
    * two frozen boundary scalars), the index probe is a partition-pruned
    * scan of the batch's (band, bucket) directories, and the Bloom leg is
    * three no-fanout broadcast joins; the report is one per-source hash
    * aggregate. Nothing re-reads or re-shuffles the INDEXED corpus — the
    * whole funnel's cost tracks the batch.
    *
    * `bandedBatch` is the batch in the [[Dedup]] (doc_id, band, key)
    * LSH shape (the caller usually has it from signature computation);
    * funnel stages gate in order: quality → novel → clean.
    */
  def servedReport(batch: org.apache.spark.sql.DataFrame,
                   bandedBatch: org.apache.spark.sql.DataFrame,
                   index: org.apache.spark.sql.DataFrame,
                   gate: LmGate.Gate,
                   bloomBits: Seq[Long]): org.apache.spark.sql.DataFrame = {
    val base = batch.select(col("doc_id"), col("source"),
      TextHash.wsTokenCount(col("text")).as("n_toks"))
    // smoothed gates score every document; an MLE gate's closed-world
    // drops (all-unseen docs) read here as tail-bucket failures, which is
    // the conservative admission stance
    // cached in scope: the quality verdict has THREE consumers (the
    // report join and the two qIds pre-filters below) — uncached, the
    // whole gate-scoring pipeline (bigram explode ⋈ model + aggregate)
    // re-executes per consumer (r17, visible at 10×)
    val q = graft.CacheTracker.cachedInScope(gate.bucketed(batch)
      .select(col("doc_id"), (col("bucket") < gate.boundaries.size + 1).as("pass_q")))
    // only quality-passed docs can count as novel/clean (nv and cl below
    // both require pass_q), so the funnel's heavier stages — the index
    // probe and the decontamination shingle explode — skip every document
    // whose fate the first gate already sealed, the same stance report()
    // takes with its quality filter. The survivor id set is batch-scale
    // (broadcastable), so these are no-fanout pre-filters, not new
    // shuffles.
    val qIds = q.filter(col("pass_q")).select("doc_id")
    val dup = DedupIndex.probe(index, bandedBatch.join(qIds, Seq("doc_id")))
      .select(col("doc_id").as("dup_id"))
    val dirty = TextAnalysis
      .scoreAgainstBloomBits(Dedup.shingleHash(batch.join(qIds, Seq("doc_id"))), bloomBits)
      .filter(col("n_hit") > 0)
      .select(col("doc_id").as("dirty_id"))
    base
      .join(q, Seq("doc_id"), "left")
      .join(dup, col("doc_id") === col("dup_id"), "left")
      .join(dirty, col("doc_id") === col("dirty_id"), "left")
      .select(col("source"), col("n_toks"),
        when(coalesce(col("pass_q"), lit(false)), 1).otherwise(0).as("pq"),
        when(coalesce(col("pass_q"), lit(false)) && col("dup_id").isNull, 1)
          .otherwise(0).as("nv"),
        when(coalesce(col("pass_q"), lit(false)) && col("dup_id").isNull &&
             col("dirty_id").isNull, 1).otherwise(0).as("cl"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_raw"),
           sum("pq").cast("long").as("n_quality"),
           sum("nv").cast("long").as("n_novel"),
           sum("cl").cast("long").as("n_clean"),
           sum(when(col("cl") === 1, col("n_toks")).otherwise(0L))
             .cast("long").as("clean_tokens"))
      .orderBy("source")
  }
}
