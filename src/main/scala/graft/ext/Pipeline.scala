package graft.ext

import graft.{Q, Tables}
import graft.operators.DistributedRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import TextHash._

/** The composed steady-state ingestion loop — the engine's whole 100 TB
  * value proposition as ONE driver-verified, artifact-to-artifact row:
  *
  *   1. ADMIT: an incoming batch is quality-gated by the stored capped
  *      [[LmGate]] (head/middle terciles pass, tail drops — the frozen
  *      boundary scalars trained on the corpus), novelty-checked against
  *      the at-rest [[DedupIndex]] band tree (any band hit → near-dup of
  *      something already ingested), and decontaminated against the
  *      at-rest [[SubstringIndex]] window tree (any verbatim ≥K-char
  *      overlap with the stored corpus → drop);
  *   2. FOLD: the admitted remainder is APPENDED into the band index and
  *      the BM25 postings index — O(batch) ingest, base files untouched,
  *      meta scalars folded by exact integer addition;
  *   3. RE-DERIVE: the curriculum is re-scored for corpus + admitted under
  *      the SAME stored gate (two broadcast model joins + the frozen
  *      boundary CASE — zero windows) and the within-phase epoch
  *      permutation is one composite-key [[DistributedRank]] pass;
  *   4. SHIP: shards land on disk in curriculum order (one file per
  *      shard, rows in position order) and are READ BACK for the report.
  *
  * Every piece is individually proven (q_curation_stored,
  * q_dedup_index_append, q_text_decontam_stored, q_text_bm25_append,
  * q_sample_curriculum_stored, q_shard_stored) — this row chains them so
  * the COMPOSITION is what the driver verifies: the oracle re-derives
  * every stage from the base table (LM scores + tercile boundary replay,
  * band-hit EXISTS, window-hash membership, the full permutation window,
  * and the grown corpus's index scalars), so a drift anywhere in the chain
  * — a gate that admitted the wrong set, an append that lost or doubled
  * rows, a curriculum scored under stale boundaries, a shard writer that
  * dropped payload — cannot hash-match.
  *
  * Output grain: one row per shard (n_docs, the order checksum over the
  * full doc→position assignment, the payload checksum) with the two
  * appended-artifact scalars riding as constants (the BM25 meta's exact
  * document count and token sum, and the band tree's distinct key count —
  * each read FROM the post-append artifacts, each re-derived by the
  * oracle over corpus ∪ admitted).
  *
  * Scale shape: the batch is bounded by ingest cadence (the
  * [[BatchIdBound]] contract — identical to q_text_decontam_stored's),
  * so admission cost tracks the batch (broadcast gate joins +
  * partition-pruned index probes), the appends are O(batch), and the
  * per-epoch curriculum + shard write is the q_sample_curriculum_stored /
  * q_shard_stored cost — the only corpus-linear terms are the one-time
  * artifact builds, memoized per JVM+dataset here (write-once in
  * production) and priced honestly in first-rep/x100 numbers.
  */
object Pipeline {

  /** Shard fan for the shipped epoch (stands in for the files-per-epoch
    * knob, like [[Sharding.Shards]]).
    */
  val Shards = 16

  /** The incoming-batch id bound — same contract and value as
    * q_text_decontam_stored's: a no-op at every testdata scale, exactly
    * one synthesis copy under ScaleCheck's per-copy doc_id offset, so the
    * scale instrument grows the CORPUS (and every stored artifact) while
    * the admission batch stays the production-shaped bounded ingest
    * slice.
    */
  val BatchIdBound = 10000000L

  /** The LM gate's model-size cap (the q_text_ppl_capped /
    * q_curation_stored bound: every gate build side ≤ this many rows at
    * any corpus size).
    */
  val GateCap = 500

  private def isBatch = col("doc_id") % 4 === 3 && col("doc_id") < BatchIdBound

  /** Build the full steady-state state under `r`: corpus artifacts, the
    * admission run, the two appends, the curriculum, the shard tree.
    * Write-once per JVM+dataset (the [[StoredArtifacts]] convention).
    */
  private def build(s: SparkSession, d: String, r: String): Unit =
    graft.CacheTracker.scope {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(!isBatch)
      val batch = docs.filter(isBatch)
      val banded = Dedup.mhBandedDf(s, d).transform(graft.CacheTracker.cached)

      // the four corpus artifacts (what a steady-state corpus has on disk)
      LmGate.write(corpus, s"$r/gate",
        mode = LmGate.Mode.Addone, maxBigrams = GateCap)
      DedupIndex.write(banded.filter(!isBatch), s"$r/dedup")
      SubstringIndex.write(corpus, s"$r/substr")
      Bm25Index.write(corpus, s"$r/bm25")
      val gate = LmGate.load(s, s"$r/gate")

      // ADMIT: quality → novelty → decontamination, heavier probes only on
      // survivors (the servedReport stance — the survivor id set is
      // batch-scale, so these are no-fanout pre-filters)
      val qIds = gate.bucketed(batch)
        .filter(col("bucket") <= 2).select("doc_id")
        .transform(graft.CacheTracker.cached)
      val dup = DedupIndex
        .probe(DedupIndex.load(s, s"$r/dedup"),
               banded.filter(isBatch).join(qIds, Seq("doc_id")))
        .select("doc_id")
      val dirty = SubstringIndex
        .probe(SubstringIndex.load(s, s"$r/substr"),
               batch.join(qIds, Seq("doc_id")))
        .select("doc_id").distinct()
      // The admission DECISION is persisted as its own artifact BEFORE any
      // append — not a bench convenience but load-bearing twice over:
      // (a) the decision's lineage READS the dedup tree (the novelty
      // probe), and the very next step APPENDS the admitted keys into
      // that tree — a lazy plan re-evaluated after the append would see
      // the batch's own keys as duplicates and silently shrink the
      // admitted set (observed live at sf0.001: the cached plan
      // re-evaluated under AQE and the BM25 fold got an EMPTY batch);
      // the parquet barrier freezes the decision against the pre-append
      // state. (b) It is also what production needs anyway: the appends,
      // the curriculum, and any replay/audit must agree on ONE recorded
      // admitted set, not re-derive it against a moving tree.
      qIds
        .join(dup, Seq("doc_id"), "left_anti")
        .join(dirty, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$r/admitted.parquet")
      val admittedIds = s.read.parquet(s"$r/admitted.parquet")
      val admitted = batch.join(admittedIds, Seq("doc_id"))

      // FOLD: O(batch) appends into the band + postings trees
      DedupIndex.append(
        banded.filter(isBatch).join(admittedIds, Seq("doc_id")), s"$r/dedup")
      Bm25Index.append(admitted, s"$r/bm25")

      // RE-DERIVE + SHIP: curriculum phases under the stored gate for the
      // grown corpus, within-phase epoch shuffle as ONE composite-key rank
      // (phase·2⁴⁹ + h48 is monotone lexicographic, exact below 2⁵³ — the
      // q_sample_curriculum construction), shards dealt round-robin by
      // curriculum position and written one file per shard in order
      val all = corpus.unionByName(admitted)
      val keyed = gate.bucketed(all)
        .select(col("doc_id"), col("bucket").as("phase"),
          h48(concat(lit("p1#"), col("doc_id").cast("string"))).as("h"))
        .select(col("doc_id"), col("phase"),
          (-(col("phase").cast("long") * lit(1L << 49) + col("h"))).as("neg_key"))
      DistributedRank.rankDesc(keyed, "neg_key", "doc_id", "rk")
        .select(col("doc_id"), (col("rk") - 1).as("rk0"))
        .select(col("doc_id"),
          pmod(col("rk0"), lit(Shards)).cast("int").as("shard"),
          expr(s"rk0 DIV $Shards").as("pos"))
        .join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
        .repartition(Shards, col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite").partitionBy("shard").parquet(s"$r/shards/epoch1")
    }

  val queries: Seq[Q] = Seq(
    Q("q_pipeline_stored", oracleSql) { (s, d) =>
      val root = StoredArtifacts.of(s"pipeline|$d")(build(s, d, _))
      // the report reads ONLY the post-maintenance artifacts: the shard
      // tree's stored bytes, the appended BM25 meta scalars (exact longs),
      // and the appended band tree's distinct key count — two 1-row
      // scalar broadcasts (the pinned legitimate crossJoin shape)
      val bmMeta = s.read.parquet(s"$root/bm25/meta.parquet")
        .select(col("n").as("bm25_n"), col("sum_dl").as("bm25_sum_dl"))
      val bandKeys = DedupIndex.load(s, s"$root/dedup")
        .select("band", "k1", "k2").distinct()
        .agg(count(lit(1)).as("band_keys"))
      s.read.parquet(s"$root/shards/epoch1")
        .groupBy(col("shard").cast("int").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          Sharding.sigSum(col("doc_id"), col("pos")).as("order_sig"),
          sum(col("n_chars")).cast("long").as("chars_sum"))
        .crossJoin(broadcast(bmMeta))
        .crossJoin(broadcast(bandKeys))
        .orderBy("shard")
    }
  )

  /** The full base-table replay: gate training + boundary extraction,
    * admission (LM cut, band-hit EXISTS, window-hash membership), the
    * grown corpus, the curriculum permutation, the shard grouping, and
    * the two artifact scalars — every fragment mirrors an
    * already-oracle-checked query (q_curation_stored, q_dedup_index_*,
    * q_text_decontam_stored, q_sample_curriculum, q_shard_stored), so the
    * composition is the only new claim.
    */
  private def oracleSql: String = {
    val B = BatchIdBound
    val K = SubstringDedup.K
    val M = Sharding.SigMod
    val batchPred = s"(doc_id % 4 = 3 AND doc_id < $B)"
    def corpusPred(t: String) =
      s"NOT ($t.doc_id % 4 = 3 AND $t.doc_id < $B)"
    val bandHit = (0 until MinhashBands).map { b =>
      s"""EXISTS (SELECT 1 FROM sigs e
         |      WHERE NOT (e.doc_id % 4 = 3 AND e.doc_id < $B)
         |        AND e.sig_${2 * b} = i.sig_${2 * b}
         |        AND e.sig_${2 * b + 1} = i.sig_${2 * b + 1})""".stripMargin
    }.mkString("\n    OR ")
    val bandKeysUnion = (0 until MinhashBands).map(b =>
      s"SELECT $b AS band, sig_${2 * b} AS k1, sig_${2 * b + 1} AS k2 " +
        "FROM sigs JOIN member USING (doc_id)")
      .mkString("\n      UNION ALL ")
    val smoothedScore =
      """round(CAST(sum(CAST(round(ln(CAST(coalesce(c12, 0) + 1 AS DOUBLE)
        |      / CAST(coalesce(c1, 0) + vsz AS DOUBLE)), 9) AS DECIMAL(20,9))) AS DOUBLE)
        |      / count(*), 6)""".stripMargin
    s"""WITH toks AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
       |bg AS (
       |  SELECT doc_id, sh[1] AS w1, sh[2] AS w2 FROM (
       |    SELECT doc_id, string_split(b, ' ') AS sh FROM (
       |      SELECT doc_id, unnest(${shinglesFromTokensSql("toks", 2)}) AS b FROM toks
       |    )
       |  )
       |),
       |cbg AS (SELECT * FROM bg b WHERE ${corpusPred("b")}),
       |c12full AS (SELECT w1, w2, count(*) AS c12 FROM cbg GROUP BY w1, w2),
       |c12 AS (
       |  SELECT w1, w2, c12 FROM (
       |    SELECT w1, w2, c12,
       |      row_number() OVER (ORDER BY c12 DESC, w1 || ' ' || w2) AS rn
       |    FROM c12full
       |  ) WHERE rn <= $GateCap
       |),
       |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
       |v AS (SELECT count(*) AS vsz FROM c1),
       |scored AS (
       |  SELECT doc_id, $smoothedScore AS s
       |  FROM bg LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)
       |  CROSS JOIN v GROUP BY doc_id
       |),
       |bnd AS (
       |  SELECT
       |    max(CASE WHEN rk = (total // 3) + least(1, total % 3)
       |        THEN s END) AS b1s,
       |    max(CASE WHEN rk = (total // 3) + least(1, total % 3)
       |        THEN doc_id END) AS b1i,
       |    max(CASE WHEN rk = 2 * (total // 3) + least(2, total % 3)
       |        THEN s END) AS b2s,
       |    max(CASE WHEN rk = 2 * (total // 3) + least(2, total % 3)
       |        THEN doc_id END) AS b2i
       |  FROM (
       |    SELECT doc_id, s,
       |      row_number() OVER (ORDER BY s DESC, doc_id) AS rk,
       |      count(*) OVER () AS total
       |    FROM scored c WHERE ${corpusPred("c")}
       |  )
       |),
       |batch_q AS (
       |  SELECT b.doc_id FROM scored b, bnd
       |  WHERE (b.doc_id % 4 = 3 AND b.doc_id < $B)
       |    AND (b.s > bnd.b2s OR (b.s = bnd.b2s AND b.doc_id <= bnd.b2i))
       |),
       |sigs AS (${Dedup.minhashSelect}),
       |dup AS (
       |  SELECT i.doc_id FROM sigs i JOIN batch_q USING (doc_id)
       |  WHERE ($bandHit)
       |),
       |dirty AS (
       |  SELECT DISTINCT w.doc_id FROM (
       |    SELECT d.doc_id, md5(substr(d.text, t.i::int, $K)) AS h
       |    FROM documents d
       |    JOIN generate_series(1, 100000) t(i)
       |      ON t.i <= length(d.text) - $K + 1
       |    WHERE d.doc_id % 4 = 3 AND d.doc_id < $B
       |  ) w JOIN batch_q USING (doc_id)
       |  WHERE w.h IN (
       |    SELECT md5(substr(d.text, t.i::int, $K))
       |    FROM documents d
       |    JOIN generate_series(1, 100000) t(i)
       |      ON t.i <= length(d.text) - $K + 1
       |    WHERE ${corpusPred("d")}
       |  )
       |),
       |admitted AS (
       |  SELECT doc_id FROM batch_q
       |  WHERE doc_id NOT IN (SELECT doc_id FROM dup)
       |    AND doc_id NOT IN (SELECT doc_id FROM dirty)
       |),
       |member AS (
       |  SELECT doc_id FROM documents d WHERE ${corpusPred("d")}
       |  UNION ALL SELECT doc_id FROM admitted
       |),
       |phased AS (
       |  SELECT m.doc_id,
       |    CASE WHEN s.s > bnd.b1s OR (s.s = bnd.b1s AND m.doc_id <= bnd.b1i)
       |         THEN 1
       |         WHEN s.s > bnd.b2s OR (s.s = bnd.b2s AND m.doc_id <= bnd.b2i)
       |         THEN 2
       |         ELSE 3 END AS phase,
       |    ${h48Sql("'p1#' || CAST(m.doc_id AS VARCHAR)")} AS h
       |  FROM member m JOIN scored s ON s.doc_id = m.doc_id CROSS JOIN bnd
       |),
       |r AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY phase, h, doc_id) - 1 AS rk0
       |  FROM phased
       |),
       |scal AS (
       |  SELECT
       |    (SELECT count(*) FROM member) AS bm25_n,
       |    (SELECT CAST(coalesce(sum(len(toks)), 0) AS BIGINT)
       |     FROM toks JOIN member USING (doc_id)) AS bm25_sum_dl,
       |    (SELECT count(*) FROM (
       |      SELECT DISTINCT band, k1, k2 FROM (
       |      $bandKeysUnion
       |      )
       |    )) AS band_keys
       |)
       |SELECT CAST(r.rk0 % $Shards AS INT) AS shard,
       |  count(*) AS n_docs,
       |  CAST(sum((r.doc_id % $M) * ((r.rk0 // $Shards) % $M) % $M)
       |       % $M AS BIGINT) AS order_sig,
       |  CAST(sum(d.n_chars) AS BIGINT) AS chars_sum,
       |  scal.bm25_n, scal.bm25_sum_dl, scal.band_keys
       |FROM r JOIN documents d ON d.doc_id = r.doc_id CROSS JOIN scal
       |GROUP BY 1, scal.bm25_n, scal.bm25_sum_dl, scal.band_keys
       |ORDER BY shard""".stripMargin
  }
}
