package graft.ext

import graft.{Q, Tables}
import graft.operators.DistributedRank
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextHash._

/** Epoch shuffling and shard planning — the write-side operators a
  * training-data pipeline runs LAST, after curation: the kept corpus must
  * be (a) globally shuffled per epoch so mini-batches are i.i.d.-ish, and
  * (b) split into a fixed number of shards whose sizes are balanced, so a
  * 1000-reader training job never hot-spots on one oversized file.
  *
  * (The reference — a snapshot exporter, cloud2sql `collect.py` — stops at
  * "write each table"; these extend its sink surface the way a 100 TB
  * training pipeline needs. No counterpart file:line, same extension class
  * as the dedup/curation operators.)
  *
  * Both operators are deterministic and engine-portable, which is what
  * makes a 100 TB shuffle REPRODUCIBLE: the order key is an arithmetic
  * hash of the document id ([[TextHash.h48]], md5 in both engines), not an
  * engine RNG, so a re-run — or a different engine — reproduces the same
  * epoch permutation bit-for-bit. Seeding is by tag (`'e1#' || id`): a new
  * epoch tag yields a fresh independent permutation.
  *
  * Plan shape at 100 TB (both queries):
  *   - the permutation position is an exact global rank over the hash,
  *     computed by [[DistributedRank]] — partition-parallel two-level
  *     construction, NO single-partition window anywhere (PlanAuditSpec
  *     pins it);
  *   - shard assignment from the rank is projection-only arithmetic
  *     (round-robin / serpentine), so it's codegen'd and shuffle-free;
  *   - the declared queries aggregate per shard (map-side partial combine,
  *     ≤K output rows); a production writer would instead
  *     `repartition(K, $"shard")` + `sortWithinPartitions($"pos")` and
  *     write one file per shard — same plan up to the sink.
  */
object Sharding {

  /** Shard count for the declared plans — stands in for the
    * files-per-epoch knob (hundreds to thousands at 100 TB).
    */
  val Shards = 16

  /** Modulus for the order-checksum aggregates: `sum(doc_id * pos)` RAW
    * overflows Long once position × id products stack up (caught live at
    * the 100× scale point: ids ~1e9 × global positions ~5e5 summed over
    * 5e5 rows ≈ 1.2e20 > 2^63). The modular form keeps every term under
    * M and the running sum under rows × M — exact in both engines for
    * any corpus below ~9e9 rows per output group, i.e. far past the
    * declared surface. Spark ANSI mode makes the raw overflow a loud
    * failure rather than a silent wrap, which is how the 100× run
    * caught it.
    */
  val SigMod = 1000000007L

  /** `sum((a%M)*(b%M) % M) % M` — the overflow-safe order checksum, one
    * definition for every declared sig column and its oracle mirror
    * (shared with [[Pipeline]]'s shard read-back).
    */
  private[ext] def sigSum(a: org.apache.spark.sql.Column,
                          b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(sum(pmod(pmod(a, lit(SigMod)) * pmod(b, lit(SigMod)), lit(SigMod))),
      lit(SigMod)).cast("long")

  /** Per-document epoch assignment: `(doc_id, shard, pos)` where `pos` is
    * the document's 0-based position WITHIN its shard and the permutation
    * is the global rank of the epoch-seeded hash. Round-robin by rank, so
    * shard doc-counts differ by at most 1.
    */
  def epochAssign(docs: DataFrame, epochTag: String, k: Int): DataFrame = {
    require(k >= 1, s"shard count must be >= 1, got $k")
    val hashed = docs.select(
      col("doc_id"),
      // rankDesc orders (score DESC, id ASC); negating the hash makes
      // that (h ASC, doc_id ASC) — the oracle window's order
      (-h48(concat(lit(epochTag), col("doc_id").cast("string")))).as("neg_h"))
    // the rank key is a uniform 48-bit hash BY CONSTRUCTION, so the
    // range-group thresholds are equal-width literals — no
    // percentile_approx action, and at scale no sketch pass over the
    // corpus (r18, guide §1.2; thresholds only set group balance, which
    // uniformity guarantees as well as the sketch did)
    DistributedRank.rankDescWithThresholds(hashed, "neg_h", "doc_id",
        DistributedRank.uniformThresholds(docs.sparkSession,
          -((1L << 48).toDouble), 0.0), "rk")
      .select(col("doc_id"), (col("rk") - 1).as("rk0"))
      .select(col("doc_id"),
        pmod(col("rk0"), lit(k)).cast("int").as("shard"),
        // rk0 >= 0, so truncating DIV == floor division (the DuckDB //)
        expr(s"rk0 DIV $k").as("pos"))
  }

  /** Token-balanced shard assignment (serpentine LPT): rank documents by
    * token weight descending, deal them out serpentine — left-to-right,
    * then right-to-left, alternating each round of `k` — so each shard
    * gets one document per round and the direction flip cancels the
    * within-round size gradient. Shard token totals then differ by well
    * under one max-document; fully order-deterministic (tie-break
    * doc_id), hence oracle-exact. Input needs (doc_id, n_tokens) with
    * n_tokens non-null. Returns `(doc_id, n_tokens, shard)`.
    */
  def tokenBalancedAssign(weighted: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"shard count must be >= 1, got $k")
    DistributedRank.rankDesc(weighted, "n_tokens", "doc_id", "rk")
      .select(col("doc_id"), col("n_tokens"), (col("rk") - 1).as("rk0"))
      .select(col("doc_id"), col("n_tokens"),
        when(expr(s"(rk0 DIV $k) % 2") === 0, pmod(col("rk0"), lit(k)))
          .otherwise(lit(k - 1) - pmod(col("rk0"), lit(k)))
          .cast("int").as("shard"))
  }

  /** The production writer the declared queries' Scaladoc promises: the
    * epoch-shuffled corpus lands as `shard=<i>` directories, ONE file per
    * shard, rows inside each file in permutation order — exactly what a
    * K-reader training job consumes. The hash repartition on `shard`
    * sends every shard's rows to one task (so one output file), and the
    * within-partition sort by `pos` makes the FILE order the epoch order.
    * Payload columns ride along via the doc_id equi-join.
    */
  def writeShards(docs: org.apache.spark.sql.DataFrame, epochTag: String,
                  k: Int, path: String): Unit =
    epochAssign(docs.select("doc_id"), epochTag, k)
      .join(docs, Seq("doc_id"))
      .repartition(k, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  def queries: Seq[Q] = Seq(

    // ---- deterministic epoch shuffle + round-robin sharding ----
    // Every document gets an epoch-seeded hash; its global rank in hash
    // order is its position in the epoch permutation; shard = rank % K
    // (perfectly balanced: shard sizes differ by at most 1 doc). The
    // oracle replays the identical permutation with a SQL window; the
    // order_sig checksum pins the FULL (doc -> position) assignment, not
    // just the shard sizes.
    Q("q_shuffle_epoch",
      s"""WITH h AS (
         |  SELECT doc_id, ${h48Sql("'e1#' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents
         |), r AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY h, doc_id) - 1 AS rk0
         |  FROM h
         |)
         |SELECT CAST(rk0 % $Shards AS INT) AS shard,
         |  count(*) AS n_docs,
         |  min(CASE WHEN rk0 < $Shards THEN doc_id END) AS first_doc,
         |  CAST(sum((doc_id % $SigMod) * ((rk0 // $Shards) % $SigMod) % $SigMod)
         |       % $SigMod AS BIGINT) AS order_sig
         |FROM r GROUP BY 1 ORDER BY shard""".stripMargin) { (s, d) =>
      epochAssign(Tables.documents(s, d).select("doc_id"), "e1#", Shards)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          min(when(col("pos") === 0, col("doc_id"))).as("first_doc"),
          sigSum(col("doc_id"), col("pos")).as("order_sig"))
        .orderBy("shard")
    },

    // ---- the shard WRITER's output read back from disk ----
    // q_shuffle_epoch declares the plan; [[writeShards]] is the
    // production sink (one file per shard, rows in permutation order,
    // ShardingSpec pins the file order). This row closes the
    // bytes-at-rest loop the way q_layout_bucketed did for the bucketed
    // layout: the corpus is ACTUALLY written as a shard tree (memoized
    // per JVM+dataset — write-once in production), read back from
    // parquet, and the per-shard order checksum + a payload checksum are
    // re-derived FROM THE STORED BYTES, while the oracle replays the
    // whole permutation from the base table with a SQL window. A writer
    // that dropped rows, misassigned shards, lost payload columns, or
    // wrote the wrong positions cannot pass. chars_sum pins that the
    // payload rode the doc_id equi-join intact.
    Q("q_shard_stored",
      s"""WITH h AS (
         |  SELECT doc_id, n_chars,
         |    ${h48Sql("'e1#' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents
         |), r AS (
         |  SELECT doc_id, n_chars,
         |    row_number() OVER (ORDER BY h, doc_id) - 1 AS rk0
         |  FROM h
         |)
         |SELECT CAST(rk0 % $Shards AS INT) AS shard,
         |  count(*) AS n_docs,
         |  min(CASE WHEN rk0 < $Shards THEN doc_id END) AS first_doc,
         |  CAST(sum((doc_id % $SigMod) * ((rk0 // $Shards) % $SigMod) % $SigMod)
         |       % $SigMod AS BIGINT) AS order_sig,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
         |FROM r GROUP BY 1 ORDER BY shard""".stripMargin) { (s, d) =>
      val root = StoredArtifacts.of(s"shards|$d") { r =>
        writeShards(Tables.documents(s, d), "e1#", Shards, s"$r/epoch1")
      }
      s.read.parquet(s"$root/epoch1")
        .groupBy(col("shard").cast("int").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          min(when(col("pos") === 0, col("doc_id"))).as("first_doc"),
          sigSum(col("doc_id"), col("pos")).as("order_sig"),
          sum(col("n_chars")).cast("long").as("chars_sum"))
        .orderBy("shard")
    },

    // ---- curriculum plan: difficulty phases, shuffled within phase ----
    // Curriculum learning orders training data easy → hard. "Difficulty"
    // here is the corpus-LM signal the gate stack already serves: every
    // document scores under the SIZE-CAPPED smoothed bigram LM
    // (q_text_ppl_capped's model — ≤500-row build sides at any corpus
    // size) and the tercile of (avg_logprob DESC) is its phase — most
    // LM-natural text is phase 1. Within a phase the order must still be
    // i.i.d.-ish, so the epoch-hash permutation from q_shuffle_epoch
    // applies INSIDE each phase: the full curriculum position is ONE
    // global rank over the composite (phase, h) key — phase * 2^49 + h is
    // monotone lexicographic (h < 2^48) and exact in the rank's double
    // threshold math (< 2^53) — again a single partition-parallel
    // DistributedRank pass, no per-phase windows (3 giant partitions) and
    // no single-partition sort. The oracle replays phases via ntile(3)
    // and the position via row_number over (phase, h, doc_id); min/max
    // positions per phase prove the phases tile the order contiguously,
    // and order_sig pins the full doc→position assignment. Documents with
    // no bigrams (< 2 tokens) score under neither engine and are excluded
    // symmetrically.
    Q("q_sample_curriculum", curriculumOracleSql) { (s, d) =>
      val docs = Tables.documents(s, d)
      val (c12, c1) = LmGate.cappedTables(docs, 500)
      val scored = LmGate.scoreSmoothed(docs, c12, c1)
        .select(col("doc_id"), col("avg_logprob"))
      val phased = DistributedRank
        .ntileDesc(scored, "avg_logprob", "doc_id", 3, "phase")
        .select(col("doc_id"), col("phase"))
      curriculumReport(phased)
    },

    // ---- curriculum SERVED from the stored gate ----
    // The production shape of q_sample_curriculum: a steady-state corpus
    // has its capped smoothed LM gate ON DISK (the exact artifact
    // q_curation_stored serves), so a curriculum run must not rebuild the
    // model per epoch — it scores under the stored ≤cap-row tables and
    // assigns phases from the stored tercile boundary scalars
    // ([[DistributedRank.bucketByBoundaries]], two broadcast literals +
    // a CASE projection — zero windows), then ranks the composite
    // (phase, h) key exactly like the declared-from-scratch row. Because
    // the boundaries were trained on this corpus under this scoring,
    // bucketByBoundaries reproduces ntile(3) bit-for-bit — so the oracle
    // is the SAME full replay, and the driver proves stored-gate serving
    // ≡ from-scratch curriculum. Per-epoch cost at 100 TB: two broadcast
    // joins against a fixed-size model + one DistributedRank pass; the
    // gate build amortizes across epochs (memoized per JVM+dataset here,
    // write-once in production).
    Q("q_sample_curriculum_stored", curriculumOracleSql) { (s, d) =>
      val docs = Tables.documents(s, d)
      val root = StoredArtifacts.of(s"curriculum-gate|$d") { r =>
        LmGate.write(docs, r, mode = LmGate.Mode.Addone, maxBigrams = 500)
      }
      val phased = LmGate.load(s, root).bucketed(docs)
        .select(col("doc_id"), col("bucket").as("phase"))
      curriculumReport(phased)
    },

    // ---- token-balanced sharding (serpentine LPT) ----
    // Round-robin by document COUNT balances docs, not load; training
    // readers meter by TOKENS — this plans shards whose token totals are
    // near-equal even under a skewed document-length distribution.
    Q("q_shard_token_balanced",
      s"""WITH t AS (
         |  SELECT doc_id, ${wsTokenCountSql("text")} AS n_tokens
         |  FROM documents WHERE text IS NOT NULL
         |), r AS (
         |  SELECT doc_id, n_tokens,
         |    row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS rk0
         |  FROM t
         |)
         |SELECT CAST(CASE WHEN (rk0 // $Shards) % 2 = 0 THEN rk0 % $Shards
         |            ELSE ${Shards - 1} - rk0 % $Shards END AS INT) AS shard,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         |  max(n_tokens) AS max_doc_tokens
         |FROM r GROUP BY 1 ORDER BY shard""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), wsTokenCount(col("text")).as("n_tokens"))
      tokenBalancedAssign(toks, Shards)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("shard_tokens"),
          max(col("n_tokens")).as("max_doc_tokens"))
        .orderBy("shard")
    }
  )

  /** The within-phase shuffle + per-phase report shared by the two
    * curriculum faces: from `(doc_id, phase)` the full curriculum
    * position is ONE global rank over the composite (phase, h) key —
    * phase·2⁴⁹ + h is monotone lexicographic (h < 2⁴⁸) and exact in the
    * rank's double threshold math (< 2⁵³) — no per-phase windows, no
    * single-partition sort. min/max positions prove the phases tile the
    * order contiguously; order_sig pins the full doc→position assignment.
    */
  /** Literal range-group thresholds for the composite curriculum key
    * `-(phase·2⁴⁹ + h)`: within each phase the key is a uniform 48-bit
    * hash, so per-phase equal-width cuts balance groups exactly like the
    * percentile sketch they replace (whose action + full input pass are
    * skipped — r18, guide §1.2). Rows with a phase beyond `phases` would
    * merely share the last group — thresholds never affect correctness.
    */
  private[ext] def phaseHashThresholds(s: org.apache.spark.sql.SparkSession,
                                       phases: Int): Seq[Double] = {
    val p = s.conf.get("spark.sql.shuffle.partitions", "32").toInt.max(1)
    val g = math.max(1, p / phases)
    for { ph <- 1 to phases; j <- 0 until g }
      yield -(ph.toDouble * (1L << 49) + (1L << 48).toDouble * j / g)
  }

  private def curriculumReport(phased: DataFrame): DataFrame = {
    val keyed = phased
      .select(col("doc_id"), col("phase"),
        h48(concat(lit("c1#"), col("doc_id").cast("string"))).as("h"))
      .select(col("doc_id"), col("phase"),
        (-(col("phase").cast("long") * lit(1L << 49) + col("h"))).as("neg_key"))
    DistributedRank.rankDescWithThresholds(keyed, "neg_key", "doc_id",
        phaseHashThresholds(phased.sparkSession, 3), "rk")
      .select(col("doc_id"), col("phase"), (col("rk") - 1).as("rk0"))
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"),
        min(col("rk0")).as("min_pos"), max(col("rk0")).as("max_pos"),
        sigSum(col("doc_id"), col("rk0")).as("order_sig"))
      .orderBy("phase")
  }

  /** One oracle for both curriculum faces: the stored gate's boundaries
    * are trained on this corpus under this scoring, so bucketByBoundaries
    * reproduces the ntile(3) phases exactly — stored-gate serving and the
    * from-scratch build MUST produce identical reports.
    */
  private def curriculumOracleSql: String =
    s"""WITH toks AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
         |bg AS (
         |  SELECT doc_id, sh[1] AS w1, sh[2] AS w2 FROM (
         |    SELECT doc_id, string_split(b, ' ') AS sh FROM (
         |      SELECT doc_id, unnest(${shinglesFromTokensSql("toks", 2)}) AS b FROM toks
         |    )
         |  )
         |),
         |c12full AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
         |c12 AS (
         |  SELECT w1, w2, c12 FROM (
         |    SELECT w1, w2, c12,
         |      row_number() OVER (ORDER BY c12 DESC, w1 || ' ' || w2) AS rn
         |    FROM c12full
         |  ) WHERE rn <= 500
         |),
         |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
         |v AS (SELECT count(*) AS vsz FROM c1),
         |scored AS (
         |  SELECT doc_id,
         |    round(CAST(sum(CAST(round(ln(CAST(coalesce(c12, 0) + 1 AS DOUBLE)
         |      / CAST(coalesce(c1, 0) + vsz AS DOUBLE)), 9) AS DECIMAL(20,9))) AS DOUBLE)
         |      / count(*), 6) AS s
         |  FROM bg LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)
         |  CROSS JOIN v GROUP BY doc_id
         |),
         |phased AS (
         |  SELECT doc_id, ntile(3) OVER (ORDER BY s DESC, doc_id) AS phase,
         |    ${h48Sql("'c1#' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM scored
         |),
         |r AS (
         |  SELECT phase, doc_id,
         |    row_number() OVER (ORDER BY phase, h, doc_id) - 1 AS rk0
         |  FROM phased
         |)
         |SELECT CAST(phase AS INT) AS phase, count(*) AS n_docs,
         |  min(rk0) AS min_pos, max(rk0) AS max_pos,
         |  CAST(sum((doc_id % $SigMod) * (rk0 % $SigMod) % $SigMod)
         |       % $SigMod AS BIGINT) AS order_sig
         |FROM r GROUP BY 1 ORDER BY phase""".stripMargin
}
