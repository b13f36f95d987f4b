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
    DistributedRank.rankDesc(hashed, "neg_h", "doc_id", "rk")
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
         |  CAST(sum(doc_id * (rk0 // $Shards)) AS BIGINT) AS order_sig
         |FROM r GROUP BY 1 ORDER BY shard""".stripMargin) { (s, d) =>
      epochAssign(Tables.documents(s, d).select("doc_id"), "e1#", Shards)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          min(when(col("pos") === 0, col("doc_id"))).as("first_doc"),
          sum(col("doc_id") * col("pos")).cast("long").as("order_sig"))
        .orderBy("shard")
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
}
