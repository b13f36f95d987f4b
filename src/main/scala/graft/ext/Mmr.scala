package graft.ext

import graft.{CacheTracker, Q}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998,
  * public): from a relevance-ranked candidate pool, greedily pick the
  * item maximizing `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` — the standard
  * diversity-aware top-k used to de-redundify retrieval results (and, in
  * a curation stack, to pick a DIVERSE set of exemplar documents from a
  * cluster rather than k near-copies).
  *
  * The greedy recurrence is inherently sequential in k, so the operator
  * unrolls it as k plan stages — each stage is a join + window over the
  * CANDIDATE pool only (n rows per probe, never the corpus), so the
  * unrolled plan's total work is O(probes · n² · k) on metadata-sized n
  * (the pool is already a top-n cut; the distributed heavy lifting is the
  * candidate generation feeding it, exactly like [[Similarity.probeIndex]]
  * feeding the kNN vote). All scoring is in-engine with the house
  * rounding discipline (6dp rel/sim, 6dp mmr score, (score desc, cand)
  * tie-break), so the DuckDB oracle replays the greedy bit-for-bit.
  */
object Mmr {

  /** Relevance/diversity trade-off: score = λ·rel − (1−λ)·maxSim. */
  val Lambda = 0.7

  /** Greedy MMR selection of `k` items per probe.
    *
    *  - `cands`: (qid, cand, rel) — the per-probe candidate pool, `rel`
    *    already rounded (higher better);
    *  - `sims`: (qid, a, b, sim) — pairwise similarities among each
    *    probe's candidates, both directions present, `sim` rounded.
    *
    * Returns (qid, step, cand): the selection order per probe.
    *
    * Driver memory is bounded by the SELECTION, not the pool: each step
    * collects one (qid, cand) winner per probe, so the held state is
    * probes × k ids (metadata scale at any corpus size — the pool itself
    * never leaves the executors). MmrScaleSpec pins this at a
    * 200-candidate pool along with the flat-plan cost model: Spark-job
    * count is LINEAR in k (constant jobs per greedy step), which is the
    * observable difference from a lazily-nested recurrence whose step
    * cost grows with the step index.
    */
  def rerank(cands0: DataFrame, sims0: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = cands0.sparkSession
    import spark.implicits._
    // normalize id types ONCE at entry: the per-step collects below read
    // ids with getLong, which ClassCastExceptions on an IntegerType
    // qid/cand pool — int-keyed callers are legitimate library inputs
    val cands = cands0.select(col("qid").cast("long").as("qid"),
      col("cand").cast("long").as("cand"), col("rel"))
    val sims = sims0.select(col("qid").cast("long").as("qid"),
      col("a").cast("long").as("a"), col("b").cast("long").as("b"), col("sim"))
    val byQ = Window.partitionBy("qid")
    // Each greedy step's winners are COLLECTED (probes rows — metadata,
    // the Lloyd-round idiom) and re-injected as a literal frame, so every
    // step's plan is flat: pool ⋈ selection ⋈ sims + one window. Leaving
    // the recurrence lazy instead nests each step's plan inside the next
    // — quadratic plan growth that measured 45 s where this runs in ~8 s.
    var selected: Vector[(Long, Long, Int)] = cands
      .withColumn("rn", row_number().over(byQ.orderBy(col("rel").desc, col("cand").asc)))
      .filter(col("rn") === 1)
      .select(col("qid"), col("cand"))
      .collect().map(r => (r.getLong(0), r.getLong(1), 1)).toVector
    var t = 2
    while (t <= k) {
      // ONE selection frame serves both joins: the max-sim pairing and
      // the already-picked exclusion cannot desynchronize
      val prevSel = selected.map(s => (s._1, s._2)).toDF("pqid", "sc")
      val simsR = sims.select(col("qid").as("sqid"), col("a"), col("b"), col("sim"))
      val next = cands
        .join(prevSel, col("qid") === col("pqid"))
        .join(simsR, col("sqid") === col("qid") && col("a") === col("cand") &&
                     col("b") === col("sc"))
        .groupBy("qid", "cand", "rel")
        .agg(max(col("sim")).as("msim"))
        .join(prevSel.select(col("pqid").as("qid"), col("sc").as("cand")),
              Seq("qid", "cand"), "left_anti")
        .select(col("qid"), col("cand"),
          round(lit(Lambda) * col("rel") - lit(1.0 - Lambda) * col("msim"), 6)
            .as("score"))
        .withColumn("rn", row_number().over(
          byQ.orderBy(col("score").desc, col("cand").asc)))
        .filter(col("rn") === 1)
        .select(col("qid"), col("cand"))
        .collect().map(r => (r.getLong(0), r.getLong(1), t))
      selected = selected ++ next
      t += 1
    }
    selected.toDF("qid", "cand", "step").select("qid", "cand", "step")
  }

  // ---------------- the driver query + its oracle ----------------

  private val Probes = 5   // vec_id < 5
  private val PoolN = 20   // relevance top-n pool per probe
  private val K = 6        // diverse picks per probe

  private def cosSql(a: String, b: String): String =
    s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"

  /** One unrolled greedy step as DuckDB CTEs (the SQL mirror of a
    * [[rerank]] iteration).
    */
  private def stepSql(t: Int): String =
    s"""ms$t AS (
       |  SELECT c.qid, c.cand, c.rel, max(s.sim) AS msim
       |  FROM cand c
       |  JOIN sel${t - 1} sl ON sl.qid = c.qid
       |  JOIN sims s ON s.qid = c.qid AND s.a = c.cand AND s.b = sl.cand
       |  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} x
       |                    WHERE x.qid = c.qid AND x.cand = c.cand)
       |  GROUP BY c.qid, c.cand, c.rel
       |),
       |st$t AS (
       |  SELECT qid, cand, $t AS step FROM (
       |    SELECT qid, cand, row_number() OVER (PARTITION BY qid
       |      ORDER BY round($Lambda * rel - ${1.0 - Lambda} * msim, 6) DESC, cand) AS rn
       |    FROM ms$t
       |  ) WHERE rn = 1
       |),
       |sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM st$t)""".stripMargin

  val queries: Seq[Q] = Seq(

    Q("q_embed_mmr", {
      val steps = (2 to K).map(stepSql).mkString(",\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT * FROM e WHERE vec_id < $Probes),
         |cand AS (
         |  SELECT qid, cand, rel FROM (
         |    SELECT q.vec_id AS qid, c.vec_id AS cand,
         |      ${cosSql("q.v", "c.v")} AS rel,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.v", "c.v")} DESC, c.vec_id) AS rn
         |    FROM q, e c WHERE c.vec_id <> q.vec_id
         |  ) WHERE rn <= $PoolN
         |),
         |sims AS (
         |  SELECT a.qid, a.cand AS a, b.cand AS b, ${cosSql("x.v", "y.v")} AS sim
         |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.cand <> b.cand
         |  JOIN e x ON x.vec_id = a.cand JOIN e y ON y.vec_id = b.cand
         |),
         |sel1 AS (
         |  SELECT qid, cand, 1 AS step FROM (
         |    SELECT qid, cand, row_number() OVER (PARTITION BY qid
         |      ORDER BY rel DESC, cand) AS rn
         |    FROM cand
         |  ) WHERE rn = 1
         |),
         |$steps
         |SELECT qid, step, cand FROM sel$K ORDER BY qid, step""".stripMargin
    }) { (s, d) =>
      val e = vecsOf(s, d)
      val probes = e.filter(col("vec_id") < Probes)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val scored = e.select(col("vec_id").as("cand"), col("v"))
        .join(broadcast(probes), col("cand") =!= col("qid"))
        .select(col("qid"), col("cand"), col("v"),
          round(Similarity.cosine(col("qv"), col("v")), 6).as("rel"))
      val pool = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("rel").desc, col("cand").asc)))
        .filter(col("rn") <= PoolN)
        .select(col("qid"), col("cand"), col("v"), col("rel"))
        .transform(CacheTracker.cached)
      val sims = pool.select(col("qid"), col("cand").as("a"), col("v").as("va"))
        .join(pool.select(col("qid"), col("cand").as("b"), col("v").as("vb")),
          Seq("qid"))
        .filter(col("a") =!= col("b"))
        .select(col("qid"), col("a"), col("b"),
          round(Similarity.cosine(col("va"), col("vb")), 6).as("sim"))
      rerank(pool.select(col("qid"), col("cand"), col("rel")), sims, K)
        .select(col("qid"), col("step"), col("cand"))
        .orderBy("qid", "step")
    }
  )

  private def vecsOf(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
}
