package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the embedding column
  * (`Array[Float]`, 64-dim).
  *
  *  - `q_embed_topk`: brute-force cosine top-k — the correctness baseline.
  *    The probe set is broadcast, so the scan side streams once with no
  *    shuffle; cost O(|Q|·N) compute, O(N) IO.
  *  - `q_embed_lsh`: sign-LSH (random-hyperplane style, here axis-aligned
  *    deterministic planes) — candidates are restricted to the probe's
  *    bucket via an equi-join on the bucket id, which Spark shuffles by
  *    bucket: the 100 TB-scale path (per-bucket locality, no full scan per
  *    probe).
  *
  * Dot products use `zip_with`+`aggregate` built-ins — codegen'd, no UDF.
  */
object Similarity {

  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** (vec_id, v): embeddings widened to double for exact-order parity. */
  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private val DotSql = "list_dot_product"
  private def cosSql(a: String, b: String): String =
    s"round($DotSql($a, $b) / (sqrt($DotSql($a, $a)) * sqrt($DotSql($b, $b))), 6)"

  private val bucketSql =
    """(CASE WHEN v[1] > 0 THEN 8 ELSE 0 END + CASE WHEN v[9] > 0 THEN 4 ELSE 0 END
      | + CASE WHEN v[17] > 0 THEN 2 ELSE 0 END + CASE WHEN v[25] > 0 THEN 1 ELSE 0 END)""".stripMargin

  private def bucket(v: Column): Column =
    when(element_at(v, 1) > 0, 8).otherwise(0) +
      when(element_at(v, 9) > 0, 4).otherwise(0) +
      when(element_at(v, 17) > 0, 2).otherwise(0) +
      when(element_at(v, 25) > 0, 1).otherwise(0)

  val queries: Seq[Q] = Seq(

    // ---- brute-force cosine top-3 for 20 probe vectors ----
    Q("q_embed_topk",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT * FROM e WHERE vec_id < 20),
         |sims AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cand, ${cosSql("q.v", "c.v")} AS cos_r
         |  FROM q JOIN e c ON c.vec_id <> q.vec_id
         |)
         |SELECT qid, rn, cand, cos_r FROM (
         |  SELECT qid, cand, cos_r,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cand) AS rn
         |  FROM sims
         |) WHERE rn <= 3 ORDER BY qid, rn""".stripMargin) { (s, d) =>
      val q = vecs(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val sims = vecs(s, d).select(col("vec_id").as("cand"), col("v"))
        .join(broadcast(q), col("cand") =!= col("qid"))
        .select(col("qid"), col("cand"), round(cosine(col("qv"), col("v")), 6).as("cos_r"))
      val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("cand").asc)
      sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("qid", "rn", "cand", "cos_r")
        .orderBy("qid", "rn")
    },

    // ---- sign-LSH bucketed top-1: equi-join on bucket id ----
    Q("q_embed_lsh",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $bucketSql AS bkt FROM e),
         |q AS (SELECT * FROM b WHERE vec_id < 20),
         |sims AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS cand, ${cosSql("q.v", "c.v")} AS cos_r
         |  FROM q JOIN b c ON q.bkt = c.bkt AND c.vec_id <> q.vec_id
         |)
         |SELECT qid, cand, cos_r FROM (
         |  SELECT qid, cand, cos_r,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cand) AS rn
         |  FROM sims
         |) WHERE rn = 1 ORDER BY qid""".stripMargin) { (s, d) =>
      val b = vecs(s, d).withColumn("bkt", bucket(col("v")))
      val q = b.select(col("vec_id").as("qid"), col("v").as("qv"), col("bkt"))
        .filter(col("qid") < 20)
      val sims = b.select(col("vec_id").as("cand"), col("v"), col("bkt"))
        .join(q, Seq("bkt"))
        .filter(col("cand") =!= col("qid"))
        .select(col("qid"), col("cand"), round(cosine(col("qv"), col("v")), 6).as("cos_r"))
      val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("cand").asc)
      sims.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("qid", "cand", "cos_r")
        .orderBy("qid")
    }
  )
}
