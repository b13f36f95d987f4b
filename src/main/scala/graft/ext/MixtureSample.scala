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

  // Flagship mixture: upsample src0 2.5×, keep a quarter of src1, drop
  // src2 entirely, pass everything else through at 1×.
  private val W: Map[String, Double] = Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0)
  private val MaxCopies = 3 // static series bound for the oracle: max ceil(w)

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
    }
  )
}
