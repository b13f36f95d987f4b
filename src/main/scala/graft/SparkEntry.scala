package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator from SURVEY.md §2 is declared as a [[Q]] in one of the
  * module objects below; this object only assembles them.
  */
object SparkEntry {

  private def modules: Seq[Q] =
    operators.Relational.queries ++
    operators.PhysicalLayout.queries ++
    operators.ZOrder.queries ++
    operators.Events.queries ++
    functions.Scalars.queries ++
    ext.Dedup.queries ++
    ext.SubstringDedup.queries ++
    ext.MixtureSample.queries ++
    ext.Dsir.queries ++
    ext.QualityClassifier.queries ++
    ext.Bm25.queries ++
    ext.CurationReport.queries ++
    ext.Mmr.queries ++
    ext.Similarity.queries ++
    ext.TextAnalysis.queries ++
    ext.Bpe.queries ++
    ext.Multimodal.queries ++
    ext.Sharding.queries ++
    ext.Pipeline.queries

  private lazy val byName: Map[String, Q] = {
    // toMap is last-wins: a duplicate name across modules would silently
    // SHADOW the earlier query AND its oracle — the driver would then
    // verify only the shadowing one, and coverage of the shadowed operator
    // would vanish with zero signal. Fail at first use instead.
    val dup = modules.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty,
      s"duplicate declared query name(s): ${dup.mkString(", ")}")
    modules.map(q => q.name -> q).toMap
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    byName("q_join_revenue_by_nation").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    byName.map { case (n, q) => n -> q.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    * Built THROUGH byName so a duplicate query name fails here too — a
    * driver that only enumerates oracles must hit the same guard, not a
    * silently shadowed map.
    */
  def oracleSql: Map[String, String] =
    byName.flatMap { case (n, q) => q.oracle.map(n -> _) }
}
