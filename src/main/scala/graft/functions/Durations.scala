package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Duration-literal parsing (SURVEY.md §2.I1): the reference's config takes
  * duration strings like `60d`, `1h` (cloud2sql config-template.yaml:40-44).
  * Pure Catalyst expression composition — no UDF, stays inside whole-stage
  * codegen.
  */
object Durations {
  // 1..13 digits: 9999999999999 * 604800 ≈ 6.0e18 < Long.MaxValue, so an
  // in-pattern match can NEVER overflow the cast or the multiply. An
  // unbounded \d+ would diverge cross-engine on absurd inputs: Spark's
  // non-ANSI cast yields NULL (or a silently wrapped product) where
  // DuckDB raises a conversion error. Longer digit runs now simply fail
  // the pattern -> NULL in BOTH engines, like any other malformed string.
  // \z, not $: Java's '$' (no MULTILINE) still matches BEFORE a trailing
  // newline ("60d\n" would parse), while RE2's '$' is end-of-text — \z
  // pins end-of-input identically in both engines.
  private val Pat = "^(\\d{1,13})([smhdw])\\z"

  /** `'60d'` -> 5184000L (seconds); null for non-matching strings. */
  def durationToSeconds(c: Column): Column = {
    val num = nullif(regexp_extract(c, Pat, 1), lit("")).cast("long")
    val unit = regexp_extract(c, Pat, 2)
    num * when(unit === "s", 1L).when(unit === "m", 60L)
      .when(unit === "h", 3600L).when(unit === "d", 86400L)
      .when(unit === "w", 604800L)
  }

  /** The same expression as DuckDB-compatible SQL over a column name. */
  def durationToSecondsSql(colName: String): String =
    s"""CAST(nullif(regexp_extract($colName, '$Pat', 1), '') AS BIGINT) *
       | CASE regexp_extract($colName, '$Pat', 2)
       |   WHEN 's' THEN 1 WHEN 'm' THEN 60 WHEN 'h' THEN 3600
       |   WHEN 'd' THEN 86400 WHEN 'w' THEN 604800 END""".stripMargin
}
