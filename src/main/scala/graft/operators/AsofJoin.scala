package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.C5): for each left row, attach the latest right
  * row with the same key and `rightTs <= leftTs`.
  *
  * Spark has no native ASOF JOIN. The naive rewrite (theta join + window
  * rank) materializes every candidate pair — O(L×R) within a key, ruinous
  * at 100 TB. This implementation is the scalable union-sort form:
  *
  *   1. UNION both sides tagged 0 (right) / 1 (left), right payload packed
  *      into one struct so it carries atomically;
  *   2. one shuffle, partitioned by key, sorted by (ts, tag);
  *   3. `last(payload, ignoreNulls)` over an unbounded-preceding running
  *      frame carries the most recent right row forward;
  *   4. keep tag=1 rows and unpack the payload.
  *
  * Cost: a single shuffle of |L|+|R| rows — same as one sort-merge join
  * pass, no pair blowup, skew bounded by per-key row counts. Ties
  * (rightTs == leftTs) sort the right row first, i.e. an equal-timestamp
  * right row IS visible, matching DuckDB `ASOF JOIN ... ON r.ts <= l.ts`.
  *
  * Null semantics match SQL's: a right row with NULL `rightTs` can never
  * satisfy `rightTs <= leftTs` (UNKNOWN), so it is filtered out up front —
  * without the filter it would sort NULLS FIRST and phantom-match every
  * otherwise-unmatched left row. A left row with NULL `leftTs` likewise
  * sorts before every (non-null) right row and gets a NULL payload.
  *
  * Determinism: among right rows sharing (key, ts), the carried payload is
  * the GREATEST payload struct (field-lexicographic — put the id first in
  * `rightCols` to pin "highest id wins"), provided the payload type is
  * orderable (no maps); a map-bearing payload falls back to
  * partition-order ties like SQL ASOF implementations do.
  */
object AsofJoin {

  private val Reserved = Seq("__k", "__ts", "__tag", "__rp")

  // a payload is orderable iff no MapType appears anywhere in its type
  // tree — the same invariant (and walk) as SkewJoin's salt-column pick
  private def orderable(dt: org.apache.spark.sql.types.DataType): Boolean =
    SkewJoin.mapFree(dt)

  /** @param rightCols right payload columns to carry, as (rightName -> outName);
    *                  outNames must not collide with left column names.
    * @return all left columns + carried payload columns (null when no match)
    */
  def leftAsof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[(String, String)]): DataFrame = {
    Reserved.foreach { n =>
      require(!left.columns.contains(n) && !right.columns.contains(n),
        s"leftAsof reserves column name $n; rename it on the input")
    }
    // enforce (not just document) the outName contract: a collision with a
    // left column would silently emit two same-named columns, failing far
    // downstream with AMBIGUOUS_REFERENCE — same fail-fast stance as the
    // reserved names above
    val outDup = rightCols.map(_._2).diff(rightCols.map(_._2).distinct)
    require(outDup.isEmpty,
      s"leftAsof: duplicate output name(s) in rightCols: ${outDup.distinct.mkString(", ")}")
    val outClash = rightCols.map(_._2).filter(left.columns.contains)
    require(outClash.isEmpty,
      s"leftAsof: rightCols output name(s) collide with left columns: " +
        s"${outClash.mkString(", ")} — alias them via (rightName -> outName)")
    val payload = struct(rightCols.map { case (f, t) => col(f).as(t) }: _*)
    // NULL-ts right rows can never match (predicate UNKNOWN) — and unfiltered
    // they would sort NULLS FIRST and carry into every unmatched left row.
    // NULL-KEY right rows likewise: SQL equality never matches NULL = NULL,
    // but Window.partitionBy groups the NULLs into ONE partition, so
    // without the filter a NULL-key right row would phantom-match every
    // NULL-key left row (a NULL-key LEFT row needs no filter — its
    // partition is then empty of right rows and the payload stays null)
    val r0 = right.filter(col(rightTs).isNotNull && col(key).isNotNull)
      .select(col(key).as("__k"), col(rightTs).as("__ts"),
              lit(0).as("__tag"), payload.as("__rp"))
    val rpType = r0.schema("__rp").dataType

    val l0 = left.select(col(key).as("__k") +: col(leftTs).as("__ts") +:
      lit(1).as("__tag") +: lit(null).cast(rpType).as("__rp") +:
      left.columns.toSeq.map(col): _*)
    val rFull = r0.select(col("__k") +: col("__ts") +: col("__tag") +: col("__rp") +:
      left.schema.fields.toSeq.map(f => lit(null).cast(f.dataType).as(f.name)): _*)

    // deterministic winner among equal-(key, ts) right rows: the running
    // last() picks the row sorting LAST within the tag-0 block, so an
    // ascending __rp order makes that the greatest payload struct. Left
    // rows (__rp NULL, NULLS FIRST within their tag-1 block) still follow
    // every equal-ts right row via the __tag key.
    val order =
      if (orderable(rpType))
        Seq(col("__ts").asc, col("__tag").asc, col("__rp").asc)
      else Seq(col("__ts").asc, col("__tag").asc)
    val w = Window.partitionBy("__k").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l0.unionByName(rFull)
      .withColumn("__rp", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(left.columns.toSeq.map(col) ++
        rightCols.map { case (_, t) => col(s"__rp.$t").as(t) }: _*)
  }
}
