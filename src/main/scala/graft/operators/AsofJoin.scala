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
  */
object AsofJoin {

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
    val payload = struct(rightCols.map { case (f, t) => col(f).as(t) }: _*)
    val r0 = right.select(col(key).as("__k"), col(rightTs).as("__ts"),
                          lit(0).as("__tag"), payload.as("__rp"))
    val rpType = r0.schema("__rp").dataType

    val l0 = left.select(col(key).as("__k") +: col(leftTs).as("__ts") +:
      lit(1).as("__tag") +: lit(null).cast(rpType).as("__rp") +:
      left.columns.toSeq.map(col): _*)
    val rFull = r0.select(col("__k") +: col("__ts") +: col("__tag") +: col("__rp") +:
      left.schema.fields.toSeq.map(f => lit(null).cast(f.dataType).as(f.name)): _*)

    val w = Window.partitionBy("__k").orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l0.unionByName(rFull)
      .withColumn("__rp", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(left.columns.toSeq.map(col) ++
        rightCols.map { case (_, t) => col(s"__rp.$t").as(t) }: _*)
  }
}
