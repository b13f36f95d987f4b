package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: interleave the bits of two key
  * columns so that sorting by the single z-value places rows that are
  * close in BOTH dimensions into the same files/row-groups.
  *
  * Why this matters at 100 TB: parquet scan pruning works off per-file
  * and per-row-group min/max statistics. A table sorted by one key prunes
  * filters on that key only — every file still spans the full range of
  * the second key, so a filter on it reads everything. Z-ordered files
  * cover a bounded box in EVERY interleaved dimension (k files ⇒ extent
  * ≈ range / k^(1/d) per dimension), so selective filters on either key
  * skip most files at plan time. This is the layout trick Delta/Iceberg
  * expose as `OPTIMIZE ZORDER BY`; here it is a plain column expression
  * plus the [[PhysicalLayout]]-style writer, with the locality contract
  * pinned by ZOrderSpec rather than promised in a comment.
  *
  * The z-value is exact integer bit arithmetic — shifts, masks, adds —
  * so the DuckDB oracle reproduces it bit-for-bit (no doubles anywhere).
  */
object ZOrder {

  /** Morton code of `(x, y)`, `bits` bits per dimension: bit j of x lands
    * at position 2j, bit j of y at 2j+1. Inputs must already be in
    * [0, 2^bits); callers bucket/normalize first. 2·bits ≤ 62.
    */
  def zval(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    val xs = x.cast("long"); val ys = y.cast("long")
    (0 until bits).map { j =>
      shiftright(xs, j).bitwiseAND(1) * (1L << (2 * j)) +
        shiftright(ys, j).bitwiseAND(1) * (1L << (2 * j + 1))
    }.reduce(_ + _)
  }

  /** The same Morton code as a DuckDB SQL expression over `x`/`y` terms. */
  def zvalSql(x: String, y: String, bits: Int): String = {
    val terms = (0 until bits).flatMap { j =>
      Seq(s"((($x) >> $j) & 1) * ${1L << (2 * j)}",
          s"((($y) >> $j) & 1) * ${1L << (2 * j + 1)}")
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }

  /** Write `df` z-ordered on `(xCol, yCol)` (already-bucketed integer
    * columns in [0, 2^bits)): range-repartition by z-value into `files`
    * output files, sorted within each — every file then covers one
    * contiguous z-range, i.e. a bounded box in both dimensions, which is
    * what the scan statistics prune on. The z column itself is dropped
    * from the output: it is a layout device, not data.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    bits: Int, files: Int): Unit =
    df.withColumn("__z", zval(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  private val Bits = 10 // keys bucketed to [0, 1024)
  // top 6 of the 2·Bits interleaved z bits = 64 segments; DERIVED so a
  // Bits change cannot silently leave a stale shift in engine + oracle
  // (both share this constant) and break the 64-segment contract
  private val SegShift = 2 * Bits - 6

  val queries: Seq[Q] = Seq(

    // ---- z-value computation + 2-D box selectivity per curve segment ----
    // The auditable core of the layout: rows bucketed to a 1024×1024 grid,
    // z-ordered, then summarized per curve segment (top 6 z bits = 64
    // segments ≈ "files"). n_in_box counts a 2-D range query's hits per
    // segment — the skew of that histogram (most segments zero) IS the
    // file-pruning win, measured instead of asserted.
    Q("q_layout_zorder", {
      val z = zvalSql("l_partkey % 1024", "l_orderkey % 1024", Bits)
      s"""SELECT seg, count(*) AS n, min(z) AS min_z, max(z) AS max_z,
         |  CAST(sum(CASE WHEN x >= 256 AND x < 384 AND y >= 512 AND y < 640
         |       THEN 1 ELSE 0 END) AS BIGINT) AS n_in_box
         |FROM (
         |  SELECT $z AS z, ($z) >> $SegShift AS seg,
         |    l_partkey % 1024 AS x, l_orderkey % 1024 AS y
         |  FROM lineitem
         |)
         |GROUP BY seg ORDER BY seg""".stripMargin
    }) { (s, d) =>
      val base = Tables.lineitem(s, d).select(
        (col("l_partkey") % 1024).as("x"), (col("l_orderkey") % 1024).as("y"))
      base
        .select(col("x"), col("y"), zval(col("x"), col("y"), Bits).as("z"))
        .groupBy(shiftright(col("z"), SegShift).as("seg"))
        .agg(count(lit(1)).as("n"), min("z").as("min_z"), max("z").as("max_z"),
             sum(when(col("x") >= 256 && col("x") < 384 &&
                      col("y") >= 512 && col("y") < 640, 1).otherwise(0))
               .cast("long").as("n_in_box"))
        .orderBy("seg")
    }
  )
}
