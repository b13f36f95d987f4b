package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the z-order layout contract: every z-ordered output file covers a
  * bounded box in BOTH interleaved dimensions — the property parquet
  * min/max pruning needs to skip files for selective filters on either
  * key. A single-column sort provably cannot deliver this (its files span
  * the full range of the other key), which the baseline comparison shows.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = "/root/testdata/sf0.001"

  test("zval interleaves bits exactly") {
    val rows = spark.range(1).select(
      ZOrder.zval(lit(0), lit(0), 10).as("z00"),
      ZOrder.zval(lit(1023), lit(1023), 10).as("zmax"),
      ZOrder.zval(lit(1), lit(0), 10).as("zx"),   // x bit 0 -> z bit 0
      ZOrder.zval(lit(0), lit(1), 10).as("zy"),   // y bit 0 -> z bit 1
      ZOrder.zval(lit(5), lit(3), 3).as("zmix"))  // x=101, y=011 -> 011011
      .head()
    assert(rows.getLong(0) == 0L)
    assert(rows.getLong(1) == (1L << 20) - 1)
    assert(rows.getLong(2) == 1L)
    assert(rows.getLong(3) == 2L)
    assert(rows.getLong(4) == 27L)
  }

  test("z-order prunes files on EITHER dimension; linear sort on one only") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-zorder").toString
    // hash-derived keys: uniform over the full 1024-grid at any SF (the
    // raw sf0.001 key ranges are too small to exercise the curve)
    val df = Tables.lineitem(spark, dir).select(
      pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(1024)).cast("long").as("x"),
      pmod(hash(col("l_partkey"), col("l_suppkey")), lit(1024)).cast("long").as("y"))

    ZOrder.writeZOrdered(df, s"$base/zorder", "x", "y", bits = 10, files = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/linear")

    // per-file bounding boxes — exactly what parquet footer stats expose
    def boxes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("minx"), max("x").as("maxx"),
           min("y").as("miny"), max("y").as("maxy"))
      .select("minx", "maxx", "miny", "maxy")
      .collect()

    // files a stats-based scan must read for a 128-wide range filter:
    // those whose per-file [min, max] intersects the predicate range
    def survivors(path: String, minC: Int, maxC: Int, lo: Int, hi: Int) =
      boxes(path).count(r => r.getLong(maxC) >= lo && r.getLong(minC) < hi)

    val zX   = survivors(s"$base/zorder", 0, 1, 256, 384) // x ∈ [256, 384)
    val zY   = survivors(s"$base/zorder", 2, 3, 512, 640) // y ∈ [512, 640)
    val linX = survivors(s"$base/linear", 0, 1, 256, 384)
    val linY = survivors(s"$base/linear", 2, 3, 512, 640)

    // linear: tight on its sort key, but every file spans y — zero pruning
    assert(linX <= 4, s"linear should prune on x, read $linX/16")
    assert(linY == 16, s"linear cannot prune on y, read $linY/16")
    // z-order: meaningful pruning on BOTH dimensions (≤ half the files;
    // a few z-ranges straddle high-bit curve transitions, so not minimal)
    assert(zX <= 8, s"z-order x pruning too weak: read $zX/16")
    assert(zY <= 8, s"z-order y pruning too weak: read $zY/16")
  }
}
