package graft

import graft.operators.Compaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("compaction collapses a many-small-file table, data identical") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    // simulate 40 micro-batch commits' worth of small files
    Tables.orders(spark, "/root/testdata/sf0.001")
      .repartition(40).write.parquet(dir)
    val before = spark.read.parquet(dir)
    val expectSum = before.agg(sum(col("o_orderkey"))).head.getLong(0)
    val expectN = before.count()

    val report = Compaction.compact(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(report.filesBefore >= 40 && report.filesAfter < 5,
      s"expected a collapse, got $report")
    val after = spark.read.parquet(dir)
    assert(after.count() == expectN)
    assert(after.agg(sum(col("o_orderkey"))).head.getLong(0) == expectSum)
    // staging/retired artifacts consumed
    assert(!new java.io.File(s"$dir.__compact_staging").exists())
    assert(!new java.io.File(s"$dir.__compact_retired").exists())
  }

  test("a stranded retired dir self-heals before the next compaction") {
    val base = Files.createTempDirectory("graft-compact-heal").toString
    val dir = s"$base/t"
    Tables.nation(spark, "/root/testdata/sf0.001").write.parquet(dir)
    val n = spark.read.parquet(dir).count()
    // simulate a crash after retire, before promote: table dir missing,
    // only the retired copy remains
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(s"$dir.__compact_retired")))
    val report = Compaction.compact(spark, dir)
    assert(report.filesAfter >= 1)
    assert(spark.read.parquet(dir).count() == n, "healed table lost rows")
  }
}
