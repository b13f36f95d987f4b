package graft

import graft.ext.Sharding
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shard-planning contracts: the epoch permutation is a true permutation
  * dealt round-robin (shard sizes within 1), re-seeding re-shuffles, and
  * serpentine token balancing bounds the shard-total spread by far less
  * than a max document.
  */
class ShardingSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def docs(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"text $i")).toDF("doc_id", "text")
  }

  test("epochAssign is a permutation: (shard, pos) pairs are distinct and dense") {
    val k = 7
    val n = 200
    val a = Sharding.epochAssign(docs(n), "e1#", k).collect()
    assert(a.length == n)
    val pairs = a.map(r => (r.getInt(1), r.getLong(2)))
    assert(pairs.distinct.length == n, "duplicate (shard, pos) slot")
    // round-robin by rank: positions within each shard are 0..count-1
    pairs.groupBy(_._1).foreach { case (_, ps) =>
      assert(ps.map(_._2).sorted.sameElements(0L until ps.length.toLong))
    }
    // shard sizes within 1 of each other, every shard populated
    val sizes = pairs.groupBy(_._1).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0 until k).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
  }

  test("a new epoch tag yields a genuinely different permutation") {
    val k = 4
    val e1 = Sharding.epochAssign(docs(100), "e1#", k)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val e2 = Sharding.epochAssign(docs(100), "e2#", k)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val moved = e1.keys.count(id => e1(id) != e2(id))
    // hash-seeded permutations: expect nearly every doc to move slots
    assert(moved > 80, s"only $moved/100 docs changed slot between epochs")
  }

  test("tokenBalancedAssign: spread well under one max-doc, serpentine beats round-robin on skew") {
    import spark.implicits._
    // skewed lengths: doc i has 1 + (i*i % 997) tokens
    val weighted = (0L until 300L).map(i => (i, 1L + (i * i) % 997))
      .toDF("doc_id", "n_tokens")
    val k = 8
    val byShard = Sharding.tokenBalancedAssign(weighted, k)
      .groupBy("shard").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byShard.keySet == (0 until k).toSet)
    val spread = byShard.values.max - byShard.values.min
    val maxDoc = 1L + (0L until 300L).map(i => (i * i) % 997).max
    assert(spread < maxDoc / 2,
      s"serpentine spread $spread not well under max doc $maxDoc")
    // same deal, plain round-robin (no direction flip): strictly worse here
    val rr = graft.operators.DistributedRank
      .rankDesc(weighted, "n_tokens", "doc_id", "rk")
      .select(col("doc_id"), col("n_tokens"),
        pmod(col("rk") - 1, lit(k)).cast("int").as("shard"))
      .groupBy("shard").agg(sum("n_tokens").as("t"))
      .collect().map(_.getLong(1))
    assert(spread < rr.max - rr.min,
      s"serpentine ($spread) should beat round-robin (${rr.max - rr.min}) on skewed sizes")
  }

  test("writeShards: one file per shard dir, file order IS the epoch permutation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val k = 8
    val path = java.nio.file.Files.createTempDirectory("graft-shards").toString
    ext.Sharding.writeShards(docs, "e1#", k, path)
    val expected = ext.Sharding.epochAssign(docs.select("doc_id"), "e1#", k)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    (0 until k).foreach { i =>
      val dir = new java.io.File(s"$path/shard=$i")
      assert(dir.isDirectory, s"missing shard dir $i")
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"shard $i should be ONE file, got ${files.length}")
      // single small file => single input split => scan preserves row
      // order; the file order must be the permutation order
      val inFileOrder = spark.read.parquet(files.head.getPath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(inFileOrder == expected(i),
        s"shard $i file order diverges from the epoch permutation")
    }
    assert(expected.values.map(_.size).sum == docs.count())
  }

  test("every doc is assigned exactly one shard; totals conserved") {
    import spark.implicits._
    val weighted = (0L until 57L).map(i => (i, i % 13 + 1)).toDF("doc_id", "n_tokens")
    val a = Sharding.tokenBalancedAssign(weighted, 5).collect()
    assert(a.map(_.getLong(0)).sorted.sameElements(0L until 57L))
    assert(a.map(_.getLong(1)).sum == (0L until 57L).map(_ % 13 + 1).sum)
  }
}
