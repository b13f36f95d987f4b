package graft

import graft.operators.DistributedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DistributedRank must reproduce the SQL window functions bit-for-bit —
  * including heavy score ties (broken by id) and every N mod k bucket-size
  * case — while planning no single-partition window or sort.
  */
class DistributedRankSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Deterministic scores with deliberate tie mass: 40% of rows share one
    * of four tie plateaus, the rest are distinct.
    */
  private def sample(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val score =
        if (i % 5 < 2) (i % 4) * 10.0 // tie plateaus 0/10/20/30
        else i * 0.7 - n * 0.2
      (i.toLong, score)
    }.toDF("id", "score")
  }

  private def windowNtile(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("bucket",
      ntile(k).over(Window.orderBy(col("score").desc, col("id").asc)))

  test("ntileDesc equals the ntile window function incl. ties and N mod k") {
    for (n <- Seq(1, 2, 3, 7, 100, 101, 102); k <- Seq(2, 3, 5)) {
      val df = sample(n)
      val expected = windowNtile(df, k)
        .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = DistributedRank.ntileDesc(df, "score", "id", k)
        .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected, s"ntile($k) mismatch at n=$n")
      spark.catalog.clearCache()
    }
  }

  test("rankDesc equals the row_number window function") {
    val df = sample(97)
    val expected = df.withColumn("rk",
        row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = DistributedRank.rankDesc(df, "score", "id")
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    spark.catalog.clearCache()
  }

  test("rankDescWithThresholds equals rankDesc for ANY threshold literals") {
    // thresholds only set group balance, never the result (the r18
    // uniform-hash fast path rests on exactly this): unsorted,
    // duplicated, out-of-range, empty — all must rank identically
    val df = sample(101)
    val expected = DistributedRank.rankDesc(df, "score", "id")
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    for (ths <- Seq(Seq(10.0, -5.0, 10.0, 1e9), Seq.empty[Double],
                    Seq(0.0), (1 to 64).map(_ * 0.9 - 30))) {
      val got = DistributedRank.rankDescWithThresholds(df, "score", "id", ths)
        .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"thresholds $ths changed the rank")
      spark.catalog.clearCache()
    }
  }

  test("rankDesc handles integral scores and string tie-break ids") {
    // the symbolIds shape: LONG frequencies (percentile_approx returns its
    // input type — must not class-cast on the threshold collect) with a
    // string id column breaking ties ascending
    import spark.implicits._
    val df = Seq(("b", 4L), ("a", 4L), ("c", 3L), ("d", 10L)).toDF("sym", "sfreq")
    val got = DistributedRank.rankDesc(df, "sfreq", "sym", "rk")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("d" -> 1L, "a" -> 2L, "b" -> 3L, "c" -> 4L))
    spark.catalog.clearCache()
  }

  test("all-equal scores degenerate to one group but stay exact") {
    import spark.implicits._
    val df = (0 until 50).map(i => (i.toLong, 1.0)).toDF("id", "score")
    val got = DistributedRank.ntileDesc(df, "score", "id", 3)
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // ties broken by id ascending: ids 0-16 bucket 1 (17), 17-33 bucket 2
    // (17), 34-49 bucket 3 (16)
    assert((0L to 16L).forall(got(_) == 1))
    assert((17L to 33L).forall(got(_) == 2))
    assert((34L to 49L).forall(got(_) == 3))
    spark.catalog.clearCache()
  }

  test("empty input yields empty output, no failure") {
    import spark.implicits._
    val df = Seq.empty[(Long, Double)].toDF("id", "score")
    assert(DistributedRank.ntileDesc(df, "score", "id", 3).count() == 0)
    spark.catalog.clearCache()
  }

  test("boundariesDesc returns the last (score,id) pair of each bucket") {
    val df = sample(100)
    val rows = df.select("id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val sorted = rows.sortBy { case (id, sc) => (-sc, id) }
    val n = sorted.length
    // boundary ranks under the standard ntile sizing rule (1-based)
    val k1 = n / 3 + (if (n % 3 >= 1) 1 else 0)
    val k2 = 2 * (n / 3) + math.min(n % 3, 2)
    val expected = Seq(sorted(k1 - 1), sorted(k2 - 1))
      .map { case (id, sc) => (sc, id) }
    val got = DistributedRank.boundariesDesc(df, "score", "id", 3)
    assert(got == expected)
    spark.catalog.clearCache()
  }

  test("cumSumDesc equals the running-sum window function incl. ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (n <- Seq(1, 3, 97, 500)) {
      val df = (0 until n).map { i =>
        (i.toLong, (i % 7) * 1.5, 1L + rnd.nextInt(50)) // heavy score ties
      }.toDF("id", "score", "w")
      val expected = df.withColumn("cum",
          sum("w").over(Window.orderBy(col("score").desc, col("id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = DistributedRank.cumSumDesc(df, "score", "id", "w")
        .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"running sum mismatch at n=$n")
      spark.catalog.clearCache()
    }
  }

  test("boundariesDesc on degenerate N < n input replicates shared cut pairs — bucket numbering stays stable") {
    import spark.implicits._
    // one trained row, three buckets: both boundary ranks coincide at
    // rank 1; the pair must be REPLICATED (2 entries), not collapsed, so
    // serving keeps n-1 boundaries and the open tail is always bucket n
    val df = Seq((7L, 0.5)).toDF("id", "score")
    val bs = DistributedRank.boundariesDesc(df, "score", "id", 3)
    assert(bs == Seq((0.5, 7L), (0.5, 7L)), s"got $bs")
    spark.catalog.clearCache()
    // the trained row buckets 1 (matching ntileDesc); a NEW row ordering
    // strictly after every boundary lands in the TAIL bucket (3), which a
    // collapsed boundary list would have shifted to 2
    val serve = Seq((7L, 0.5), (99L, 0.1)).toDF("id", "score")
    val got = DistributedRank.bucketByBoundaries(serve, "score", "id", bs)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == Map(7L -> 1, 99L -> 3), s"got $got")
    spark.catalog.clearCache()
  }

  test("bucketByBoundaries on the trained rows reproduces ntileDesc exactly") {
    for (n <- Seq(7, 100, 101)) {
      val df = sample(n)
      val expected = DistributedRank.ntileDesc(df, "score", "id", 3)
        .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      spark.catalog.clearCache()
      val bs = DistributedRank.boundariesDesc(df, "score", "id", 3)
      val got = DistributedRank.bucketByBoundaries(df, "score", "id", bs)
        .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected, s"boundary-projection buckets diverge at n=$n")
      spark.catalog.clearCache()
    }
  }

  test("executed plan has no single-partition exchange (the point of the op)") {
    val df = sample(5000)
    val ranked = DistributedRank.ntileDesc(df, "score", "id", 3)
    ranked.collect()
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"DistributedRank planned a single-partition exchange:\n$plan")
    spark.catalog.clearCache()
  }
}
