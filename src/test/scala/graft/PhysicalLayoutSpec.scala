package graft

import graft.operators.PhysicalLayout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-layout contracts: bucketed tables join without an
  * Exchange, partitioned directories prune at plan time. These are the
  * write-once/shuffle-never guarantees a 100 TB deployment relies on —
  * if a Spark upgrade or conf change silently re-introduces the shuffle,
  * this suite fails instead of the cluster bill.
  */
class PhysicalLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(df: DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.take(i) else s
  }

  /** Run `body` with broadcast joins disabled so the exchange-free claim
    * is proven by BUCKETING, not by the small test data broadcasting.
    */
  private def withoutBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed fact-to-fact join plans with no Exchange on either side") {
    PhysicalLayout.writeBucketed(
      Tables.orders(spark, dir), "orders_b", "o_custkey", 8)
    PhysicalLayout.writeBucketed(
      Tables.customer(spark, dir), "customer_b", "c_custkey", 8)
    try withoutBroadcast {
      // keyed on the bucket column end-to-end: join AND the downstream
      // per-customer aggregate both reuse the bucket distribution, so the
      // whole plan runs with ZERO Exchange
      def shape(o: DataFrame, c: DataFrame) = o
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
      val joined = shape(spark.table("orders_b"), spark.table("customer_b"))
      val plan = executedPlan(joined)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"join disappeared from the plan:\n$plan")
      // correctness unchanged vs the unbucketed join
      val expect = shape(Tables.orders(spark, dir), Tables.customer(spark, dir))
      assert(joined.orderBy("c_custkey").collect().toSeq
        == expect.orderBy("c_custkey").collect().toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("aggregation on the bucket key reuses the bucket distribution (no Exchange)") {
    PhysicalLayout.writeBucketed(
      Tables.orders(spark, dir), "orders_agg_b", "o_custkey", 8)
    try {
      val agg = spark.table("orders_agg_b")
        .groupBy("o_custkey").agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
      val plan = executedPlan(agg)
      assert(!plan.contains("Exchange"),
        s"bucket-keyed aggregation must not shuffle:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS orders_agg_b")
  }

  test("partitioned events scan prunes to the filtered days at plan time") {
    val base = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = Tables.events(spark, dir)
      .withColumn("d", to_date(col("ts")))
    PhysicalLayout.writePartitioned(events, s"$base/events", "d")
    val read = spark.read.parquet(s"$base/events")
    val days = read.select("d").distinct().count()
    assert(days > 1, "fixture must span multiple days for pruning to mean anything")
    val oneDay = read.filter(col("d") === read.select(min("d")).head.getDate(0))
    val plan = executedPlan(oneDay)
    // the partition filter must be applied at the scan, not as a post-filter
    assert(plan.contains("PartitionFilters: ["), s"no partition filters:\n$plan")
    assert("PartitionFilters: \\[[^\\]]*d".r.findFirstIn(plan).isDefined,
      s"partition filter on d not pushed:\n$plan")
  }
}
