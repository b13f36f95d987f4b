package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loader for the driver testdata tables (TESTDATA.md).
  *
  * All query builders take `(spark, sfDir)` and load through here so the
  * scan layer stays in one place: parquet scans get column pruning +
  * predicate pushdown from Catalyst for free, and the one data quirk
  * (events.ts is INT64 TIMESTAMP(NANOS), which Spark's vectorized parquet
  * reader does not surface as a TimestampType) is normalized once.
  */
object Tables {
  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def region(s: SparkSession, d: String): DataFrame   = s.read.parquet(path(d, "region"))
  def nation(s: SparkSession, d: String): DataFrame   = s.read.parquet(path(d, "nation"))
  def customer(s: SparkSession, d: String): DataFrame = s.read.parquet(path(d, "customer"))
  def supplier(s: SparkSession, d: String): DataFrame = s.read.parquet(path(d, "supplier"))
  def part(s: SparkSession, d: String): DataFrame     = s.read.parquet(path(d, "part"))
  def orders(s: SparkSession, d: String): DataFrame   = s.read.parquet(path(d, "orders"))
  def lineitem(s: SparkSession, d: String): DataFrame = s.read.parquet(path(d, "lineitem"))
  def documents(s: SparkSession, d: String): DataFrame = s.read.parquet(path(d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = s.read.parquet(path(d, "embeddings"))

  /** events.parquet stores `ts` as parquet INT64 TIMESTAMP(NANOS). Spark has
    * no nanosecond timestamp type; with the legacy flag the column arrives as
    * a LongType nano count, which we truncate to microseconds and surface as
    * a proper TimestampType column (UTC session timezone). Without the flag
    * Spark 4 reads NANOS directly (truncating); handle both shapes.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Spark's parquet reader rejects TIMESTAMP(NANOS) outright unless the
    // legacy conf surfaces it as a raw nano count. All graft entry points
    // set it at session build; this defensive set (same constant value, so
    // idempotent — nothing observable leaks) keeps the loader correct for
    // arbitrary caller-provided sessions too.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(path(d, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer DIV, not `/`: long `/` is double division in Spark and
        // loses sub-µs exactness at 1e18-scale nano counts
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }
  }

  def all(s: SparkSession, d: String): Map[String, DataFrame] = Map(
    "region" -> region(s, d), "nation" -> nation(s, d),
    "customer" -> customer(s, d), "supplier" -> supplier(s, d),
    "part" -> part(s, d), "orders" -> orders(s, d),
    "lineitem" -> lineitem(s, d), "events" -> events(s, d),
    "documents" -> documents(s, d), "embeddings" -> embeddings(s, d))
}

/** One named query: a Spark DataFrame builder plus (when SQL-expressible)
  * the DuckDB oracle SQL the driver replays over the same parquet files.
  * Column names/aliases MUST match between the two — the driver sorts
  * columns by name before hashing.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, Some(oracle))
  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, None)
}
