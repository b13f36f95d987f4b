package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** The portability gate for the events timestamp column (BASELINE.md).
  *
  * The parquet physical shape of `events.ts` is PRODUCER-controlled and has
  * in fact changed under this repo between driver testdata generations:
  * r≤7 shipped INT64 TIMESTAMP(NANOS), the 2026-08-13 regeneration ships
  * INT64 TIMESTAMP(isAdjustedToUTC=false, MICROS) (TIMESTAMP_NTZ). The
  * silent switch broke 3 operators and 4 tests in round 8. This spec writes
  * one tiny fixture per producer shape — genuine files, the nanos one via
  * parquet-mr because Spark cannot author TIMESTAMP(NANOS) — and pins that
  * batch loader and file-stream reader both land every shape on the SAME
  * 2024-dated instants. Reintroducing a shape assumption fails here, not in
  * a driver round.
  */
class EventsTsPortabilitySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // (event_id, epoch-micros, user_id, event_type, value) — 2024-dated, with
  // sub-second micros to catch unit mix-ups (a ms/us swap moves the date)
  private val t0 = java.time.Instant.parse("2024-05-01T00:00:00Z")
    .getEpochSecond * 1000000L
  private val rows: Seq[(Long, Long, Long, String, Double)] = Seq(
    (1L, t0,                  7L, "view",     1.0),
    (2L, t0 +      123456L,   7L, "click",    2.5),
    (3L, t0 + 3600L * 1000000L + 1L, 7L, "purchase", 9.9),
    (4L, t0 + 86400L * 1000000L,     8L, "view",     0.5))

  /** Spark-authored fixture: ts as TIMESTAMP_NTZ (micros, isAdjustedToUTC=
    * false) or UTC-adjusted TIMESTAMP — the two shapes Spark can write.
    */
  private def writeSparkFixture(dir: String, ntz: Boolean): Unit = {
    import spark.implicits._
    val tsCol =
      if (ntz) timestamp_micros(col("us")).cast(TimestampNTZType)
      else timestamp_micros(col("us")).cast(TimestampType)
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    // pin micros so the LTZ fixture is INT64 TIMESTAMP(UTC, MICROS), not
    // whatever the session default (e.g. INT96) would produce
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), tsCol.as("ts"), col("user_id"),
              col("event_type"), col("value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally prev.foreach(spark.conf.set("spark.sql.parquet.outputTimestampType", _))
  }

  /** parquet-mr-authored fixture: genuine INT64 TIMESTAMP(NANOS) — the
    * r≤7 testdata shape, unwritable from Spark.
    */
  private def writeNanosFixture(dir: String): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .named("events")
    val sub = new java.io.File(s"$dir/events.parquet"); sub.mkdirs()
    val file = new org.apache.hadoop.fs.Path(s"$dir/events.parquet/part-00000.parquet")
    val writer = ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(file, new org.apache.hadoop.conf.Configuration()))
      .withType(schema)
      .build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, us, uid, typ, v) =>
      val g = gf.newGroup()
      g.add("event_id", id)
      g.add("ts", us * 1000L) // nanos
      g.add("user_id", uid)
      g.add("event_type", typ)
      g.add("value", v)
      writer.write(g)
    } finally writer.close()
  }

  private lazy val fixtures: Seq[(String, String)] = {
    val base = java.nio.file.Files.createTempDirectory("graft-ts-shapes").toString
    writeNanosFixture(s"$base/nanos")
    writeSparkFixture(s"$base/ntz", ntz = true)
    writeSparkFixture(s"$base/utc", ntz = false)
    Seq("nanos" -> s"$base/nanos", "ntz" -> s"$base/ntz", "utc" -> s"$base/utc")
  }

  private def canon(df: DataFrame): Seq[(Long, Long, Long, String, Double)] = {
    import spark.implicits._
    df.select(col("event_id"), unix_micros(col("ts")).as("us"), col("user_id"),
              col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
      .collect().sortBy(_._1).toSeq
  }

  test("Tables.events lands all three producer shapes on identical 2024 instants") {
    fixtures.foreach { case (shape, dir) =>
      val got = canon(Tables.events(spark, dir))
      assert(got == rows, s"shape=$shape diverges from the authored instants")
      // and the normalized column is session-UTC TimestampType — the type
      // every downstream unix_micros/window/session_window call requires
      assert(Tables.events(spark, dir).schema("ts").dataType == TimestampType,
        s"shape=$shape not normalized to TimestampType")
    }
  }

  test("eventsStream reads every producer shape identically to the batch loader") {
    fixtures.foreach { case (shape, dir) =>
      val stream = StreamingOps.eventsStream(spark, s"$dir/events.parquet")
      val q = StreamingOps.tumblingCounts(stream)
        .writeStream.format("memory").queryName(s"shape_${shape}_out")
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table(s"shape_${shape}_out")
        .orderBy("ws", "event_type").collect().toSeq
      val batch = StreamingOps.tumblingCounts(Tables.events(spark, dir))
        .orderBy("ws", "event_type").collect().toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"shape=$shape: stream result diverges from batch")
    }
  }

  test("nano normalization FLOORS pre-epoch timestamps (DIV truncates toward zero)") {
    import spark.implicits._
    // -1500 ns = 1969-12-31T23:59:59.9999985Z. Floor → -2 µs; bare DIV
    // would truncate to -1 µs, one microsecond LATE vs DuckDB's flooring
    // nanos→micros conversion.
    val raw = Seq((-1500L, "pre"), (1500L, "post")).toDF("ts", "event_type")
    val got = Tables.normalizeEventsTs(raw)
      .select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(got.toSeq === Seq(-2L, 1L))
  }

  test("NTZ events refuse a non-UTC session timezone instead of shifting") {
    // the NTZ→TZ cast reads wall-clock values in the SESSION timezone; a
    // non-UTC session would silently shift every instant by the zone offset
    val ntzDir = fixtures.find(_._1 == "ntz").get._2
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalArgumentException](Tables.events(spark, ntzDir))
      assert(e.getMessage.contains("session.timeZone"), e.getMessage)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
    // the UTC-adjusted shape carries its zone — still loads under any session tz
    val utcDir = fixtures.find(_._1 == "utc").get._2
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try assert(canon(Tables.events(spark, utcDir)) == rows)
    finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("an unrecognized ts shape fails loudly, not silently") {
    import spark.implicits._
    val weird = Seq((1L, "2024-05-01")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Tables.normalizeEventsTs(weird))
    assert(e.getMessage.contains("normalizeEventsTs"))
  }
}
