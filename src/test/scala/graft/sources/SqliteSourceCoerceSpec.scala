package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

class SqliteSourceCoerceSpec extends AnyFunSuite {

  test("DATETIME text with a timezone offset coerces to the UTC instant, not null") {
    // python's sqlite3 adapter stores tz-aware datetimes as
    // isoformat(sep=' ') WITH offset — the reference's ctime shape
    val utc = SqliteSource.coerce("2023-01-01 00:00:00+00:00", TimestampType)
    assert(utc == java.sql.Timestamp.from(java.time.Instant.parse("2023-01-01T00:00:00Z")))
    val plus2 = SqliteSource.coerce("2023-01-01 12:30:00+02:00", TimestampType)
    assert(plus2 == java.sql.Timestamp.from(java.time.Instant.parse("2023-01-01T10:30:00Z")))
    // naive text still parses as UTC wall-clock
    val naive = SqliteSource.coerce("2023-01-01 00:00:00", TimestampType)
    assert(naive == java.sql.Timestamp.from(java.time.Instant.parse("2023-01-01T00:00:00Z")))
    // garbage still nulls rather than throwing
    assert(SqliteSource.coerce("not a time", TimestampType) == null)
  }

  test("integer DATETIME is epoch-seconds; an overflowing magnitude nulls, not wraps") {
    assert(SqliteSource.coerce(1672531200L, TimestampType) ==
      java.sql.Timestamp.from(java.time.Instant.parse("2023-01-01T00:00:00Z")))
    // a micros/nanos-convention producer (or corrupt cell) would wrap the
    // millis Long into a nonsense instant — degrade to NULL instead
    assert(SqliteSource.coerce(Long.MaxValue / 100L, TimestampType) == null)
    assert(SqliteSource.coerce(Long.MinValue / 100L, TimestampType) == null)
  }

  test("register skips WITHOUT ROWID and CTAS tables loudly, keeps the rest") {
    import scala.sys.process._
    val spark = graft.SparkSuite.spark
    val db = java.nio.file.Files.createTempDirectory("graft-extdb")
      .resolve("ext.db").toString
    val sql =
      """CREATE TABLE plain (id INTEGER, name TEXT);
        |INSERT INTO plain VALUES (1, 'a'), (2, 'b');
        |CREATE TABLE norowid (k TEXT PRIMARY KEY, v INTEGER) WITHOUT ROWID;
        |INSERT INTO norowid VALUES ('x', 1);
        |CREATE TABLE ctas AS SELECT 42 AS answer;
        |""".stripMargin
    assert((s"sqlite3 $db" #< new java.io.ByteArrayInputStream(
      sql.getBytes("UTF-8"))).! == 0)
    val registered = SqliteSource.register(spark, db)
    // SQLite itself normalizes CTAS DDL to a paren'd column list
    // (`CREATE TABLE ctas(answer)`) so it registers fine; only the
    // WITHOUT ROWID table (index-format pages) is skipped
    assert(registered == Seq("ctas", "plain"),
      s"rowid tables register, WITHOUT ROWID skips: $registered")
    assert(spark.table("plain").count() == 2)
    assert(spark.table("ctas").count() == 1)
    // a direct request for an unsupported table refuses BY NAME
    val e = intercept[IllegalArgumentException](
      SqliteSource.table(spark, db, "norowid"))
    assert(e.getMessage.contains("norowid") && e.getMessage.contains("WITHOUT ROWID"))
  }
}
