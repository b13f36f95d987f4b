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
}
