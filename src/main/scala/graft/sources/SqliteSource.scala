package graft.sources

import graft.sink.SqliteDbReader
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.File

/** Reads an existing SQLite database — e.g. one produced by the reference
  * (its default destination, cloud2sql `__main__.py:60`) or by our own
  * [[graft.sink.SqliteSnapshotCommit]] — into DataFrames, so a user
  * migrating from cloud2sql can point the engine at their current exports
  * and query on.
  *
  * A SQLite file is inherently a single-node artifact (one file, page
  * chain), so ingest reads it once on the driver and parallelizes the rows
  * into the cluster — the same boundary the reference crosses in the other
  * direction when it INSERTs row batches. Declared column types come from
  * the stored CREATE TABLE text; SQLite cells are dynamically typed, so
  * values are coerced to the declared affinity (DATETIME/DATE text parses
  * back to Spark timestamps/dates, INTEGER-affinity booleans to long, …).
  */
object SqliteSource {

  /** Spark type for a declared SQLite column type (affinity rules). */
  private[sources] def sparkType(declared: String): DataType = {
    val t = declared.trim.toUpperCase
    if (t.contains("INT")) LongType
    else if (t.contains("BOOL")) LongType // stored 0/1
    else if (Seq("REAL", "FLOA", "DOUB", "NUMERIC", "DECIMAL").exists(t.contains)) DoubleType
    else if (t.contains("DATETIME") || t.contains("TIMESTAMP")) TimestampType
    else if (t == "DATE") DateType
    else if (t.contains("BLOB")) BinaryType
    else StringType // TEXT / VARCHAR / CHAR / CLOB / unknown
  }

  /** (name, declaredType) pairs from a stored CREATE TABLE statement. */
  private[sources] def columnsOf(sql: String): Seq[(String, String)] = {
    val inner = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    // split on top-level commas only (NUMERIC(10,2) must not split)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var start = 0
    inner.zipWithIndex.foreach {
      case ('(', _) => depth += 1
      case (')', _) => depth -= 1
      case (',', i) if depth == 0 => parts += inner.substring(start, i); start = i + 1
      case _ =>
    }
    parts += inner.substring(start)
    parts.toSeq.map(_.trim).filter(_.nonEmpty).map { colDef =>
      val (name, rest) =
        if (colDef.startsWith("\"")) {
          val end = colDef.indexOf('"', 1)
          (colDef.substring(1, end), colDef.substring(end + 1))
        } else {
          val sp = colDef.indexOf(' ')
          if (sp < 0) (colDef, "") else (colDef.substring(0, sp), colDef.substring(sp))
        }
      (name, rest.trim)
    }
  }

  private val tsFmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
  tsFmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))

  /** Coerces a raw storage value (null | Long | Double | String | bytes)
    * to the declared Spark type, mirroring SQLite affinity conversion.
    */
  private[sources] def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                 => null
    case (l: Long, LongType)       => l
    case (d: Double, LongType)     => d.toLong
    case (s: String, LongType)     => s.toLong
    case (l: Long, DoubleType)     => l.toDouble
    case (d: Double, DoubleType)   => d
    case (s: String, DoubleType)   => s.toDouble
    case (s: String, TimestampType) =>
      // isoformat(sep=' ') with optional microsecond fraction
      val dot = s.indexOf('.')
      val base = if (dot < 0) s else s.substring(0, dot)
      val micros = if (dot < 0) 0L else (s.substring(dot + 1).padTo(6, '0').take(6)).toLong
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(
        tsFmt.parse(base).getTime).plusNanos(micros * 1000))
    case (l: Long, TimestampType)  => new java.sql.Timestamp(l * 1000L) // epoch-sec storage
    case (s: String, DateType)     => java.sql.Date.valueOf(s)
    case (b: Array[Byte], BinaryType) => b
    case (other, StringType)       => other match {
      case b: Array[Byte] => new String(b, "UTF-8")
      case x              => String.valueOf(x)
    }
    case (other, t) =>
      throw new IllegalArgumentException(s"cannot coerce ${other.getClass} to $t")
  }

  /** One table as a DataFrame. */
  def table(spark: SparkSession, dbPath: String, name: String): DataFrame = {
    val r = new SqliteDbReader(new File(dbPath))
    try {
      val sql = r.masterRows.find(_._1 == name)
        .getOrElse(throw new IllegalArgumentException(s"no such table: $name"))._3
      val cols = columnsOf(sql)
      val schema = StructType(cols.map { case (n, t) => StructField(n, sparkType(t)) })
      val rows = r.rows(name).map { vs =>
        Row.fromSeq(vs.zip(schema.fields).map { case (v, f) => coerce(v, f.dataType) })
      }.toSeq
      spark.createDataFrame(spark.sparkContext.parallelize(rows, math.max(1, rows.size / 10000)), schema)
    } finally r.close()
  }

  /** Register every table in the database as a temp view (the SQLite
    * counterpart of [[graft.query.Snapshot.register]]).
    * @return registered table names
    */
  def register(spark: SparkSession, dbPath: String): Seq[String] = {
    val r = new SqliteDbReader(new File(dbPath))
    val names = try r.tableNames.sorted finally r.close()
    names.foreach(n => table(spark, dbPath, n).createOrReplaceTempView(n))
    names
  }
}
