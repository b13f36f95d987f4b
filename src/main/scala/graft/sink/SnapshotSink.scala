package graft.sink

import graft.config.{ArrowDest, DbDest, Destination, FileDestination, JdbcDestination}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

import java.sql.DriverManager

/** Snapshot-atomic sinks (SURVEY.md §4.4, reference collect.py:198-203):
  * every run writes to a staging area; only after ALL tables of ALL sources
  * land is the snapshot promoted, so readers never observe a half-loaded
  * state and a failed run leaves the previous snapshot intact.
  *
  *  - File targets: write `<base>/_staging/<runId>/<table>` then swap the
  *    `<base>/current` directory by rename (atomic on HDFS-like FS; on
  *    object stores use a pointer-file commit — same protocol).
  *  - JDBC targets: write `<table>__tmp` then one transaction of
  *    RENAME DDL per table (dialect-specific), mirroring [D]
  *    `SqlUpdater.swap_temp_tables`.
  */
object SnapshotSink {

  /** JSON-encode nested columns for SQL destinations only (SURVEY §1.2):
    * parquet/csv keep full fidelity... csv cannot carry nested either, so
    * both csv and jdbc degrade through the same canonical to_json.
    */
  def flattenForSql(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Stage all tables of one source under the shared runId; several sources
    * stage concurrently into the same snapshot. Returns the staged names.
    */
  def stage(tables: Map[String, DataFrame], dest: Destination, runId: String): Seq[String] = {
    dest match {
      case ArrowDest(cfg) =>
        val staging = s"${cfg.path}/_staging/$runId"
        tables.foreach { case (name, df) =>
          cfg.format match {
            case "csv" => flattenForSql(df).write.mode("overwrite")
              .option("maxRecordsPerFile", cfg.batchSize)
              .option("header", "true") // reference CSV carries a header [T :52]
              .csv(s"$staging/$name")
            case _ => df.write.mode("overwrite")
              .option("maxRecordsPerFile", cfg.batchSize)
              .parquet(s"$staging/$name")
          }
        }
      case DbDest(cfg) =>
        tables.foreach { case (name, df) =>
          flattenForSql(df).write.mode("overwrite")
            .format("jdbc")
            .option("url", cfg.url)
            .option("dbtable", s"${name}__tmp")
            .option("batchsize", cfg.batchSize)
            .save()
        }
    }
    tables.keys.toSeq
  }

  /** One commit per run — called exactly once, after the global barrier. */
  def committer(dest: Destination, runId: String, tables: Seq[String]): SnapshotCommit =
    dest match {
      case ArrowDest(cfg) => FileSnapshotCommit(cfg.path, runId)
      case DbDest(cfg)    => JdbcSnapshotCommit(cfg, tables)
    }
}

/** Deferred promotion handle: `commit()` runs once, after the global
  * barrier (reference K2); never called on the failure path (K3).
  */
sealed trait SnapshotCommit { def commit(spark: SparkSession): Unit }

final case class FileSnapshotCommit(base: String, runId: String) extends SnapshotCommit {
  def commit(spark: SparkSession): Unit = {
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(s"$base/_staging/$runId")
    val current = new Path(s"$base/current")
    val retired = new Path(s"$base/_retired_$runId")
    if (fs.exists(current)) fs.rename(current, retired)
    require(fs.rename(staging, current), s"snapshot swap failed for $staging")
    if (fs.exists(retired)) fs.delete(retired, true)
  }
}

final case class JdbcSnapshotCommit(cfg: JdbcDestination, tables: Seq[String]) extends SnapshotCommit {
  /** Dialect-specific rename DDL (SURVEY §7.4). */
  private def renameSql(from: String, to: String): Seq[String] = cfg.dialect match {
    case d if d.startsWith("derby") => Seq(s"RENAME TABLE $from TO $to")
    case d if d.startsWith("mysql") | d.startsWith("mariadb") =>
      Seq(s"RENAME TABLE $from TO $to")
    case _ => Seq(s"""ALTER TABLE $from RENAME TO $to""") // sqlite/postgres/ansi
  }

  def commit(spark: SparkSession): Unit = {
    val conn = DriverManager.getConnection(cfg.url)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      val meta = conn.getMetaData
      tables.foreach { t =>
        // drop the previous snapshot's table, then promote __tmp
        val rs = meta.getTables(null, null, null, Array("TABLE"))
        val existing = Iterator.continually(rs)
          .takeWhile(_.next()).map(_.getString("TABLE_NAME").toLowerCase).toSet
        if (existing.contains(t.toLowerCase)) st.executeUpdate(s"DROP TABLE $t")
        renameSql(s"${t}__tmp", t).foreach(st.executeUpdate)
      }
      conn.commit()
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.close()
  }
}
