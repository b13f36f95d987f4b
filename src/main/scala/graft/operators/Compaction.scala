package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories — the operational
  * companion to streaming ingest (graft.streaming.StreamingGraphIngest /
  * StreamingOps.maintainSnapshot): every micro-batch commit lands at least
  * one file, and at 100 TB a table of millions of kilobyte files turns
  * scan planning and IO into the bottleneck. Compaction rewrites the
  * directory into ~`targetBytes` files with the SAME crash-safe swap
  * discipline as the snapshot sinks: write to a staging dir, retire the
  * old directory, promote, drop the retired copy — readers never observe
  * a half-compacted table and a crash leaves either the old or the new
  * directory complete.
  *
  * The file count is derived from the CURRENT on-disk bytes (parquet in,
  * parquet out — compression characteristics carry over), never from row
  * counts the driver would have to guess at.
  */
object Compaction {

  final case class CompactionReport(
      filesBefore: Int, filesAfter: Int, bytes: Long, targetFiles: Int)

  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): CompactionReport = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(s"$path.__compact_staging")
    val retired = new Path(s"$path.__compact_retired")
    // self-heal a previous crash FIRST (before sizing the input): a
    // leftover retired dir means the promote never finished — restore it
    // if the table is gone, else drop the stale copy
    if (fs.exists(retired)) {
      if (!fs.exists(dir)) require(fs.rename(retired, dir), s"could not restore $dir")
      else fs.delete(retired, true)
    }
    fs.delete(staging, true)

    val files = fs.listStatus(dir).filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val totalBytes = files.map(_.getLen).sum
    val target = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    spark.read.parquet(path)
      .repartition(target)
      .write.parquet(staging.toString)

    require(fs.rename(dir, retired), s"could not retire $dir")
    val promoted = try fs.rename(staging, dir) catch {
      case e: Throwable => fs.rename(retired, dir); throw e
    }
    if (!promoted) { fs.rename(retired, dir); throw new IllegalStateException(s"promote failed for $path") }
    fs.delete(retired, true)

    val after = fs.listStatus(dir).count(f => f.isFile && !f.getPath.getName.startsWith("_"))
    CompactionReport(files.length, after, totalBytes, target)
  }
}
