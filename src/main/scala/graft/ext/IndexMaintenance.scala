package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The crash-safe maintenance rewrite shared by the four at-rest index
  * trees ([[DedupIndex]], [[SubstringIndex]], [[Bm25Index]], [[AnnIndex]])
  * — the missing half of the append lifecycle: after N incremental appends
  * a bucket/cell directory holds N part files (probe cost grows with FILE
  * count, not just row count), and every tree's partition fan is frozen at
  * write time with no migration path but a rebuild. Compaction and
  * rebucketing are both "read the tree, rewrite it under a (possibly new)
  * layout" — this object supplies the one discipline that makes that safe
  * in place:
  *
  *   build into a STAGING sibling root (data + fresh marker, marker last),
  *   then [[graft.sink.DirSwap.promote]] the staging root over the live
  *   one — the identical retire/promote/rollback sequence the snapshot
  *   sinks and [[graft.operators.Compaction]] use, so a crash at ANY point
  *   leaves either the old or the new tree complete, and a reader never
  *   observes a half-rewritten index. [[heal]] recovers the one stranded
  *   state (retired copy next to a missing live root) and runs at the top
  *   of every index load, so a crashed maintenance run self-heals on the
  *   next read instead of serving a missing-path error forever.
  *
  * Per-leaf compaction (the [[graft.operators.Compaction]] flat-dir path)
  * is deliberately NOT used here: its staging/retired siblings would land
  * INSIDE the partitioned tree as `bucket=3.__compact_staging`, which
  * Spark's partition discovery would try to parse as a partition value —
  * a crashed leaf compaction would poison every subsequent full-tree read.
  * A tree-root swap keeps maintenance debris outside the readable tree by
  * construction, and atomically covers the marker + meta files that must
  * change TOGETHER with the data on a fan migration.
  *
  * CONTRACT: single maintainer per tree at a time (the standing DirSwap
  * assumption), and no concurrent appender — an append committing into the
  * live root during the rewrite would be silently dropped at the swap.
  * Probes/loads may race only against the promote rename itself, which is
  * the same exposure every snapshot reader already accepts.
  */
private[graft] object IndexMaintenance {

  private[graft] val StagingSuffix = ".__maint_staging"
  private[graft] val RetiredSuffix = ".__maint_retired"

  private def siblings(path: String): (Path, Path, Path) = {
    val dir = new Path(path)
    (dir,
      new Path(dir.getParent, dir.getName + StagingSuffix),
      new Path(dir.getParent, dir.getName + RetiredSuffix))
  }

  /** Self-heal a previous maintenance crash: a leftover retired root next
    * to a missing live root is the only copy — restore it; next to a live
    * root it is a stale duplicate — drop it. Stale staging roots are
    * always safe to drop (promotion is the last step, so a staging dir
    * that still exists was never promoted). Called at the top of every
    * index load and at the top of [[swapTree]].
    */
  def heal(spark: SparkSession, path: String): Unit = {
    val (dir, staging, retired) = siblings(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sink.DirSwap.heal(fs, dir, retired)
    fs.delete(staging, true)
  }

  /** Rewrite the tree at `path` atomically: `build(stagingRoot)` writes
    * the full replacement tree (data first, marker LAST — the build
    * closure owns its index's marker discipline), then the staging root is
    * promoted over the live one. The build closure typically READS the
    * live tree — every write action inside it completes before the
    * promote, so the read plan never observes its own output path.
    */
  def swapTree(spark: SparkSession, path: String)(build: String => Unit): Unit = {
    val (dir, staging, retired) = siblings(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sink.DirSwap.heal(fs, dir, retired)
    fs.delete(staging, true)
    build(staging.toString)
    graft.sink.DirSwap.promote(fs, staging, dir, retired)
  }
}
