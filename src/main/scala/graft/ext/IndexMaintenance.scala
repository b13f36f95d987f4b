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
  * the same exposure every snapshot reader already accepts. Since round
  * 16 the contract is ENFORCED, not just stated: every mutator of the
  * four trees runs under [[withLease]], so a second concurrent writer is
  * refused loudly (stale-by-age takeover for crashed holders).
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
    * root it is a stale duplicate — drop it. Called at the top of every
    * index load and at the top of [[swapTree]].
    *
    * Deliberately does NOT touch the staging sibling: the module contract
    * lets probes/loads run concurrently with one maintainer, and a
    * load-path staging delete racing that maintainer's in-flight build —
    * e.g. between its data write and its marker stamp — could gut the
    * staging tree right before promote installs it, serving an empty
    * (zero-hit) index under a valid marker. Stale staging debris from a
    * crashed run is instead cleared by the next WRITER, inside
    * [[swapTree]], where the single-maintainer contract makes the delete
    * safe; until then it sits outside the readable tree and costs nothing.
    */
  def heal(spark: SparkSession, path: String): Unit = {
    val (dir, _, retired) = siblings(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sink.DirSwap.heal(fs, dir, retired)
  }

  /** Rewrite the tree at `path` atomically: `build(stagingRoot)` writes
    * the full replacement tree (data first, marker LAST — the build
    * closure owns its index's marker discipline), then the staging root is
    * promoted over the live one. The build closure typically READS the
    * live tree — every write action inside it completes before the
    * promote, so the read plan never observes its own output path.
    *
    * Stale staging debris from a crashed earlier run is cleared HERE (and
    * only here): this is the writer side, where the lease makes the delete
    * race-free — the load-path [[heal]] must never touch staging (see its
    * doc).
    */
  def swapTree(spark: SparkSession, path: String)(build: String => Unit): Unit = {
    val (dir, staging, retired) = siblings(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sink.DirSwap.heal(fs, dir, retired)
    fs.delete(staging, true)
    build(staging.toString)
    graft.sink.DirSwap.promote(fs, staging, dir, retired)
  }

  /** A structural-fsck result: `issues` is empty on a healthy tree;
    * each entry is one human-readable defect ("diagnose before the
    * 3 a.m. page" — the report never throws, unlike the load-path marker
    * checks, because fsck's whole job is describing a tree that loads
    * would refuse).
    */
  final case class TreeReport(issues: Seq[String]) {
    def ok: Boolean = issues.isEmpty
  }

  /** Shared structural checks for a partitioned index tree root:
    * exactly one layout marker matching `expectedMarker` (glob over
    * `markerGlob`), every root entry either a `partitionCol=value`
    * directory with a value `valueOk` accepts or a hidden file, and a
    * note for stranded maintenance siblings (recoverable — they heal at
    * the next load/writer — but worth surfacing before they surprise).
    */
  private[ext] def structuralIssues(spark: SparkSession, path: String,
                                    markerGlob: String, expectedMarker: String,
                                    partitionCol: String,
                                    valueOk: Long => Boolean): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val issues = scala.collection.mutable.ArrayBuffer.empty[String]
    if (!fs.exists(p)) return Seq(s"tree root $path does not exist")
    val markers = Option(fs.globStatus(new Path(path, markerGlob)))
      .getOrElse(Array.empty).map(_.getPath.getName).toSeq
    markers match {
      case Seq() => issues += s"no layout marker ($markerGlob): unstamped " +
        "or torn write — loads will refuse; rebuild the index"
      case Seq(m) if m != expectedMarker =>
        issues += s"marker $m does not match the expected $expectedMarker " +
          "— the tree was written under a different layout than the caller assumes"
      case Seq(_) => ()
      case many => issues += s"multiple layout markers ${many.mkString(", ")} " +
        "— ambiguous layout; a partial rebuild left a stale stamp"
    }
    fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(s"$partitionCol=")) {
        if (!st.isDirectory)
          issues += s"$n is a file, not a partition directory"
        else scala.util.Try(n.stripPrefix(s"$partitionCol=").toLong).toOption match {
          case Some(v) if valueOk(v) => ()
          case Some(v) => issues += s"partition directory $n holds value $v " +
            "outside the layout's range — probes will never read it (orphaned rows)"
          case None => issues += s"partition directory $n has a non-numeric value"
        }
      } else if (!n.startsWith("_") && !n.startsWith("."))
        issues += s"foreign entry $n at the tree root — partition discovery " +
          "may misparse it"
    }
    val (_, staging, retired) = siblings(path)
    if (fs.exists(staging))
      issues += s"stranded staging sibling ${staging.getName}: a maintenance " +
        "run is in flight or crashed mid-build (cleared by the next writer)"
    if (fs.exists(retired))
      issues += s"stranded retired sibling ${retired.getName}: a maintenance " +
        "run crashed between retire and promote (heals at the next load)"
    issues.toSeq
  }

  // ---------------- the writer lease ----------------

  /** Lease-file sibling suffix. The lease lives NEXT TO the tree, not
    * inside it: [[swapTree]] renames the live root away during promote,
    * and a lease stored inside would vanish mid-operation.
    */
  private[graft] val LeaseSuffix = ".__writer_lease"

  /** Default stale-lease age: a writer that has held a lease longer than
    * this with no release is presumed dead (kill -9, lost executor) and
    * its lease may be taken over. Generous on purpose — a takeover from a
    * LIVE writer is the corruption the lease exists to prevent, while a
    * stranded lease only delays the next ingest run.
    */
  private[graft] val LeaseStaleMs: Long = 30L * 60 * 1000

  /** Run `body` as THE single writer of the tree at `path` — the
    * enforcement of the contract the class doc states in prose: every
    * mutator (append / compact / rebucket / retrain / fsck-repair) of the
    * four at-rest trees acquires this lease first, so a second concurrent
    * writer — a scheduler retrying an ingest job while compaction runs,
    * the exact 100 TB operational hazard — is REFUSED LOUDLY instead of
    * silently losing its meta fold or having its append dropped at a swap.
    *
    * Acquisition is an atomic create-no-overwrite of the lease file
    * (atomic on HDFS; effectively so on local FS), holder-stamped with the
    * operation name and wall-clock time. A lease older than `staleMs` is
    * presumed abandoned by a crashed writer and taken over (delete +
    * re-create — the documented stale-by-age policy; two simultaneous
    * takeovers re-serialize on the create). Released on completion AND on
    * exception: an in-process failure means the writer is done (any torn
    * state it left is the marker/fsck discipline's job, not the lease's);
    * only a process death leaves the lease behind, which is exactly the
    * stale-age case.
    */
  private[graft] def withLease[T](spark: SparkSession, path: String, op: String,
                                  staleMs: Long = LeaseStaleMs)(body: => T): T = {
    val dir = new Path(path)
    val lease = new Path(dir.getParent, dir.getName + LeaseSuffix)
    val fs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (lease.getParent != null) fs.mkdirs(lease.getParent)
    def tryAcquire(): Boolean =
      try {
        val out = fs.create(lease, false)
        out.writeBytes(s"$op@${System.currentTimeMillis}\n")
        out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!tryAcquire()) {
      val st = try Some(fs.getFileStatus(lease))
               catch { case _: java.io.FileNotFoundException => None }
      st match {
        case Some(s) if System.currentTimeMillis - s.getModificationTime <= staleMs =>
          val holder = try {
            val in = fs.open(lease)
            try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
          } catch { case _: java.io.IOException => "<unreadable>" }
          throw new IllegalStateException(
            s"refusing to write index tree at $path: another writer holds " +
              s"the lease ($holder). The at-rest trees are single-writer — " +
              "a concurrent append/maintain would lose its meta fold or be " +
              "dropped at a swap. Wait for the holder to finish, or if it " +
              s"is dead, its lease expires after ${staleMs / 1000}s.")
        case Some(_) =>  // stale: documented takeover
          fs.delete(lease, false)
          require(tryAcquire() || tryAcquire(),
            s"could not take over stale writer lease at $lease")
        case None =>     // holder released between our create and stat
          require(tryAcquire(),
            s"could not acquire writer lease at $lease after release race")
      }
    }
    try body finally fs.delete(lease, false)
  }
}
