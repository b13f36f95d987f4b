package graft

import graft.operators.Vacuum
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class VacuumSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def mkdir(p: String): java.io.File = {
    val f = new java.io.File(p); f.mkdirs()
    Files.writeString(f.toPath.resolve("part-0"), "x")
    f
  }

  test("stale stranded staging and retired dirs are removed; fresh and live kept") {
    val base = Files.createTempDirectory("graft-vacuum").toString
    mkdir(s"$base/current/t")
    mkdir(s"$base/_staging/deadrun")
    mkdir(s"$base/_staging/liverun")
    mkdir(s"$base/_retired_oldrun")
    val now = System.currentTimeMillis()
    // deadrun + oldrun look a week old; liverun is fresh
    new java.io.File(s"$base/_staging/deadrun").setLastModified(now - 7L * 86400_000)
    new java.io.File(s"$base/_retired_oldrun").setLastModified(now - 7L * 86400_000)

    val report = Vacuum.vacuum(spark, base, maxAgeMs = 86400_000, nowMs = now)
    assert(report.removedStaging == Seq("deadrun"))
    assert(report.removedRetired == Seq("_retired_oldrun"))
    assert(new java.io.File(s"$base/_staging/liverun").exists(), "fresh staging kept")
    assert(new java.io.File(s"$base/current/t").exists(), "current untouched")
  }

  test("a retired dir is NEVER vacuumed while current is missing (it is the only snapshot)") {
    val base = Files.createTempDirectory("graft-vacuum-safe").toString
    mkdir(s"$base/_retired_crashed")
    new java.io.File(s"$base/_retired_crashed")
      .setLastModified(System.currentTimeMillis() - 30L * 86400_000)
    val report = Vacuum.vacuum(spark, base, maxAgeMs = 1000)
    assert(report.removedRetired.isEmpty)
    assert(new java.io.File(s"$base/_retired_crashed").exists(),
      "sole surviving snapshot must be preserved for self-heal")
  }

  test("compaction GC reclaims stranded staging, heals retired, keeps fresh") {
    val base = Files.createTempDirectory("graft-vacuum-compact").toString
    val now = System.currentTimeMillis()

    // crashed-after-staging-write: full table copy stranded next to a live
    // table — must be reclaimed once stale
    mkdir(s"$base/t1")
    mkdir(s"$base/t1.__compact_staging")
    new java.io.File(s"$base/t1.__compact_staging").setLastModified(now - 7L * 86400_000)
    val r1 = Vacuum.vacuumCompaction(spark, s"$base/t1", maxAgeMs = 86400_000, nowMs = now)
    assert(r1.removedStaging == Seq("t1.__compact_staging"))
    assert(!new java.io.File(s"$base/t1.__compact_staging").exists())
    assert(new java.io.File(s"$base/t1/part-0").exists(), "table untouched")

    // fresh staging (a compaction may be in flight): kept
    mkdir(s"$base/t2")
    mkdir(s"$base/t2.__compact_staging")
    val r2 = Vacuum.vacuumCompaction(spark, s"$base/t2", maxAgeMs = 86400_000, nowMs = now)
    assert(r2.removedStaging.isEmpty)
    assert(new java.io.File(s"$base/t2.__compact_staging").exists(), "fresh staging kept")

    // crash inside the swap window: retired exists, table missing — the
    // retired copy is the only data and must be RESTORED, not removed
    mkdir(s"$base/t3.__compact_retired")
    val r3 = Vacuum.vacuumCompaction(spark, s"$base/t3", maxAgeMs = 86400_000, nowMs = now)
    assert(r3.removedRetired.isEmpty, "a restore is not a removal")
    assert(new java.io.File(s"$base/t3/part-0").exists(), "retired promoted back to live")

    // retired next to a live table is a stale duplicate: dropped
    mkdir(s"$base/t4"); mkdir(s"$base/t4.__compact_retired")
    val r4 = Vacuum.vacuumCompaction(spark, s"$base/t4", maxAgeMs = 86400_000, nowMs = now)
    assert(r4.removedRetired == Seq("t4.__compact_retired"))
    assert(!new java.io.File(s"$base/t4.__compact_retired").exists())
  }

  test("sqlite staging GC removes stale runs and tmp files, keeps the rest") {
    val base = Files.createTempDirectory("graft-vacuum-sqlite").toString
    val db = s"$base/resoto.db"
    Files.writeString(new java.io.File(db).toPath, "SQLite format 3")
    mkdir(s"$db.staging/deadrun/t")
    mkdir(s"$db.staging/liverun/t")
    Files.writeString(new java.io.File(s"$db.tmp-deadrun").toPath, "partial")
    val now = System.currentTimeMillis()
    new java.io.File(s"$db.staging/deadrun").setLastModified(now - 7L * 86400_000)
    new java.io.File(s"$db.tmp-deadrun").setLastModified(now - 7L * 86400_000)

    val report = Vacuum.vacuumSqlite(spark, db, maxAgeMs = 86400_000, nowMs = now)
    assert(report.removedStaging == Seq("deadrun"))
    assert(report.removedRetired.isEmpty)
    assert(report.removedTmp == Seq("resoto.db.tmp-deadrun"))
    assert(new java.io.File(s"$db.staging/liverun/t").exists(), "fresh staging kept")
    assert(new java.io.File(db).exists(), "database file never touched")

    // once liverun is also stale, the .staging root itself disappears
    new java.io.File(s"$db.staging/liverun").setLastModified(now - 7L * 86400_000)
    Vacuum.vacuumSqlite(spark, db, maxAgeMs = 86400_000, nowMs = now)
    assert(!new java.io.File(s"$db.staging").exists(), "empty staging root removed")
  }
}
