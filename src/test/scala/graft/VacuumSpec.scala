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
