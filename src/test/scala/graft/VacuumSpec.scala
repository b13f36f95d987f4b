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
}
