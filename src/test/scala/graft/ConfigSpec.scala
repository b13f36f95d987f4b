package graft

import graft.config._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ConfigSpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (no scalatestplus bridge in
    * the offline dependency set).
    */
  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("parses sources + single file destination") {
    val c = GraftConfig.parse(
      """sources:
        |  example: {}
        |  aws:
        |    access_key_id: abc
        |destinations:
        |  file:
        |    path: /tmp/out
        |    format: parquet
        |    batch_size: 5000
        |""".stripMargin)
    assert(c.sources.keySet == Set("example", "aws"))
    assert(c.destination == ArrowDest(FileDestination("parquet", "/tmp/out", 5000)))
  }

  test("rejects zero and multiple destinations (reference wording)") {
    val none = intercept[IllegalArgumentException](GraftConfig.parse("sources:\n  example: {}\n"))
    assert(none.getMessage.contains("no destinations are defined"))
    val two = intercept[IllegalArgumentException](GraftConfig.parse(
      """sources:
        |  example: {}
        |destinations:
        |  file:
        |    path: /a
        |  sqlite:
        |    database: /b
        |""".stripMargin))
    assert(two.getMessage.contains("Exactly one destination must be configured"))
  }

  test("rejects unknown file format") {
    val e = intercept[IllegalArgumentException](GraftConfig.parse(
      "sources:\n  example: {}\ndestinations:\n  file:\n    path: /a\n    format: orc\n"))
    assert(e.getMessage.contains("Unknown format"))
  }

  test("s3 destination requires region and normalizes the bucket") {
    val c = GraftConfig.parse(
      """sources:
        |  example: {}
        |destinations:
        |  s3:
        |    uri: s3://mybucket/some/prefix
        |    region: eu-central-1
        |""".stripMargin)
    val ArrowDest(f) = c.destination: @unchecked
    assert(f.bucket.contains("mybucket") && f.region.contains("eu-central-1"))
    val e = intercept[IllegalArgumentException](GraftConfig.parse(
      "sources:\n  example: {}\ndestinations:\n  s3:\n    uri: s3://b\n"))
    assert(e.getMessage.contains("region must be defined"))
  }

  test("dialect aliases match the reference table") {
    assert(GraftConfig.dialectAliases("mysql") == "mysql+pymysql")
    assert(GraftConfig.dialectAliases("mariadb") == "mariadb+pymysql")
  }

  test("s3 bucket normalizer handles the reference's four URI shapes") {
    assert(UriNormalizer.s3Bucket("s3://bkt/path/x").contains("bkt"))
    assert(UriNormalizer.s3Bucket("https://bkt.s3.eu-1.amazonaws.com/y").contains("bkt"))
    assert(UriNormalizer.s3Bucket("https://s3.eu-1.amazonaws.com/bkt/z").contains("bkt"))
    assert(UriNormalizer.s3Bucket("arn:aws:s3:::bkt").contains("bkt"))
    assert(UriNormalizer.s3Bucket("ftp://nope").isEmpty)
    assert(UriNormalizer.gcsBucket("gs://bkt/obj").contains("bkt"))
    assert(UriNormalizer.gcsBucket("s3://bkt").isEmpty)
  }

  test("property: normalizers are total on arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      UriNormalizer.s3Bucket(s) // must not throw
      UriNormalizer.gcsBucket(s)
      true
    })
  }

  test("duration literals parse for all units, batch-evaluated") {
    import org.apache.spark.sql.functions._
    val spark = SparkSuite.spark
    import spark.implicits._
    val units = Map("s" -> 1L, "m" -> 60L, "h" -> 3600L, "d" -> 86400L, "w" -> 604800L)
    val rnd = new scala.util.Random(42)
    val cases = (1 to 200).map { _ =>
      val (u, mult) = units.toSeq(rnd.nextInt(units.size))
      val n = rnd.nextLong(100000L)
      (s"$n$u", n * mult)
    } :+ ("garbage", -1L) :+ ("12x", -1L)
    val got = cases.map(_._1).toDF("d")
      .select(coalesce(graft.functions.Durations.durationToSeconds(col("d")), lit(-1L)))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map(_._2))
  }
}
