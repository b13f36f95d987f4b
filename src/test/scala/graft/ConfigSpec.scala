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
    // bucket destinations enforce the SAME format validation: an unknown
    // format previously fell through SnapshotSink's `case _ => parquet`
    // and silently uploaded parquet where the user asked for json
    val s3 = intercept[IllegalArgumentException](GraftConfig.parse(
      "sources:\n  example: {}\ndestinations:\n  s3:\n    uri: s3://b\n" +
        "    region: r\n    format: json\n"))
    assert(s3.getMessage.contains("Unknown format"))
    val gcs = intercept[IllegalArgumentException](GraftConfig.parse(
      "sources:\n  example: {}\ndestinations:\n  gcs:\n    uri: gs://b\n    format: cvs\n"))
    assert(gcs.getMessage.contains("Unknown format"))
  }

  test("empty-valued destination option is rejected, not stringified to 'Map()'") {
    // `database:` with no value parses as an empty map; String.valueOf
    // would produce a SQLite file literally named Map()
    val e = intercept[IllegalArgumentException](GraftConfig.parse(
      "sources:\n  example: {}\ndestinations:\n  sqlite:\n    database:\n"))
    assert(e.getMessage.contains("scalar"), e.getMessage)
  }

  test("tab indentation is rejected with a parse error, not silently flattened") {
    // indentOf counts spaces only — a tab-indented child used to parse as
    // a TOP-LEVEL key, emptying `sources` and surfacing later as the
    // misleading "No source in the configuration is available"
    val e = intercept[IllegalArgumentException](GraftConfig.parse(
      "sources:\n\texample: {}\ndestinations:\n  file:\n    path: /a\n"))
    assert(e.getMessage.contains("tab indentation"), e.getMessage)
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

  test("db string assembles user:pass@host:port/db?args like the reference") {
    // mirror of util.py:31-55 component-by-component
    assert(GraftConfig.dbString("mysql", Map(
      "user" -> "u", "password" -> "p", "host" -> "h", "port" -> 3306,
      "database" -> "db", "args" -> Map("ssl" -> "true")))
      == "mysql+pymysql://u:p@h:3306/db?ssl=true")
    // optional pieces drop out exactly as in the reference
    assert(GraftConfig.dbString("postgresql", Map("host" -> "h", "database" -> "db"))
      == "postgresql://h/db")
    assert(GraftConfig.dbString("sqlite", Map("database" -> "c2s.db"))
      == "sqlite:///c2s.db")
    assert(GraftConfig.dbString("mariadb", Map("user" -> "u", "host" -> "h"))
      == "mariadb+pymysql://u@h")
  }

  test("jdbc destination carries credentials and args from config") {
    val c = GraftConfig.parse(
      """sources:
        |  example: {}
        |destinations:
        |  derby:
        |    host: localhost
        |    port: 1527
        |    database: graft
        |    user: app
        |    password: "se#cret"
        |    args:
        |      ssl: basic
        |""".stripMargin)
    val DbDest(j) = c.destination: @unchecked
    assert(j.url == "jdbc:derby://localhost:1527/graft?ssl=basic")
    assert(j.user.contains("app"))
    assert(j.password.contains("se#cret")) // '#' inside quotes is NOT a comment
    assert(j.args == Map("ssl" -> "basic"))
  }

  test("missing jdbc drivers fail with the reference's install hints") {
    def dest(d: String) = GraftConfig.parse(
      s"sources:\n  example: {}\ndestinations:\n  $d:\n    database: x\n")
    def hint(d: String): String =
      intercept[IllegalStateException](dest(d)).getMessage
    assert(hint("mysql").contains("pip install cloud2sql[mysql]"))
    assert(hint("mariadb").contains("pip install cloud2sql[mysql]"))
    assert(hint("postgresql").contains("pip install cloud2sql[postgresql]"))
    assert(hint("snowflake").contains("pip install cloud2sql[snowflake]"))
    assert(hint("mssql").contains("pymssql package"))
    assert(hint("oracle").contains("cx_oracle package"))
    // sqlite is served natively (file-format writer) — no driver probe
    val SqliteDest(sq) = dest("sqlite").destination: @unchecked
    assert(sq.database == "x")
    // derby's driver IS on the classpath: parses fine
    val DbDest(j) = dest("derby").destination: @unchecked
    assert(j.dialect == "derby")
  }

  test("yaml comments are stripped only outside quotes (MiniYaml)") {
    assert(MiniYaml.stripComment("""password: "ab#cd"""") == """password: "ab#cd"""")
    assert(MiniYaml.stripComment("key: value # trailing") == "key: value ")
    assert(MiniYaml.stripComment("# full line") == "")
    assert(MiniYaml.stripComment("key: a#b") == "key: a#b") // no preceding space: not a comment
    assert(MiniYaml.stripComment("key: 'x # y' # real") == "key: 'x # y' ")
    // an apostrophe INSIDE an unquoted scalar does not open a string, so
    // the trailing comment is still stripped
    assert(MiniYaml.stripComment("path: /data/o'brien # staging") == "path: /data/o'brien ")
    assert(MiniYaml.stripComment("""note: it"s fine # c""") == """note: it"s fine """)
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
    } :+ ("garbage", -1L) :+ ("12x", -1L) :+
      // trailing newline must NOT parse: Java's '$' would accept it while
      // DuckDB's RE2 '$' would not — the \z anchor pins both engines to
      // end-of-input (cross-engine parity for the shared pattern)
      ("60d\n", -1L) :+ ("60d ", -1L)
    val got = cases.map(_._1).toDF("d")
      .select(coalesce(graft.functions.Durations.durationToSeconds(col("d")), lit(-1L)))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map(_._2))
  }
}
