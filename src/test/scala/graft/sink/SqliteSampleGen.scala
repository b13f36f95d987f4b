package graft.sink

import java.io.File

/** Dev utility: writes a sample database with every page shape so the file
  * can be cross-checked against a real sqlite3 build
  * (`scripts/check_sqlite.py`). Not part of the test suite proper — the
  * suite's own oracle is [[SqliteDbReader]]; this exists to pin the format
  * against an independent implementation during development.
  *
  * Run: `sbt "Test/runMain graft.sink.SqliteSampleGen /tmp/sample.db"`
  */
object SqliteSampleGen {
  def main(args: Array[String]): Unit = {
    val f = new File(args.headOption.getOrElse("/tmp/sample.db"))
    val w = new SqliteDbWriter(f)
    val t = w.table("demo",
      """CREATE TABLE "demo" ("i" INTEGER, "s" VARCHAR, "d" FLOAT, "b" BLOB)""")
    (1 to 10000).foreach { i =>
      t.addRow(Seq(i.toLong, "row-" + i, i / 3.0, Array[Byte](1, 2, 3)))
    }
    val big = w.table("big", """CREATE TABLE "big" ("s" VARCHAR)""")
    big.addRow(Seq("z" * 50000)) // overflow chain
    big.addRow(Seq(null))
    w.table("empty", """CREATE TABLE "empty" ("x" INTEGER)""")
    w.close()
    println(s"wrote ${f.getAbsolutePath} (${f.length()} bytes)")
  }
}
