package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Promised property tests from SURVEY §5.2(2-3).
  *
  *  (3) `value_in_path` equivalence: the reference's null-safe dict descent
  *      (util.py:7-19) must agree with BOTH Spark encodings — JSON-string
  *      path (`get_json_object`) and struct path (`col("doc.a.b.c")`) —
  *      on randomly generated nested documents, including every
  *      missing-step shape.
  *  (2) `approx_count_distinct` error bound: HLL++ at rsd=0.05 stays
  *      within 3×rsd of the exact distinct count.
  */
class FunctionPropertiesSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val leafKeys = Seq("x", "y", "z")
  private val nestKeys = Seq("a", "b")

  private def mkSchema(depth: Int): StructType = StructType(
    leafKeys.map(StructField(_, StringType)) ++
      (if (depth > 0) nestKeys.map(k => StructField(k, mkSchema(depth - 1))) else Nil))

  private def gen(depth: Int, rnd: scala.util.Random): Map[String, Any] = {
    val leaves = leafKeys.filter(_ => rnd.nextBoolean()).map(k => k -> s"v${rnd.nextInt(100)}")
    val nests =
      if (depth > 0) nestKeys.filter(_ => rnd.nextInt(3) > 0).map(k => k -> gen(depth - 1, rnd))
      else Nil
    (leaves ++ nests).toMap
  }

  private def toJson(m: Map[String, Any]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k + "\":" + (v match {
        case s: String => "\"" + s + "\""
        case mm => toJson(mm.asInstanceOf[Map[String, Any]])
      })
    }.mkString("{", ",", "}")

  /** Direct port of the reference's value_in_path walk (util.py:7-19). */
  private def valueInPath(doc: Map[String, Any], path: Seq[String]): Option[String] =
    path.foldLeft(Option(doc: Any)) {
      case (Some(m: Map[_, _]), k) => m.asInstanceOf[Map[String, Any]].get(k)
      case _                       => None
    }.collect { case s: String => s }

  test("value_in_path ≡ get_json_object ≡ struct path on random nested docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(2026)
    val docs = (0 until 80).map(_ => gen(3, rnd))
    // every path shape: 0-3 nested steps then a leaf key (45 paths), which
    // exercises present, absent, and truncated-descent cases
    val paths = for {
      depth <- 0 to 3
      prefix <- Seq.fill(depth)(nestKeys).foldLeft(Seq(Seq.empty[String])) {
        (acc, ks) => acc.flatMap(p => ks.map(p :+ _))
      }
      leaf <- leafKeys
    } yield prefix :+ leaf

    val schema = mkSchema(3)
    val df = docs.map(toJson).toDF("js")
      .withColumn("doc", from_json(col("js"), schema))
    val cols = paths.zipWithIndex.flatMap { case (p, i) =>
      val dotted = p.mkString(".")
      Seq(get_json_object(col("js"), "$." + dotted).as(s"g_$i"),
          col("doc." + dotted).as(s"s_$i"))
    }
    val rows = df.select(cols: _*).collect()

    docs.zip(rows).foreach { case (doc, row) =>
      paths.zipWithIndex.foreach { case (p, i) =>
        val expected = valueInPath(doc, p).orNull
        assert(row.getAs[String](s"g_$i") == expected,
          s"get_json_object mismatch at ${p.mkString(".")} for ${toJson(doc)}")
        assert(row.getAs[String](s"s_$i") == expected,
          s"struct-path mismatch at ${p.mkString(".")} for ${toJson(doc)}")
      }
    }
  }

  test("approx_count_distinct(rsd=0.05) stays within 3*rsd of exact") {
    for (distinct <- Seq(100L, 2500L, 50000L)) {
      val df = spark.range(distinct * 3).select((col("id") % distinct).as("k"))
      val approx = df.agg(approx_count_distinct(col("k"), 0.05)).head().getLong(0)
      val err = math.abs(approx - distinct).toDouble / distinct
      assert(err <= 0.15, s"distinct=$distinct approx=$approx err=$err")
    }
  }
}
