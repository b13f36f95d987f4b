package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Loud contract on the driver-testdata schemas (TESTDATA.md).
  *
  * Round 8 lost three operators to a SILENT testdata schema change
  * (events.ts nanos → NTZ micros): the queries failed analysis at driver
  * time, invisible in the artifacts. This spec pins, for every table the
  * engine reads, the column names and the TYPE FAMILY each query surface
  * actually depends on — tight enough that the next regeneration diff
  * fails here first with a readable message, loose enough that harmless
  * producer choices (date-vs-timestamp encodings, float-vs-double
  * embeddings — shapes the queries already normalize) stay green.
  */
class SchemaContractSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val dir = "/root/testdata/sf0.001"

  private val integral: DataType => Boolean =
    { case _: IntegerType | _: LongType | _: ShortType => true; case _ => false }
  private val fractional: DataType => Boolean =
    { case _: DoubleType | _: FloatType | _: DecimalType => true; case _ => false }
  private val stringy: DataType => Boolean =
    { case _: StringType => true; case _ => false }
  /** Anything the date/window functions accept after the loaders ran. */
  private val temporal: DataType => Boolean = {
    case _: DateType | _: TimestampType | _: TimestampNTZType => true
    case _ => false
  }
  private val floatArray: DataType => Boolean = {
    case ArrayType(et, _) => fractional(et)
    case _ => false
  }

  private def check(table: String, df: org.apache.spark.sql.DataFrame,
                    cols: (String, DataType => Boolean, String)*): Unit = {
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach { case (name, ok, family) =>
      assert(have.contains(name),
        s"$table: column '$name' GONE — testdata regenerated with a new layout? " +
          s"present: ${have.keys.toSeq.sorted.mkString(", ")} (see TESTDATA.md)")
      assert(ok(have(name)),
        s"$table.$name arrived as ${have(name)} — outside the $family family " +
          "the query surface handles; extend the loader normalization " +
          "(Tables.scala) and update this contract (see TESTDATA.md)")
    }
  }

  test("all ten tables load and keep their query-surface columns") {
    check("region", Tables.region(spark, dir),
      ("r_regionkey", integral, "integral"), ("r_name", stringy, "string"))
    check("nation", Tables.nation(spark, dir),
      ("n_nationkey", integral, "integral"), ("n_name", stringy, "string"),
      ("n_regionkey", integral, "integral"))
    check("customer", Tables.customer(spark, dir),
      ("c_custkey", integral, "integral"), ("c_name", stringy, "string"),
      ("c_nationkey", integral, "integral"), ("c_acctbal", fractional, "fractional"),
      ("c_mktsegment", stringy, "string"))
    check("supplier", Tables.supplier(spark, dir),
      ("s_suppkey", integral, "integral"), ("s_nationkey", integral, "integral"),
      ("s_acctbal", fractional, "fractional"))
    check("part", Tables.part(spark, dir),
      ("p_partkey", integral, "integral"), ("p_brand", stringy, "string"),
      ("p_type", stringy, "string"), ("p_size", integral, "integral"),
      ("p_retailprice", fractional, "fractional"))
    check("orders", Tables.orders(spark, dir),
      ("o_orderkey", integral, "integral"), ("o_custkey", integral, "integral"),
      ("o_orderstatus", stringy, "string"), ("o_totalprice", fractional, "fractional"),
      ("o_orderdate", temporal, "temporal"), ("o_orderpriority", stringy, "string"))
    check("lineitem", Tables.lineitem(spark, dir),
      ("l_orderkey", integral, "integral"), ("l_partkey", integral, "integral"),
      ("l_suppkey", integral, "integral"), ("l_linenumber", integral, "integral"),
      ("l_quantity", fractional, "fractional"),
      ("l_extendedprice", fractional, "fractional"),
      ("l_discount", fractional, "fractional"), ("l_tax", fractional, "fractional"),
      ("l_returnflag", stringy, "string"), ("l_linestatus", stringy, "string"),
      ("l_shipdate", temporal, "temporal"))
    check("documents", Tables.documents(spark, dir),
      ("doc_id", integral, "integral"), ("text", stringy, "string"),
      ("lang", stringy, "string"), ("source", stringy, "string"),
      ("n_chars", integral, "integral"))
    check("embeddings", Tables.embeddings(spark, dir),
      ("vec_id", integral, "integral"), ("embedding", floatArray, "fractional-array"),
      ("label", integral, "integral"))
    // events: POST-normalizer contract — ts must be exactly session-UTC
    // TimestampType whatever the producer wrote (EventsTsPortabilitySpec
    // covers the producer shapes; this line catches a column rename or a
    // shape the normalizer rejects)
    check("events", Tables.events(spark, dir),
      ("event_id", integral, "integral"),
      ("ts", (_: DataType) == TimestampType, "TimestampType (post-normalizer)"),
      ("user_id", integral, "integral"), ("event_type", stringy, "string"),
      ("value", fractional, "fractional"))
  }
}
