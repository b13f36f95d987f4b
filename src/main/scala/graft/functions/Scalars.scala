package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function surface from SURVEY.md §2.H: string/regex, date/time,
  * math, JSON, array, map, conditional/null — all `functions._` built-ins
  * (codegen'd), no UDFs.
  */
object Scalars {

  // The reference's S3 URI shapes (cloud2sql collect.py:110-119) plus gs://,
  // normalized to a bucket name by an anchored-regex coalesce chain. The
  // pattern cores live in UriNormalizer (config) — ONE definition for the
  // runtime normalizer and the declared query, so they cannot drift.
  private val PS3    = graft.config.UriNormalizer.S3PlainCore
  private val PVHost = graft.config.UriNormalizer.S3VHostCore
  private val PPath  = graft.config.UriNormalizer.S3PathCore
  private val PArn   = graft.config.UriNormalizer.S3ArnCore
  private val PGs    = graft.config.UriNormalizer.GsCore

  val queries: Seq[Q] = Seq(

    // ---- §2.H1: string basics ----
    Q("q_str_funcs",
      """SELECT c_custkey, upper(c_name) AS uname, substr(c_name, 10, 9) AS id_part,
        |  concat(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_nat,
        |  CAST(length(c_name) AS INT) AS name_len
        |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
                upper(col("c_name")).as("uname"),
                substring(col("c_name"), 10, 9).as("id_part"),
                concat(col("c_mktsegment"), lit(":"), col("c_nationkey").cast("string")).as("seg_nat"),
                length(col("c_name")).as("name_len"))
        .orderBy("c_custkey")
    },

    // ---- §2.H1/§2.A10: the reference's S3/GCS URI normalizer as a
    //      regexp_extract coalesce chain over 5 synthesized URI shapes ----
    Q("q_regexp_uri",
      s"""SELECT doc_id, uri,
         |  coalesce(
         |    nullif(regexp_extract(uri, '$PS3', 1), ''),
         |    nullif(regexp_extract(uri, '$PVHost', 1), ''),
         |    nullif(regexp_extract(uri, '$PPath', 1), ''),
         |    nullif(regexp_extract(uri, '$PArn', 1), ''),
         |    nullif(regexp_extract(uri, '$PGs', 1), '')) AS bucket
         |FROM (
         |  SELECT doc_id,
         |    CASE CAST(doc_id % 5 AS INT)
         |      WHEN 0 THEN 's3://bkt-' || source || '/p/x.parquet'
         |      WHEN 1 THEN 'https://bkt-' || source || '.s3.eu-1.amazonaws.com/y'
         |      WHEN 2 THEN 'https://s3.eu-1.amazonaws.com/bkt-' || source || '/z'
         |      WHEN 3 THEN 'arn:aws:s3:::bkt-' || source
         |      ELSE 'gs://bkt-' || source || '/obj'
         |    END AS uri
         |  FROM documents
         |) ORDER BY doc_id""".stripMargin) { (s, d) =>
      val uri = when(col("doc_id") % 5 === 0, concat(lit("s3://bkt-"), col("source"), lit("/p/x.parquet")))
        .when(col("doc_id") % 5 === 1, concat(lit("https://bkt-"), col("source"), lit(".s3.eu-1.amazonaws.com/y")))
        .when(col("doc_id") % 5 === 2, concat(lit("https://s3.eu-1.amazonaws.com/bkt-"), col("source"), lit("/z")))
        .when(col("doc_id") % 5 === 3, concat(lit("arn:aws:s3:::bkt-"), col("source")))
        .otherwise(concat(lit("gs://bkt-"), col("source"), lit("/obj")))
      Tables.documents(s, d)
        .select(col("doc_id"), uri.as("uri"))
        .withColumn("bucket", coalesce(
          nullif(regexp_extract(col("uri"), PS3, 1), lit("")),
          nullif(regexp_extract(col("uri"), PVHost, 1), lit("")),
          nullif(regexp_extract(col("uri"), PPath, 1), lit("")),
          nullif(regexp_extract(col("uri"), PArn, 1), lit("")),
          nullif(regexp_extract(col("uri"), PGs, 1), lit(""))))
        .orderBy("doc_id")
    },

    // ---- §2.H2: date/time — trunc, extract, day arithmetic ----
    Q("q_date_funcs",
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  count(*) AS n,
        |  CAST(sum(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE) / count(*) AS avg_delay_days,
        |  CAST(min(dayofweek(o_orderdate) + 1) AS INT) AS min_dow,
        |  CAST(max(dayofweek(o_orderdate) + 1) AS INT) AS max_dow
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY yr, qtr ORDER BY yr, qtr""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("qtr"))
        .agg(count(lit(1)).as("n"),
             (sum(datediff(col("l_shipdate"), col("o_orderdate"))).cast("double") / count(lit(1))).as("avg_delay_days"),
             min(dayofweek(col("o_orderdate"))).as("min_dow"),
             max(dayofweek(col("o_orderdate"))).as("max_dow"))
        .orderBy("yr", "qtr")
    },

    // ---- §2.H2 + date_trunc as a grouping key ----
    Q("q_date_trunc_month",
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY mon ORDER BY mon""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("n"),
             graft.operators.Relational.dsum(col("o_totalprice"), 4).as("total"))
        .orderBy("mon")
    },

    // ---- §2.H3: math — sqrt (IEEE-exact), abs, ceil/floor, modulo buckets ----
    Q("q_math_funcs",
      """SELECT CAST(l_orderkey % 7 AS BIGINT) AS bucket,
        |  CAST(sum(CAST(sqrt(l_quantity) AS DECIMAL(18,8))) AS DOUBLE) AS sqrt_sum,
        |  CAST(sum(CAST(ln(l_extendedprice + 1) AS DECIMAL(18,6))) AS DOUBLE) AS ln_sum,
        |  max(abs(l_discount - 0.05)) AS max_absdiff,
        |  CAST(min(ceil(l_quantity)) AS BIGINT) AS min_ceil,
        |  CAST(max(floor(l_quantity)) AS BIGINT) AS max_floor,
        |  count(*) AS n
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      // decimal sums over sqrt/ln per row — spread the single-row-group
      // scan so the partial aggregate runs cluster-wide (§2.5)
      Tables.spreadSmall(Tables.lineitem(s, d), col("l_orderkey"))
        .groupBy((col("l_orderkey") % 7).as("bucket"))
        .agg(graft.operators.Relational.dsum(sqrt(col("l_quantity")), 8).as("sqrt_sum"),
             graft.operators.Relational.dsum(log(col("l_extendedprice") + 1)).as("ln_sum"),
             max(abs(col("l_discount") - 0.05)).as("max_absdiff"),
             min(ceil(col("l_quantity"))).as("min_ceil"),
             max(floor(col("l_quantity"))).as("max_floor"),
             count(lit(1)).as("n"))
        .orderBy("bucket")
    },

    // ---- §2.H4: JSON path extraction on the events props column ----
    Q("q_json_funcs",
      """SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) % 10 AS INT) AS jk_bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS val_sum
        |FROM events GROUP BY jk_bucket ORDER BY jk_bucket""".stripMargin) { (s, d) =>
      // from_json with a single-field schema: one Jackson parse per row that
      // skips unwanted fields, instead of get_json_object's per-call path
      // engine (same shape q_map_funcs uses)
      val k = from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))).getField("k")
      Tables.events(s, d)
        .groupBy((k % 10).as("jk_bucket"))
        .agg(count(lit(1)).as("n"),
             graft.operators.Relational.dsum(col("value"), 4).as("val_sum"))
        .orderBy("jk_bucket")
    },

    // ---- §2.H4/§2.H6: from_json to a typed MAP + map functions ----
    Q("q_map_funcs",
      """SELECT CAST(len(json_keys(props)) AS INT) AS n_keys,
        |  count(*) AS n,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
        |FROM events GROUP BY n_keys ORDER BY n_keys""".stripMargin) { (s, d) =>
      val m = from_json(col("props"), MapType(StringType, IntegerType))
      Tables.events(s, d)
        .select(size(map_keys(m)).as("n_keys"), element_at(m, "k").as("kv"))
        .groupBy("n_keys")
        .agg(count(lit(1)).as("n"), min(col("kv")).as("min_k"), max(col("kv")).as("max_k"))
        .orderBy("n_keys")
    },

    // ---- §2.H5: array functions over the embedding column ----
    Q("q_array_funcs",
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_el,
        |  round(sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
        |                         (a, b) -> a + b)), 6) AS l2,
        |  round(list_reduce(CAST(embedding[1:8] AS DOUBLE[]), (a, b) -> a + b), 6) AS head_sum,
        |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS mx
        |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin) { (s, d) =>
      val emb = col("embedding").cast("array<double>")
      Tables.embeddings(s, d).filter(col("vec_id") < 100)
        .select(col("vec_id"),
                size(col("embedding")).as("dim"),
                round(element_at(emb, 1), 6).as("first_el"),
                round(sqrt(aggregate(transform(emb, x => x * x), lit(0.0), (a, b) => a + b)), 6).as("l2"),
                round(aggregate(slice(emb, 1, 8), lit(0.0), (a, b) => a + b), 6).as("head_sum"),
                round(array_max(emb), 6).as("mx"))
        .orderBy("vec_id")
    },

    // ---- §2.H7: conditional / null handling ----
    Q("q_cond_null",
      """SELECT CASE WHEN o_totalprice < 1000 THEN 'lo'
        |            WHEN o_totalprice < 5000 THEN 'mid' ELSE 'hi' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'P'), 'X') AS st_norm,
        |  count(*) AS n
        |FROM orders GROUP BY bucket, st_norm ORDER BY bucket, st_norm""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(
          when(col("o_totalprice") < 1000, "lo")
            .when(col("o_totalprice") < 5000, "mid").otherwise("hi").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("P")), lit("X")).as("st_norm"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket", "st_norm")
    },

    // ---- §2.H1: split + element access on documents ----
    Q("q_str_split",
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  string_split(text, ' ')[1] AS first_tok
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id"),
                size(split(col("text"), " ", -1)).as("n_tokens"),
                element_at(split(col("text"), " ", -1), 1).as("first_tok"))
        .orderBy("doc_id")
    },

    // ---- §2.I1: duration-literal parser ('60d' -> seconds), UDF-free ----
    Q("q_duration_parse",
      s"""SELECT doc_id, dur_str, ${Durations.durationToSecondsSql("dur_str")} AS dur_s
         |FROM (
         |  SELECT doc_id,
         |    CAST(1 + doc_id % 90 AS VARCHAR) ||
         |    CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'd' WHEN 1 THEN 'h'
         |                                 WHEN 2 THEN 'm' ELSE 's' END AS dur_str
         |  FROM documents
         |) ORDER BY doc_id""".stripMargin) { (s, d) =>
      val durStr = concat((lit(1) + col("doc_id") % 90).cast("string"),
        when(col("doc_id") % 4 === 0, "d").when(col("doc_id") % 4 === 1, "h")
          .when(col("doc_id") % 4 === 2, "m").otherwise("s"))
      Tables.documents(s, d)
        .select(col("doc_id"), durStr.as("dur_str"))
        .withColumn("dur_s", Durations.durationToSeconds(col("dur_str")))
        .orderBy("doc_id")
    }
  )
}
