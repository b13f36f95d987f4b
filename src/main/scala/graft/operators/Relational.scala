package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational query surface from SURVEY.md §2.B-§2.G: predicates, joins,
  * aggregations, window functions, sorts/top-k, set operations.
  *
  * Determinism contract with the DuckDB oracle: every floating-point SUM is
  * computed over an exact DECIMAL cast (per-row double arithmetic is IEEE-
  * identical in both engines; summation order is not), then cast back to
  * DOUBLE. Averages are exact-sum / count. Every query carries a total
  * ORDER BY with tiebreak keys.
  */
object Relational {

  /** Exact decimal sum of a (possibly computed) double column, as DOUBLE —
    * the shared determinism contract (exact DECIMAL accumulation,
    * order-independent, double out) for every plain aggregate sum the
    * oracle replays; window sums inline the pattern (`.over` must attach
    * to the aggregate node itself).
    */
  private[graft] def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  val queries: Seq[Q] = Seq(

    // ---- §2.D3: TPC-H Q1-shaped hash aggregate (partial+final for free) ----
    Q("q_agg_pricing",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      // decimal partial aggregation is the dominant per-row cost here —
      // spread the single-row-group scan so it runs cluster-wide (§2.5)
      Tables.spreadSmall(Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1999-12-31 00:00:00").cast("timestamp")),
          col("l_orderkey"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity"), 4).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          (dsum(col("l_quantity"), 4) / count(col("l_quantity"))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- §2.B5: predicate classes — BETWEEN, IN, comparison, boolean ----
    Q("q_filter_between_in",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
        |  AND o_orderstatus IN ('O','F') AND o_totalprice > 1000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate").between(lit("1996-01-01").cast("timestamp"),
                                           lit("1998-12-31").cast("timestamp"))
          && col("o_orderstatus").isin("O", "F") && col("o_totalprice") > 1000)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 4).as("total"))
        .orderBy("o_orderpriority")
    },

    // ---- §2.B5: LIKE / IS NOT NULL / OR with 3-valued logic ----
    Q("q_filter_like",
      """SELECT p_type, count(*) AS n FROM part
        |WHERE p_name LIKE '%bolt%' OR (p_brand LIKE 'Brand#1%' AND p_size IS NOT NULL)
        |GROUP BY p_type ORDER BY p_type""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").like("%bolt%")
          || (col("p_brand").like("Brand#1%") && col("p_size").isNotNull))
        .groupBy("p_type").agg(count(lit(1)).as("n")).orderBy("p_type")
    },

    // ---- §2.B4: NOT IN with three-valued logic — a NULL subject makes
    // `NOT IN` UNKNOWN, so NULL rows are filtered in BOTH engines; n_null
    // pins that no NULL survives the predicate ----
    Q("q_filter_not_in",
      """SELECT count(*) AS n_kept,
        |  CAST(sum(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  count(DISTINCT st) AS n_status
        |FROM (SELECT nullif(o_orderstatus, 'P') AS st FROM orders)
        |WHERE st NOT IN ('O')""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(nullif(col("o_orderstatus"), lit("P")).as("st"))
        .filter(!col("st").isin("O"))
        .agg(count(lit(1)).as("n_kept"),
             sum(when(col("st").isNull, 1).otherwise(0)).as("n_null"),
             countDistinct(col("st")).as("n_status"))
    },

    // ---- data-quality profiling: per-column stats in ONE scan (struct-
    // packed aggregates unpivoted afterwards), the validation pass a
    // pipeline runs before trusting a new snapshot ----
    Q("q_profile_orders",
      """SELECT col, n, n_null, n_distinct, round(mn, 6) AS mn, round(mx, 6) AS mx
        |FROM (
        |  SELECT 'o_totalprice' AS col, count(*) AS n,
        |    count(*) - count(o_totalprice) AS n_null,
        |    count(DISTINCT o_totalprice) AS n_distinct,
        |    min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |    count(DISTINCT o_custkey),
        |    CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |    count(DISTINCT o_orderstatus), NULL, NULL
        |  FROM orders
        |) ORDER BY col""".stripMargin) { (s, d) =>
      // all three columns' stats in ONE aggregate over ONE scan (the
      // multi-distinct plans as a single Expand pass), then unpivoted
      val stats = Tables.orders(s, d).agg(
        count(lit(1)).as("n"),
        count(col("o_totalprice")).as("tp_nn"),
        countDistinct(col("o_totalprice")).as("tp_nd"),
        round(min(col("o_totalprice")).cast("double"), 6).as("tp_mn"),
        round(max(col("o_totalprice")).cast("double"), 6).as("tp_mx"),
        count(col("o_custkey")).as("ck_nn"),
        countDistinct(col("o_custkey")).as("ck_nd"),
        round(min(col("o_custkey")).cast("double"), 6).as("ck_mn"),
        round(max(col("o_custkey")).cast("double"), 6).as("ck_mx"),
        count(col("o_orderstatus")).as("st_nn"),
        countDistinct(col("o_orderstatus")).as("st_nd"))
      val nullD = lit(null).cast("double")
      stats.select(explode(array(
        struct(lit("o_custkey").as("col"), col("n"),
          (col("n") - col("ck_nn")).as("n_null"), col("ck_nd").as("n_distinct"),
          col("ck_mn").as("mn"), col("ck_mx").as("mx")),
        struct(lit("o_orderstatus").as("col"), col("n"),
          (col("n") - col("st_nn")).as("n_null"), col("st_nd").as("n_distinct"),
          nullD.as("mn"), nullD.as("mx")),
        struct(lit("o_totalprice").as("col"), col("n"),
          (col("n") - col("tp_nn")).as("n_null"), col("tp_nd").as("n_distinct"),
          col("tp_mn").as("mn"), col("tp_mx").as("mx")))).as("s"))
        .select("s.*")
        .orderBy("col")
    },

    // ---- §2.C1: 4-way equi inner join (broadcast small dims) ----
    Q("q_join_revenue_by_nation",
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("n_rows"))
        .orderBy("n_name")
    },

    // ---- TPC-H Q3 shape: selective filters on BOTH join sides + top-k ----
    // The pruning-heavy classic: the segment filter cuts customers before
    // the join, the date filters cut orders/lineitem AT THE SCAN (pushed
    // predicates), and the top-10 compiles to TakeOrderedAndProject — at
    // 100 TB the query reads a fraction of each table and never sorts the
    // full aggregate.
    Q("q_join_shipping_priority",
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS o_date
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_date
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d)
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_date"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_date"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // ---- §2.C2: left outer join, null-producing side aggregated ----
    Q("q_join_left_outer",
      """SELECT n_orders, count(*) AS n_customers FROM (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey
        |) GROUP BY n_orders ORDER BY n_orders""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders").agg(count(lit(1)).as("n_customers"))
        .orderBy("n_orders")
    },

    // ---- §2.C3: left semi (EXISTS rewrite) ----
    Q("q_join_semi",
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 5000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 5000),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n")).orderBy("c_mktsegment")
    },

    // ---- §2.C3: left anti (NOT EXISTS rewrite) ----
    Q("q_join_anti",
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.events(s, d), col("c_custkey") === col("user_id"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n")).orderBy("c_mktsegment")
    },

    // ---- §2.C4: range join — banded equi-join (BandJoin), never an NLJ ----
    Q("q_join_range",
      """SELECT s_name, count(*) AS n_close,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal_sum
        |FROM supplier JOIN customer
        |  ON c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
        |GROUP BY s_name ORDER BY s_name""".stripMargin) { (s, d) =>
      BandJoin.range(Tables.customer(s, d), Tables.supplier(s, d),
                     col("c_acctbal"), col("s_acctbal"), radius = 100)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_close"), dsum(col("c_acctbal"), 4).as("bal_sum"))
        .orderBy("s_name")
    },

    // ---- §2.C6: 2-hop traversal (region -> nation -> customer) ----
    Q("q_join_2hop",
      """SELECT r_name, count(*) AS n_customers
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("n_customers")).orderBy("r_name")
    },

    // ---- §2.D4: exact COUNT(DISTINCT) ----
    Q("q_agg_distinct",
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations, count(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d).groupBy("c_mktsegment")
        .agg(countDistinct(col("c_nationkey")).as("n_nations"), count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },

    // ---- §2.D5: ROLLUP over the region/nation hierarchy ----
    Q("q_agg_rollup",
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, d) =>
      // Expand (rollup) duplicates the joined grouping attrs, which trips
      // Spark's ambiguous-self-join heuristic on a plan that has no self
      // join; the check is a false positive here and must be disabled for
      // THIS analysis only. The conf is session-global, and Verify analyzes
      // queries concurrently on a thread pool — toggling it on the shared
      // session would silently disable the guard for sibling queries in
      // the same window. newSession() shares the SparkContext (and the
      // SparkConf-sourced settings) but owns its SessionState, so the
      // toggle is invisible outside this builder.
      val s2 = s.newSession()
      s2.conf.set("spark.sql.analyzer.failAmbiguousSelfJoin", "false")
      Tables.customer(s2, d)
        .join(broadcast(Tables.nation(s2, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s2, d)), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "c_acctbal")
        .rollup("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal"), 4).as("bal"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    },

    // ---- §2.D5: CUBE ----
    Q("q_agg_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d).cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    },

    // ---- §2.D6: HAVING + FILTER (WHERE) aggregate modifiers ----
    Q("q_agg_having_filtered",
      """SELECT l_returnflag, count(*) AS n_all,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS qty_taxed
        |FROM lineitem GROUP BY l_returnflag HAVING count(*) > 100
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_all"),
             expr("count(*) FILTER (WHERE l_discount > 0.05)").as("n_disc"),
             expr("cast(sum(cast(l_quantity as decimal(18,4))) FILTER (WHERE l_tax > 0.04) as double)").as("qty_taxed"))
        .where(col("n_all") > 100)
        .orderBy("l_returnflag")
    },

    // ---- §2.E1: ranking — top-3 orders per market segment ----
    Q("q_window_rank",
      """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |) WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rn")
    },

    // ---- §2.E2: lag — inter-event gap per user ----
    Q("q_window_lag",
      """SELECT user_id, count(gap_us) AS n_gaps,
        |  round(CAST(sum(gap_us) AS DOUBLE) / count(gap_us) / 1000000.0, 4) AS avg_gap_s
        |FROM (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                           ORDER BY ts, event_id) AS gap_us
        |  FROM events
        |) WHERE gap_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy("user_id")
        .agg(count(col("gap_us")).as("n_gaps"),
             round(sum(col("gap_us")).cast("double") / count(col("gap_us")) / lit(1000000.0), 4).as("avg_gap_s"))
        .orderBy("user_id")
    },

    // ---- §2.E3: frame-spec running sum ----
    Q("q_window_running",
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
                sum(col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").as("running"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- §2.E3: moving average over a bounded rows frame ----
    Q("q_window_moving_avg",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) OVER w AS DOUBLE) / count(*) OVER w AS mov_avg
        |FROM lineitem WHERE l_suppkey < 3
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
        .rowsBetween(-2, Window.currentRow)
      Tables.lineitem(s, d).filter(col("l_suppkey") < 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
                (sum(col("l_quantity").cast("decimal(18,4)")).over(w).cast("double")
                  / count(lit(1)).over(w)).as("mov_avg"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // ---- §2.F2: top-k => TakeOrderedAndProject, no global sort ----
    Q("q_topk",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(10)
    },

    // ---- §2.F1: multi-key global sort with explicit null placement ----
    Q("q_sort_nulls",
      """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st FROM orders
        |ORDER BY st ASC NULLS FIRST, o_orderkey LIMIT 50""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("P")).as("st"))
        .orderBy(asc_nulls_first("st"), col("o_orderkey").asc)
        .limit(50)
    },

    // ---- §2.G1: UNION ALL across heterogeneous sources ----
    Q("q_union_all",
      """SELECT src, count(*) AS n, count(DISTINCT id) AS n_ids FROM (
        |  SELECT c_custkey AS id, 'cust' AS src FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT o_custkey AS id, 'ord' AS src FROM orders WHERE o_totalprice > 9000
        |) GROUP BY src ORDER BY src""".stripMargin) { (s, d) =>
      val a = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("id"), lit("cust").as("src"))
      val b = Tables.orders(s, d).filter(col("o_totalprice") > 9000)
        .select(col("o_custkey").as("id"), lit("ord").as("src"))
      a.unionByName(b).groupBy("src")
        .agg(count(lit(1)).as("n"), countDistinct(col("id")).as("n_ids"))
        .orderBy("src")
    },

    // ---- §2.G1: UNION (distinct) ----
    Q("q_union_distinct",
      """SELECT CAST(c_nationkey AS INT) AS k FROM customer
        |UNION SELECT CAST(s_nationkey AS INT) AS k FROM supplier
        |ORDER BY k""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").cast("int").as("k"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("k")))
        .distinct()
        .orderBy("k")
    },

    // ---- §2.G2: INTERSECT ----
    Q("q_intersect",
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
        .intersect(o.filter(year(col("o_orderdate")) === 1997).select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ---- §2.G2: EXCEPT (customers that never ordered) ----
    Q("q_except",
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select("c_custkey")
        .except(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")
    },

    // ---- §2.C2: right outer join (all customers survive, matched or not) ----
    Q("q_join_right_outer",
      """SELECT n_orders, count(*) AS n_customers FROM (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_custkey
        |) GROUP BY n_orders ORDER BY n_orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "right_outer")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders").agg(count(lit(1)).as("n_customers"))
        .orderBy("n_orders")
    },

    // ---- §2.C2: full outer join (unmatched rows from BOTH sides) ----
    Q("q_join_full_outer",
      """SELECT side, count(*) AS n FROM (
        |  SELECT CASE WHEN c_custkey IS NULL THEN 'event_only'
        |              WHEN user_id IS NULL THEN 'cust_only' ELSE 'both' END AS side
        |  FROM (SELECT DISTINCT user_id FROM events) e
        |  FULL JOIN customer ON user_id = c_custkey
        |) GROUP BY side ORDER BY side""".stripMargin) { (s, d) =>
      Tables.events(s, d).select("user_id").distinct()
        .join(Tables.customer(s, d), col("user_id") === col("c_custkey"), "full_outer")
        .select(when(col("c_custkey").isNull, "event_only")
          .when(col("user_id").isNull, "cust_only").otherwise("both").as("side"))
        .groupBy("side").agg(count(lit(1)).as("n"))
        .orderBy("side")
    },

    // ---- §2.E1: rank / dense_rank over a tie-producing key + ntile ----
    // rank and dense_rank are ordered by a COARSE key (price in thousands)
    // so ties exist and the two differ; ntile runs over a total order
    // (price, orderkey) because its row-position semantics are only
    // deterministic under a unique sort.
    Q("q_window_rank_dense",
      """SELECT c_mktsegment, o_orderkey, price_k, rnk, drnk, quart FROM (
        |  SELECT c_mktsegment, o_orderkey, CAST(floor(o_totalprice / 1000) AS INT) AS price_k,
        |    CAST(rank() OVER (PARTITION BY c_mktsegment
        |      ORDER BY CAST(floor(o_totalprice / 1000) AS INT) DESC) AS INT) AS rnk,
        |    CAST(dense_rank() OVER (PARTITION BY c_mktsegment
        |      ORDER BY CAST(floor(o_totalprice / 1000) AS INT) DESC) AS INT) AS drnk,
        |    CAST(ntile(4) OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS quart
        |  FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_custkey < 100
        |) WHERE rnk <= 5 ORDER BY c_mktsegment, rnk, o_orderkey""".stripMargin) { (s, d) =>
      val priceK = floor(col("o_totalprice") / 1000).cast("int")
      val wCoarse = Window.partitionBy("c_mktsegment").orderBy(priceK.desc)
      val wTotal = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d).filter(col("o_custkey") < 100)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"), priceK.as("price_k"),
                rank().over(wCoarse).as("rnk"),
                dense_rank().over(wCoarse).as("drnk"),
                ntile(4).over(wTotal).as("quart"))
        .filter(col("rnk") <= 5)
        .orderBy("c_mktsegment", "rnk", "o_orderkey")
    },

    // ---- §2.E2: lead / first / last analytic functions ----
    Q("q_window_lead_first_last",
      """SELECT user_id, event_id, nxt, fst, lst FROM (
        |  SELECT user_id, event_id,
        |    lead(event_id) OVER w AS nxt,
        |    first_value(event_id) OVER w AS fst,
        |    last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lst
        |  FROM events WHERE user_id < 20
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |) ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d).filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
                lead(col("event_id"), 1).over(w).as("nxt"),
                first(col("event_id")).over(w).as("fst"),
                last(col("event_id")).over(wFull).as("lst"))
        .orderBy("user_id", "event_id")
    },

    // ---- §2.D5: explicit GROUPING SETS + grouping_id() disambiguation ----
    Q("q_agg_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
              Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("int").as("gid"), count(lit(1)).as("n"))
        .orderBy(col("gid"), asc_nulls_first("o_orderstatus"),
                 asc_nulls_first("o_orderpriority"))
    },

    // ---- §2.G2: INTERSECT ALL (multiplicity-preserving) ----
    Q("q_intersect_all",
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
        .intersectAll(o.filter(year(col("o_orderdate")) === 1997).select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ---- §2.G2: EXCEPT ALL ----
    Q("q_except_all",
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
        .exceptAll(o.filter(year(col("o_orderdate")) === 1997).select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ---- §2.C1 at scale: salted skew join — result must be IDENTICAL to
    // the plain equi-join the oracle runs; the salt only changes the
    // shuffle layout (hot keys spread over saltFactor partitions) ----
    Q("q_join_skew_salted",
      """SELECT s_name, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS price_sum
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin) { (s, d) =>
      val fact = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("suppkey"), col("l_extendedprice"))
      val dim = Tables.supplier(s, d)
        .select(col("s_suppkey").as("suppkey"), col("s_name"))
      SkewJoin.salted(fact, dim, Seq("suppkey"), saltFactor = 8)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("price_sum"))
        .orderBy("s_name")
    },

    // ---- §2.G2 use case: snapshot diff — two synthetic snapshots of the
    // customer table (some rows dropped, some balances bumped, some keys
    // added) classified added/removed/changed/unchanged per key ----
    Q("q_snapshot_diff",
      """WITH prev AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
        |curr AS (
        |  SELECT c_custkey AS k,
        |    c_acctbal + CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END AS bal
        |  FROM customer WHERE c_custkey % 7 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000 AS k, 0.0 AS bal
        |  FROM customer WHERE c_custkey % 13 = 0
        |),
        |d AS (
        |  SELECT coalesce(p.k, c.k) AS k,
        |    CASE WHEN p.k IS NULL THEN 'added'
        |         WHEN c.k IS NULL THEN 'removed'
        |         WHEN p.bal IS DISTINCT FROM c.bal THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM prev p FULL JOIN curr c ON p.k = c.k
        |)
        |SELECT status, count(*) AS n FROM d GROUP BY status ORDER BY status""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      val prev = cust.select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
      val curr = cust.filter(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey").as("k"),
          (col("c_acctbal") + when(col("c_custkey") % 10 === 0, 1).otherwise(0)).as("bal"))
        .unionByName(cust.filter(col("c_custkey") % 13 === 0)
          .select((col("c_custkey") + 1000000).as("k"), lit(0.0).as("bal")))
      SnapshotDiff.diff(prev, curr, Seq("k"))
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    },

    // ---- §2.E3: rangeBetween frame — 30-day trailing sum per customer.
    // Both engines order by epoch seconds (numeric RANGE frame); ties on
    // the order key include all peers, so the result is deterministic.
    Q("q_window_range_frame",
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_30d
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-2592000L, Window.currentRow)
      Tables.orders(s, d).filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
                sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
                  .cast("double").as("sum_30d"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- §2.D: PIVOT — orders per year × status, count + exact revenue.
    // The pivot value list is fixed, so Spark needs no extra distinct pass
    // and the plan is one hash aggregate (pivot compiles to CASE WHEN
    // conditional aggregates — identical shape to the oracle's FILTER
    // clauses, and the same shape at 100×: one shuffle on yr).
    Q("q_pivot_status",
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE) AS total_open,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS total_filled,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'P'), 0) AS DOUBLE) AS total_partial
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin) { (s, d) =>
      val zero = lit(0).cast("decimal(18,4)")
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("int").as("yr"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)).as("n"),
             sum(col("o_totalprice").cast("decimal(18,4)")).as("t"))
        .select(col("yr"),
          coalesce(col("O_n"), lit(0L)).as("n_open"),
          coalesce(col("F_n"), lit(0L)).as("n_filled"),
          coalesce(col("P_n"), lit(0L)).as("n_partial"),
          coalesce(col("O_t"), zero).cast("double").as("total_open"),
          coalesce(col("F_t"), zero).cast("double").as("total_filled"),
          coalesce(col("P_t"), zero).cast("double").as("total_partial"))
        .orderBy("yr")
    },

    // ---- §2.D: UNPIVOT/melt — wide per-flag aggregates to long
    // (measure, value) form. Spark's Dataset.unpivot is a zero-shuffle
    // Expand over the aggregated (tiny) input; the oracle is the
    // equivalent UNION ALL.
    Q("q_unpivot_pricing",
      """WITH a AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, measure, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
        |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
        |  UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a
        |) ORDER BY l_returnflag, measure""".stripMargin) { (s, d) =>
      Tables.spreadSmall(Tables.lineitem(s, d), col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity"), 4).as("sum_qty"),
             dsum(col("l_extendedprice")).as("sum_price"),
             dsum(col("l_discount")).as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
                 Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
                 "measure", "value")
        .orderBy("l_returnflag", "measure")
    },

    // ---- §2.D: exact quantile profiling — per-language quartiles of
    // document length. The percentile fractions are dyadic (.25/.5/.75),
    // so linear interpolation between int64 neighbors is EXACT in double
    // in both engines regardless of each engine's a+(b-a)*f vs
    // a*(1-f)+b*f formula — no rounding shim needed. Spark's exact
    // `percentile` is a single hash aggregate (sorted per group at
    // finalization); scale-safe because groups are languages.
    Q("q_quantile_profile",
      """SELECT lang, count(*) AS n,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  quantile_cont(n_chars, 0.25) AS q1_chars,
        |  quantile_cont(n_chars, 0.5)  AS med_chars,
        |  quantile_cont(n_chars, 0.75) AS q3_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
             min(col("n_chars")).as("min_chars"),
             percentile(col("n_chars"), lit(0.25)).as("q1_chars"),
             percentile(col("n_chars"), lit(0.5)).as("med_chars"),
             percentile(col("n_chars"), lit(0.75)).as("q3_chars"),
             max(col("n_chars")).as("max_chars"))
        .orderBy("lang")
    }
  )
}
