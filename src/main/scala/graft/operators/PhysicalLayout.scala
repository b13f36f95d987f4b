package graft.operators

import org.apache.spark.sql.DataFrame

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

  /** Write `df` as a bucketed, bucket-sorted managed parquet table.
    * Equi-joins and aggregations keyed on `key` between tables bucketed
    * with the SAME bucket count then require no shuffle on either side.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table) // managed: location under spark.sql.warehouse.dir

  /** Write `df` partitioned by `partitionCol` directory values. Readers
    * filtering on the partition column scan only matching directories.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
