package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Queries are forced end-to-end with the noop sink
  * (all columns materialized — `count()` would let Catalyst prune the
  * projection and under-report).
  *
  * Reproducibility: each query is timed SPARK_GRAFT_REPS times (default 3)
  * and the per-query MEDIAN is reported — single-shot timings on a shared
  * box swing by seconds when a GC pause lands mid-query. Between timed
  * regions the cache is dropped and a full GC is requested so one query's
  * garbage (cached LSH signature tables) is never attributed to the next.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS,
  * SPARK_GRAFT_ONLY (comma-separated query-name filter, for iterating).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts INT64(NANOS)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // JVM/codegen warmup outside the timed region (steady-state throughput
    // is the comparison target, not first-query JIT cost)
    Tables.lineitem(spark, sfDir).count()
    Tables.events(spark, sfDir).count()

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop intra-query caches NOW (blocking) and collect the garbage
      // outside the next timed region — otherwise unpersist runs async and
      // the GC pause lands on whichever query runs next
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      dt
    }

    val results = queries.map { case (name, fn) =>
      val times = (1 to reps).map(_ => once(name, fn)).sorted
      val n = times.size
      // true median: average the middle pair for even rep counts (picking
      // the upper-middle would report the WORSE of 2 runs as the "median")
      val med = if (n % 2 == 1) times(n / 2) else (times(n / 2 - 1) + times(n / 2)) / 2
      // per-query progress on stderr: a killed/timed-out run still leaves
      // every finished median on record (the stdout JSON line would be lost)
      System.err.println(f"[bench] $name $med%.3f s (reps=${times.map(t => f"$t%.2f").mkString(",")})")
      name -> med
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum}%.3f"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
