package graft.ext

import org.apache.spark.sql.SparkSession

/** Bucket-function version stamping for at-rest indexes.
  *
  * Every partitioned index here ([[SubstringIndex]], [[DedupIndex]])
  * derives its partition bucket INDEPENDENTLY on the write and the probe
  * side, as a pure function of the key. That makes probes cheap — no
  * lookup table to ship — but means a change to the bucket function (or
  * to Spark's `hash`) silently invalidates every stored tree: probes
  * compute the new bucket, look in the wrong directory, and report ZERO
  * hits with no error. For a dedup index that silently admits duplicates;
  * for a substring index it silently skips decontamination.
  *
  * The stamp turns that into a loud load-time failure: [[stamp]] writes a
  * version-named empty marker AFTER the data lands (so a write killed
  * mid-stream is refused too — no marker), and [[check]] rejects a tree
  * whose marker is missing. Bump the marker name in the owning object
  * whenever its bucket derivation changes.
  */
private[graft] object IndexVersion {

  def stamp(spark: SparkSession, path: String, marker: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, marker)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(p, true).close()
  }

  def check(spark: SparkSession, path: String, marker: String,
            what: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, marker)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$what at $path lacks $marker: it was written by an older " +
        "bucket-function version (or the write was killed mid-stream) — " +
        "probing it would silently miss every hit. Rebuild the index.")
  }
}
