package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with a typed metadata struct alongside. The decode step is pluggable —
  * real image/audio codecs are not available in this environment, so
  * [[DeterministicFakeDecoder]] stands in; the Spark-side plumbing (schema,
  * batch shape, partition-level execution via `mapPartitions`) is real and
  * is what a production decoder would drop into.
  */
object Multimodal {

  /** Decode stub boundary: bytes -> fixed-width feature vector. */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def decode(bytes: Array[Byte]): Array[Double]
  }

  /** Deterministic fake: 16-bin histogram of high nibbles, L1-normalized.
    * Replace with a real codec (JPEG decode + pooling, PCM frames, …) in
    * production; signature and batch shape stay identical.
    */
  object DeterministicFakeDecoder extends MediaDecoder {
    val featureDim = 16
    def decode(bytes: Array[Byte]): Array[Double] = {
      val hist = new Array[Double](featureDim)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xf0) >>> 4) += 1.0; i += 1 }
      val n = math.max(bytes.length, 1).toDouble
      var j = 0
      while (j < featureDim) { hist(j) /= n; j += 1 }
      hist
    }
  }

  /** media table shape: (doc_id, blob BINARY, meta STRUCT<n_bytes, format>).
    * Here synthesized from documents.text; a real pipeline reads files via
    * `spark.read.format("binaryFile")` into the identical shape.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("blob"),
      struct(octet_length(col("text")).as("n_bytes"),
             col("source").as("format")).as("meta"))

  /** Partition-parallel featurize: the one deliberate `mapPartitions` in the
    * engine (per-row imperative decode, SURVEY.md §2 preference order (d)).
    * Input partitioning is preserved; no shuffle.
    */
  def featurize(media: DataFrame, decoder: MediaDecoder): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, decoder.decode(bytes)) })
      .toDF("doc_id", "features")
  }

  /** Frame sampling over an opaque media blob: every `stride` bytes, take a
    * `frameBytes`-wide slice — the Spark plumbing (offset `sequence` +
    * `posexplode` + binary `substring`, all codegen'd) is exactly what a
    * video pipeline does per GOP/keyframe; a real decoder replaces the
    * byte-slice with a decoded frame, shape unchanged.
    */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val L = octet_length(col("blob"))
    val offsets = when(L >= frameBytes,
      sequence(lit(1), L - (frameBytes - 1), lit(stride)))
      .otherwise(array().cast("array<int>"))
    media
      .select(col("doc_id"), col("blob"), posexplode(offsets).as(Seq("frame_idx", "off")))
      .select(col("doc_id"), col("frame_idx"),
              md5(expr(s"substring(blob, off, $frameBytes)")).as("frame_md5"))
  }

  val queries: Seq[Q] = Seq(

    // ---- metadata extraction over the binary column (SQL-checkable) ----
    Q("q_multimodal_meta",
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, md5(text) AS b_md5
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, d) =>
      mediaTable(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"), md5(col("blob")).as("b_md5"))
        .orderBy("doc_id")
    },

    // ---- frame sampling: strided binary slices, hashed per frame ----
    // (documents.text is ASCII, so byte slices == char slices and the
    // oracle can express the same frames over VARCHAR)
    Q("q_multimodal_frames",
      """SELECT doc_id, CAST(i AS INT) AS frame_idx, md5(substr(text, 1 + i * 64, 16)) AS frame_md5
        |FROM (
        |  SELECT doc_id, text, unnest(range((octet_length(encode(text) ) - 15 + 63) // 64)) AS i
        |  FROM documents WHERE doc_id < 100 AND octet_length(encode(text)) >= 16
        |) ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      frameSample(mediaTable(s, d).filter(col("doc_id") < 100), frameBytes = 16, stride = 64)
        .select(col("doc_id"), (col("frame_idx")).as("frame_idx"), col("frame_md5"))
        .orderBy("doc_id", "frame_idx")
    },

    // ---- decode + featurize via mapPartitions ----
    // Output is exploded to scalar (doc_id, idx, feat) rows: array columns
    // are not canonicalizable by the driver's pandas hasher, and the fake
    // decoder is deterministic arithmetic, so the histogram has an exact
    // DuckDB oracle (documents.text is ASCII: codepoint == UTF-8 byte).
    Q("q_multimodal_features",
      """WITH chars AS (
        |  SELECT doc_id, ord(c) // 16 AS bin
        |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
        |),
        |lens AS (SELECT doc_id, greatest(octet_length(encode(text)), 1) AS n FROM documents),
        |bins AS (SELECT doc_id, bin, count(*) AS cnt FROM chars GROUP BY 1, 2)
        |SELECT l.doc_id, CAST(i.idx AS INT) AS idx, round(coalesce(b.cnt, 0) / l.n, 6) AS feat
        |FROM lens l
        |CROSS JOIN (SELECT unnest(range(16)) AS idx) i
        |LEFT JOIN bins b ON b.doc_id = l.doc_id AND b.bin = i.idx
        |ORDER BY l.doc_id, idx""".stripMargin) { (s, d) =>
      featurize(mediaTable(s, d), DeterministicFakeDecoder)
        .select(col("doc_id"), posexplode(col("features")).as(Seq("idx", "feat")))
        .select(col("doc_id"), col("idx"), round(col("feat"), 6).as("feat"))
        .orderBy("doc_id", "idx")
    }
  )
}
