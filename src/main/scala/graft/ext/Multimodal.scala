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

  /** Parsed media header: what a catalog/inventory pass extracts per blob
    * before any pixel decode — enough to route, filter (min-resolution
    * gates), and cost-model downstream decoding.
    */
  final case class MediaHeader(format: String, width: Int, height: Int,
                               channels: Int)

  /** Pure-JVM container-header parser for the two ubiquitous image
    * formats — REAL format parsing (not the synthetic tag scheme of
    * [[DeterministicFakeDecoder]]): PNG via the IHDR chunk, JPEG via a
    * marker walk to the SOF segment. Runs on the raw `binary` column
    * inside `mapPartitions` ([[headerTable]]) — no codec libraries, no
    * pixel decode, O(header) work per blob regardless of payload size.
    */
  object ImageHeaders {
    private val PngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

    /** PNG: 8-byte signature, then the IHDR chunk (must be first per the
      * spec): length(4) "IHDR" width(4,BE) height(4,BE) bitdepth(1)
      * colortype(1) … — channels derive from the color type.
      */
    def parsePng(b: Array[Byte]): Option[MediaHeader] = {
      if (b.length < 26 || !b.take(8).sameElements(PngSig)) return None
      if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
        return None
      val w = be32(b, 16); val h = be32(b, 20)
      if (w <= 0 || h <= 0) return None
      val channels = (b(25) & 0xff) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case _ => return None
      }
      Some(MediaHeader("png", w, h, channels))
    }

    /** JPEG: SOI, then walk marker segments (each FF xx + 2-byte BE length
      * including itself) to the first SOFn (C0-CF minus DHT C4 / JPG C8 /
      * DAC CC), whose payload is precision(1) height(2) width(2)
      * ncomponents(1). Standalone markers (RSTn, TEM) carry no length;
      * hitting SOS or EOI without a SOF means no parseable frame header.
      */
    def parseJpeg(b: Array[Byte]): Option[MediaHeader] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None
        var j = i + 1 // tolerate fill bytes: FF FF ... FF marker
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
        if (j >= b.length) return None
        val m = b(j) & 0xff
        val seg = j + 1
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i = seg } // standalone
        else if (m == 0xd9 || m == 0xda) return None // EOI / SOS: no SOF seen
        else {
          if (seg + 1 >= b.length) return None
          val len = ((b(seg) & 0xff) << 8) | (b(seg + 1) & 0xff)
          if (len < 2) return None
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            // the h/w/nc fields live INSIDE the segment's own declared
            // length (2 len + 1 precision + 2 h + 2 w + 1 nc = 8 min) —
            // bounding only by the buffer would read the NEXT segment's
            // bytes on a truncated-length SOF and emit garbage dimensions
            // instead of the null row malformed payloads are contracted to
            if (len < 8) return None
            if (seg + 7 >= b.length) return None
            val h = ((b(seg + 3) & 0xff) << 8) | (b(seg + 4) & 0xff)
            val w = ((b(seg + 5) & 0xff) << 8) | (b(seg + 6) & 0xff)
            val nc = b(seg + 7) & 0xff
            if (w <= 0 || h <= 0 || nc <= 0) return None
            return Some(MediaHeader("jpeg", w, h, nc))
          }
          i = seg + len
        }
      }
      None
    }

    /** Sniff-and-parse: PNG first (8-byte magic is unambiguous), then
      * JPEG. None for anything else — unparseable blobs surface as null
      * rows, not exceptions (a 100 TB crawl always contains garbage).
      */
    def parse(b: Array[Byte]): Option[MediaHeader] =
      parsePng(b).orElse(parseJpeg(b))
  }

  /** Header-extraction plumbing over a (doc_id, blob) media table: one
    * `mapPartitions` pass emitting the parsed header (or nulls) per blob.
    * Partitioning preserved, no shuffle, O(header bytes) per row.
    */
  def headerTable(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ImageHeaders.parse(bytes) match {
          case Some(h) => (id, h.format, Some(h.width), Some(h.height), Some(h.channels))
          case None    => (id, null: String, None, None, None)
        }
      })
      .toDF("doc_id", "format", "width", "height", "channels")
  }

  /** Real-bytes fixture: encode a BufferedImage through the JDK's own
    * ImageIO codecs — genuine PNG streams (signature, IHDR, zlib IDAT,
    * CRCs) and genuine baseline JPEGs (JFIF APP0, DQT, SOF0, DHT, SOS).
    * Deterministic pixel fill so the bytes are reproducible per (w, h,
    * kind); used by q_multimodal_headers and ImageHeadersSpec.
    */
  def encodeImage(w: Int, h: Int, kind: String): Array[Byte] = {
    import java.awt.image.BufferedImage
    val imgType = kind match {
      case "png_rgb"  => BufferedImage.TYPE_INT_RGB
      case "png_argb" => BufferedImage.TYPE_INT_ARGB
      case "png_gray" => BufferedImage.TYPE_BYTE_GRAY
      case "jpeg_rgb"  => BufferedImage.TYPE_INT_RGB
      case "jpeg_gray" => BufferedImage.TYPE_BYTE_GRAY
      case other      => sys.error(s"unknown fixture kind: $other")
    }
    val img = new BufferedImage(w, h, imgType)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1 }
      y += 1
    }
    val fmt = if (kind.startsWith("png")) "png" else "jpg"
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
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

  /** Parsed audio container header: routing/cost metadata per blob, the
    * audio analogue of [[MediaHeader]].
    */
  final case class WavHeader(sampleRate: Int, channels: Int, bits: Int,
                             nFrames: Long)

  /** Pure-JVM RIFF/WAVE header parser — the audio sibling of
    * [[ImageHeaders]]: validates the RIFF/WAVE magic, then walks chunks
    * (word-aligned, per the RIFF spec's odd-size pad byte) to the `fmt `
    * fields and the `data` payload size. O(header) per blob, no codec.
    */
  object WavHeaders {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def parse(b: Array[Byte]): Option[WavHeader] = {
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      // pos/size in Long: `size` is unsigned 32-bit and attacker/corruption
      // controlled — int arithmetic on 0xFFFFFFF8 would make the advance 0
      // (infinite loop pinning an executor core) or negative (index crash).
      // Same validation stance as Mp4Headers: malformed sizes are
      // unparseable, not guessed.
      var pos = 12L
      var rate = -1; var ch = -1; var bits = -1; var blockAlign = -1
      var dataBytes = -1L
      while (pos + 8 <= b.length) {
        val p = pos.toInt
        val id = tag(b, p)
        val size = le32(b, p + 4)
        if (pos + 8 + size + (size & 1) > b.length) return None
        // the fmt chunk must DECLARE the 16 PCM bytes it is read for: a
        // malformed size < 16 would silently read the next chunk's bytes
        // as rate/channels/bits — same stance as Mp4Headers, malformed
        // sizes are unparseable, not guessed
        if (id == "fmt " && size >= 16 && pos + 24 <= b.length) {
          ch = le16(b, p + 10)
          rate = le32(b, p + 12).toInt
          blockAlign = le16(b, p + 20)
          bits = le16(b, p + 22)
        } else if (id == "data") dataBytes = size
        pos += 8 + size + (size & 1) // RIFF chunks word-align
      }
      if (rate > 0 && ch > 0 && bits > 0 && blockAlign > 0 && dataBytes >= 0)
        Some(WavHeader(rate, ch, bits, dataBytes / blockAlign))
      else None
    }
  }

  /** Real-bytes audio fixture: 16-bit PCM frames written through the JDK's
    * own javax.sound WAVE encoder (genuine RIFF/WAVE/fmt/data stream) —
    * the audio analogue of [[encodeImage]]. Deterministic sample fill per
    * (sampleRate, channels, nFrames).
    */
  def encodeWav(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, channels, channels * 2, sampleRate.toFloat,
      /* bigEndian = */ false)
    val pcm = new Array[Byte](nFrames * channels * 2)
    var off = 0
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        val v = (i * 31 + c * 17) & 0x7fff
        pcm(off) = (v & 0xff).toByte
        pcm(off + 1) = ((v >> 8) & 0xff).toByte
        off += 2; c += 1
      }
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Header-extraction plumbing for audio blobs: one `mapPartitions` pass,
    * nulls for unparseable payloads — identical shape to [[headerTable]].
    */
  def wavHeaderTable(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        WavHeaders.parse(bytes) match {
          case Some(h) => (id, Some(h.sampleRate), Some(h.channels),
                           Some(h.bits), Some(h.nFrames))
          case None    => (id, None, None, None, None)
        }
      })
      .toDF("doc_id", "sample_rate", "n_channels", "bits", "n_frames")
  }

  /** Parsed MP4/ISO-BMFF movie header: the video analogue of
    * [[MediaHeader]]/[[WavHeader]] — timing + track inventory, enough to
    * cost-model frame extraction without touching a codec.
    */
  final case class Mp4Header(version: Int, timescale: Long, duration: Long,
                             nTracks: Int)

  /** Pure-JVM ISO-BMFF box walk — the video sibling of [[ImageHeaders]] /
    * [[WavHeaders]]: requires a leading `ftyp` box, walks top-level boxes
    * to `moov`, then `moov`'s children for `mvhd` (both version 0 with
    * 32-bit times and version 1 with 64-bit times, per ISO/IEC 14496-12
    * §8.2.2) and the `trak` count. O(header) per blob; 64-bit/to-end box
    * sizes (size 0/1) are treated as unparseable rather than guessed.
    */
  object Mp4Headers {
    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def be64(b: Array[Byte], i: Int): Long =
      (be32(b, i) << 32) | be32(b, i + 4)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def parse(b: Array[Byte]): Option[Mp4Header] = {
      if (b.length < 16 || tag(b, 4) != "ftyp") return None
      var pos = 0
      var moovStart = -1L
      var moovEnd = -1L
      while (pos + 8 <= b.length) {
        val size = be32(b, pos)
        if (size < 8 || pos + size > b.length) return None
        if (tag(b, pos + 4) == "moov") { moovStart = pos + 8L; moovEnd = pos + size }
        pos += size.toInt
      }
      if (moovStart < 0) return None
      var p = moovStart.toInt
      var hdr: Option[(Int, Long, Long)] = None
      var tracks = 0
      while (p + 8 <= moovEnd) {
        val size = be32(b, p)
        if (size < 8 || p + size > moovEnd) return None
        tag(b, p + 4) match {
          case "mvhd" =>
            // field reads are bounded by the mvhd box's OWN declared end,
            // not the enclosing moov: an undersized mvhd with siblings
            // would otherwise silently read the next box's bytes as
            // timescale/duration, and an empty one at the buffer's end
            // would read past the array — malformed sizes are unparseable,
            // not guessed (the WavHeaders stance)
            val body = p + 8
            val boxEnd = p + size.toInt
            if (body >= boxEnd) return None
            val v = b(body) & 0xff
            hdr = v match {
              case 0 if body + 20 <= boxEnd =>
                Some((0, be32(b, body + 12), be32(b, body + 16)))
              case 1 if body + 32 <= boxEnd =>
                Some((1, be32(b, body + 20), be64(b, body + 24)))
              case _ => return None
            }
          case "trak" => tracks += 1
          case _ => ()
        }
        p += size.toInt
      }
      hdr.collect { case (v, ts, dur) if ts > 0 => Mp4Header(v, ts, dur, tracks) }
    }
  }

  /** Spec-conformant minimal MP4 fixture (ISO/IEC 14496-12 box layout,
    * hand-built to the byte — the same golden-bytes stance as the WAV
    * parser's layout test, since the JDK ships no MP4 encoder): `ftyp`
    * (isom) + `moov` containing an mvhd of the requested version and
    * `nTracks` track stubs.
    */
  def encodeMp4(version: Int, timescale: Long, duration: Long,
                nTracks: Int): Array[Byte] = {
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512) ++ "isom".getBytes ++ "iso2".getBytes)
    val mvhdBody: Array[Byte] = version match {
      case 0 => Array(0.toByte, 0.toByte, 0.toByte, 0.toByte) ++
        be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
        new Array[Byte](80) // rate..next_track_ID defaults, zeroed
      case 1 => Array(1.toByte, 0.toByte, 0.toByte, 0.toByte) ++
        be64(0) ++ be64(0) ++ be32(timescale) ++ be64(duration) ++
        new Array[Byte](80)
      case other => sys.error(s"mvhd version $other")
    }
    val traks = (0 until nTracks).map(i => box("trak", be32(i.toLong)))
      .foldLeft(Array.empty[Byte])(_ ++ _)
    ftyp ++ box("moov", box("mvhd", mvhdBody) ++ traks)
  }

  /** Header-extraction plumbing for video blobs: one `mapPartitions`
    * pass, nulls for unparseable payloads — same shape as
    * [[headerTable]]/[[wavHeaderTable]].
    */
  def mp4HeaderTable(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        Mp4Headers.parse(bytes) match {
          case Some(h) => (id, Some(h.version), Some(h.timescale),
                           Some(h.duration), Some(h.nTracks))
          case None    => (id, None, None, None, None)
        }
      })
      .toDF("doc_id", "version", "timescale", "duration", "n_tracks")
  }

  /** Aspect-preserving fit of (w, h) inside maxDim — integer arithmetic
    * only, so the oracle reproduces it exactly.
    */
  def resizeFit(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxDim) (w, h)
    else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
  }

  /** REAL image resize over the binary column: ImageIO decode (pure JDK —
    * the same codecs that authored the fixture bytes), nearest-neighbor
    * downscale into a fresh raster (`src = dst * srcDim / outDim`, floor),
    * and a checksum over the RESIZED raster's 24-bit pixels as the
    * verifiable evidence. One `mapPartitions` pass, partitioning
    * preserved, O(pixels) per blob — the decode/resize seam a production
    * pipeline fills with its codec of choice, except here the PNG path is
    * already fully real.
    */
  def resizeTable(media: DataFrame, maxDim: Int): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // ImageIO defaults to useCache=true: a temp-file-backed stream
        // PER BLOB — pure filesystem churn for bytes already in memory.
        // JVM-wide and idempotent, so set once per partition.
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
        // ImageIO.read returns NULL (no exception) for undecodable bytes,
        // but the JDK decoders also throw UNCHECKED exceptions on corrupt
        // payloads (CMMException for a broken ICC profile, AIOOBE /
        // NegativeArraySizeException from the JPEG reader) — a garbage
        // blob must yield the family's null row, not a task failure that
        // aborts the whole batch (same contract as the header tables)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) (id, None, None, None)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val (ow, oh) = resizeFit(w, h, maxDim)
          val out = new java.awt.image.BufferedImage(
            ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var sum = 0L
          var dy = 0
          while (dy < oh) {
            var dx = 0
            while (dx < ow) {
              val p = img.getRGB(dx * w / ow, dy * h / oh) & 0xffffff
              out.setRGB(dx, dy, p)
              sum += (out.getRGB(dx, dy) & 0xffffff) // read back the resized raster
              dx += 1
            }
            dy += 1
          }
          (id, Some(ow), Some(oh), Some(sum))
        }
        }
      }
      .toDF("doc_id", "out_w", "out_h", "pix_sum")
  }

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

  /** The shared image fixture of the declared queries (headers + resize):
    * 60 deterministic blobs, dims/kind derived from doc_id exactly as the
    * oracles' SQL derives them — ONE definition so the two queries'
    * fixtures (and their oracle mirrors) cannot silently diverge.
    */
  private def imageFixture(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val kinds = IndexedSeq("png_rgb", "jpeg_gray", "png_argb", "jpeg_rgb", "png_gray")
    Tables.documents(s, d).filter(col("doc_id") < 60)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 16 + (id % 32).toInt
        val h = 8 + (id % 16).toInt
        (id, encodeImage(w, h, kinds((id % 5).toInt)))
      }).toDF("doc_id", "blob")
  }

  val queries: Seq[Q] = Seq(

    // ---- REAL container-header decode over genuine PNG/JPEG bytes ----
    // The fixture bytes are encoded per row by the JDK's own ImageIO
    // codecs inside the executor task (real PNG signature/IHDR/zlib-IDAT/
    // CRC streams, real baseline JFIF JPEGs with APP0/DQT/SOF0/DHT/SOS),
    // then parsed back by the pure-JVM [[ImageHeaders]] walk. The oracle
    // derives the expected dimensions/channels independently from doc_id,
    // so a parser (or encoder-layout) error surfaces as a hash mismatch.
    Q("q_multimodal_headers",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 IN (0, 2, 4) THEN 'png' ELSE 'jpeg' END AS format,
        |  CAST(16 + doc_id % 32 AS INT) AS width,
        |  CAST(8 + doc_id % 16 AS INT) AS height,
        |  CAST(CASE doc_id % 5 WHEN 0 THEN 3 WHEN 1 THEN 1 WHEN 2 THEN 4
        |       WHEN 3 THEN 3 ELSE 1 END AS INT) AS channels
        |FROM documents WHERE doc_id < 60 ORDER BY doc_id""".stripMargin) { (s, d) =>
      headerTable(imageFixture(s, d)).orderBy("doc_id")
    },

    // ---- MP4/ISO-BMFF movie-header decode (video leg) ----
    // Completes the image/audio/video triad: spec-conformant minimal MP4
    // boxes (ftyp + moov/mvhd/trak, both mvhd versions — the JDK ships no
    // MP4 encoder, so the fixture is golden bytes built to ISO/IEC
    // 14496-12, the same stance as the WAV layout test) walked by the
    // pure-JVM [[Mp4Headers]] parser. The oracle derives version,
    // timescale, duration, track count, and integral micros duration
    // from doc_id arithmetic.
    Q("q_multimodal_video",
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS version,
        |  CAST(600 + (doc_id % 5) * 300 AS BIGINT) AS timescale,
        |  CAST(1200 + doc_id % 600 AS BIGINT) AS duration,
        |  CAST(1 + doc_id % 3 AS INT) AS n_tracks,
        |  CAST((1200 + doc_id % 600) * 1000000 // (600 + (doc_id % 5) * 300) AS BIGINT) AS duration_us
        |FROM documents WHERE doc_id < 60 ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d).filter(col("doc_id") < 60)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val v = if (id % 3 == 0) 1 else 0
          (id, encodeMp4(v, 600 + (id % 5) * 300, 1200 + id % 600,
                         1 + (id % 3).toInt))
        }).toDF("doc_id", "blob")
      mp4HeaderTable(media)
        .withColumn("duration_us",
          expr("duration * 1000000 div timescale").cast("long"))
        .orderBy("doc_id")
    },

    // ---- REAL audio-container header decode over genuine WAV bytes ----
    // The audio leg of the multimodal surface, mirroring
    // q_multimodal_headers: fixture bytes are genuine RIFF/WAVE streams
    // written by the JDK's own javax.sound encoder (real fmt/data chunk
    // layout), parsed back by the pure-JVM [[WavHeaders]] chunk walk. The
    // oracle derives sample rate / channels / frame count / duration
    // independently from doc_id, so an encoder-layout or parser error
    // surfaces as a hash mismatch. duration_us is integral (micros) so
    // both engines agree bit-exactly.
    Q("q_multimodal_audio",
      """SELECT doc_id,
        |  CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS INT) AS n_channels,
        |  CAST(16 AS INT) AS bits,
        |  CAST(100 + doc_id % 50 AS BIGINT) AS n_frames,
        |  CAST((100 + doc_id % 50) * 1000000 // (8000 + (doc_id % 4) * 4000) AS BIGINT) AS duration_us
        |FROM documents WHERE doc_id < 60 ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d).filter(col("doc_id") < 60)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val rate = 8000 + (id % 4).toInt * 4000
          val ch = 1 + (id % 2).toInt
          val frames = 100 + (id % 50).toInt
          (id, encodeWav(rate, ch, frames))
        }).toDF("doc_id", "blob")
      wavHeaderTable(media)
        .withColumn("duration_us",
          expr("n_frames * 1000000 div sample_rate").cast("long"))
        .orderBy("doc_id")
    },

    // ---- REAL pixel resize over genuine image bytes ----
    // Same fixture scheme as q_multimodal_headers (real ImageIO-encoded
    // bytes, dimensions derived from doc_id), decoded back by ImageIO and
    // nearest-neighbor-resized to fit maxDim=8. The oracle reproduces the
    // output dimensions AND — for the losslessly-round-tripping RGB/ARGB
    // PNG kinds — the exact pixel checksum of the resized raster, because
    // the fixture fill (x*31 + y*17, < 2^24 at these sizes) makes every
    // resized pixel `srcX*31 + srcY*17` with srcX = dstX*w div outW. The
    // JPEG kinds are lossy and the gray kind round-trips through a
    // colorspace transform, so their checksums are NULL by declaration —
    // dims (the resize contract) are still verified for all five kinds.
    Q("q_multimodal_resize",
      """WITH d2 AS (
        |  SELECT doc_id, 16 + doc_id % 32 AS w, 8 + doc_id % 16 AS h,
        |    greatest(1, (16 + doc_id % 32) * 8 // greatest(16 + doc_id % 32, 8 + doc_id % 16)) AS out_w,
        |    greatest(1, (8 + doc_id % 16) * 8 // greatest(16 + doc_id % 32, 8 + doc_id % 16)) AS out_h
        |  FROM documents WHERE doc_id < 60
        |),
        |pix AS (
        |  SELECT doc_id, sum((dx * w // out_w) * 31 + (dy * h // out_h) * 17) AS s
        |  FROM d2, unnest(range(out_w)) AS t1(dx), unnest(range(out_h)) AS t2(dy)
        |  GROUP BY doc_id
        |)
        |SELECT d2.doc_id, CAST(out_w AS INT) AS out_w, CAST(out_h AS INT) AS out_h,
        |  CASE WHEN d2.doc_id % 5 IN (0, 2) THEN CAST(p.s AS BIGINT) END AS pix_sum
        |FROM d2 LEFT JOIN pix p USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, d) =>
      resizeTable(imageFixture(s, d), maxDim = 8)
        .select(col("doc_id"), col("out_w"), col("out_h"),
          when(col("doc_id") % 5 === 0 || col("doc_id") % 5 === 2, col("pix_sum"))
            .cast("long").as("pix_sum"))
        .orderBy("doc_id")
    },

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
    },

    // ---- chunk-level binary dedup (storage-dedup style) ----
    // Media blobs are chunked at fixed 64-byte boundaries (final partial
    // chunk included), hashed per chunk, and duplicated chunks reported —
    // the fixed-block flavor of content-addressed storage dedup, run on
    // the raw binary column. At 100 TB: chunking is a per-row generator
    // (explode of a sequence — no shuffle), and the duplicate detection
    // is one hash aggregate on chunk_md5 with map-side partial combine;
    // output is bounded by the number of DUPLICATED chunks. ASCII blobs
    // make byte chunks == char chunks, so the oracle replays over VARCHAR
    // (same contract as q_multimodal_frames).
    Q("q_multimodal_dedup",
      """WITH c AS (
        |  SELECT doc_id, md5(substr(text, 1 + i * 64, 64)) AS chunk_md5
        |  FROM (
        |    SELECT doc_id, text,
        |      unnest(range((octet_length(encode(text)) + 63) // 64)) AS i
        |    FROM documents
        |  )
        |)
        |SELECT chunk_md5, count(*) AS copies,
        |  count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keep_doc
        |FROM c GROUP BY 1 HAVING count(*) > 1
        |ORDER BY copies DESC, chunk_md5""".stripMargin) { (s, d) =>
      mediaTable(s, d)
        .select(col("doc_id"), col("blob"),
          ceil(col("meta.n_bytes") / lit(64.0)).cast("long").as("nc"))
        // zero-chunk (empty) and NULL blobs drop — the oracle's
        // unnest(range(0)) / range(NULL) semantics; a greatest(nc, 1)
        // guard here would instead hash one empty chunk per empty blob
        // and silently diverge from the oracle on such a corpus
        .filter(col("nc") > 0)
        .select(col("doc_id"),
          explode(sequence(lit(0L), col("nc") - 1)).as("i"), col("blob"))
        .select(col("doc_id"),
          md5(expr("substring(blob, CAST(1 + i * 64 AS INT), 64)")).as("chunk_md5"))
        .groupBy("chunk_md5")
        .agg(count(lit(1)).as("copies"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("keep_doc"))
        .filter(col("copies") > 1)
        .orderBy(col("copies").desc, col("chunk_md5"))
    }
  )
}
