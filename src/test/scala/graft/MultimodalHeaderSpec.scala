package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.{ImageHeaders, MediaHeader}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Multimodal.ImageHeaders]] against GENUINE image bytes: everything the
  * parser sees here is a real PNG or baseline-JPEG stream produced by the
  * JDK's own ImageIO encoders (zlib IDAT + CRCs, JFIF APP0/DQT/SOF0/DHT),
  * plus hand-built golden headers that pin the byte-level layout the
  * parser claims to read, plus garbage-tolerance negatives.
  */
class MultimodalHeaderSpec extends AnyFunSuite {

  test("PNG round-trip: ImageIO-encoded bytes parse to the encoded geometry") {
    for {
      (kind, ch) <- Seq(("png_rgb", 3), ("png_argb", 4), ("png_gray", 1))
      (w, h) <- Seq((1, 1), (16, 8), (640, 480), (300, 7))
    } {
      val bytes = Multimodal.encodeImage(w, h, kind)
      // sanity: these are real PNG streams, signature included
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P')
      assert(ImageHeaders.parse(bytes) === Some(MediaHeader("png", w, h, ch)),
        s"$kind ${w}x$h")
    }
  }

  test("JPEG round-trip: ImageIO baseline JPEGs parse to the encoded geometry") {
    for {
      (kind, ch) <- Seq(("jpeg_rgb", 3), ("jpeg_gray", 1))
      (w, h) <- Seq((1, 1), (16, 8), (640, 480), (33, 250))
    } {
      val bytes = Multimodal.encodeImage(w, h, kind)
      assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      assert(ImageHeaders.parse(bytes) === Some(MediaHeader("jpeg", w, h, ch)),
        s"$kind ${w}x$h")
    }
  }

  test("golden PNG header: hand-built IHDR bytes pin the field layout") {
    // signature + IHDR for a 258x515 truecolor+alpha image: width/height
    // are 4-byte big-endian at offsets 16/20, color type at 25
    val b = java.nio.ByteBuffer.allocate(26)
    b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(258).putInt(515)
    b.put(8.toByte).put(6.toByte) // bit depth 8, color type 6
    assert(ImageHeaders.parse(b.array()) === Some(MediaHeader("png", 258, 515, 4)))
  }

  test("golden JPEG: SOF0 found behind APPn/COM segments and fill bytes") {
    // SOI, APP0 (16 bytes), COM (4 bytes), fill FF, SOF0 with height=300
    // width=517, 3 components
    val out = new java.io.ByteArrayOutputStream()
    def w(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    w(0xff, 0xd8)                      // SOI
    w(0xff, 0xe0, 0x00, 0x10); (0 until 14).foreach(_ => w(0x00)) // APP0
    w(0xff, 0xfe, 0x00, 0x04, 0x41, 0x42)                         // COM "AB"
    w(0xff)                            // fill byte before the next marker
    w(0xff, 0xc0, 0x00, 0x11, 0x08)    // SOF0, len 17, precision 8
    w(0x01, 0x2c)                      // height 300
    w(0x02, 0x05)                      // width 517
    w(0x03)                            // 3 components
    (0 until 9).foreach(_ => w(0x00))
    assert(ImageHeaders.parse(out.toByteArray) ===
      Some(MediaHeader("jpeg", 517, 300, 3)))
  }

  test("garbage and truncation yield None, never exceptions") {
    val cases = Seq[Array[Byte]](
      Array.empty,
      "not an image at all".getBytes("UTF-8"),
      Array(0x89, 0x50).map(_.toByte),                     // truncated PNG sig
      Multimodal.encodeImage(16, 16, "png_rgb").take(20),  // truncated IHDR
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte),         // SOI then EOI, no SOF
      Array(0xff, 0xd8, 0x00, 0x11).map(_.toByte),         // broken marker stream
      // SOF0 whose declared segment length (2) cannot hold h/w/nc: the
      // fields must NOT be read from the following bytes
      (Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x02) ++
        Array(0x01, 0x00, 0x10, 0x00, 0x10, 0x03)).map(_.toByte)
    )
    cases.foreach(c => assert(ImageHeaders.parse(c).isEmpty))
  }

  test("headerTable: one mapPartitions pass, nulls for unparseable blobs") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val media = Seq(
      (1L, Multimodal.encodeImage(20, 10, "png_rgb")),
      (2L, Multimodal.encodeImage(7, 9, "jpeg_gray")),
      (3L, "plain text".getBytes("UTF-8"))
    ).toDF("doc_id", "blob")
    val rows = Multimodal.headerTable(media).orderBy("doc_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "png"), (2L, "jpeg"), (3L, null)))
    assert(rows(0).getInt(2) == 20 && rows(0).getInt(3) == 10 && rows(0).getInt(4) == 3)
    assert(rows(1).getInt(2) == 7 && rows(1).getInt(3) == 9 && rows(1).getInt(4) == 1)
    assert(rows(2).isNullAt(2) && rows(2).isNullAt(3) && rows(2).isNullAt(4))
    // plumbing claim: no shuffle — the decode is partition-local
    val plan = Multimodal.headerTable(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"headerTable should not shuffle:\n$plan")
  }

  test("WAV round-trip: javax.sound-encoded bytes parse to the encoded parameters") {
    for {
      rate <- Seq(8000, 16000, 44100)
      ch <- Seq(1, 2)
      frames <- Seq(1, 150, 4096)
    } {
      val bytes = Multimodal.encodeWav(rate, ch, frames)
      // genuine RIFF/WAVE stream, magic included
      assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(8) == 'W')
      assert(Multimodal.WavHeaders.parse(bytes) ===
        Some(Multimodal.WavHeader(rate, ch, 16, frames.toLong)),
        s"wav $rate Hz x$ch $frames frames")
    }
  }

  test("WAV parser: golden 44-byte PCM layout, odd-chunk padding, garbage tolerance") {
    // hand-built canonical header pins the byte offsets the parser reads
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(tag: String, body: Array[Byte]) =
      tag.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val fmt = chunk("fmt ", le16(1) ++ le16(2) ++ le32(22050) ++
      le32(22050 * 4) ++ le16(4) ++ le16(16))
    // an odd-sized LIST chunk BEFORE data: the walk must pad to the word
    // boundary or it misreads every later tag
    val list = chunk("LIST", Array.fill(7)(0x55.toByte))
    val data = chunk("data", new Array[Byte](40)) // 10 frames x blockAlign 4
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ list ++ data
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    assert(Multimodal.WavHeaders.parse(wav) ===
      Some(Multimodal.WavHeader(22050, 2, 16, 10L)))
    // negatives: truncation and non-RIFF payloads yield None, not throws
    assert(Multimodal.WavHeaders.parse(wav.take(30)) === None)
    assert(Multimodal.WavHeaders.parse("not audio at all".getBytes) === None)
    assert(Multimodal.WavHeaders.parse(Multimodal.encodeImage(8, 8, "png_rgb")) === None)
    // adversarial chunk size 0xFFFFFFF8: int arithmetic would advance the
    // walk by ZERO (infinite loop pinning an executor core) — must be None
    val evil = wav.clone()
    evil(16) = 0xf8.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte
    assert(Multimodal.WavHeaders.parse(evil) === None)
    // size that overruns the buffer without the zero-advance pathology
    val evil2 = wav.clone()
    evil2(16) = 0x00.toByte; evil2(17) = 0x01.toByte
    evil2(18) = 0x00.toByte; evil2(19) = 0x00.toByte
    assert(Multimodal.WavHeaders.parse(evil2) === None)
    // fmt chunk declaring size < 16: the parser must NOT read the
    // following chunk's bytes as sample-rate/channels/bits — unparseable,
    // not Some(garbage)
    val shortFmt = chunk("fmt ", le16(1) ++ le16(2) ++ le32(22050))
    val body3 = "WAVE".getBytes("US-ASCII") ++ shortFmt ++ data
    val wav3 = "RIFF".getBytes("US-ASCII") ++ le32(body3.length) ++ body3
    assert(Multimodal.WavHeaders.parse(wav3) === None)
  }

  test("MP4 round-trip: both mvhd versions, track counts, 64-bit durations") {
    for {
      v <- Seq(0, 1)
      (ts, dur) <- Seq((600L, 1200L), (90000L, 123456L))
      tracks <- Seq(0, 1, 3)
    } {
      val bytes = Multimodal.encodeMp4(v, ts, dur, tracks)
      assert(Multimodal.Mp4Headers.parse(bytes) ===
        Some(Multimodal.Mp4Header(v, ts, dur, tracks)), s"v$v ts=$ts x$tracks")
    }
    // version-1 64-bit duration actually uses the high word
    val big = 5_000_000_000L
    assert(Multimodal.Mp4Headers.parse(Multimodal.encodeMp4(1, 90000, big, 1))
      === Some(Multimodal.Mp4Header(1, 90000L, big, 1)))
  }

  test("MP4 parser negatives: truncation, wrong magic, crafted sizes yield None") {
    val good = Multimodal.encodeMp4(0, 600, 1200, 1)
    assert(Multimodal.Mp4Headers.parse(good.take(20)) === None)
    assert(Multimodal.Mp4Headers.parse("not a video".getBytes) === None)
    assert(Multimodal.Mp4Headers.parse(Multimodal.encodeWav(8000, 1, 10)) === None)
    // a box whose declared size runs past the buffer must not be trusted
    val evil = good.clone()
    evil(0) = 0x7f.toByte // blow up the ftyp size field
    assert(Multimodal.Mp4Headers.parse(evil) === None)

    // an mvhd whose OWN size is too small for its fields must be rejected,
    // not read past its end (an empty size-8 mvhd as moov's last child
    // ends exactly at the buffer — reading its version byte was an AIOOBE;
    // with a sibling trak after it, the old bound read the trak's bytes
    // as timescale/duration)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512) ++ "isom".getBytes)
    // empty mvhd at the very end of the buffer: must parse to None, not throw
    assert(Multimodal.Mp4Headers.parse(
      ftyp ++ box("moov", box("mvhd", Array.empty[Byte]))) === None)
    // undersized v0 mvhd (12-byte body, needs 20) followed by a sibling
    // whose bytes would previously be misread as timescale/duration
    val shortMvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0))
    val sibling = box("trak", be32(600) ++ be32(1200))
    assert(Multimodal.Mp4Headers.parse(
      ftyp ++ box("moov", shortMvhd ++ sibling)) === None)
  }

  test("resizeFit: aspect-preserving integer fit, never zero") {
    assert(Multimodal.resizeFit(16, 8, 8) == (8, 4))
    assert(Multimodal.resizeFit(8, 16, 8) == (4, 8))
    assert(Multimodal.resizeFit(6, 4, 8) == (6, 4))   // already fits: untouched
    assert(Multimodal.resizeFit(100, 1, 8) == (8, 1)) // thin strip floors to >= 1
    assert(Multimodal.resizeFit(1, 100, 8) == (1, 8))
    assert(Multimodal.resizeFit(47, 23, 8) == (8, 3)) // fixture worst case
  }

  test("resizeTable: real PNG decode + nearest-neighbor resize with exact pixels") {
    val spark = SparkSuite.spark
    import spark.implicits._
    // 16x8 RGB PNG with fill (x*31 + y*17): the 8x4 NN resize picks
    // src = dst*2 on both axes, so every resized pixel is exactly
    // (2dx*31 + 2dy*17) — checksum computable by hand
    val media = Seq((1L, Multimodal.encodeImage(16, 8, "png_rgb")))
      .toDF("doc_id", "blob")
    val r = Multimodal.resizeTable(media, maxDim = 8).collect().head
    assert((r.getInt(1), r.getInt(2)) == (8, 4))
    val expected = (for { dy <- 0 until 4; dx <- 0 until 8 }
      yield (2 * dx * 31 + 2 * dy * 17).toLong).sum
    assert(r.getLong(3) == expected, s"pix_sum ${r.getLong(3)} != $expected")
    // and partition-local, like every multimodal decode pass
    val plan = Multimodal.resizeTable(media, 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"resizeTable should not shuffle:\n$plan")
    // undecodable blob: ImageIO.read returns null (no exception) — the
    // family's contract is a null row, never an NPE that fails the batch
    val mixed = Seq(
      (1L, Multimodal.encodeImage(4, 4, "png_rgb")),
      (2L, "definitely not an image".getBytes("UTF-8")))
      .toDF("doc_id", "blob")
    val rows = Multimodal.resizeTable(mixed, 8).orderBy("doc_id").collect()
    assert(!rows(0).isNullAt(1) && rows(1).isNullAt(1) &&
      rows(1).isNullAt(2) && rows(1).isNullAt(3))
  }
}
