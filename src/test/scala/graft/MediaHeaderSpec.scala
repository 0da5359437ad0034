package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Planted REAL container bytes through the expression-level header
  * parser (the PII-regex precedent: the corpus has no real media, so
  * the production branch is proven on fixtures with known answers). */
class MediaHeaderSpec extends AnyFunSuite with SparkTestBase {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  /** A real PNG prefix: signature + IHDR chunk for `w`×`h`. */
  private def pngHeader(w: Int, h: Int): Array[Byte] =
    bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++
      bytes(w >>> 24, (w >>> 16) & 0xFF, (w >>> 8) & 0xFF, w & 0xFF,
        h >>> 24, (h >>> 16) & 0xFF, (h >>> 8) & 0xFF, h & 0xFF,
        8, 6, 0, 0, 0) ++ bytes(0xDE, 0xAD, 0xBE, 0xEF) // depth..interlace + CRC

  /** A real JPEG prefix: SOI, APP0/JFIF, a DHT (C4 — in C0–CF but NOT a
    * SOF: the walk must skip it), then SOF0 with `h`×`w`. */
  private def jpegHeader(w: Int, h: Int): Array[Byte] =
    bytes(0xFF, 0xD8) ++ // SOI
      (bytes(0xFF, 0xE0, 0x00, 0x10) ++ "JFIF".getBytes("US-ASCII") ++
        bytes(0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) ++ // APP0 len 16
      bytes(0xFF, 0xC4, 0x00, 0x05, 1, 2, 3) ++ // DHT len 5 (not a SOF)
      bytes(0xFF, 0xC0, 0x00, 0x11, 8, // SOF0 len 17, precision 8
        (h >>> 8) & 0xFF, h & 0xFF, (w >>> 8) & 0xFF, w & 0xFF,
        3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1) // 3 components

  private def parse(payloads: Seq[Array[Byte]]) = {
    import spark.implicits._
    payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "media")
      .select(col("id"), Multimodal.mediaHeaderDims(col("media")).as("hdr"))
      .select(col("id"), col("hdr.fmt"), col("hdr.w"), col("hdr.h"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
  }

  test("PNG IHDR: exact dimensions from planted real headers") {
    val got = parse(Seq(pngHeader(640, 480), pngHeader(2560, 1440),
      pngHeader(1, 99999)))
    assert(got(0L) == (Some("png"), Some(640L), Some(480L)))
    assert(got(1L) == (Some("png"), Some(2560L), Some(1440L)))
    assert(got(2L) == (Some("png"), Some(1L), Some(99999L)))
  }

  test("JPEG SOF walk: skips APP0 and DHT, reads SOF0 dims exactly") {
    val got = parse(Seq(jpegHeader(640, 480), jpegHeader(1920, 1080)))
    assert(got(0L) == (Some("jpeg"), Some(640L), Some(480L)))
    assert(got(1L) == (Some("jpeg"), Some(1920L), Some(1080L)))
  }

  test("JPEG walk survives fill bytes and standalone markers before SOF") {
    // T.81 §B.1.1.2: any number of 0xFF fill bytes may pad before a
    // marker code, and TEM (0x01) / RST0-7 (0xD0-D7) are standalone
    // (no length field) — the r11 advice case: treating either as
    // length-prefixed derails the walk and a valid JPEG reads NULL
    val fillPadded =
      bytes(0xFF, 0xD8) ++ // SOI
        bytes(0xFF, 0xFF, 0xFF) ++ // fill bytes, then APP0's own FF
        (bytes(0xFF, 0xE0, 0x00, 0x06, 1, 2, 3, 4)) ++ // APP0 len 6
        bytes(0xFF, 0x01) ++ // TEM: standalone
        bytes(0xFF, 0xD0) ++ // RST0: standalone
        bytes(0xFF, 0xC0, 0x00, 0x11, 8, // SOF0
          (600 >>> 8) & 0xFF, 600 & 0xFF, (800 >>> 8) & 0xFF, 800 & 0xFF,
          3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val eoiBeforeSof = bytes(0xFF, 0xD8, 0xFF, 0xD9) // SOI then EOI: no frame
    val got = parse(Seq(fillPadded, eoiBeforeSof))
    assert(got(0L) == (Some("jpeg"), Some(800L), Some(600L)), got(0L))
    assert(got(1L) == (None, None, None), got(1L))
  }

  test("non-media and truncated payloads yield NULL, never garbage") {
    val got = parse(Seq(
      "plain ascii text".getBytes("US-ASCII"),
      bytes(0x89, 0x50, 0x4E, 0x47), // PNG signature cut short
      bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10), // JPEG truncated mid-APP0
      Array.empty[Byte]))
    got.values.foreach(v => assert(v == (None, None, None), v))
  }

  /** A real canonical WAV header: RIFF/WAVE + fmt chunk (PCM) for the
    * given rate/channels/bits, with LE multi-byte fields. */
  private def wavHeader(rate: Int, channels: Int, bits: Int): Array[Byte] = {
    def le16(v: Int) = bytes(v & 0xFF, (v >>> 8) & 0xFF)
    def le32(v: Int) = bytes(v & 0xFF, (v >>> 8) & 0xFF, (v >>> 16) & 0xFF, (v >>> 24) & 0xFF)
    val blockAlign = channels * bits / 8
    "RIFF".getBytes("US-ASCII") ++ le32(36) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(bits) ++
      "data".getBytes("US-ASCII") ++ le32(0)
  }

  test("WAV fmt chunk: exact little-endian rate/channels/bits from planted headers") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val payloads = Seq(wavHeader(44100, 2, 16), wavHeader(16000, 1, 8),
      "RIFFnot a wav at all........................".getBytes("US-ASCII"),
      pngHeader(64, 64)) // an image must not parse as audio
    val got = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "media")
      .select(col("id"), Multimodal.mediaAudioMeta(col("media")).as("a"))
      .select(col("id"), col("a.fmt"), col("a.sample_rate"),
        col("a.channels"), col("a.bits"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(got(0L) == (Some("wav"), 44100L, 2L, 16L))
    assert(got(1L) == (Some("wav"), 16000L, 1L, 8L))
    assert(got(2L) == (None, -1L, -1L, -1L))
    assert(got(3L) == (None, -1L, -1L, -1L))
  }

  test("q75 prefers header dims over the arithmetic stub for real media") {
    // plant a documents dir WITH a binary `media` column (the real
    // multimodal table shape): q75 must emit the IHDR dims for the PNG
    // payload and fall back to the arithmetic stub for the non-media one
    import spark.implicits._
    val png = pngHeader(320, 200)
    val plain = "just words here".getBytes("UTF-8")
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    Seq((0L, "png doc", png), (1L, "plain doc", plain))
      .toDF("doc_id", "text", "media")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Multimodal.q75_media_resize(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("src_w"), r.getAs[Long]("src_h"))).toMap
    assert(rows(0L) == (320L, 200L),
      s"header dims must win for real media: ${rows(0L)}")
    // the non-container payload falls back to the arithmetic stub
    val bl = plain.length.toLong
    assert(rows(1L) == (64L + bl % 1920L, 64L + (bl / 7) % 1080L))
  }

  /** APP1/Exif segment carrying one IFD0 entry: orientation `ori`,
    * big-endian ("MM") or little-endian ("II") TIFF. */
  private def exifApp1(ori: Int, littleEndian: Boolean): Array[Byte] = {
    val tiff =
      if (littleEndian)
        bytes(0x49, 0x49, 0x2A, 0x00, 8, 0, 0, 0, // II, 42, IFD0 at 8
          1, 0, // 1 entry
          0x12, 0x01, 3, 0, 1, 0, 0, 0, ori, 0, 0, 0, // tag 0112 SHORT×1
          0, 0, 0, 0) // no next IFD
      else
        bytes(0x4D, 0x4D, 0x00, 0x2A, 0, 0, 0, 8,
          0, 1,
          0x01, 0x12, 0, 3, 0, 0, 0, 1, 0, ori, 0, 0,
          0, 0, 0, 0)
    bytes(0xFF, 0xE1, 0x00, 0x22) ++ "Exif".getBytes("US-ASCII") ++
      bytes(0, 0) ++ tiff
  }

  private def orientations(payloads: Seq[Array[Byte]]): Map[Long, Option[Long]] = {
    import spark.implicits._
    payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "media")
      .select(col("id"),
        graft.functions.MediaOps.jpegExifOrientation(col("media")).as("o"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
  }

  test("EXIF orientation: both TIFF endiannesses, fill bytes, APP1 after other segments") {
    val sof = bytes(0xFF, 0xC0, 0x00, 0x11, 8, 1, 0x90, 2, 0x80,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val soi = bytes(0xFF, 0xD8)
    val app0 = bytes(0xFF, 0xE0, 0x00, 0x06, 1, 2, 3, 4)
    val got = orientations(Seq(
      soi ++ exifApp1(6, littleEndian = false) ++ sof, // MM straight after SOI
      soi ++ app0 ++ bytes(0xFF, 0xFF) ++ exifApp1(8, littleEndian = true) ++ sof, // II behind APP0 + fill
      soi ++ exifApp1(3, littleEndian = true) ++ sof,
      soi ++ app0 ++ sof)) // no Exif at all
    assert(got(0L) == Some(6L))
    assert(got(1L) == Some(8L))
    assert(got(2L) == Some(3L))
    assert(got(3L) == None)
  }

  test("EXIF orientation: malformed TIFF, XMP-style APP1, SOS cutoff all yield NULL") {
    val soi = bytes(0xFF, 0xD8)
    // APP1 that is NOT Exif (XMP rides APP1 too): walk must skip it
    val xmp = bytes(0xFF, 0xE1, 0x00, 0x0A) ++ "http://x".getBytes("US-ASCII")
    // Exif header but TIFF magic is wrong
    val badMagic = {
      val a = exifApp1(1, littleEndian = false)
      a(12) = 0x13.toByte // corrupt the 0x002A magic
      a
    }
    // Exif whose IFD0 offset points past the segment
    val badOff = {
      val a = exifApp1(1, littleEndian = false)
      a(17) = 0x7F.toByte // IFD0 offset 0x7F00_0000-ish: out of bounds
      a
    }
    val got = orientations(Seq(
      soi ++ xmp, // only a non-Exif APP1, then truncation
      soi ++ badMagic,
      soi ++ badOff,
      soi ++ bytes(0xFF, 0xDA, 0x00, 0x04, 1, 2) ++ exifApp1(5, littleEndian = true), // SOS first
      "not a jpeg".getBytes("US-ASCII"),
      Array.empty[Byte]))
    got.values.foreach(v => assert(v == None, v))
  }

  /** A canonical AVI header: RIFF/AVI + LIST/hdrl with avih first. */
  private def aviHeader(usPerFrame: Int, frames: Int): Array[Byte] = {
    def le32(v: Int) = bytes(v & 0xFF, (v >>> 8) & 0xFF, (v >>> 16) & 0xFF, (v >>> 24) & 0xFF)
    "RIFF".getBytes("US-ASCII") ++ le32(9999) ++ "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(200) ++ "hdrl".getBytes("US-ASCII") ++
      "avih".getBytes("US-ASCII") ++ le32(56) ++
      le32(usPerFrame) ++ le32(500000) ++ le32(0) ++ le32(16) ++ le32(frames) ++
      le32(0) ++ le32(1) ++ le32(0)
  }

  test("AVI avih: little-endian frame timing and exact integer duration") {
    import spark.implicits._
    val payloads = Seq(
      aviHeader(33333, 900), // ~30 fps, 30 s
      aviHeader(40000, 250), // 25 fps, 10 s exactly
      wavHeader(44100, 2, 16), // a WAV must not parse as video
      "RIFFnope".getBytes("US-ASCII"))
    val got = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "media")
      .select(col("id"), Multimodal.mediaVideoMeta(col("media")).as("v"))
      .select(col("id"), col("v.fmt"), col("v.us_per_frame"),
        col("v.n_frames"), col("v.duration_ms"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(got(0L) == (Some("avi"), 33333L, 900L, 29999L)) // 29999700 us
    assert(got(1L) == (Some("avi"), 40000L, 250L, 10000L))
    assert(got(2L) == (None, -1L, -1L, -1L))
    assert(got(3L) == (None, -1L, -1L, -1L))
  }

  test("GIF logical screen descriptor: little-endian dims, 87a and 89a, junk rejected") {
    import spark.implicits._
    def gif(sig: String, w: Int, h: Int): Array[Byte] =
      sig.getBytes("US-ASCII") ++
        Array((w & 0xFF).toByte, ((w >> 8) & 0xFF).toByte,
          (h & 0xFF).toByte, ((h >> 8) & 0xFF).toByte) ++
        Array[Byte](0, 0, 0) // packed fields / bg / aspect
    val payloads = Seq(
      gif("GIF89a", 640, 480),
      gif("GIF87a", 1, 65535),          // LE extremes: high byte of h = 0xFF
      "GIF88a1234567890".getBytes("US-ASCII"), // wrong version byte
      "GIF89".getBytes("US-ASCII"))     // truncated below the descriptor
    val got = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "media")
      .select(col("id"), Multimodal.mediaHeaderDims(col("media")).as("m"))
      .select(col("id"), col("m.fmt"), col("m.w"), col("m.h"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got(0L) == (Some("gif"), 640L, 480L))
    assert(got(1L) == (Some("gif"), 1L, 65535L))
    assert(got(2L) == (None, -1L, -1L))
    assert(got(3L) == (None, -1L, -1L))
  }
}
