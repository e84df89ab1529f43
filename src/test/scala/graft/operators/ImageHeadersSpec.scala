package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Header-byte image dimensions (r14, L160). The load-bearing pin runs
  * against REAL encoder output (the q_m8 discipline): ImageIO-written
  * PNG/GIF/BMP blobs must parse back to the encoder's own dimensions,
  * so the slicing offsets and endianness agree with actual files, not
  * just with the spec author's reading of the format. Hand-built
  * headers pin the signed top-down BMP leg, truncation, non-positive
  * reads, and the JPEG out-of-scope boundary. */
class ImageHeadersSpec extends SparkSpec {
  import spark.implicits._

  private def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, 0x336699)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  private def dims(blobs: Seq[Array[Byte]]) =
    ImageHeaders.withDims(
        blobs.zipWithIndex.map { case (b, i) => (i.toLong, b) }
          .toDF("id", "content"), "content")
      .orderBy(col("id"))
      .collect()
      .map(r => (Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toSeq

  test("REAL encoder round-trip: ImageIO png/gif/bmp dims parse back") {
    // asymmetric dims so a width/height or endianness swap cannot pass
    val got = dims(Seq(encode(37, 21, "png"), encode(37, 21, "gif"),
      encode(37, 21, "bmp")))
    assert(got === Seq(
      (Some("png"), Some(37L), Some(21L), Some(0L)),
      (Some("gif"), Some(37L), Some(21L), Some(0L)),
      (Some("bmp"), Some(37L), Some(21L), Some(0L))))
  }

  private def hexBytes(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("hand-built top-down BMP: |height| with the orientation bit") {
    // width 300 (0x2C01 LE), height −200 (0x38FFFFFF LE signed)
    val bmp = hexBytes("424D" + "00" * 12 + "28000000" +
      "2C010000" + "38FFFFFF")
    val got = dims(Seq(bmp))
    assert(got === Seq((Some("bmp"), Some(300L), Some(200L), Some(1L))))
  }

  test("truncated headers: fmt still sniffs, dims NULL, never garbage") {
    val pngMagicOnly = hexBytes("89504E470D0A1A0A0000000D")
    val gifMagicOnly = hexBytes("474946383961")
    val bmpShort = hexBytes("424D760200")
    val got = dims(Seq(pngMagicOnly, gifMagicOnly, bmpShort))
    assert(got === Seq(
      (Some("png"), None, None, Some(0L)),
      (Some("gif"), None, None, Some(0L)),
      (Some("bmp"), None, None, None)))
  }

  test("non-positive dims read as NULL (the L149 violation convention)") {
    // GIF with width 0; PNG whose IHDR fourcc is wrong parses nothing
    val gifZeroW = hexBytes("474946383961" + "0000" + "1500")
    val pngBadIhdr = hexBytes("89504E470D0A1A0A0000000D58585858" +
      "00000025" + "00000015" + "0806000000")
    val got = dims(Seq(gifZeroW, pngBadIhdr))
    assert(got(0) === ((Some("gif"), None, Some(21L), Some(0L))))
    assert(got(1) === ((Some("png"), None, None, Some(0L))))
  }

  test("JPEG and text route out: NULL fmt, NULL everything") {
    val jpeg = hexBytes("FFD8FFE000104A464946")
    val txt = "TXT:hello".getBytes("UTF-8")
    assert(dims(Seq(jpeg, txt)) === Seq((None, None, None, None),
      (None, None, None, None)))
  }

  test("resolutionAudit rollup: per-format mass, small screen, decoys") {
    val rows = Seq(
      encode(600, 600, "png"), encode(600, 100, "png"), // one small
      encode(37, 21, "gif"),                            // small
      encode(640, 520, "bmp"),
      "plain text".getBytes("UTF-8"))
    val got = ImageHeaders.resolutionAudit(
        rows.zipWithIndex.map { case (b, i) => (i.toLong, b) }
          .toDF("id", "content"), "content", 512L)
      .orderBy(col("fmt")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("bmp", 1L, 640L, 0L),
      ("gif", 1L, 37L, 1L),
      ("other", 1L, -1L, 0L),
      ("png", 2L, 1200L, 1L)))
  }

  test("reserved output names guard") {
    val df = Seq((1L, Array[Byte](1), 2L)).toDF("id", "content", "width")
    intercept[IllegalArgumentException] {
      ImageHeaders.withDims(df, "content")
    }
  }

  // ---- JPEG SOF walk (r14, L161) -----------------------------------

  test("jpeg: REAL ImageIO round-trip at asymmetric dims") {
    assert(ImageHeaders.jpegDims(encode(37, 21, "jpg"))
      === Some((37L, 21L)))
  }

  test("jpeg: SOF behind variable-length APP0/COM, fill FFs, DHT skip") {
    // SOI, APP0(len 8: 6 zeros), COM(len 4: 'AB'), a DHT (C4 — a
    // table marker in SOF's range that must be SKIPPED), two fill
    // FFs, then SOF0 h=300 (012C) w=513 (0201)
    val b = hexBytes("FFD8" + "FFE00008" + "000000000000" +
      "FFFE0004" + "4142" + "FFC40005" + "010203" +
      "FFFF" + "FFC0000B08" + "012C" + "0201" + "03" + "FFD9")
    assert(ImageHeaders.jpegDims(b) === Some((513L, 300L)))
  }

  test("jpeg: standalone RST/TEM markers advance without a length") {
    val b = hexBytes("FFD8" + "FF01" + "FFD0" +
      "FFC2000B08" + "0015" + "0025" + "03" + "FFD9") // SOF2 counts
    assert(ImageHeaders.jpegDims(b) === Some((37L, 21L)))
  }

  test("jpeg violation conventions: None, never garbage") {
    // SOS before SOF; EOI before SOF; no SOI; zero width; truncated
    // SOF; a non-FF where a marker must start; segment length < 2
    val cases = Seq(
      "FFD8" + "FFDA0008010101" + "FFC0000B0800150025" + "03",
      "FFD8" + "FFD9",
      "00D8" + "FFC0000B08001500250300",
      "FFD8" + "FFC0000B08" + "0015" + "0000" + "03",
      "FFD8" + "FFC0000B08" + "0015",
      "FFD8" + "00C0000B08001500250300",
      "FFD8" + "FFE00001")
    for (c <- cases)
      assert(ImageHeaders.jpegDims(hexBytes(c)) === None, c)
  }

  test("jpegDimsOf: router keeps non-jpeg rows out of the kernel") {
    val rows = Seq(
      (0L, encode(37, 21, "jpg")),
      (1L, encode(37, 21, "png")),
      (2L, hexBytes("FFD8FFD9"))) // jpeg magic, violated structure
    val got = ImageHeaders.jpegDimsOf(rows.toDF("id", "content"),
        "id", "content")
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toSeq
    assert(got === Seq((0L, Some(37L)), (2L, None)))
  }
}
