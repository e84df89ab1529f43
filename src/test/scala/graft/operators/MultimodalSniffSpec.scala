package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPOutputStream, ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Magic-byte media-type sniff (r13, L145). The load-bearing pins are
  * against REAL encoder output — the sniffer must agree with what the
  * JDK's own encoders (and the r12/r13 real decoders' input formats)
  * actually emit — plus literal-magic cases for formats without a JDK
  * encoder, prefix-collision ordering, and the audit rollup. */
class MultimodalSniffSpec extends SparkSpec {
  import spark.implicits._

  private def sniff(bytes: Array[Byte]): Option[String] = {
    val r = Seq(Tuple1(bytes)).toDF("content")
      .select(Multimodal.sniffType(col("content"))).collect().head
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  private def pngBytes: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(3, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes: Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = Array[Byte](0, 0, 1, 0, 2, 0)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 3L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real encoder output sniffs to its own type") {
    assert(sniff(pngBytes) === Some("image/png"))
    assert(sniff(wavBytes) === Some("audio/wav"))
    val gz = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(gz); g.write("payload".getBytes); g.close()
    assert(sniff(gz.toByteArray) === Some("application/gzip"))
    val zip = new ByteArrayOutputStream()
    val z = new ZipOutputStream(zip)
    z.putNextEntry(new ZipEntry("a.txt")); z.write(7); z.closeEntry()
    z.close()
    assert(sniff(zip.toByteArray) === Some("application/zip"))
    val bmp = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB), "bmp", bmp)
    assert(sniff(bmp.toByteArray) === Some("image/bmp"))
  }

  test("literal magics for formats without a JDK encoder") {
    assert(sniff("%PDF-1.4 stuff".getBytes) === Some("application/pdf"))
    assert(sniff("GIF89a0123".getBytes) === Some("image/gif"))
    assert(sniff("GIF87a0123".getBytes) === Some("image/gif"))
    assert(sniff(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
      0xE1.toByte, 1, 2)) === Some("image/jpeg"))
  }

  test("RIFF without WAVE is NOT audio/wav; BM prose is bmp by rule") {
    // RIFF container holding something else (AVI) — the 4-byte check
    // at offset 9 must reject it -> falls through to octet-stream
    assert(sniff("RIFF0000AVI LIST".getBytes) ===
      Some("application/octet-stream"))
    // the documented false-positive class: a 2-byte magic is weak —
    // text that happens to start 'BM' sniffs bmp; the rule set trades
    // this for catching headerless BMPs, stated in the scaladoc chain
    assert(sniff("BMW motors".getBytes) === Some("image/bmp"))
  }

  test("plain text, null and empty") {
    assert(sniff("key agg row scan".getBytes) ===
      Some("application/octet-stream"))
    assert(sniff(Array.empty[Byte]) === None)
    assert(sniff(null) === None)
  }

  test("audit rollup counts pairs and flags mismatches") {
    val rows = Seq(
      ("image/png", pngBytes), ("image/png", pngBytes),
      ("image/png", "plain".getBytes), ("audio/wav", wavBytes))
    val got = Multimodal.declaredMismatch(
        rows.toDF("declared", "content"), "declared")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("image/png", "image/png")) === ((2L, 0L)))
    assert(got(("image/png", "application/octet-stream")) === ((1L, 1L)))
    assert(got(("audio/wav", "audio/wav")) === ((1L, 0L)))
  }
}
