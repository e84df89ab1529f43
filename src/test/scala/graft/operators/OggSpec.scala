package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ogg page-walk pins — hand-assembled pages following RFC 3533's
  * published header layout (the JDK ships no Ogg muxer), plus the
  * construction pin tying [[Ogg.syntheticOgg]]'s byte layout to the
  * q_m16 oracle's formula replay. */
class OggSpec extends SparkSpec {

  // ---- byte-level fixture builders ---------------------------------

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  private def le16(x: Long): Array[Byte] =
    Array((x & 0xff).toByte, ((x >> 8) & 0xff).toByte)

  private def le32(x: Long): Array[Byte] = le16(x) ++ le16(x >> 16)

  private def le64(x: Long): Array[Byte] =
    le32(x & 0xffffffffL) ++ le32(x >>> 32)

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Page with an arbitrary lacing split of one payload. Serial and
    * seq default to [[Ogg.syntheticOgg]]'s constants so the
    * construction pin compares byte-exactly. */
  private def page(headerType: Int, granule: Long,
      segments: Seq[Array[Byte]], version: Int = 0,
      magic: String = "OggS", seq: Long = 0L): Array[Byte] =
    cat(ascii(magic), Array(version.toByte, headerType.toByte),
      le64(granule), le32(0x47524654L), le32(seq), le32(0L),
      Array(segments.size.toByte),
      segments.map(s => s.length.toByte).toArray,
      cat(segments: _*))

  private def opusHead(ch: Int, preSkip: Long, rate: Long): Array[Byte] =
    cat(ascii("OpusHead"), Array(1.toByte, ch.toByte), le16(preSkip),
      le32(rate), le16(0L), Array(0.toByte))

  private def vorbisId(ch: Int, rate: Long): Array[Byte] =
    cat(Array(1.toByte), ascii("vorbis"), le32(0L), Array(ch.toByte),
      le32(rate), new Array[Byte](12), Array(0xB8.toByte),
      Array(1.toByte))

  private def parse(b: Array[Byte]) = Ogg.parseOgg(b)

  // ---- walk semantics ------------------------------------------------

  test("hand-assembled Opus stream parses to its exact parameters") {
    val b = cat(page(0x02, 0L, Seq(opusHead(2, 312L, 44100L))),
      page(0x00, -1L, Seq(new Array[Byte](5))),
      page(0x04, 96000L, Seq(new Array[Byte](3))))
    val m = parse(b).get
    assert(m.codec === "opus" && m.channels === 2)
    assert(m.sampleRate === 44100L && m.preSkip === 312L)
    assert(m.lastGranule === Some(96000L) && m.nPages === 3)
  }

  test("hand-assembled Vorbis stream parses; granule clock = stream rate") {
    val m = parse(cat(page(0x02, 0L, Seq(vorbisId(1, 16000L))),
      page(0x04, 32000L, Seq(new Array[Byte](4))))).get
    assert(m.codec === "vorbis" && m.channels === 1)
    assert(m.sampleRate === 16000L && m.lastGranule === Some(32000L))
  }

  test("granule -1 pages (no finished packet) never set the duration") {
    val m = parse(cat(page(0x02, 0L, Seq(opusHead(1, 0L, 48000L))),
      page(0x04, -1L, Seq(new Array[Byte](2))))).get
    assert(m.lastGranule === None)
  }

  test("multi-segment lacing sums skip the page exactly") {
    val b = cat(page(0x02, 0L, Seq(opusHead(1, 0L, 8000L))),
      page(0x00, 4800L, Seq(new Array[Byte](7), new Array[Byte](11),
        new Array[Byte](3))),
      page(0x04, 9600L, Seq(new Array[Byte](1))))
    val m = parse(b).get
    assert(m.nPages === 3 && m.lastGranule === Some(9600L))
  }

  test("structural violations parse to None, never throw") {
    val good = cat(page(0x02, 0L, Seq(opusHead(1, 0L, 48000L))),
      page(0x04, 48000L, Seq(new Array[Byte](2))))
    assert(parse(good).isDefined)
    // bad capture pattern
    assert(parse(cat(page(0x02, 0L, Seq(opusHead(1, 0L, 48000L)),
      magic = "OgggS".take(4)))) === None)
    // nonzero stream_structure_version
    assert(parse(page(0x02, 0L, Seq(opusHead(1, 0L, 48000L)),
      version = 1)) === None)
    // truncated header / segment table / payload
    assert(parse(good.take(20)) === None)
    assert(parse(good.take(30)) === None)
    // first page not BOS
    assert(parse(page(0x00, 0L, Seq(opusHead(1, 0L, 48000L)))) === None)
    // unrecognized BOS packet
    assert(parse(page(0x02, 0L, Seq(ascii("NotACodecHeaderAtAll1234"))))
      === None)
    // Vorbis rate 0 is spec-illegal
    assert(parse(page(0x02, 0L, Seq(vorbisId(1, 0L)))) === None)
  }

  // ---- metadata frame -------------------------------------------------

  test("metadata(): the Opus 48kHz-net-of-preskip and Vorbis rate " +
      "clocks; corrupt blobs NULL") {
    import spark.implicits._
    val rows = Seq(
      // opus: (96000 − 312)·1000/48000 = 1993.5 → 1993
      (1L, cat(page(0x02, 0L, Seq(opusHead(2, 312L, 8000L))),
        page(0x04, 96000L, Seq(new Array[Byte](2))))),
      // vorbis at 44100: 44100·1000/44100 = 1000
      (2L, cat(page(0x02, 0L, Seq(vorbisId(1, 44100L))),
        page(0x04, 44100L, Seq(new Array[Byte](2))))),
      (3L, ascii("OggS but truncated")))
    val got = Ogg.metadata(rows.toDF("doc_id", "content"),
        "doc_id", "content")
      .orderBy(col("doc_id")).collect()
    assert(got(0).getString(1) === "opus" &&
      got(0).getLong(4) === 1993L)
    assert(got(1).getString(1) === "vorbis" &&
      got(1).getLong(4) === 1000L)
    assert(got(2).isNullAt(1) && got(2).isNullAt(4))
  }

  // ---- construction pin (ties q_m16's oracle formulas to real bytes) --

  test("syntheticOgg byte layout equals the hand-assembled reference") {
    import spark.implicits._
    // id 13: vorbis (13%2=1), channels 1+(13 DIV 2)%2 = 1+0 = 1,
    // rate idx (13 DIV 4)%4 = 3 → 48000, granule idx (13 DIV 80)%7
    // = 0 → 19200
    val byHand = cat(page(0x02, 0L, Seq(vorbisId(1, 48000L))),
      page(0x04, 19200L, Seq(new Array[Byte](10)), seq = 1L))
    val got = Seq(13L).toDF("doc_id")
      .select(Ogg.syntheticOgg(col("doc_id"))).collect()
      .head.getAs[Array[Byte]](0)
    assert(got.toSeq === byHand.toSeq)
    // id 102: opus (102%2=0), channels 1+(51%2) = 2, rate idx
    // (25)%4 = 1 → 16000, preskip idx (6)%5 = 1 → 336, granule idx
    // (1)%7 = 1 → 38400
    val byHand2 = cat(page(0x02, 0L, Seq(opusHead(2, 336L, 16000L))),
      page(0x04, 38400L, Seq(new Array[Byte](10)), seq = 1L))
    val got2 = Seq(102L).toDF("doc_id")
      .select(Ogg.syntheticOgg(col("doc_id"))).collect()
      .head.getAs[Array[Byte]](0)
    assert(got2.toSeq === byHand2.toSeq)
  }

  test("syntheticOgg bytes sniff as audio/ogg (router and walk agree)") {
    import spark.implicits._
    val got = Seq(1L, 2L).toDF("doc_id")
      .select(Multimodal.sniffType(
        Ogg.syntheticOgg(col("doc_id")))).collect().map(_.getString(0))
    assert(got.toSeq === Seq("audio/ogg", "audio/ogg"))
    // the capture pattern past offset 0 must NOT sniff ogg
    val miss = Seq(cat(Array[Byte](0), ascii("OggS")))
      .toDF("b").select(Multimodal.sniffType(col("b")))
      .collect().head.getString(0)
    assert(miss === "application/octet-stream")
  }

  test("syntheticOgg round-trips through the parser for a spread of ids") {
    import spark.implicits._
    val ids = (0L to 199L).toSeq
    val got = Ogg.metadata(
        ids.toDF("doc_id").select(col("doc_id"),
          Ogg.syntheticOgg(col("doc_id")).as("content")),
        "doc_id", "content")
      .orderBy(col("doc_id")).collect()
    for ((r, i) <- got.zip(ids)) {
      val codec = if (i % 2 == 0) "opus" else "vorbis"
      val rate = Ogg.RateValues(((i / 4) % 4).toInt)
      val g = Ogg.GranuleValues(((i / 80) % 7).toInt)
      assert(r.getString(1) === codec)
      assert(r.getLong(2) === 1L + (i / 2) % 2)
      assert(r.getLong(3) === rate)
      val wantDur =
        if (codec == "opus")
          (g - Ogg.PreSkipValues(((i / 16) % 5).toInt)) * 1000L / 48000L
        else g * 1000L / rate
      assert(r.getLong(4) === wantDur, s"id $i")
      assert(r.getLong(5) === 2L)
    }
  }
}
