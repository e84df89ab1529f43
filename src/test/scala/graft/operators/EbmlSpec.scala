package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ebml VINT-walk pins — hand-assembled elements (the JDK ships no
  * Matroska muxer, so hand-built fixtures following RFC 8794's
  * published VINT ladder are the strongest available gate), plus the
  * construction pin tying [[Ebml.syntheticWebm]]'s byte layout to the
  * q_m15 oracle's formula replay. */
class EbmlSpec extends SparkSpec {

  // ---- byte-level fixture builders ---------------------------------

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be64(v: Long): Array[Byte] =
    be32(v >>> 32) ++ be32(v & 0xffffffffL)

  private def id(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  private val IdEbml = id(0x1A, 0x45, 0xDF, 0xA3)
  private val IdDocType = id(0x42, 0x82)
  private val IdSegment = id(0x18, 0x53, 0x80, 0x67)
  private val IdInfo = id(0x15, 0x49, 0xA9, 0x66)
  private val IdTScale = id(0x2A, 0xD7, 0xB1)
  private val IdDuration = id(0x44, 0x89)
  private val IdTracks = id(0x16, 0x54, 0xAE, 0x6B)
  private val IdTrackEntry = id(0xAE)
  private val IdTrackType = id(0x83)
  private val IdCodec = id(0x86)
  private val IdVoid = id(0xEC)

  /** Element with a one-byte size VINT. */
  private def el(eid: Array[Byte], payload: Array[Byte]): Array[Byte] =
    cat(eid, Array((0x80 | payload.length).toByte), payload)

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def ebmlHdr(docType: String): Array[Byte] =
    el(IdEbml, el(IdDocType, ascii(docType)))

  private def infoEl(ts: Option[Long], dur: Option[Array[Byte]])
      : Array[Byte] =
    el(IdInfo, cat(
      ts.map(t => el(IdTScale, be32(t))).getOrElse(Array.emptyByteArray),
      dur.map(d => el(IdDuration, d)).getOrElse(Array.emptyByteArray)))

  private def dur64(d: Double): Array[Byte] =
    be64(java.lang.Double.doubleToLongBits(d))

  private def dur32(f: Float): Array[Byte] =
    be32(java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL)

  private def trackEntry(codec: String, typ: Int): Array[Byte] =
    el(IdTrackEntry, cat(el(IdTrackType, Array(typ.toByte)),
      el(IdCodec, ascii(codec))))

  private def tracksEl(entries: Array[Byte]*): Array[Byte] =
    el(IdTracks, cat(entries: _*))

  private def segment(payload: Array[Byte]*): Array[Byte] =
    el(IdSegment, cat(payload: _*))

  private def webm(docType: String, ts: Long, dur: Double,
      codecs: (String, Int)*): Array[Byte] =
    cat(ebmlHdr(docType),
      segment(infoEl(Some(ts), Some(dur64(dur))),
        tracksEl(codecs.map { case (c, t) => trackEntry(c, t) }: _*)))

  private def parse(b: Array[Byte]) = Ebml.parseWebm(b)

  // ---- walk semantics ------------------------------------------------

  test("hand-assembled webm parses to its exact parameters") {
    val m = parse(webm("webm", 1000000L, 4321.0,
      ("V_VP9", 1), ("A_OPUS", 2))).get
    assert(m.docType === "webm")
    assert(m.timescaleNs === 1000000L)
    assert(m.durationTicks === Some(4321.0))
    assert(m.nTracks === 2)
    assert(m.codecs === Seq("V_VP9", "A_OPUS"))
  }

  test("TimestampScale absent falls back to the spec default 1e6 ns") {
    val b = cat(ebmlHdr("matroska"),
      segment(infoEl(None, Some(dur64(100.0))),
        tracksEl(trackEntry("V_AV1", 1))))
    val m = parse(b).get
    assert(m.timescaleNs === Ebml.DefaultTimescaleNs)
  }

  test("4-byte float Duration leg reads exactly; missing Duration is " +
      "None, not a violation") {
    val f = cat(ebmlHdr("webm"),
      segment(el(IdInfo, cat(el(IdTScale, be32(1000000L)),
        el(IdDuration, dur32(2048.0f))))))
    assert(parse(f).get.durationTicks === Some(2048.0))
    val none = cat(ebmlHdr("webm"),
      segment(infoEl(Some(1000000L), None)))
    val m = parse(none).get
    assert(m.durationTicks === None && m.docType === "webm")
  }

  test("Void and unknown elements are skipped by size arithmetic") {
    val unknownTag = cat(id(0x12, 0x54, 0xC3, 0x67), // Chapters-class id
      Array(0x82.toByte), Array[Byte](9, 9))
    val b = cat(ebmlHdr("webm"),
      el(IdVoid, new Array[Byte](5)),
      segment(unknownTag, infoEl(Some(750000L), Some(dur64(3000.0))),
        el(IdVoid, Array.emptyByteArray),
        tracksEl(trackEntry("A_OPUS", 2))))
    val m = parse(b).get
    assert(m.timescaleNs === 750000L && m.codecs === Seq("A_OPUS"))
  }

  test("multi-byte size VINT strips its marker bits") {
    // DocType with a 2-byte size (0x40 0x04): same 4-byte payload
    val dt = cat(IdDocType, Array(0x40.toByte, 0x04.toByte),
      ascii("webm"))
    val hdr = cat(IdEbml, Array((0x80 | dt.length).toByte), dt)
    assert(parse(cat(hdr, segment())).get.docType === "webm")
  }

  test("trailing NUL padding strips from string payloads (spec padding)") {
    val dt = el(IdDocType, cat(ascii("webm"), Array[Byte](0, 0)))
    val hdr = cat(IdEbml, Array((0x80 | dt.length).toByte), dt)
    assert(parse(hdr).get.docType === "webm")
  }

  test("structural violations parse to None, never throw") {
    val good = webm("webm", 1000000L, 100.0, ("V_VP9", 1))
    assert(parse(good).isDefined)
    // truncated mid-header
    assert(parse(good.take(6)) === None)
    // zero first VINT byte
    assert(parse(cat(Array[Byte](0, 0), good)) === None)
    // ID longer than 4 bytes (first byte 0x08 ⇒ 5-byte VINT)
    assert(parse(cat(Array(0x08.toByte), good)) === None)
    // unknown-size element (all data bits set)
    assert(parse(cat(IdEbml, Array(0xFF.toByte), good)) === None)
    // element overruns its parent: inner claims more than remains
    val overrun = cat(IdEbml, Array(0x85.toByte),
      cat(IdDocType, Array(0x90.toByte), ascii("web")))
    assert(parse(overrun) === None)
    // Duration that is neither 4 nor 8 bytes
    val badDur = cat(ebmlHdr("webm"),
      segment(el(IdInfo, el(IdDuration, Array[Byte](1, 2, 3)))))
    assert(parse(badDur) === None)
    // a second Info
    val dup = cat(ebmlHdr("webm"),
      segment(infoEl(Some(1000000L), None), infoEl(Some(2L), None)))
    assert(parse(dup) === None)
    // no EBML header / DocType at all
    assert(parse(segment(infoEl(Some(1L), None))) === None)
  }

  test("element-bomb recursion is depth-bounded, not a stack overflow") {
    val bomb = (1 to 12).foldLeft(ascii("x")) {
      case (inner, _) => el(IdTrackEntry, inner)
    }
    assert(parse(cat(ebmlHdr("webm"), segment(tracksEl(bomb)))) === None)
  }

  // ---- metadata frame -------------------------------------------------

  test("metadata(): parseable and corrupt blobs in one frame; " +
      "duration_ms truncates the double product") {
    import spark.implicits._
    val rows = Seq(
      (1L, webm("webm", 750000L, 3333.0, ("V_VP9", 1), ("A_OPUS", 2))),
      (2L, webm("webm", 750000L, 100.0, ("V_AV1", 1)).take(6)),
      (3L, cat(ebmlHdr("matroska"), segment(infoEl(Some(0L),
        Some(dur64(5.0))), tracksEl(trackEntry("V_VP9", 1))))))
    val got = Ebml.metadata(rows.toDF("doc_id", "content"),
        "doc_id", "content")
      .orderBy(col("doc_id")).collect()
    val r1 = got(0)
    assert(r1.getString(1) === "webm" && r1.getLong(2) === 750000L)
    assert(r1.getLong(3) === 2L && r1.getString(4) === "V_VP9,A_OPUS")
    // 3333 · 750000 / 1e6 = 2499.75 → 2499 (truncation toward zero)
    assert(r1.getLong(5) === 2499L)
    assert(got(1).isNullAt(1) && got(1).isNullAt(5), "corrupt ⇒ NULL row")
    // timescale 0 is spec-illegal: metadata survives, duration_ms NULL
    assert(got(2).getLong(2) === 0L && got(2).isNullAt(5))
  }

  // ---- construction pin (ties q_m15's oracle formulas to real bytes) --

  test("syntheticWebm byte layout equals the hand-assembled reference") {
    import spark.implicits._
    // id 7: docType matroska (7%2), void pad 7, ts 1250000 (idx 3),
    // dur 2000 ticks (idx 0), 2 tracks (1+7%3), phase (7 DIV 3)%3 = 2
    // → codecs V_AV1, V_VP9
    val byHand = cat(ebmlHdr("matroska"),
      el(IdVoid, new Array[Byte](7)),
      segment(infoEl(Some(1250000L), Some(dur64(2000.0))),
        tracksEl(trackEntry("V_AV1", 1), trackEntry("V_VP9", 1))))
    val got = Seq(7L).toDF("doc_id")
      .select(Ebml.syntheticWebm(col("doc_id"))).collect()
      .head.getAs[Array[Byte]](0)
    assert(got.toSeq === byHand.toSeq)
  }

  test("syntheticWebm bytes sniff as video/webm (router and walk agree)") {
    import spark.implicits._
    val got = Seq(1L, 2L).toDF("doc_id")
      .select(Multimodal.sniffType(
        Ebml.syntheticWebm(col("doc_id")))).collect().map(_.getString(0))
    assert(got.toSeq === Seq("video/webm", "video/webm"))
    // the EBML magic anywhere past offset 0 must NOT sniff webm
    val miss = Seq(cat(Array[Byte](0), IdEbml))
      .toDF("b").select(Multimodal.sniffType(col("b")))
      .collect().head.getString(0)
    assert(miss === "application/octet-stream")
  }

  test("syntheticWebm round-trips through the parser for a spread of ids") {
    import spark.implicits._
    val ids = (0L to 35L).toSeq
    val got = Ebml.metadata(
        ids.toDF("doc_id").select(col("doc_id"),
          Ebml.syntheticWebm(col("doc_id")).as("content")),
        "doc_id", "content")
      .orderBy(col("doc_id")).collect()
    for ((r, i) <- got.zip(ids)) {
      assert(r.getString(1) === (if (i % 2 == 0) "webm" else "matroska"))
      val ts = Ebml.TimescaleValues((i % 4).toInt)
      val dur = Ebml.DurationValues((i % 7).toInt)
      assert(r.getLong(2) === ts)
      assert(r.getLong(3) === 1L + i % 3L)
      val codecs = (0L until (1L + i % 3L)).map(k =>
        Ebml.CodecAlphabet(((i / 3 + k) % 3).toInt))
      assert(r.getString(4) === codecs.mkString(","))
      // the oracle's integer '//' equals the engine's double trunc
      assert(r.getLong(5) === dur * ts / 1000000L)
    }
  }
}
