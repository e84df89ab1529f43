package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IsoBmff box-walk pins — hand-assembled boxes (the JDK ships no MP4
  * muxer, so hand-built fixtures are the strongest available gate; the
  * layout follows ISO/IEC 14496-12's published size+fourcc ladder),
  * plus the construction pin tying [[IsoBmff.syntheticMp4]]'s byte
  * layout to the q_m9 oracle's formula replay. */
class IsoBmffSpec extends SparkSpec {

  // ---- byte-level fixture builders ---------------------------------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be64(v: Long): Array[Byte] =
    be32(v >>> 32) ++ be32(v & 0xffffffffL)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  private def ftyp(brand: String): Array[Byte] =
    box("ftyp", cat(brand.getBytes("US-ASCII"), be32(0),
      "isommp41".getBytes("US-ASCII")))

  private def mvhdV0(ts: Long, dur: Long): Array[Byte] =
    box("mvhd", cat(Array[Byte](0, 0, 0, 0), new Array[Byte](8),
      be32(ts), be32(dur), new Array[Byte](80)))

  private def mvhdV1(ts: Long, dur: Long): Array[Byte] =
    box("mvhd", cat(Array[Byte](1, 0, 0, 0), new Array[Byte](16),
      be32(ts), be64(dur), new Array[Byte](80)))

  private def stsdEntry(codec: String): Array[Byte] =
    box(codec, new Array[Byte](8)) // 6 reserved + 2 data-ref-index

  private def trak(codecs: String*): Array[Byte] = {
    val entries = cat(codecs.map(stsdEntry): _*)
    val stsd = box("stsd", cat(Array[Byte](0, 0, 0, 0),
      be32(codecs.length), entries))
    box("trak", cat(box("tkhd", new Array[Byte](84)), // must be SKIPPED
      box("mdia", box("minf", box("stbl", stsd)))))
  }

  private def mp4(brand: String, mvhd: Array[Byte],
      traks: Array[Byte]*): Array[Byte] =
    cat(ftyp(brand), box("moov", cat((mvhd +: traks): _*)))

  // ---- parse pins ---------------------------------------------------

  test("hand-assembled v0 file parses to its exact parameters") {
    val b = mp4("isom", mvhdV0(600, 4200), trak("avc1"), trak("mp4a"))
    val m = IsoBmff.parseMp4(b).get
    assert(m.majorBrand === "isom")
    assert(m.timescale === 600L)
    assert(m.duration === 4200L)
    assert(m.nTracks === 2)
    assert(m.codecs === Seq("avc1", "mp4a"))
  }

  test("mvhd v1 carries a 64-bit duration past the 32-bit line") {
    val dur = 0x1_2345_6789L // > 2^32: v0 could not represent it
    val m = IsoBmff.parseMp4(mp4("mp42", mvhdV1(1000, dur))).get
    assert(m.duration === dur)
    assert(m.timescale === 1000L)
    assert(m.nTracks === 0)
  }

  test("free / uuid / mdat boxes are skipped by size arithmetic") {
    val noise = cat(box("free", new Array[Byte](11)),
      box("uuid", new Array[Byte](20)))
    val b = cat(ftyp("isom"), noise,
      box("moov", cat(mvhdV0(600, 60), trak("hev1"))),
      box("mdat", Array[Byte](1, 2, 3)))
    val m = IsoBmff.parseMp4(b).get
    assert(m.codecs === Seq("hev1") && m.nTracks === 1)
  }

  test("64-bit largesize box header (size == 1) walks correctly") {
    val payload = new Array[Byte](5)
    val large = cat(be32(1), "free".getBytes("US-ASCII"),
      be64(16L + payload.length), payload)
    val b = cat(ftyp("isom"), large, box("moov", mvhdV0(700, 70)))
    assert(IsoBmff.parseMp4(b).get.timescale === 700L)
  }

  test("size == 0 (to EOF) is legal only as the last top-level box") {
    val tail = cat(be32(0), "mdat".getBytes("US-ASCII"),
      Array[Byte](9, 9, 9))
    val ok = cat(mp4("isom", mvhdV0(600, 60)), tail)
    assert(IsoBmff.parseMp4(ok).get.duration === 60L)
    // the same escape INSIDE a container is a structural violation
    val badInner = cat(ftyp("isom"),
      box("moov", cat(mvhdV0(600, 60),
        be32(0), "free".getBytes("US-ASCII"))))
    assert(IsoBmff.parseMp4(badInner).isEmpty)
  }

  test("multi-entry stsd collects every sample-entry fourcc") {
    val m = IsoBmff.parseMp4(
      mp4("isom", mvhdV0(600, 60), trak("avc1", "mp4a"))).get
    assert(m.codecs === Seq("avc1", "mp4a") && m.nTracks === 1)
  }

  test("structural violations parse to None, never throw") {
    val good = mp4("isom", mvhdV0(600, 60), trak("avc1"))
    assert(IsoBmff.parseMp4(null).isEmpty)
    assert(IsoBmff.parseMp4(Array[Byte](0, 0)).isEmpty)
    assert(IsoBmff.parseMp4(good.take(good.length - 3)).isEmpty,
      "truncated mid-box")
    assert(IsoBmff.parseMp4(good.take(11)).isEmpty, "truncated header")
    // box claiming to overrun its parent
    val overrun = cat(ftyp("isom"),
      box("moov", cat(be32(9999), "mvhd".getBytes("US-ASCII"))))
    assert(IsoBmff.parseMp4(overrun).isEmpty)
    // size < 8 without the 0/1 escapes
    val tiny = cat(ftyp("isom"), be32(5), "free".getBytes("US-ASCII"))
    assert(IsoBmff.parseMp4(tiny).isEmpty)
    // duplicate mvhd
    val dup = mp4("isom", cat(mvhdV0(600, 60), mvhdV0(700, 70)))
    assert(IsoBmff.parseMp4(dup).isEmpty)
    // missing ftyp / missing mvhd
    assert(IsoBmff.parseMp4(box("moov", mvhdV0(600, 60))).isEmpty)
    assert(IsoBmff.parseMp4(cat(ftyp("isom"),
      box("moov", trak("avc1")))).isEmpty)
    // mvhd shorter than its version demands
    val shortMvhd = cat(ftyp("isom"),
      box("moov", box("mvhd", Array[Byte](0, 0, 0, 0))))
    assert(IsoBmff.parseMp4(shortMvhd).isEmpty)
    // unknown mvhd version
    val badVer = cat(ftyp("isom"), box("moov",
      box("mvhd", cat(Array[Byte](7, 0, 0, 0), new Array[Byte](96)))))
    assert(IsoBmff.parseMp4(badVer).isEmpty)
  }

  test("container-bomb recursion is depth-bounded, not a stack overflow") {
    // moov nested in itself far past MaxDepth
    var b = mvhdV0(600, 60)
    for (_ <- 1 to 40) b = box("moov", b)
    b = cat(ftyp("isom"), b)
    assert(IsoBmff.parseMp4(b).isEmpty)
  }

  // ---- metadata() frame ---------------------------------------------

  test("metadata(): parseable and corrupt blobs in one frame") {
    import spark.implicits._
    val good = mp4("mp42", mvhdV1(800, 2400), trak("avc1"), trak("mp4a"),
      trak("hev1"))
    val df = Seq((1L, good), (2L, "not an mp4 at all".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val got = IsoBmff.metadata(df, "doc_id", "content")
      .orderBy(col("doc_id")).collect()
    assert(got(0).getString(1) === "mp42")
    assert(got(0).getLong(2) === 800L)
    assert(got(0).getLong(3) === 2400L)
    assert(got(0).getLong(4) === 3L)
    assert(got(0).getString(5) === "avc1,mp4a,hev1")
    assert(got(0).getLong(6) === 3000L, "1000*2400/800")
    assert(got(1).isNullAt(1) && got(1).isNullAt(6),
      "corrupt blob surfaces as NULL metadata, not a drop")
  }

  test("duration_ms truncates toward zero; timescale 0 is NULL not error") {
    import spark.implicits._
    val odd = mp4("isom", mvhdV0(700, 2500)) // 2500*1000/700 = 3571.42…
    val ts0 = mp4("isom", mvhdV0(0, 100))
    val got = IsoBmff.metadata(
        Seq((1L, odd), (2L, ts0)).toDF("doc_id", "content"),
        "doc_id", "content")
      .orderBy(col("doc_id")).collect()
    assert(got(0).getLong(6) === 3571L)
    assert(got(1).isNullAt(6) && got(1).getLong(2) === 0L)
  }

  test("idCol colliding with an output name is guarded (Reserved)") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](0))).toDF("codecs", "content")
    val e = intercept[IllegalArgumentException] {
      IsoBmff.metadata(df, "codecs", "content")
    }
    assert(e.getMessage.contains("reserves column name"))
  }

  // ---- construction pin (ties q_m9's oracle formulas to real bytes) --

  test("syntheticMp4 byte layout equals the hand-assembled reference") {
    import spark.implicits._
    // id 7: brand mp42 (7%2=1), mvhd v1 ((7 DIV 2)%2=1), ts 800
    // (600+2*100), dur 1259 (1000+259), 2 traks (1+7%3), free pay 7,
    // codecs (7 DIV 3 + i)%3 = 2,0 → hev1, avc1
    val byHand = cat(ftyp("mp42"),
      box("free", new Array[Byte](7)),
      box("moov", cat(mvhdV1(800, 1259), trak("hev1"), trak("avc1"))))
    val got = Seq(7L).toDF("doc_id")
      .select(IsoBmff.syntheticMp4(col("doc_id"))).collect()
      .head.getAs[Array[Byte]](0)
    assert(got.toSeq === byHand.toSeq)
  }

  test("syntheticMp4 bytes sniff as video/mp4 (router and walk agree)") {
    // the L145 integration: the r14 ftyp rule must route exactly the
    // blobs the L149 walk parses — and not misroute near-misses
    import spark.implicits._
    val got = Seq(1L, 2L).toDF("doc_id")
      .select(Multimodal.sniffType(
        IsoBmff.syntheticMp4(col("doc_id")))).collect().map(_.getString(0))
    assert(got.toSeq === Seq("video/mp4", "video/mp4"))
    // 'ftyp' anywhere else (offset 0) must NOT sniff mp4
    val miss = Seq("ftypisom".getBytes("US-ASCII")).toDF("b")
      .select(Multimodal.sniffType(col("b"))).collect().head.getString(0)
    assert(miss === "application/octet-stream")
  }

  test("syntheticMp4 round-trips through the parser for a spread of ids") {
    // the q_m9 contract in miniature: parse(build(id)) recovers the
    // generator formulas for ids covering every (brand, version,
    // n_tracks, codec-phase) combination
    import spark.implicits._
    val ids = (0L to 35L).toSeq
    val got = IsoBmff.metadata(
        ids.toDF("doc_id").select(col("doc_id"),
          IsoBmff.syntheticMp4(col("doc_id")).as("content")),
        "doc_id", "content")
      .orderBy(col("doc_id")).collect()
    for ((r, id) <- got.zip(ids)) {
      assert(r.getString(1) === (if (id % 2 == 0) "isom" else "mp42"))
      assert(r.getLong(2) === 600L + (id % 5) * 100L)
      assert(r.getLong(3) === 1000L + (id * 37L) % 9000L)
      assert(r.getLong(4) === 1L + id % 3L)
      val codecs = (0L until (1L + id % 3L)).map(i =>
        Seq("avc1", "mp4a", "hev1")(((id / 3 + i) % 3).toInt))
      assert(r.getString(5) === codecs.mkString(","))
      assert(r.getLong(6) ===
        1000L * r.getLong(3) / r.getLong(2), s"id $id duration_ms")
    }
  }
}
