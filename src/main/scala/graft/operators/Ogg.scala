package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ogg container-METADATA parser with Opus/Vorbis identification
  * headers (r16, L194; RFC 3533 Ogg framing, RFC 7845 §5.1 OpusHead,
  * the public Vorbis I spec §4.2.2 — the audio-container closure
  * beside L176's MP3/ID3 and L177's WAV: crawl audio is
  * predominantly Ogg/Opus, and everything a curation pass needs
  * SHORT of decode sits in the first page's codec ID header plus the
  * last page's granule position. Decode stays the documented
  * JDK-decoder-absent boundary — the JDK ships no Opus/Vorbis
  * decoder.)
  *
  * Format walked (all integers LITTLE-endian — the family's BMFF/EBML
  * walks are big-endian, so the byte disciplines are exercised both
  * ways): each page is "OggS"(4) version(1, must be 0)
  * header_type(1) granule(8) serial(4) page_seq(4) crc(4)
  * n_segments(1) segment_table(n) payload(Σ lacing values). The walk:
  *   - first page must be BOS (header_type bit 0x02); its payload
  *     opens the codec ID packet — "OpusHead" (channels @9,
  *     pre-skip @10 LE16, input rate @12 LE32) or 0x01+"vorbis"
  *     (channels @11, rate @12 LE32);
  *   - every page is skipped by segment-sum arithmetic;
  *   - duration comes from the LAST non-BOS page whose granule ≠ −1
  *     (the BOS page's granule positions the header packet, not
  *     audio — its customary 0 must not read as a zero-length
  *     stream):
  *     Opus granules count 48 kHz samples regardless of input rate
  *     (RFC 7845 §4) minus the pre-skip; Vorbis granules count
  *     samples at the stream rate.
  * CRC validation is a stated non-goal (integrity is the transport's
  * problem; this is a structure audit).
  *
  * Robustness contract (the L149/L186 discipline): bad capture
  * pattern, version ≠ 0, truncated header/segment table/payload, a
  * first page without BOS, an unrecognized BOS packet, a zero Vorbis
  * rate — all parse to `None`; the audit surfaces unparseable blobs
  * as NULL metadata rather than dropping them silently or throwing.
  * A stream with no finished packet (all granules −1) emits NULL
  * duration_ms, not a guess.
  *
  * Quantize-once: duration_ms = trunc LONG division —
  * (granule − preSkip)·1000/48000 for Opus, granule·1000/rate for
  * Vorbis — the ONE derived number, both engines truncate toward
  * zero on nonnegative integers.
  *
  * Scale shape: the per-partition kernel class — bounded byte
  * arithmetic per blob, a handful of scalars out, nothing
  * corpus-sized shuffles; a data-dependent page walk is not
  * Catalyst-expressible, so mapPartitions is the justified choice.
  * Page count is bounded by the blob length by construction (every
  * page consumes ≥ 27 bytes — no bomb counter needed). */
object Ogg {

  /** Parsed stream metadata. */
  final case class OggMeta(codec: String, channels: Int,
      sampleRate: Long, preSkip: Long, lastGranule: Option[Long],
      nPages: Int)

  private def le16(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8)

  private def le32(b: Array[Byte], o: Int): Long =
    le16(b, o) | (le16(b, o + 2) << 16)

  private def le64(b: Array[Byte], o: Int): Long =
    le32(b, o) | (le32(b, o + 4) << 32)

  private def ascii(b: Array[Byte], o: Int, n: Int): String =
    new String(b, o, n, "US-ASCII")

  /** Parse one blob. `None` on any structural violation. */
  def parseOgg(bytes: Array[Byte]): Option[OggMeta] = {
    if (bytes == null || bytes.length < 28) return None
    var o = 0
    var first = true
    var codec: String = null
    var channels = 0
    var rate = 0L
    var preSkip = 0L
    var lastGranule: Option[Long] = None
    var nPages = 0
    while (o < bytes.length) {
      if (bytes.length - o < 27) return None // truncated header
      if (ascii(bytes, o, 4) != "OggS") return None
      if (bytes(o + 4) != 0) return None // stream_structure_version
      val headerType = bytes(o + 5) & 0xff
      val granule = le64(bytes, o + 6)
      val nSeg = bytes(o + 26) & 0xff
      if (bytes.length - o < 27 + nSeg) return None
      var payLen = 0
      var i = 0
      while (i < nSeg) { payLen += bytes(o + 27 + i) & 0xff; i += 1 }
      val p = o + 27 + nSeg
      if (bytes.length - p < payLen) return None
      if (first) {
        if ((headerType & 0x02) == 0) return None // BOS required
        if (payLen >= 19 && ascii(bytes, p, 8) == "OpusHead") {
          codec = "opus"
          channels = bytes(p + 9) & 0xff
          preSkip = le16(bytes, p + 10)
          rate = le32(bytes, p + 12)
        } else if (payLen >= 30 && (bytes(p) & 0xff) == 1 &&
            ascii(bytes, p + 1, 6) == "vorbis") {
          codec = "vorbis"
          channels = bytes(p + 11) & 0xff
          rate = le32(bytes, p + 12)
          if (rate == 0L) return None // spec-illegal
        } else return None // unrecognized BOS packet
        first = false
      }
      // the BOS page's granule positions the header packet, not
      // audio — a muxer's customary 0 there must not read as a
      // zero-length stream
      if (nPages > 0 && granule != -1L) lastGranule = Some(granule)
      nPages += 1
      o = p + payLen
    }
    if (codec == null) None
    else Some(OggMeta(codec, channels, rate, preSkip, lastGranule,
      nPages))
  }

  /** Per-doc metadata frame: (idCol, codec, channels, sample_rate,
    * duration_ms, n_pages). Unparseable blobs emit the id with NULL
    * metadata; null ids/blobs drop. duration_ms is the quantize-once
    * division (Opus at the 48 kHz granule clock net of pre-skip,
    * Vorbis at the stream rate); NULL when no granule finished a
    * packet or the Opus net sample count is negative. */
  def metadata(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    Reserved.guard(Seq(idCol), Seq("codec", "channels", "sample_rate",
      "duration_ms", "n_pages"), "Ogg")
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(idCol).isNotNull && col(contentCol).isNotNull)
      .select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseOgg(bytes) match {
            case Some(m) =>
              val dur = m.lastGranule.flatMap { g =>
                if (m.codec == "opus") {
                  val net = g - m.preSkip
                  if (net >= 0L) Some(net * 1000L / 48000L) else None
                } else if (m.sampleRate > 0L)
                  Some(g * 1000L / m.sampleRate)
                else None
              }
              (id, Option(m.codec), Option(m.channels.toLong),
                Option(m.sampleRate), dur, Option(m.nPages.toLong))
            case None =>
              (id, None: Option[String], None: Option[Long],
                None: Option[Long], None: Option[Long],
                None: Option[Long])
          }
        }
      }
      .toDF(idCol, "codec", "channels", "sample_rate", "duration_ms",
        "n_pages")
  }

  // ---- synthetic-blob construction (query/test side) ----------------
  // The r16 constant-segment discipline (the Ebml lesson): every byte
  // that does not depend on the id folds into a literal; enumerable
  // id-dependent segments become element_at lookups.

  private def asciiB(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def catB(parts: Array[Byte]*): Array[Byte] = parts.toArray.flatten

  private def le16B(x: Long): Array[Byte] =
    Array((x & 0xff).toByte, ((x >> 8) & 0xff).toByte)

  private def le32B(x: Long): Array[Byte] = le16B(x) ++ le16B(x >> 16)

  private def le64B(x: Long): Array[Byte] =
    le32B(x & 0xffffffffL) ++ le32B(x >>> 32)

  /** Page header + segment table for a single-segment payload. */
  private def pageB(headerType: Int, granule: Long, seq: Long,
      payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 255, "single-lacing synthetic page")
    catB(asciiB("OggS"), Array(0.toByte, headerType.toByte),
      le64B(granule), le32B(0x47524654L) /* serial */, le32B(seq),
      le32B(0L) /* crc: stated non-goal */,
      Array(1.toByte, payload.length.toByte), payload)
  }

  /** The synthetic corpus' parameter alphabets (oracle-replayed). */
  private[graft] val RateValues: Seq[Long] =
    Seq(8000L, 16000L, 44100L, 48000L)
  private[graft] val PreSkipValues: Seq[Long] =
    (0 to 4).map(j => 312L + j * 24L)
  private[graft] val GranuleValues: Seq[Long] =
    (0 to 6).map(j => 19200L * (1 + j))

  private def opusHeadB(ch: Int, preSkip: Long, rate: Long): Array[Byte] =
    catB(asciiB("OpusHead"), Array(1.toByte, ch.toByte),
      le16B(preSkip), le32B(rate), le16B(0L), Array(0.toByte))

  private def vorbisIdB(ch: Int, rate: Long): Array[Byte] =
    catB(Array(1.toByte), asciiB("vorbis"), le32B(0L),
      Array(ch.toByte), le32B(rate), new Array[Byte](12),
      Array(0xB8.toByte), Array(1.toByte))

  /** BOS pages: codec (2) × channels (2) × preSkip (5) × rate (4) =
    * 80 variants, indexed codec·40 + (ch−1)·20 + skipIdx·4 + rateIdx
    * (Vorbis ignores preSkip — its 5 slots repeat the same bytes,
    * keeping ONE index expression). */
  private val BosVariants: Seq[Array[Byte]] =
    (for (codec <- Seq("opus", "vorbis"); ch <- Seq(1, 2);
          skip <- PreSkipValues; rate <- RateValues) yield
      pageB(0x02, 0L, 0L,
        if (codec == "opus") opusHeadB(ch, skip, rate)
        else vorbisIdB(ch, rate))).toSeq

  /** EOS pages: granule (7 variants), a 10-byte dummy audio segment. */
  private val EosVariants: Seq[Array[Byte]] =
    GranuleValues.map(g => pageB(0x04, g, 1L, new Array[Byte](10)))

  /** Deterministic synthetic Ogg blob from a non-negative id column —
    * the q_m16 corpus builder, public so the spec can pin the
    * construction byte-exactly. Parameters on INDEPENDENT id digits
    * (id%2, DIV 2 %2, DIV 4 %4, DIV 16 %5, DIV 80 %7 — correlated
    * moduli would lock rate parity to codec and leave half the
    * combination grid unexercised, measured before splitting):
    * codec opus/vorbis, channels 1/2, rate 8000/16000/44100/48000
    * (Opus: INPUT rate — duration still runs on the 48 kHz granule
    * clock; Vorbis: the stream rate), pre-skip 312+k·24 (Opus only),
    * last granule 19200·(1+k); two pages (BOS + EOS). */
  def syntheticOgg(v: Column): Column = {
    def digit(div: Long, mod: Long) =
      pmod(((v - pmod(v, lit(div))) / lit(div)).cast("long"), lit(mod))
    val codec = pmod(v, lit(2L))
    val ch = digit(2L, 2L)
    val idx = (codec * lit(40L) + ch * lit(20L) +
      digit(16L, 5L) * lit(4L) + digit(4L, 4L)).cast("int") + 1
    concat(
      element_at(typedlit(BosVariants), idx),
      element_at(typedlit(EosVariants),
        digit(80L, 7L).cast("int") + 1))
  }
}
