package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Matroska / WebM EBML container-METADATA parser (r16, VERDICT r15
  * #6) — the remaining JDK-only multimodal closure next to q_m9's
  * ISO-BMFF walk: crawl video is predominantly WebM, and everything a
  * curation pass needs SHORT of frame decode (doc type, duration,
  * track census, per-track codec IDs) sits in the container header.
  * Frame decode itself stays the documented JDK-decoder-absent
  * boundary (`Multimodal.scala` — the JDK ships no VP9/AV1/Opus
  * decoder).
  *
  * Format (RFC 8794 EBML + the public Matroska spec): a file is a
  * sequence of elements — [ID: VINT, 1–4 bytes, marker bits KEPT]
  * [size: VINT, 1–8 bytes, marker bits STRIPPED] [payload]. The
  * leading set bit of the first byte gives the VINT length (1xxxxxxx
  * = 1 byte, 01xxxxxx = 2, …). The walk this parser does:
  *   - EBML header `1A45DFA3` → descend for `4282` DocType (ASCII,
  *     trailing NULs stripped per spec padding);
  *   - `18538067` Segment → descend;
  *   - `1549A966` Info → `2AD7B1` TimestampScale (uint ns/tick,
  *     spec default 1,000,000 when absent) and `4489` Duration
  *     (EBML float: 4 or 8 bytes IEEE BE — the spec's only widths);
  *   - `1654AE6B` Tracks → each `AE` TrackEntry (counted, descended)
  *     → `86` CodecID (ASCII, collected in track order).
  * Unknown elements (Void `EC`, SeekHead, Cluster, Cues, …) are
  * skipped by size arithmetic — no layout assumptions, so muxer-
  * dependent element orders and filler parse identically.
  *
  * Robustness contract (the L149 discipline): any structural
  * violation — a zero first VINT byte, an ID longer than 4 bytes, an
  * element overrunning its parent, a truncated header, an
  * unknown-size element (all data bits set — legal only for
  * streaming captures, rejected here as unbounded), a Duration that
  * is not 4/8 bytes, a second Info — parses to `None`; the audit
  * surfaces unparseable blobs as NULL metadata rather than dropping
  * them silently or throwing mid-scan. A missing EBML header /
  * DocType is a violation (nothing identified the container); a
  * missing Duration is NOT (live captures omit it) and emits a NULL
  * duration_ms.
  *
  * Quantize-once: `duration_ms = trunc(durationTicks · timescaleNs /
  * 10⁶)` — Duration is an EBML FLOAT by spec, so this is the ONE
  * double quantization in the family (m9's all-integer division is
  * not available); both engines run the same two IEEE-754 ops on the
  * same values, and the synthetic corpus keeps every product exactly
  * representable so the gate compares exact longs.
  *
  * Scale shape: a per-partition kernel in the IsoBmff/Mp3Header
  * discipline — pure byte arithmetic per blob, a handful of scalars
  * + a short codec string out, nothing corpus-sized shuffles; a
  * data-dependent VINT walk is not Catalyst-expressible, so
  * mapPartitions is the justified choice. Depth is bounded by
  * [[MaxDepth]] so a crafted element-in-element bomb cannot
  * stack-overflow an executor. */
object Ebml {

  /** Parsed container metadata. `codecs` lists CodecID strings in
    * track order (comma-joined downstream); `durationTicks` is the
    * raw EBML float (None when the element is absent). */
  final case class WebmMeta(docType: String, timescaleNs: Long,
      durationTicks: Option[Double], nTracks: Int, codecs: Seq[String])

  /** Descent bound: DocType sits at depth 1, CodecID at depth 3; 8
    * tolerates tag nesting without letting a malicious recursion run
    * away (the IsoBmff bound). */
  private[graft] val MaxDepth = 8

  /** Matroska TimestampScale default: 1,000,000 ns/tick (the spec's
    * stated default when the element is absent). */
  private[graft] val DefaultTimescaleNs = 1000000L

  // element IDs, marker bits kept (the on-wire compare form)
  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdCodecId = 0x86L

  private val Containers =
    Set(IdEbml, IdSegment, IdInfo, IdTracks, IdTrackEntry)

  /** VINT length from its first byte: position of the leading set
    * bit; 0x00 is malformed (−1). */
  private def vintLen(b0: Int): Int = {
    var mask = 0x80
    var len = 1
    while (mask != 0) {
      if ((b0 & mask) != 0) return len
      mask >>= 1
      len += 1
    }
    -1
  }

  private final class State {
    var docType: String = null
    var timescale: Long = DefaultTimescaleNs
    var duration: Double = Double.NaN
    var sawDuration = false
    var sawInfo = false
    var dupInfo = false
    var nTracks = 0
    val codecs = scala.collection.mutable.ArrayBuffer.empty[String]
    var bad = false
  }

  private def beUint(b: Array[Byte], from: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(from + i) & 0xffL); i += 1 }
    v
  }

  /** ASCII payload with trailing NUL padding stripped (spec-legal). */
  private def asciiStr(b: Array[Byte], from: Int, len: Int): String = {
    var end = from + len
    while (end > from && b(end - 1) == 0) end -= 1
    val sb = new java.lang.StringBuilder(end - from)
    var i = from
    while (i < end) {
      val c = b(i) & 0xff
      sb.append(if (c >= 0x20 && c < 0x7f) c.toChar else '?')
      i += 1
    }
    sb.toString
  }

  /** Walk the element sequence in `b[from, until)`. */
  private def walk(b: Array[Byte], from: Int, until: Int, depth: Int,
      st: State): Unit = {
    var o = from
    while (o < until && !st.bad) {
      if (until - o < 2) { st.bad = true; return } // truncated header
      val idLen = vintLen(b(o) & 0xff)
      if (idLen < 1 || idLen > 4 || until - o < idLen + 1) {
        st.bad = true; return
      }
      val id = beUint(b, o, idLen) // marker kept — the on-wire form
      val s0 = b(o + idLen) & 0xff
      val szLen = vintLen(s0)
      if (szLen < 1 || szLen > 8 || until - o < idLen + szLen) {
        st.bad = true; return
      }
      var size = (s0 & (0xff >>> szLen)).toLong
      var i = 1
      while (i < szLen) {
        size = (size << 8) | (b(o + idLen + i) & 0xffL); i += 1
      }
      // unknown-size escape (all data bits set): unbounded streaming
      // capture — rejected (the walk's bounds would be a guess)
      if (size == (1L << (7 * szLen)) - 1) { st.bad = true; return }
      val p = o + idLen + szLen
      if (size < 0 || p + size > until) { st.bad = true; return }
      val end = p + size.toInt
      id match {
        case IdDocType =>
          if (st.docType == null) st.docType = asciiStr(b, p, size.toInt)
        case IdTimestampScale =>
          if (size < 1 || size > 8) { st.bad = true; return }
          st.timescale = beUint(b, p, size.toInt)
        case IdDuration =>
          if (size == 4L)
            st.duration = java.lang.Float
              .intBitsToFloat(beUint(b, p, 4).toInt).toDouble
          else if (size == 8L)
            st.duration = java.lang.Double
              .longBitsToDouble(beUint(b, p, 8))
          else { st.bad = true; return }
          st.sawDuration = true
        case IdInfo =>
          if (st.sawInfo) st.dupInfo = true
          st.sawInfo = true
          if (depth >= MaxDepth) { st.bad = true; return }
          walk(b, p, end, depth + 1, st)
        case IdTrackEntry =>
          st.nTracks += 1
          if (depth >= MaxDepth) { st.bad = true; return }
          walk(b, p, end, depth + 1, st)
        case IdCodecId =>
          st.codecs += asciiStr(b, p, size.toInt)
        case x if Containers.contains(x) =>
          if (depth >= MaxDepth) { st.bad = true; return }
          walk(b, p, end, depth + 1, st)
        case _ => // Void, SeekHead, Cluster, Cues, tags … — skip
      }
      o = end
    }
  }

  /** Parse one blob. `None` on any structural violation or when no
    * EBML header / DocType identified the container. */
  def parseWebm(bytes: Array[Byte]): Option[WebmMeta] = {
    if (bytes == null || bytes.length < 2) return None
    val st = new State
    walk(bytes, 0, bytes.length, 0, st)
    if (st.bad || st.dupInfo || st.docType == null) None
    else Some(WebmMeta(st.docType, st.timescale,
      if (st.sawDuration) Some(st.duration) else None,
      st.nTracks, st.codecs.toSeq))
  }

  /** Per-doc container-metadata frame: (idCol, doc_type, timescale,
    * n_tracks, codecs, duration_ms). Unparseable blobs emit the id
    * with NULL metadata (the audit's "corrupt video" row); null
    * ids/blobs drop. `duration_ms` is the quantize-once double
    * truncation (see object scaladoc), NULL when Duration is absent
    * or the timescale is 0 (spec-illegal). */
  def metadata(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    Reserved.guard(Seq(idCol), Seq("doc_type", "timescale", "n_tracks",
      "codecs", "duration_ms"), "Ebml")
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(idCol).isNotNull && col(contentCol).isNotNull)
      .select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseWebm(bytes) match {
            case Some(m) =>
              (id, Option(m.docType), Option(m.timescaleNs),
                Option(m.nTracks.toLong),
                Option(m.codecs.mkString(",")),
                m.durationTicks.collect {
                  case d if m.timescaleNs > 0 =>
                    (d * m.timescaleNs / 1e6).toLong
                })
            case None =>
              (id, None: Option[String], None: Option[Long],
                None: Option[Long], None: Option[String],
                None: Option[Long])
          }
        }
      }
      .toDF(idCol, "doc_type", "timescale", "n_tracks", "codecs",
        "duration_ms")
  }

  // ---- synthetic-blob construction (query/test side) ----------------
  // The r16 constant-segment discipline from day one (the IsoBmff
  // lesson): every byte that does not depend on the id folds into a
  // byte-array literal here, and the enumerable id-dependent segments
  // become element_at lookups — the whole blob generates a few dozen
  // lines of code, never a 64 KB-class cascade.

  private def asciiB(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def catB(parts: Array[Byte]*): Array[Byte] = parts.toArray.flatten

  private def be32B(x: Long): Array[Byte] = Array(
    ((x >> 24) & 0xff).toByte, ((x >> 16) & 0xff).toByte,
    ((x >> 8) & 0xff).toByte, (x & 0xff).toByte)

  private def be64B(x: Long): Array[Byte] =
    be32B(x >>> 32) ++ be32B(x & 0xffffffffL)

  /** One-byte EBML size VINT (payload < 127). */
  private def sz1(n: Int): Array[Byte] = {
    require(n >= 0 && n < 127, s"one-byte VINT size out of range: $n")
    Array((0x80 | n).toByte)
  }

  /** The synthetic corpus' codec alphabet: CodecID and its track type
    * (V_ = video 1, A_ = audio 2 — the Matroska type codes). */
  private[graft] val CodecAlphabet = Seq("V_VP9", "A_OPUS", "V_AV1")

  private def trackEntryB(codec: String): Array[Byte] = {
    val typ: Byte = if (codec.startsWith("V_")) 1 else 2
    val payload = catB(
      Array(0x83.toByte), sz1(1), Array(typ), // TrackType
      Array(0x86.toByte), sz1(codec.length), asciiB(codec)) // CodecID
    catB(Array(0xAE.toByte), sz1(payload.length), payload)
  }

  /** The two EBML headers, by id%2: DocType webm / matroska. */
  private val EbmlHdrVariants: Seq[Array[Byte]] =
    Seq("webm", "matroska").map { dt =>
      val payload = catB(Array(0x42.toByte, 0x82.toByte),
        sz1(dt.length), asciiB(dt))
      catB(Array(0x1A.toByte, 0x45.toByte, 0xDF.toByte, 0xA3.toByte),
        sz1(payload.length), payload)
    }

  /** The 8 Void filler elements, by id%8 padding bytes. */
  private val VoidVariants: Seq[Array[Byte]] = (0 to 7).map(p =>
    catB(Array(0xEC.toByte), sz1(p), new Array[Byte](p)))

  /** The 9 complete Tracks elements, indexed phase·3 + (nt−1):
    * nt = 1 + id%3 entries, codec (id DIV 3 + i) % 3. */
  private val TracksVariants: Seq[Array[Byte]] =
    (for (phase <- 0 to 2; nt0 <- 0 to 2) yield {
      val payload = catB((0 to nt0).map(i =>
        trackEntryB(CodecAlphabet((phase + i) % 3))): _*)
      catB(Array(0x16.toByte, 0x54.toByte, 0xAE.toByte, 0x6B.toByte),
        sz1(payload.length), payload)
    }).toSeq

  /** Info payload: TimestampScale (3+1+4) + Duration (2+1+8) = 19. */
  private val InfoPayloadLen = 19

  /** Info header + TimestampScale header — the constant run before
    * the 4 timescale bytes. */
  private val InfoPrefix: Array[Byte] = catB(
    Array(0x15.toByte, 0x49.toByte, 0xA9.toByte, 0x66.toByte),
    sz1(InfoPayloadLen),
    Array(0x2A.toByte, 0xD7.toByte, 0xB1.toByte), sz1(4))

  /** Duration header: ID 4489, size 8 (a full IEEE double). */
  private val DurPrefix: Array[Byte] =
    catB(Array(0x44.toByte, 0x89.toByte), sz1(8))

  /** The 4 timescales, by id%4: 0.5/0.75/1.0/1.25 µs per tick —
    * quarters of a µs so duration_ms stays exactly representable. */
  private[graft] val TimescaleValues: Seq[Long] =
    (0 to 3).map(j => 500000L + j * 250000L)

  private val TsVariants: Seq[Array[Byte]] = TimescaleValues.map(be32B)

  /** The 7 durations (ticks), by id%7 — written as 8-byte IEEE
    * doubles of integral values. */
  private[graft] val DurationValues: Seq[Long] =
    (0 to 6).map(j => 2000L + j * 555L)

  private val DurVariants: Seq[Array[Byte]] = DurationValues.map(d =>
    be64B(java.lang.Double.doubleToLongBits(d.toDouble)))

  /** The 9 Segment headers, indexed like [[TracksVariants]]: payload
    * = Info total (24) + the matching Tracks total. */
  private val SegHdrVariants: Seq[Array[Byte]] =
    TracksVariants.map { tr =>
      catB(Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte),
        sz1(4 + 1 + InfoPayloadLen + tr.length))
    }

  /** Deterministic synthetic WebM/Matroska blob from a non-negative
    * id column — the q_m15 corpus builder, public so the spec can pin
    * the construction byte-exactly against hand-assembled elements.
    * Parameters, all id-derived so element OFFSETS vary per doc:
    * DocType webm/matroska (id%2), a Void filler with id%8 padding
    * bytes the walk must skip, TimestampScale 500000+(id%4)·250000 ns
    * (quarters of a µs), Duration ticks 2000+(id%7)·555 as an 8-byte
    * IEEE double, 1+id%3 TrackEntries with CodecID
    * V_VP9/A_OPUS/V_AV1 by (id DIV 3 + track)%3. */
  def syntheticWebm(v: Column): Column = {
    val phase = pmod(((v - pmod(v, lit(3L))) / lit(3L)).cast("long"),
      lit(3L))
    val idx9 = (phase * lit(3L) + pmod(v, lit(3L))).cast("int") + 1
    concat(
      element_at(typedlit(EbmlHdrVariants),
        pmod(v, lit(2L)).cast("int") + 1),
      element_at(typedlit(VoidVariants),
        pmod(v, lit(8L)).cast("int") + 1),
      element_at(typedlit(SegHdrVariants), idx9),
      lit(InfoPrefix),
      element_at(typedlit(TsVariants), pmod(v, lit(4L)).cast("int") + 1),
      lit(DurPrefix),
      element_at(typedlit(DurVariants), pmod(v, lit(7L)).cast("int") + 1),
      element_at(typedlit(TracksVariants), idx9))
  }
}
