package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MP4 / ISO-BMFF container METADATA parser (r14, VERDICT r13 #3) —
  * the video-column audit the reference's multimodal surface implies
  * (`/root/reference` ships video blobs through its media table; see
  * SURVEY §2 L10/L145): declared-vs-actual codec, duration histograms,
  * track-count sanity — everything a curation pass needs from a video
  * column SHORT of frame decode, which stays the documented
  * JDK-decoder-absent boundary (`Multimodal.scala`).
  *
  * Format (ISO/IEC 14496-12, the public BMFF spec): a file is a
  * sequence of boxes — 4-byte big-endian size, 4-byte fourcc; size 1
  * ⇒ a 64-bit largesize follows; size 0 ⇒ the box runs to EOF (legal
  * only for the LAST top-level box). The walk this parser does:
  *   - `ftyp` → major brand (4 ASCII bytes);
  *   - `moov`/`mvhd` → version 0 (32-bit duration) or 1 (64-bit),
  *     timescale + duration at their spec offsets;
  *   - each `trak` → descend `mdia`/`minf`/`stbl`/`stsd` and collect
  *     the sample-entry fourccs — the ACTUAL codecs in the file.
  * Unknown boxes (tkhd, udta, uuid, skip, free, mdat …) are skipped by
  * size arithmetic — the parser never assumes a fixed layout, so
  * muxer-dependent box orders and filler parse identically.
  *
  * Robustness contract: any structural violation — size < 8 (except
  * the 0/1 escapes), a box overrunning its parent, a truncated header,
  * mvhd shorter than its version demands, a second mvhd — parses to
  * `None`; the audit surfaces unparseable blobs as NULL metadata
  * rather than dropping them silently or throwing mid-scan.
  *
  * Quantize-once: `duration_ms = 1000·duration / timescale` in LONG
  * integer division (truncation toward zero — the engine-portable
  * div), the ONE derived number; timescale 0 (spec-illegal) emits a
  * NULL duration_ms, not a division error.
  *
  * Scale shape: a per-partition kernel in the image/audio-decode
  * discipline (`Multimodal.decodeImage`/`decodeAudio`) — pure byte
  * arithmetic per blob, a handful of scalars + a short codec string
  * out, nothing corpus-sized shuffles; no Catalyst expression can host
  * a data-dependent box walk, so mapPartitions is the justified
  * choice. Depth is bounded by [[MaxDepth]] so a crafted
  * container-in-container bomb cannot stack-overflow an executor. */
object IsoBmff {

  /** Parsed container metadata. `codecs` lists stsd sample-entry
    * fourccs in track order (comma-joined downstream). */
  final case class Mp4Meta(majorBrand: String, timescale: Long,
      duration: Long, nTracks: Int, codecs: Seq[String])

  /** Container-box descent bound: brand/mvhd sit at depth 1, stsd
    * entries at depth 5; 8 tolerates meta-box nesting without letting
    * a malicious recursion run away. */
  private[graft] val MaxDepth = 8

  /** Boxes this walk descends into. `stsd` is handled specially (a
    * FULL box: version+flags+entry_count before its children). */
  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String = {
    val sb = new java.lang.StringBuilder(4)
    var i = 0
    while (i < 4) {
      val c = b(o + i) & 0xff
      // non-printable fourcc bytes render as '?' — a diagnostic
      // string, never fed back into byte arithmetic
      sb.append(if (c >= 0x20 && c < 0x7f) c.toChar else '?')
      i += 1
    }
    sb.toString
  }

  /** Mutable walk state — filled in by [[walk]], validated at the end. */
  private final class State {
    var brand: String = null
    var timescale: Long = -1L
    var duration: Long = -1L
    var sawMvhd = false
    var dupMvhd = false
    var nTracks = 0
    val codecs = scala.collection.mutable.ArrayBuffer.empty[String]
    var bad = false
  }

  /** Walk the box sequence in `b[from, until)`. `topLevel` gates the
    * size-0 run-to-EOF escape (legal only at file level, last box). */
  private def walk(b: Array[Byte], from: Int, until: Int, depth: Int,
      topLevel: Boolean, st: State): Unit = {
    var o = from
    while (o < until && !st.bad) {
      if (until - o < 8) { st.bad = true; return } // truncated header
      val size0 = be32(b, o)
      val typ = fourcc(b, o + 4)
      var hdr = 8
      val size: Long =
        if (size0 == 1L) { // 64-bit largesize escape
          if (until - o < 16) { st.bad = true; return }
          hdr = 16
          be64(b, o + 8)
        } else if (size0 == 0L) { // to-EOF escape
          if (!topLevel) { st.bad = true; return }
          (until - o).toLong
        } else size0
      if (size < hdr || o + size > until) { st.bad = true; return }
      val end = o + size.toInt
      typ match {
        case "ftyp" =>
          if (end - (o + hdr) < 4) { st.bad = true; return }
          if (st.brand == null) st.brand = fourcc(b, o + hdr)
        case "mvhd" =>
          if (st.sawMvhd) st.dupMvhd = true
          st.sawMvhd = true
          val p = o + hdr
          if (end - p < 4) { st.bad = true; return }
          val version = b(p) & 0xff
          if (version == 0) { // creation(4) mod(4) ts(4) dur(4)
            if (end - p < 20) { st.bad = true; return }
            st.timescale = be32(b, p + 12)
            st.duration = be32(b, p + 16)
          } else if (version == 1) { // creation(8) mod(8) ts(4) dur(8)
            if (end - p < 32) { st.bad = true; return }
            st.timescale = be32(b, p + 20)
            st.duration = be64(b, p + 24)
          } else { st.bad = true; return }
        case "stsd" =>
          val p = o + hdr
          if (end - p < 8) { st.bad = true; return }
          val nEntries = be32(b, p + 4)
          // sample entries are plain boxes after the 8-byte prologue;
          // only their fourccs matter here
          var eo = p + 8
          var left = nEntries
          while (left > 0 && !st.bad) {
            if (end - eo < 8) { st.bad = true; return }
            val esz = be32(b, eo)
            if (esz < 8 || eo + esz > end) { st.bad = true; return }
            st.codecs += fourcc(b, eo + 4)
            eo += esz.toInt
            left -= 1
          }
        case t if Containers.contains(t) =>
          if (depth >= MaxDepth) { st.bad = true; return }
          if (t == "trak") st.nTracks += 1
          walk(b, o + hdr, end, depth + 1, topLevel = false, st)
        case _ => // unknown box (free, mdat, tkhd, uuid, …) — skip
      }
      o = end
    }
  }

  /** Parse one blob. `None` on any structural violation or when the
    * required boxes (ftyp brand, exactly one mvhd) are absent. */
  def parseMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
    if (bytes == null || bytes.length < 8) return None
    val st = new State
    walk(bytes, 0, bytes.length, 0, topLevel = true, st)
    if (st.bad || st.dupMvhd || st.brand == null || !st.sawMvhd) None
    else Some(Mp4Meta(st.brand, st.timescale, st.duration, st.nTracks,
      st.codecs.toSeq))
  }

  /** Per-doc container-metadata frame: (idCol, major_brand, timescale,
    * duration, n_tracks, codecs, duration_ms). Unparseable blobs emit
    * the id with NULL metadata (the audit's "corrupt video" row);
    * null ids/blobs drop. `codecs` is the comma-joined track-order
    * fourcc list; `duration_ms` is the quantize-once LONG division,
    * NULL when timescale is 0. */
  def metadata(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    Reserved.guard(Seq(idCol), Seq("major_brand", "timescale", "duration",
      "n_tracks", "codecs", "duration_ms"), "IsoBmff")
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(idCol).isNotNull && col(contentCol).isNotNull)
      .select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseMp4(bytes) match {
            case Some(m) =>
              (id, Option(m.majorBrand), Option(m.timescale),
                Option(m.duration), Option(m.nTracks.toLong),
                Option(m.codecs.mkString(",")),
                if (m.timescale > 0) Option(1000L * m.duration / m.timescale)
                else None)
            case None =>
              (id, None: Option[String], None: Option[Long],
                None: Option[Long], None: Option[Long],
                None: Option[String], None: Option[Long])
          }
        }
      }
      .toDF(idCol, "major_brand", "timescale", "duration", "n_tracks",
        "codecs", "duration_ms")
  }

  /** [[metadata]] with ONE passthrough tag column carried through the
    * kernel — the join-free audit shape (r16, VERDICT r15 #1): the
    * declared/label column rides the SAME per-partition pass as the
    * parse, so the blob-construction expression is evaluated exactly
    * once and the audit never joins the walked metadata back to a
    * second evaluation of the blob frame (which is what pushed
    * q_m10's stage past the 64 KB whole-stage-codegen limit — two
    * join branches, each hosting the full synthetic-container tree).
    * Output: (idCol, tagCol, major_brand, timescale, duration,
    * n_tracks, codecs, duration_ms); NULL-metadata rows and null-id/
    * blob drops exactly as [[metadata]]. The tag renders to string
    * (NULL tags ride through — the tag is a label, not a key). */
  def metadataTagged(df: DataFrame, idCol: String, contentCol: String,
      tagCol: String): DataFrame = {
    Reserved.guard(Seq(idCol, tagCol), Seq("major_brand", "timescale",
      "duration", "n_tracks", "codecs", "duration_ms"), "IsoBmff")
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(idCol).isNotNull && col(contentCol).isNotNull)
      .select(col(idCol).cast("long"), col(contentCol),
        col(tagCol).cast("string"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, tag) =>
          parseMp4(bytes) match {
            case Some(m) =>
              (id, Option(tag), Option(m.majorBrand), Option(m.timescale),
                Option(m.duration), Option(m.nTracks.toLong),
                Option(m.codecs.mkString(",")),
                if (m.timescale > 0) Option(1000L * m.duration / m.timescale)
                else None)
            case None =>
              (id, Option(tag), None: Option[String], None: Option[Long],
                None: Option[Long], None: Option[Long],
                None: Option[String], None: Option[Long])
          }
        }
      }
      .toDF(idCol, tagCol, "major_brand", "timescale", "duration",
        "n_tracks", "codecs", "duration_ms")
  }

  // ---- synthetic-blob construction (query/test side) ----------------

  /** 4-byte big-endian render of a non-negative column — the box-size
    * / integer-field builder for expression-side blob construction. */
  def be32Col(c: Column): Column = unhex(lpad(hex(c.cast("long")), 8, "0"))

  /** 8-byte big-endian render (largesize / v1 duration fields). */
  def be64Col(c: Column): Column = unhex(lpad(hex(c.cast("long")), 16, "0"))

  // JVM-side constant-segment assembly (r16, VERDICT r15 #1): every
  // byte of the synthetic container that does not depend on the id is
  // folded into a byte-array literal HERE, not left for Catalyst to
  // codegen — Catalyst's ConstantFolding folds each foldable child
  // but never MERGES adjacent literal concat children, so the old
  // ~18-child-per-trak tree generated hundreds of lines per box and
  // (doubled across q_m10's two join branches) overran the 64 KB
  // whole-stage-codegen method limit, degrading the stage to
  // interpreted eval. The enumerable id-dependent segments (2 brands,
  // 16 free paddings, 3 codecs, 6 moov headers) become element_at
  // lookups into small binary-array literals; only mvhd's
  // timescale/duration fields remain expression-rendered.
  private def asciiB(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def be32B(x: Long): Array[Byte] = Array(
    ((x >> 24) & 0xff).toByte, ((x >> 16) & 0xff).toByte,
    ((x >> 8) & 0xff).toByte, (x & 0xff).toByte)

  private def catB(parts: Array[Byte]*): Array[Byte] =
    parts.toArray.flatten

  /** The two ftyp boxes, by id%2: brand isom / mp42. */
  private val FtypVariants: Seq[Array[Byte]] = Seq("isom", "mp42")
    .map(brand => catB(be32B(24), asciiB("ftyp"), asciiB(brand),
      be32B(0), asciiB("isom"), asciiB("mp41")))

  /** The 16 free boxes, by id%16 filler bytes. */
  private val FreeVariants: Seq[Array[Byte]] = (0 to 15)
    .map(p => catB(be32B(8L + p), asciiB("free"), new Array[Byte](p)))

  /** The three complete trak boxes, by codec — tkhd filler the walk
    * must skip, the mdia/minf/stbl descent, one 16-byte stsd entry. */
  private val TrakVariants: Seq[Array[Byte]] = Seq("avc1", "mp4a", "hev1")
    .map(c => catB(be32B(156), asciiB("trak"),
      be32B(92), asciiB("tkhd"), new Array[Byte](84),
      be32B(56), asciiB("mdia"),
      be32B(48), asciiB("minf"),
      be32B(40), asciiB("stbl"),
      be32B(32), asciiB("stsd"), be32B(0) /* version+flags */,
      be32B(1), be32B(16), asciiB(c), new Array[Byte](8)))

  /** The six moov headers: size 8 + mvhdSize(ver) + nt·156, indexed
    * ver·3 + nt (1-based element_at). */
  private val MoovHdrVariants: Seq[Array[Byte]] =
    for (ver <- Seq(0, 1); nt <- Seq(1, 2, 3))
      yield catB(be32B(8L + (if (ver == 0) 108L else 120L) + nt * 156L),
        asciiB("moov"))

  private val MvhdPrefV0: Array[Byte] =
    catB(be32B(108), asciiB("mvhd"), be32B(0), new Array[Byte](8))
  private val MvhdPrefV1: Array[Byte] =
    catB(be32B(120), asciiB("mvhd"), Array[Byte](1, 0, 0, 0),
      new Array[Byte](16))
  private val Zeros80: Array[Byte] = new Array[Byte](80)

  /** Deterministic synthetic MP4 blob from a non-negative id column —
    * the q_m9 corpus builder, public so the spec can pin the
    * construction byte-exactly against hand-assembled boxes (one pin
    * ties the oracle's formula replay to the actual byte layout).
    * Parameters, all id-derived so box OFFSETS vary per doc:
    * brand isom/mp42 (id%2), mvhd version (id DIV 2)%2 (v0 32-bit /
    * v1 64-bit duration), timescale 600+(id%5)*100, duration
    * 1000+(id*37)%9000, a free box with (id%16) filler bytes, 1+id%3
    * traks each carrying a tkhd the walk must SKIP and an stsd codec
    * avc1/mp4a/hev1 by (id DIV 3 + track)%3. Codegen shape (r16):
    * constant segments are pre-folded byte literals selected by
    * element_at; only the mvhd timescale/duration render through
    * expressions — the whole blob generates a few dozen lines, not
    * the 64 KB-class cascade of the all-expression form. */
  def syntheticMp4(v: Column): Column = {
    val emptyBin = lit(Array.emptyByteArray)
    def divmod2(c: Column) = pmod((c - pmod(c, lit(2L))) / lit(2L), lit(2L))
    val ver = divmod2(v).cast("long")
    val ts = lit(600L) + pmod(v, lit(5L)) * lit(100L)
    val dur = lit(1000L) + pmod(v * lit(37L), lit(9000L))
    val nt = lit(1L) + pmod(v, lit(3L))
    val ftyp = element_at(typedlit(FtypVariants),
      pmod(v, lit(2L)).cast("int") + 1)
    val free = element_at(typedlit(FreeVariants),
      pmod(v, lit(16L)).cast("int") + 1)
    val mvhd = when(ver === 0L,
      concat(lit(MvhdPrefV0), be32Col(ts), be32Col(dur), lit(Zeros80)))
      .otherwise(
        concat(lit(MvhdPrefV1), be32Col(ts), be64Col(dur), lit(Zeros80)))
    val moovHdr = element_at(typedlit(MoovHdrVariants),
      (ver * lit(3L) + nt).cast("int"))
    def trak(i: Int): Column = {
      val third = (v - pmod(v, lit(3L))) / lit(3L)
      val ci = pmod(third.cast("long") + lit(i.toLong), lit(3L))
      element_at(typedlit(TrakVariants), ci.cast("int") + 1)
    }
    concat(ftyp, free, moovHdr, mvhd, trak(0),
      when(nt > 1L, trak(1)).otherwise(emptyBin),
      when(nt > 2L, trak(2)).otherwise(emptyBin))
  }
}
