package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MP3 / ID3v2 header metadata parser (r15, L176 — the AUDIO sibling
  * of L149's MP4 box walk and L161's JPEG marker walk: the audio
  * columns a multimodal corpus carries are overwhelmingly MPEG audio,
  * and the audit questions — declared-vs-actual bitrate/samplerate,
  * tag bloat, mono/stereo mix — live in the first frame header, no
  * codec needed; full decode stays the documented JDK boundary, which
  * ships no MP3 decoder).
  *
  * Format (ISO/IEC 11172-3 §2.4.1.3, public; ID3v2.4.0 informal
  * standard §3.1): an optional leading ID3v2 tag — "ID3", 2 version
  * bytes, 1 flags byte, then a 4-byte SYNCSAFE size (7 bits per byte;
  * total tag length = size + 10) — followed by MPEG audio frames.
  * A frame header is 4 bytes starting at an 11-bit sync
  * (0xFF, top 3 bits of byte 1 set):
  *   byte1: sync(3) | version(2: 3=MPEG1, 2=MPEG2, 0=MPEG2.5,
  *          1=reserved) | layer(2: 1=III, 2=II, 3=I, 0=reserved)
  *          | no-CRC(1)
  *   byte2: bitrate index(4) | samplerate index(2) | padding |
  *          private
  *   byte3: channel mode(2) | …
  * This parser skips the tag by its syncsafe arithmetic, then scans
  * a BOUNDED [[MaxScan]] bytes for the sync (real decoders resync —
  * zero padding between tag and first frame is common), and decodes
  * the MPEG1-Layer-III bitrate/samplerate tables (the battery's
  * declared scope; other version/layer combinations parse their
  * VERSION and LAYER but emit NULL bitrate — stated, the tables
  * differ per version and the audit value is in V1L3).
  *
  * Violation contract (None, never garbage): no sync inside the scan
  * bound, a truncated tag or header, reserved version (01) or layer
  * (00), bitrate index 0 ("free") or 15 ("bad"), samplerate index 3
  * (reserved). The audit surfaces unparseable blobs as NULL metadata
  * rather than dropping or throwing.
  *
  * Scale shape: the L149 per-partition kernel discipline — pure byte
  * arithmetic per blob, a handful of scalars out; a data-dependent
  * bounded scan is not a Catalyst-expressible shape, so
  * mapPartitions is the justified choice. */
object Mp3Header {

  /** Sync-scan bound after the ID3 tag: generous against padding,
    * strict against treating arbitrary binaries as "almost MP3". */
  private[graft] val MaxScan = 2048

  /** MPEG1 Layer III bitrates (kbps) by index 1..14 (11172-3 table
    * B.2); 0 = free and 15 = bad both parse to None. Consumed as the
    * SAME literals by the oracle generator replay. */
  private[graft] val BitrateKbps: Seq[Long] = Seq(
    32L, 40L, 48L, 56L, 64L, 80L, 96L, 112L, 128L, 160L, 192L, 224L,
    256L, 320L)

  /** MPEG1 sample rates by index 0..2 (index 3 reserved). */
  private[graft] val SampleRates: Seq[Long] = Seq(44100L, 48000L, 32000L)

  final case class Mp3Meta(id3Size: Long, version: String, layer: Int,
      bitrateKbps: Option[Long], sampleRate: Option[Long], channels: Int)

  private[graft] def parseMp3(b: Array[Byte]): Option[Mp3Meta] = {
    var off = 0
    var id3 = 0L
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // syncsafe: any high bit set is a violation per ID3v2.4 §3.1
      if (((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) return None
      id3 = 10L + ((b(6) & 0x7fL) << 21) + ((b(7) & 0x7fL) << 14) +
        ((b(8) & 0x7fL) << 7) + (b(9) & 0x7fL)
      if (id3 > b.length) return None
      off = id3.toInt
    }
    val limit = math.min(b.length - 4, off + MaxScan)
    var i = off
    while (i <= limit && !((b(i) & 0xff) == 0xff
        && (b(i + 1) & 0xe0) == 0xe0)) i += 1
    if (i > limit) return None
    val b1 = b(i + 1) & 0xff; val b2 = b(i + 2) & 0xff
    val b3 = b(i + 3) & 0xff
    val verBits = (b1 >> 3) & 0x3
    val layerBits = (b1 >> 1) & 0x3
    if (verBits == 1 || layerBits == 0) return None
    val version = verBits match {
      case 3 => "1"; case 2 => "2"; case _ => "2.5"
    }
    val layer = 4 - layerBits // bits 01→III(3), 10→II(2), 11→I(1)
    val bIdx = (b2 >> 4) & 0xf
    val sIdx = (b2 >> 2) & 0x3
    if (bIdx == 0 || bIdx == 15 || sIdx == 3) return None
    val v1l3 = verBits == 3 && layerBits == 1
    val bitrate = if (v1l3) Some(BitrateKbps(bIdx - 1)) else None
    val rate = if (verBits == 3) Some(SampleRates(sIdx)) else None
    val channels = if (((b3 >> 6) & 0x3) == 3) 1 else 2
    Some(Mp3Meta(id3, version, layer, bitrate, rate, channels))
  }

  /** Per-blob metadata: (idCol, id3_size, mpeg_version, layer,
    * bitrate_kbps, sample_rate, channels) — all NULL on violation. */
  def metadata(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    Reserved.guard(Seq(idCol), Seq("id3_size", "mpeg_version", "layer",
      "bitrate_kbps", "sample_rate", "channels"), "Mp3Header")
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(idCol).isNotNull && col(contentCol).isNotNull)
      .select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseMp3(bytes) match {
            case Some(m) =>
              (id, Option(m.id3Size), Option(m.version),
                Option(m.layer.toLong), m.bitrateKbps, m.sampleRate,
                Option(m.channels.toLong))
            case None =>
              (id, None: Option[Long], None: Option[String],
                None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long])
          }
        }
      }
      .toDF(idCol, "id3_size", "mpeg_version", "layer", "bitrate_kbps",
        "sample_rate", "channels")
  }

  /** Deterministic synthetic MP3 head from a non-negative id column
    * (the q_m9 corpus-builder discipline, public so the spec pins the
    * byte layout against hand-assembled frames):
    *   - docs with id % 3 ≠ 0 carry an ID3v2.4 tag whose payload
    *     length is id % 23 (syncsafe-encoded, < 128 so one byte);
    *   - id % 5 zero bytes of inter-tag padding shift the frame
    *     offset data-dependently;
    *   - the frame is MPEG1 Layer III, bitrate index id % 14 + 1,
    *     samplerate index id % 3, channel-mode bits id % 4;
    *   - every 11th doc writes bitrate index 15 ("bad") and every
    *     13th breaks the sync byte — the two violation legs. */
  def syntheticMp3(v: Column): Column = {
    def hex2(c: Column) = lpad(hex(c.cast("long")), 2, "0")
    val tagLen = pmod(v, lit(23L))
    val id3 = when(pmod(v, lit(3L)) =!= 0L,
      concat(lit("494433"), lit("0400"), lit("00"), lit("000000"),
        hex2(tagLen),
        call_function("repeat", lit("00"), tagLen.cast("int"))))
      .otherwise(lit(""))
    val pad = call_function("repeat", lit("00"),
      pmod(v, lit(5L)).cast("int"))
    val sync = when(pmod(v, lit(13L)) === 0L, lit("FE")).otherwise(lit("FF"))
    val bIdx = when(pmod(v, lit(11L)) === 0L, lit(15L))
      .otherwise(pmod(v, lit(14L)) + 1L)
    val byte2 = hex2(bIdx * 16L + pmod(v, lit(3L)) * 4L)
    val byte3 = hex2(pmod(v, lit(4L)) * 64L)
    unhex(concat(id3, pad, sync, lit("FB"), byte2, byte3,
      lit("00000000")))
  }
}
