package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FLAC container-METADATA parser (r17, L202; RFC 9639 / the public
  * FLAC format spec §"STREAMINFO" — the lossless-audio closure
  * beside L194's Ogg/Opus+Vorbis, L176's MP3/ID3 and L177's WAV:
  * archival/crawl audio's fourth major container. Decode stays the
  * documented JDK-decoder-absent boundary — the JDK ships no FLAC
  * decoder; everything a curation pass needs short of decode sits in
  * the mandatory first metadata block.)
  *
  * Format walked (all integers BIG-endian — the Ogg walk is
  * little-endian; both disciplines stay exercised): "fLaC"(4), then
  * metadata blocks, each [lastFlag(1 bit) | type(7 bits)](1)
  * length(3 BE) payload(length). The FIRST block MUST be STREAMINFO
  * (type 0, length exactly 34 — both spec-mandated): bytes 0–1 min
  * block size, 2–3 max, 4–6/7–9 min/max frame size, then ONE packed
  * BE u64 at bytes 10–17 — rate(20 bits) | channels−1(3) |
  * bps−1(5) | totalSamples(36) — and a 16-byte MD5. The walk skips
  * every later block by length arithmetic and counts them; block
  * count is bounded by blob length BY CONSTRUCTION (every block
  * consumes ≥ 4 bytes — no bomb counter needed).
  *
  * Robustness contract (the L149/L186/L194 discipline): bad magic,
  * first block not STREAMINFO, STREAMINFO length ≠ 34, truncation
  * anywhere, a stream whose last block never sets the last-flag,
  * rate = 0 (spec-illegal) — all parse to `None`; the audit
  * surfaces unparseable blobs as NULL metadata rather than dropping
  * them silently or throwing. totalSamples = 0 means UNKNOWN length
  * per spec — duration_ms is honestly NULL there, never 0.
  *
  * Quantize-once: duration_ms = totalSamples·1000/rate, ONE
  * truncating LONG division on nonnegative integers — identical on
  * both engines.
  *
  * Scale shape: the per-partition kernel class — bounded byte
  * arithmetic per blob, a handful of scalars out; a data-dependent
  * block walk is not Catalyst-expressible, so mapPartitions is the
  * justified choice (the L149 stance). */
object Flac {

  /** Parsed stream metadata. */
  final case class FlacMeta(channels: Int, bitsPerSample: Int,
      sampleRate: Long, totalSamples: Long, nBlocks: Int)

  private def be24(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)

  private def be64(b: Array[Byte], o: Int): Long = {
    var x = 0L
    var i = 0
    while (i < 8) { x = (x << 8) | (b(o + i) & 0xffL); i += 1 }
    x
  }

  /** Parse one blob. `None` on any structural violation. */
  def parseFlac(bytes: Array[Byte]): Option[FlacMeta] = {
    if (bytes == null || bytes.length < 8) return None
    if (new String(bytes, 0, 4, "US-ASCII") != "fLaC") return None
    var o = 4
    var first = true
    var meta: FlacMeta = null
    var nBlocks = 0
    var sawLast = false
    while (!sawLast) {
      if (bytes.length - o < 4) return None // truncated block header
      val h = bytes(o) & 0xff
      val isLast = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = be24(bytes, o + 1)
      if (bytes.length - o - 4 < len) return None // truncated payload
      if (first) {
        // spec: STREAMINFO must come first and is exactly 34 bytes
        if (btype != 0 || len != 34) return None
        val p = o + 4
        val u = be64(bytes, p + 10)
        val rate = u >>> 44
        if (rate == 0L) return None // spec-illegal
        meta = FlacMeta(((u >>> 41) & 0x7L).toInt + 1,
          ((u >>> 36) & 0x1fL).toInt + 1, rate, u & 0xfffffffffL, 0)
        first = false
      }
      nBlocks += 1
      o += 4 + len
      sawLast = isLast
    }
    Some(meta.copy(nBlocks = nBlocks))
  }

  /** Per-doc metadata frame: (idCol, channels, bits_per_sample,
    * sample_rate, total_samples, duration_ms, n_blocks). Unparseable
    * blobs emit the id with NULL metadata; null ids/blobs drop.
    * duration_ms NULL when totalSamples = 0 (unknown per spec). */
  def metadata(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    Reserved.guard(Seq(idCol), Seq("channels", "bits_per_sample",
      "sample_rate", "total_samples", "duration_ms", "n_blocks"),
      "Flac")
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(idCol).isNotNull && col(contentCol).isNotNull)
      .select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          parseFlac(bytes) match {
            case Some(m) =>
              val dur =
                if (m.totalSamples > 0L)
                  Some(m.totalSamples * 1000L / m.sampleRate)
                else None
              (id, Option(m.channels.toLong),
                Option(m.bitsPerSample.toLong), Option(m.sampleRate),
                Option(m.totalSamples), dur, Option(m.nBlocks.toLong))
            case None =>
              (id, None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long])
          }
        }
      }
      .toDF(idCol, "channels", "bits_per_sample", "sample_rate",
        "total_samples", "duration_ms", "n_blocks")
  }

  // ---- synthetic-blob construction (query/test side) ----------------
  // The r16 constant-segment discipline: id-independent bytes fold
  // into literals; enumerable id-dependent segments become element_at
  // lookups on INDEPENDENT id digits.

  private def asciiB(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def be16B(x: Long): Array[Byte] =
    Array(((x >> 8) & 0xff).toByte, (x & 0xff).toByte)

  private def be24B(x: Long): Array[Byte] =
    Array(((x >> 16) & 0xff).toByte, ((x >> 8) & 0xff).toByte,
      (x & 0xff).toByte)

  private def be64B(x: Long): Array[Byte] =
    (0 until 8).map(i => ((x >>> (56 - 8 * i)) & 0xff).toByte).toArray

  /** The synthetic corpus' parameter alphabets (oracle-replayed). */
  private[graft] val RateValues: Seq[Long] =
    Seq(8000L, 16000L, 44100L, 48000L)
  private[graft] val BpsValues: Seq[Long] = Seq(16L, 24L)
  private[graft] val SampleValues: Seq[Long] =
    (0 to 6).map(j => 96000L * (1 + j))

  /** Magic + STREAMINFO block (last-flag CLEAR — trailing blocks
    * follow): rate (4) × channels (2) × bps (2) × samples (7) = 112
    * variants, indexed rateIdx·28 + (ch−1)·14 + bpsIdx·7 +
    * sampleIdx. */
  private val HeadVariants: Seq[Array[Byte]] =
    (for (rate <- RateValues; ch <- Seq(1, 2); bps <- BpsValues;
          s <- SampleValues) yield {
      val u = (rate << 44) | ((ch - 1).toLong << 41) |
        ((bps - 1) << 36) | s
      asciiB("fLaC") ++ Array(0x00.toByte) ++ be24B(34L) ++
        be16B(1024L) ++ be16B(4096L) ++ be24B(512L) ++ be24B(8192L) ++
        be64B(u) ++ new Array[Byte](16)
    }).toSeq

  /** Trailing block chains: 0–2 PADDING blocks (type 1) then a
    * VORBIS_COMMENT stub (type 4) with the last-flag SET — so
    * n_blocks = 2 + extra. */
  private val TailVariants: Seq[Array[Byte]] = {
    val padding = Array(0x01.toByte) ++ be24B(6L) ++ new Array[Byte](6)
    val lastComment = Array((0x80 | 0x04).toByte) ++ be24B(12L) ++
      new Array[Byte](12)
    (0 to 2).map(extra =>
      (0 until extra).flatMap(_ => padding).toArray ++ lastComment)
  }

  /** Deterministic synthetic FLAC blob from a non-negative id
    * column — public so the spec can pin the construction
    * byte-exactly. Parameters on INDEPENDENT id digits (id%4 rate,
    * DIV 4 %2 channels, DIV 8 %2 bps, DIV 16 %7 samples,
    * DIV 112 %3 trailing blocks — the r16 correlated-moduli lesson):
    * every combination of the alphabets is exercised. */
  def syntheticFlac(v: Column): Column = {
    def digit(div: Long, mod: Long) =
      pmod(((v - pmod(v, lit(div))) / lit(div)).cast("long"), lit(mod))
    val idx = (pmod(v, lit(4L)) * lit(28L) + digit(4L, 2L) * lit(14L) +
      digit(8L, 2L) * lit(7L) + digit(16L, 7L)).cast("int") + 1
    concat(
      element_at(typedlit(HeadVariants), idx),
      element_at(typedlit(TailVariants),
        digit(112L, 3L).cast("int") + 1))
  }
}
