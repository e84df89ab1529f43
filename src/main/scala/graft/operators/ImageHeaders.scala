package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Image dimensions from HEADER BYTES alone — the resolution screen a
  * multimodal ingest runs BEFORE paying for decode (reference behavior
  * class: `qb-data-pipeline-backfill` filters records pre-transform;
  * here the 100 TB analogue is "drop sub-512px images without decoding
  * a single pixel"). [[Multimodal.decodeImages]] (L10) is the real
  * ImageIO path and costs a kernel per blob; this is a pure codegen'd
  * expression chain over ≤ 26 header bytes that fuses into the scan —
  * at corpus scale the filter runs at column-scan speed and the decoder
  * only ever sees survivors.
  *
  * Formats and offsets (all public file-format specs):
  *   - PNG (ISO 15948 §5.3/11.2.2): 8-byte signature, then the IHDR
  *     chunk is MANDATORY-FIRST — width/height are big-endian u32 at
  *     byte offsets 17–20 / 21–24 (1-based). The IHDR fourcc at 13–16
  *     is verified, not assumed.
  *   - GIF (GIF87a/89a spec): 6-byte signature, then the logical
  *     screen descriptor — width/height little-endian u16 at 7–8 / 9–10.
  *   - BMP (BITMAPINFOHEADER): "BM", 16 bytes of file header tail +
  *     DIB size, then width at 19–22 and height at 23–26, little-endian
  *     SIGNED i32 — a NEGATIVE height is a legal top-down bitmap
  *     (surfaced as `top_down` = 1 with |height|, the orientation
  *     audit bit).
  *   - JPEG is deliberately OUT of the expression path: its dimensions
  *     live in an SOF marker at a variable offset behind
  *     variable-length segments — a walk, not a slice. That walk IS
  *     implemented, as the [[jpegDims]] per-blob kernel below (the
  *     [[IsoBmff.metadata]] shape), kept off the codegen'd fast path
  *     so the three fixed-offset formats stay scan-speed.
  *
  * Routing REUSES [[Multimodal.sniffType]] (the q_m10 discipline: one
  * router, shared by every consumer, so the sniffer and the parsers
  * cannot disagree on what a format is); BMP's weak 2-byte magic
  * false-positive class is documented there and inherited here.
  * Violation handling (the L149 convention): a sniffed format whose
  * header is TRUNCATED or whose parsed dimension is non-positive emits
  * NULL dims, never a garbage number — `fmt` still reports what the
  * magic claimed, so the audit can count corrupt headers per format. */
object ImageHeaders {

  private def hexAt(c: Column, pos: Int, len: Int): Column =
    hex(substring(c, pos, len))

  /** Big-endian unsigned read of `len` bytes at 1-based `pos`. */
  private def be(c: Column, pos: Int, len: Int): Column =
    conv(hexAt(c, pos, len), 16, 10).cast("long")

  /** Little-endian unsigned read: reverse the byte pairs of the hex
    * rendering, then one conv. */
  private def le(c: Column, pos: Int, len: Int): Column = {
    val h = hexAt(c, pos, len)
    val rev = (len to 1 by -1).map(i => substring(h, 2 * i - 1, 2))
    conv(concat(rev: _*), 16, 10).cast("long")
  }

  /** Signed i32 view of a 4-byte little-endian read. */
  private def leSigned(c: Column, pos: Int): Column = {
    val u = le(c, pos, 4)
    when(u >= 2147483648L, u - 4294967296L).otherwise(u)
  }

  private val PngIhdrHex = "49484452"

  /** (fmt, width, height, top_down) struct columns for one blob —
    * fmt ∈ {png, gif, bmp} from the shared router, NULL otherwise;
    * dims NULL on truncation or non-positive reads. */
  private def parsed(c: Column): (Column, Column, Column, Column) = {
    val mime = Multimodal.sniffType(c)
    val fmt = when(mime === "image/png", "png")
      .when(mime === "image/gif", "gif")
      .when(mime === "image/bmp", "bmp")
    def positive(v: Column): Column = when(v > 0L, v)
    val pngOk = length(c) >= 24 && hexAt(c, 13, 4) === PngIhdrHex
    val pngW = when(pngOk, positive(be(c, 17, 4)))
    val pngH = when(pngOk, positive(be(c, 21, 4)))
    val gifOk = length(c) >= 10
    val gifW = when(gifOk, positive(le(c, 7, 2)))
    val gifH = when(gifOk, positive(le(c, 9, 2)))
    val bmpOk = length(c) >= 26
    val bmpHRaw = leSigned(c, 23)
    val bmpW = when(bmpOk, positive(leSigned(c, 19)))
    val bmpH = when(bmpOk, positive(abs(bmpHRaw)))
    val w = when(fmt === "png", pngW).when(fmt === "gif", gifW)
      .when(fmt === "bmp", bmpW)
    val h = when(fmt === "png", pngH).when(fmt === "gif", gifH)
      .when(fmt === "bmp", bmpH)
    // a truncated BMP cannot report orientation — NULL, never a guess
    val td = when(fmt === "bmp",
        when(bmpOk, (bmpHRaw < 0L).cast("long")))
      .when(fmt.isNotNull, lit(0L))
    (fmt, w, h, td)
  }

  /** Appends fmt / width / height / top_down to `df` — one codegen'd
    * projection, no shuffle, no kernel. */
  def withDims(df: DataFrame, contentCol: String): DataFrame = {
    Reserved.guard(df.columns.toSeq,
      Seq("fmt", "width", "height", "top_down"), "ImageHeaders")
    val (fmt, w, h, td) = parsed(col(contentCol))
    df.withColumn("fmt", fmt).withColumn("width", w)
      .withColumn("height", h).withColumn("top_down", td)
  }

  /** Resolution audit rollup: per format (unparsed blobs under
    * 'other'), counts, dimension mass, the sub-`minSide` screen count
    * and the top-down orientation count — ONE narrow projection + ONE
    * map-side-combinable aggregation. */
  def resolutionAudit(df: DataFrame, contentCol: String,
      minSide: Long): DataFrame =
    withDims(df, contentCol)
      .groupBy(coalesce(col("fmt"), lit("other")).as("fmt"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("width")).as("sum_w"),
        sum(col("height")).as("sum_h"),
        count(when(col("width") < minSide
          || col("height") < minSide, 1)).as("n_small"),
        sum(col("top_down")).as("n_topdown"))

  // ---- JPEG: the kernel-shaped sibling (r14, the documented
  // follow-up from the expression path's scaladoc) -------------------

  /** JPEG dimensions via the SOF marker walk (ITU T.81 §B.2): after
    * the FFD8 SOI, segments are FF+marker(+u16 big-endian length that
    * COUNTS ITSELF); dimensions live in the first SOFn header
    * (C0–CF minus C4/C8/CC — DHT/JPG/DAC carry tables, not frames) as
    * precision(1) height(2) width(2). The offset is DATA-DEPENDENT
    * (APP/COM segments of arbitrary length precede it), so this is a
    * walk, not a slice — the [[IsoBmff]] per-blob kernel shape, NOT a
    * Catalyst expression.
    *
    * Violation contract (the L149 convention — None, never garbage):
    * missing SOI, a non-FF where a marker must start, a segment
    * length < 2, a truncated SOF, zero dimensions, or SOS/EOI reached
    * BEFORE any SOF (dims must precede entropy-coded data). Fill FF
    * bytes before a marker are legal padding and consumed. The cursor
    * strictly advances, so a crafted segment soup terminates by
    * construction — no step-count bomb guard needed. */
  private[graft] def jpegDims(b: Array[Byte]): Option[(Long, Long)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      var j = i // consume fill FFs: marker is the first non-FF byte
      while (j + 1 < b.length && (b(j + 1) & 0xff) == 0xff) j += 1
      if (j + 1 >= b.length) return None
      val marker = b(j + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS first
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
        i = j + 2 // standalone marker: no length field
      } else {
        if (j + 3 >= b.length) return None
        val len = ((b(j + 2) & 0xff) << 8) | (b(j + 3) & 0xff)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 9 || j + 8 >= b.length) return None
          val h = ((b(j + 5) & 0xff) << 8) | (b(j + 6) & 0xff)
          val w = ((b(j + 7) & 0xff) << 8) | (b(j + 8) & 0xff)
          return if (w > 0 && h > 0) Some((w.toLong, h.toLong)) else None
        }
        i = j + 2 + len
      }
    }
    None
  }

  /** Per-blob JPEG dims for the rows the shared router sniffs as
    * image/jpeg: (idCol, width, height), NULL dims on any violation.
    * The sniff filter pushes into the scan, so at corpus scale the
    * kernel only ever sees jpeg-magic rows. */
  def jpegDimsOf(df: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    Reserved.guard(Seq(idCol), Seq("width", "height"), "ImageHeaders")
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(idCol).isNotNull && col(contentCol).isNotNull &&
        Multimodal.sniffType(col(contentCol)) === "image/jpeg")
      .select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        jpegDims(bytes) match {
          case Some((w, h)) => (id, Option(w), Option(h))
          case None => (id, None: Option[Long], None: Option[Long])
        }
      })
      .toDF(idCol, "width", "height")
  }
}
