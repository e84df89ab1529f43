package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside an opaque media blob. */
final case class MediaMeta(n_bytes: Long, checksum: String, media_type: String)

/** One multimodal record: opaque binary content + typed metadata.
  * At 100 TB the `content` column dominates row size — partition sizing
  * must budget for it (`spark.sql.files.maxPartitionBytes`), and queries
  * that only touch metadata must NOT read it (parquet column pruning does
  * this for free as long as the blob is a separate top-level column). */
final case class MediaRecord(doc_id: Long, content: Array[Byte], meta: MediaMeta)

/** Features extracted from a decoded media blob. The decode itself is
  * STUBBED (no image/audio libs in this container — builder brief): shapes
  * are derived deterministically from the blob so tests are exact. */
final case class MediaFeatures(doc_id: Long, width: Int, height: Int,
    n_frames: Int, feat_checksum: String)

/** Multimodal-column handling for LLM data pipelines (BASELINE.json north
  * star): treat image/audio/video as opaque `binary` columns with typed
  * metadata; decode/feature-extract runs per-partition over the typed
  * Dataset — the Scala analog of `mapInPandas` batch processing: one
  * iterator per partition, library handles (a real decoder, a model) would
  * be initialized once per partition, rows streamed through.
  *
  * Decode status (r13): IMAGE decode is REAL — [[decodeImage]] /
  * [[imageDHashKernel]] decode PNG/BMP/GIF/JPEG with the JDK's headless
  * `javax.imageio` into the same 4×9 luminance grid the hash machinery
  * consumes (spec-gated on hand-computed pixel fixtures; DuckDB can't
  * decode PNG, so no SQL oracle). AUDIO decode is REAL as of r13 —
  * [[decodeAudio]] / [[audioFingerprintKernel]] decode WAV/AU/AIFF with
  * `javax.sound.sampled` into a 33-cell integer energy grid and a
  * 32-bit temporal fingerprint the same banding machinery consumes
  * (spec-gated the same way). The TEXT-blob path ([[decodeStub]],
  * [[luminanceGrid]]) remains the deliberate oracle-paired form — it is
  * what the battery's q_m* queries run so the DuckDB oracle can replay
  * them — and VIDEO decode stays stubbed (the JDK ships no video
  * codec; documented at [[decodeAudio]]). The Spark-side plumbing —
  * schema, encoders, partition-iterator batch shape, column pruning —
  * is real and tested on all paths. */
object Multimodal {

  /** Pack a text table into multimodal shape: content = UTF-8 bytes (stands
    * in for image/audio payloads), metadata as a typed struct. Pure narrow
    * projection, fuses with the scan. */
  def packBinary(df: DataFrame, idCol: String, textCol: String,
      mediaType: String = "text/plain", keep: Seq[String] = Nil): DataFrame =
    df.select(Seq(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("content"),
      struct(
        length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        md5(col(textCol).cast("binary")).as("checksum"),
        lit(mediaType).as("media_type")).as("meta")) ++ keep.map(col): _*)

  /** STUB decoder — stands in for an image/audio decode library that is not
    * in this container. Deterministic: dimensions derive from blob length,
    * the feature checksum from the bytes, so tests and oracles are exact.
    * A real implementation would decode `rec.content` here (one decoder
    * instance per partition, initialized before the iterator is consumed). */
  def decodeStub(rec: MediaRecord): MediaFeatures = {
    val n = rec.meta.n_bytes
    MediaFeatures(
      doc_id = rec.doc_id,
      width = (n % 1920L).toInt,
      height = ((n * 7919L) % 1080L).toInt,
      n_frames = (n / 64L).toInt + 1,
      feat_checksum = rec.meta.checksum)
  }

  /** Decode / feature-extract over the typed Dataset, batch-shaped: one
    * partition = one iterator = one (stub) decoder instance. This is the
    * `mapInPandas` pattern in Scala — per-partition setup cost amortized
    * over the partition's rows, executors stream rows without
    * materializing the partition. */
  def extractFeatures(ds: Dataset[MediaRecord])
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { rows =>
      // per-partition decoder init would go here (STUB: nothing to open)
      rows.map(decodeStub)
    }
  }

  /** Frame/chunk sampling on the raw blob: every `stride`-th `chunkBytes`
    * slice, as a preview array — the Spark-side shape of video frame
    * sampling (`substring` on binary is a codegen'd expression; no UDF). */
  def sampleChunks(df: DataFrame, chunkBytes: Int = 16, stride: Int = 4,
      maxChunks: Int = 8): DataFrame =
    df.withColumn("chunks",
      transform(
        sequence(lit(0), least(
          (length(col("content")) / (chunkBytes * stride)).cast("int"),
          lit(maxChunks - 1))),
        i => col("content").substr(i * (chunkBytes * stride) + 1, lit(chunkBytes))))

  /** STUB resize — the remaining op of the brief's decode / extract /
    * resize / frame-sample set. A real pipeline decodes, resamples to the
    * target dimensions and re-encodes; without codecs in this container
    * the plumbing is kept exact and codegen'd: the output blob is the
    * input truncated to the target byte budget (binary `substr` — a
    * Catalyst expression, no UDF), metadata is refreshed from the NEW
    * content, and the target dimensions ride along as columns. Byte
    * budget = targetW × targetH × bytesPerPx (default ⅛ byte/px — a
    * 1-bit-deep stand-in that keeps test blobs non-trivially truncated). */
  def resizeStub(df: DataFrame, targetW: Int, targetH: Int,
      bytesPerPx: Double = 0.125): DataFrame = {
    val targetBytes = math.max(1, (targetW * targetH * bytesPerPx).toInt)
    df.withColumn("content",
        col("content").substr(lit(1),
          least(length(col("content")), lit(targetBytes))))
      .withColumn("meta", struct(
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("checksum"),
        concat(col("meta.media_type"),
          lit(s";resized=${targetW}x$targetH")).as("media_type")))
      .withColumn("width", lit(targetW))
      .withColumn("height", lit(targetH))
  }

  /** STUB luminance decode for [[perceptualNearDup]] — the grid a real
    * image pipeline gets by DOWNSCALING the decoded picture to
    * `cells` pixels: cell k's luminance is the integer-mean code point
    * of the k-th contiguous slice of the blob's UTF-8 interpretation
    * (boundaries `floor(k·n/cells)`, floor-mean). Deterministic, exact
    * on both engines (DuckDB replays it with `ord`/`substr`), and it
    * has the property the hash needs: a small local edit perturbs one
    * cell's mean slightly instead of shifting every sample (a
    * positional char-sample hash collapses to exact-dup-only — tried
    * and measured during r10 calibration). All-ASCII corpus assumed
    * (the testdata is; `ascii`/`ord` both return the code point of the
    * first char so parity holds per-char regardless). Empty slices
    * (blob shorter than the grid) read luminance 0. */
  private[graft] def luminanceGrid(text: Column, cells: Int): Column = {
    val n = length(text).cast("long")
    transform(sequence(lit(0), lit(cells - 1)), k => {
      val start = call_function("div", k.cast("long") * n, lit(cells.toLong))
      val end = call_function("div", (k.cast("long") + 1L) * n,
        lit(cells.toLong))
      when(end > start,
        call_function("div",
          aggregate(sequence(start, end - 1), lit(0L),
            (acc, i) => acc + ascii(text.substr(i + 1, lit(1))).cast("long")),
          end - start))
        .otherwise(lit(0L))
    })
  }

  /** 32-bit difference hash (dHash) over a 4×9 luminance grid: bit
    * b = 1 iff cell (b/8, b%8) is darker than its right neighbor —
    * the standard perceptual-hash construction (Krawetz's dHash),
    * 8 comparisons per row so the row boundary never compares across
    * rows. Integer-exact, fits a BIGINT with headroom. */
  private[graft] def dHash32(lum: Column): Column =
    aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, b) => {
      val k1 = call_function("div", b, lit(8L)) * 9 + pmod(b, lit(8L))
      acc + when(
        element_at(lum, (k1 + 1).cast("int"))
          < element_at(lum, (k1 + 2).cast("int")),
        call_function("shiftleft", lit(1L), b.cast("int")))
        .otherwise(lit(0L))
    })

  /** The 32 dHash comparisons over a 4×9 luminance grid, shared by the
    * stub kernel and the REAL image kernel so the bit construction
    * cannot drift between them (and both stay pinned to [[dHash32]]'s
    * expression spec). */
  private[graft] def dHashBits(lum: Array[Long]): Long = {
    var ph = 0L
    var b = 0
    while (b < 32) {
      val k1 = b / 8 * 9 + b % 8
      if (lum(k1) < lum(k1 + 1)) ph |= 1L << b
      b += 1
    }
    ph
  }

  /** The scoring-path form of [[luminanceGrid]]+[[dHash32]]: a JIT'd
    * typed kernel (the [[Similarity.int8Codes]] discipline), one
    * (id, ph) row per blob. Why not the expression form in the hot
    * path: [[dHash32]] references its `lum` argument 2×32 times, and
    * interpreted higher-order-function evaluation INLINES the full
    * 36-cell grid into every reference — measured 46 ms/row at sf0.1
    * (230 s for 5000 docs; the innocent-looking `h.count()` probe read
    * 1.8 s only because count() PRUNES the hash column entirely). The
    * plain-Scala loop is ~µs/row. Kernel ≡ expression is spec-pinned
    * (MultimodalSpec), and the DuckDB oracle replays the same spec. */
  private[graft] def dHashKernel(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val n = text.length
          val lum = new Array[Long](36)
          var k = 0
          while (k < 36) {
            val start = k * n / 36; val end = (k + 1) * n / 36
            if (end > start) {
              var s = 0L; var i = start
              while (i < end) { s += text.charAt(i).toLong; i += 1 }
              lum(k) = Math.floorDiv(s, (end - start).toLong)
            }
            k += 1
          }
          (id, dHashBits(lum))
        }
      }.toDF("id", "ph")
  }

  /** A really-decoded image: pixel dimensions plus the 4×9 luminance
    * grid the perceptual-hash machinery consumes. */
  final case class DecodedImage(width: Int, height: Int, lum36: Array[Long])

  /** REAL image decode (r12, VERDICT r11 #3 — closes the one
    * kernel-stub in the multimodal family): decodes PNG/BMP/GIF/JPEG
    * bytes with the JDK's headless `javax.imageio` (zero new jars;
    * probed in this container — full reader set available), computes
    * integer BT.601 luminance per pixel (`(299·R + 587·G + 114·B) DIV
    * 1000` — exact, alpha ignored/assumed opaque), and box-downsamples
    * to the SAME 4×9 grid the stub path produces: cell (r, c) covers
    * pixel rows [r·H/4, (r+1)·H/4) × cols [c·W/9, (c+1)·W/9) (floor
    * boundaries, the [[luminanceGrid]] slice convention), cell value =
    * floor-mean. Undecodable bytes (truncated file, not an image)
    * return None — the kernel drops them rather than hashing garbage.
    *
    * Oracle stance: this kernel is SPEC-GATED, not oracled — DuckDB
    * cannot decode PNG, so the gate is `MultimodalImageSpec`'s
    * hand-computed reference fixtures (1-pixel-per-cell images where
    * the grid IS the pixel matrix, block-constant images where the
    * box mean is exact, PNG ≡ BMP cross-format agreement). The
    * banding/pairing machinery downstream is UNCHANGED and stays
    * oracle-covered through q_m6's stub path. */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null || bytes.isEmpty) return None
    Headless // force the headless flag before first AWT touch
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val lum = new Array[Long](36)
      var k = 0
      while (k < 36) {
        val r = k / 9; val c = k % 9
        val y0 = r * h / 4; val y1 = (r + 1) * h / 4
        val x0 = c * w / 9; val x1 = (c + 1) * w / 9
        if (y1 > y0 && x1 > x0) {
          var s = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              s += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff)
                + 114L * (rgb & 0xff)) / 1000L
              x += 1
            }
            y += 1
          }
          lum(k) = Math.floorDiv(s, ((y1 - y0).toLong * (x1 - x0)))
        }
        k += 1
      }
      Some(DecodedImage(w, h, lum))
    }
  }

  /** One-time JVM headless flag — PNG/BMP readers never need a display,
    * but AWT must know before its first class initializes on an
    * executor. */
  private lazy val Headless: Unit =
    System.setProperty("java.awt.headless", "true")

  /** [[dHashKernel]]'s REAL-image sibling: (id, ph) from actually
    * decoded pixels — decode → BT.601 luminance → 4×9 box mean →
    * [[dHashBits]] (the construction shared with the stub kernel, so
    * the two paths cannot drift). Undecodable blobs are dropped.
    * Same mapPartitions batch shape: decode state is JVM-static
    * (ImageIO's reader registry), rows stream through, output is
    * 16 bytes/row no matter the blob size. */
  def imageDHashKernel(df: DataFrame, idCol: String,
      contentCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(idCol).isNotNull && col(contentCol).isNotNull)
      .select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeImage(bytes).map(d => (id, dHashBits(d.lum36)))
        }
      }.toDF("id", "ph")
  }

  /** The 4×8-bit band rows of a (id, ph) hash frame — (band, key, id),
    * one row per band. Shared by the batch operator and
    * [[graft.streaming.StreamingPerceptualDedup]] so the two banding
    * derivations cannot drift (the NearDup.bandKeyRows discipline). */
  private[graft] def phashBands(h: DataFrame): DataFrame =
    h.select(col("id"), col("ph"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .select(col("band"),
        call_function("shiftright", col("ph"), (col("band") * 8)
          .cast("int")).bitwiseAND(lit(255L)).as("key"),
        col("id"))

  /** Perceptual near-duplicate pairs over the multimodal surface
    * (VERDICT r9 #4): exact binary dedup (q_m5) catches only identical
    * blobs; real multimodal curation needs near-dup on DECODED content.
    * Each blob stub-decodes to a luminance grid, hashes to a 32-bit
    * dHash, and pairs within Hamming distance `maxHamming` are found by
    * the L3 SimHash banding machinery: 4 bands of 8 bits, a pair
    * agreeing on ≥1 band meets in a band-keyed equi-join bucket
    * ([[NearDup.bucketPairs]] — never an all-pairs product), then the
    * TRUE Hamming distance filters the candidates. By pigeonhole a
    * pair within Hamming 3 cannot differ in all 4 bands, so for
    * `maxHamming` ≤ 3 the result EQUALS the exhaustive all-pairs scan
    * — q_m6's oracle replays exactly that. `maxBucketSize` is the
    * usual banding skew valve; at the default it never triggers on the
    * gate corpora (hottest band bucket: 217 ids at sf0.1).
    *
    * 100 TB shape: the corpus shuffles 12-byte (id, band, key) rows —
    * never blobs; candidate expansion is bounded per bucket; the
    * hamming filter touches only banded candidates.
    *
    * Scaling law (the bits-~-log n rule every banding operator here
    * documents, stated honestly for THIS preset): an 8-bit band has
    * only 256 values, so band buckets grow ~n/256 and candidate pairs
    * ~n²/256 per band — fine at gate scale (hottest bucket 217 ids at
    * sf0.1), a capacity wall around n ≈ 10⁶. Beyond that the hash must
    * widen (a 64-bit dHash over a finer grid with 16-bit bands holds
    * to ~10⁹; band width ~log₂(n) − 8) and `maxHamming`'s pigeonhole
    * band count scales with it — the same growth path the LSH family's
    * `bits`/`tables` presets document. `maxBucketSize` then degrades
    * over-capacity buckets to recall loss rather than a quadratic
    * stall, exactly like the LSH valves. */
  def perceptualNearDup(df: DataFrame, idCol: String = "doc_id",
      maxHamming: Int = 3, maxBucketSize: Int = 1 << 20,
      contentCol: String = "content"): DataFrame = {
    require(df.columns.contains(contentCol),
      s"blob column '$contentCol' not in [${df.columns.mkString(", ")}]")
    perceptualNearDupFromHashes(
      dHashKernel(
        df.filter(col(idCol).isNotNull && col(contentCol).isNotNull)
          .withColumn(contentCol, col(contentCol).cast("string")),
        idCol, contentCol),
      maxHamming, maxBucketSize)
  }

  /** The banding + true-Hamming pairing over a precomputed (id, ph)
    * hash frame — the machinery [[perceptualNearDup]] (stub kernel) and
    * the REAL [[imageDHashKernel]] path share, so "q_m6's machinery
    * accepts really-decoded hashes" is true by construction (and
    * spec-exercised end-to-end on encoded fixtures in
    * MultimodalImageSpec). */
  def perceptualNearDupFromHashes(hashes: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 1 << 20): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming $maxHamming breaks the 4-band exactness guarantee")
    NearDup.materialized { cache =>
      val h = cache(hashes.select(col("id").cast("long"), col("ph")))
      val pairs = NearDup.bucketPairs(phashBands(h), maxBucketSize)
      pairs
        .join(h.select(col("id").as("id_a"), col("ph").as("pha")), "id_a")
        .join(h.select(col("id").as("id_b"), col("ph").as("phb")), "id_b")
        .select(col("id_a"), col("id_b"),
          bit_count(col("pha").bitwiseXOR(col("phb"))).cast("int")
            .as("hamming"))
        .filter(col("hamming") <= maxHamming)
    }
  }

  /** A really-decoded audio clip: stream parameters plus the 33-cell
    * integer frame-energy grid the fingerprint machinery consumes. */
  final case class DecodedAudio(sampleRateHz: Int, channels: Int,
      nFrames: Long, energy33: Array[Long])

  /** Number of temporal energy cells; 33 cells give the 32 adjacent
    * comparisons of [[audioFingerprintBits]] — the 1-D analog of the
    * image path's 4×9-grid/32-bit dHash. */
  private[graft] val AudioCells = 33

  /** REAL audio decode (r13, VERDICT r12 #3 — the audio half of the
    * stub→real closure r12 made for images): decodes WAV/AU/AIFF bytes
    * with the JDK's `javax.sound.sampled` (zero new jars; probed in
    * this container — WAVE/AU/AIFF readers all present, PCM payloads
    * round-trip bit-exactly), mixes channels to mono by integer
    * floor-mean, and box-downsamples |sample| to a 33-cell temporal
    * energy grid: cell k covers frames [k·n/33, (k+1)·n/33) (floor
    * boundaries — the [[luminanceGrid]] slice convention), cell value =
    * floor-mean of absolute amplitude in the 16-bit domain (8-bit
    * samples scale ×256 first, so an 8-bit render of a tone lands on
    * the same grid as its 16-bit render). Non-PCM encodings (µ-law,
    * a-law, 24-bit) go through the JDK's own conversion to 16-bit
    * signed PCM when it supports them. Undecodable bytes (truncated
    * file, not audio, unconvertible encoding, zero frames) return None
    * — the kernel drops them rather than fingerprinting garbage.
    *
    * Oracle stance: SPEC-GATED like [[decodeImage]] — DuckDB cannot
    * parse WAV, so the gate is `MultimodalAudioSpec`'s hand-computed
    * PCM fixtures (1-frame-per-cell clips where the grid IS the
    * |sample| vector, block-constant tones where the box mean is
    * exact, WAV ≡ AIFF ≡ AU cross-format agreement, stereo mix and
    * 8-bit ≡ 16-bit scale parity). The banding/pairing machinery
    * downstream is UNCHANGED and stays oracle-covered through q_m6's
    * stub path.
    *
    * VIDEO stays an honest boundary: the JDK ships no video decoder
    * (no MP4/H.264/VP9 demuxer or codec in `java.*`/`javax.*`), so
    * video decode remains the documented stub — the frame-sample
    * PLUMBING ([[sampleChunks]]) is real; a deployment adds a codec
    * library and slots it into the same mapPartitions batch shape. */
  def decodeAudio(bytes: Array[Byte]): Option[DecodedAudio] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (bytes == null || bytes.isEmpty) return None
    try {
      val base = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f0 = base.getFormat
      val pcm = f0.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
        f0.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
      val in =
        if (pcm && (f0.getSampleSizeInBits == 8 || f0.getSampleSizeInBits == 16))
          base
        else AudioSystem.getAudioInputStream( // JDK-provided conversion
          new AudioFormat(f0.getSampleRate, 16, f0.getChannels, true, false),
          base)
      val fmt = in.getFormat
      val data = in.readAllBytes()
      val mono = pcmMono(data, fmt.getSampleSizeInBits, fmt.getChannels,
        fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED,
        fmt.isBigEndian)
      if (mono.isEmpty) None
      else Some(DecodedAudio(math.round(fmt.getSampleRate),
        fmt.getChannels, mono.length.toLong, energyGrid(mono)))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None // unconvertible encoding
    }
  }

  /** Raw PCM frames → mono samples in the signed 16-bit domain.
    * 16-bit: signed, either endianness. 8-bit: scaled ×256 (signed
    * shifts; unsigned re-centers at 128 first). Channels mix by
    * integer floor-mean. Trailing partial frames are dropped (a
    * truncated stream yields the frames it holds). */
  private[graft] def pcmMono(data: Array[Byte], bits: Int, channels: Int,
      unsigned: Boolean, bigEndian: Boolean): Array[Long] = {
    if (bits != 8 && bits != 16) return Array.empty
    if (channels < 1) return Array.empty
    val bps = bits / 8
    val frame = channels * bps
    val n = data.length / frame
    val mono = new Array[Long](n)
    var i = 0
    while (i < n) {
      var s = 0L
      var c = 0
      while (c < channels) {
        val o = i * frame + c * bps
        s += (if (bits == 16) {
          val lo = if (bigEndian) data(o + 1) else data(o)
          val hi = if (bigEndian) data(o) else data(o + 1)
          ((hi.toInt << 8) | (lo.toInt & 0xff)).toLong
        } else if (unsigned) ((data(o).toInt & 0xff) - 128).toLong << 8
        else data(o).toLong << 8)
        c += 1
      }
      mono(i) = Math.floorDiv(s, channels.toLong)
      i += 1
    }
    mono
  }

  /** 33-cell absolute-amplitude box means over a mono sample vector —
    * floor boundaries and floor-means, the house slice convention.
    * Empty slices (clip shorter than the grid) read energy 0. */
  private[graft] def energyGrid(mono: Array[Long]): Array[Long] = {
    val n = mono.length
    val g = new Array[Long](AudioCells)
    var k = 0
    while (k < AudioCells) {
      val start = k * n / AudioCells
      val end = (k + 1) * n / AudioCells
      if (end > start) {
        var s = 0L
        var i = start
        while (i < end) { s += math.abs(mono(i)); i += 1 }
        g(k) = Math.floorDiv(s, (end - start).toLong)
      }
      k += 1
    }
    g
  }

  /** 32-bit temporal difference fingerprint over the 33-cell energy
    * grid: bit b = 1 iff cell b is quieter than cell b+1 — the 1-D
    * analog of [[dHashBits]]'s darker-than-right-neighbor construction
    * (adjacent comparisons, so a local edit flips a couple of bits
    * instead of shifting every one — the property the Hamming-banding
    * machinery needs). */
  private[graft] def audioFingerprintBits(energy: Array[Long]): Long = {
    var ph = 0L
    var b = 0
    while (b < 32) {
      if (energy(b) < energy(b + 1)) ph |= 1L << b
      b += 1
    }
    ph
  }

  /** [[imageDHashKernel]]'s audio sibling: (id, ph) from actually
    * decoded PCM — decode → mono mix → 33-cell energy grid →
    * [[audioFingerprintBits]]. Undecodable blobs are dropped. Same
    * mapPartitions batch shape (decode state is JVM-static —
    * AudioSystem's reader registry), output 16 bytes/row no matter the
    * clip size, and the output frame feeds
    * [[perceptualNearDupFromHashes]] UNCHANGED — audio near-dup rides
    * the exact banding + true-Hamming machinery q_m6 oracles. */
  def audioFingerprintKernel(df: DataFrame, idCol: String,
      contentCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(idCol).isNotNull && col(contentCol).isNotNull)
      .select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeAudio(bytes).map(d => (id, audioFingerprintBits(d.energy33)))
        }
      }.toDF("id", "ph")
  }

  /** Per-clip audio QUALITY audit (r15, L177 — the signal-level
    * screen the fingerprint path doesn't ask: "is this clip clipped,
    * silent, or healthy", the audio analog of L12's text quality
    * ratios, over the SAME real `javax.sound.sampled` decode as
    * [[decodeAudio]]): peak |amplitude|, clipped-sample count and
    * silent-sample count over the mono mix in the signed 16-bit
    * domain. Thresholds are part of the statistic's definition
    * (documented constants, not tunables hidden in code):
    * [[ClipLevel]] = 32512 (within half an 8-bit step of full scale
    * — a limiter's flat-top lands here whatever dither did) and
    * [[SilenceLevel]] = 256 (below the 8-bit LSB). Both apply to the
    * MONO MIX — a stereo pair clipping out of phase can de-clip in
    * the mix; stated convention, spec-pinned. Undecodable bytes emit
    * NULL metrics (the L176/L149 violation contract). */
  final case class AudioQuality(sampleRateHz: Int, channels: Int,
      nFrames: Long, peak: Long, nClipped: Long, nSilent: Long)

  private[graft] val ClipLevel = 32512L
  private[graft] val SilenceLevel = 256L

  def audioQuality(bytes: Array[Byte]): Option[AudioQuality] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (bytes == null || bytes.isEmpty) return None
    try {
      val base = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f0 = base.getFormat
      val pcm = f0.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
        f0.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
      val in =
        if (pcm && (f0.getSampleSizeInBits == 8 || f0.getSampleSizeInBits == 16))
          base
        else AudioSystem.getAudioInputStream(
          new AudioFormat(f0.getSampleRate, 16, f0.getChannels, true, false),
          base)
      val fmt = in.getFormat
      val data = in.readAllBytes()
      val mono = pcmMono(data, fmt.getSampleSizeInBits, fmt.getChannels,
        fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED,
        fmt.isBigEndian)
      if (mono.isEmpty) None
      else {
        var peak = 0L; var clip = 0L; var silent = 0L
        var i = 0
        while (i < mono.length) {
          val a = math.abs(mono(i))
          if (a > peak) peak = a
          if (a >= ClipLevel) clip += 1
          if (a < SilenceLevel) silent += 1
          i += 1
        }
        Some(AudioQuality(math.round(fmt.getSampleRate), fmt.getChannels,
          mono.length.toLong, peak, clip, silent))
      }
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None
    }
  }

  /** DataFrame wrapper over [[audioQuality]] — the L149 kernel shape:
    * (idCol, sample_rate, channels, n_frames, peak, n_clipped,
    * n_silent), all NULL on undecodable bytes. */
  def audioQualityAudit(df: DataFrame, idCol: String,
      contentCol: String = "content"): DataFrame = {
    Reserved.guard(Seq(idCol), Seq("sample_rate", "channels",
      "n_frames", "peak", "n_clipped", "n_silent"), "Multimodal")
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(idCol).isNotNull && col(contentCol).isNotNull)
      .select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          audioQuality(bytes) match {
            case Some(a) =>
              (id, Option(a.sampleRateHz.toLong), Option(a.channels.toLong),
                Option(a.nFrames), Option(a.peak), Option(a.nClipped),
                Option(a.nSilent))
            case None =>
              (id, None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long])
          }
        }
      }
      .toDF(idCol, "sample_rate", "channels", "n_frames", "peak",
        "n_clipped", "n_silent")
  }

  /** Deterministic synthetic 16-bit mono PCM WAV from a non-negative
    * id column (the q_m9/q_m13 corpus-builder discipline, and the
    * piece that makes the audio audit ORACLE-ABLE where the energy
    * fingerprint stays spec-gated: the PCM payload is a closed-form
    * square wave, so peak/clip/silence replay as formulas while the
    * JDK's WAV parse must invert this writer's 44-byte canonical
    * header):
    *   n = 64 + 2·(id % 19) frames at 8000 Hz;
    *   amplitude a = min(32767, 1024·(id % 33)) — id % 33 = 0 gives
    *   an all-silent clip, id % 33 = 32 an all-clipped one;
    *   samples alternate +a, −a (LE two's complement);
    *   every 23rd doc truncates the RIFF header — the violation leg. */
  def syntheticWav(v: Column): Column = {
    def hex2(c: Column) = lpad(hex(c.cast("long")), 2, "0")
    def le16(c: Column) = concat(hex2(pmod(c, lit(256L))),
      hex2(call_function("div", c, lit(256L))))
    def le32(c: Column) = concat(
      hex2(pmod(c, lit(256L))),
      hex2(pmod(call_function("div", c, lit(256L)), lit(256L))),
      hex2(pmod(call_function("div", c, lit(65536L)), lit(256L))),
      hex2(call_function("div", c, lit(16777216L))))
    val n = lit(64L) + pmod(v, lit(19L)) * 2L
    val a = least(lit(32767L), lit(1024L) * pmod(v, lit(33L)))
    val pos = le16(a)
    val neg = le16(pmod(lit(65536L) - a, lit(65536L)))
    val dataSize = n * 2L
    val header = concat(lit("52494646"), le32(dataSize + 36L),
      lit("57415645"), lit("666d7420"), le32(lit(16L)), le16(lit(1L)),
      le16(lit(1L)), le32(lit(8000L)), le32(lit(16000L)),
      le16(lit(2L)), le16(lit(16L)), lit("64617461"), le32(dataSize))
    val payload = call_function("repeat", concat(pos, neg),
      call_function("div", n, lit(2L)).cast("int"))
    val whole = concat(header, payload)
    // violation leg: truncate into the fmt chunk
    unhex(when(pmod(v, lit(23L)) === 0L, substring(whole, 1, 24))
      .otherwise(whole))
  }

  /** Magic-byte media-type sniff (r13, L145) — the container-level
    * truth check of the multimodal front: a crawl's DECLARED
    * content-type lies constantly (mislabeled uploads, extension-based
    * servers, corrupted truncations), and every real ingest sniffs the
    * leading bytes before routing a blob to a decoder. Pure codegen'd
    * expression: hex the first 12 bytes once, compare published magic
    * numbers — PNG (89504E470D0A1A0A), JPEG (FFD8FF), GIF87a/89a,
    * RIFF····WAVE, BMP (424D), PDF (25504446), ZIP (504B0304),
    * gzip (1F8B) — longest/most-specific first; anything else is
    * `application/octet-stream`, null/empty blobs sniff NULL. The
    * rules replay verbatim in the oracle over the hex rendering
    * (DuckDB slices the hex string; Spark hexes only the 12-byte
    * binary prefix — same comparisons either way). Spec-gated against
    * REAL encoder output: the bytes `javax.imageio` /
    * `javax.sound.sampled` / `GZIPOutputStream` / `ZipOutputStream`
    * actually produce must sniff to their own types — the sniffer and
    * the r12/r13 real decoders agree by test, not by assumption. */
  def sniffType(content: Column): Column = {
    val h = hex(substring(content, 1, 12))
    when(content.isNull || length(content) === 0,
      lit(null).cast("string"))
      .when(h.startsWith("89504E470D0A1A0A"), lit("image/png"))
      .when(h.startsWith("FFD8FF"), lit("image/jpeg"))
      .when(h.startsWith("474946383761")
        || h.startsWith("474946383961"), lit("image/gif"))
      .when(h.startsWith("52494646")
        && substring(h, 17, 8) === "57415645", lit("audio/wav"))
      // ISO-BMFF: 'ftyp' at bytes 5-8 (after the 4-byte box size) —
      // added r14 with the L149 parser so the router and the metadata
      // walk agree on what is a video container (IsoBmffSpec pins
      // syntheticMp4 output sniffing to this very type)
      .when(substring(h, 9, 8) === "66747970", lit("video/mp4"))
      // EBML magic (RFC 8794): Matroska/WebM containers — added r16
      // with the L-family Ebml walk so the router and the metadata
      // parser agree (EbmlSpec pins syntheticWebm output to this)
      .when(h.startsWith("1A45DFA3"), lit("video/webm"))
      // Ogg capture pattern (RFC 3533) — added r16 with the Ogg walk
      // (OggSpec pins syntheticOgg output to this)
      .when(h.startsWith("4F676753"), lit("audio/ogg"))
      // FLAC stream marker (RFC 9639) — added r17 with the Flac walk
      // (FlacSpec pins syntheticFlac output to this)
      .when(h.startsWith("664C6143"), lit("audio/flac"))
      .when(h.startsWith("424D"), lit("image/bmp"))
      .when(h.startsWith("25504446"), lit("application/pdf"))
      .when(h.startsWith("504B0304"), lit("application/zip"))
      .when(h.startsWith("1F8B"), lit("application/gzip"))
      .otherwise(lit("application/octet-stream"))
  }

  /** Declared-vs-sniffed audit rollup: per (declared, sniffed) pair,
    * the doc count and a mismatch flag — the corruption/mislabeling
    * report a multimodal ingest reads before trusting `media_type`.
    * One narrow projection + one hash aggregation. */
  def declaredMismatch(df: DataFrame, declaredCol: String,
      contentCol: String = "content"): DataFrame =
    df.select(col(declaredCol).as("declared"),
        sniffType(col(contentCol)).as("sniffed"))
      .filter(col("sniffed").isNotNull)
      .groupBy(col("declared"), col("sniffed"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("mismatch",
        (col("declared") =!= col("sniffed")).cast("long"))

  /** Metadata-only profile per group — demonstrates that blob-free queries
    * prune the `content` column out of the scan entirely (check
    * `.explain`'s ReadSchema). */
  def metaProfile(df: DataFrame, groupCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        countDistinct(col("meta.checksum")).as("distinct_blobs"))
}
