package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec

/** REAL image decode for the perceptual family (r12, VERDICT r11 #3).
  * This is the spec GATE for the one kernel DuckDB cannot oracle
  * (PNG decode): hand-computed reference fixtures pin the decode →
  * BT.601 luminance → 4×9 box-mean → dHash chain, cross-format
  * PNG ≡ BMP agreement pins the codec independence, and the end-to-end
  * test proves q_m6's banding machinery accepts really-decoded hashes
  * unchanged. */
class MultimodalImageSpec extends SparkSpec {
  import spark.implicits._

  /** Encode a 2-D grayscale matrix (row-major, values 0..255) as image
    * bytes in the given format. Gray pixels make BT.601 exact:
    * (299g + 587g + 114g) / 1000 = g. */
  private def encodeGray(px: Array[Array[Int]], fmt: String): Array[Byte] = {
    val h = px.length; val w = px(0).length
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = px(y)(x)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  /** 9×4 matrix where pixel (r, c) = base + pattern — 1 pixel per grid
    * cell, so the decoded lum36 must BE the matrix. */
  private def cellMatrix(f: (Int, Int) => Int): Array[Array[Int]] =
    Array.tabulate(4, 9)((r, c) => f(r, c))

  test("1-pixel-per-cell image: the decoded grid IS the pixel matrix") {
    val px = cellMatrix((r, c) => 10 * r + c) // distinct, hand-readable
    val d = Multimodal.decodeImage(encodeGray(px, "png")).get
    assert(d.width === 9 && d.height === 4)
    assert(d.lum36.toSeq === (for (r <- 0 until 4; c <- 0 until 9)
      yield (10 * r + c).toLong))
  }

  test("strictly increasing rows hash to all-ones; a flat image to zero") {
    val inc = Multimodal.decodeImage(
      encodeGray(cellMatrix((r, c) => 20 * c), "png")).get
    assert(Multimodal.dHashBits(inc.lum36) === 0xFFFFFFFFL)
    val flat = Multimodal.decodeImage(
      encodeGray(cellMatrix((_, _) => 77), "png")).get
    assert(Multimodal.dHashBits(flat.lum36) === 0L)
  }

  test("box downsample: block-constant 18x8 image equals its 9x4 source") {
    val small = cellMatrix((r, c) => (7 * r + 3 * c) % 256)
    // blow each cell up to a 2x2 constant block — the box mean is exact
    val big = Array.tabulate(8, 18)((y, x) => small(y / 2)(x / 2))
    val dSmall = Multimodal.decodeImage(encodeGray(small, "png")).get
    val dBig = Multimodal.decodeImage(encodeGray(big, "png")).get
    assert(dBig.lum36.toSeq === dSmall.lum36.toSeq)
  }

  test("uneven dimensions: floor boundaries + floor means, replayed by hand") {
    // 10x5: cell cols [c*10/9,(c+1)*10/9), rows [r*5/4,(r+1)*5/4) — not
    // all cells the same size; replay the documented convention exactly
    val px = Array.tabulate(5, 10)((y, x) => (13 * y + 29 * x) % 256)
    val d = Multimodal.decodeImage(encodeGray(px, "png")).get
    val want = for (r <- 0 until 4; c <- 0 until 9) yield {
      val y0 = r * 5 / 4; val y1 = (r + 1) * 5 / 4
      val x0 = c * 10 / 9; val x1 = (c + 1) * 10 / 9
      val cells = for (y <- y0 until y1; x <- x0 until x1) yield px(y)(x).toLong
      Math.floorDiv(cells.sum, cells.size.toLong)
    }
    assert(d.lum36.toSeq === want)
  }

  test("BT.601 on a color pixel: (299R + 587G + 114B) DIV 1000") {
    val img = new BufferedImage(9, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 9)
      img.setRGB(x, y, (200 << 16) | (100 << 8) | 50) // R=200 G=100 B=50
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val d = Multimodal.decodeImage(bos.toByteArray).get
    // (299*200 + 587*100 + 114*50) / 1000 = 124200/1000 = 124
    assert(d.lum36.toSeq === Seq.fill(36)(124L))
  }

  test("PNG and BMP of the same pixels decode to the same hash") {
    val px = cellMatrix((r, c) => (r * 61 + c * 17) % 256)
    val p = Multimodal.decodeImage(encodeGray(px, "png")).get
    val b = Multimodal.decodeImage(encodeGray(px, "bmp")).get
    assert(p.lum36.toSeq === b.lum36.toSeq)
    assert(Multimodal.dHashBits(p.lum36) === Multimodal.dHashBits(b.lum36))
  }

  test("non-image bytes decode to None; the kernel drops them") {
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    val df = Seq(
      (1L, encodeGray(cellMatrix((r, c) => r + c), "png")),
      (2L, "garbage".getBytes)
    ).toDF("doc_id", "content")
    val out = Multimodal.imageDHashKernel(df, "doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("q_m6 machinery accepts really-decoded hashes: near-dup found, " +
      "distinct image not paired") {
    val base = cellMatrix((r, c) => 20 * c) // increasing rows
    val near = base.map(_.clone())
    near(2)(4) = near(2)(4) + 90 // one cell brightened: flips <=3 dHash bits
    val far = cellMatrix((r, c) => 240 - 20 * c) // reversed gradient
    val df = Seq(
      (1L, encodeGray(base, "png")),
      (2L, encodeGray(near, "png")),
      (3L, encodeGray(far, "bmp"))
    ).toDF("doc_id", "content")
    val pairs = Multimodal.perceptualNearDupFromHashes(
        Multimodal.imageDHashKernel(df, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("stub path through perceptualNearDup ≡ explicit FromHashes composition") {
    // the r10 oracle-paired stub path (exercised by q_m6's oracle at the
    // battery gate) must produce exactly what composing the factored
    // pieces produces — the refactor is a pure extraction
    val df = Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (2L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaab"),
      (3L, "zyxwvutsrqponmlkjihgfedcba9876543210"),
      (4L, "the quick brown fox jumps over the lazy dog again")
    ).toDF("doc_id", "text")
    val packed = Multimodal.packBinary(df, "doc_id", "text")
    val viaOperator = Multimodal.perceptualNearDup(packed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaPieces = Multimodal.perceptualNearDupFromHashes(
        Multimodal.dHashKernel(
          packed.withColumn("content",
            org.apache.spark.sql.functions.col("content").cast("string")),
          "doc_id", "content"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaOperator === viaPieces)
    assert(viaOperator.exists(p => p._1 == 1L && p._2 == 2L)) // non-vacuous
  }
}
