package graft.functions

import graft.SparkSpec
import graft.operators.Layout

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  // driver reference: the iterative xy2d walk, plain Scala
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    val n = 1L << bits
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  private def run(pts: Seq[(Long, Long)], bits: Int) =
    Hilbert.withHilbert(pts.toDF("x", "y"), "x", "y", "h", bits)
      .as[(Long, Long, Long)].collect().toSeq

  test("bits=3 exhaustive: bijection 0..63 and every step is a grid neighbor") {
    val all = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val got = run(all, bits = 3)
    assert(got.forall { case (x, y, h) => h === xy2d(3, x, y) })
    val byH = got.sortBy(_._3)
    assert(byH.map(_._3) === (0L until 64L)) // bijection
    // THE Hilbert property: consecutive indices are grid neighbors —
    // this is exactly the locality Z-order lacks (Morton jumps across
    // half the square when a high bit flips)
    for (Seq((x1, y1, _), (x2, y2, _)) <- byH.sliding(2)) {
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"($x1,$y1) -> ($x2,$y2) is not a unit step")
    }
  }

  test("property: engine matches plain-Scala xy2d on seeded 24-bit points") {
    val rnd = new scala.util.Random(88)
    val pts = Seq.fill(300)((rnd.nextLong(1L << 24), rnd.nextLong(1L << 24)))
    val got = run(pts, bits = 24).map { case (x, y, h) => ((x, y), h) }.toMap
    for ((x, y) <- pts)
      assert(got((x, y)) === xy2d(24, x, y), s"($x, $y)")
  }

  test("native expression == per-level chain on seeded points (all bit widths)") {
    // the shipped O(bits) codegen loop against the r10 reference chain
    // (and both against xy2d above) — the three-way pin that lets the
    // expression replace the 21KB-method chain without oracle drift
    val rnd = new scala.util.Random(41)
    for (bits <- Seq(1, 3, 8, 24)) {
      val pts = Seq.fill(120)(
        (rnd.nextLong(1L << bits), rnd.nextLong(1L << bits)))
      val df = pts.toDF("x", "y")
      val expr = Hilbert.withHilbert(df, "x", "y", "h", bits)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      val chain = Hilbert.withHilbertChain(df, "x", "y", "h", bits)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(expr === chain, s"bits=$bits")
    }
  }

  test("measured: Hilbert layout touches no more files than Z-order on the same box") {
    // identical table, file count and box predicate; the curve with
    // tighter per-file rectangles must prune at least as well. Keys are
    // a 1024×1024 grid sample so both curves get non-degenerate input.
    val rnd = new scala.util.Random(17)
    val pts = Seq.fill(20000)(
      (rnd.nextLong(1024L), rnd.nextLong(1024L))).toDF("a", "b")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_hilb_" +
      java.util.UUID.randomUUID().toString.take(8)
    try {
      Layout.zorderWrite(pts, "a", "b", s"$base/z", files = 16)
      Layout.hilbertWrite(pts, "a", "b", s"$base/h", files = 16,
        bits = 10)
      val boxes = Seq((100L, 200L, 100L, 200L), (0L, 50L, 900L, 1023L),
        (400L, 700L, 10L, 90L))
      val (hTot, zTot) = boxes.map { case (lo1, hi1, lo2, hi2) =>
        (Layout.filesTouched(spark, s"$base/h", "a", "b", lo1, hi1, lo2, hi2),
          Layout.filesTouched(spark, s"$base/z", "a", "b", lo1, hi1, lo2, hi2))
      }.reduce((p, q) => (p._1 + q._1, p._2 + q._2))
      assert(hTot <= zTot, s"hilbert touched $hTot files vs z-order $zTot")
      assert(hTot < 3 * 16, "hilbert layout pruned nothing on 3 boxes")
    } finally {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }

  test("guards: bits domain, reserved columns, out-of-range keys") {
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Hilbert.withHilbert(df, "x", "y", "h", bits = 25)
    }
    intercept[IllegalArgumentException] {
      // the reserved-column guard belongs to the CHAIN form (the
      // native expression uses no helper columns)
      Hilbert.withHilbertChain(df.withColumn("__hx",
        org.apache.spark.sql.functions.lit(1L)), "x", "y", "h", 8)
    }
    intercept[IllegalArgumentException] {
      // key 1024 needs 11 bits — the Layout guard must reject bits=10
      Layout.hilbertWrite(Seq((1024L, 1L)).toDF("a", "b"), "a", "b",
        s"${System.getProperty("java.io.tmpdir")}/graft_hilb_reject",
        files = 2, bits = 10)
    }
  }
}
