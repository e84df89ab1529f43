package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Isotonic calibration (L110): monotone passthrough, violator
  * pooling (hand-computed PAV fixture with exact e6 means), global
  * monotonicity on random inputs, hygiene and the bin guard. */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(Long, Long)]): Seq[Row] =
    Isotonic.calibrate(rows.toDF("bin", "y"), "bin", "y")
      .orderBy("bin").collect().toSeq

  private def expand(binWS: Seq[(Long, Int, Int)]): Seq[(Long, Long)] =
    binWS.flatMap { case (b, w, s) =>
      Seq.fill(s)((b, 1L)) ++ Seq.fill(w - s)((b, 0L))
    }

  test("already-monotone rates pass through: fit == raw") {
    val out = fit(expand(Seq((0L, 4, 1), (1L, 4, 2), (2L, 4, 3))))
    out.foreach(r => assert(r.getLong(4) === r.getLong(3)))
    assert(out.map(_.getLong(3)) === Seq(250000L, 500000L, 750000L))
  }

  test("violators pool to the PAV solution (exact-e6 fixture)") {
    // rates [0.75, 0.25, 0.5] → PAV pools everything to 0.5; all
    // interval means are exact at e6, so minimax == classic PAV here
    val out = fit(expand(Seq((0L, 4, 3), (1L, 4, 1), (2L, 4, 2))))
    assert(out.map(_.getLong(4)) === Seq(500000L, 500000L, 500000L))
    assert(out.map(_.getLong(3)) === Seq(750000L, 250000L, 500000L))
  }

  test("fit is always monotone non-decreasing (random inputs)") {
    val rnd = new scala.util.Random(21)
    for (_ <- 1 to 5) {
      val bins = (0L until 12L).map(b =>
        (b, rnd.nextInt(9) + 1, 0)).map { case (b, w, _) =>
        (b, w, rnd.nextInt(w + 1))
      }
      val fits = fit(expand(bins)).map(_.getLong(4))
      assert(fits === fits.sorted, s"not monotone: $fits")
    }
  }

  test("null bins and labels are dropped; empty input yields empty") {
    val dirty = Seq((Option(0L), Option(1L)), (Option.empty[Long], Option(1L)),
      (Option(0L), Option.empty[Long]), (Option(0L), Option(0L)))
      .toDF("bin", "y")
    val out = Isotonic.calibrate(dirty, "bin", "y").collect()
    assert(out.length === 1 && out.head.getLong(1) === 2L &&
      out.head.getLong(2) === 1L)
    assert(Isotonic.calibrate(
      Seq.empty[(Long, Long)].toDF("bin", "y"), "bin", "y").count() === 0L)
  }

  test("ECE: perfectly calibrated bins score exactly 0") {
    // bin b claims (2b+1)/20; give it exactly that empirical rate
    val rows = expand(Seq((0L, 20, 1), (1L, 20, 3), (2L, 20, 5)))
    val out = Isotonic.reliability(rows.toDF("bin", "y"), "bin", "y",
        b => (b * 2 + 1) * org.apache.spark.sql.functions.lit(50000L))
      .orderBy("bin").collect()
    out.foreach { r =>
      assert(r.getLong(4) === r.getLong(3)) // acc == conf
      assert(r.getLong(6) === 0L)
    }
  }

  test("ECE: hand-computed weighted gap, scalar identical on every row") {
    // bin0: conf 50000, acc 0 (gap 50000, n 10); bin1: conf 150000,
    // acc 500000 (gap 350000, n 10) → ECE = (10·50000+10·350000)/20
    val rows = expand(Seq((0L, 10, 0), (1L, 10, 5)))
    val out = Isotonic.reliability(rows.toDF("bin", "y"), "bin", "y",
        b => (b * 2 + 1) * org.apache.spark.sql.functions.lit(50000L))
      .orderBy("bin").collect()
    assert(out.map(_.getLong(5)).toSeq === Seq(500000L, 3500000L))
    assert(out.map(_.getLong(6)).distinct.toSeq === Seq(200000L))
  }

  test("bin-cardinality guard refuses unbucketed scores") {
    val many = (0L until 100L).map(b => (b, 1L))
    val e = intercept[IllegalArgumentException] {
      fit(many)
    }
    assert(e.getMessage.contains("bucket the score first"))
  }
}
