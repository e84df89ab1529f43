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

  test("bin-cardinality guard refuses unbucketed scores") {
    val many = (0L until 100L).map(b => (b, 1L))
    val e = intercept[IllegalArgumentException] {
      fit(many)
    }
    assert(e.getMessage.contains("bucket the score first"))
  }
}
