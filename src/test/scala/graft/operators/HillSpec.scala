package graft.operators

import graft.SparkSpec

/** L179 Hill tail-index (r15): exact power-of-two hand case, the
  * flat-top and too-small conventions, tie determinism, and a seeded
  * replay through lnE9Jvm with the Pareto calibration. */
class HillSpec extends SparkSpec {
  import spark.implicits._

  private def run(values: Seq[Long], k: Int) = {
    val df = values.zipWithIndex.map { case (v, i) => ("g", v, s"i$i") }
      .toDF("g", "v", "id")
    Hill.tailIndex(df, "g", "v", "id", k).collect()
  }

  test("power-of-two tail: every ln is exact, alpha_inv = mean of k·ln2 terms") {
    // top-4 = (16, 8, 4, 2), x_(k+1) = 2 with k = 3:
    // terms ln(8), ln(4), ln(2) = (3+2+1)·Ln2E9 → alpha_inv = 2·Ln2E9
    val rows = run(Seq(16L, 8L, 4L, 2L, 1L, 1L), k = 3)
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(3) === 2L) // x_k1
    assert(r.getLong(4) === 2L * Drift.Ln2E9)
    assert(r.getLong(5) ===
      1000000000000000L / (2L * Drift.Ln2E9))
  }

  test("flat top: all k+1 values equal reads alpha_inv 0 and NULL alpha") {
    val r = run(Seq.fill(10)(7L), k = 3).head
    assert(r.getLong(4) === 0L && r.isNullAt(5))
  }

  test("too-small groups emit no row; non-positive values drop first") {
    assert(run(Seq(5L, 4L, 3L), k = 3).isEmpty)
    // 4 positive values would qualify for k=3, but two are zero
    assert(run(Seq(5L, 4L, 3L, 0L, 0L), k = 3).isEmpty)
  }

  test("ties resolve by id — duplicating a tail value cannot reorder the top") {
    val a = run(Seq(100L, 50L, 50L, 25L, 10L), k = 3).head
    val b = run(Seq(100L, 50L, 50L, 25L, 10L, 10L), k = 3).head
    assert(a.getLong(4) === b.getLong(4))
  }

  test("seeded replay: planted Pareto(1) calibrates near 1e6") {
    val rnd = new scala.util.Random(1979)
    val values = Seq.fill(2000)(1000000L / (rnd.nextInt(100000) + 1L))
    val r = run(values, k = 100).head
    // plain-Scala mirror: deterministic (v desc, id asc) top-101
    val ordered = values.zipWithIndex
      .map { case (v, i) => (v, s"i$i") }
      .sortBy { case (v, id) => (-v, id) }
    val xk1 = ordered(100)._1
    val s = ordered.take(100)
      .map(t => Drift.lnE9Jvm(BigInt(t._1), BigInt(xk1))).sum
    assert(r.getLong(4) === s / 100L)
    val alpha = r.getLong(5)
    assert(alpha > 800000L && alpha < 1300000L,
      s"Pareto(1) calibration read $alpha")
  }
}
