package graft.operators

import graft.SparkSpec

/** L191 Chapman pins: hand-worked rationals, the degenerate overlap
  * conventions, hygiene, and a seeded independence fixture landing on
  * the known truth. */
class CaptureRecaptureSpec extends SparkSpec {
  import spark.implicits._

  private def run(a: Seq[Long], b: Seq[Long]) = {
    val r = CaptureRecapture.chapman(a.toDF("k"), b.toDF("k"), Seq("k"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))
  }

  test("hand-worked Chapman: nA=7, nB=5, m=3 reads 11 exactly") {
    // N̂ = 8·6/4 − 1 = 11; Var = 8·6·4·2/(16·5) = 4.8
    val (na, nb, m, nhat, v) = run(1L to 7L, Seq(1L, 2L, 3L, 8L, 9L))
    assert((na, nb, m) === ((7L, 5L, 3L)))
    assert(nhat === 11000000L)
    assert(v === 4800000L)
  }

  test("full overlap reads the catch size exactly, variance 0") {
    val (_, _, _, nhat, v) = run(1L to 20L, 1L to 20L)
    assert(nhat === 20000000L && v === 0L)
  }

  test("zero overlap stays finite (the Chapman +1 correction)") {
    // LP divides by zero here; Chapman reads (nA+1)(nB+1) − 1
    val (_, _, m, nhat, _) = run(Seq(1L, 2L), Seq(3L, 4L))
    assert(m === 0L && nhat === (3L * 3L - 1L) * 1000000L)
  }

  test("duplicate and null rows drop before counting") {
    val a = Seq(Some(1L), Some(1L), Some(2L), None).toDF("k")
    val b = Seq(Some(1L), Some(3L), Some(3L), None).toDF("k")
    val r = CaptureRecapture.chapman(a, b, Seq("k")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 1L)))
  }

  test("independent seeded thinning lands near the known truth") {
    val truth = 1L to 3000L
    val rnd = new scala.util.Random(1951)
    val keep = truth.map(k => k -> (rnd.nextInt(3), rnd.nextInt(3)))
    val a = keep.collect { case (k, (da, _)) if da != 0 => k }
    val b = keep.collect { case (k, (_, db)) if db != 0 => k }
    val (_, _, _, nhat, _) = run(a, b)
    val est = nhat / 1e6
    assert(math.abs(est - 3000.0) < 150.0,
      s"Chapman $est too far from the true 3000")
  }
}
