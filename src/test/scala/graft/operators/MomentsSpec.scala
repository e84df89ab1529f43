package graft.operators

import graft.SparkSpec

/** L195 shape-panel pins: hand-worked cleared-moment cascades, the
  * mirror-symmetry and degenerate conventions, and a seeded BigInt
  * replay with near-normal retained / skewed flagged. */
class MomentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(vals: Seq[Long]) = {
    val r = Moments.shapePanel(vals.map(("p", _)).toDF("p", "v"),
        "p", "v")
      .collect().head
    (r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(4)) None else Some(r.getLong(4)),
      if (r.isNullAt(5)) None else Some(r.getLong(5)),
      r.getLong(6))
  }

  test("symmetric hand case: skew 0, kurtosis 1.5 exactly") {
    // {1,2,3}: M2 = 6, M3 = 0, M4 = 54 → k = 1.5, jb = 3·562500/6
    val (n, s2, k, jb, sgn, sig) = run(Seq(1L, 2L, 3L))
    assert(n === 3L && s2 === Some(0L) && sgn === Some(0L))
    assert(k === Some(1500000L))
    assert(jb === Some(281250L) && sig === 0L)
  }

  test("skewed hand case lands the two-floor cascade exactly") {
    // {0,0,0,4}: M2 = 48, M3 = 384, M4 = 5376 → skew² = 4/3,
    // k = 21/9; s2q = 8e6, s2 = ⌊8e6·384/2304⌋ = 1333333,
    // k_e6 = 2333333, jb = ⌊4·(1333333 + 111111)/6⌋ = 962962
    val (_, s2, k, jb, sgn, _) = run(Seq(0L, 0L, 0L, 4L))
    assert(s2 === Some(1333333L) && k === Some(2333333L))
    assert(jb === Some(962962L) && sgn === Some(1L))
  }

  test("mirror symmetry: negated shape flips the sign, not s² or k") {
    val a = run(Seq(0L, 0L, 0L, 4L))
    val b = run(Seq(4L, 4L, 4L, 0L))
    assert(b._2 === a._2 && b._3 === a._3 && b._4 === a._4)
    assert(a._5 === Some(1L) && b._5 === Some(-1L))
  }

  test("constant signal and n < 2 read NULL, never a div0") {
    assert(run(Seq(7L, 7L, 7L))._2 === None)
    assert(run(Seq(9L))._2 === None)
  }

  test("seeded BigInt replay; near-normal retained, squared-uniform flags") {
    val rnd = new scala.util.Random(1980)
    val nearNormal = Seq.fill(2000)(
      (1 to 12).map(_ => rnd.nextInt(256).toLong).sum / 16L)
    val skewed = Seq.fill(2000) {
      val u = rnd.nextInt(256).toLong; u * u / 256L
    }
    def mirror(vals: Seq[Long]) = {
      val n = BigInt(vals.size)
      val s1 = vals.map(BigInt(_)).sum
      val s2 = vals.map(v => BigInt(v) * v).sum
      val s3 = vals.map(v => BigInt(v) * v * v).sum
      val s4 = vals.map(v => BigInt(v) * v * v * v).sum
      val m2 = n * s2 - s1 * s1
      val m3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
      val m4 = n * n * n * s4 - 4 * n * n * s1 * s3 +
        6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
      val k = BigInt(1000000) * m4 / (m2 * m2)
      val s2q = BigInt(1000000) * m3 / m2
      val sk = s2q * m3 / (m2 * m2)
      val jb = (n * (sk + (k - 3000000) * (k - 3000000) / 4000000)) / 6
      (sk.toLong, k.toLong, jb.toLong)
    }
    for ((vals, wantSig) <- Seq((nearNormal, 0L), (skewed, 1L))) {
      val (_, s2, k, jb, _, sig) = run(vals)
      val (ms, mk, mjb) = mirror(vals)
      assert((s2, k, jb) === ((Some(ms), Some(mk), Some(mjb))))
      assert(sig === wantSig, s"sig $sig want $wantSig (jb $jb)")
    }
  }
}
