package graft.operators

import graft.SparkSpec

/** L188/L189 F-cascade pins: hand-worked F values, the degenerate
  * conventions (zero within, b ≥ 0 under floor noise, Df2Floor gate),
  * the BF median convention, and seeded BigInt replays with planted
  * shift/scale separations. */
class AnovaSpec extends SparkSpec {
  import spark.implicits._

  private def runF(rows: Seq[(String, Long)], panel: String = "p") = {
    val r = Anova.oneWayF(rows.map(p => (panel, p._1, p._2))
        .toDF("p", "c", "v"), "p", "c", "v")
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getLong(5)),
      if (r.isNullAt(6)) None else Some(r.getLong(6)))
  }

  test("hand-worked two-cohort F lands exactly") {
    // {1,2,3} vs {4,5,6}: SSB = 13.5, SSW = 4 → F = 13.5
    // cascade: terms ⌊36e6/3⌋ + ⌊225e6/3⌋ = 87e6, q = ⌊441e6/6⌋ =
    // 73.5e6, b = 13.5e6, w = 91e6 − 87e6 = 4e6
    val (n, k, b, w, f, sig) = runF(Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 4L), ("b", 5L), ("b", 6L)))
    assert((n, k) === ((6L, 2L)))
    assert(b === 13500000L && w === 4000000L)
    assert(f === Some(13500000L))
    assert(sig === None, "n − k < Df2Floor must gate the verdict")
  }

  test("identical cohorts read F = 0 exactly; b never goes negative") {
    val (_, _, b, _, f, _) = runF(Seq(("a", 1L), ("a", 2L),
      ("b", 1L), ("b", 2L)))
    assert(b === 0L && f === Some(0L))
    // floor-noise property: random same-multiset cohorts, b ≥ 0
    val rnd = new scala.util.Random(188)
    (1 to 20).foreach { _ =>
      val vals = Seq.fill(7)(rnd.nextInt(11).toLong - 5L)
      val rows = Seq("a", "b", "c").flatMap(c => vals.map((c, _)))
      val (_, _, bb, _, ff, _) = runF(rows)
      assert(bb >= 0L && ff.exists(_ <= 2L),
        s"equal-mean cohorts must read ~0: b=$bb f=$ff")
    }
  }

  test("zero within-variance (perfect constancy) is NULL, never a div0") {
    val (_, _, b, w, f, sig) = runF(Seq(("a", 5L), ("a", 5L),
      ("b", 7L), ("b", 7L)))
    assert(w === 0L && f === None && sig === None)
    assert(b === 4000000L) // the between mass is still emitted
  }

  test("single cohort: k < 2 is NULL") {
    assert(runF(Seq(("a", 1L), ("a", 2L)))._5 === None)
  }

  test("seeded BigInt replay + planted-shift verdict at Df2Floor scale") {
    val rnd = new scala.util.Random(1925)
    def leg(shift: Long) = (1 to 1200).map(i =>
      (if (i % 2 == 0) "a" else "b",
        rnd.nextInt(200).toLong + (if (i % 2 == 0) shift else 0L)))
    val nullRows = leg(0L)
    val shifted = leg(25L)
    // BigInt mirror of the documented cascade
    def mirror(rows: Seq[(String, Long)]) = {
      val byC = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val terms = byC.values.map(vs =>
        BigInt(1000000) * BigInt(vs.sum) * BigInt(vs.sum) / vs.size).sum
      val t = BigInt(rows.map(_._2).sum); val n = rows.size
      val q = BigInt(1000000) * t * t / n
      val b = (terms - q).max(BigInt(0))
      val w = BigInt(1000000) * rows.map(v => BigInt(v._2) * v._2).sum -
        terms
      val f = BigInt(1000000) * b * (n - byC.size) /
        (w * (byC.size - 1))
      (b.toLong, w.toLong, f.toLong)
    }
    for ((rows, wantSig) <- Seq((nullRows, 0L), (shifted, 1L))) {
      val (_, _, b, w, f, sig) = runF(rows)
      val (mb, mw, mf) = mirror(rows)
      assert((b, w, f) === ((mb, mw, Some(mf))))
      assert(sig === Some(wantSig), s"verdict: got $sig want $wantSig")
    }
  }

  test("large-magnitude cohorts do not wrap the term floors " +
      "(r17 ADVICE: the JT div-to-LONG class)") {
    // T_c ≈ 10⁷ ⇒ 10⁶·T_c² ≈ 10²⁰ — the quotient ⌊10⁶·T_c²/n_c⌋
    // ≈ 10¹⁹ exceeds Long.Max, where SQL `div` silently wraps; the
    // exact decimal floor must land on the BigInt replay
    val a = (1L to 10L).map(i => ("a", 1000000L + i))
    val b = (1L to 10L).map(i => ("b", 1001000L + i))
    val rows = a ++ b
    val byC = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val terms = byC.values.map(vs =>
      BigInt(1000000) * BigInt(vs.sum) * BigInt(vs.sum) / vs.size).sum
    val t = BigInt(rows.map(_._2).sum)
    val q = BigInt(1000000) * t * t / rows.size
    val wantB = (terms - q).max(BigInt(0))
    val wantW = BigInt(1000000) *
      rows.map(v => BigInt(v._2) * v._2).sum - terms
    val wantF = BigInt(1000000) * wantB * (rows.size - 2) / wantW
    val (_, _, gotB, gotW, gotF, _) = runF(rows)
    assert((gotB, gotW, gotF) ===
      ((wantB.toLong, wantW.toLong, Some(wantF.toLong))))
  }

  // ---- Brown–Forsythe --------------------------------------------------

  private def runBF(rows: Seq[(String, Long)]) = {
    val r = Anova.brownForsythe(rows.map(p => ("p", p._1, p._2))
        .toDF("p", "c", "v"), "p", "c", "v")
      .collect().head
    (if (r.isNullAt(5)) None else Some(r.getLong(5)),
      if (r.isNullAt(6)) None else Some(r.getLong(6)))
  }

  test("BF median convention: the 0-based rank n DIV 2 value (A8)") {
    // {1,2,9}: median = 2 → z = {1,0,7}; {1,2}: median = 2 → z = {1,0}
    // BF must equal oneWayF on those exact deviations
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 9L), ("b", 1L), ("b", 2L))
    val got = runBF(rows)
    val staged = Seq(("a", 1L), ("a", 0L), ("a", 7L),
      ("b", 1L), ("b", 0L))
    val want = runF(staged)
    assert(got === ((want._5, want._6)))
  }

  test("BF: a pure location shift is invisible; a scale change flags") {
    val rnd = new scala.util.Random(1974)
    val a = (1 to 600).map(i => ("a", rnd.nextInt(100).toLong))
    // location-shifted twin: same spread, +500 — BF must read ~0
    val shifted = a.map { case (_, v) => ("b", v + 500L) }
    val (fLoc, sLoc) = runBF(a ++ shifted)
    assert(sLoc === Some(0L), s"location shift flagged by BF: $fLoc")
    // doubled twin: spread ×2 — BF must flag
    val doubled = a.map { case (_, v) => ("b", v * 2L) }
    val (fScale, sScale) = runBF(a ++ doubled)
    assert(sScale === Some(1L), s"scale change missed: $fScale")
    assert(fScale.get > fLoc.get)
  }
}
