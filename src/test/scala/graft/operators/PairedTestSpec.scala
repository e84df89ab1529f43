package graft.operators

import graft.SparkSpec

/** L199/L200 paired-test pins: hand-worked signed-rank and Friedman
  * cascades, the zero-drop / complete-block / duplicate-sum
  * conventions, the textbook-identity check for the tie-general Q,
  * degenerate NULLs, and seeded BigInt replays with planted
  * shifts/boosts flagging while nulls hold. */
class PairedTestSpec extends SparkSpec {
  import spark.implicits._

  // ---- Wilcoxon signed-rank ------------------------------------------

  private def runW(ds: Seq[Long]) = {
    val r = PairedTest.wilcoxonSignedRank(
      ds.map(("p", _)).toDF("p", "d"), "p", "d").collect().head
    (r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(4)) None else Some(r.getLong(4)),
      if (r.isNullAt(5)) None else Some(r.getLong(5)),
      if (r.isNullAt(7)) None else Some(r.getLong(7)))
  }

  test("signed-rank hand case, no ties: z2 = 12e6*9/660 exactly") {
    // d = {1,-2,3,-4,5}: W2+ = 2+6+10 = 18, Δ2 = 3, denom = 660
    val (n, nz, w2, z2, ds, _) = runW(Seq(1L, -2L, 3L, -4L, 5L))
    assert((n, nz, w2) === ((5L, 0L, Some(18L))))
    assert(z2 === Some(163636L) && ds === Some(1L))
  }

  test("signed-rank tied magnitudes use doubled midranks") {
    // d = {1,-1,2,2,-3}: grid r2 = {3,3},{7,7},{10}; W2+ = 17,
    // Δ2 = 2, T = 12, denom = 648 → ⌊48e6/648⌋ = 74074
    val (_, _, w2, z2, ds, _) = runW(Seq(1L, -1L, 2L, 2L, -3L))
    assert(w2 === Some(17L) && z2 === Some(74074L) && ds === Some(1L))
  }

  test("zeros drop but are counted; all-zero panel reads NULL") {
    // d = {0,0,3,-1}: n = 2 after the drop, W2+ = 4, Δ2 = 1,
    // denom = 60 → 200000
    val (n, nz, _, z2, _, _) = runW(Seq(0L, 0L, 3L, -1L))
    assert((n, nz) === ((2L, 2L)) && z2 === Some(200000L))
    // all-zero ⇒ NO surviving differences: every statistic including
    // the direction is honestly NULL (there is nothing to sign)
    val (n0, nz0, w0, z0, ds0, sig0) = runW(Seq(0L, 0L))
    assert((n0, nz0, w0, z0, ds0, sig0) ===
      ((0L, 2L, None, None, None, Some(0L))))
  }

  test("exactly symmetric differences read z2 = 0, d_sign = 0") {
    val (_, _, _, z2, ds, sig) = runW(Seq(5L, -5L, 9L, -9L))
    assert(z2 === Some(0L) && ds === Some(0L) && sig === Some(0L))
  }

  test("signed-rank seeded BigInt replay; planted shift flags, null holds") {
    val rnd = new scala.util.Random(1945)
    // symmetric support −99..99 (a −100..99 range carries a real
    // −0.5 mean shift that a 400-pair signed-rank test DETECTS —
    // the test being sharp is the point, so the null must be exact)
    def leg(shift: Long) = (1 to 400).map(_ =>
      rnd.nextInt(199).toLong - 99L + shift).filter(_ != 0L)
    def mirror(ds: Seq[Long]) = {
      val nz = ds.filterNot(_ == 0L)
      val t = nz.map(math.abs).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      def below(a: Long) = nz.count(x => math.abs(x) < a).toLong
      val w2 = nz.filter(_ > 0L)
        .map(dv => BigInt(2 * below(math.abs(dv)) + t(math.abs(dv)) + 1))
        .sum
      val n = BigInt(nz.size)
      val tie = t.values.map(x => BigInt(x).pow(3) - x).sum
      val d2 = w2 - n * (n + 1) / 2
      (BigInt(12000000) * d2 * d2 /
        (2 * n * (n + 1) * (2 * n + 1) - tie)).toLong
    }
    for ((shift, wantSig) <- Seq((0L, 0L), (30L, 1L))) {
      val ds = leg(shift)
      val (_, _, _, z2, _, sig) = runW(ds)
      assert(z2 === Some(mirror(ds)), s"shift $shift")
      assert(sig === Some(wantSig), s"shift $shift verdict: $z2")
    }
  }

  test("signed-rank: a 40k separation does not wrap (the JT div class)") {
    // all-positive tied block: Δ2 = n(n+1)/2, Δ2² ≈ 6.4·10¹⁷ at
    // n = 4·10⁴ and the 12·10⁶ numerator passes Long by 10⁶× — the
    // decimal floor must land on the BigInt value
    val n = 40000
    val ds = Seq.fill(n)(7L)
    val bn = BigInt(n)
    val d2 = bn * (bn + 1) / 2
    val num = BigInt(12000000) * d2 * d2
    assert(num / (3 * bn * (bn + 1) * (bn + 1)) > 0)
    val want = (num /
      (2 * bn * (bn + 1) * (2 * bn + 1) - (bn.pow(3) - bn))).toLong
    val (_, _, _, z2, _, _) = runW(ds)
    assert(z2 === Some(want))
  }

  // ---- Friedman -------------------------------------------------------

  private def runF(rows: Seq[(String, String, Long)]) = {
    val r = PairedTest.friedman(
      rows.map(x => ("p", x._1, x._2, x._3)).toDF("p", "b", "c", "v"),
      "p", "b", "c", "v").collect().head
    (r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))
  }

  test("friedman hand case: two identical blocks read Q = 4 exactly") {
    // ranks (1,2,3) in both blocks: R2 = (4,8,12), S2 = 32,
    // A2 − C2 = 16 → Q = 2·32/16 = 4
    val rows = Seq(("b1", "A", 1L), ("b1", "B", 5L), ("b1", "C", 9L),
      ("b2", "A", 2L), ("b2", "B", 6L), ("b2", "C", 8L))
    val (nb, k, q, sig) = runF(rows)
    assert((nb, k) === ((2L, 3L)))
    assert(q === Some(4000000L))
    assert(sig === Some(0L), "4 < χ²₂(0.95) = 5.991")
  }

  test("friedman equals the textbook 12ΣR²/(nk(k+1)) − 3n(k+1) " +
      "form when tie-free") {
    val rnd = new scala.util.Random(1937)
    val rows = (1 to 40).flatMap { b =>
      // distinct values within the block ⇒ no ties
      val vs = rnd.shuffle((1 to 4).toList)
      (0 until 4).map(j => (s"b$b", s"t$j", vs(j).toLong * 10 + j))
    }
    val (nb, k, q, _) = runF(rows)
    // plain-Scala textbook replay on single ranks
    val byB = rows.groupBy(_._1)
    val rSum = (0 until 4).map { j =>
      byB.values.map { cells =>
        val sorted = cells.sortBy(_._3).map(_._2)
        (sorted.indexOf(s"t$j") + 1).toLong
      }.sum
    }
    val n = byB.size.toLong
    val num12 = BigInt(12000000) * rSum.map(r => BigInt(r) * r).sum
    val textbook = num12 / (n * k * (k + 1)) - 3000000 * n * (k + 1)
    assert(q === Some(textbook.toLong),
      s"tie-free Q must equal the textbook form: $q vs $textbook")
    assert(nb === n)
  }

  test("friedman conventions: incomplete blocks drop, duplicate " +
      "cells sum, k < 2 and all-tied read NULL") {
    // b3 lacks treatment C ⇒ dropped; b1's duplicate (b1, A) rows
    // sum to 1 + 2 = 3
    val rows = Seq(("b1", "A", 1L), ("b1", "A", 2L), ("b1", "B", 5L),
      ("b1", "C", 9L), ("b2", "A", 2L), ("b2", "B", 6L),
      ("b2", "C", 8L), ("b3", "A", 7L), ("b3", "B", 1L))
    val (nb, k, q, _) = runF(rows)
    assert((nb, k) === ((2L, 3L)) && q === Some(4000000L),
      "summed duplicate keeps A lowest in b1 — the hand case again")
    val (_, _, q1, sig1) = runF(Seq(("b1", "A", 1L), ("b2", "A", 2L)))
    assert(q1 === None && sig1 === Some(0L), "k < 2")
    val (_, _, q2, _) = runF(Seq(("b1", "A", 3L), ("b1", "B", 3L),
      ("b2", "A", 4L), ("b2", "B", 4L)))
    assert(q2 === None, "every block fully tied ⇒ A2 = C2 ⇒ NULL")
  }

  test("friedman seeded replay: planted boost flags, exchangeable null holds") {
    val rnd = new scala.util.Random(200)
    def leg(boost: Long) = (1 to 200).flatMap { b =>
      (0 until 3).map(j => (s"b$b", s"t$j",
        rnd.nextInt(100).toLong + (if (j == 1) boost else 0L)))
    }
    val (_, _, qNull, sigNull) = runF(leg(0L))
    assert(sigNull === Some(0L), s"null flagged: $qNull")
    val (_, _, qBoost, sigBoost) = runF(leg(60L))
    assert(sigBoost === Some(1L), s"boost missed: $qBoost")
    assert(qBoost.get > qNull.get)
  }
}
