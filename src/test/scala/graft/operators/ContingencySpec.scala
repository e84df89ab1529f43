package graft.operators

import graft.SparkSpec

/** Exact χ² independence + Cramér's V² (r14, L162). Hand-worked 2×2
  * rationals, the zero-cell materialization, degenerate and
  * beyond-table conventions, and a seeded BigInt cascade replay. */
class ContingencySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) = {
    val df = rows.map { case (r, c) => ("p", r, c) }.toDF("p", "rv", "cv")
    val row = Contingency.chiSquare(df, "p", "rv", "cv").collect().head
    (row.getLong(1), row.getLong(2), row.getLong(3),
      if (row.isNullAt(4)) None else Some(row.getLong(4)),
      if (row.isNullAt(5)) None else Some(row.getLong(5)),
      if (row.isNullAt(6)) None else Some(row.getLong(6)))
  }

  private def grid(cells: (Int, Int, Int, Int)): Seq[(String, String)] =
    Seq.fill(cells._1)(("r0", "c0")) ++ Seq.fill(cells._2)(("r0", "c1")) ++
      Seq.fill(cells._3)(("r1", "c0")) ++ Seq.fill(cells._4)(("r1", "c1"))

  test("perfect association: chi2 = N exactly, V2 = 1, flags") {
    // [[10,0],[0,10]]: every cell term (N·n − RC)²/(NRC) = 5 → 20
    val (n, r, c, chi2, v2, sig) = run(grid((10, 0, 0, 10)))
    assert((n, r, c) === ((20L, 2L, 2L)))
    assert(chi2 === Some(20000000L), "χ² = N = 20")
    assert(v2 === Some(1000000L) && sig === Some(1L))
  }

  test("exact independence: chi2 = 0, V2 = 0, no flag") {
    // [[4,6],[6,9]]: margins 10/15 × 10/15, N=25 — every N·n = RC
    val (_, _, _, chi2, v2, sig) = run(grid((4, 6, 6, 9)))
    assert(chi2 === Some(0L) && v2 === Some(0L) && sig === Some(0L))
  }

  test("zero cells materialize: an absent (r,c) pair still adds mass") {
    // [[6,0],[2,2]]: the (r0,c1) cell is EMPTY — its (0 − RC/N)²
    // term must appear. χ² = Σ(Nn−RC)²/(NRC):
    // cells (60−48)²/480, (0−12·2)²/... N=10 R=6,4 C=8,2:
    // (10·6−48)²/(10·48)=144/480, (0−12)²/120, (10·2−32)²/320,
    // (10·2−8)²/80 = 0.3+1.2+0.45+1.8 = 3.75
    val (_, _, _, chi2, _, sig) = run(grid((6, 0, 2, 2)))
    assert(chi2 === Some(3750000L) && sig === Some(0L))
  }

  test("degenerate single-row grid: NULL statistics, sig 0") {
    val (_, r, _, chi2, v2, sig) =
      run(Seq(("r0", "c0"), ("r0", "c1"), ("r0", "c1")))
    assert(r === 1L && chi2 === None && v2 === None && sig === Some(0L))
  }

  test("df beyond the table: chi2 emitted, verdict NULL") {
    // 2×10 grid → df = 9 > 8
    val rows = (0 until 10).flatMap(c =>
      Seq(("r0", s"c$c"), ("r1", s"c$c")))
    val (_, _, c, chi2, _, sig) = run(rows)
    assert(c === 10L && chi2.isDefined && sig === None)
  }

  test("seeded BigInt cascade replay, zero cells included") {
    val rnd = new scala.util.Random(37)
    val rows = (0 until 500).map { _ =>
      val r = s"r${rnd.nextInt(3)}"
      // column leans on the row in a seeded way → some association
      val c = s"c${(rnd.nextInt(4) + (if (r == "r2") 1 else 0)) % 4}"
      (r, c)
    }
    val (n, _, _, chi2, v2, _) = run(rows)
    val rs = rows.map(_._1).distinct.sorted
    val cs = rows.map(_._2).distinct.sorted
    val bigN = BigInt(rows.size)
    val want = (for (r <- rs; c <- cs) yield {
      val nrc = BigInt(rows.count(p => p._1 == r && p._2 == c))
      val rn = BigInt(rows.count(_._1 == r))
      val cn = BigInt(rows.count(_._2 == c))
      val dev = bigN * nrc - rn * cn
      BigInt(1000000) * dev * dev / (bigN * rn * cn)
    }).sum
    assert(n === rows.size.toLong)
    assert(chi2 === Some(want.toLong))
    val wantV2 = want / (bigN * (math.min(rs.size, cs.size) - 1))
    assert(v2 === Some(wantV2.toLong))
  }

  // ---- Simpson reversal (r14, L164) --------------------------------

  private def runSimpson(rows: Seq[(String, Long, Long)]) = {
    val df = rows.map { case (s, r, c) => ("p", s, r, c) }
      .toDF("p", "s", "rv", "cv")
    val row = Contingency.simpsonReversal(df, "p", "s", "rv", "cv")
      .collect().head
    (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4),
      row.getLong(5))
  }

  private def cells(s: String, n11: Int, n10: Int, n01: Int,
      n00: Int): Seq[(String, Long, Long)] =
    Seq.fill(n11)((s, 1L, 1L)) ++ Seq.fill(n10)((s, 1L, 0L)) ++
      Seq.fill(n01)((s, 0L, 1L)) ++ Seq.fill(n00)((s, 0L, 0L))

  test("simpson: the classic planted reversal flags") {
    // both strata Δ = +40 (8·12−2·28, 12·8−28·2); pooled Δ = −500
    val rows = cells("a", 8, 2, 28, 12) ++ cells("b", 12, 28, 2, 8)
    val (k, pos, neg, pooled, rev) = runSimpson(rows)
    assert((k, pos, neg) === ((2L, 2L, 0L)))
    assert(pooled === -1L && rev === 1L)
  }

  test("simpson: consistent strata do not flag") {
    val rows = cells("a", 9, 1, 1, 9) ++ cells("b", 8, 2, 2, 8)
    val (_, pos, _, pooled, rev) = runSimpson(rows)
    assert(pos === 2L && pooled === 1L && rev === 0L)
  }

  test("simpson: a zero-sign stratum blocks the strict verdict") {
    // stratum b independent (Δ = 0) — strict reversal requires every
    // stratum sign nonzero and opposite
    val rows = cells("a", 8, 2, 28, 12) ++ cells("b", 5, 5, 5, 5) ++
      cells("c", 12, 28, 2, 8)
    val (_, _, _, _, rev) = runSimpson(rows)
    assert(rev === 0L)
  }

  test("simpson: non-binary flags drop (hygiene)") {
    val rows = cells("a", 8, 2, 28, 12) ++ cells("b", 12, 28, 2, 8) ++
      Seq(("a", 2L, 1L), ("b", 1L, 7L)) // junk rows must not count
    val (_, _, _, _, rev) = runSimpson(rows)
    assert(rev === 1L, "junk flags must not disturb the planted cells")
  }

  test("simpson: seeded BigInt replay of signs and pooled cells") {
    val rnd = new scala.util.Random(61)
    val rows = (0 until 600).map { _ =>
      val s = s"s${rnd.nextInt(3)}"
      (s, rnd.nextInt(2).toLong, rnd.nextInt(2).toLong)
    }
    val (k, pos, neg, pooled, _) = runSimpson(rows)
    def sign(sub: Seq[(String, Long, Long)]): Int = {
      def n(r: Long, c: Long) =
        BigInt(sub.count(p => p._2 == r && p._3 == c))
      (n(1, 1) * n(0, 0) - n(1, 0) * n(0, 1)).signum
    }
    val ss = rows.map(_._1).distinct
    assert(k === ss.size.toLong)
    assert(pos === ss.count(s => sign(rows.filter(_._1 == s)) > 0).toLong)
    assert(neg === ss.count(s => sign(rows.filter(_._1 == s)) < 0).toLong)
    assert(pooled === sign(rows).toLong)
  }

  // ---- Cochran–Armitage trend (r15, L182) ----------------------------

  private def runCa(rows: Seq[(Long, Long)]) = {
    val df = rows.map { case (w, v) => ("p", w, v) }.toDF("p", "w", "v")
    val r = Contingency.armitageTrend(df, "p", "w", "v")
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4)),
      r.getLong(5), r.getLong(6))
  }

  private def caGrid(cells: Seq[(Long, Int, Int)]): Seq[(Long, Long)] =
    cells.flatMap { case (w, pos, neg) =>
      Seq.fill(pos)((w, 1L)) ++ Seq.fill(neg)((w, 0L)) }

  test("ca trend: hand-worked perfect gradient — Z2 = 20 exactly") {
    // rates 0/10, 5/10, 10/10 at scores 0,1,2:
    // num = 30·25 − 15·30 = 300, den = 30·50 − 900 = 600
    // Z² = 30·300²/(15·15·600) = 20
    val (k, n, pos, z2, dSign, sig) =
      runCa(caGrid(Seq((0L, 0, 10), (1L, 5, 5), (2L, 10, 0))))
    assert((k, n, pos) === ((3L, 30L, 15L)))
    assert(z2 === Some(20000000L) && dSign === 1L && sig === 1L)
  }

  test("ca trend: flat rates read exactly 0 with sign 0") {
    val (_, _, _, z2, dSign, sig) =
      runCa(caGrid(Seq((0L, 5, 5), (1L, 5, 5), (2L, 5, 5))))
    assert(z2 === Some(0L) && dSign === 0L && sig === 0L)
  }

  test("ca trend: degenerate conventions — all-positive and one category NULL") {
    val (_, _, _, z2a, _, siga) =
      runCa(caGrid(Seq((0L, 5, 0), (1L, 5, 0))))
    assert(z2a === None && siga === 0L)
    val (_, _, _, z2b, _, _) =
      runCa(caGrid(Seq((0L, 3, 7))))
    assert(z2b === None)
  }

  test("ca trend: seeded BigInt replay; a planted decreasing trend flags") {
    val rnd = new scala.util.Random(1954)
    val rows = (0L to 3L).flatMap { w =>
      Seq.fill(200)((w,
        if (rnd.nextInt(100) < 60 - 12 * w.toInt) 1L else 0L))
    }
    val (_, n, pos, z2, dSign, sig) = runCa(rows)
    val cats = rows.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.count(_._2 == 1L).toLong))
    val nn = BigInt(n); val rr = BigInt(pos)
    val sn = cats.map { case (w, (c, _)) => BigInt(w) * c }.sum
    val sr = cats.map { case (w, (_, r)) => BigInt(w) * r }.sum
    val s2n = cats.map { case (w, (c, _)) => BigInt(w) * w * c }.sum
    val num = nn * sr - rr * sn
    val den = nn * s2n - sn * sn
    val want = BigInt(1000000) * nn * num * num /
      (rr * (nn - rr) * den)
    assert(z2 === Some(want.toLong))
    assert(dSign === -1L && sig === 1L)
  }

  // ---- mutual information + NMI (r15, L169) --------------------------

  private def runMi(rows: Seq[(String, String)]) = {
    val df = rows.map { case (r, c) => ("p", r, c) }.toDF("p", "rv", "cv")
    val row = Contingency.mutualInformation(df, "p", "rv", "cv")
      .collect().head
    (row.getLong(1), row.getLong(2), row.getLong(3),
      if (row.isNullAt(4)) None else Some(row.getLong(4)),
      if (row.isNullAt(5)) None else Some(row.getLong(5)))
  }

  test("mi: perfect 2x2 association reads exactly ln 2, NMI exactly 1") {
    // [[2,0],[0,2]]: every cell ln(N·n/RC) = ln(8/4) = ln 2 — a pure
    // power of two hits mantissa cell 0, so the table ln is EXACT:
    // mi_e9 = Ln2E9 verbatim, and H_r = H_c = MI ⇒ nmi_e6 = 10⁶
    val (n, r, c, mi, nmi) = runMi(grid((2, 0, 0, 2)))
    assert((n, r, c) === ((4L, 2L, 2L)))
    assert(mi === Some(graft.operators.Drift.Ln2E9))
    assert(nmi === Some(1000000L))
  }

  test("mi: exact independence with power-of-two margins reads exact 0") {
    // [[1,1],[1,1]]: every cell ln(4·1/(2·2)) = ln 1 = table cell 0
    val (_, _, _, mi, nmi) = runMi(grid((1, 1, 1, 1)))
    assert(mi === Some(0L) && nmi === Some(0L))
  }

  test("mi: near-independence reads inside the documented negative floor band") {
    // counts [[3,2],[2,3]] are nearly independent (true MI ≈ 0.02
    // nats) — the table floor can only UNDER-read, never by more
    // than ln(257/256) ≈ 3.9e6 e9-units (Σ n/N = 1)
    val (_, _, _, mi, _) = runMi(grid((3, 2, 2, 3)))
    val replay = miReplay(Seq(("r0", "c0", 3L), ("r0", "c1", 2L),
      ("r1", "c0", 2L), ("r1", "c1", 3L)))
    assert(mi === Some(replay))
    // true MI = 2·(0.3·ln 1.2 − 0.2·ln 0.8⁻¹) ≈ 0.02013551 nats
    assert(mi.get > 20135514L - 3900000L && mi.get <= 20135514L,
      s"mi ${mi.get} outside [true − floor, true]")
  }

  test("mi: degenerate single-label grid emits NULL statistics") {
    val (_, r, _, mi, nmi) = runMi(Seq(("r0", "c0"), ("r0", "c1")))
    assert(r === 1L && mi === None && nmi === None)
  }

  test("mi: zero cells carry no mass — seeded BigInt replay on a sparse grid") {
    val rnd = new scala.util.Random(515)
    val rows = Seq.fill(300) {
      val r = s"r${rnd.nextInt(4)}"
      // column depends on row so the grid is sparse AND associated
      val c = s"c${rnd.nextInt(3) + (if (r == "r0") 3 else 0)}"
      (r, c)
    }
    val cells = rows.groupBy(identity).map { case ((r, c), g) =>
      (r, c, g.size.toLong) }.toSeq
    val (_, _, _, mi, nmi) = runMi(rows)
    assert(mi === Some(miReplay(cells)))
    assert(nmi === Some(nmiReplay(cells)))
  }

  /** Plain-Scala replay of the operator's table-ln MI cascade. */
  private def miReplay(cells: Seq[(String, String, Long)]): Long = {
    val n = cells.map(_._3).sum
    val rm = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val cm = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val s = cells.map { case (r, c, k) =>
      BigInt(k) * Drift.lnE9Jvm(BigInt(n) * k, BigInt(rm(r)) * cm(c))
    }.sum
    (s / n).toLong // BigInt / rounds toward zero for the sign mix here
  }

  private def nmiReplay(cells: Seq[(String, String, Long)]): Long = {
    val n = cells.map(_._3).sum
    val rm = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val cm = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val mi = cells.map { case (r, c, k) =>
      BigInt(k) * Drift.lnE9Jvm(BigInt(n) * k, BigInt(rm(r)) * cm(c))
    }.sum
    val hr = rm.values.map(v => BigInt(v) * Drift.lnE9Jvm(n, v)).sum
    val hc = cm.values.map(v => BigInt(v) * Drift.lnE9Jvm(n, v)).sum
    (BigInt(1000000) * mi / (hr min hc)).toLong
  }

  // ---- Mantel–Haenszel / CMH (r16, L192) ------------------------------

  private def mhCells(st: String, a: Int, b: Int, c: Int, d: Int) =
    Seq.fill(a)((st, 1L, 1L)) ++ Seq.fill(b)((st, 1L, 0L)) ++
      Seq.fill(c)((st, 0L, 1L)) ++ Seq.fill(d)((st, 0L, 0L))

  private def runMH(rows: Seq[(String, Long, Long)]) = {
    val r = Contingency.mantelHaenszel(
        rows.map(p => ("p", p._1, p._2, p._3)).toDF("p", "s", "r", "c"),
        "p", "s", "r", "c")
      .collect().head
    (r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(4)) None else Some(r.getLong(4)),
      r.getLong(5), r.getLong(6))
  }

  test("mh: hand-worked single stratum lands the exact cascade") {
    // (a,b,c,d) = (3,1,1,3): OR = 9; E = 2, V = 256/448, OE = 1e6,
    // CC = 5e5 → CMH = 25e10 // 571428 = 437500 (hand: 0.25/0.5714)
    val (k, n, or_, cmh, sgn, sig) = runMH(mhCells("s", 3, 1, 1, 3))
    assert((k, n) === ((1L, 8L)))
    assert(or_ === Some(9000000L))
    assert(cmh === Some(437500L) && sgn === 1L && sig === 0L)
  }

  test("mh: the qr24 paradox cells read the WITHIN-stratum direction") {
    // strata (8,2,28,12) and (12,28,2,8): each Δ > 0 but the POOLED
    // (20,30,30,20) Δ < 0 — Simpson's classic; CMH must read +1 with
    // OR_MH = ⌊3840000e6/2240000⌋ = 1714285 (both strata floored at
    // ad = bc-denominator n = 50)
    val rows = mhCells("s0", 8, 2, 28, 12) ++ mhCells("s1", 12, 28, 2, 8)
    val (_, _, or_, _, sgn, _) = runMH(rows)
    assert(sgn === 1L, "CMH read the pooled artifact, not the strata")
    assert(or_ === Some(1714285L))
  }

  test("mh: all-zero bc reads the infinite-OR edge as NULL") {
    val (_, _, or_, _, sgn, _) = runMH(mhCells("s", 4, 0, 0, 4))
    assert(or_ === None && sgn === 1L)
  }

  test("mh: a lone-subject stratum contributes no variance") {
    val base = mhCells("s0", 3, 1, 1, 3)
    val (_, _, _, cmhA, _, _) = runMH(base)
    val (_, _, _, cmhB, _, _) = runMH(base ++ mhCells("s1", 1, 0, 0, 0))
    // the n = 1 stratum adds E = 1e6 and a = 1 (OE unchanged) and
    // V = 0 — the statistic must not move
    assert(cmhA === cmhB)
  }

  test("mh: non-binary rows drop (hygiene)") {
    val rows = mhCells("s", 3, 1, 1, 3) :+ (("s", 2L, 1L))
    assert(runMH(rows)._2 === 8L)
  }

  test("mh: seeded BigInt cascade replay with a planted association") {
    val rnd = new scala.util.Random(1959)
    val rows = (1 to 800).map { i =>
      val st = s"s${i % 4}"
      val r = rnd.nextInt(2)
      val c = if (rnd.nextInt(10) < 3 + 4 * r) 1 else 0 // planted OR
      (st, r.toLong, c.toLong)
    }
    val (k, n, or_, cmh, sgn, sig) = runMH(rows)
    // plain-Scala mirror of the documented per-stratum cascade
    val byS = rows.groupBy(_._1)
    def cellCount(g: Seq[(String, Long, Long)], r: Long, c: Long) =
      g.count(p => p._2 == r && p._3 == c).toLong
    var sad, sbc, se, sv, sa = BigInt(0)
    for ((_, g) <- byS) {
      val (a, b, c, d) = (cellCount(g, 1, 1), cellCount(g, 1, 0),
        cellCount(g, 0, 1), cellCount(g, 0, 0))
      val nn = a + b + c + d
      sad += BigInt(1000000) * a * d / nn
      sbc += BigInt(1000000) * b * c / nn
      se += BigInt(1000000) * (a + b) * (a + c) / nn
      if (nn >= 2)
        sv += BigInt(1000000) * (a + b) * (c + d) * (a + c) * (b + d) /
          (BigInt(nn) * nn * (nn - 1))
      sa += a
    }
    val oe = BigInt(1000000) * sa - se
    val cc = (oe.abs - 500000).max(BigInt(0))
    assert((k, n) === ((4L, 800L)))
    assert(or_ === Some((BigInt(1000000) * sad / sbc).toLong))
    assert(cmh === Some((cc * cc / sv).toLong))
    assert(sgn === oe.signum.toLong && sig === 1L)
  }
}
