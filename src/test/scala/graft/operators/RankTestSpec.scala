package graft.operators

import graft.SparkSpec

/** Exact Mann–Whitney rank-sum (r13, L139). Pins the doubled-midrank
  * construction and the tie-corrected z² rational against hand-worked
  * examples, the all-tied and empty-cohort conventions, direction
  * sign, and a BigInt replay on a seeded tied fixture. */
class RankTestSpec extends SparkSpec {
  import spark.implicits._

  private def run(a: Seq[Long], b: Seq[Long]) = {
    val df = (a.map(("g", "A", _)) ++ b.map(("g", "B", _)))
      .toDF("g", "c", "v")
    val r = RankTest.mannWhitney(df, "g", "c", "v", "A", "B")
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getLong(6))
  }

  test("hand-worked ties case: A={1,2,2} B={2,3} gives z2 = 5/3 exactly") {
    // midranks: 1→1, 2→3, 3→5; R1(A) = 7, U = 1, μ = 3,
    // Var = 6/12·(6 − 24/20) = 2.4, z² = 4/2.4 = 1.666…
    val (na, nb, u2, sgn, z2, sig) = run(Seq(1L, 2L, 2L), Seq(2L, 3L))
    assert(na === 3L && nb === 2L)
    assert(u2 === 2L, "u2 = 2·U") // U = 1
    assert(sgn === -1L, "A tends smaller")
    assert(z2 === Some(1666666L) && sig === 0L)
  }

  test("complete separation at 3v3 is just significant (z2 = 27/7)") {
    // A = {1,2,3} < B = {4,5,6}: z² = 3·81·30/(9·210) = 3.857… —
    // just over χ²₁(0.95) = 3.841
    val (_, _, u2, sgn, z2, sig) = run(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))
    assert(u2 === 0L && sgn === -1L)
    assert(z2 === Some(3857142L) && sig === 1L)
    // mirrored cohorts flip the sign, not the magnitude
    val (_, _, _, sgn2, z2b, _) = run(Seq(4L, 5L, 6L), Seq(1L, 2L, 3L))
    assert(sgn2 === 1L && z2b === z2)
  }

  test("identical cohorts: z2 = 0, no significance") {
    val (_, _, _, sgn, z2, sig) = run(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))
    assert(sgn === 0L && z2 === Some(0L) && sig === 0L)
  }

  test("all values tied: variance 0 handled as z2 = 0, not a crash") {
    val (_, _, _, _, z2, sig) = run(Seq(7L, 7L, 7L), Seq(7L, 7L))
    assert(z2 === Some(0L) && sig === 0L)
  }

  test("empty cohort: z2 null, sig 0") {
    val df = Seq(("g", "A", 1L), ("g", "A", 2L)).toDF("g", "c", "v")
    val r = RankTest.mannWhitney(df, "g", "c", "v", "A", "B")
      .collect().head
    assert(r.isNullAt(5) && r.getLong(6) === 0L)
  }

  test("BigInt replay on a seeded tied fixture, multi-group") {
    val rnd = new scala.util.Random(19)
    val rows = (0 until 400).map { i =>
      val g = s"g${i % 2}"
      val c = if (rnd.nextBoolean()) "A" else "B"
      // cohort A shifted up in g1 only; heavy ties via small domain
      val v = rnd.nextInt(12).toLong +
        (if (c == "A" && g == "g1") 3L else 0L)
      (g, c, v)
    }
    val got = RankTest.mannWhitney(rows.toDF("g", "c", "v"),
        "g", "c", "v", "A", "B")
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), Some(r.getLong(5)), r.getLong(6))).toMap
    for (g <- Seq("g0", "g1")) {
      val sub = rows.filter(_._1 == g)
      val a = sub.filter(_._2 == "A").map(_._3)
      val b = sub.filter(_._2 == "B").map(_._3)
      val all = (a ++ b).sorted
      val t = all.groupBy(identity).view.mapValues(_.size).toMap
      def below(v: Long) = all.count(_ < v)
      val r2 = a.map(v => BigInt(2 * below(v) + t(v) + 1)).sum
      val n1 = BigInt(a.size); val n2 = BigInt(b.size)
      val u2 = r2 - n1 * (n1 + 1)
      val delta = u2 - n1 * n2
      val bigN = n1 + n2
      val tie = t.values.map(x => BigInt(x).pow(3) - x).sum
      val z2 = BigInt(3) * delta * delta * bigN * (bigN - 1) * 1000000 /
        (n1 * n2 * (bigN.pow(3) - bigN - tie))
      assert(got(g)._1 === u2.toLong, s"$g u2")
      assert(got(g)._2 === Some(z2.toLong), s"$g z2")
    }
    assert(got("g1")._3 === 1L, "the shifted group must flag")
    assert(got("g0")._3 === 0L, "the null group must not")
  }

  // ---- Kruskal–Wallis (r14, L157) ----------------------------------

  private def runKw(cs: Map[String, Seq[Long]]) = {
    val df = cs.toSeq.flatMap { case (c, vs) => vs.map(("g", c, _)) }
      .toDF("g", "c", "v")
    val r = RankTest.kruskalWallis(df, "g", "c", "v").collect().head
    (r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))
  }

  test("KW hand case, three clean cohorts: H = 32/7 exactly") {
    // A={1,2} B={3,4} C={5,6}: ΣR²/n = 4.5+24.5+60.5, H = 12/42·89.5−21
    val (k, n, h, sig) =
      runKw(Map("A" -> Seq(1L, 2L), "B" -> Seq(3L, 4L), "C" -> Seq(5L, 6L)))
    assert(k === 3L && n === 6L)
    assert(h === Some(4571428L), "floor of 4.571428…e6")
    assert(sig === Some(0L), "under χ²₂(0.95) = 5.991465")
  }

  test("KW complete separation at 3×3 rejects (H = 7.2 > 5.991)") {
    val (_, _, h, sig) = runKw(Map("A" -> Seq(1L, 2L, 3L),
      "B" -> Seq(4L, 5L, 6L), "C" -> Seq(7L, 8L, 9L)))
    assert(h === Some(7200000L) && sig === Some(1L))
  }

  test("KW at k=2 equals the Mann–Whitney z², tied case included") {
    // clean: A={1,2} B={3,4} → both 2.4; tied: the MW spec's 5/3 case
    val (_, _, h1, _) = runKw(Map("A" -> Seq(1L, 2L), "B" -> Seq(3L, 4L)))
    assert(h1 === Some(2400000L))
    val (_, _, h2, _) =
      runKw(Map("A" -> Seq(1L, 2L, 2L), "B" -> Seq(2L, 3L)))
    assert(h2 === Some(1666666L), "≡ the mannWhitney tied-case z²")
  }

  test("KW degenerate conventions: k=1 NULL; all-tied 0; identical 0") {
    val (_, _, h1, sig1) = runKw(Map("A" -> Seq(1L, 2L, 3L)))
    assert(h1 === None && sig1 === Some(0L))
    val (_, _, h2, sig2) =
      runKw(Map("A" -> Seq(7L, 7L), "B" -> Seq(7L, 7L, 7L)))
    assert(h2 === Some(0L) && sig2 === Some(0L))
    val (_, _, h3, _) =
      runKw(Map("A" -> Seq(1L, 2L, 3L), "B" -> Seq(1L, 2L, 3L)))
    assert(h3 === Some(0L), "clamp restores the mathematical H ≥ 0")
  }

  test("KW: a 15k-per-cohort separation does not wrap term_c " +
      "(r17 sweep: the JT div-to-LONG class)") {
    // two 15k cohorts on a 2-value grid: R2 = n(n+1) ≈ 2.25·10⁸,
    // term = ⌊3·10⁶·R2²/n⌋ ≈ 10¹⁹ > Long.Max, where SQL `div`
    // silently wrapped; the exact decimal floor must land on the
    // BigInt cascade. Map-side collapse keeps the spec in grid time.
    val n = 15000
    val rows = Map("A" -> Seq.fill(n)(1L), "B" -> Seq.fill(n)(2L))
    // grouped-count mirror of the documented cascade
    val bigN = BigInt(2 * n)
    def r2(lo: Boolean) = // doubled midrank sum for the tied block
      if (lo) BigInt(n) * (n + 1) else BigInt(n) * (3 * n + 1)
    val terms = Seq(true, false).map(l =>
      BigInt(3000000) * r2(l) * r2(l) / n)
    assert(terms.head > BigInt(Long.MaxValue),
      "construction must actually exercise the >Long term regime")
    val tie = (BigInt(n).pow(3) - n) * 2
    val h0 = terms.sum / (bigN * (bigN + 1)) - 3000000 * (bigN + 1)
    val want = (h0 * (bigN.pow(3) - bigN) /
      (bigN.pow(3) - bigN - tie)).max(0)
    val (_, _, h, sig) = runKw(rows)
    assert(h === Some(want.toLong), s"h got $h want $want")
    assert(sig === Some(1L), "complete separation must flag")
  }

  test("KW df > 8 emits h but a NULL verdict") {
    val cs = (0 until 10).map(i => s"c$i" -> Seq(i.toLong)).toMap
    val (k, _, h, sig) = runKw(cs)
    assert(k === 10L && h.isDefined && sig === None)
  }

  test("KW BigInt cascade replay on a seeded tied multi-group fixture") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 600).map { i =>
      val g = s"g${i % 2}"
      val c = s"c${rnd.nextInt(4)}"
      // cohort c3 shifted up in g1 only; heavy ties via small domain
      val v = rnd.nextInt(10).toLong +
        (if (c == "c3" && g == "g1") 4L else 0L)
      (g, c, v)
    }
    val got = RankTest.kruskalWallis(rows.toDF("g", "c", "v"),
        "g", "c", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4))).toMap
    for (g <- Seq("g0", "g1")) {
      val sub = rows.filter(_._1 == g)
      val all = sub.map(_._3).sorted
      val t = all.groupBy(identity).view.mapValues(_.size).toMap
      def below(v: Long) = all.count(_ < v)
      val byC = sub.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
      val terms = byC.values.map { vs =>
        val r2 = vs.map(v => BigInt(2 * below(v) + t(v) + 1)).sum
        BigInt(3000000) * r2 * r2 / vs.size
      }
      val bigN = BigInt(all.size)
      val tie = t.values.map(x => BigInt(x).pow(3) - x).sum
      val h0 = terms.sum / (bigN * (bigN + 1)) - 3000000 * (bigN + 1)
      val h = (h0 * (bigN.pow(3) - bigN) /
        (bigN.pow(3) - bigN - tie)).max(0)
      assert(got(g)._1 === h.toLong, s"$g h_e6")
      assert(got(g)._1 >= 0L)
    }
    assert(got("g1")._2 === 1L, "the shifted group must flag")
    assert(got("g0")._2 === 0L, "the null group must not")
  }

  // ---- exact ROC-AUC (r14, L158) -----------------------------------

  private def runAuc(pos: Seq[Long], neg: Seq[Long]) = {
    val df = (pos.map(("g", 1L, _)) ++ neg.map(("g", 0L, _)))
      .toDF("g", "y", "s")
    val r = RankTest.auc(df, "g", "y", "s").collect().head
    (r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))
  }

  test("AUC hand case with a tie: U = 3.5 of 4 pairs → 875000") {
    val (np, nn, a) = runAuc(Seq(2L, 3L), Seq(1L, 2L))
    assert(np === 2L && nn === 2L && a === Some(875000L))
  }

  test("AUC extremes: perfect 1e6, inverted 0, chance 500000") {
    assert(runAuc(Seq(5L, 6L), Seq(1L, 2L))._3 === Some(1000000L))
    assert(runAuc(Seq(1L, 2L), Seq(5L, 6L))._3 === Some(0L))
    assert(runAuc(Seq(1L, 2L), Seq(1L, 2L))._3 === Some(500000L))
  }

  test("AUC one-class input: NULL, not a crash") {
    assert(runAuc(Seq(1L, 2L, 3L), Seq.empty)._3 === None)
  }

  // ---- Spearman (r14, L166) ----------------------------------------

  private def runRho(xy: Seq[(Long, Long)]): Option[Double] = {
    val r = RankTest.spearman(xy.map(p => ("g", p._1, p._2))
        .toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    if (r.isNullAt(2)) None else Some(r.getDouble(2))
  }

  test("spearman extremes: monotone 1, antitone -1, outlier-proof") {
    assert(runRho(Seq((1L, 10L), (2L, 20L), (3L, 25L))) === Some(1.0))
    assert(runRho(Seq((1L, 9L), (2L, 5L), (3L, 1L))) === Some(-1.0))
    // a wild outlier cannot move a rank correlation off 1
    assert(runRho(Seq((1L, 10L), (2L, 20L), (3L, 9999999L)))
      === Some(1.0))
  }

  test("spearman hand case with ties matches the midrank formula") {
    // x = 1,2,2,3 y = 10,20,20,40: both monotone with aligned ties
    val rho = runRho(Seq((1L, 10L), (2L, 20L), (2L, 20L), (3L, 40L)))
    assert(rho === Some(1.0))
    // break the tie alignment: y ties where x does not
    val rho2 = runRho(Seq((1L, 10L), (2L, 10L), (3L, 40L)))
    assert(rho2.get > 0.8 && rho2.get < 1.0)
  }

  test("spearman degenerates: constant column NULL, n=1 NULL") {
    assert(runRho(Seq((5L, 1L), (5L, 2L), (5L, 3L))) === None)
    assert(runRho(Seq((1L, 1L))) === None)
  }

  test("spearman seeded replay against plain-Scala midrank Pearson") {
    val rnd = new scala.util.Random(71)
    val xy = (0 until 300).map { _ =>
      val x = rnd.nextInt(15).toLong
      (x, x * 2 + rnd.nextInt(12).toLong) // monotone + noise, tied
    }
    def ranks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map(v => v ->
        (sorted.indexOf(v) + 1 + sorted.lastIndexOf(v) + 1) / 2.0).toMap
    }
    val rx = ranks(xy.map(_._1)); val ry = ranks(xy.map(_._2))
    val n = xy.size.toDouble
    val xs = xy.map(p => rx(p._1)); val ys = xy.map(p => ry(p._2))
    val num = n * xs.zip(ys).map(p => p._1 * p._2).sum - xs.sum * ys.sum
    val den = math.sqrt(n * xs.map(v => v * v).sum - xs.sum * xs.sum) *
      math.sqrt(n * ys.map(v => v * v).sum - ys.sum * ys.sum)
    val want = num / den
    val got = runRho(xy).get
    assert(math.abs(got - want) < 1e-5, s"$got vs $want")
    assert(got > 0.8, "monotone-plus-noise must read strongly positive")
  }

  test("AUC non-binary labels drop; BigInt pair-count replay") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(31)
    val rows = (0 until 300).map { i =>
      val y = rnd.nextInt(3).toLong // label 2 must drop
      val s = rnd.nextInt(20).toLong + (if (y == 1L) 4L else 0L)
      ("g", y, s)
    }
    val r = RankTest.auc(rows.toDF("g", "y", "s"), "g", "y", "s")
      .collect().head
    val pos = rows.filter(_._2 == 1L).map(_._3)
    val neg = rows.filter(_._2 == 0L).map(_._3)
    assert(r.getLong(1) === pos.size.toLong)
    assert(r.getLong(2) === neg.size.toLong)
    // 2U = 2·wins + ties, pair-counted directly
    val u2 = BigInt(2) * pos.map(p => neg.count(_ < p)).sum +
      pos.map(p => neg.count(_ == p)).sum
    val want = BigInt(1000000) * u2 /
      (BigInt(2) * pos.size * neg.size)
    assert(r.getLong(3) === want.toLong)
    assert(r.getLong(5) === 1L, "the shifted scores must flag")
  }

  // ---- Kendall's τ-b (r15, L184) -------------------------------------

  private def runTau(pts: Seq[(Long, Long)]) = {
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = RankTest.kendallTauB(df, "g", "x", "y").collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
  }

  test("tau-b: perfect concordance and discordance read ±1 exactly") {
    assert(runTau(Seq((1L, 1L), (2L, 2L), (3L, 3L))) ===
      ((3L, 3L, 0L, Some(1.0))))
    assert(runTau(Seq((1L, 3L), (2L, 2L), (3L, 1L))) ===
      ((3L, 0L, 3L, Some(-1.0))))
  }

  test("tau-b: the balanced 2x2 tie square reads exactly 0") {
    // (1,1)(1,2)(2,1)(2,2): C = 1, D = 1, x/y ties symmetric
    val (_, c, d, tau) =
      runTau(Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)))
    assert(c === 1L && d === 1L && tau === Some(0.0))
  }

  test("tau-b: tie correction hand case — duplicated point still reads 1") {
    // (1,1)(1,1)(2,2): C = 2, v1 = v2 = 4 → 2·2/(2·2) = 1 exactly
    val (_, c, _, tau) = runTau(Seq((1L, 1L), (1L, 1L), (2L, 2L)))
    assert(c === 2L && tau === Some(1.0))
  }

  test("tau-b: constant margin is NULL (no pairs to order)") {
    assert(runTau(Seq((5L, 1L), (5L, 2L), (5L, 3L)))._4 === None)
  }

  test("tau-b: seeded BigInt replay on a noisy monotone fixture") {
    val rnd = new scala.util.Random(1938)
    val pts = Seq.fill(300)({
      val x = rnd.nextInt(40).toLong
      (x, x * 2 + rnd.nextInt(25).toLong)
    })
    val (n, c, d, tau) = runTau(pts)
    // plain-Scala mirror over all unordered pairs
    var cc = BigInt(0); var dd = BigInt(0)
    for (i <- pts.indices; j <- i + 1 until pts.size) {
      val s = (pts(j)._1 - pts(i)._1).sign * (pts(j)._2 - pts(i)._2).sign
      if (s > 0) cc += 1 else if (s < 0) dd += 1
    }
    val tx = pts.groupBy(_._1).values.map(g =>
      BigInt(g.size) * (g.size - 1)).sum
    val ty = pts.groupBy(_._2).values.map(g =>
      BigInt(g.size) * (g.size - 1)).sum
    val nn = BigInt(300) * 299
    val want = math.rint(2.0 * (cc - dd).toDouble /
      math.sqrt((nn - tx).toDouble) /
      math.sqrt((nn - ty).toDouble) * 1e6) / 1e6
    assert((n, c, d) === ((300L, cc.toLong, dd.toLong)))
    assert(tau.get > 0.6 && math.abs(tau.get - want) < 2e-6,
      s"tau ${tau.get} vs replay $want")
  }

  // ---- Kendall τ-b, inversion-count form (r16) -----------------------

  private def runTauInv(pts: Seq[(Long, Long)]) = {
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = RankTest.kendallTauBInversions(df, "g", "x", "y")
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
  }

  test("inversion form equals the pair grid on every hand case " +
      "(±1, tie square, duplicated point, constant margins)") {
    for (pts <- Seq(
        Seq((1L, 1L), (2L, 2L), (3L, 3L)),
        Seq((1L, 3L), (2L, 2L), (3L, 1L)),
        Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)),
        Seq((1L, 1L), (1L, 1L), (2L, 2L)),
        Seq((5L, 1L), (5L, 2L), (5L, 3L)), // constant x: C = D = 0
        Seq((1L, 7L), (2L, 7L), (3L, 7L)), // constant y
        Seq((-3L, -9L), (-1L, 4L), (0L, -9L), (2L, 11L))))
      assert(runTauInv(pts) === runTau(pts), s"diverged on $pts")
  }

  test("inversion form: seeded multi-leg replay equals the pair grid " +
      "with heavy ties on both margins") {
    val rnd = new scala.util.Random(1966)
    val rows = (0 until 3).flatMap { leg =>
      Seq.fill(400)((s"leg$leg", rnd.nextInt(30).toLong,
        rnd.nextInt(50).toLong - 25L))
    }
    val df = rows.toDF("g", "x", "y")
    def read(out: Array[org.apache.spark.sql.Row]) =
      out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    val pairGrid = read(RankTest.kendallTauB(df, "g", "x", "y").collect())
    val inv = read(
      RankTest.kendallTauBInversions(df, "g", "x", "y").collect())
    assert(inv === pairGrid)
  }

  test("inversion form: wide rank range crosses several bit levels") {
    // distinct y per row → maxRank = n−1 → 9 bit levels at n = 300;
    // negative y exercises the rank (not value) decomposition
    val rnd = new scala.util.Random(61)
    val pts = (0 until 300).map(i =>
      (rnd.nextInt(1000).toLong, (i * 7919L % 100000L) - 50000L))
    assert(runTauInv(pts) === runTau(pts))
  }

  // ---- Jonckheere–Terpstra (r16, L193) --------------------------------

  private def runJT(rows: Seq[(Long, Long)]) = {
    val r = RankTest.jonckheereTerpstra(
        rows.map(p => ("g", p._1, p._2)).toDF("g", "s", "v"),
        "g", "s", "v")
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4)),
      r.getLong(5),
      if (r.isNullAt(6)) None else Some(r.getLong(6)),
      r.getLong(7))
  }

  test("jt: hand-worked 3-cohort rise lands the exact cascade") {
    // c0={1,3} c1={2,4} c2={5,6}: JT2 = 2·(3+4+4) = 22, Mean2 = 12,
    // Var = 456/72 → var_e6 = 6333333, z² = 100/(4·6.3333) = 3.947
    val rows = Seq((0L, 1L), (0L, 3L), (1L, 2L), (1L, 4L),
      (2L, 5L), (2L, 6L))
    val (n, k, jt2, z2, sgn, p, sig) = runJT(rows)
    assert((n, k, jt2) === ((6L, 3L, 22L)))
    assert(z2 === Some(3947368L) && sgn === 1L && sig === 1L)
    assert(p === Some(PValue.NormTail2E6ByZE2(198)))
  }

  test("jt: tie case carries the half-weight and the tie-corrected Var") {
    // c0={1,2} c1={2,3}: JT2 = 2·3+1 = 7, Mean2 = 4; term1 = 102/72,
    // term3 = 8/96 → var_e6 = 1416666 + 0 + 83333 = 1499999;
    // z² = ⌊9e12/5999996⌋ = 1500001
    val (_, _, jt2, z2, sgn, _, sig) =
      runJT(Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L)))
    assert(jt2 === 7L && z2 === Some(1500001L))
    assert(sgn === 1L && sig === 0L)
  }

  test("jt: reversing the cohort order flips the direction, not the z²") {
    val rows = Seq((0L, 1L), (0L, 3L), (1L, 2L), (1L, 4L),
      (2L, 5L), (2L, 6L))
    val rev = rows.map { case (s, v) => (2L - s, v) }
    val a = runJT(rows); val b = runJT(rev)
    assert(a._4 === b._4 && a._5 === 1L && b._5 === -1L)
  }

  test("jt: all-tied values and single cohorts read NULL") {
    assert(runJT(Seq((0L, 7L), (1L, 7L), (2L, 7L)))._4 === None)
    assert(runJT(Seq((0L, 1L), (0L, 2L), (0L, 3L)))._4 === None)
  }

  test("jt: seeded BigInt cascade replay; planted rise flags, null holds") {
    val rnd = new scala.util.Random(1954)
    def leg(slope: Long) = (1 to 600).map { i =>
      val s = (i % 4).toLong
      (s, rnd.nextInt(100).toLong + slope * s * 8L)
    }
    def mirror(rows: Seq[(Long, Long)]) = {
      val n = rows.size
      var jt2 = BigInt(0)
      val byS = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val scores = byS.keys.toSeq.sorted
      for (i <- scores.indices; jj <- i + 1 until scores.size;
           a <- byS(scores(i)); b <- byS(scores(jj))) {
        if (a < b) jt2 += 2 else if (a == b) jt2 += 1
      }
      val ns = byS.values.map(_.size.toLong).toSeq
      val ts = rows.groupBy(_._2).values.map(_.size.toLong).toSeq
      val mean2 = (BigInt(n) * n - ns.map(x => BigInt(x) * x).sum) / 2
      def s25(xs: Seq[Long]) =
        xs.map(x => BigInt(x) * (x - 1) * (2 * x + 5)).sum
      def s2(xs: Seq[Long]) = xs.map(x => BigInt(x) * (x - 1)).sum
      def s3(xs: Seq[Long]) =
        xs.map(x => BigInt(x) * (x - 1) * (x - 2)).sum
      val t1 = BigInt(1000000) *
        (BigInt(n) * (n - 1) * (2 * n + 5) - s25(ns) - s25(ts)) / 72
      val t2 = BigInt(1000000) * s3(ns) * s3(ts) /
        (BigInt(36) * n * (n - 1) * (n - 2))
      val t3 = BigInt(1000000) * s2(ns) * s2(ts) /
        (BigInt(8) * n * (n - 1))
      val v = t1 + t2 + t3
      val d = jt2 - mean2
      (jt2.toLong, (BigInt("1000000000000") * d * d / (4 * v)).toLong,
        d.signum.toLong)
    }
    for ((rows, wantSig) <- Seq((leg(0L), 0L), (leg(1L), 1L))) {
      val (_, _, jt2, z2, sgn, _, sig) = runJT(rows)
      val (mj, mz, ms) = mirror(rows)
      assert((jt2, z2, sgn) === ((mj, Some(mz), ms)))
      assert(sig === wantSig)
    }
  }

  // ---- Dunn's post-hoc pairs (r16, L190) -----------------------------

  private def dunnMirror(rows: Seq[(String, Long)])
      : Map[(String, String), (BigInt, Long)] = {
    // plain-Scala replay of the documented cascade on doubled midranks
    val n = rows.size
    val byV = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val sortedV = byV.keys.toSeq.sorted
    val below = sortedV.scanLeft(0L)((acc, v) => acc + byV(v))
      .zip(sortedV).map { case (b, v) => v -> b }.toMap
    def r2(c: String) = rows.filter(_._1 == c).map(_._2)
      .map(v => 2 * below(v) + byV(v) + 1).map(BigInt(_)).sum
    val tie = byV.values.map(t => BigInt(t) * t * t - t).sum
    val cs = rows.map(_._1).distinct.sorted
    val tieFree = BigInt(n) * n * n - n - tie
    (for (i <- cs.indices; j <- i + 1 until cs.size) yield {
      val (ci, cj) = (cs(i), cs(j))
      val (ni, nj) = (rows.count(_._1 == ci), rows.count(_._1 == cj))
      val delta = r2(ci) * nj - r2(cj) * ni
      val q1 = delta * delta / (BigInt(ni) * nj)
      val z2 = if (tieFree == 0) BigInt(0)
        else BigInt(3000000) * (n - 1) * q1 / (BigInt(ni + nj) * tieFree)
      (ci, cj) -> (z2, z2.toLong)
    }).map { case (k, (z2, zl)) => k -> (z2, zl) }.toMap
  }

  private def runDunn(rows: Seq[(String, Long)]) =
    RankTest.dunnPairs(rows.map(p => ("g", p._1, p._2))
        .toDF("g", "c", "v"), "g", "c", "v")
      .collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        (r.getLong(5), r.getLong(6))).toMap

  test("dunn: canonical pairs, k cohorts yield k(k-1)/2 rows") {
    val rows = Seq(("b", 1L), ("a", 2L), ("c", 3L), ("a", 4L),
      ("b", 5L), ("c", 6L))
    val got = runDunn(rows)
    assert(got.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("dunn: k = 2 agrees with the Mann-Whitney z² up to the floors") {
    val rnd = new scala.util.Random(1964)
    val rows = (1 to 200).map(i =>
      (if (i % 2 == 0) "a" else "b",
        rnd.nextInt(40).toLong + (if (i % 2 == 0) 6L else 0L)))
    val (z2, _) = runDunn(rows)(("a", "b"))
    val mw = RankTest.mannWhitney(rows.map(p => ("g", p._1, p._2))
        .toDF("g", "c", "v"), "g", "c", "v", "a", "b")
      .collect().head.getLong(5)
    // identical statistics through different exact cascades — agree
    // to a few 1e-6 floor units
    assert(math.abs(z2 - mw) <= 5L, s"dunn $z2 vs mw $mw")
  }

  test("dunn: all-tied values read z² = 0; seeded BigInt cascade replay") {
    assert(runDunn(Seq(("a", 7L), ("a", 7L), ("b", 7L)))
      .values.map(_._1).toSeq === Seq(0L))
    val rnd = new scala.util.Random(190)
    val rows = (1 to 300).map { i =>
      val c = Seq("x", "y", "z")(i % 3)
      (c, rnd.nextInt(50).toLong + (if (c == "z") 10L else 0L))
    }
    val want = dunnMirror(rows)
    val got = runDunn(rows)
    for ((k, (z2m, _)) <- want)
      assert(got(k)._1 === z2m.toLong, s"pair $k")
    // the shifted cohort's pairs carry the small p's
    assert(got(("x", "z"))._2 < got(("x", "y"))._2)
  }

  test("dunn: a 40k-per-cohort separation does not wrap q1 " +
      "(r17 ADVICE: the JT div-to-LONG class)") {
    // complete separation of two 40k cohorts on a 2-value grid:
    // Δ = −2n³ ⇒ q1 = 4n⁴ ≈ 1.02·10¹⁹ > Long.Max, where SQL `div`
    // silently wraps; the exact decimal floor must land on the
    // BigInt mirror. The value grid stays 2×2 — the 80k rows
    // collapse map-side, so the spec runs in grid time.
    val n = 40000
    val rows = Seq.fill(n)(("a", 1L)) ++ Seq.fill(n)(("b", 2L))
    val q1 = BigInt(4) * BigInt(n).pow(4) // Δ²/(n·n) for this layout
    assert(q1 > BigInt(Long.MaxValue),
      "construction must actually exercise the >Long q1 regime")
    val want = dunnMirror(rows)(("a", "b"))
    val got = runDunn(rows)(("a", "b"))
    assert(got._1 === want._2, s"z2 got ${got._1} want ${want._2}")
    assert(got._2 === 0L, "complete separation must read p = 0")
  }

  // ---- two-sample Cramér–von Mises (r15, L180) -----------------------

  private def runCvm(a: Seq[Long], b: Seq[Long]) = {
    val df = (a.map(("g", "A", _)) ++ b.map(("g", "B", _)))
      .toDF("g", "c", "v")
    val r = RankTest.cramerVonMises(df, "g", "c", "v", "A", "B")
      .collect().head
    (r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4))
  }

  test("cvm hand case: disjoint 2v2 gives T = 24/64 exactly") {
    // A={1,2}, B={3,4}: devs (2,4,2,0) → Σc·dev² = 24; T = 24/(16·4)
    val (na, nb, t, sig) = runCvm(Seq(1L, 2L), Seq(3L, 4L))
    assert((na, nb) === ((2L, 2L)))
    assert(t === Some(375000L) && sig === 0L)
  }

  test("cvm: identical multisets read exactly 0") {
    val (_, _, t, _) = runCvm(Seq(1L, 2L, 2L), Seq(1L, 2L, 2L))
    assert(t === Some(0L))
  }

  test("cvm: label swap leaves T invariant (the squared dev)") {
    val a = Seq(1L, 3L, 5L, 9L); val b = Seq(2L, 2L, 7L)
    assert(runCvm(a, b)._3 === runCvm(b, a)._3)
  }

  test("cvm: empty cohort is NULL, sig 0") {
    val (_, _, t, sig) = runCvm(Seq(1L, 2L), Seq.empty)
    assert(t === None && sig === 0L)
  }

  test("cvm: seeded BigInt replay; a planted shift flags") {
    val rnd = new scala.util.Random(1080)
    val a = Seq.fill(400)(rnd.nextInt(60).toLong)
    val b = Seq.fill(350)(rnd.nextInt(60).toLong + 8L) // shifted
    val (na, nb, t, sig) = runCvm(a, b)
    // mirror: ECDF step form over the merged value grid
    val values = (a ++ b).distinct.sorted
    var ca = 0L; var cb = 0L; var s = BigInt(0)
    values.foreach { v =>
      val ta = a.count(_ == v); val tb = b.count(_ == v)
      ca += ta; cb += tb
      val dev = BigInt(b.size) * ca - BigInt(a.size) * cb
      s += BigInt(ta + tb) * dev * dev
    }
    val n = BigInt(a.size + b.size)
    val want = BigInt(1000000) * s / (n * n * a.size * b.size)
    assert((na, nb) === ((400L, 350L)))
    assert(t === Some(want.toLong))
    assert(sig === 1L, "the planted shift must flag")
  }
}
