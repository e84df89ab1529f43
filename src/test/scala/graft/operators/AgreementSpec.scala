package graft.operators

import graft.SparkSpec

/** Cohen's κ inter-rater agreement (r13, L138). Pins the exact integer
  * rational against the textbook 2×2 worked example, the perfect /
  * chance / systematic-disagreement landmarks, the constant-rater
  * undefined case, truncation-toward-zero on a negative κ, and a
  * BigInt replay on a seeded 3-label confusion. */
class AgreementSpec extends SparkSpec {
  import spark.implicits._

  /** Build (group, a, b) rows from a confusion-count map. */
  private def items(counts: Map[(String, String), Int], g: String = "g")
      : org.apache.spark.sql.DataFrame =
    counts.toSeq.flatMap { case ((a, b), n) =>
      Seq.fill(n)((g, a, b))
    }.toDF("g", "ra", "rb")

  private def run(counts: Map[(String, String), Int]) = {
    val r = Agreement.cohenKappa(items(counts), "g", "ra", "rb")
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getLong(5)))
  }

  test("textbook 2x2: the classic worked example lands exactly") {
    // the standard Cohen illustration: a=20 yes/yes, 5 yes/no,
    // 10 no/yes, 15 no/no: po = 0.7, pe = 0.5, kappa = 0.4
    val (n, d, po, pe, k) = run(Map(("y", "y") -> 20, ("y", "n") -> 5,
      ("n", "y") -> 10, ("n", "n") -> 15))
    assert(n === 50L && d === 35L)
    assert(po === 700000L && pe === 500000L)
    assert(k === Some(400000L))
  }

  test("landmarks: perfect = 1e6; independence = 0; swap < 0") {
    assert(run(Map(("a", "a") -> 30, ("b", "b") -> 70))._5
      === Some(1000000L))
    // exact independence: n_ab = row·col/N for all cells
    val (_, _, _, _, ind) = run(Map(("a", "a") -> 16, ("a", "b") -> 24,
      ("b", "a") -> 24, ("b", "b") -> 36))
    assert(ind === Some(0L))
    // systematic disagreement: raters anti-align
    val (_, _, _, _, neg) = run(Map(("a", "b") -> 50, ("b", "a") -> 50))
    assert(neg === Some(-1000000L))
  }

  test("both raters constant: kappa undefined (pe = 1), not a crash") {
    // every row and column mass in one cell: C = N·N, the N² = C
    // degenerate case — agreement IS chance, κ has no denominator
    val (n, _, po, pe, k) = run(Map(("a", "a") -> 50))
    assert(n === 50L && pe === 1000000L && po === 1000000L)
    assert(k === None)
  }

  test("negative kappa truncates toward zero like both engines' div") {
    // N=91, D=10, C = 51·50 + 40·41 = 4190: 10⁶·(910−4190)/4091 =
    // −801759.96…, truncation −801759 (a floor would give −801760) —
    // BigInt / truncates toward zero, the exact semantics Spark div
    // and DuckDB // share
    val counts = Map(("a", "b") -> 41, ("b", "a") -> 40, ("a", "a") -> 10)
    val (n, d, _, _, k) = run(counts)
    val bigN = BigInt(n); val bigD = BigInt(d)
    val c = BigInt(51) * 50 + BigInt(40) * 41 // row·col per label
    val expect = (BigInt(1000000) * (bigN * bigD - c)) / (bigN * bigN - c)
    assert(expect.toLong === -801759L, "the fixture must stay non-integer")
    assert(k === Some(-801759L))
  }

  test("BigInt replay on a seeded 3-label confusion, multi-group") {
    val rnd = new scala.util.Random(11)
    val labels = Vector("x", "y", "z")
    val rows = (0 until 600).map { i =>
      val g = s"g${i % 3}"
      val a = labels(rnd.nextInt(3))
      // correlated rater: follows a 70% of the time
      val b = if (rnd.nextInt(10) < 7) a else labels(rnd.nextInt(3))
      (g, a, b)
    }
    val got = Agreement.cohenKappa(rows.toDF("g", "ra", "rb"),
        "g", "ra", "rb")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val sub = rows.filter(_._1 == g)
      val n = BigInt(sub.size)
      val d = BigInt(sub.count(t => t._2 == t._3))
      val c = labels.map(l => BigInt(sub.count(_._2 == l))
        * BigInt(sub.count(_._3 == l))).sum
      val expect = (BigInt(1000000) * (n * d - c)) / (n * n - c)
      assert(got(g) === Some(expect.toLong), s"group $g")
      assert(expect > 300000, s"correlated raters must agree: $g $expect")
    }
  }

  test("null labels and group keys drop; empty input emits no row") {
    val df = Seq((Some("g"), Some("a"), Some("a")),
      (Some("g"), None, Some("a")), (None, Some("a"), Some("a")))
      .toDF("g", "ra", "rb")
    val out = Agreement.cohenKappa(df, "g", "ra", "rb").collect()
    assert(out.length === 1 && out.head.getLong(1) === 1L)
    assert(Agreement.cohenKappa(df.limit(0), "g", "ra", "rb")
      .collect().isEmpty)
  }

  // ---- McNemar paired flip test (r15, L170) --------------------------

  private def runMc(rows: Seq[(Long, Long)]) = {
    val r = Agreement.mcnemar(rows.map(p => ("p", p._1, p._2))
        .toDF("p", "ra", "rb"), "p", "ra", "rb")
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4)),
      r.getLong(5), r.getLong(6))
  }

  test("mcnemar: textbook discordance — z2 = (b−c)²/(b+c) exactly") {
    // b = 10, c = 2: χ² = 64/12 = 5.333… → floor 5333333, flags
    val rows = Seq.fill(10)((1L, 0L)) ++ Seq.fill(2)((0L, 1L)) ++
      Seq.fill(20)((1L, 1L)) ++ Seq.fill(20)((0L, 0L))
    val (n, b, c, z2, dSign, sig) = runMc(rows)
    assert((n, b, c) === ((52L, 10L, 2L)))
    assert(z2 === Some(5333333L) && dSign === 1L && sig === 1L)
  }

  test("mcnemar: balanced flips read null χ², symmetric threshold") {
    // b = c = 3: z2 = 0, no flag; concordant cells are invisible
    val rows = Seq.fill(3)((1L, 0L)) ++ Seq.fill(3)((0L, 1L)) ++
      Seq.fill(100)((1L, 1L))
    val (_, _, _, z2, dSign, sig) = runMc(rows)
    assert(z2 === Some(0L) && dSign === 0L && sig === 0L)
  }

  test("mcnemar: zero discordance is NULL (nothing to test), not zero") {
    val (_, b, c, z2, _, sig) = runMc(Seq.fill(5)((1L, 1L)))
    assert(b === 0L && c === 0L && z2 === None && sig === 0L)
  }

  test("mcnemar: non-binary ratings drop (hygiene)") {
    val rows = Seq((1L, 0L), (0L, 1L), (2L, 1L), (1L, 7L))
    val (n, _, _, _, _, _) = runMc(rows)
    assert(n === 2L)
  }

  // ---- Fleiss' κ (r15, L172) -----------------------------------------

  private def runFleiss(rows: Seq[(String, String)], m: Int = 3) = {
    val r = Agreement.fleissKappa(rows.map(p => ("p", p._1, p._2))
        .toDF("p", "i", "r"), "p", "i", "r", m)
      .collect().head
    (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5),
      if (r.isNullAt(6)) None else Some(r.getLong(6)))
  }

  test("fleiss: two unanimous blocks — kappa exactly 1e6") {
    // 2 items all-a + 2 items all-b: P̄ = 1, P̄e = 1/2 ⇒ κ = 1
    val rows = Seq("i1", "i2").flatMap(i => Seq.fill(3)((i, "a"))) ++
      Seq("i3", "i4").flatMap(i => Seq.fill(3)((i, "b")))
    val (n, k, pbar, pe, kappa) = runFleiss(rows)
    assert((n, k) === ((4L, 2L)))
    assert(pbar === 1000000L && pe === 500000L)
    assert(kappa === Some(1000000L))
  }

  test("fleiss: hand-worked 2-item panel — kappa = 1/4 exactly") {
    // item1 (a,a,b), item2 (b,b,b): a = 8, b = 12, c = 20, d = 36
    // κ = (8·36 − 20·12)/(12·16) = 48/192 = 0.25
    val rows = Seq(("i1", "a"), ("i1", "a"), ("i1", "b"),
      ("i2", "b"), ("i2", "b"), ("i2", "b"))
    val (_, _, pbar, pe, kappa) = runFleiss(rows)
    assert(pbar === 666666L && pe === 555555L)
    assert(kappa === Some(250000L))
  }

  test("fleiss: unanimous single category is NULL (pe = 1), not 1") {
    val rows = Seq("i1", "i2").flatMap(i => Seq.fill(3)((i, "a")))
    val (_, _, _, _, kappa) = runFleiss(rows)
    assert(kappa === None)
  }

  test("fleiss: ragged items drop and do not bias the category sums") {
    val complete = Seq(("i1", "a"), ("i1", "a"), ("i1", "b"),
      ("i2", "b"), ("i2", "b"), ("i2", "b"))
    val withRagged = complete ++ Seq(("i9", "a"), ("i9", "a"))
    assert(runFleiss(complete) === runFleiss(withRagged))
  }

  test("fleiss: seeded BigInt replay on a 4-category crowd panel") {
    val rnd = new scala.util.Random(417)
    val rows = (1 to 150).flatMap { i =>
      val bias = i % 4 // items lean toward one category
      Seq.fill(3)((s"i$i",
        s"c${if (rnd.nextInt(10) < 6) bias else rnd.nextInt(4)}"))
    }
    val (n, k, pbar, pe, kappa) = runFleiss(rows)
    val cells = rows.groupBy(identity).view.mapValues(_.size.toLong)
    val s2 = BigInt(cells.values.map(v => v * v).sum)
    val nI = BigInt(150); val m = BigInt(3)
    val tj = rows.groupBy(_._2).view.mapValues(_.size.toLong)
    val c = tj.values.map(v => BigInt(v) * v).sum
    val a = s2 - nI * m
    val b = nI * m * (m - 1)
    val d = nI * nI * m * m
    assert((n, k) === ((150L, 4L)))
    assert(pbar === (BigInt(1000000) * a / b).toLong)
    assert(pe === (BigInt(1000000) * c / d).toLong)
    assert(kappa ===
      Some((BigInt(1000000) * (a * d - c * b) / (b * (d - c))).toLong))
  }

  // ---- Cochran's Q (r15, L171) ---------------------------------------

  private def runQ(rows: Seq[(String, String, Long)]) = {
    val r = Agreement.cochranQ(rows.map(p => ("p", p._1, p._2, p._3))
        .toDF("p", "s", "t", "v"), "p", "s", "t", "v")
      .collect().head
    (r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))
  }

  test("cochranQ: hand-worked 3-treatment block lands exactly") {
    // 4 subjects × 3 treatments; X = [[1,1,0],[1,0,0],[1,1,1],[1,0,0]]
    // T = (4,2,1), S = 7, ΣT² = 21, ΣR² = 2²+1+3²+1 = 15
    // Q = 2·(3·21 − 49)/(3·7 − 15) = 28/6 = 4.666…
    val rows = Seq(
      ("s1", "a", 1L), ("s1", "b", 1L), ("s1", "c", 0L),
      ("s2", "a", 1L), ("s2", "b", 0L), ("s2", "c", 0L),
      ("s3", "a", 1L), ("s3", "b", 1L), ("s3", "c", 1L),
      ("s4", "a", 1L), ("s4", "b", 0L), ("s4", "c", 0L))
    val (n, k, q, sig) = runQ(rows)
    assert((n, k) === ((4L, 3L)))
    assert(q === Some(4666666L))
    assert(sig === Some(0L)) // df 2 crit = 5.99
  }

  test("cochranQ: equal treatment sums read exactly 0") {
    // rotation design: subject i fires exactly treatment i mod 3 —
    // T = (2,2,2) equal, rows non-constant, Q = 0 exactly
    val rows = (0 until 6).flatMap(i => Seq("a", "b", "c").zipWithIndex
      .map { case (t, j) => (s"s$i", t, if (i % 3 == j) 1L else 0L) })
    val (_, _, q, sig) = runQ(rows)
    assert(q === Some(0L) && sig === Some(0L))
  }

  test("cochranQ: all-constant subjects zero the denominator — NULL") {
    // every R_i ∈ {0, k}: k·S − ΣR² = k·S − k·S = 0
    val rows = Seq(("s1", "a", 1L), ("s1", "b", 1L),
      ("s2", "a", 0L), ("s2", "b", 0L))
    val (_, _, q, sig) = runQ(rows)
    assert(q === None && sig === Some(0L))
  }

  test("cochranQ: incomplete blocks drop (Cochran's design requirement)") {
    // s2 misses treatment b — it must not bias T_j
    val complete = Seq(
      ("s1", "a", 1L), ("s1", "b", 0L),
      ("s3", "a", 0L), ("s3", "b", 1L))
    val withPartial = complete ++ Seq(("s2", "a", 1L))
    val (n1, _, q1, _) = runQ(complete)
    val (n2, _, q2, _) = runQ(withPartial)
    assert(n1 === 2L && n2 === 2L && q1 === q2)
  }

  test("cochranQ: conflicting duplicate (subject, treatment) rows " +
      "reduce by MAX, deterministically (r16)") {
    // the hand-worked block with s1/c carried TWICE with conflicting
    // 0/1 values — MAX (OR semantics) makes it 1:
    // X = [[1,1,1],[1,0,0],[1,1,1],[1,0,0]], T = (4,2,2), S = 8,
    // ΣT² = 24, ΣR² = 9+1+9+1 = 20
    // Q = 2·(3·24 − 64)/(3·8 − 20) = 16/4 = 4
    val rows = Seq(
      ("s1", "a", 1L), ("s1", "b", 1L), ("s1", "c", 0L),
      ("s1", "c", 1L), // the conflicting duplicate
      ("s2", "a", 1L), ("s2", "b", 0L), ("s2", "c", 0L),
      ("s3", "a", 1L), ("s3", "b", 1L), ("s3", "c", 1L),
      ("s4", "a", 1L), ("s4", "b", 0L), ("s4", "c", 0L))
    val (n, k, q, _) = runQ(rows)
    assert((n, k) === ((4L, 3L)))
    assert(q === Some(4000000L))
    // and the reduce is order-independent: reversed input, same Q
    assert(runQ(rows.reverse)._3 === Some(4000000L))
  }

  test("cochranQ: seeded BigInt replay on a biased 4-treatment panel") {
    val rnd = new scala.util.Random(909)
    val probs = Map("t0" -> 2, "t1" -> 4, "t2" -> 6, "t3" -> 8)
    val rows = (1 to 200).flatMap(i => probs.map { case (t, p) =>
      (s"s$i", t, if (rnd.nextInt(10) < p) 1L else 0L) })
    val (n, k, q, sig) = runQ(rows)
    val byS = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val byT = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val s = BigInt(byS.values.sum)
    val r2 = byS.values.map(v => BigInt(v) * v).sum
    val t2 = byT.values.map(v => BigInt(v) * v).sum
    val expect = (BigInt(1000000) * (4 - 1) * (4 * t2 - s * s) /
      (4 * s - r2)).toLong
    assert((n, k) === ((200L, 4L)))
    assert(q === Some(expect))
    assert(sig === Some(1L)) // planted prevalence gradient flags
  }
}
