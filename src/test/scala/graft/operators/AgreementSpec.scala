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
}
