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
}
