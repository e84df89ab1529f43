package graft.operators

import graft.SparkSpec

/** Funnel step drop-off significance (r13, L136 — VERDICT r12 #6).
  * Pins the exact integer z² against hand-computed 2×2 tables and a
  * BigInt replay on a seeded fixture, the A/A null, the degenerate-cell
  * conventions, and the χ²₁ decision threshold. */
class FunnelSignificanceSpec extends SparkSpec {
  import spark.implicits._

  /** A synthetic stepTimes frame: `reach(c)(k)` entities of cohort c
    * reach step k (funnel-prefix nested counts). */
  private def fixture(reachA: Seq[Int], reachB: Seq[Int])
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val steps = Seq("s1", "s2", "s3").take(math.max(reachA.size, reachB.size))
    val rows = for {
      (reach, coh, base) <- Seq((reachA, "A", 0L), (reachB, "B", 100000L))
      (n, k) <- reach.zipWithIndex
      e <- 0 until n
    } yield (base + e, k + 1, steps(k), (k + 1) * 1000L)
    val cohorts = (0 until reachA.headOption.getOrElse(0))
      .map(e => (e.toLong, "A")) ++
      (0 until reachB.headOption.getOrElse(0))
        .map(e => (100000L + e, "B"))
    (rows.toDF("user_id", "step_idx", "step", "t_us"),
      cohorts.toDF("user_id", "c"))
  }

  private def run(reachA: Seq[Int], reachB: Seq[Int]) = {
    val (st, coh) = fixture(reachA, reachB)
    Funnel.dropoffSignificance(st, "user_id", coh, "c", "A", "B")
      .orderBy("from_idx")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        if (r.isNullAt(8)) None else Some(r.getLong(8)), r.getLong(9)))
  }

  test("hand-computed 2x2: 60/100 vs 40/100 gives z2 = 8.0 exactly, sig") {
    // z² = (60·100 − 40·100)²·200 / (100·100·100·100) = 8
    val got = run(Seq(100, 60), Seq(100, 40))
    assert(got === Array(("s1", "s2", 100L, 60L, 100L, 40L, 1L,
      Some(8000000L), 1L)))
  }

  test("A/A identical rates: z2 = 0, not significant, sign 0") {
    val got = run(Seq(100, 50), Seq(100, 50))
    assert(got === Array(("s1", "s2", 100L, 50L, 100L, 50L, 0L,
      Some(0L), 0L)))
  }

  test("threshold bites at the chi-square critical value") {
    // 59/100 vs 45/100: z² = (5900−4500)²·200/(100·100·104·96) ≈ 3.926
    // — just over 3.841459; 58 vs 46 ≈ 2.8858 — under
    val over = run(Seq(100, 59), Seq(100, 45)).head
    assert(over._8.get === 3926282L && over._9 === 1L)
    val under = run(Seq(100, 57), Seq(100, 45)).head
    assert(under._9 === 0L, s"z2=${under._8}")
  }

  test("degenerate cells: everyone converts -> 0; empty cohort -> null") {
    val all = run(Seq(80, 80), Seq(50, 50))
    assert(all.head._8 === Some(0L) && all.head._9 === 0L)
    // cohort B never enters the funnel: no rate to compare
    val (st, coh) = fixture(Seq(80, 40), Seq(0))
    val got = Funnel.dropoffSignificance(st, "user_id", coh, "c", "A", "B")
      .collect()
    assert(got.length === 1 && got.head.isNullAt(8)
      && got.head.getLong(9) === 0L)
  }

  test("a to-step nobody reached emits no pair row (prefix convention)") {
    val got = run(Seq(80, 0), Seq(50, 0))
    assert(got.isEmpty)
  }

  test("BigInt replay on a nested 3-step fixture, all pairs") {
    val rA = Seq(500, 321, 77); val rB = Seq(480, 260, 91)
    val got = run(rA, rB)
    assert(got.length === 2)
    for ((row, k) <- got.zipWithIndex) {
      val (n1, x1, n2, x2) =
        (BigInt(rA(k)), BigInt(rA(k + 1)), BigInt(rB(k)), BigInt(rB(k + 1)))
      val (bx, bn) = (x1 + x2, n1 + n2)
      val expect = (x1 * n2 - x2 * n1).pow(2) * bn * 1000000 /
        (n1 * n2 * bx * (bn - bx))
      assert(row._8 === Some(expect.toLong), s"pair $k")
      assert(row._7 === (x1 * n2 - x2 * n1).signum.toLong)
    }
  }

  test("cohort labels must differ") {
    val (st, coh) = fixture(Seq(10, 5), Seq(10, 5))
    intercept[IllegalArgumentException] {
      Funnel.dropoffSignificance(st, "user_id", coh, "c", "A", "A")
    }
  }
}
