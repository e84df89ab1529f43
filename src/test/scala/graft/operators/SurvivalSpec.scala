package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Kaplan–Meier churn survival (r14, L163). Pins the censoring
  * protocol, the risk-set construction, the table-ln curve against a
  * plain-Scala BigInt replay, the emptied-risk-set NULL boundary, the
  * censoring-only flat step, and the float-KM tracking bound. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  /** The reference range-reduced table log (mirrors Drift/oracle). */
  private def lnE9Ref(num: BigInt, den: BigInt): Long = {
    var k = num.bitLength - den.bitLength
    def sn(k: Int) = if (k >= 0) num else num << -k
    def sd(k: Int) = if (k >= 0) den << k else den
    if (sn(k) < sd(k)) k -= 1
    val mi = (sn(k) * 256 / sd(k) - 256).toInt
    k.toLong * Drift.Ln2E9 + Drift.MantissaLnE9(mi)
  }

  /** Plain-Scala KM replay over (tenure, event) pairs. */
  private def kmRef(dur: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long, Option[Long])] = {
    val ts = dur.map(_._1).distinct.sorted
    var acc = 0L
    var dead = false
    ts.map { t =>
      val d = dur.count(p => p._1 == t && p._2 == 1L).toLong
      val c = dur.count(p => p._1 == t && p._2 == 0L).toLong
      val n = dur.count(_._1 >= t).toLong
      if (n == d) dead = true
      if (!dead && d > 0) acc += lnE9Ref(BigInt(n - d), BigInt(n))
      (t, n, d, c, if (dead) None else Some(acc))
    }
  }

  private def runKm(dur: Seq[(Long, Long)]) =
    Survival.kaplanMeier(dur.toDF("tenure", "event"), "tenure", "event")
      .orderBy(col("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq

  test("durations: tenure and the closing-window censoring protocol") {
    // stream days 0..9 (maxd = 9, gap 7 ⇒ churn iff last < 3):
    // u1 days 0–2 churned (tenure 2); u2 days 1–5 active in-window?
    // last=5 ≥ 3 ⇒ censored; u3 day 9 only: tenure 0, censored
    val us = Seq(("u1", 0L), ("u1", 2L), ("u2", 1L), ("u2", 5L),
      ("u3", 9L)).toDF("u", "day")
      .select(col("u"), (col("day") * 86400000000L).as("us"))
    val got = Survival.durations(us, "u", col("us"), gapDays = 7)
      .orderBy(col("u")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("u1", 0L, 2L, 1L), ("u2", 1L, 4L, 0L),
      ("u3", 9L, 0L, 0L)))
  }

  test("KM hand case: risk sets, steps, and the emptied-set NULL tail") {
    // durations: (1,churn),(2,churn),(2,cens),(3,churn)
    // risk: t1→4, t2→3, t3→1; steps ln(3/4), ln(2/3); t3 empties
    val got = runKm(Seq((1L, 1L), (2L, 1L), (2L, 0L), (3L, 1L)))
    val s1 = lnE9Ref(3, 4); val s2 = lnE9Ref(2, 3)
    assert(got === Seq((1L, 4L, 1L, 0L, Some(s1)),
      (2L, 3L, 1L, 1L, Some(s1 + s2)),
      (3L, 1L, 1L, 0L, None)))
  }

  test("censoring-only steps hold the curve exactly flat") {
    val got = runKm(Seq((1L, 1L), (2L, 0L), (2L, 0L), (4L, 1L), (5L, 0L)))
    assert(got.map(_._1) === Seq(1L, 2L, 4L, 5L))
    assert(got(1)._5 === got(0)._5, "pure censoring must not move lnS")
    assert(got(0)._5.get < 0L && got(2)._5.get < got(0)._5.get)
    assert(got(3)._5 === got(2)._5)
  }

  test("seeded BigInt replay; nonpositive and nonincreasing") {
    val rnd = new scala.util.Random(41)
    val dur = (0 until 400).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(2).toLong))
    val got = runKm(dur)
    assert(got === kmRef(dur))
    val curve = got.flatMap(_._5)
    assert(curve.forall(_ <= 0L))
    assert(curve.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  // ---- log-rank (r14, L165) ----------------------------------------

  private def runLr(a: Seq[(Long, Long)], b: Seq[(Long, Long)]) = {
    val df = (a.map(p => ("p", "A", p._1, p._2)) ++
      b.map(p => ("p", "B", p._1, p._2))).toDF("p", "g", "t", "ev")
    val r = Survival.logRank(df, "p", "g", "t", "ev", "A", "B")
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getLong(5)),
      if (r.isNullAt(6)) None else Some(r.getLong(6)), r.getLong(7))
  }

  /** Plain-Scala BigInt replay of the log-rank cascade. */
  private def lrRef(a: Seq[(Long, Long)], b: Seq[(Long, Long)]) = {
    val ts = (a ++ b).map(_._1).distinct.sorted
    var se = BigInt(0); var sv = BigInt(0); var oA = 0L
    for (t <- ts) {
      val dA = a.count(p => p._1 == t && p._2 == 1L)
      val dB = b.count(p => p._1 == t && p._2 == 1L)
      val nA = BigInt(a.count(_._1 >= t)); val nB = BigInt(b.count(_._1 >= t))
      val d = BigInt(dA + dB); val n = nA + nB
      oA += dA
      if (d > 0) {
        se += BigInt(1000000) * d * nA / n
        if (n > 1) sv += BigInt(1000000) * d * nA * nB * (n - d) /
          (n * n * (n - 1))
      }
    }
    val oe = BigInt(1000000) * oA - se
    (oA, se.toLong,
      if (sv == 0) None else Some((oe * oe / sv).toLong), oe.signum)
  }

  test("log-rank hand case: single early A event reads z² = 1 exactly") {
    // A churns at t1 of risk 2 → e = 0.5, v = 0.25, oe = 0.5 → z² = 1
    val (na, nb, oa, ea, z2, sgn, sig) =
      runLr(Seq((1L, 1L)), Seq((2L, 1L)))
    assert((na, nb, oa, ea) === ((1L, 1L, 1L, 500000L)))
    assert(z2 === Some(1000000L) && sgn === Some(1L) && sig === 0L)
  }

  test("log-rank: identical cohorts read exactly 0; mirror flips sign") {
    val c = Seq((1L, 1L), (3L, 0L), (5L, 1L))
    val (_, _, _, _, z0, s0, _) = runLr(c, c)
    assert(z0 === Some(0L) && s0 === Some(0L))
    val early = Seq((1L, 1L), (2L, 1L)); val late = Seq((8L, 1L), (9L, 1L))
    val (_, _, _, _, z1, s1, _) = runLr(early, late)
    val (_, _, _, _, z2, s2, _) = runLr(late, early)
    assert(s1 === Some(1L) && s2 === Some(-1L))
    // the e-floor sits on cohort A's side, so the mirror agrees only
    // to ~1e-6 per event time (documented); 4 event times here
    assert(math.abs(z1.get - z2.get) <= 10L, s"$z1 vs $z2")
  }

  test("log-rank degenerate conventions: empty cohort NULL, sig 0") {
    val (_, nb, _, _, z2, sgn, sig) = runLr(Seq((1L, 1L)), Seq.empty)
    assert(nb === 0L && z2 === None && sgn === None && sig === 0L)
  }

  test("log-rank: censoring shrinks risk sets but adds no events") {
    val a = Seq((5L, 0L)); val b = Seq((1L, 1L), (3L, 1L))
    val got = runLr(a, b)
    val want = lrRef(a, b)
    assert((got._3, got._4, got._5) === ((want._1, want._2, want._3)))
    assert(got._6 === Some(want._4.toLong))
  }

  test("log-rank: seeded BigInt cascade replay, shifted cohort flags") {
    val rnd = new scala.util.Random(67)
    val a = (0 until 200).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(2).toLong))
    val b = (0 until 200).map(_ =>
      (rnd.nextInt(20).toLong + 6L, rnd.nextInt(2).toLong))
    val got = runLr(a, b)
    val want = lrRef(a, b)
    assert((got._3, got._4, got._5) === ((want._1, want._2, want._3)))
    assert(got._7 === 1L, "a 6-day shift over 200+200 users must flag")
  }

  test("curve tracks the float product-limit within steps·ln(257/256)") {
    val rnd = new scala.util.Random(43)
    val dur = (0 until 300).map(_ =>
      (rnd.nextInt(15).toLong, 1L)) // all observed → long curve
    val got = runKm(dur).filter(_._5.isDefined)
    var s = 1.0
    var steps = 0
    for ((t, n, d, _, lnS) <- got) {
      s *= (n - d).toDouble / n
      steps += 1
      val truth = StrictMath.log(s) * 1e9
      assert(lnS.get <= truth + steps &&
        lnS.get > truth - 3906251.0 * steps, s"t=$t")
    }
  }
}
