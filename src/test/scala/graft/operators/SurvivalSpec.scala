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
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("u1", 2L, 1L), ("u2", 4L, 0L), ("u3", 0L, 0L)))
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
