package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Benford χ² verdict (r14, L153). Pins the StrictMath constants, the
  * zero-observed-digit spine, hygiene drops, a plain-Scala BigInt
  * replay, and the verdict in both directions on constructed digit
  * mixes. */
class BenfordSpec extends SparkSpec {
  import spark.implicits._

  private def run(values: Seq[(String, Long)]): Map[String, (Long, Long, Long)] =
    Benford.chiSquare(values.toDF("leg", "v"), "leg", "v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap

  /** The reference replay: 9 quantize-per-term divisions, BigInt. */
  private def chi2Ref(obs: Map[Int, Long]): Long = {
    val n = BigInt(obs.values.sum)
    (1 to 9).map { d =>
      val p = BigInt(Benford.DigitPE6(d - 1))
      val diff = BigInt(obs.getOrElse(d, 0L)) * BigInt(1000000L) - n * p
      diff * diff / (n * p)
    }.sum.toLong
  }

  test("constants: log10(2) leads, strictly decreasing, sum ~ 1") {
    assert(Benford.DigitPE9.head === 301029996L)
    assert(Benford.DigitPE6.head === 301030L)
    for (t <- Seq(Benford.DigitPE9, Benford.DigitPE6))
      assert(t.sliding(2).forall(p => p(0) > p(1)))
    val s9 = Benford.DigitPE9.sum
    assert(s9 >= 999999995L && s9 <= 1000000005L, s9.toString)
    val s6 = Benford.DigitPE6.sum
    assert(s6 >= 999995L && s6 <= 1000005L, s6.toString)
    assert(Benford.Chi2Crit95E6 === 15507313L)
  }

  test("the e6 scale survives corpus counts the e9 scale cannot " +
      "(the r14 self-review bound)") {
    // at N = 1e11 the e9 squared diff passes 10^38 — past DECIMAL(38);
    // the e6 replay stays exact to N < 1e13 (the documented bound)
    val n = BigInt("100000000000")
    val p6 = BigInt(Benford.DigitPE6.head)
    val d = n * 1000000L - n * p6 // worst-shape diff at o = N
    assert(d * d / (n * p6) > 0, "e6 term computable at N = 1e11")
    assert(d * d < BigInt(10).pow(38), "e6 squared diff inside 10^38")
    val p9 = BigInt(Benford.DigitPE9.head)
    val d9 = n * 1000000000L - n * p9
    assert(d9 * d9 >= BigInt(10).pow(38),
      "e9 squared diff would overflow DECIMAL(38,0) here")
  }

  test("all-one-digit data: the other 8 spine cells still contribute") {
    val got = run(Seq.fill(100)(("a", 1L)))
    assert(got("a") === ((100L, chi2Ref(Map(1 -> 100L)), 1L)))
  }

  test("nulls, zeros, negatives drop; digits come from the rendering") {
    val df = Seq(("a", Some(123L)), ("a", Some(0L)), ("a", Some(-5L)),
      ("a", None), ("a", Some(987L))).toDF("leg", "v")
    val got = Benford.chiSquare(df, "leg", "v").collect().head
    assert(got.getLong(1) === 2L, "only 123 (digit 1) and 987 (digit 9)")
    assert(got.getLong(2) === chi2Ref(Map(1 -> 1L, 9 -> 1L)))
  }

  test("plain-Scala replay, seeded mixed legs") {
    val rnd = new scala.util.Random(59)
    val values = (0 until 400).map { i =>
      (s"leg${i % 2}", (rnd.nextInt(8999) + 1).toLong)
    }
    val got = run(values)
    for (leg <- Seq("leg0", "leg1")) {
      val obs = values.filter(_._1 == leg)
        .groupBy(v => v._2.toString.head.asDigit)
        .map { case (d, vs) => d -> vs.size.toLong }
      assert(got(leg)._2 === chi2Ref(obs), leg)
    }
  }

  test("verdict: a Benford-proportioned sample passes, uniform fails") {
    // ~Benford counts at N=1000 (rounded shares) vs uniform digits
    val benfordish = (1 to 9).flatMap(d =>
      Seq.fill(Math.round(Benford.DigitPE9(d - 1) / 1e6).toInt)(
        ("ok", d.toLong)))
    val uniform = (1 to 9).flatMap(d => Seq.fill(111)(("bad", d.toLong)))
    val got = run(benfordish ++ uniform)
    assert(got("ok")._3 === 0L,
      s"rounded-Benford sample must not reject: ${got("ok")}")
    assert(got("bad")._3 === 1L,
      s"uniform digits must reject at N=999: ${got("bad")}")
  }
}
