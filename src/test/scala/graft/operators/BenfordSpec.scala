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
      val p = BigInt(Benford.DigitPE9(d - 1))
      val diff = BigInt(obs.getOrElse(d, 0L)) * BigInt(1000000000L) - n * p
      diff * diff * 1000000 / (n * p * 1000000000L)
    }.sum.toLong
  }

  test("constants: log10(2) leads, strictly decreasing, sum ~ 1e9") {
    assert(Benford.DigitPE9.head === 301029996L)
    assert(Benford.DigitPE9.sliding(2).forall(p => p(0) > p(1)))
    val s = Benford.DigitPE9.sum
    assert(s >= 999999995L && s <= 1000000005L, s.toString)
    assert(Benford.Chi2Crit95E6 === 15507313L)
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
