package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact entropy/evenness panel (r14, L154). Pins the specialized
  * integer-ln (no correction step — bitlen IS the exponent), hand
  * cases (uniform mix, power-of-two counts land on exact cell 0),
  * degenerate single-category groups, the documented approximation
  * bound vs float Shannon entropy, and a plain-Scala replay. */
class DiversitySpec extends SparkSpec {
  import spark.implicits._

  private def lnIntRef(n: Long): Long = {
    val k = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val cell = ((BigInt(n) * 256) / (BigInt(1) << k) - 256).toInt
    k.toLong * Drift.Ln2E9 + Drift.MantissaLnE9(cell)
  }

  private def entropyRef(counts: Seq[Long]): (Long, Option[Long]) = {
    val n = counts.sum
    val s = counts.map(c => BigInt(c) * lnIntRef(c)).sum
    val h = lnIntRef(n) - (s / n).toLong
    val even = if (counts.size == 1) None
      else Some((BigInt(h) * 1000000 / lnIntRef(counts.size)).toLong)
    (h, even)
  }

  private def run(counts: Seq[(String, String, Long)]) =
    Diversity.entropyExact(
        counts.flatMap { case (g, c, n) =>
          Seq.fill(n.toInt)((g, c))
        }.toDF("g", "cat"), "g", "cat")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap

  test("power-of-two uniform mix: entropy is EXACTLY k·ln2") {
    // 4 categories × 8 rows: all lns hit mantissa cell 0 — entropy
    // = ln 32 − ln 8 = 2·ln2, no table approximation at all
    val got = run(Seq(("g", "a", 8L), ("g", "b", 8L), ("g", "c", 8L),
      ("g", "d", 8L)))
    assert(got("g") === ((32L, 4L, 2L * Drift.Ln2E9,
      Some(BigInt(2L * Drift.Ln2E9) * 1000000 / (2L * Drift.Ln2E9) match {
        case v => v.toLong
      }))))
  }

  test("single category: entropy exactly 0, evenness NULL") {
    assert(run(Seq(("g", "only", 17L)))("g") === ((17L, 1L, 0L, None)))
  }

  test("plain-Scala replay, seeded") {
    val rnd = new scala.util.Random(83)
    val counts = (0 until 7).map(i =>
      ("g", s"c$i", (rnd.nextInt(400) + 1).toLong))
    val (h, even) = entropyRef(counts.map(_._3))
    val got = run(counts)("g")
    assert(got === ((counts.map(_._3).sum, 7L, h, even)))
  }

  test("tracks float Shannon entropy within the documented 3.9e-3") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 20) {
      val k = rnd.nextInt(8) + 2
      val counts = (0 until k).map(_ => (rnd.nextInt(1000) + 1).toLong)
      val n = counts.sum.toDouble
      val hFloat = counts.map { c =>
        val p = c / n; -p * StrictMath.log(p)
      }.sum
      val (h, _) = entropyRef(counts)
      assert(math.abs(h - hFloat * 1e9) <= 3906251.0,
        s"trial $trial: $h vs ${hFloat * 1e9}")
    }
  }

  test("near-degenerate mixes may read slightly negative — defined, " +
      "deterministic, documented") {
    // 9999:1 — true entropy ~0.001 nats, inside table resolution
    val got = run(Seq(("g", "a", 9999L), ("g", "b", 1L)))("g")
    assert(got._3 > -3906251L && got._3 < 1500000L + 3906251L)
    assert(got._4.isDefined, "evenness defined at k=2")
  }

  test("a group column colliding with an output name is guarded") {
    val e = intercept[IllegalArgumentException] {
      Diversity.entropyExact(
        Seq(("a", "b")).toDF("entropy_e9", "cat"), "entropy_e9", "cat")
    }
    assert(e.getMessage.contains("reserves column name"))
  }
}
