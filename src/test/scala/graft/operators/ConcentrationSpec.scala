package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gini concentration (r14, L155). Hand rationals, the 0 and →1
  * extremes, tie-order freedom, zero-mass units stretching the
  * Lorenz curve, degenerate NULLs, and a seeded BigInt replay. */
class ConcentrationSpec extends SparkSpec {
  import spark.implicits._

  private def run(masses: Seq[(String, String, Long)]): Map[String, (Long, Long, Option[Long])] =
    Concentration.gini(masses.toDF("g", "unit", "m"), "g", "unit",
        col("m"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap

  private def giniRef(xs: Seq[Long]): Long = {
    val sorted = xs.sorted
    val n = BigInt(xs.size); val s = BigInt(xs.sum)
    val ix = sorted.zipWithIndex.map { case (x, i) =>
      BigInt(i + 1) * x
    }.sum
    ((BigInt(2) * ix - (n + 1) * s) * 1000000 / (n * s)).toLong
  }

  test("perfectly even masses: gini exactly 0") {
    val got = run((0 until 5).map(i => ("g", s"u$i", 10L)))
    assert(got("g") === ((5L, 50L, Some(0L))))
  }

  test("one unit owns everything: gini = (n-1)/n exactly") {
    // masses (0,0,0,100): G = 3/4
    val got = run(Seq(("g", "a", 0L), ("g", "b", 0L), ("g", "c", 0L),
      ("g", "d", 100L)))
    assert(got("g") === ((4L, 100L, Some(750000L))))
  }

  test("hand rational: masses (1,2,3) → gini 2/9") {
    // 2(1·1+2·2+3·3) − 4·6 = 28 − 24 = 4; 4e6 // 18 = 222222
    assert(run(Seq(("g", "a", 1L), ("g", "b", 2L), ("g", "c", 3L)))("g")
      === ((3L, 6L, Some(222222L))))
  }

  test("tie order is free by algebra: permuted equal masses agree") {
    val a = run(Seq(("g", "z", 5L), ("g", "a", 5L), ("g", "m", 90L)))
    val b = run(Seq(("g", "a", 5L), ("g", "z", 5L), ("g", "m", 90L)))
    assert(a === b)
  }

  test("zero-mass units stretch the Lorenz curve (dropping them " +
      "would understate)") {
    val withZero = run(Seq(("g", "a", 0L), ("g", "b", 50L),
      ("g", "c", 50L)))("g")._3.get
    val without = run(Seq(("g", "b", 50L), ("g", "c", 50L)))("g")._3.get
    assert(withZero > without)
  }

  test("single unit or zero total mass: NULL, not a division") {
    assert(run(Seq(("g", "only", 9L)))("g")._3 === None)
    assert(run(Seq(("g", "a", 0L), ("g", "b", 0L)))("g")._3 === None)
  }

  test("plain-Scala replay, seeded") {
    val rnd = new scala.util.Random(67)
    val masses = (0 until 40).map(i =>
      ("g", s"u$i", rnd.nextInt(5000).toLong))
    val got = run(masses)("g")
    assert(got._3 === Some(giniRef(masses.map(_._3))))
  }
}
