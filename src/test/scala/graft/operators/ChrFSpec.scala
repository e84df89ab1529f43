package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** chrF2 (L115): identity = 1e6 at every order, whitespace
  * insensitivity, the recall-weighted β, plain-Scala parity. */
class ChrFSpec extends SparkSpec {
  import spark.implicits._

  private def run(pairs: Seq[(String, String)], maxN: Int = 4,
      beta: Int = 2) =
    ChrF.chrF(
      pairs.zipWithIndex.map { case ((c, r), i) => ("g", i.toLong, c, r) }
        .toDF("grp", "id", "cand", "ref"),
      "grp", "id", col("cand"), col("ref"), maxN, beta)
      .orderBy("n").collect().toSeq

  test("identical corpus scores exactly 1e6 at every order") {
    val rows = run(Seq(("abcde", "abcde"), ("xy zw", "xy zw")))
    assert(rows.map(_.getInt(1)) === Seq(1, 2, 3, 4))
    rows.foreach(r => assert(r.getLong(5) === 1000000L))
  }

  test("whitespace never matters (the chrF definition)") {
    val a = run(Seq(("ab cd", "a bcd")))
    a.foreach(r => assert(r.getLong(5) === 1000000L))
  }

  test("beta weighs recall: a missing-coverage candidate scores worse than a noisy one") {
    // cand ⊂ ref (perfect precision, low recall) vs ref ⊂ cand
    // (perfect recall, low precision) on the same m
    val short = run(Seq(("abc", "abcdef")), maxN = 1).head.getLong(5)
    val long = run(Seq(("abcdef", "abc")), maxN = 1).head.getLong(5)
    // recall-weighted: the low-recall (short) candidate is punished
    assert(short < long, s"$short should be < $long under beta=2")
  }

  test("matches a plain-Scala reference on random pairs") {
    val rnd = new scala.util.Random(23)
    def s() = (1 to rnd.nextInt(20) + 3)
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val pairs = (1 to 20).map(_ => (s(), s()))
    val rows = run(pairs)
    def grams(x: String, n: Int) =
      x.sliding(n).filter(_.length == n).toSeq
    for (row <- rows) {
      val n = row.getInt(1)
      val m = pairs.map { case (c, r) =>
        val cg = grams(c, n).groupBy(identity).view.mapValues(_.size)
        val rg = grams(r, n).groupBy(identity).view.mapValues(_.size)
        cg.map { case (g, k) => math.min(k, rg.getOrElse(g, 0)) }.sum
      }.sum.toLong
      val ct = pairs.map(p => grams(p._1, n).size).sum.toLong
      val rt = pairs.map(p => grams(p._2, n).size).sum.toLong
      assert((row.getLong(2), row.getLong(3), row.getLong(4)) ===
        ((m, ct, rt)))
      assert(row.getLong(5) ===
        Math.floorDiv(5L * m * 1000000L, 4L * rt + ct))
    }
  }
}
