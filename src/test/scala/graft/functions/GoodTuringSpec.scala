package graft.functions

import graft.SparkSpec

/** Good–Turing unseen-mass estimate (L119): hand-computed
  * frequency-of-frequencies, the all-hapax and no-hapax extremes,
  * null hygiene. */
class GoodTuringSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    TextAnalysis.goodTuring(rows.toDF("g", "text"), "text", "g")
      .orderBy("g").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap

  test("hand-computed frequency-of-frequencies") {
    // tokens: a a a b b c d → N=7, V=4, N1=2 (c,d), N2=1 (b)
    val m = run(Seq(("g1", "a a a b b c d")))
    assert(m("g1") === ((7L, 4L, 2L, 1L,
      Math.floorDiv(2L * 1000000L, 7L),
      Math.floorDiv(2L * 1000000L, 4L))))
  }

  test("all-hapax corpus: unseen mass = 1 scaled, hapax share = 1") {
    val m = run(Seq(("g", "w1 w2 w3 w4")))
    assert(m("g") === ((4L, 4L, 4L, 0L, 1000000L, 1000000L)))
  }

  test("no hapax: unseen mass exactly 0") {
    val m = run(Seq(("g", "x x y y")))
    assert(m("g") === ((4L, 2L, 0L, 2L, 0L, 0L)))
  }

  test("null text and null groups drop; groups are independent") {
    val m = run(Seq(("g1", "a a"), ("g2", "a"), (null, "zz"),
      ("g1", null)))
    assert(m.keySet === Set("g1", "g2"))
    assert(m("g1")._3 === 0L && m("g2")._3 === 1L)
  }
}
