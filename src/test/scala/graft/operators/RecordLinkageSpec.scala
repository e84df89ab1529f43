package graft.operators

import graft.SparkSpec

/** Fellegi–Sunter EM linkage (L111): planted match/non-match
  * separation, agreement-monotone weights, degenerate-input clamps,
  * partitioning determinism, empty hygiene. */
class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private def em(rows: Seq[(Int, Int, Int)], rounds: Int = 8) =
    RecordLinkage.emPatterns(rows.toDF("g1", "g2", "g3"),
        Seq("g1", "g2", "g3"), rounds)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4))).toMap

  test("planted mixture separates: all-agree high, all-disagree low") {
    val rows = Seq.fill(100)((1, 1, 1)) ++ Seq.fill(900)((0, 0, 0))
    val w = em(rows)
    assert(w((1, 1, 1))._2 > 900000L, s"match weight ${w((1, 1, 1))}")
    assert(w((0, 0, 0))._2 < 100000L, s"non-match weight ${w((0, 0, 0))}")
    assert(w((1, 1, 1))._1 === 100L && w((0, 0, 0))._1 === 900L)
  }

  test("weights are monotone in the agreement count on a noisy mixture") {
    // matches agree on ~all fields, non-matches on ~none, with noise
    // patterns in between
    val rows = Seq.fill(80)((1, 1, 1)) ++ Seq.fill(10)((1, 1, 0)) ++
      Seq.fill(10)((1, 0, 0)) ++ Seq.fill(900)((0, 0, 0)) ++
      Seq.fill(20)((0, 0, 1))
    val w = em(rows)
    // posteriors SATURATE under floor quantization (clear matches hit
    // 1e6, clear non-matches hit 0) — the chain is non-strict, the
    // match/non-match divide strict
    assert(w((1, 1, 1))._2 >= w((1, 1, 0))._2)
    assert(w((1, 1, 0))._2 >= w((1, 0, 0))._2)
    assert(w((1, 0, 0))._2 >= w((0, 0, 0))._2)
    assert(w((1, 1, 1))._2 > w((0, 0, 0))._2)
  }

  test("single-pattern input survives the clamps (no 0/0, no NaN path)") {
    val w = em(Seq.fill(50)((1, 0, 1)))
    assert(w.size === 1 && w((1, 0, 1))._1 === 50L)
    val v = w((1, 0, 1))._2
    assert(v >= 0L && v <= 1000000L)
  }

  test("deterministic under repartitioning") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(2), rnd.nextInt(2), rnd.nextInt(2)))
    val df = rows.toDF("g1", "g2", "g3")
    val a = RecordLinkage.emPatterns(df, Seq("g1", "g2", "g3"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = RecordLinkage.emPatterns(df.repartition(9), Seq("g1", "g2", "g3"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a === b)
  }

  test("empty input yields an empty frame with the contract schema") {
    val out = RecordLinkage.emPatterns(
      Seq.empty[(Int, Int, Int)].toDF("g1", "g2", "g3"),
      Seq("g1", "g2", "g3"))
    assert(out.columns.toSeq === Seq("g1", "g2", "g3", "n", "w_e6"))
    assert(out.count() === 0L)
  }
}
