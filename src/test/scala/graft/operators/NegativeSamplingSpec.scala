package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis

/** Smoothed-unigram negative sampling (L113): draw validity, the ^0.75
  * tail lift, empirical-vs-model distribution agreement, seed
  * sensitivity, empty-vocab guard. */
class NegativeSamplingSpec extends SparkSpec {
  import spark.implicits._

  // corpus with known counts: a×81, b×16, c×1
  private def corpus = Seq(
    ("d", (Seq.fill(81)("a") ++ Seq.fill(16)("b") ++ Seq("c"))
      .mkString(" "))).toDF("id", "text")

  private def draws(n: Int, seed: String = "t:1", k: Int = 5) =
    NegativeSampling.sample(corpus, "text", TextAnalysis.tokens,
      (0L until n.toLong).toDF("a"), "a", k, seed)

  test("k draws per anchor, tokens from the vocabulary, u in range") {
    val out = draws(40).collect()
    assert(out.length === 200)
    assert(out.map(_.getString(2)).toSet.subsetOf(Set("a", "b", "c")))
    // W = 81^.75*1e4 + 16^.75*1e4 + 1e4 = 270000 + 80000 + 10000
    val w = 360000L
    assert(out.forall(r => r.getLong(3) >= 0 && r.getLong(3) < w))
    assert(out.groupBy(_.getLong(0)).forall(_._2.length === 5))
  }

  test("empirical distribution tracks count^0.75, lifting the tail") {
    val out = draws(1000).collect().map(_.getString(2))
    val n = out.length.toDouble
    val freq = out.groupBy(identity).view.mapValues(_.size / n).toMap
    // model: a 0.75, b 0.2222, c 0.02778 (vs raw 0.826/0.163/0.0102)
    assert(math.abs(freq("a") - 0.75) < 0.03, s"a: ${freq("a")}")
    assert(math.abs(freq("b") - 2.0 / 9) < 0.03, s"b: ${freq("b")}")
    // the tail LIFT: c's smoothed share (2.78%) is ~2.7x its raw
    // unigram share (1.02%) — the point of the 3/4 power
    assert(freq("c") > 0.015, s"c not lifted: ${freq("c")}")
  }

  test("deterministic per seed; different seeds differ") {
    val a = draws(30).collect().map(_.toSeq).sortBy(_.toString)
    val b = draws(30).collect().map(_.toSeq).sortBy(_.toString)
    val c = draws(30, seed = "t:2").collect().map(_.toSeq)
      .sortBy(_.toString)
    assert(a === b)
    assert(a !== c)
  }

  test("empty vocabulary is refused") {
    val e = intercept[IllegalArgumentException] {
      NegativeSampling.sample(
        Seq.empty[(String, String)].toDF("id", "text"), "text",
        TextAnalysis.tokens, Seq(1L).toDF("a"), "a", 3, "s")
    }
    assert(e.getMessage.contains("empty vocabulary"))
  }
}
