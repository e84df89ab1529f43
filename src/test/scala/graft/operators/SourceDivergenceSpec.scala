package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SourceDivergenceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a", "x x x y"),
    (2L, "a", "x y z"),
    (3L, "b", "w w w w z"),
    (4L, "b", "w z"),
    (5L, null.asInstanceOf[String], "ignored tokens")).toDF(
    "doc_id", "source", "text")

  // plain-Scala replay of the declared recurrence
  private def reference: Map[String, (Long, Long, Map[String, Long])] = {
    val counts = Map(
      "a" -> Map("x" -> 4L, "y" -> 2L, "z" -> 1L),
      "b" -> Map("w" -> 5L, "z" -> 2L))
    val ctot = Map("x" -> 4L, "y" -> 2L, "z" -> 3L, "w" -> 5L)
    val t = ctot.values.sum.toDouble; val v = ctot.size
    counts.map { case (s, m) =>
      val ts = m.values.sum
      val terms = ctot.map { case (tok, c) =>
        val p = (m.getOrElse(tok, 0L) + 0.5) / (ts + 0.5 * v)
        val q = (c + 0.5) / (t + 0.5 * v)
        tok -> math.floor(p * math.log(p / q) * 1e9 + 0.5).toLong
      }
      s -> ((ts, terms.values.sum, terms))
    }
  }

  test("contributions cover the FULL vocabulary, absent tokens included") {
    val got = SourceDivergence.contributions(docs, "source", "text")
      .as[(String, String, Long, Long)].collect()
    // 2 sources x 4 vocab tokens = 8 grid rows (null source dropped)
    assert(got.length === 8)
    val ref = reference
    got.foreach { case (s, tok, ttot, e9) =>
      assert(ttot === ref(s)._1, s"$s ttot")
      assert(e9 === ref(s)._3(tok), s"($s,$tok)")
    }
  }

  test("report matches the replayed exact integer rollup") {
    val got = SourceDivergence.report(docs, "source", "text")
      .orderBy(col("source"))
      .as[(String, Long, Long)].collect().toSeq
    val ref = reference
    assert(got === Seq(("a", ref("a")._1, ref("a")._2),
      ("b", ref("b")._1, ref("b")._2)))
  }

  test("a corpus-shaped source diverges less than a skewed one") {
    // "big" IS most of the corpus (near-uniform); "skw" is all-'a'
    val skew = Seq(
      (1L, "big", "a b c d a b c d a b c d a b c d"),
      (2L, "skw", "a a")).toDF("doc_id", "source", "text")
    val m = SourceDivergence.report(skew, "source", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(m("skw") > m("big"))
    assert(m("big") > 0L) // smoothing keeps even the majority source > 0
  }

  test("topTokens ranks positive contributions, ties to smaller token") {
    val got = SourceDivergence.topTokens(docs, "source", "text", k = 2)
      .as[(String, Int, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val ref = reference
    def top2(s: String) = ref(s)._3.toSeq.sortBy { case (tok, e9) =>
      (-e9, tok)
    }.take(2).map(_._1)
    assert(got("a") === top2("a"))
    assert(got("b") === top2("b"))
  }
}
