package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis

/** Corpus BLEU-2 (L107): identity = 1, disjoint = 0, clipping, brevity
  * penalty direction, no-bigram degenerate docs, and parity with a
  * plain-Scala reference implementation. */
class BleuSpec extends SparkSpec {
  import spark.implicits._

  private def bleu(pairs: Seq[(String, String)]): Seq[org.apache.spark.sql.Row] =
    Bleu.corpusBleu(
      pairs.zipWithIndex.map { case ((c, r), i) => ("g", i.toLong, c, r) }
        .toDF("grp", "id", "cand", "ref"),
      "grp", "id",
      TextAnalysis.tokens(col("cand")), TextAnalysis.tokens(col("ref")))
      .collect().toSeq

  private def bleuE6(pairs: Seq[(String, String)]): Long =
    bleu(pairs).head.getLong(7)

  test("identical corpus scores exactly 1") {
    assert(bleuE6(Seq(
      ("the cat sat on the mat", "the cat sat on the mat"),
      ("a b c d", "a b c d"))) === 1000000L)
  }

  test("disjoint corpus scores exactly 0") {
    assert(bleuE6(Seq(("x y z", "p q r"))) === 0L)
  }

  test("modified precision clips repeated candidate tokens") {
    val row = bleu(Seq(("the the the the", "the cat"))).head
    // match1 = min(4, 1) = 1, total1 = 4
    assert(row.getLong(3) === 1L && row.getLong(4) === 4L)
  }

  test("brevity penalty bites only when the candidate is shorter") {
    // candidate ⊂ reference: perfect precisions, so the score IS the
    // brevity penalty exp(1 − 5/4)
    val shortCand = bleu(Seq(("a b c d", "a b c d e"))).head.getLong(7)
    assert(shortCand ===
      math.floor(math.exp(1.0 - 5.0 / 4.0) * 1e6 + 0.5).toLong)
    // candidate ⊃ reference: BP = 1, the score is the pure precision
    // geometric mean sqrt(4/5 · 3/4)
    val longCand = bleu(Seq(("a b c d e", "a b c d"))).head.getLong(7)
    assert(longCand ===
      math.floor(math.sqrt(0.8 * 0.75) * 1e6 + 0.5).toLong)
  }

  test("docs with no bigrams contribute lengths but no 2-gram mass") {
    val row = bleu(Seq(("hello", "hello"))).head
    assert(row.getLong(1) === 1L && row.getLong(6) === 0L)
    assert(row.getLong(7) === 0L) // total2 = 0 → corpus convention 0
  }

  test("matches a plain-Scala reference on random pairs") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    def sent() = (1 to rnd.nextInt(12) + 2)
      .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val pairs = (1 to 30).map(_ => (sent(), sent()))
    val got = bleu(pairs).head
    // reference
    def grams(s: String, n: Int) = {
      val t = s.split("\\s+").toSeq
      t.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    }
    def clipped(n: Int) = pairs.map { case (c, r) =>
      val cg = grams(c, n).groupBy(identity).view.mapValues(_.size)
      val rg = grams(r, n).groupBy(identity).view.mapValues(_.size)
      cg.map { case (g, k) => math.min(k, rg.getOrElse(g, 0)) }.sum
    }.sum.toLong
    val total = (n: Int) => pairs.map(p => grams(p._1, n).size).sum.toLong
    val cLen = total(1); val rLen = pairs.map(_._2.split("\\s+").length).sum.toLong
    val (m1, t1, m2, t2) = (clipped(1), total(1), clipped(2), total(2))
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4),
      got.getLong(5), got.getLong(6)) === ((cLen, rLen, m1, t1, m2, t2)))
    val expected =
      if (m1 == 0 || m2 == 0 || t1 == 0 || t2 == 0) 0L
      else math.floor(math.exp(
        math.min(0.0, 1.0 - rLen.toDouble / cLen) +
          0.5 * (math.log(m1.toDouble / t1) + math.log(m2.toDouble / t2)))
        * 1e6 + 0.5).toLong
    assert(got.getLong(7) === expected)
  }
}
