package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis

/** Corpus ROUGE-1/2 (L109): identity, containment closed forms,
  * clipping, empty-candidate NULL hygiene, plain-Scala parity. */
class RougeSpec extends SparkSpec {
  import spark.implicits._

  private def rouge(pairs: Seq[(String, String)]) =
    Rouge.rougeN(
      pairs.zipWithIndex.map { case ((c, r), i) => ("g", i.toLong, c, r) }
        .toDF("grp", "id", "cand", "ref"),
      "grp", "id",
      TextAnalysis.tokens(col("cand")), TextAnalysis.tokens(col("ref")))
      .orderBy("n").collect().toSeq

  test("identical corpus: P = R = F1 = 1e6 at both orders") {
    val rows = rouge(Seq(("a b c", "a b c"), ("x y", "x y")))
    assert(rows.map(_.getInt(1)) === Seq(1, 2))
    rows.foreach { r =>
      assert(r.getLong(5) === 1000000L && r.getLong(6) === 1000000L &&
        r.getLong(7) === 1000000L)
    }
  }

  test("containment closed form: candidate ⊂ reference") {
    // cand "a b c" in ref "a b c d": 1-grams m=3 ct=3 rt=4 → P=1,
    // R=750000, F1=2·3e6//7=857142; 2-grams m=2 ct=2 rt=3 → R=666666,
    // F1=4e6//5=800000
    val rows = rouge(Seq(("a b c", "a b c d")))
    val n1 = rows.head; val n2 = rows(1)
    assert((n1.getLong(2), n1.getLong(3), n1.getLong(4)) === ((3L, 3L, 4L)))
    assert((n1.getLong(5), n1.getLong(6), n1.getLong(7)) ===
      ((1000000L, 750000L, 857142L)))
    assert((n2.getLong(5), n2.getLong(6), n2.getLong(7)) ===
      ((1000000L, 666666L, 800000L)))
  }

  test("clipping: repeated candidate tokens count once per ref support") {
    val n1 = rouge(Seq(("the the the", "the cat"))).head
    assert((n1.getLong(2), n1.getLong(3), n1.getLong(4)) === ((1L, 3L, 2L)))
  }

  test("empty candidate: precision NULL, recall 0, F1 0") {
    val n1 = rouge(Seq(("", "a b"))).head
    assert(n1.isNullAt(5) && n1.getLong(6) === 0L && n1.getLong(7) === 0L)
  }

  test("matches a plain-Scala reference on random pairs") {
    val rnd = new scala.util.Random(9)
    val vocab = Vector("a", "b", "c", "d")
    def sent() = (1 to rnd.nextInt(10) + 1)
      .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val pairs = (1 to 25).map(_ => (sent(), sent()))
    val rows = rouge(pairs)
    def grams(s: String, n: Int) = s.split("\\s+").toSeq
      .sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    for (n <- Seq(1, 2)) {
      val m = pairs.map { case (c, r) =>
        val cg = grams(c, n).groupBy(identity).view.mapValues(_.size)
        val rg = grams(r, n).groupBy(identity).view.mapValues(_.size)
        cg.map { case (g, k) => math.min(k, rg.getOrElse(g, 0)) }.sum
      }.sum.toLong
      val ct = pairs.map(p => grams(p._1, n).size).sum.toLong
      val rt = pairs.map(p => grams(p._2, n).size).sum.toLong
      val row = rows(n - 1)
      assert((row.getLong(2), row.getLong(3), row.getLong(4)) ===
        ((m, ct, rt)))
      assert(row.getLong(7) ===
        Math.floorDiv(2L * m * 1000000L, ct + rt))
    }
  }
}
