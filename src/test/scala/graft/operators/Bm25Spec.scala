package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark common words here"),
    (2L, "rareword appears in this one document"),
    (3L, "spark and rareword together in a longer document body"),
    (4L, "nothing relevant whatsoever"),
    (5L, "")).toDF("doc_id", "text")

  /** Reference model — same formula, same quantization, computed with
    * plain JVM doubles (Spark's codegen uses the identical Math.log /
    * IEEE arithmetic, so equality is exact, not approximate). */
  private def reference(corpus: Seq[(Long, String)], terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Long] = {
    def toks(s: String): Seq[String] =
      if (s.trim.isEmpty) Seq.empty else s.trim.split("\\s+").toSeq
    val n = corpus.size.toLong
    val total = corpus.map(d => toks(d._2).size.toLong).sum
    val avgdl = total.toDouble / n
    val tf = for {
      (id, text) <- corpus
      (t, hits) <- toks(text).filter(terms.contains).groupBy(identity)
    } yield (id, toks(text).size.toLong, t, hits.size.toLong)
    val dfm = tf.groupBy(_._3).map { case (t, rows) => t -> rows.size.toLong }
    tf.groupBy(_._1).map { case (id, rows) =>
      id -> rows.map { case (_, dl, t, f) =>
        val idf = math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0)
        val tfp = (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * dl / avgdl))
        math.floor(idf * tfp * 1000000.0 + 0.5).toLong
      }.sum
    }
  }

  test("scores equal the reference model exactly (quantized integers)") {
    val corpus = docs.as[(Long, String)].collect().toSeq
    val got = Bm25.score(docs, "doc_id", "text", Seq("spark", "rareword"))
      .as[(Long, Long)].collect().toMap
    assert(got === reference(corpus, Seq("spark", "rareword")))
    // docs 4 (no term) and 5 (empty) are absent, not zero-scored
    assert(!got.contains(4L) && !got.contains(5L))
  }

  test("a rare term outweighs a stuffed common one") {
    // common: df 3/4; rare: df 2/4. Doc 1 stuffs the common term ×3
    // (idf 0.357 × tfp 1.571 ≈ 0.56), doc 2 has the rare term once
    // (idf 0.693 × tfp 1.0) — rarity beats term-stuffing; doc 3 holds
    // both and beats either
    val corpus = Seq(
      (1L, "common common common pad pad"),
      (2L, "rare pad pad pad pad"),
      (3L, "common rare pad pad pad"),
      (4L, "common pad pad pad pad")).toDF("doc_id", "text")
    val got = Bm25.score(corpus, "doc_id", "text", Seq("common", "rare"))
      .as[(Long, Long)].collect().toMap
    assert(got(2L) > got(1L))
    assert(got(3L) > got(2L) && got(3L) > got(1L))
  }

  test("topK pages with deterministic tie-break to the smaller id") {
    val tied = Seq(
      (7L, "same words exactly"), (3L, "same words exactly"),
      (5L, "other thing")).toDF("doc_id", "text")
    val got = Bm25.topK(tied, "doc_id", "text", Seq("same"), k = 2)
      .as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq(3L, 7L))
    assert(got(0)._2 === got(1)._2)
  }

  test("guards: empty/duplicate terms, bad params, bad k") {
    intercept[IllegalArgumentException] {
      Bm25.score(docs, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Bm25.score(docs, "doc_id", "text", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      Bm25.score(docs, "doc_id", "text", Seq("a"), b = 1.5)
    }
    intercept[IllegalArgumentException] {
      Bm25.topK(docs, "doc_id", "text", Seq("a"), k = 0)
    }
  }
}
