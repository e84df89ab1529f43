package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private case class Score(id: Long, n: Long, nll: Long, ppl: Option[Long])

  private def run(docs: Seq[(Long, String)],
      ref: Option[Seq[(Long, String)]] = None): Map[Long, Score] =
    LmScore.bigramPerplexity(docs.toDF("doc_id", "text"), "doc_id", "text",
        reference = ref.map(_.toDF("doc_id", "text")))
      .as[(Long, Long, Long, Option[Long])].collect()
      .map { case (id, n, nll, ppl) => id -> Score(id, n, nll, ppl) }.toMap

  /** The model and quantization recomputed in plain Scala — counts from
    * scratch, one ln per position floored half-up to 1e-4 nats, exact
    * integer totals, perplexity from those integers. */
  private def reference(score: Seq[(Long, String)],
      train: Seq[(Long, String)]): Map[Long, Score] = {
    def toks(t: String) = {
      val tr = t.trim
      if (tr.isEmpty) Seq.empty[String] else tr.split("\\s+").toSeq
    }
    def bigrams(t: String) = toks(t).sliding(2).filter(_.size == 2)
      .map(w => (w(0), w(1))).toSeq
    val refBg = train.flatMap { case (_, t) => bigrams(t) }
    val c2 = refBg.groupBy(identity).map { case (k, v) => k -> v.size }
    val c1 = refBg.groupBy(_._1).map { case (k, v) => k -> v.size }
    val v = train.flatMap { case (_, t) => toks(t) }.distinct.size
    score.map { case (id, t) =>
      val bs = bigrams(t)
      val nll = bs.map { b =>
        val num = (c1.getOrElse(b._1, 0) + v).toDouble
        val den = c2.getOrElse(b, 0) + 1.0
        math.floor(math.log(num / den) * 10000.0 + 0.5).toLong
      }.sum
      val n = bs.size.toLong
      val ppl = if (n > 0)
        Some(math.floor(math.exp(nll.toDouble / 10000.0 / n) * 1000.0 + 0.5)
          .toLong)
      else None
      id -> Score(id, n, nll, ppl)
    }.toMap
  }

  test("hand-computed add-one bigram NLL; short docs get n=0 and NULL perplexity") {
    // corpus "a b a" + "c a b" + "solo": c2 = {(a,b)->2, (b,a)->1,
    // (c,a)->1}, c1 = {a->2, b->1, c->1}, and V=4 — the 1-token doc
    // contributes no bigram but DOES extend the vocabulary
    val docs = Seq((1L, "a b a"), (2L, "c a b"), (3L, "solo"), (4L, "  "))
    val got = run(docs)
    // doc 1: ln((2+4)/(2+1)) + ln((1+4)/(1+1)) = ln(2) + ln(2.5)
    val expected = math.floor(math.log(2.0) * 10000.0 + 0.5).toLong +
      math.floor(math.log(2.5) * 10000.0 + 0.5).toLong
    assert(got(1L).n === 2L)
    assert(got(1L).nll === expected, s"6931 + 9163: $got")
    assert(got(1L).ppl === Some(math.floor(
      math.exp(expected.toDouble / 10000.0 / 2.0) * 1000.0 + 0.5).toLong))
    assert(got(3L) === Score(3L, 0L, 0L, None), "1-token doc has no bigram")
    assert(got(4L) === Score(4L, 0L, 0L, None), "blank doc has no bigram")
    assert(got === reference(docs, docs))
  }

  test("repeated fluent phrases score lower perplexity than shuffled gibberish") {
    // same unigram bag, so the surface-statistics quality score can't
    // separate them — the bigram model must: docs 1-4 repeat the same
    // word ORDER, doc 5 scrambles it differently every line
    val phrase = "the quick brown fox jumps over the lazy dog"
    val scrambles = Seq(
      "dog the over quick lazy fox the brown jumps",
      "brown lazy the jumps dog over fox the quick",
      "jumps fox lazy the dog brown quick over the")
    val docs = (1L to 4L).map(i => i -> s"$phrase $phrase") ++
      Seq(5L -> scrambles.mkString(" "))
    val got = run(docs)
    assert((1L to 4L).forall(i => got(i).ppl.get < got(5L).ppl.get),
      s"fluent repetition must beat gibberish: $got")
    assert(got === reference(docs, docs))
  }

  test("external reference model: unseen contexts score the uniform ln(V) floor") {
    val train = Seq((100L, "a b c a b"))
    // V = 3, unseen context 'z': NLL = ln((0+3)/(0+1)) = ln 3 per position
    val docs = Seq((1L, "z z z"))
    val got = run(docs, ref = Some(train))
    val lnV = math.floor(math.log(3.0) * 10000.0 + 0.5).toLong
    assert(got(1L) === Score(1L, 2L, 2L * lnV, Some(math.floor(
        math.exp((2L * lnV).toDouble / 10000.0 / 2.0) * 1000.0 + 0.5).toLong)),
      s"2 bigrams at the uniform floor: $got")
    assert(got === reference(docs, train))
  }

  test("randomized vs the plain-Scala reference model (seeded)") {
    val rnd = new scala.util.Random(233)
    def word() = s"w${rnd.nextInt(40)}"
    val docs = (1L to 30L).map { id =>
      id -> Seq.fill(rnd.nextInt(60))(word()).mkString(" ")
    }
    assert(run(docs) === reference(docs, docs))
  }
}
