package graft.operators

import graft.SparkSpec

class SharedPassagesSpec extends SparkSpec {
  import spark.implicits._

  // docs 1 and 2 share one verbatim 8-token run (-> one 8-gram);
  // docs 3-8 all carry the same 8-token boilerplate run (df=6 > maxDf=5);
  // doc 9 is unrelated.
  private val passage = "the quick brown fox jumps over the lazy"
  private val boiler = "this document is provided as is without warranty"
  private def corpus = Seq(
    (1L, s"alpha beta $passage gamma delta"),
    (2L, s"epsilon zeta $passage eta theta"),
    (3L, s"one $boiler two"),
    (4L, s"three $boiler four"),
    (5L, s"five $boiler six"),
    (6L, s"seven $boiler eight"),
    (7L, s"nine $boiler ten"),
    (8L, s"eleven $boiler twelve"),
    (9L, "completely unrelated filler text with many distinct words here")
  ).toDF("doc_id", "text")

  test("one shared 8-token run -> exactly one pair with n_shared = 1") {
    val got = SharedPassages.pairs(corpus, "doc_id", "text",
        shingleLen = 8, maxDf = 5, minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L)))
  }

  test("grams above maxDf are boilerplate, not passages — no pair storm") {
    // boilerplate run has df=6: with maxDf=5 it must produce NO pairs
    // among docs 3-8 (15 would appear if the rarity cap broke)
    val got = SharedPassages.pairs(corpus, "doc_id", "text",
        shingleLen = 8, maxDf = 5, minShared = 1)
      .as[(Long, Long, Long)].collect()
    assert(!got.exists(p => p._1 >= 3L && p._1 <= 8L))
    // raising maxDf past the df admits them: C(6,2)=15 pairs appear
    val loose = SharedPassages.pairs(corpus, "doc_id", "text",
        shingleLen = 8, maxDf = 6, minShared = 1)
      .as[(Long, Long, Long)].collect()
    assert(loose.count(p => p._1 >= 3L && p._1 <= 8L) == 15)
  }

  test("n_shared counts DISTINCT shared grams; minShared filters") {
    // two docs sharing a 9-token run share two overlapping 8-grams
    val run9 = "a b c d e f g h i"
    val df2 = Seq((1L, s"x $run9 y"), (2L, s"z $run9 w")).toDF("doc_id", "text")
    val got = SharedPassages.pairs(df2, "doc_id", "text",
        shingleLen = 8, maxDf = 5, minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 2L)))
    assert(SharedPassages.pairs(df2, "doc_id", "text",
      shingleLen = 8, maxDf = 5, minShared = 3).count() == 0)
  }

  test("maxSharedRun: exact run length; differs from presence (L33) and whole-doc sim (L2)") {
    // pair (1,2): ONE contiguous 20-token quote  -> max_run = 20
    // pair (3,4): THREE scattered 8-token runs   -> max_run = 8
    // presence ranks (3,4) ABOVE (1,2) (3 rare grams vs 13... n_shared
    // counts grams, runs count length) — the two signals genuinely
    // disagree, and whole-doc minhash at 0.8 sees neither pair
    val quote20 = (1 to 20).map(i => s"q$i").mkString(" ")
    val r1 = (1 to 8).map(i => s"r$i").mkString(" ")
    val r2 = (1 to 8).map(i => s"s$i").mkString(" ")
    val r3 = (1 to 8).map(i => s"t$i").mkString(" ")
    val fill = (c: Char) => (1 to 30).map(i => s"$c$i").mkString(" ")
    val docs = Seq(
      (1L, s"${fill('a')} $quote20 ${fill('b')}"),
      (2L, s"${fill('c')} $quote20 ${fill('d')}"),
      (3L, s"${fill('e')} $r1 ${fill('f')} $r2 ${fill('g')} $r3 ${fill('h')}"),
      (4L, s"${fill('i')} $r1 ${fill('j')} $r2 ${fill('k')} $r3 ${fill('l')}"))
      .toDF("doc_id", "text")
    val runs = SharedPassages.maxSharedRun(docs, "doc_id", "text",
        shingleLen = 8, maxDf = 5)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, r) => (a, b) -> r }.toMap
    assert(runs.isDefinedAt((1L, 2L)) && runs.isDefinedAt((3L, 4L)),
      s"both pairs are candidates: $runs")
    assert(runs((1L, 2L)) === 20L, s"one 20-token quote: $runs")
    assert(runs((3L, 4L)) === 8L, s"three scattered 8-runs, max 8: $runs")
    val shared = SharedPassages.pairs(docs, "doc_id", "text",
        shingleLen = 8, maxDf = 5, minShared = 1)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(shared((3L, 4L)) === 3L && shared((1L, 2L)) === 13L,
      s"presence counts grams, not length: $shared")
    assert(NearDup.minhashPairs(docs, "doc_id", "text", shingleLen = 3,
      threshold = 0.8).count() == 0, "whole-doc near-dup sees neither pair")
    NearDup.releaseMaterialized()
  }

  test("maxSharedRun: randomized vs a brute-force LCS-on-tokens reference (seeded)") {
    // small-vocab random docs with PLANTED shared runs — the reference
    // recomputes candidacy (rare-gram sharing) and per-pair LCS from
    // scratch in plain Scala
    val rnd = new scala.util.Random(173)
    def word() = s"w${rnd.nextInt(500)}"
    val planted = (1 to 12).map(i => s"p$i").mkString(" ") // 12-token run
    val texts = (1L to 12L).map { id =>
      val body = Seq.fill(40)(word()).mkString(" ")
      // every third doc carries the planted run at a random-ish offset
      id -> (if (id % 3 == 0) s"$body $planted ${Seq.fill(10)(word()).mkString(" ")}"
             else body)
    }
    val n = 8
    val maxDf = 5
    def toks(t: String) = t.trim.split("\\s+").toSeq
    def grams(t: String) = toks(t).sliding(n).filter(_.size == n)
      .map(_.mkString(" ")).toSet
    val gramDf = texts.flatMap { case (_, t) => grams(t) }
      .groupBy(identity).map { case (g, v) => g -> v.size }
    val rare = gramDf.collect { case (g, d) if d >= 2 && d <= maxDf => g }.toSet
    def lcs(a: Seq[String], b: Seq[String]): Int = {
      // O(|a|·|b|) token DP — the independent formulation
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- a.indices.reverse; j <- b.indices.reverse) {
        dp(i)(j) = if (a(i) == b(j)) 1 + dp(i + 1)(j + 1) else 0
        if (dp(i)(j) > best) best = dp(i)(j)
      }
      best
    }
    val want = (for {
      (ia, ta) <- texts; (ib, tb) <- texts if ia < ib
      if grams(ta).intersect(grams(tb)).exists(rare)
    } yield (ia, ib, lcs(toks(ta), toks(tb)).toLong)).toSet
    val got = SharedPassages.maxSharedRun(
        texts.toDF("doc_id", "text"), "doc_id", "text",
        shingleLen = n, maxDf = maxDf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want, s"got=$got\nwant=$want")
    NearDup.releaseMaterialized()
  }

  test("passage pairs are NOT whole-doc near-dups (the operators differ)") {
    // long distinct docs sharing one short run: jaccard far below 0.8
    val filler1 = (1 to 40).map(i => s"u$i").mkString(" ")
    val filler2 = (1 to 40).map(i => s"v$i").mkString(" ")
    val df2 = Seq((1L, s"$filler1 $passage"), (2L, s"$filler2 $passage"))
      .toDF("doc_id", "text")
    assert(SharedPassages.pairs(df2, "doc_id", "text", shingleLen = 8,
      maxDf = 5, minShared = 1).count() == 1)
    assert(NearDup.minhashPairs(df2, "doc_id", "text", shingleLen = 3,
      threshold = 0.8).count() == 0)
    NearDup.releaseMaterialized()
  }
}
