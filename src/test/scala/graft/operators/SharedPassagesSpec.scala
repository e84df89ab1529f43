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
