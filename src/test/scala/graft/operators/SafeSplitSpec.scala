package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SafeSplitSpec extends SparkSpec {
  import spark.implicits._

  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  // corpus with planted duplicate families: 1≈2≈3 (near-identical),
  // 10≈11, and unrelated singletons
  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog every day"),
    (2L, "the quick brown fox jumps over the lazy dog every day"),
    (3L, "the quick brown fox jumps over the lazy dog every night"),
    (10L, "colorless green ideas sleep furiously in the long winter"),
    (11L, "colorless green ideas sleep furiously in the long summer"),
    (20L, "a totally unrelated document about databases and engines"),
    (21L, "another fully distinct text concerning graphs and queries"))
    .toDF("doc_id", "text")

  test("no near-dup pair straddles splits; singletons keep their own id as cluster") {
    val got = SafeSplit.assign(corpus, "doc_id", "text", splits,
        threshold = 0.5)
      .select(col("doc_id"), col("cluster"), col("split"))
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    val byId = got.map(r => r._1 -> r).toMap
    // every document assigned exactly once
    assert(got.map(_._1) === Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L))
    // families share cluster AND split
    for (family <- Seq(Seq(1L, 2L, 3L), Seq(10L, 11L))) {
      assert(family.map(byId(_)._2).distinct.size === 1, s"cluster $family")
      assert(family.map(byId(_)._3).distinct.size === 1, s"split $family")
      assert(byId(family.head)._2 === family.min)
    }
    // singletons: cluster is the doc's own id
    for (id <- Seq(20L, 21L)) assert(byId(id)._2 === id)
    // split fate is the hashSplit of the cluster id — replay it
    val want = Sampling.hashSplit(
        got.map(_._2).distinct.toDF("cluster"), col("cluster"), splits)
      .as[(Long, String)].collect().toMap
    got.foreach { case (id, cl, sp) => assert(sp === want(cl), s"doc $id") }
  }

  test("property: leakage-freedom holds on a random mutated corpus (seeded)") {
    val rnd = new scala.util.Random(65)
    val vocab = (0 until 18).map(i => s"w$i")
    val originals = (1 to 15).map { i =>
      i.toLong -> (0 until 10).map(_ => vocab(rnd.nextInt(vocab.size)))
    }
    val mutated = originals.filter(_ => rnd.nextBoolean()).map {
      case (id, toks) =>
        val t = toks.toArray
        t(rnd.nextInt(t.length)) = vocab(rnd.nextInt(vocab.size))
        (id + 100) -> t.toSeq
    }
    val docs = (originals ++ mutated)
      .map { case (id, t) => id -> t.mkString(" ") }.toDF("doc_id", "text")
    val threshold = 0.5
    val assigned = SafeSplit.assign(docs, "doc_id", "text", splits,
      threshold = threshold)
    val splitOf = assigned.select(col("doc_id"), col("split"))
      .as[(Long, String)].collect().toMap
    // the exact pair set is the ground truth: no pair may straddle
    val pairs = SetSimJoin.pairs(docs, "doc_id", "text",
        threshold = threshold)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture must contain near-dups")
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) === splitOf(b), s"pair ($a,$b) straddles splits")
    }
  }

  test("reserved-name guard and null-id drop") {
    val bad = Seq((1L, "a b c", "x")).toDF("doc_id", "text", "split")
    intercept[IllegalArgumentException] {
      SafeSplit.assignFromPairs(bad, corpus.limit(0)
        .select(col("doc_id").as("id_a"), col("doc_id").as("id_b")),
        "doc_id", splits)
    }
    val withNull = Seq((Some(1L), "a b c d"), (None, "e f g h"))
      .toDF("doc_id", "text")
    val got = SafeSplit.assign(withNull, "doc_id", "text", splits)
    assert(got.count() === 1) // null id dropped, hashSplit's contract
  }
}
