package graft

import org.apache.spark.sql.functions._

import graft.operators.NearDup

/** End-to-end properties of the composed training-data prep pipeline. */
class LlmPrepSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val prepped = LlmPrep.run(docs)

  test("survivors are a subset of the input with all stages applied") {
    val rows = prepped.select(col("doc_id"), col("split"), col("quality"))
      .as[(Long, String, Double)].collect()
    assert(rows.nonEmpty && rows.length <= docs.count())
    val inputIds = docs.select(col("doc_id")).as[Long].collect().toSet
    rows.foreach { case (id, split, q) =>
      assert(inputIds(id))
      assert(Set("train", "val", "test")(split))
      assert(q > 0.7)
    }
  }

  test("no near-duplicate pair survives the prune") {
    val left = prepped.select(col("doc_id"), col("text"))
    assert(NearDup.minhashPairs(left, "doc_id", "text",
      threshold = 0.8).count() === 0)
  }

  test("packs never span a (source, split) boundary and are contiguous") {
    // contiguity is only an invariant when every doc fits the budget
    // (an oversize doc legally overhangs and skips a pack number) —
    // assert the precondition so this test fails loudly, not spuriously,
    // if the corpus ever grows such a doc
    val over = prepped.filter(col("n_toks") > 512).count()
    assert(over === 0, s"$over docs exceed the pack budget; the contiguity " +
      "assertion below no longer applies — re-derive it")
    val byShard = prepped
      .select(col("source"), col("split"), col("pack_id"))
      .as[(String, String, Long)].collect()
      .groupBy(t => (t._1, t._2))
    byShard.foreach { case (shard, rows) =>
      val packs = rows.map(_._3).distinct.sorted
      assert(packs.head === 0L && packs === (0L to packs.last),
        s"shard $shard packs not contiguous: ${packs.toSeq}")
    }
  }

  test("pipeline is deterministic: identical assignment on a reshuffled input") {
    val again = LlmPrep.run(docs.repartition(7))
      .select(col("doc_id"), col("split"), col("pack_id"))
      .as[(Long, String, Long)].collect().toSet
    val first = prepped.select(col("doc_id"), col("split"), col("pack_id"))
      .as[(Long, String, Long)].collect().toSet
    assert(first === again)
  }
}
