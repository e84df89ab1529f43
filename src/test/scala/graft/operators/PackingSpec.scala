package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packBySize: documents fall into the pack their start offset lands in") {
    // starts: 0, 300, 600, 900 → packs (budget 512): 0, 0, 1, 1
    val docs = Seq(("a", 1L, 300), ("a", 2L, 300), ("a", 3L, 300),
      ("a", 4L, 300)).toDF("shard", "doc_id", "n")
    val got = Packing.packBySize(docs, "shard", "doc_id", col("n"), 512)
      .select(col("doc_id"), col("pack_id")).as[(Long, Long)]
      .collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("packBySize: shards pack independently and pack ids are contiguous") {
    // all sizes (40..46) < budget (256), so contiguity IS an invariant
    // here — an oversize doc would legally skip a pack number
    val docs = (1 to 200).map(i => (s"s${i % 4}", i.toLong, 40 + i % 7))
      .toDF("shard", "doc_id", "n")
    val got = Packing.packBySize(docs, "shard", "doc_id", col("n"), 256)
      .select(col("shard"), col("pack_id")).as[(String, Long)]
      .collect().groupBy(_._1).map { case (s, xs) =>
        s -> xs.map(_._2).distinct.sorted }
    got.foreach { case (shard, packs) =>
      assert(packs.head === 0L && packs === (0L to packs.last),
        s"shard $shard pack ids not contiguous from 0: $packs")
    }
  }

  test("packBySize: a doc larger than the budget gets its own pack start") {
    // starts: 0, 700, 800 → packs: 0, 1, 1 (oversize doc overhangs; the
    // NEXT doc still lands by its own start offset)
    val docs = Seq(("a", 1L, 700), ("a", 2L, 100), ("a", 3L, 100))
      .toDF("shard", "doc_id", "n")
    val got = Packing.packBySize(docs, "shard", "doc_id", col("n"), 512)
      .select(col("doc_id"), col("pack_id")).as[(Long, Long)]
      .collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("randomized: matches an independent in-memory reference model") {
    val rnd = new scala.util.Random(7)
    val docs = for {
      (s, si) <- Seq("a", "b", "c").zipWithIndex
      i <- 1 to 500
    } yield (s, si * 10000L + i, 1 + rnd.nextInt(300))
    val budget = 777
    val want = docs.groupBy(_._1).flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._2).map { case (_, id, n) =>
        val pack = cum / budget
        cum += n
        id -> pack
      }
    }
    val got = Packing.packBySize(
        docs.toDF("shard", "doc_id", "n").repartition(5),
        "shard", "doc_id", col("n"), budget)
      .select(col("doc_id"), col("pack_id")).as[(Long, Long)]
      .collect().toMap
    assert(got === want)
  }

  test("packBySize rejects a non-positive budget") {
    val df = Seq(("a", 1L, 1)).toDF("shard", "doc_id", "n")
    intercept[IllegalArgumentException] {
      Packing.packBySize(df, "shard", "doc_id", col("n"), 0)
    }
  }
}
