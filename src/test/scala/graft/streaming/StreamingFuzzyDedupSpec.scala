package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingFuzzyDedupSpec extends SparkSpec {
  import spark.implicits._

  private def masterIds(path: String): Seq[Long] =
    spark.read.parquet(path).select(col("id")).as[Long]
      .collect().sorted.toSeq

  test("stream: typo'd keys rejected across batches; replay inserts 0") {
    implicit val sqlCtx = spark.sqlContext
    val master = java.nio.file.Files.createTempDirectory("graft_fz")
      .toString + "/master"
    val input = MemoryStream[(Long, String)]
    val q = StreamingFuzzyDedup.admitStream(
      input.toDF().toDF("id", "name"), master, "id", "name", maxDist = 1)
      .start()
    try {
      // batch 1: 1 and 2 distinct; 3 is a typo of 1 and 1 < 3 → blocked
      input.addData((1L, "alpha corp"), (2L, "beta gmbh"),
        (3L, "alpha c0rp"))
      q.processAllAvailable()
      assert(masterIds(master) === Seq(1L, 2L))
      // batch 2: 10 is a typo of an ADMITTED key → blocked; 11 is new;
      // 12 is a typo of 11 (same batch, larger id) → blocked
      input.addData((10L, "beta gmbp"), (11L, "gamma llc"),
        (12L, "gamma lld"))
      q.processAllAvailable()
      assert(masterIds(master) === Seq(1L, 2L, 11L))
    } finally q.stop()
    // redelivered batch 2: same admitted set re-derived, idempotent
    // append inserts 0 — the master is unchanged
    val inserted = StreamingFuzzyDedup.admitBatch(
      Seq((10L, "beta gmbp"), (11L, "gamma llc"), (12L, "gamma lld"))
        .toDF("id", "name"),
      master, "id", "name", maxDist = 1)
    assert(inserted === 0L)
    assert(masterIds(master) === Seq(1L, 2L, 11L))
  }

  test("conservative family drop: blocked-by-a-blocked-key still blocked (order-free)") {
    val master = java.nio.file.Files.createTempDirectory("graft_fz2")
      .toString + "/master"
    // 1 admits; 2 is a typo of 1 → blocked; 3 is a typo of 2 (but NOT
    // of 1): the conservative rule still blocks 3 — the family drops
    // whole, so the outcome cannot depend on how batches split
    val n = StreamingFuzzyDedup.admitBatch(
      Seq((1L, "acme inc"), (2L, "acme ince"), (3L, "acme inces"))
        .toDF("id", "name"),
      master, "id", "name", maxDist = 1)
    assert(n === 1L)
    assert(masterIds(master) === Seq(1L))
  }
}
