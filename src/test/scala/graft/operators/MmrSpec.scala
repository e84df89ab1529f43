package graft.operators

import graft.SparkSpec

/** MMR re-ranking (L120): the defining redundancy-penalty pick,
  * pure-relevance at λ=1, hand-computed scores, missing-sim default,
  * short pages, and the page guard. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // A highly relevant, B a near-dup of A, C distinct but less relevant
  private def cand = Seq(
    (1L, 10L, 900000L), (1L, 11L, 850000L), (1L, 12L, 500000L))
    .toDF("query_id", "neighbor_id", "rel_e6")
  private def sims = Seq(
    (1L, 10L, 11L, 950000L), (1L, 10L, 12L, 100000L),
    (1L, 11L, 12L, 100000L))
    .toDF("query_id", "id_a", "id_b", "sim_e6")

  test("redundancy penalty demotes the near-duplicate (hand-computed)") {
    val out = Mmr.rerank(cand, sims, k = 3, lamE1 = 7)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // pick1 A: 7·900000; pick2 C: 7·500000−3·100000 beats B's
    // 7·850000−3·950000; pick3 B with maxsim to {A,C} = 950000
    assert(out.toSeq === Seq(
      (1, 10L, 6300000L), (2, 12L, 3200000L), (3, 11L, 3100000L)))
  }

  test("lambda = 1 degenerates to pure relevance order") {
    val out = Mmr.rerank(cand, sims, k = 3, lamE1 = 10)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(out.toSeq === Seq(10L, 11L, 12L))
  }

  test("missing pair similarities read 0 (no penalty)") {
    val out = Mmr.rerank(cand,
        Seq.empty[(Long, Long, Long, Long)]
          .toDF("query_id", "id_a", "id_b", "sim_e6"),
        k = 3, lamE1 = 7)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(out.toSeq === Seq(10L, 11L, 12L)) // relevance order
  }

  test("short pages rank every candidate and stop") {
    val out = Mmr.rerank(cand, sims, k = 10, lamE1 = 7).collect()
    assert(out.length === 3)
  }

  test("page guard refuses corpus-scale candidate sets") {
    val big = (1L to 1001L).map(i => (1L, i, 1000L))
      .toDF("query_id", "neighbor_id", "rel_e6")
    val e = intercept[IllegalArgumentException] {
      Mmr.rerank(big, sims, k = 3)
    }
    assert(e.getMessage.contains("page the retriever first"))
  }
}
