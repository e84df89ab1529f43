package graft.operators

import graft.SparkSpec

/** L201 ranked-retrieval scorecard pins: hand-worked DCG/IDCG floors,
  * the unjudged-vs-miss conventions, out-of-page candidates, the k
  * bound, and a seeded BigInt replay. */
class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], k: Int = 10) = {
    val r = RankEval.ndcgMrrAtK(
      rows.map(x => ("p", x._1, x._2, x._3)).toDF("p", "q", "rank", "rel"),
      "p", "q", "rank", "rel", k).collect().head
    (r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4))
  }

  test("hand case: DCG/IDCG floors land exactly") {
    // ranks (1,2,3) with rel (3,0,1): DCG = 3·10⁹ + 5·10⁸ = 3.5·10⁹;
    // ideal (3,1,0): IDCG = 3·10⁹ + 630929753 → ndcg = ⌊3.5·10¹⁵ /
    // 3630929753⌋ = 963940; first hit at rank 1 → mrr = 10⁶
    val got = run(Seq(("q1", 1L, 3L), ("q1", 2L, 0L), ("q1", 3L, 1L)))
    val want = (BigInt(1000000) * 3500000000L /
      BigInt(3630929753L)).toLong
    assert(want === 963940L, "the hand arithmetic itself")
    assert(got === ((1L, 1L, Some(963940L), 1000000L)))
  }

  test("perfect ordering reads exactly 10⁶; reversal reads less") {
    val perfect = run(Seq(("q1", 1L, 3L), ("q1", 2L, 2L), ("q1", 3L, 1L)))
    assert(perfect._3 === Some(1000000L))
    val reversed = run(Seq(("q1", 1L, 1L), ("q1", 2L, 2L), ("q1", 3L, 3L)))
    assert(reversed._3.get < 1000000L && reversed._4 === 1000000L,
      "rank-1 rel 1 > 0 still reads rr = 1 — MRR is binary-relevance")
  }

  test("unjudged query (no relevant candidate) is excluded from the " +
      "NDCG mean but its MRR miss counts as 0") {
    val got = run(Seq(("q1", 1L, 2L), ("q1", 2L, 0L),
      ("q2", 1L, 0L), ("q2", 2L, 0L)))
    assert(got === ((2L, 1L, Some(1000000L), 500000L)),
      "q2 unjudged: ndcg mean over q1 only; mrr = (10⁶ + 0)/2")
  }

  test("candidates beyond rank k neither score nor hit MRR, but DO " +
      "feed the ideal normalizer") {
    // rel 3 sits at rank 12 > k=10: DCG counts only rank-1 rel 1,
    // IDCG's ideal page leads with the 3 — ndcg reads the miss
    val got = run(Seq(("q1", 1L, 1L), ("q1", 12L, 3L)))
    val idcg = BigInt(3) * 1000000000L + 1L * 630929753L
    val want = (BigInt(1000000) * 1000000000L / idcg).toLong
    assert(got._3 === Some(want) && want === 275411L)
    assert(got._4 === 1000000L, "rank-1 rel 1 is still the first hit")
    val miss = run(Seq(("q1", 1L, 0L), ("q1", 12L, 3L)))
    assert(miss._4 === 0L, "no relevant hit inside the page: rr = 0")
  }

  test("k outside the literal table is a named require") {
    val e = intercept[IllegalArgumentException] {
      RankEval.ndcgMrrAtK(Seq(("p", "q", 1L, 1L))
        .toDF("p", "q", "rank", "rel"), "p", "q", "rank", "rel", 21)
    }
    assert(e.getMessage.contains("DiscountE9"))
  }

  test("seeded BigInt replay across a multi-query panel") {
    val rnd = new scala.util.Random(2002)
    val rows = (0 until 30).flatMap { q =>
      (1 to 15).map(r => (s"q$q", r.toLong, rnd.nextInt(4).toLong))
    }
    val (nq, nj, ndcg, mrr) = run(rows)
    val disc = RankEval.DiscountE9
    val perQ = rows.groupBy(_._1).values.toSeq.map { cs =>
      val dcg = cs.filter(_._2 <= 10)
        .map(c => BigInt(c._3) * disc((c._2 - 1).toInt)).sum
      val ideal = cs.map(_._3).sorted.reverse.take(10)
      val idcg = ideal.zipWithIndex
        .map { case (rl, i) => BigInt(rl) * disc(i) }.sum
      val rr = cs.filter(c => c._3 > 0 && c._2 <= 10)
        .map(_._2).sorted.headOption
        .map(1000000L / _).getOrElse(0L)
      (if (idcg == 0) None else Some(BigInt(1000000) * dcg / idcg), rr)
    }
    val judged = perQ.flatMap(_._1)
    assert(nq === 30L && nj === judged.size.toLong)
    assert(ndcg === Some((judged.sum / judged.size).toLong))
    assert(mrr === perQ.map(p => BigInt(p._2)).sum.toLong / 30L)
  }
}
