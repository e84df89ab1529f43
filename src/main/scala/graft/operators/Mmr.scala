package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998,
  * SIGIR) — the diversification stage between retrieval and
  * consumption: greedily re-rank a candidate page so each pick trades
  * relevance against redundancy with what's already picked,
  * `argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` — the standard fix
  * for near-duplicate-stuffed top-k pages (which this battery's dedup
  * families would otherwise only catch corpus-side).
  *
  * Integer determinism: relevance and pairwise similarities are the
  * q_v1-discipline rounded exact cosines quantized to 1e-6 ints;
  * λ = lamE1/10 keeps the score integral (`score = lamE1·rel −
  * (10−lamE1)·maxsim`, 1e-7 units); picks tie-break by (score desc,
  * id asc) — total order, so a fixed k yields identical selections on
  * any engine and the oracle replays the unrolled greedy rounds.
  * The first pick has an empty selected set: second term 0, the
  * textbook convention.
  *
  * Scale shape: candidate pages are TOP-K PAGES (bounded — the RRF
  * class), their pairwise-sim grid is ≤ pages·k² rows, and the greedy
  * runs driver-side on that grid (the BT/PCA bounded-grid pattern;
  * re-ranking is a per-QUERY operation, never corpus-scale). The
  * corpus-scale work lives in the upstream retriever. */
object Mmr {

  /** Guard: the per-query candidate grid must stay page-sized. */
  val MaxCandidatesPerQuery = 1000

  /** Greedy MMR over candidate pages.
    * `candidates`: (query_id, neighbor_id, rel_e6) — bounded per
    * query; `sims`: (query_id, id_a, id_b, sim_e6) pairwise among each
    * query's candidates (either orientation; missing pair reads
    * sim 0 — callers supply the full grid). Returns
    * (query_id, rank, neighbor_id, score_e7) for `k` picks per query
    * (fewer if the page is shorter). */
  def rerank(candidates: DataFrame, sims: DataFrame, k: Int,
      lamE1: Int = 7): DataFrame = {
    require(k >= 1 && k <= 100, s"k must be in [1, 100], got $k")
    require(lamE1 >= 0 && lamE1 <= 10,
      s"lamE1 is tenths in [0, 10], got $lamE1")
    val spark = candidates.sparkSession
    import spark.implicits._
    val cand = candidates
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("rel_e6").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQuery = cand.groupBy(_._1)
    byQuery.foreach { case (q, cs) =>
      require(cs.length <= MaxCandidatesPerQuery,
        s"query $q has ${cs.length} candidates — MMR re-ranks PAGES " +
          s"(≤ $MaxCandidatesPerQuery); page the retriever first")
    }
    val simMap = sims
      .select(col("query_id").cast("long"), col("id_a").cast("long"),
        col("id_b").cast("long"), col("sim_e6").cast("long"))
      .collect()
      .flatMap(r => Seq(((r.getLong(0), r.getLong(1), r.getLong(2)),
        r.getLong(3)),
        ((r.getLong(0), r.getLong(2), r.getLong(1)), r.getLong(3))))
      .toMap
    val out = byQuery.toSeq.sortBy(_._1).flatMap { case (q, cs) =>
      val rel = cs.map(c => c._2 -> c._3).toMap
      var remaining = rel.keySet
      var selected = Vector.empty[(Long, Long)] // (id, score_e7)
      while (selected.size < k && remaining.nonEmpty) {
        val scored = remaining.toSeq.map { id =>
          val maxSim =
            if (selected.isEmpty) 0L
            else selected.map(s =>
              simMap.getOrElse((q, id, s._1), 0L)).max
          id -> (lamE1 * rel(id) - (10L - lamE1) * maxSim)
        }
        val (pick, score) = scored.minBy { case (id, s) => (-s, id) }
        selected :+= ((pick, score))
        remaining -= pick
      }
      selected.zipWithIndex.map { case ((id, s), i) =>
        (q, i + 1, id, s)
      }
    }
    out.toDF("query_id", "rank", "neighbor_id", "score_e7")
  }

  /** Unrolled greedy replay for DuckDB — expects CTEs
    * `cand(query_id, neighbor_id, rel_e6)` and the SYMMETRIC
    * `ss(query_id, ia, ib, sim_e6)`; emits the final
    * (query_id, rank, neighbor_id, score_e7) SELECT. Generated from
    * the SAME (k, lamE1). */
  private[graft] def oracleCtes(k: Int, lamE1: Int): String = {
    val lamC = 10 - lamE1
    val rounds = (2 to k).map { r =>
      s"""rem$r AS MATERIALIZED (
            SELECT c.* FROM cand c
            WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} s
                              WHERE s.query_id = c.query_id
                                AND s.neighbor_id = c.neighbor_id)),
          sc$r AS MATERIALIZED (
            SELECT rem$r.query_id, rem$r.neighbor_id,
                   $lamE1 * rem$r.rel_e6 - $lamC * COALESCE(
                     (SELECT MAX(ss.sim_e6) FROM ss
                      JOIN sel${r - 1} s
                        ON ss.query_id = s.query_id
                       AND ss.ib = s.neighbor_id
                      WHERE ss.query_id = rem$r.query_id
                        AND ss.ia = rem$r.neighbor_id), 0) AS score
            FROM rem$r),
          pk$r AS MATERIALIZED (
            SELECT query_id, neighbor_id, score, $r AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY score DESC, neighbor_id) AS rn FROM sc$r)
            WHERE rn = 1),
          sel$r AS MATERIALIZED (
            SELECT * FROM sel${r - 1}
            UNION ALL SELECT query_id, neighbor_id, score, rank
            FROM pk$r)"""
    }.mkString(",\n")
    s"""sel1 AS MATERIALIZED (
          SELECT query_id, neighbor_id,
                 $lamE1 * rel_e6 AS score, 1 AS rank
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY $lamE1 * rel_e6 DESC, neighbor_id) AS rn
                FROM cand)
          WHERE rn = 1),
        $rounds
       SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
              CAST(score AS BIGINT) AS score_e7
       FROM sel$k ORDER BY query_id, rank"""
  }
}
