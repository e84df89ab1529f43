package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion of retrieval lists (Cormack, Clarke &
  * Büttcher, SIGIR 2009: "Reciprocal Rank Fusion outperforms Condorcet
  * and individual rank learning methods") — the standard first stage
  * of a hybrid lexical+dense retrieval stack (VERDICT r10 #3): each
  * ranker contributes 1/(k0 + rank) for the documents it retrieved,
  * and the fused score needs no score calibration between rankers
  * because only RANKS enter.
  *
  * Exactness discipline (the L43 quantization): the contribution is
  * floor(1e6 / (k0 + rank)) — ONE floor per (list, doc) on an exact
  * small-integer quotient (double division of ints this small cannot
  * land within 1e-9 of a wrong integer boundary), summed in BIGINT, so
  * the fused ordering is an exact integer compare both engines replay
  * bit-for-bit. Ties break to the smaller id — fully deterministic.
  *
  * Plan shape (the scale contract): inputs are the rankers' TOP-K
  * PAGES — grid-sized frames (k rows each), never corpora — so the
  * fusion is one full-outer join of two ≤k-row frames plus narrow
  * arithmetic; with the default ≤1024-row pages Spark broadcasts one
  * side. Nothing here rescans or reshuffles the corpus: the corpus
  * cost lives entirely in the upstream rankers (BM25's one aggregation
  * pass, ANN's bucketed probes). */
object Rrf {

  /** Fuse two ranked lists `a` and `b` — each (idCol, rankCol) with
    * ranks 1..k — into (idCol, rank_a, rank_b, rrf_e6, rank): absent
    * ranks surface as 0 and contribute nothing; `rrf_e6` is the exact
    * integer fused score; `rank` the fused page order (score desc, id
    * asc). Preconditions (self-review r11): ids must be UNIQUE within
    * each list (a duplicate would fan out through the full-outer join)
    * and ranks must be ≥ 1 — 0 is the RESERVED absent marker, so a
    * caller-supplied 0 would silently zero that entry's contribution.
    * Both hold by construction for any top-k page (row_number output). */
  def fuseTwo(a: DataFrame, b: DataFrame, idCol: String,
      k0: Int = 60, rankCol: String = "rank"): DataFrame = {
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    def contrib(rank: Column): Column =
      when(rank === 0L, lit(0L))
        .otherwise(floor(lit(1000000.0) / (lit(k0) + rank)).cast("long"))
    val la = a.select(col(idCol), col(rankCol).cast("long").as("rank_a"))
    val lb = b.select(col(idCol), col(rankCol).cast("long").as("rank_b"))
    val joined = la.join(lb, Seq(idCol), "full_outer")
      .select(col(idCol),
        coalesce(col("rank_a"), lit(0L)).as("rank_a"),
        coalesce(col("rank_b"), lit(0L)).as("rank_b"))
    // the unpartitioned window is a deliberate single-task sort over a
    // GRID-sized frame (≤ |a|+|b| page rows, never a corpus) — the same
    // bounded-driver-traffic class as the codebook collects
    joined
      .withColumn("rrf_e6",
        contrib(col("rank_a")) + contrib(col("rank_b")))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf_e6").desc, col(idCol))).cast("int"))
  }
}
