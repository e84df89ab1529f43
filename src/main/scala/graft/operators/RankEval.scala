package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation: NDCG@k + MRR@k (r17, L201;
  * Järvelin & Kekäläinen 2002, TOIS 20 §4; Voorhees 1999 TREC-8) —
  * the EVAL layer over the retrieval stack the engine already ships
  * (BM25 L60, hybrid RRF L92, ANN v-series): a retriever without a
  * graded-relevance scorecard can't be compared, tuned, or
  * regression-gated. NDCG reads the whole ranked page with graded
  * relevance and a position discount; MRR reads "where was the FIRST
  * relevant hit" (navigational quality).
  *
  * Exact-integer contract: the only irrational ingredient is the
  * 1/log₂(i+1) discount — shipped as a FIXED 20-entry e9 literal
  * table ([[DiscountE9]], i = 1..20) consumed by BOTH engines (the
  * L187 PValue-table discipline: no runtime transcendental, no
  * cross-engine float boundary). With integer rel ≥ 0:
  *   DCG_e9  = Σ_{rank ≤ k} rel·disc(rank)        (exact LONG sums)
  *   IDCG_e9 = Σ_{i ≤ k} rel_(i)·disc(i)  over the query's own
  *             rel sorted DESC (ideal reordering of the SAME
  *             candidate set — the standard per-query normalizer)
  *   ndcg_ppm = ⌊10⁶·DCG/IDCG⌋ per query ([[Exact.dfloor]]);
  *   IDCG = 0 (no relevant candidate at all) ⇒ the query is
  *   UNJUDGED — excluded from the NDCG mean, counted in n_q −
  *   n_judged (averaging an undefined 0/0 as 0 would punish the
  *   retriever for the judgment set's gaps).
  *   rr_e6 = ⌊10⁶/min rank of a relevant hit ≤ k⌋, 0 when no
  *   relevant hit is inside the page (the standard MRR miss = 0 —
  *   misses DO count against the mean, unlike unjudged NDCG:
  *   conventions differ because MRR is defined per retrieval, not
  *   per normalizer).
  * Panel means are one more floor each: ndcg_ppm = ⌊Σ/n_judged⌋,
  * mrr_e6 = ⌊Σ/n_q⌋. Capacity: rel·disc ≤ 10⁹·rel_max and k ≤ 20
  * terms — DCG ≤ 2·10¹⁰·rel_max fits LONG to rel_max ~ 4·10⁸; the
  * panel sums widen to DECIMAL.
  *
  * Contract: `rankCol` is the caller's 1-based ranking (compute it
  * with a deterministic window — score DESC with an id tiebreak);
  * ranks must be unique per (panel, qid) — duplicate ranks would
  * double-count a position (caller bug, not detectable locally
  * without a second window; stated). k ≤ 20 (the table's length,
  * `require`d — extend the literal table to extend k).
  *
  * Scale shape: one filter + per-(panel, qid) window over the
  * CANDIDATE PAGES (pages are k-bounded per query by construction
  * of any top-k retriever — the corpus never reaches this operator),
  * then two grid aggregations. Nothing corpus-shaped. */
object RankEval {

  /** ⌊10⁹/log₂(i+1)⌋ for rank i = 1..20 — fixed literals, consumed
    * by both engines (never recomputed from a runtime log). */
  private[graft] val DiscountE9: Seq[Long] = Seq(
    1000000000L, 630929753L, 500000000L, 430676558L,
    386852807L, 356207187L, 333333333L, 315464876L,
    301029995L, 289064826L, 278942945L, 270238154L,
    262649535L, 255958024L, 250000000L, 244650542L,
    239812466L, 235408913L, 231378213L, 227670248L)

  /** The table as a DuckDB list literal for oracle injection. */
  private[graft] def discountSqlList: String =
    DiscountE9.mkString("[", ",", "]")

  /** Per-panel scorecard over ranked candidate pages: emits
    * (panelCol, n_q, n_judged, ndcg_ppm, mrr_e6). */
  def ndcgMrrAtK(df: DataFrame, panelCol: String, qidCol: String,
      rankCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= DiscountE9.size,
      s"k $k outside [1, ${DiscountE9.size}] — extend DiscountE9")
    Reserved.guard(Seq(panelCol),
      Seq("__q", "__rank", "__rel", "__irank", "__dcg", "__idcg",
        "__rr", "__ndcg", "n_q", "n_judged", "ndcg_ppm", "mrr_e6"),
      "RankEval")
    val d38 = "decimal(38,0)"
    val base = df
      .filter(col(panelCol).isNotNull && col(qidCol).isNotNull &&
        col(rankCol).isNotNull && col(relCol).isNotNull)
      .select(col(panelCol), col(qidCol).cast("string").as("__q"),
        col(rankCol).cast("long").as("__rank"),
        greatest(col(relCol).cast("long"), lit(0L)).as("__rel"))
    def disc(i: org.apache.spark.sql.Column) =
      element_at(typedlit(DiscountE9), i.cast("int"))
    // ideal rank: the query's own rel sorted desc (rank tiebreak for
    // determinism — ties in rel carry equal rel so the sum is
    // tiebreak-invariant)
    val iw = Window.partitionBy(col(panelCol), col("__q"))
      .orderBy(col("__rel").desc, col("__rank"))
    val ranked = base.withColumn("__irank",
      row_number().over(iw).cast("long"))
    val perQ = ranked.groupBy(col(panelCol), col("__q"))
      .agg(
        sum(when(col("__rank") <= k,
          col("__rel") * disc(col("__rank"))).otherwise(0L))
          .as("__dcg"),
        sum(when(col("__irank") <= k,
          col("__rel") * disc(col("__irank"))).otherwise(0L))
          .as("__idcg"),
        min(when(col("__rel") > 0L && col("__rank") <= k,
          col("__rank"))).as("__rr"))
    val scored = perQ.select(col(panelCol),
      when(col("__idcg") === 0L, lit(null).cast("long"))
        .otherwise(Exact.dfloor(lit(1000000L).cast(d38) *
          col("__dcg").cast(d38), col("__idcg").cast(d38))
          .cast("long")).as("__ndcg"),
      coalesce(call_function("div", lit(1000000L), col("__rr")),
        lit(0L)).as("__rr"))
    scored.groupBy(col(panelCol))
      .agg(count(lit(1)).as("n_q"),
        count(col("__ndcg")).as("n_judged"),
        sum(col("__ndcg").cast(d38)).as("__sn"),
        sum(col("__rr").cast(d38)).as("__sr"))
      .select(col(panelCol), col("n_q"), col("n_judged"),
        when(col("n_judged") === 0L, lit(null).cast("long"))
          .otherwise(Exact.dfloor(col("__sn"),
            col("n_judged").cast(d38)).cast("long")).as("ndcg_ppm"),
        Exact.dfloor(col("__sr"), col("n_q").cast(d38))
          .cast("long").as("mrr_e6"))
  }
}
