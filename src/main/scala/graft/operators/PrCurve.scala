package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Average precision + max-F1 operating point over a score column
  * (r15, L173; the PR companion of L158's ROC-AUC — Davis & Goadrich
  * 2006 ICML for why PR beats ROC under class imbalance; Zhu 2004 /
  * the IR trec convention for the interpolation-free AP form): AUC
  * asks "does the score order positives above negatives AT ALL";
  * AP weighs that ordering where a curation pipeline actually works
  * — the head of the ranking — and the max-F1 row is the DECISION
  * layer: the threshold a filter would deploy, chosen by exact
  * arithmetic instead of a validation-set eyeball.
  *
  * Tie-safe construction on the DISTINCT-SCORE grid (the q_qr16
  * stance — the corpus collapses before any wide operation; a score
  * tie is ONE threshold, never an arbitrary intra-tie order):
  * walking thresholds v from high to low, with tp_v / n_v the
  * cumulative positive / total counts at score ≥ v and Δtp_v the
  * positives at exactly v,
  *   AP  = (1/n₊)·Σ_v Δtp_v · tp_v/n_v
  *   F1(v) = 2·tp_v / (n_v + n₊)
  * Quantization contract (the L157 cascade stance): one truncating
  * division per OCCUPIED threshold — term_e9 = div(10⁹·Δtp·tp, n),
  * ap_e9 = div(Σ term, n₊), f1_e6 = div(10⁶·2·tp, n + n₊) — each
  * replayed token-for-token by the oracle; cascade under-read
  * < |grid|·10⁻⁹/n₊, stated. The operating point is
  * max(f1_e6, then threshold) — ties break toward the HIGHER
  * threshold, the more conservative filter, deterministically.
  * n₊ = 0 ⇒ NULL ap/f1 (nothing to rank); n₋ = 0 ⇒ ap = 10⁹ exactly
  * (every precision 1 — defined, not special-cased).
  *
  * Capacity: 10⁹·Δtp·tp ≤ 10⁹·N² in DECIMAL(38,0) ⇒ N ≤ ~3·10¹⁴.
  *
  * Scale shape: ONE map-side (leg, score) count collapses the
  * corpus; the cumulative walk is a per-leg sort window over THAT
  * grid (the mannWhitney window class — sort-based, spillable,
  * never raw rows); the argmax is a grid max of a struct. */
object PrCurve {

  /** Per-leg AP + best-F1 operating point: (legCol, n_pos, n_neg,
    * ap_e9, best_thr, best_f1_e6). Labels outside {0, 1} and null
    * rows drop; scores cast to long (quantize upstream). */
  def averagePrecision(df: DataFrame, legCol: String, labelCol: String,
      scoreCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Reserved.guard(Seq(legCol),
      Seq("__y", "__v", "__pos", "__tot", "__tp", "__n", "__term",
        "__f1", "__best", "n_pos", "n_neg", "ap_e9", "best_thr",
        "best_f1_e6"),
      "PrCurve")
    val base = df
      .filter(col(legCol).isNotNull && col(labelCol).isNotNull &&
        col(scoreCol).isNotNull)
      .select(col(legCol), col(labelCol).cast("long").as("__y"),
        col(scoreCol).cast("long").as("__v"))
      .filter(col("__y").isin(0L, 1L))
    val grid = base.groupBy(col(legCol), col("__v"))
      .agg(sum(col("__y")).as("__pos"), count(lit(1)).as("__tot"))
    val w = Window.partitionBy(col(legCol)).orderBy(col("__v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = grid.groupBy(col(legCol))
      .agg(sum(col("__pos")).as("n_pos"),
        sum(col("__tot") - col("__pos")).as("n_neg"))
    val walked = grid
      .withColumn("__tp", sum(col("__pos")).over(w))
      .withColumn("__n", sum(col("__tot")).over(w))
      .join(tot, Seq(legCol))
      .withColumn("__term", call_function("div",
        lit(1000000000L).cast(d38) * col("__pos").cast(d38)
          * col("__tp").cast(d38),
        col("__n").cast(d38)).cast("long"))
      .withColumn("__f1", call_function("div",
        lit(2000000L).cast(d38) * col("__tp").cast(d38),
        (col("__n") + col("n_pos")).cast(d38)).cast("long"))
    walked.groupBy(col(legCol))
      .agg(max(col("n_pos")).as("n_pos"), max(col("n_neg")).as("n_neg"),
        sum(col("__term")).as("__term"),
        max(struct(col("__f1"), col("__v"))).as("__best"))
      .select(col(legCol), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L, lit(null).cast("long"))
          .otherwise(call_function("div", col("__term").cast(d38),
            col("n_pos").cast(d38)).cast("long")).as("ap_e9"),
        when(col("n_pos") === 0L, lit(null).cast("long"))
          .otherwise(col("__best.__v")).as("best_thr"),
        when(col("n_pos") === 0L, lit(null).cast("long"))
          .otherwise(col("__best.__f1")).as("best_f1_e6"))
  }
}
