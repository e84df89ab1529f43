package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal calibration (Papadopoulos et al. 2002 "Inductive
  * confidence machines for regression", ECML; Vovk et al. 2005
  * "Algorithmic Learning in a Random World"; Lei et al. 2018 JASA) —
  * the distribution-free upper bound: given nonconformity scores on a
  * held-out CALIBRATION split, the threshold
  *   q̂ = the ⌈(n+1)·(1−α)⌉-th smallest calibration score
  * guarantees P(new score ≤ q̂) ≥ 1−α for any exchangeable new point —
  * no distributional assumption, the modern eval-stack staple (LLM
  * abstention thresholds, length/latency SLO bounds, outlier fences
  * with coverage guarantees).
  *
  * Integer-exact (the L43 discipline): with α as `alphaE6` the rank is
  *   rank = ⌈(n+1)·(10⁶−α_e6)/10⁶⌉
  *        = ((n+1)·(10⁶−α_e6) + 10⁶−1) DIV 10⁶
  * — exact ceiling division in LONG (n ≤ 9·10¹² before overflow, far
  * past any group size); q̂ is the rank-th smallest score by
  * row_number, well-defined under ties because every tie order yields
  * the same VALUE. When rank > n the finite-sample guarantee does not
  * exist at this α (n too small — the standard n ≥ ⌈1/α⌉−1 condition
  * fails); q̂ emits NULL rather than silently clamping to the max,
  * which would claim a coverage the math does not give.
  *
  * Scale shape: one count aggregation + one per-group sort window over
  * the calibration split (sort-based, spillable) joined at the single
  * rank row — the [[MedianImpute.groupedQuantiles]] shape with a
  * different (ceiling, 1-based) rank convention, deliberately NOT
  * reusing that lower-quantile pick: conformal's ⌈(n+1)(1−α)⌉ is the
  * construction the guarantee is proved for. Coverage audit is one
  * broadcast-ready join + aggregation over the test split. */
object Conformal {

  /** Per-group conformal threshold from a calibration frame:
    * (groupCol, n_cal, rank, qhat). Null groups/scores drop; `qhat`
    * is NULL when rank > n_cal (no finite-sample guarantee at this α —
    * see scaladoc). */
  def splitThreshold(calib: DataFrame, groupCol: String, scoreCol: String,
      alphaE6: Long): DataFrame = {
    require(alphaE6 >= 1L && alphaE6 <= 999999L,
      s"alphaE6 $alphaE6 outside [1, 999999]")
    Reserved.guard(Seq(groupCol), Seq("__s", "__rn", "__rg", "n_cal",
      "rank", "qhat"), "Conformal")
    val scores = calib
      .filter(col(groupCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(groupCol), col(scoreCol).cast("long").as("__s"))
    val counts = scores.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_cal"))
      .withColumn("rank", call_function("div",
        (col("n_cal") + lit(1L)) * lit(1000000L - alphaE6)
          + lit(999999L), lit(1000000L)))
    // renamed key on the ranked side: both subtrees descend from
    // `scores` (the groupedQuantiles ambiguity lesson)
    val ranked = scores
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__s")))
        .cast("long"))
      .select(col(groupCol).as("__rg"), col("__rn"),
        col("__s").as("qhat"))
    counts
      .join(ranked, col(groupCol) === col("__rg")
        && col("rank") === col("__rn"), "left")
      .select(col(groupCol), col("n_cal"), col("rank"), col("qhat"))
  }

  /** Coverage audit of thresholds (in [[splitThreshold]]'s schema) on a
    * test frame: adds (n_test, n_covered, cov_e6). A NULL q̂ covers
    * nothing by definition (cov NULL — no guarantee was issued);
    * groups present only in the test frame emit no row (no threshold
    * to audit). */
  def coverage(test: DataFrame, thresholds: DataFrame, groupCol: String,
      scoreCol: String): DataFrame = {
    val scores = test
      .filter(col(groupCol).isNotNull && col(scoreCol).isNotNull)
      .select(col(groupCol).as("__tg"), col(scoreCol).cast("long")
        .as("__ts"))
    thresholds
      .join(scores, col(groupCol) === col("__tg"), "inner")
      .groupBy(col(groupCol), col("n_cal"), col("rank"), col("qhat"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__ts") <= col("qhat"), 1L).otherwise(0L))
          .as("n_covered"))
      .withColumn("n_covered",
        when(col("qhat").isNull, lit(null).cast("long"))
          .otherwise(col("n_covered")))
      .withColumn("cov_e6",
        when(col("qhat").isNull || col("n_test") === 0L,
          lit(null).cast("long"))
          .otherwise(call_function("div",
            lit(1000000L) * col("n_covered"), col("n_test"))))
  }
}
