package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic calibration (Zadrozny & Elkan 2002; Robertson et al. 1988
  * minimax characterization) — the probability-calibration step behind
  * a trained quality classifier (L51): raw score-bucket rates are not
  * probabilities until calibrated, and the isotonic fit is the
  * standard non-parametric way to make them monotone.
  *
  * Exactness: classic PAV is a SEQUENTIAL pooling loop no SQL replays,
  * so this operator computes the fit by its minimax characterization
  * instead: `fit(b) = max_{j≤b} min_{k≥b} mean(y over bins j..k)` —
  * with each interval mean quantized ONCE by exact floor division
  * (`S·10⁶ DIV W`), the max-min runs over integers and both engines
  * agree digit-for-digit. Monotonicity still holds for any fixed
  * interval matrix (the j-sets and k-sets nest), spec-pinned. The
  * quantize-then-pool fit can differ from pool-then-quantize PAV by
  * one ulp on ties — the DEFINITION here is the quantized minimax,
  * shared with the oracle by construction.
  *
  * Scale shape: ONE corpus-scale map-side-combinable aggregation to
  * the ≤ [[MaxBins]] binned (w, s) table; the O(B²) minimax is driver
  * arithmetic on that grid (the PCA/Bradley–Terry bounded-grid
  * pattern — zero further Spark jobs, no corpus re-scan per
  * consumer). */
object Isotonic {

  /** Interval-count guard: B² intervals must stay grid-sized. */
  val MaxBins = 64

  /** Reliability diagram + expected calibration error (Naeini et al.
    * 2015 ECE; Guo et al. 2017) — the MEASUREMENT this family's
    * [[calibrate]] is the fix for: per confidence bin, the claimed
    * confidence vs the empirical accuracy, and
    * `ECE = Σ_b n_b·|acc_b − conf_b| / N`. Exact: `acc_e6` quantizes
    * once by floor division, the gap is integer, and the corpus-level
    * ECE is one more floor division; `confE6` maps the bin id to its
    * claimed confidence (a pure function, shared with the oracle).
    * Plan: ONE map-side-combinable (bin) aggregation, then grid-sized
    * arithmetic — a 1-row total broadcast puts `ece_e6` on every bin
    * row (documented: same value each row, the corpus scalar). */
  def reliability(df: DataFrame, binCol: String, labelCol: String,
      confE6: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    val bins = df
      .filter(col(binCol).isNotNull && col(labelCol).isNotNull)
      .select(col(binCol).cast("long").as("bin"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
      .select(col("bin"), col("n"), col("s"),
        confE6(col("bin")).as("conf_e6"),
        expr("s * 1000000L DIV n").as("acc_e6"))
      .withColumn("gap_contrib",
        col("n") * abs(col("acc_e6") - col("conf_e6")))
    val tot = bins.agg(sum(col("n")).as("nn"),
      sum(col("gap_contrib")).as("gg"))
    bins.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("s"), col("conf_e6"),
        col("acc_e6"), col("gap_contrib"),
        expr("gg DIV nn").as("ece_e6"))
  }

  /** `(bin, w, s, raw_e6, fit_e6)` per observed bin: weight, positive
    * count, the raw rate, and the isotonic (monotone non-decreasing)
    * calibrated rate — exact integers throughout. Bins with no rows do
    * not appear (calibration is defined on observed bins). */
  def calibrate(df: DataFrame, binCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val grid = BoundedGrid.collectBounded(
      df.filter(col(binCol).isNotNull && col(labelCol).isNotNull)
        .select(col(binCol).cast("long").as("bin"),
          col(labelCol).cast("long").as("y"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("w"), sum(col("y")).as("s")),
      MaxBins, "score-bin grid",
      s"the O(B²) interval grid is for bounded score buckets " +
        s"(≤ $MaxBins); bucket the score first")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    if (grid.isEmpty)
      return Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("bin", "w", "s", "raw_e6", "fit_e6")
    val b = grid.length
    // prefix sums → exact quantized interval means
    val pw = grid.scanLeft(0L)(_ + _._2)
    val ps = grid.scanLeft(0L)(_ + _._3)
    def rate(j: Int, k: Int): Long =
      Math.floorDiv((ps(k + 1) - ps(j)) * 1000000L, pw(k + 1) - pw(j))
    val fit = (0 until b).map { i =>
      (0 to i).map { j =>
        (i until b).map(k => rate(j, k)).min
      }.max
    }
    grid.zipWithIndex.map { case ((bin, w, s), i) =>
      (bin, w, s, Math.floorDiv(s * 1000000L, w), fit(i))
    }.toSeq.toDF("bin", "w", "s", "raw_e6", "fit_e6")
  }
}
