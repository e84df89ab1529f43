package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benjamini–Hochberg false-discovery-rate control (r15, L183;
  * Benjamini & Hochberg 1995, JRSS B 57 — the MULTIPLE-COMPARISONS
  * layer the rest of the QC panel implies: a battery that runs a
  * drift/quality test per source or per language runs DOZENS of
  * tests, and at α = 0.05 a 20-test panel false-flags once per run
  * on pure noise; BH turns the per-test p's into a panel-level
  * discovery set with the false-discovery RATE controlled at α —
  * the step-up procedure every monitoring dashboard should sit
  * behind).
  *
  * Exact-integer construction: with the panel's m tests sorted by
  * ascending p (ties broken by test id — deterministic), BH rejects
  * tests 1..k* where
  *   k* = max{ k : p_(k)·m ≤ k·α }
  * evaluated as the pure integer compare p_e6·m ≤ k·alpha_e6 — no
  * division anywhere, nothing to quantize. Rejecting ALL of 1..k*
  * (not only the k where the compare holds) is the step-up part and
  * the classic implementation trap; the spec pins the non-monotone
  * case where p_(2) fails its own compare but is still rejected
  * because p_(3) passes. NULL p's drop (an unrun test is not
  * evidence); a p outside [0, 10⁶] raises (it is not a p-value, and
  * silently ranking it would corrupt the whole panel's step-up); an
  * empty panel emits nothing.
  *
  * Scale shape: tests-per-panel is panel-sized (tens to thousands),
  * never corpus-sized — the corpus work happened inside whatever
  * produced the p's. One sort window over the test grid per panel
  * plus one running max; grid arithmetic throughout. */
object Fdr {

  /** Step-up BH over (panelCol, testCol, pCol at 1e-6): emits every
    * test with (panelCol, testCol, p_e6, rank, m, reject). */
  def benjaminiHochberg(df: DataFrame, panelCol: String, testCol: String,
      pCol: String, alphaE6: Long = 50000L): DataFrame = {
    require(alphaE6 > 0L && alphaE6 < 1000000L,
      s"alphaE6 $alphaE6 outside (0, 1e6)")
    Reserved.guard(Seq(panelCol, testCol),
      Seq("__p", "__k", "__m", "__hit", "__kmax", "p_e6", "rank", "m",
        "reject"),
      "Fdr")
    val p = col(pCol).cast("long")
    val base = df
      .filter(col(panelCol).isNotNull && col(testCol).isNotNull &&
        col(pCol).isNotNull)
      // domain guard (r16): a p outside [0, 1e6] is not a p-value —
      // it would silently distort ranks, m, and the step-up compare;
      // fail loudly at the offending row (the Acf span-guard
      // discipline)
      .select(col(panelCol), col(testCol).cast("string").as(testCol),
        when(p >= 0L && p <= 1000000L, p)
          .otherwise(raise_error(concat(
            lit("Fdr: p_e6 outside [0, 1e6]: "), p.cast("string"))))
          .as("__p"))
    val w = Window.partitionBy(col(panelCol))
      .orderBy(col("__p"), col(testCol))
    val all = Window.partitionBy(col(panelCol))
    base
      .withColumn("__k", row_number().over(w))
      .withColumn("__m", count(lit(1)).over(all))
      .withColumn("__hit",
        when(col("__p") * col("__m") <= col("__k") * alphaE6,
          col("__k")).otherwise(0L))
      .withColumn("__kmax", max(col("__hit")).over(all))
      .select(col(panelCol), col(testCol), col("__p").as("p_e6"),
        col("__k").cast("long").as("rank"),
        col("__m").cast("long").as("m"),
        (col("__k") <= col("__kmax")).cast("long").as("reject"))
  }
}
