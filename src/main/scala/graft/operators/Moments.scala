package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distribution-SHAPE panel: grouped skewness², excess
  * kurtosis and the Jarque–Bera normality verdict (r16, L195;
  * Jarque & Bera 1980, Econ. Letters 6; Bowman & Shenton 1975 — the
  * panel member the location (mean/median/trimmed/winsorized) and
  * scale (L189 Brown–Forsythe) members imply: "is this signal even
  * NORMAL-shaped" is the precondition question behind every
  * z-flavored monitor, and a drift in skew/tail-weight with the mean
  * and variance held is invisible to all of them).
  *
  * Exact-moment construction (the q_a13 discipline taken to orders 3
  * and 4): with raw power sums S1..S4 over LONG values, the cleared
  * central moments
  *   M2 = N·S2 − S1²                      (= N²·m̄2)
  *   M3 = N²·S3 − 3N·S1·S2 + 2·S1³        (= N³·m̄3)
  *   M4 = N³·S4 − 4N²·S1·S3 + 6N·S1²·S2 − 3·S1⁴   (= N⁴·m̄4)
  * are exact DECIMAL(38,0) integers, and the N-powers CANCEL in the
  * shape statistics: skew² = M3²/M2³, kurtosis = M4/M2².
  *
  * Quantization (a documented cascade, replayed token-for-token):
  *   k_e6  = ⌊10⁶·M4 / M2²⌋                        (one floor)
  *   s2q   = ⌊10⁶·M3 / M2⌋,  s2_e6 = ⌊s2q·M3 / M2²⌋ (two floors —
  *           squaring M3 directly would need ~10⁵⁰; the split keeps
  *           every intermediate inside DECIMAL(38,0))
  *   jb_e6 = ⌊N·(s2_e6 + ⌊(k_e6 − 3·10⁶)²/(4·10⁶)⌋) / 6⌋
  * JB ~ χ²₂ under normality; `sig` vs the L157 table at df 2
  * (5.991465). skew_sign = sign(M3). M2 = 0 (a constant signal) or
  * n < 2 ⇒ NULL statistics.
  *
  * Capacity, stated: the s2 cascade's worst intermediate is
  * ~10⁶·N⁴·V⁶ — byte-scale the signal (V ≤ ~2⁸) and keep
  * N ≤ ~5·10⁴ rows per panel (subsample beyond — shape verdicts are
  * long decided at 10⁴); larger V trades N via the formula.
  *
  * Scale shape: ONE map-side-combinable (panel) power-sum
  * aggregation collapses the corpus; everything after is per-panel
  * scalar arithmetic. */
object Moments {

  /** Shape panel over (panelCol, valueCol): emits (panelCol, n,
    * s2_e6, k_e6, jb_e6, skew_sign, sig). */
  def shapePanel(df: DataFrame, panelCol: String,
      valueCol: String): DataFrame = {
    Reserved.guard(Seq(panelCol),
      Seq("__v", "__s1", "__s2", "__s3", "__s4", "n", "s2_e6", "k_e6",
        "jb_e6", "skew_sign", "sig"),
      "Moments")
    val d38 = "decimal(38,0)"
    val base = df
      .filter(col(panelCol).isNotNull && col(valueCol).isNotNull)
      .select(col(panelCol), col(valueCol).cast("long").as("__v"))
    val v = col("__v").cast(d38)
    val sums = base.groupBy(col(panelCol))
      .agg(count(lit(1)).as("n"), sum(v).as("__s1"),
        sum(v * v).as("__s2"), sum(v * v * v).as("__s3"),
        sum(v * v * v * v).as("__s4"))
    val nn = col("n").cast(d38)
    val m2 = nn * col("__s2") - col("__s1") * col("__s1")
    val m3 = nn * nn * col("__s3") -
      lit(3L).cast(d38) * nn * col("__s1") * col("__s2") +
      lit(2L).cast(d38) * col("__s1") * col("__s1") * col("__s1")
    val m4 = nn * nn * nn * col("__s4") -
      lit(4L).cast(d38) * nn * nn * col("__s1") * col("__s3") +
      lit(6L).cast(d38) * nn * col("__s1") * col("__s1") * col("__s2") -
      lit(3L).cast(d38) * col("__s1") * col("__s1") * col("__s1") *
        col("__s1")
    val m = lit(1000000L).cast(d38)
    val kE6 = call_function("div", m * m4, m2 * m2)
    val s2q = call_function("div", m * m3, m2)
    val s2E6 = call_function("div", s2q * m3, m2 * m2)
    val inner = s2E6 +
      call_function("div", (kE6 - m * lit(3L).cast(d38)) *
        (kE6 - m * lit(3L).cast(d38)), lit(4000000L).cast(d38))
    val jbE6 = call_function("div", nn * inner, lit(6L).cast(d38))
    val degenerate = col("n") < 2L || m2 === lit(0L).cast(d38)
    sums.select(col(panelCol), col("n"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(s2E6.cast("long")).as("s2_e6"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(kE6.cast("long")).as("k_e6"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(jbE6.cast("long")).as("jb_e6"),
      when(degenerate, lit(null).cast("long"))
        .otherwise(signum(m3).cast("long")).as("skew_sign"))
      .withColumn("sig",
        when(col("jb_e6").isNull, lit(0L))
          .otherwise((col("jb_e6") >=
            element_at(typedlit(RankTest.Chi2Crit95E6ByDf), 2))
            .cast("long")))
  }
}
