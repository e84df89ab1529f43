package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding centroid drift between two cohorts (r15, L178 — the
  * EMBEDDING member of the drift panel: PSI/JSD/KS/CvM watch scalar
  * columns, but a re-embed, encoder upgrade, or source shift moves
  * the corpus in VECTOR space first; the cheapest whole-corpus
  * signal is "do the two cohort centroids still point the same
  * way"). Reports the squared cosine with sign between cohort SUM
  * vectors — sums, not means, because cos is scale-invariant and
  * the n's divide out, keeping everything integer.
  *
  * Integer construction (the L25/L77 quantize-once discipline, e3
  * flavor): each component is quantized ONCE — q = ⌊x·10³ + 0.5⌋
  * (float→double widening exact, one IEEE product, one half-up
  * floor, both engines identical) — and everything after is exact:
  * per-dimension cohort sums sa_d, sb_d, then
  *   dot = Σ_d sa_d·sb_d,  na2 = Σ sa_d²,  nb2 = Σ sb_d²
  *   cos2_e6 = div(10⁶·dot², na2·nb2)   — ONE truncating division
  *   d_sign  = sign(dot)
  * (the L138/L162 emit-the-exact-square convention: cos itself
  * needs a square root the integer contract forbids). Zero centroid
  * on either side (empty cohort, or exact cancellation) ⇒ NULL.
  *
  * MEASURED on the gate corpus before choosing the headline column
  * (r15): the embeddings are zero-mean, so the centroid DIRECTION
  * of any cohort is sampling noise and cos² reads ≈ 0 even on an
  * A/A split — cos2_e6 is emitted as the direction diagnostic, but
  * the drift statistic is the NORMALIZED CENTROID GAP, which is
  * zero-mean-safe:
  *   gap2     = Σ_d (n_A·sb_d − n_B·sa_d)²
  *   drift_e6 = div(10⁶·gap2, n_A·n_B·T2),  T2 = Σ_rows Σ_d q²
  * Under exchangeability E[gap2] = n_A·n_B·(n_A+n_B)·Σ_dσ² and
  * T2 ≈ (n_A+n_B)·Σ_dσ², so drift_e6 ≈ 10⁶ on an A/A split BY
  * CONSTRUCTION (the unit-calibrated Hotelling-with-identity form;
  * fluctuation band ~χ²_dims/dims), and a mean shift δ adds
  * ~10⁶·n_A·n_B·‖δ‖²/T2 — growing with cohort size. Emitted
  * WITHOUT a verdict column (the PSI stance: thresholds are panel
  * policy; the A/A baseline is pinned in spec instead).
  *
  * Why e3 and not the e6 of [[Similarity.classCentroids]]: cos2's
  * numerator is a FOURTH power of component magnitudes — e6 codes
  * overflow DECIMAL(38,0) at corpus cohort sizes (10⁶·(Σq²)² with
  * q ~ 3·10⁵ blows 10³⁸ near cos = 1), e3 holds it for cohorts up
  * to ~10⁶ vectors at dim 64 (10⁶·(64·(10⁶·300)²)² ≈ 10³⁷ —
  * documented capacity; shard beyond). Quantization is part of the
  * statistic's definition (quantize-once), not an approximation the
  * oracle could disagree on.
  *
  * Scale shape: ONE posexplode + map-side (panel, dim) conditional
  * sums collapse the corpus to a dim-sized grid per panel (64 rows);
  * the cosine is grid arithmetic. Nothing corpus-shaped past the
  * first aggregation. */
object SemanticDrift {

  /** Per-panel centroid drift: (panelCol, n_a, n_b, d_sign,
    * cos2_e6, drift_e6). Null panels/cohorts/vectors drop; cohort
    * values outside {cohortA, cohortB} drop. */
  def centroidCos(df: DataFrame, panelCol: String, cohortCol: String,
      vecCol: String, cohortA: String, cohortB: String): DataFrame = {
    require(cohortA != cohortB, "cohort labels must differ")
    val d38 = "decimal(38,0)"
    Reserved.guard(Seq(panelCol),
      Seq("__c", "__d", "__q", "__sa", "__sb", "__dot", "__na2",
        "__nb2", "__t2d", "__t2", "__g", "__gap2", "n_a", "n_b",
        "d_sign", "cos2_e6", "drift_e6"),
      "SemanticDrift")
    val base = df
      .filter(col(panelCol).isNotNull && col(cohortCol).isNotNull &&
        col(vecCol).isNotNull)
      .select(col(panelCol), col(cohortCol).cast("string").as("__c"),
        col(vecCol))
      .filter(col("__c").isin(cohortA, cohortB))
    val counts = base.groupBy(col(panelCol))
      .agg(sum((col("__c") === cohortA).cast("long")).as("n_a"),
        sum((col("__c") === cohortB).cast("long")).as("n_b"))
    val comps = base
      .select(col(panelCol), col("__c"),
        posexplode(col(vecCol)).as(Seq("__d", "__x")))
      .withColumn("__q",
        floor(col("__x").cast("double") * 1000d + 0.5d).cast("long"))
    val dims = comps.groupBy(col(panelCol), col("__d"))
      .agg(sum(when(col("__c") === cohortA, col("__q")).otherwise(0L))
          .as("__sa"),
        sum(when(col("__c") === cohortB, col("__q")).otherwise(0L))
          .as("__sb"),
        sum(col("__q") * col("__q")).as("__t2d"))
    val panel = dims.groupBy(col(panelCol))
      .agg(sum(col("__sa").cast(d38) * col("__sb").cast(d38))
          .as("__dot"),
        sum(col("__sa").cast(d38) * col("__sa").cast(d38)).as("__na2"),
        sum(col("__sb").cast(d38) * col("__sb").cast(d38)).as("__nb2"),
        sum(col("__t2d").cast(d38)).as("__t2"))
    val na = col("n_a").cast(d38); val nb = col("n_b").cast(d38)
    val gapTerm = na * col("__sb").cast(d38) - nb * col("__sa").cast(d38)
    val gap2 = dims.join(counts, Seq(panelCol))
      .withColumn("__g", gapTerm * gapTerm)
      .groupBy(col(panelCol))
      .agg(sum(col("__g")).as("__gap2"))
    counts.join(panel, Seq(panelCol)).join(gap2, Seq(panelCol))
      .withColumn("d_sign", signum(col("__dot")).cast("long"))
      .withColumn("cos2_e6",
        when(col("__na2") === lit(0L).cast(d38)
            || col("__nb2") === lit(0L).cast(d38),
          lit(null).cast("long"))
          .otherwise(call_function("div",
            lit(1000000L).cast(d38) * col("__dot") * col("__dot"),
            col("__na2") * col("__nb2")).cast("long")))
      .withColumn("drift_e6",
        when(col("n_a") === 0L || col("n_b") === 0L
            || col("__t2") === lit(0L).cast(d38),
          lit(null).cast("long"))
          .otherwise(call_function("div",
            lit(1000000L).cast(d38) * col("__gap2"),
            na * nb * col("__t2")).cast("long")))
      .select(col(panelCol), col("n_a"), col("n_b"), col("d_sign"),
        col("cos2_e6"), col("drift_e6"))
  }
}
