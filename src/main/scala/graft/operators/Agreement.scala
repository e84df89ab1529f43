package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-rater agreement — Cohen's κ (Cohen 1960, "A coefficient of
  * agreement for nominal scales", Educ. Psychol. Meas. 20(1)) between
  * two categorical labelings of the same items: the label-quality
  * operator an RLHF-era curation pipeline runs over its raters —
  * human annotator pairs, model-vs-human audits, and (the battery's
  * form) heuristic-vs-heuristic signal agreement: chance-corrected, so
  * two raters that both say "good" 95% of the time stop looking
  * miraculously consistent.
  *
  * Integer-exact derivation (quantize-once): with confusion counts
  * n_ab, diagonal D = Σ_a n_aa, N = Σ n_ab and chance mass
  * C = Σ_a row_a·col_a,
  *   κ = (p_o − p_e) / (1 − p_e) = (N·D − C) / (N² − C)
  * — ONE exact rational in LONG arithmetic; `kappa_e6` is its 10⁶
  * floor-toward-zero (both engines truncate integer division
  * identically, which matters because κ < 0 — systematic DISagreement
  * — is a legal value). `po_e6`/`pe_e6` ride along as display
  * diagnostics quantized independently; κ never derives from them.
  * Capacity: N ≤ 3·10⁶ per group keeps 10⁶·N² < 2⁶³ (the binding
  * term) — beyond that, κ on a uniform subsample is statistically
  * indistinguishable anyway (its standard error is already < 10⁻³).
  *
  * Degenerate cells defined, not left to ANSI division: N = 0 emits no
  * row (no items, nothing to agree on); N² = C — every row/col mass in
  * one cell product, i.e. at least one rater is CONSTANT and agreement
  * equals chance by construction — emits κ NULL (the standard
  * undefined case; p_e = 1).
  *
  * Scale shape: ONE map-side-combinable aggregation of (group, a, b)
  * confusion counts — the corpus collapses to ≤ |groups|·|labels|²
  * grid rows before any wide operation — then grid-sized sums. Labels
  * compare as strings (cast once); null labels or group keys drop. */
object Agreement {

  /** Per-group Cohen's κ between `raterACol` and `raterBCol`:
    * (groupCol, n_items, n_agree, po_e6, pe_e6, kappa_e6). */
  def cohenKappa(df: DataFrame, groupCol: String, raterACol: String,
      raterBCol: String): DataFrame = {
    Reserved.guard(Seq(groupCol),
      Seq("__a", "__b", "__n", "__ra", "__ca", "__g2", "__lb"),
      "Agreement")
    val conf = df
      .filter(col(groupCol).isNotNull && col(raterACol).isNotNull &&
        col(raterBCol).isNotNull)
      .groupBy(col(groupCol), col(raterACol).cast("string").as("__a"),
        col(raterBCol).cast("string").as("__b"))
      .agg(count(lit(1)).as("__n"))
    val rows = conf.groupBy(col(groupCol), col("__a"))
      .agg(sum(col("__n")).as("__ra"))
    // renamed keys on the cols side: both marginal frames descend from
    // `conf`, and same-name join columns across a self-derived pair
    // would trip ambiguous-attribute resolution (the groupedQuantiles
    // lesson)
    val cols = conf.groupBy(col(groupCol).as("__g2"),
        col("__b").as("__lb"))
      .agg(sum(col("__n")).as("__ca"))
    // chance mass C = Σ_label row·col — label-keyed equi-join of the
    // two grid-sized marginal frames (a label missing on one side
    // contributes 0 and drops from the join)
    val chance = rows
      .join(cols, col(groupCol) === col("__g2")
        && col("__a") === col("__lb"))
      .groupBy(col(groupCol))
      .agg(sum(col("__ra") * col("__ca")).as("c_mass"))
    val totals = conf.groupBy(col(groupCol))
      .agg(sum(col("__n")).as("n_items"),
        sum(when(col("__a") === col("__b"), col("__n")).otherwise(0L))
          .as("n_agree"))
    totals
      .join(chance, Seq(groupCol), "left")
      .withColumn("c_mass", coalesce(col("c_mass"), lit(0L)))
      .withColumn("po_e6", call_function("div",
        lit(1000000L) * col("n_agree"), col("n_items")))
      .withColumn("pe_e6", call_function("div",
        lit(1000000L) * col("c_mass"), col("n_items") * col("n_items")))
      .withColumn("kappa_e6",
        when(col("n_items") * col("n_items") === col("c_mass"),
          lit(null).cast("long"))
          .otherwise(call_function("div",
            lit(1000000L) * (col("n_items") * col("n_agree")
              - col("c_mass")),
            col("n_items") * col("n_items") - col("c_mass"))))
      .select(col(groupCol), col("n_items"), col("n_agree"),
        col("po_e6"), col("pe_e6"), col("kappa_e6"))
  }
}
