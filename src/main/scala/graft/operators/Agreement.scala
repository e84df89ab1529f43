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

  /** McNemar's test for PAIRED binary labels (r15, L170; McNemar
    * 1947, Psychometrika 12 — "did the flag flip asymmetrically
    * between two raters / two pipeline versions on the SAME items"):
    * [[cohenKappa]] measures agreement LEVEL, this tests flip
    * DIRECTION — a re-run of a quality classifier can agree 95% with
    * the old one and still be systematically stricter, which only
    * the discordant cells see. Only the discordant counts matter:
    *   b = #(a=1, b=0),  c = #(a=0, b=1)
    *   χ²₁ = (b−c)²/(b+c)
    * (the asymptotic form without continuity correction — the
    * convention is stated; the correction subtracts 1 from |b−c| and
    * is a deliberate non-goal since the battery's N makes it
    * immaterial). Quantization contract (the L136 z² convention):
    *   z2_e6 = div(10⁶·(b−c)², b+c)   — ONE truncating division,
    * b + c = 0 ⇒ NULL (no discordance, nothing to test);
    * d_sign = sign(b−c) gives the direction (+1: rater A stricter).
    * Verdict vs χ²₁ at 95% ([[RankTest.Chi2Crit95E6ByDf]](1)).
    * Non-binary flags drop (the simpsonReversal hygiene). Capacity:
    * 10⁶·(b−c)² in DECIMAL(38,0) ⇒ any N ≤ ~10¹⁶.
    *
    * Scale shape: ONE map-side-combinable conditional-count
    * aggregation collapses the corpus to a panel grid; everything
    * after is grid arithmetic. */
  def mcnemar(df: DataFrame, panelCol: String, raterACol: String,
      raterBCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Reserved.guard(Seq(panelCol),
      Seq("__a", "__b", "n", "b", "c", "z2_e6", "d_sign", "sig"),
      "Agreement")
    val base = df
      .filter(col(panelCol).isNotNull && col(raterACol).isNotNull &&
        col(raterBCol).isNotNull)
      .select(col(panelCol), col(raterACol).cast("long").as("__a"),
        col(raterBCol).cast("long").as("__b"))
      .filter(col("__a").isin(0L, 1L) && col("__b").isin(0L, 1L))
    base.groupBy(col(panelCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__a") === 1L && col("__b") === 0L, 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("__a") === 0L && col("__b") === 1L, 1L)
          .otherwise(0L)).as("c"))
      .withColumn("z2_e6",
        when(col("b") + col("c") === 0L, lit(null).cast("long"))
          .otherwise(call_function("div",
            lit(1000000L).cast(d38) * (col("b") - col("c")).cast(d38)
              * (col("b") - col("c")).cast(d38),
            (col("b") + col("c")).cast(d38)).cast("long")))
      .withColumn("d_sign", signum(col("b") - col("c")).cast("long"))
      .withColumn("sig",
        when(col("z2_e6").isNull, lit(0L))
          .otherwise((col("z2_e6") >=
            element_at(typedlit(RankTest.Chi2Crit95E6ByDf), 1))
            .cast("long")))
      .select(col(panelCol), col("n"), col("b"), col("c"),
        col("z2_e6"), col("d_sign"), col("sig"))
  }

  /** Fleiss' κ multi-rater agreement (r15, L172; Fleiss 1971,
    * Psychological Bulletin 76(5) — [[cohenKappa]] generalized from
    * two FIXED raters to "each item got m ratings from whoever":
    * the crowd-labeling / RLHF-annotation shape, where item i's m
    * ratings land as category counts n_ij with Σ_j n_ij = m).
    *
    * Exact LONG rational (every quantity an integer):
    *   P̄  = (Σ_ij n_ij² − N·m) / (N·m·(m−1))    observed agreement
    *   P̄e = Σ_j T_j² / (N²·m²)                  chance agreement
    *   κ  = (P̄ − P̄e)/(1 − P̄e)
    *      = (a·d − c·b) / (b·(d − c)),  a = Σn² − Nm, b = Nm(m−1),
    *                                    c = ΣT², d = N²m²
    * Quantization: pbar_e6/pe_e6/kappa_e6 are ONE truncating division
    * each (the cohenKappa convention; negative κ exercises toward-
    * zero truncation). d = c (P̄e = 1 ⟺ every rating one category)
    * ⇒ κ NULL. Items with ≠ m ratings DROP (the complete-panel
    * requirement, enforced like [[cochranQ]]'s blocks — Fleiss'
    * formulas silently break on ragged items). Capacity:
    * 10⁶·a·d ≤ 10⁶·N³m⁴ < 10³⁸ ⇒ N ≤ ~10¹⁰ items at m = 3
    * (documented; shard beyond).
    *
    * Scale shape: one (panel, item, rating) count collapses the
    * ratings corpus; per-item sums, the m-filter, and the category
    * sums are grid aggregations; the tail is panel-row arithmetic. */
  def fleissKappa(df: DataFrame, panelCol: String, itemCol: String,
      ratingCol: String, m: Int): DataFrame = {
    require(m >= 2, s"m $m must be >= 2 (agreement needs two ratings)")
    val d38 = "decimal(38,0)"
    Reserved.guard(Seq(panelCol),
      Seq("__i", "__rt", "__nij", "__mi", "__s2i", "__t", "__t2",
        "__s2", "n_items", "m", "k_cats", "pbar_e6", "pe_e6",
        "kappa_e6"),
      "Agreement")
    val cells = df
      .filter(col(panelCol).isNotNull && col(itemCol).isNotNull &&
        col(ratingCol).isNotNull)
      .select(col(panelCol), col(itemCol).cast("string").as("__i"),
        col(ratingCol).cast("string").as("__rt"))
      .groupBy(col(panelCol), col("__i"), col("__rt"))
      .agg(count(lit(1)).as("__nij"))
    val items = cells.groupBy(col(panelCol), col("__i"))
      .agg(sum(col("__nij")).as("__mi"),
        sum(col("__nij") * col("__nij")).as("__s2i"))
      .filter(col("__mi") === m.toLong)
    val perPanel = items.groupBy(col(panelCol))
      .agg(count(lit(1)).as("n_items"), sum(col("__s2i")).as("__s2"))
    val tSums = cells
      .join(items.select(col(panelCol), col("__i")), Seq(panelCol, "__i"))
      .groupBy(col(panelCol), col("__rt"))
      .agg(sum(col("__nij")).as("__t"))
      .groupBy(col(panelCol))
      .agg(countDistinct(col("__rt")).as("k_cats"),
        sum(col("__t").cast(d38) * col("__t").cast(d38)).as("__t2"))
    val mm = lit(m.toLong)
    val a = (col("__s2") - col("n_items") * mm).cast(d38)
    val b = (col("n_items") * mm * lit((m - 1).toLong)).cast(d38)
    val cT = col("__t2")
    val dN = col("n_items").cast(d38) * col("n_items").cast(d38) *
      lit((m.toLong * m)).cast(d38)
    perPanel.join(tSums, Seq(panelCol))
      .withColumn("m", mm)
      .withColumn("pbar_e6", call_function("div",
        lit(1000000L).cast(d38) * a, b).cast("long"))
      .withColumn("pe_e6", call_function("div",
        lit(1000000L).cast(d38) * cT, dN).cast("long"))
      .withColumn("kappa_e6",
        when(dN === cT, lit(null).cast("long"))
          .otherwise(call_function("div",
            lit(1000000L).cast(d38) * (a * dN - cT * b),
            b * (dN - cT)).cast("long")))
      .select(col(panelCol), col("n_items"), col("m"), col("k_cats"),
        col("pbar_e6"), col("pe_e6"), col("kappa_e6"))
  }

  /** Cochran's Q test (r15, L171; Cochran 1950, Biometrika 37 — the
    * k-treatment extension of [[mcnemar]]: "do these k binary flags
    * fire at the same rate on the same items", the within-subject
    * complement of the prevalence comparison a naive per-flag count
    * cannot make honestly when the flags share the items). With
    * subject row sums R_i, treatment column sums T_j, S = ΣR_i:
    *   Q = (k−1)·(k·ΣT_j² − S²) / (k·S − ΣR_i²)
    * an exact LONG rational (the standard identity; Q ~ χ²_{k−1}
    * under H₀). Quantization: q_e6 = div(10⁶·(k−1)·(k·ΣT² − S²),
    * k·S − ΣR²) — ONE truncating division; a zero denominator (every
    * subject all-0 or all-1 across treatments) ⇒ NULL. Verdict vs
    * [[RankTest.Chi2Crit95E6ByDf]] at df = k−1; k−1 > 8 ⇒ NULL
    * verdict with q_e6 still emitted. Subjects missing any treatment
    * drop (complete-block design — Cochran's requirement, enforced
    * not assumed); duplicate (subject, treatment) rows reduce by MAX
    * — OR semantics, deterministic where an arbitrary-keep would
    * flicker across partitionings. Capacity: k·ΣT² ≤ k·N² and the 10⁶ scale keep
    * everything in DECIMAL(38,0) for any N ≤ ~10¹⁵.
    *
    * Scale shape: one (panel, subject) aggregation building R_i and
    * the per-treatment bits, one (panel, treatment) aggregation for
    * T_j, then panel-grid math — two map-side-combinable passes over
    * the flag frame, nothing corpus-sized after. */
  def cochranQ(df: DataFrame, panelCol: String, subjectCol: String,
      treatmentCol: String, valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Reserved.guard(Seq(panelCol),
      Seq("__s", "__t", "__v", "__k", "__r", "__nt", "__tsum", "__t2",
        "__ssum", "__r2", "n", "k", "q_e6", "sig"),
      "Agreement")
    val base = df
      .filter(col(panelCol).isNotNull && col(subjectCol).isNotNull &&
        col(treatmentCol).isNotNull && col(valueCol).isNotNull)
      .select(col(panelCol), col(subjectCol).cast("string").as("__s"),
        col(treatmentCol).cast("string").as("__t"),
        col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isin(0L, 1L))
      // duplicate (subject, treatment) rows reduce by MAX — OR
      // semantics (a flag that fired in ANY duplicate row counts as
      // fired), deterministic across runs and partitionings; a
      // dropDuplicates here would keep an ARBITRARY row when
      // duplicates conflict (r16 fix)
      .groupBy(col(panelCol), col("__s"), col("__t"))
      .agg(max(col("__v")).as("__v"))
    val k = base.groupBy(col(panelCol))
      .agg(countDistinct(col("__t")).as("__k"))
    // complete blocks only: subjects carrying every treatment
    val subj = base.groupBy(col(panelCol), col("__s"))
      .agg(count(lit(1)).as("__nt"), sum(col("__v")).as("__r"))
      .join(k, Seq(panelCol))
      .filter(col("__nt") === col("__k"))
    val rAgg = subj.groupBy(col(panelCol))
      .agg(count(lit(1)).as("n"), sum(col("__r")).as("__ssum"),
        sum(col("__r") * col("__r")).as("__r2"))
    val tAgg = base.join(subj.select(col(panelCol), col("__s")),
        Seq(panelCol, "__s"))
      .groupBy(col(panelCol), col("__t"))
      .agg(sum(col("__v")).as("__tsum"))
      .groupBy(col(panelCol))
      .agg(sum(col("__tsum") * col("__tsum")).as("__t2"))
    val den = col("__k").cast(d38) * col("__ssum").cast(d38) -
      col("__r2").cast(d38)
    val num = lit(1000000L).cast(d38) * (col("__k") - 1L).cast(d38) *
      (col("__k").cast(d38) * col("__t2").cast(d38) -
        col("__ssum").cast(d38) * col("__ssum").cast(d38))
    rAgg.join(tAgg, Seq(panelCol)).join(k, Seq(panelCol))
      .withColumn("q_e6",
        when(den === 0L || col("__k") < 2L, lit(null).cast("long"))
          .otherwise(call_function("div", num, den).cast("long")))
      .withColumn("sig",
        when(col("q_e6").isNull, lit(0L))
          .when(col("__k") - 1L > 8L, lit(null).cast("long"))
          .otherwise((col("q_e6") >=
            element_at(typedlit(RankTest.Chi2Crit95E6ByDf),
              (col("__k") - 1L).cast("int"))).cast("long")))
      .select(col(panelCol), col("n"), col("__k").as("k"),
        col("q_e6"), col("sig"))
  }
}
