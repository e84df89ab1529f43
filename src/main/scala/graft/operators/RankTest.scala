package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact Mann–Whitney rank-sum test (Mann & Whitney 1947, Ann. Math.
  * Statist. 18(1); the Wilcoxon 1945 two-sample form) — "did this
  * numeric signal SHIFT between two cohorts": the nonparametric A/B
  * workhorse, the distribution-shape-free companion to [[KsDrift]]
  * (KS asks "any difference in the CDF"; MW asks the sharper ordinal
  * question "does one cohort tend larger", with far more power against
  * location shifts) and the ordinal sibling of
  * [[Funnel.dropoffSignificance]]'s proportion z².
  *
  * Integer-exact derivation (quantize values upstream — the L43
  * discipline; doubled midranks keep ties integral): per (group,
  * value) let t = tied count, t_A the cohort-A share, and `below` the
  * count of strictly smaller values. Then
  *   R2 = Σ_v t_A·(2·below + t + 1)      (twice cohort A's midrank sum)
  *   U2 = R2 − n_A·(n_A+1)               (twice the U statistic of A)
  *   Δ  = U2 − n_A·n_B                   (twice (U − μ); Δ > 0 ⇔ A
  *                                        tends larger)
  * and the tie-corrected normal approximation, squared, is ONE exact
  * rational:
  *   z² = 3·Δ²·N·(N−1) / (n_A·n_B·(N³ − N − T)),  T = Σ_v (t³ − t)
  * emitted as its 10⁶ floor computed in DECIMAL(38,0) (HUGEINT on the
  * oracle side). Capacity: N ≤ 2·10⁵ per group keeps the worst
  * intermediate 3·Δ²·N²·10⁶ ≤ 4.8×10³⁷ < min(10³⁸, 2¹²⁷) — beyond
  * that subsample; the verdict is long decided.
  *
  * Degenerate cells defined, not left to ANSI division: a cohort with
  * no rows ⇒ z² NULL (nothing to compare); ALL values tied (T = N³−N,
  * variance 0 — and Δ = 0 with it) ⇒ z² = 0. `sig` compares against
  * [[Funnel.Chi2Crit95E6]] (z² ~ χ²₁ under H₀, the same threshold
  * family as L136).
  *
  * Scale shape: one map-side-combinable (group, value) count
  * aggregation collapses the corpus to the distinct-value grid; the
  * running `below` is a per-group sort window over THAT grid
  * (sort-based, spillable — never over raw rows); the rest is
  * grid-sized sums. Nothing corpus-shaped past the first
  * aggregation. */
object RankTest {

  /** Per-group Mann–Whitney between `cohortA` and `cohortB` rows of
    * `valueCol`: (groupCol, n_a, n_b, u2_a, d_sign, z2_e6, sig).
    * Values cast to long (quantize upstream); null group/cohort/value
    * rows and cohorts outside {A, B} drop. */
  def mannWhitney(df: DataFrame, groupCol: String, cohortCol: String,
      valueCol: String, cohortA: String, cohortB: String): DataFrame = {
    require(cohortA != cohortB, "cohort labels must differ")
    Reserved.guard(Seq(groupCol),
      Seq("__c", "__v", "__t", "__ta", "__below", "__r2", "__tie"),
      "RankTest")
    val base = df
      .filter(col(groupCol).isNotNull && col(cohortCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(groupCol), col(cohortCol).cast("string").as("__c"),
        col(valueCol).cast("long").as("__v"))
      .filter(col("__c").isin(cohortA, cohortB))
    val grid = base.groupBy(col(groupCol), col("__v"))
      .agg(count(lit(1)).as("__t"),
        sum(when(col("__c") === cohortA, 1L).otherwise(0L)).as("__ta"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = grid
      .withColumn("__below", coalesce(sum(col("__t")).over(w), lit(0L)))
      .groupBy(col(groupCol))
      .agg(sum(col("__ta")).as("n_a"),
        sum(col("__t") - col("__ta")).as("n_b"),
        sum(col("__ta") * (lit(2L) * col("__below") + col("__t")
          + lit(1L))).as("__r2"),
        sum(col("__t") * col("__t") * col("__t") - col("__t"))
          .as("__tie"))
    val d38 = "decimal(38,0)"
    val n1 = col("n_a").cast(d38); val n2 = col("n_b").cast(d38)
    val bigN = n1 + n2
    val u2 = col("__r2").cast(d38) - n1 * (n1 + lit(1L).cast(d38))
    val delta = u2 - n1 * n2
    val tieFree = bigN * bigN * bigN - bigN - col("__tie").cast(d38)
    agg
      .withColumn("u2_a", u2.cast("long"))
      .withColumn("d_sign", signum(delta).cast("long"))
      .withColumn("z2_e6",
        when(col("n_a") === 0L || col("n_b") === 0L,
          lit(null).cast("long"))
          .when(tieFree === lit(0L).cast(d38), lit(0L))
          .otherwise(call_function("div",
            lit(3L).cast(d38) * delta * delta * bigN * (bigN - lit(1L))
              * lit(1000000L).cast(d38),
            n1 * n2 * tieFree)))
      .withColumn("sig",
        (col("z2_e6").isNotNull && col("z2_e6") >= Funnel.Chi2Crit95E6)
          .cast("long"))
      .select(col(groupCol), col("n_a"), col("n_b"), col("u2_a"),
        col("d_sign"), col("z2_e6"), col("sig"))
  }

  /** χ²₀.₉₅ critical values at 1e-6 for df = 1..8 (Abramowitz &
    * Stegun table 26.8; df 1 is [[Funnel.Chi2Crit95E6]]). Consumed as
    * the SAME literals by the oracle — beyond df 8 [[kruskalWallis]]
    * emits a NULL verdict rather than inventing a threshold. */
  private[graft] val Chi2Crit95E6ByDf: Seq[Long] = Seq(
    3841459L, 5991465L, 7814728L, 9487729L,
    11070498L, 12591587L, 14067140L, 15507313L)

  /** Exact Kruskal–Wallis H test (Kruskal & Wallis 1952, JASA 47) —
    * the k-sample extension of [[mannWhitney]]: "does ANY of k cohorts
    * tend larger on this signal". Same doubled-midrank grid
    * construction; per cohort R2_c = Σ_v t_c·(2·below + t + 1) is
    * twice the midrank sum, and
    *   H = [3·Σ_c R2_c²/n_c] / (N(N+1)) − 3(N+1)
    * tie-corrected by ·(N³−N)/(N³−N−T), T = Σ_v (t³−t).
    *
    * Quantization contract (the table-PSI stance: a DEFINED statistic,
    * not a float estimate): three floor divisions, replayed
    * token-for-token by the oracle —
    *   term_c = ⌊3·10⁶·R2_c² / n_c⌋, S = Σ term_c,
    *   h₀ = ⌊S / (N(N+1))⌋ − 3·10⁶·(N+1),
    *   h_e6 = max(0, ⌊h₀·(N³−N) / (N³−N−T)⌋).
    * The floor cascade can undershoot an exact-zero H by a few 1e-6
    * (identical cohorts), never overshoot — the max(0, ·) restores the
    * mathematical H ≥ 0 and is pinned in spec. Degenerate conventions:
    * k < 2 cohorts ⇒ h_e6 NULL (nothing to compare); all values tied
    * (T = N³−N) ⇒ h_e6 = 0. `sig` compares h_e6 against
    * [[Chi2Crit95E6ByDf]] at df = k−1 (H ~ χ²_{k−1} under H₀ for
    * moderate n_c); df > 8 ⇒ sig NULL, h_e6 still emitted.
    *
    * Capacity: term_c = 3·10⁶·R2_c² with R2_c ≤ 2N² needs
    * 1.2·10⁷·N⁴ < 10³⁸ ⇒ N ≤ ~4·10⁷ rows per group (subsample
    * beyond; the verdict is long decided). h₀·(N³−N) is bounded by
    * the SAME 1.2·10⁷·N⁴ (S ≤ 1.2·10⁷·N³ since R2_c²/n_c ≤ 4·n_c·N²,
    * so h₀ ≤ 1.2·10⁷·N) — one bound governs both steps. term_c is an
    * [[Exact.dfloor]]: its quotient ≤ 1.2·10⁷·n_c·N² exceeds Long at
    * a balanced 2-cohort panel of just ~12k rows — far inside this
    * envelope, where SQL `div` wrapped silently (r17 sweep, the JT
    * class).
    *
    * Scale shape: one map-side-combinable (group, cohort, value) count
    * collapses the corpus; the value grid and its running `below` are
    * per-group sort windows over THAT grid; the cohort-grid ↔
    * value-grid equi-join and everything after are grid-sized. */
  def kruskalWallis(df: DataFrame, groupCol: String, cohortCol: String,
      valueCol: String): DataFrame = {
    Reserved.guard(Seq(groupCol),
      Seq("__c", "__v", "__tc", "__t", "__below", "__r2", "__nc",
        "__term", "__s", "__tie", "k", "n", "h_e6", "sig"),
      "RankTest")
    val d38 = "decimal(38,0)"
    val base = df
      .filter(col(groupCol).isNotNull && col(cohortCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(groupCol), col(cohortCol).cast("string").as("__c"),
        col(valueCol).cast("long").as("__v"))
    val cg = base.groupBy(col(groupCol), col("__c"), col("__v"))
      .agg(count(lit(1)).as("__tc"))
    val vg = cg.groupBy(col(groupCol), col("__v"))
      .agg(sum(col("__tc")).as("__t"))
    val wb = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val vgb = vg.withColumn("__below",
      coalesce(sum(col("__t")).over(wb), lit(0L)))
    val perC = cg.join(vgb, Seq(groupCol, "__v"))
      .groupBy(col(groupCol), col("__c"))
      .agg(sum(col("__tc")).as("__nc"),
        sum(col("__tc") * (lit(2L) * col("__below") + col("__t")
          + lit(1L))).as("__r2"))
    // term_c = ⌊3·10⁶·R2_c²/n_c⌋ ≤ 1.2·10⁷·n_c·N² exceeds Long once
    // n_c·N² ≳ 7.7·10¹¹ (a balanced 2-cohort panel of just ~12k rows)
    // — far inside the documented N ≤ 4·10⁷ capacity. The JT
    // div-to-LONG wrap class, found in the r17 self-review sweep:
    // exact decimal floor, cast back to (38,0) for sum headroom
    val term = Exact.dfloor(
      lit(3000000L).cast(d38) * col("__r2").cast(d38)
        * col("__r2").cast(d38),
      col("__nc").cast(d38)).cast(d38)
    val perG = perC.withColumn("__term", term)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("k"), sum(col("__nc")).as("n"),
        sum(col("__term")).as("__s"))
    val ties = vg.groupBy(col(groupCol))
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t"))
        .as("__tie"))
    val nn = col("n").cast(d38)
    val h0 = call_function("div", col("__s"),
      nn * (nn + lit(1L).cast(d38))) -
      lit(3000000L).cast(d38) * (nn + lit(1L).cast(d38))
    val tieFree = nn * nn * nn - nn - col("__tie").cast(d38)
    val hE6 = when(col("k") < 2L, lit(null).cast("long"))
      .when(tieFree === lit(0L).cast(d38), lit(0L))
      .otherwise(greatest(
        call_function("div", h0 * (nn * nn * nn - nn), tieFree)
          .cast("long"), lit(0L)))
    perG.join(ties, Seq(groupCol))
      .withColumn("h_e6", hE6)
      .withColumn("sig",
        when(col("h_e6").isNull, lit(0L))
          .when(col("k") - 1L > 8L, lit(null).cast("long"))
          .otherwise((col("h_e6") >=
            element_at(typedlit(Chi2Crit95E6ByDf),
              (col("k") - 1L).cast("int"))).cast("long")))
      .select(col(groupCol), col("k"), col("n"), col("h_e6"), col("sig"))
  }

  /** Jonckheere–Terpstra ordered-alternative k-sample test (r16,
    * L193; Jonckheere 1954, Biometrika 41; Terpstra 1952 — the
    * ORDERED companion of [[kruskalWallis]], exactly as L182's
    * Cochran–Armitage orders [[Contingency.chiSquare]]'s question:
    * when the cohorts carry a meaningful order (length bands, weeks,
    * dose steps), "does the signal RISE along it" buys power the
    * unordered H dilutes across k−1 df. The continuous-response
    * member beside CA-trend's binary one).
    *
    * Statistic, doubled so ties stay integral (the midrank
    * discipline): JT2 = Σ over cohort pairs (score_i < score_j) of
    * (2·#{v_a < v_b} + #{v_a = v_b}), computed on the per-panel
    * cohort × value-grid expansion (k·|V| rows, k the cohort count —
    * the BOUNDED grid class, documented; cohort pair joins are
    * k²·|V|, with k tens at most). Null moments, tie-corrected
    * (Hollander & Wolfe 1999 eq. 6.19):
    *   Mean2 = (N² − Σn_c²)/2   (exact — the sum is even)
    *   Var   = [N(N−1)(2N+5) − Σn(n−1)(2n+5) − Σt(t−1)(2t+5)]/72
    *         + [Σn(n−1)(n−2) · Σt(t−1)(t−2)] / (36·N(N−1)(N−2))
    *         + [Σn(n−1) · Σt(t−1)] / (8·N(N−1))
    * Quantization (a documented three-floor cascade, one per term):
    * var_e6 = Σ of the three terms each floored once at 10⁶;
    * z2_e6 = ⌊10¹²·(JT2 − Mean2)² / (4·var_e6)⌋ (var is already at
    * the 10⁶ scale, so the numerator carries 10¹²; the 2s of the
    * doubled statistic cancel against the 4). d_sign = sign(JT2 −
    * Mean2) — the trend direction; p_e6 through
    * [[PValue.normTail2E6]] (z ~ N(0,1) under H₀), sig vs χ²₁.
    * k < 2, N < 3, or zero variance (all values tied) ⇒ NULL
    * statistics. Capacity: 10¹²·D² with D ≤ N²/2 ⇒ N ≤ ~4·10⁶ rows
    * per panel (the CvM class — subsample beyond; the verdict is
    * long decided).
    *
    * Scale shape: one map-side (panel, score, value) count collapses
    * the corpus; the value grid, its per-cohort fills and the
    * cohort-pair join are k-bounded grid math; moments are grid
    * aggregates. */
  def jonckheereTerpstra(df: DataFrame, panelCol: String,
      scoreCol: String, valueCol: String): DataFrame = {
    Reserved.guard(Seq(panelCol),
      Seq("__sc", "__v", "__tc", "__t", "__below", "__at", "__sb",
        "__scb", "__nc", "__jt", "__n2", "__tie2", "__tie3", "__nn2",
        "__nn3", "__nn25", "__tt25", "__pb", "__vb", "__ab", "n", "k",
        "jt2", "z2_e6", "d_sign", "p_e6", "sig"),
      "RankTest")
    val d38 = "decimal(38,0)"
    val base = df
      .filter(col(panelCol).isNotNull && col(scoreCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(panelCol), col(scoreCol).cast("long").as("__sc"),
        col(valueCol).cast("long").as("__v"))
    val cg = base.groupBy(col(panelCol), col("__sc"), col("__v"))
      .agg(count(lit(1)).as("__tc"))
    // per-cohort cumulative strictly-below count at the cohort's OWN
    // jump points; the pair join evaluates cohort i's CDF at cohort
    // j's values, so fill the full per-panel value grid per cohort
    val vg = cg.select(col(panelCol), col("__v")).distinct()
    val cs = cg.select(col(panelCol), col("__sc")).distinct()
    val grid = vg.join(cs, Seq(panelCol))
      .join(cg, Seq(panelCol, "__sc", "__v"), "left")
      .withColumn("__tc", coalesce(col("__tc"), lit(0L)))
    val w = Window.partitionBy(col(panelCol), col("__sc"))
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val filled = grid
      .withColumn("__below", coalesce(sum(col("__tc")).over(w), lit(0L)))
      .withColumn("__at", col("__tc"))
    val j = filled.select(col(panelCol), col("__sc"), col("__v"),
      col("__tc"))
    val i = filled.select(col(panelCol).as("__pb"),
      col("__sc").as("__scb"), col("__v").as("__vb"),
      col("__below").as("__sb"), col("__at").as("__ab"))
    val jt = j.join(i,
        col("__pb") === col(panelCol) && col("__vb") === col("__v") &&
          col("__scb") < col("__sc"))
      .groupBy(col(panelCol))
      .agg(sum(col("__tc").cast(d38) *
        (lit(2L).cast(d38) * col("__sb").cast(d38) +
          col("__ab").cast(d38))).as("__jt"))
    val nC = cg.groupBy(col(panelCol), col("__sc"))
      .agg(sum(col("__tc")).as("__nc"))
    val nAgg = nC.groupBy(col(panelCol))
      .agg(count(lit(1)).as("k"), sum(col("__nc")).as("n"),
        sum(col("__nc").cast(d38) * col("__nc").cast(d38)).as("__n2"),
        sum(col("__nc").cast(d38) * (col("__nc") - 1L).cast(d38) *
          (lit(2L).cast(d38) * col("__nc").cast(d38) +
            lit(5L).cast(d38))).as("__nn25"),
        sum(col("__nc").cast(d38) * (col("__nc") - 1L).cast(d38))
          .as("__nn2"),
        sum(col("__nc").cast(d38) * (col("__nc") - 1L).cast(d38) *
          (col("__nc") - 2L).cast(d38)).as("__nn3"))
    val tv = cg.groupBy(col(panelCol), col("__v"))
      .agg(sum(col("__tc")).as("__t"))
    val tAgg = tv.groupBy(col(panelCol))
      .agg(sum(col("__t").cast(d38) * (col("__t") - 1L).cast(d38) *
        (lit(2L).cast(d38) * col("__t").cast(d38) + lit(5L).cast(d38)))
        .as("__tt25"),
        sum(col("__t").cast(d38) * (col("__t") - 1L).cast(d38))
          .as("__tie2"),
        sum(col("__t").cast(d38) * (col("__t") - 1L).cast(d38) *
          (col("__t") - 2L).cast(d38)).as("__tie3"))
    val nn = col("n").cast(d38)
    val m = lit(1000000L).cast(d38)
    // exact decimal floor division ([[Exact.dfloor]]): var_e6's first
    // term reaches ~2.6·10¹⁹ at N = 10⁵ — past Long.Max, where the
    // SQL `div` (which CASTS ITS RESULT TO LONG) silently wraps;
    // found by the sf0.1 gate reading var 3.3× low (exactly 2·2⁶³)
    import Exact.dfloor
    val term1 = dfloor(
      m * (nn * (nn - lit(1L).cast(d38)) *
        (lit(2L).cast(d38) * nn + lit(5L).cast(d38)) -
        col("__nn25") - col("__tt25")), lit(72L).cast(d38))
    // n < 3 zeroes term2's denominator — guard before the division,
    // the NULL-statistics convention handles the verdict downstream
    val term2 = when(col("n") < 3L, lit(0L).cast(d38))
      .otherwise(dfloor(m * col("__nn3") * col("__tie3"),
        lit(36L).cast(d38) * nn * (nn - lit(1L).cast(d38)) *
          (nn - lit(2L).cast(d38))))
    val term3 = dfloor(m * col("__nn2") * col("__tie2"),
      lit(8L).cast(d38) * nn * (nn - lit(1L).cast(d38)))
    val mean2 = call_function("div", nn * nn - col("__n2"),
      lit(2L).cast(d38))
    val dd = coalesce(col("__jt"), lit(0L).cast(d38)) - mean2
    val varE6 = term1 + term2 + term3
    val z2 = call_function("div", m * m * dd * dd,
      lit(4L).cast(d38) * varE6)
    nAgg.join(tAgg, Seq(panelCol)).join(jt, Seq(panelCol), "left")
      .select(col(panelCol), col("n"), col("k"),
        coalesce(col("__jt"), lit(0L).cast(d38)).cast("long").as("jt2"),
        when(col("k") < 2L || col("n") < 3L ||
          varE6 <= lit(0L).cast(d38), lit(null).cast("long"))
          .otherwise(z2.cast("long")).as("z2_e6"),
        signum(dd).cast("long").as("d_sign"))
      .withColumn("p_e6", PValue.normTail2E6(col("z2_e6")))
      .withColumn("sig",
        when(col("z2_e6").isNull, lit(0L))
          .otherwise((col("z2_e6") >= lit(3841459L)).cast("long")))
  }

  /** Dunn's post-hoc pairwise rank test (r16, L190; Dunn 1964,
    * Technometrics 6) — the WHICH behind the omnibus tests:
    * [[kruskalWallis]] (and L188's ANOVA) say "SOME cohort differs";
    * Dunn compares every cohort pair on the POOLED midranks, the
    * standard post-hoc whose p's are meant to be fed to a
    * multiple-comparisons layer ([[Fdr.benjaminiHochberg]] — the
    * composition q_a32 runs; Dunn's own Bonferroni is dominated by
    * BH and not replicated).
    *
    * Exact rational with the tie correction, on the SAME doubled
    * midrank grid as [[kruskalWallis]] (the 2s cancel): with doubled
    * cohort rank sums R2_c, sizes n_c, pooled N and T = Σ(t³−t),
    *   Δ = R2_i·n_j − R2_j·n_i
    *   z²_ij = 3(N−1)·Δ² / (n_i·n_j·(n_i+n_j)·(N³−N−T))
    * Cascade (the L157 stance, TWO floors replayed token-for-token):
    *   q1 = ⌊Δ²/(n_i·n_j)⌋  (≤ 4N⁴ — the factor that would
    *                          otherwise push capacity to N⁷)
    *   z2_e6 = ⌊3·10⁶·(N−1)·q1 / ((n_i+n_j)·(N³−N−T))⌋
    * All values tied (T = N³−N) ⇒ z² = 0. p_e6 rides along through
    * [[PValue.normTail2E6]] (Dunn's z is standard normal under H₀).
    * Capacity: 3·10⁶·N·4N⁴ < 10³⁸ ⇒ N ≤ ~10⁶ rows/panel (the
    * CvM-class bound — subsample beyond; the verdicts are long
    * decided). q1 is an [[Exact.dfloor]] — it exceeds Long past
    * N ~ 4·10⁴, where SQL `div` would silently wrap (r17 ADVICE
    * fix, the JT wrap class).
    *
    * Scale shape: the kruskalWallis passes verbatim (one map-side
    * (panel, cohort, value) collapse, per-panel value-grid windows),
    * then a cohort-grid self-join on the panel equi-key with the
    * c_a < c_b residual — k²-sized, never corpus-sized. */
  def dunnPairs(df: DataFrame, groupCol: String, cohortCol: String,
      valueCol: String): DataFrame = {
    Reserved.guard(Seq(groupCol),
      Seq("__c", "__v", "__tc", "__t", "__below", "__r2", "__nc",
        "__tie", "__ca", "__cb", "__na", "__nb", "__ra", "__rb",
        "n", "c_a", "c_b", "n_a", "n_b", "z2_e6", "p_e6"),
      "RankTest")
    val d38 = "decimal(38,0)"
    val base = df
      .filter(col(groupCol).isNotNull && col(cohortCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(groupCol), col(cohortCol).cast("string").as("__c"),
        col(valueCol).cast("long").as("__v"))
    val cg = base.groupBy(col(groupCol), col("__c"), col("__v"))
      .agg(count(lit(1)).as("__tc"))
    val vg = cg.groupBy(col(groupCol), col("__v"))
      .agg(sum(col("__tc")).as("__t"))
    val wb = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val vgb = vg.withColumn("__below",
      coalesce(sum(col("__t")).over(wb), lit(0L)))
    val perC = cg.join(vgb, Seq(groupCol, "__v"))
      .groupBy(col(groupCol), col("__c"))
      .agg(sum(col("__tc")).as("__nc"),
        sum(col("__tc") * (lit(2L) * col("__below") + col("__t")
          + lit(1L))).as("__r2"))
    val ties = vg.groupBy(col(groupCol))
      .agg(sum(col("__t") * col("__t") * col("__t") - col("__t"))
        .as("__tie"))
    val tot = perC.groupBy(col(groupCol)).agg(sum(col("__nc")).as("n"))
    val a = perC.select(col(groupCol), col("__c").as("__ca"),
      col("__nc").as("__na"), col("__r2").as("__ra"))
    val b = perC.select(col(groupCol).as("__gb"), col("__c").as("__cb"),
      col("__nc").as("__nb"), col("__r2").as("__rb"))
    val pairs = a.join(b,
      col("__gb") === col(groupCol) && col("__ca") < col("__cb"))
      .join(tot, Seq(groupCol)).join(ties, Seq(groupCol))
    val nn = col("n").cast(d38)
    val delta = col("__ra").cast(d38) * col("__nb").cast(d38) -
      col("__rb").cast(d38) * col("__na").cast(d38)
    // q1 ≤ 4N⁴ exceeds Long past N ~ 4·10⁴ — the JT div-to-LONG wrap
    // class (r17 ADVICE): keep the floor exact in DECIMAL. The cast
    // back to (38,0) is lossless (q1 is an exact integer) and
    // restores full 10³⁸ headroom for the z2 numerator product
    val q1 = Exact.dfloor(delta * delta,
      col("__na").cast(d38) * col("__nb").cast(d38)).cast(d38)
    val tieFree = nn * nn * nn - nn - col("__tie").cast(d38)
    val z2 = when(tieFree === lit(0L).cast(d38), lit(0L))
      .otherwise(call_function("div",
        lit(3000000L).cast(d38) * (nn - lit(1L).cast(d38)) * q1,
        (col("__na") + col("__nb")).cast(d38) * tieFree).cast("long"))
    pairs.select(col(groupCol), col("__ca").as("c_a"),
        col("__cb").as("c_b"), col("__na").as("n_a"),
        col("__nb").as("n_b"), z2.as("z2_e6"))
      .withColumn("p_e6", PValue.normTail2E6(col("z2_e6")))
  }

  /** Spearman rank correlation with exact midrank moments (Spearman
    * 1904, Am. J. Psychol. 15) — "do these two signals move together
    * MONOTONICALLY": the rank sibling of the q_a13 exact-moment
    * Pearson (which reads linear association and is dragged by
    * outliers; ranks are transform- and outlier-proof). Doubled
    * midranks over each column's OWN distinct-value grid keep every
    * moment integral; ρ is Pearson over those integers, and the 2s
    * cancel — so the emission is the q_a13 convention exactly: five
    * exact DECIMAL(38,0) moments, one cast-to-double per term, IEEE
    * sqrt (correctly rounded), round to 6 dp. Degenerate: n < 2 or
    * either column constant (zero rank variance) ⇒ NULL.
    *
    * Capacity: moments are summed in DECIMAL after casting (the
    * leadLag silent-wrap lesson — the per-cell product c·R2x·R2y
    * would wrap a LONG at ~10⁶ rows); n·Σc·R2² ≤ 4N⁴ < 10³⁸ ⇒
    * N ≤ ~10⁹ rows per group.
    *
    * Scale shape: one map-side (group, x, y) pair-grid collapse
    * (bounded by the joint value domain, never raw rows when the
    * domains are quantized — the L43 discipline); per-column midranks
    * are windows over each VALUE grid; two grid equi-joins hang the
    * ranks back on the pair grid; one grid aggregation. */
  def spearman(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    Reserved.guard(Seq(groupCol),
      Seq("__x", "__y", "__c", "__tx", "__ty", "__bx", "__by",
        "__rx", "__ry", "n", "rho6"),
      "RankTest")
    val d38 = "decimal(38,0)"
    val base = df
      .filter(col(groupCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(groupCol), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
    val pairs = base.groupBy(col(groupCol), col("__x"), col("__y"))
      .agg(count(lit(1)).as("__c"))
    def ranks(vCol: String, tName: String, bName: String,
        rName: String) = {
      val w = Window.partitionBy(col(groupCol)).orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      pairs.groupBy(col(groupCol), col(vCol))
        .agg(sum(col("__c")).as(tName))
        .withColumn(bName, coalesce(sum(col(tName)).over(w), lit(0L)))
        .select(col(groupCol), col(vCol),
          (lit(2L) * col(bName) + col(tName) + lit(1L)).as(rName))
    }
    val j = pairs
      .join(ranks("__x", "__tx", "__bx", "__rx"),
        Seq(groupCol, "__x"))
      .join(ranks("__y", "__ty", "__by", "__ry"),
        Seq(groupCol, "__y"))
    val c = col("__c").cast(d38)
    val rx = col("__rx").cast(d38); val ry = col("__ry").cast(d38)
    val m = j.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n"),
        sum(c * rx).as("__sx"), sum(c * ry).as("__sy"),
        sum(c * rx * rx).as("__sxx"), sum(c * ry * ry).as("__syy"),
        sum(c * rx * ry).as("__sxy"))
    def d(x: org.apache.spark.sql.Column) = x.cast("double")
    val nD = col("n").cast(d38)
    val denx = nD * col("__sxx") - col("__sx") * col("__sx")
    val deny = nD * col("__syy") - col("__sy") * col("__sy")
    m.select(col(groupCol), col("n"),
      when(col("n") < 2L || denx === lit(0L).cast(d38)
          || deny === lit(0L).cast(d38), lit(null).cast("double"))
        .otherwise(round(
          d(nD * col("__sxy") - col("__sx") * col("__sy")) /
            sqrt(d(denx)) / sqrt(d(deny)), 6)).as("rho6"))
  }

  /** Exact ROC-AUC via the rank-sum identity (Hanley & McNeil 1982,
    * Radiology 143; AUC = U/(n₊·n₋) with ties at half weight — exactly
    * the midrank construction [[mannWhitney]] already computes):
    * per group, the probability a positive outranks a negative on
    * `scoreCol`. Composed FROM mannWhitney — positives are cohort A, so
    * u2_a = 2U and
    *   auc_e6 = ⌊10⁶·u2_a / (2·n_pos·n_neg)⌋
    * is one exact integral division (u2_a ≤ 2·n₊·n₋ keeps the
    * numerator ≤ 2·10⁶·n₊·n₋; inside DECIMAL(38,0) while
    * n₊·n₋ < 5·10³¹ — i.e. any group under ~10¹⁵ rows).
    * Either cohort empty ⇒ NULL (the mannWhitney convention). 0.5 is
    * chance; the z2_e6/sig columns carry over, so "is this AUC
    * significantly off chance" rides the same tie-corrected test. */
  def auc(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String): DataFrame = {
    Reserved.guard(Seq(groupCol, labelCol, scoreCol), Seq("__pos"),
      "RankTest")
    val d38 = "decimal(38,0)"
    val labeled = df.withColumn("__pos",
      when(col(labelCol).cast("long") === 1L, "pos")
        .when(col(labelCol).cast("long") === 0L, "neg"))
    mannWhitney(labeled, groupCol, "__pos", scoreCol, "pos", "neg")
      .select(col(groupCol), col("n_a").as("n_pos"),
        col("n_b").as("n_neg"),
        when(col("n_a") === 0L || col("n_b") === 0L,
          lit(null).cast("long"))
          .otherwise(call_function("div",
            lit(1000000L).cast(d38) * col("u2_a").cast(d38),
            lit(2L).cast(d38) * col("n_a").cast(d38)
              * col("n_b").cast(d38))).as("auc_e6"),
        col("z2_e6"), col("sig"))
  }

  /** Kendall's τ-b rank correlation (r15, L184; Kendall 1938,
    * Biometrika 30; the τ-b tie treatment Kendall 1945 — the THIRD
    * member of the correlation triad: q_a13's Pearson reads LINEAR
    * association, L166's Spearman monotone association through
    * ranks, τ reads the same monotone question through PAIRS, with
    * the cleanest probabilistic meaning of the three — τ =
    * P(concordant) − P(discordant) — and the gentlest response to a
    * single wild row: one outlier moves τ by at most 2/(n−1)).
    *
    * Exact integers over the distinct-(x, y) pair grid: with grid
    * cell counts c and x/y margin tie counts t_x, t_y,
    *   C, D = Σ over grid pairs (x₂ > x₁) of c₁·c₂ split by
    *          sign(y₂ − y₁)  (x-tied pairs contribute to neither)
    *   n0 = n(n−1)/2,  n1 = Σ t_x(t_x−1)/2,  n2 = Σ t_y(t_y−1)/2
    *   τ-b = (C − D)/√((n0−n1)(n0−n2))
    * C/D/n0/n1/n2 are exact DECIMAL(38,0); the emission is the
    * q_a13/L166 convention — one cast-to-double per factor, IEEE
    * sqrt, round 6 dp. n < 2 or zero variance on either margin ⇒
    * NULL.
    *
    * Scale shape, stated honestly (the Theil–Sen class): the pair
    * frame is GRID²-sized, and for a continuous y the grid is
    * corpus-sized. For corpus scale use [[kendallTauBInversions]]
    * (r16) — the SAME τ-b through the bit-decomposed inversion
    * count, O(grid log grid) with no pair frame, spec-pinned equal
    * to this form; the pair grid stays as the small-n reference
    * implementation the spec replays. The join is an equi-join on
    * the leg with the x-range as residual (never a shuffle
    * cartesian — plan-pinned). */
  def kendallTauB(df: DataFrame, legCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Reserved.guard(Seq(legCol),
      Seq("__x", "__y", "__n", "__lb", "__xb", "__yb", "__nb", "__c",
        "__d", "__tx", "__ty", "__n1", "__n2", "n", "conc", "disc",
        "tau_b6"),
      "RankTest")
    val grid = df
      .filter(col(legCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(legCol), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .groupBy(col(legCol), col("__x"), col("__y"))
      .agg(count(lit(1)).as("__n"))
    val b = grid.select(col(legCol).as("__lb"), col("__x").as("__xb"),
      col("__y").as("__yb"), col("__n").as("__nb"))
    val pairs = grid.join(b,
      col("__lb") === col(legCol) && col("__xb") > col("__x"))
    val cd = pairs.groupBy(col(legCol))
      .agg(sum(when(col("__yb") > col("__y"),
          col("__n").cast(d38) * col("__nb").cast(d38))
          .otherwise(lit(0L).cast(d38))).as("__c"),
        sum(when(col("__yb") < col("__y"),
          col("__n").cast(d38) * col("__nb").cast(d38))
          .otherwise(lit(0L).cast(d38))).as("__d"))
    def tiePairs(df2: DataFrame, keyCol: String, out: String) =
      df2.groupBy(col(legCol), col(keyCol))
        .agg(sum(col("__n")).as("__t"))
        .groupBy(col(legCol))
        .agg(sum((col("__t").cast(d38) * (col("__t") - 1L).cast(d38)))
          .as(out))
    val tx = tiePairs(grid, "__x", "__tx")
    val ty = tiePairs(grid, "__y", "__ty")
    val tot = grid.groupBy(col(legCol)).agg(sum(col("__n")).as("n"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    // doubled pair counts throughout (t(t−1), n(n−1)) — the 2s cancel
    val v1 = col("n").cast(d38) * (col("n") - 1L).cast(d38) - col("__tx")
    val v2 = col("n").cast(d38) * (col("n") - 1L).cast(d38) - col("__ty")
    // left join: a constant-x leg has NO x-ordered pairs at all (cd
    // is empty) but must still emit its NULL-tau row, not vanish
    tot.join(cd, Seq(legCol), "left").join(tx, Seq(legCol))
      .join(ty, Seq(legCol))
      .withColumn("__c", coalesce(col("__c"), lit(0L).cast(d38)))
      .withColumn("__d", coalesce(col("__d"), lit(0L).cast(d38)))
      .select(col(legCol), col("n"),
        col("__c").cast("long").as("conc"),
        col("__d").cast("long").as("disc"),
        when(col("n") < 2L || v1 === lit(0L).cast(d38)
            || v2 === lit(0L).cast(d38), lit(null).cast("double"))
          .otherwise(round(
            dd(lit(2L).cast(d38) * (col("__c") - col("__d")))
              / sqrt(dd(v1)) / sqrt(dd(v2)), 6)).as("tau_b6"))
  }

  /** Kendall's τ-b, inversion-count form (r16, VERDICT r15 #3 — the
    * retirement of [[kendallTauB]]'s pair-frame caveat; Knight 1966,
    * JASA 61, the O(n log n) τ; here the Fenwick/BIT bit-decomposition
    * of the inversion count, expressed DECLARATIVELY so Catalyst owns
    * the physical plan — no pair join, no mapPartitions, no driver
    * state).
    *
    * Identity: with the corpus collapsed to the distinct-(x, y) grid
    * (cell counts c) and y replaced by its per-leg dense 0-based rank
    * r, the discordant-pair count D = Σ over pairs (x_a < x_b,
    * r_a > r_b) of c_a·c_b is a weighted 2-D dominance count, and
    * every such pair is counted EXACTLY ONCE at the highest bit where
    * r_a and r_b differ: there r_a carries 1, r_b carries 0, and all
    * higher bits agree. So for each bit level k and shared prefix
    * g = r >> (k+1), D accumulates c_b · (Σ c_a over cells with the
    * same (k, g), bit k = 1, and x_a < x_b) — one sort window per
    * level, strict x_a < x_b via the RANGE … 1 PRECEDING frame
    * (integer x), never a pair frame. Concordant pairs then come from
    * inclusion–exclusion over the doubled margin counts
    * (N0 = n(n−1), N1/N2 = Σ t(t−1) over x/y margins, N3 over cells):
    *   C = (N0 − N1 − N2 + N3)/2 − D
    * (x-tied pairs sort y-ascending inside a tied x, so they produce
    * zero strict-rank descents — the classic Knight ordering — and
    * a constant-x leg lands at C = D = 0 with a NULL τ, exactly
    * [[kendallTauB]]'s left-join convention). τ-b emission is the
    * q_a13/L166 convention verbatim: one cast-to-double per factor,
    * IEEE sqrt, round 6 dp; n < 2 or a zero margin variance ⇒ NULL.
    * The spec pins this form equal to the pair-grid form on seeded
    * frames with ties on both margins.
    *
    * Scale shape: grid × ⌈log₂ rank-range⌉ rows (the bits ~ log n
    * law — ~20 levels at a 10⁶-value grid), each level a hash
    * partition by (leg, k, prefix) with a per-group sort: O(G log G)
    * total where the pair frame was O(G²). All joins are grid-sized
    * equi-joins (rank attach, level attach, margin assembly);
    * bin()-length gives the exact level count with no float log. */
  def kendallTauBInversions(df: DataFrame, legCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Reserved.guard(Seq(legCol),
      Seq("__x", "__y", "__n", "__r", "__mr", "__k", "__g", "__b",
        "__ones", "__dd", "__tx", "__ty", "__n3", "__tot", "n", "conc",
        "disc", "tau_b6"),
      "RankTest")
    val grid = df
      .filter(col(legCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(legCol), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .groupBy(col(legCol), col("__x"), col("__y"))
      .agg(count(lit(1)).as("__n"))
    // per-leg dense 0-based rank of the y VALUE (ties share a rank,
    // so tied-y pairs never differ at any bit — strictness for free)
    val yRank = grid.select(col(legCol), col("__y")).distinct()
      .withColumn("__r", dense_rank().over(
        Window.partitionBy(col(legCol)).orderBy(col("__y")))
        .cast("long") - 1L)
    val g2 = grid.join(yRank, Seq(legCol.toString, "__y"))
    // exact level count: length(bin(maxRank)) — an integer-string op,
    // replayed verbatim by the oracle (no float log2 boundary risk);
    // maxRank 0 (single distinct y) yields one all-zero-bit level
    // that contributes nothing
    val mx = g2.groupBy(col(legCol)).agg(max(col("__r")).as("__mr"))
    val lv = mx.select(col(legCol),
      explode(sequence(lit(0), length(bin(col("__mr"))) - 1)).as("__k"))
    val ex = g2.join(lv, Seq(legCol.toString))
      .select(col(legCol), col("__k"), col("__x"), col("__n"),
        expr("shiftright(__r, cast(__k as int) + 1)").as("__g"),
        expr("shiftright(__r, cast(__k as int)) & 1").as("__b"))
    val w = Window.partitionBy(col(legCol), col("__k"), col("__g"))
      .orderBy(col("__x"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val dSum = ex
      .withColumn("__ones", sum(when(col("__b") === 1L, col("__n"))).over(w))
      .filter(col("__b") === 0L)
      .groupBy(col(legCol))
      .agg(coalesce(sum(col("__n").cast(d38) *
        coalesce(col("__ones"), lit(0L)).cast(d38)),
        lit(0L).cast(d38)).as("__dd"))
    def tiePairs(keyCol: String, out: String) =
      grid.groupBy(col(legCol), col(keyCol))
        .agg(sum(col("__n")).as("__t"))
        .groupBy(col(legCol))
        .agg(sum(col("__t").cast(d38) * (col("__t") - 1L).cast(d38))
          .as(out))
    val tx = tiePairs("__x", "__tx")
    val ty = tiePairs("__y", "__ty")
    val n3 = grid.groupBy(col(legCol))
      .agg(sum(col("__n").cast(d38) * (col("__n") - 1L).cast(d38))
        .as("__n3"))
    val tot = grid.groupBy(col(legCol)).agg(sum(col("__n")).as("n"))
    def dd2(c: org.apache.spark.sql.Column) = c.cast("double")
    val n0 = col("n").cast(d38) * (col("n") - 1L).cast(d38)
    val v1 = n0 - col("__tx")
    val v2 = n0 - col("__ty")
    // D legs with no (1,0) cross pair vanish from dSum — same
    // left-join + coalesce convention as the pair-grid form
    val conc = call_function("div",
      n0 - col("__tx") - col("__ty") + col("__n3"), lit(2L).cast(d38)) -
      col("__dd")
    tot.join(dSum, Seq(legCol.toString), "left")
      .join(tx, Seq(legCol.toString)).join(ty, Seq(legCol.toString))
      .join(n3, Seq(legCol.toString))
      .withColumn("__dd", coalesce(col("__dd"), lit(0L).cast(d38)))
      .select(col(legCol), col("n"),
        conc.cast("long").as("conc"),
        col("__dd").cast("long").as("disc"),
        when(col("n") < 2L || v1 === lit(0L).cast(d38)
            || v2 === lit(0L).cast(d38), lit(null).cast("double"))
          .otherwise(round(
            dd2(lit(2L).cast(d38) * (conc - col("__dd")))
              / sqrt(dd2(v1)) / sqrt(dd2(v2)), 6)).as("tau_b6"))
  }

  /** Asymptotic 5% critical value of the two-sample Cramér–von Mises
    * T (Anderson & Darling 1952, Ann. Math. Stat. 23, the ω²
    * limiting distribution; Anderson 1962 table 2): 0.46136 at 1e-6.
    * Consumed as the SAME literal by the oracle. */
  private[graft] val CvmCrit95E6 = 461360L

  /** Two-sample Cramér–von Mises drift test (r15, L180; Cramér 1928,
    * von Mises 1931, two-sample form Anderson 1962, Ann. Math. Stat.
    * 33 — the INTEGRATED-distance member of the drift panel: KS sees
    * the single worst ECDF gap, [[mannWhitney]] a location shift;
    * CvM integrates the SQUARED gap over the whole support, so many
    * small distributed distortions — the shape drift a re-tokenizer
    * or dedup-pass introduces without moving the median — accumulate
    * instead of hiding below the KS sup).
    *
    * Exact construction on the distinct-value grid, ties by the ECDF
    * step form: with per-value combined count c_v and cumulative
    * cohort counts A_v, B_v (inclusive),
    *   T = Σ_v c_v·(m·A_v − n·B_v)² / ((n+m)²·n·m)
    * (the n·m scale of the classic T = nm/(n+m)²·Σ(F−G)²·dH with
    * every rational cleared). ONE quantization:
    *   t_e6 = div(10⁶·Σ_v c_v·(m·A_v − n·B_v)², (n+m)²·n·m).
    * Verdict vs [[CvmCrit95E6]] (asymptotic — the exact small-sample
    * distribution is a stated non-goal; at grid scale n, m ≫ the
    * n ≈ 10 regime where it matters). Either cohort empty ⇒ NULL.
    *
    * Capacity: Σ c·(mA−nB)² ≤ (n+m)·(nm)² ≈ N⁵/16, so the 10⁶ scale
    * holds DECIMAL(38,0) for N ≤ ~4·10⁶ rows/panel (documented —
    * subsample beyond; the verdict is long decided).
    *
    * Scale shape: the mannWhitney skeleton exactly — one map-side
    * (group, value) count collapse, a per-group sort window over the
    * VALUE grid, grid-sized sums. */
  def cramerVonMises(df: DataFrame, groupCol: String, cohortCol: String,
      valueCol: String, cohortA: String, cohortB: String): DataFrame = {
    require(cohortA != cohortB, "cohort labels must differ")
    Reserved.guard(Seq(groupCol),
      Seq("__c", "__v", "__t", "__ta", "__ca", "__cb", "__term",
        "n_a", "n_b", "t_e6", "sig"),
      "RankTest")
    val d38 = "decimal(38,0)"
    val base = df
      .filter(col(groupCol).isNotNull && col(cohortCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(groupCol), col(cohortCol).cast("string").as("__c"),
        col(valueCol).cast("long").as("__v"))
      .filter(col("__c").isin(cohortA, cohortB))
    val grid = base.groupBy(col(groupCol), col("__v"))
      .agg(count(lit(1)).as("__t"),
        sum(when(col("__c") === cohortA, 1L).otherwise(0L)).as("__ta"))
    val tot = grid.groupBy(col(groupCol))
      .agg(sum(col("__ta")).as("n_a"),
        sum(col("__t") - col("__ta")).as("n_b"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = col("n_b").cast(d38) * col("__ca").cast(d38) -
      col("n_a").cast(d38) * col("__cb").cast(d38)
    val summed = grid
      .withColumn("__ca", sum(col("__ta")).over(w))
      .withColumn("__cb", sum(col("__t") - col("__ta")).over(w))
      .join(tot, Seq(groupCol))
      .withColumn("__term", col("__t").cast(d38) * dev * dev)
      .groupBy(col(groupCol))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(col("__term")).as("__term"))
    val bigN = (col("n_a") + col("n_b")).cast(d38)
    summed
      .withColumn("t_e6",
        when(col("n_a") === 0L || col("n_b") === 0L,
          lit(null).cast("long"))
          .otherwise(call_function("div",
            lit(1000000L).cast(d38) * col("__term"),
            bigN * bigN * col("n_a").cast(d38) * col("n_b").cast(d38))
            .cast("long")))
      .withColumn("sig",
        (col("t_e6").isNotNull && col("t_e6") >= CvmCrit95E6)
          .cast("long"))
      .select(col(groupCol), col("n_a"), col("n_b"), col("t_e6"),
        col("sig"))
  }
}
