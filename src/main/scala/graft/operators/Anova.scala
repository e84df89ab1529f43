package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-way ANOVA F and the Brown–Forsythe variance-drift test (r16,
  * L188/L189; Fisher 1925 §42; Brown & Forsythe 1974, JASA 69;
  * Levene 1960) — the two members the comparison panel lacked:
  * [[RankTest.kruskalWallis]] asks the k-cohort location question
  * through ranks; [[oneWayF]] is its parametric sibling on raw
  * moments (more power when the signal really is a mean shift), and
  * [[brownForsythe]] turns the same machinery on ABSOLUTE DEVIATIONS
  * FROM THE COHORT MEDIAN — the scale-drift question no location
  * test sees (a re-tokenizer that widens the length distribution
  * without moving its center drifts exactly this way).
  *
  * Exact-cascade contract (the L157 kruskalWallis stance — a DEFINED
  * statistic, every step replayed token-for-token by the oracle):
  * with cohort sums T_c, sizes n_c, panel totals T, N, k and the
  * exact Σv²,
  *   term_c = ⌊10⁶·T_c²/n_c⌋,  q = ⌊10⁶·T²/N⌋,  S = Σ term_c,
  *   b_e6 = max(0, S − q)            (10⁶·SS_between, floor noise
  *                                    can undershoot an exact 0)
  *   w_e6 = 10⁶·Σv² − S              (10⁶·SS_within, OVER-read by
  *                                    the term_c floors — never a
  *                                    negative denominator)
  *   f_e6 = ⌊10⁶·b_e6·(N−k) / (w_e6·(k−1))⌋
  * k < 2 or w_e6 = 0 (perfect within-cohort constancy — the F is
  * undefined/infinite) ⇒ NULL f_e6.
  *
  * Verdict: under H₀, F ~ F(k−1, N−k); at corpus N the second df is
  * huge and F(df1, ∞) = χ²_{df1}/df1 exactly, so `sig` compares
  * f_e6 ≥ ⌊[[RankTest.Chi2Crit95E6ByDf]](df1)/df1⌋ when df1 ≤ 8 AND
  * N−k ≥ [[Df2Floor]] (below the floor the asymptote is > 0.3% slack
  * against the finite-df critical value — verdict honestly NULL, the
  * statistic still emitted); df1 > 8 ⇒ NULL (the table's documented
  * edge).
  *
  * Capacity: 10⁶·T_c² needs (n_c·|v|max)² ≤ 10³², i.e. N·V ≤ 10¹⁶
  * (documents n_chars at V ~ 10³: N ≤ 10¹³ rows/panel — stated, not
  * silently wrapped; everything runs in DECIMAL(38,0), and every
  * floor quotient is [[Exact.dfloor]] — SQL `div` would cast its
  * result to LONG and wrap once n_c·V² ≳ 9.2·10¹², far inside this
  * envelope; r17 ADVICE fix).
  *
  * Scale shape: ONE map-side-combinable (panel, cohort) moment
  * aggregation collapses the corpus; everything after is
  * cohort-grid math. [[brownForsythe]] adds the exact cohort median
  * (a (panel, cohort, value)-grid rank selection — the A8
  * convention, 0-based rank n DIV 2) and one grid equi-join to
  * stage |v − med|; no extra corpus pass. */
object Anova {

  /** Minimum within-df for the F(df1, ∞) = χ²/df1 verdict asymptote:
    * at df2 = 1000 the finite critical value exceeds the asymptote by
    * < 0.3% (F(1,1000) = 3.851 vs 3.841) — below this, `sig` is NULL
    * rather than pretending the table applies. */
  private[graft] val Df2Floor = 1000L

  /** One-way F over (panelCol, cohortCol, valueCol): emits
    * (panelCol, n, k, b_e6, w_e6, f_e6, sig). */
  def oneWayF(df: DataFrame, panelCol: String, cohortCol: String,
      valueCol: String): DataFrame = {
    Reserved.guard(Seq(panelCol),
      Seq("__c", "__v", "__nc", "__tc", "__term", "__s", "__sxx",
        "__t", "__q", "n", "k", "b_e6", "w_e6", "f_e6", "sig"),
      "Anova")
    oneWayFStaged(stage(df, panelCol, cohortCol, valueCol), panelCol)
  }

  private def stage(df: DataFrame, panelCol: String, cohortCol: String,
      valueCol: String): DataFrame =
    df.filter(col(panelCol).isNotNull && col(cohortCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(panelCol), col(cohortCol).cast("string").as("__c"),
        col(valueCol).cast("long").as("__v"))

  /** The F cascade over a pre-staged (panel, __c, __v) frame. */
  private def oneWayFStaged(base: DataFrame, panelCol: String)
      : DataFrame = {
    val d38 = "decimal(38,0)"
    val perC = base.groupBy(col(panelCol), col("__c"))
      .agg(count(lit(1)).as("__nc"), sum(col("__v")).as("__tc"),
        sum(col("__v").cast(d38) * col("__v").cast(d38)).as("__sxx"))
    // __term = ⌊10⁶·T_c²/n_c⌋ exceeds Long once n_c·V² ≳ 9.2·10¹²,
    // far inside the documented envelope — the JT div-to-LONG wrap
    // class (r17 ADVICE): exact decimal floor, cast back to (38,0)
    // (lossless — the floor is an exact integer) for sum headroom
    val terms = perC.withColumn("__term", Exact.dfloor(
      lit(1000000L).cast(d38) * col("__tc").cast(d38)
        * col("__tc").cast(d38), col("__nc").cast(d38)).cast(d38))
    val panel = terms.groupBy(col(panelCol))
      .agg(sum(col("__nc")).as("n"), count(lit(1)).as("k"),
        sum(col("__tc")).as("__t"), sum(col("__term")).as("__s"),
        sum(col("__sxx")).as("__sxx"))
      .withColumn("__q", Exact.dfloor(
        lit(1000000L).cast(d38) * col("__t").cast(d38)
          * col("__t").cast(d38), col("n").cast(d38)).cast(d38))
    val b = greatest(col("__s") - col("__q"), lit(0L).cast(d38))
    val w = lit(1000000L).cast(d38) * col("__sxx") - col("__s")
    val df1 = col("k") - 1L
    // f_e6 = 10⁶·F wraps `div`'s LONG result whenever w_e6 is tiny
    // against b_e6 (near-constant cohorts) — same exact-floor stance
    val f = Exact.dfloor(
      lit(1000000L).cast(d38) * b * (col("n") - col("k")).cast(d38),
      w * df1.cast(d38))
    panel.select(col(panelCol), col("n"), col("k"),
      b.cast("long").as("b_e6"), w.cast("long").as("w_e6"),
      when(col("k") < 2L || w === lit(0L).cast(d38),
        lit(null).cast("long"))
        .otherwise(f.cast("long")).as("f_e6"))
      .withColumn("sig",
        when(col("f_e6").isNull || df1 > 8L ||
          col("n") - col("k") < Df2Floor, lit(null).cast("long"))
          .otherwise((col("f_e6") >= call_function("div",
            element_at(typedlit(RankTest.Chi2Crit95E6ByDf),
              df1.cast("int")).cast(d38), df1.cast(d38)).cast("long"))
            .cast("long")))
  }

  /** Brown–Forsythe: [[oneWayF]] on z = |v − median_cohort(v)| —
    * "do these cohorts differ in SPREAD", robust to non-normality
    * (the median centering is what distinguishes it from Levene's
    * mean form, Brown & Forsythe 1974 table 1). The cohort median is
    * the exact data value at 0-based rank n DIV 2 (the A8
    * convention), so z is an exact integer and the F cascade applies
    * unchanged. Emits the [[oneWayF]] columns. */
  def brownForsythe(df: DataFrame, panelCol: String, cohortCol: String,
      valueCol: String): DataFrame = {
    Reserved.guard(Seq(panelCol),
      Seq("__c", "__v", "__t", "__below", "__n", "__med", "__nc",
        "__tc", "__term", "__s", "__sxx", "__q", "n", "k", "b_e6",
        "w_e6", "f_e6", "sig"),
      "Anova")
    val base = stage(df, panelCol, cohortCol, valueCol)
    val cg = base.groupBy(col(panelCol), col("__c"), col("__v"))
      .agg(count(lit(1)).as("__t"))
    val w = Window.partitionBy(col(panelCol), col("__c"))
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val nc = cg.groupBy(col(panelCol), col("__c"))
      .agg(sum(col("__t")).as("__n"))
    val med = cg
      .withColumn("__below", coalesce(sum(col("__t")).over(w), lit(0L)))
      .join(nc, Seq(panelCol, "__c"))
      .filter(col("__below") <= expr("__n DIV 2") &&
        expr("__n DIV 2") < col("__below") + col("__t"))
      .select(col(panelCol), col("__c"), col("__v").as("__med"))
    val staged = base.join(med, Seq(panelCol, "__c"))
      .select(col(panelCol), col("__c"),
        abs(col("__v") - col("__med")).as("__v"))
    oneWayFStaged(staged, panelCol)
  }
}
