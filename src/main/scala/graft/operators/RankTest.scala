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
}
