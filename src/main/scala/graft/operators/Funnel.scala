package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream — "of the users who
  * did A, how many went on to do B, then C, inside the conversion
  * window". The product-analytics staple (Amplitude/Mixpanel's core
  * report), and the pipeline question behind every acquisition report a
  * training-data org runs on its own telemetry.
  *
  * Semantics (the standard strict-sequence funnel):
  *   - t₁ = the entity's FIRST step-1 event;
  *   - tₖ = its first step-k event STRICTLY after tₖ₋₁, and (when a
  *     window is set) within `windowUs` of t₁ — the conversion clock
  *     starts at funnel ENTRY, not at the previous step;
  *   - an entity that never reaches step k contributes to no step ≥ k.
  *
  * Scale shape: k-1 hash joins on the entity key, one per step. Each
  * pass scans ONLY that step's event type (the equality filter pushes
  * into the scan) and joins it against the survivors of the previous
  * step — a frame that only ever SHRINKS, and which AQE broadcasts once
  * it fits. No per-entity event arrays are collected, no window over the
  * whole event stream is sorted: at 100 TB a 3-step funnel is 3 filtered
  * scans + 2 key-partitioned joins. Funnel depth is a small constant by
  * nature (nobody ships a 40-step funnel), so "one join per step" is not
  * a scaling dimension. */
object Funnel {

  /** Per-entity step completion times: one row (entity, step_idx, step,
    * t_us) per step the entity completed, step_idx 1-based. Null
    * entities and null timestamps are dropped (they can anchor no
    * sequence). `steps` must be distinct — a repeated label would make
    * "its first step-k event" ambiguous. The window bound is evaluated
    * as `t ≤ t₁ + windowUs` in LONG arithmetic: keep `windowUs` a real
    * duration (t₁ + windowUs must not overflow 2⁶³), not MaxValue-as-
    * infinity — "no window" is `None`. */
  def stepTimes(df: DataFrame, entityCol: String, tsUs: Column,
      typeCol: String, steps: Seq[String],
      windowUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    windowUs.foreach(w => require(w > 0L, s"windowUs must be > 0, got $w"))
    val e = df.select(col(entityCol).as("__ent"), tsUs.as("__t"),
        col(typeCol).as("__ty"))
      .filter(col("__ent").isNotNull && col("__t").isNotNull)
    val s1 = e.filter(col("__ty") === steps.head)
      .groupBy(col("__ent")).agg(min(col("__t")).as("__t1"))
    def row(idx: Int, step: String, t: Column, from: DataFrame) =
      from.select(col("__ent").as(entityCol), lit(idx).as("step_idx"),
        lit(step).as("step"), t.as("t_us"))
    var out = List(row(1, steps.head, col("__t1"), s1))
    // survivors carry (entity, t1, t_prev); each round keeps only
    // entities with a qualifying next-step event
    var prev = s1.select(col("__ent"), col("__t1"),
      col("__t1").as("__tprev"))
    for ((st, i) <- steps.zipWithIndex.drop(1)) {
      val inWindow = windowUs
        .map(w => col("__t") <= col("__t1") + lit(w))
        .getOrElse(lit(true))
      val nxt = e.filter(col("__ty") === st)
        .join(prev, Seq("__ent"))
        .filter(col("__t") > col("__tprev") && inWindow)
        .groupBy(col("__ent"), col("__t1"))
        .agg(min(col("__t")).as("__tk"))
      out = row(i + 1, st, col("__tk"), nxt) :: out
      prev = nxt.select(col("__ent"), col("__t1"),
        col("__tk").as("__tprev"))
    }
    out.reverse.reduce(_ unionAll _)
  }

  /** The rollup: one row per step actually reached — (step_idx, step,
    * n entities, entity-id-sum membership witness in the canonical
    * digit-string form). Steps no entity reached emit NO row (the
    * funnel is a prefix — once one count is 0, all deeper ones are). */
  def report(df: DataFrame, entityCol: String, tsUs: Column,
      typeCol: String, steps: Seq[String],
      windowUs: Option[Long] = None): DataFrame =
    stepTimes(df, entityCol, tsUs, typeCol, steps, windowUs)
      .groupBy(col("step_idx"), col("step"))
      .agg(count(lit(1)).as("n"),
        sum(col(entityCol).cast("decimal(38,0)")).cast("string")
          .as("entity_sum"))

  /** χ²₁ 95% critical value × 10⁶ — z² ≥ 3.841459 rejects equal
    * conversion rates at α = 0.05 (two-sided; z² ~ χ² with 1 d.o.f.).
    * An integer constant so both engines compare identically. */
  val Chi2Crit95E6 = 3841459L

  /** Two-proportion z-test per adjacent funnel step pair between two
    * cohorts (r13, L136; VERDICT r12 #6) — "did step k's drop-off
    * CHANGE between cohorts A and B, beyond sampling noise": the
    * decision layer over L57's counts, the question every funnel
    * dashboard answers with an eyeball and this operator answers with
    * a statistic.
    *
    * Math, integer-quantized in the L43 discipline so the oracle
    * replays it digit-for-digit: with x_c survivors of n_c entrants in
    * cohort c, the pooled two-proportion z² (algebraically identical
    * to the 2×2 Pearson χ², 1 d.o.f.) is
    *   z² = (x₁n₂ − x₂n₁)² · N / (n₁ · n₂ · X · (N − X)),
    * X = x₁+x₂, N = n₁+n₂ — a single exact rational; the emitted
    * `z2_e6` is its floor at 10⁶ scale, computed entirely in
    * DECIMAL(38,0) (HUGEINT on the oracle side). Capacity: entrants ≤
    * 2×10⁶ per cohort keeps every intermediate ≤ 6.4×10³⁷ < min(10³⁸,
    * 2¹²⁷) — beyond that subsample; at such n the verdict is decided
    * long before the bound. `d_sign` = sign(p₁ − p₂) carries the
    * direction the squared statistic drops; `sig` = 1 iff z2_e6 ≥
    * [[Chi2Crit95E6]].
    *
    * Degenerate cells, defined not left to ANSI division: no entrants
    * in either cohort (n₁ = 0 or n₂ = 0) ⇒ z2_e6 NULL (no rate to
    * compare); X = 0 or X = N (nobody or everybody converted — the
    * pooled variance is 0 and so is the numerator) ⇒ z2_e6 = 0. Pairs
    * whose TO-step no entity reached at all emit no row (the funnel-
    * prefix convention of [[report]]).
    *
    * Scale shape: one count aggregation over the (already funnel-
    * shrunk) step-times frame down to a ≤|steps|-row grid, one
    * grid-sized self-join for adjacency — nothing corpus-sized past
    * the [[stepTimes]] machinery this composes. `cohorts` must map
    * each entity to ONE label ((entity, label) distinct — a dup would
    * double-count survivors); labels other than `cohortA`/`cohortB`
    * are ignored, entities without a cohort row drop. */
  def dropoffSignificance(stepTimes: DataFrame, entityCol: String,
      cohorts: DataFrame, cohortCol: String, cohortA: String,
      cohortB: String): DataFrame = {
    require(cohortA != cohortB, "cohort labels must differ")
    val counts = stepTimes
      .join(cohorts.select(col(entityCol),
        col(cohortCol).cast("string").as("__c")), Seq(entityCol))
      .filter(col("__c").isin(cohortA, cohortB))
      .groupBy(col("step_idx"), col("step"))
      .agg(sum(when(col("__c") === cohortA, 1L).otherwise(0L)).as("na"),
        sum(when(col("__c") === cohortB, 1L).otherwise(0L)).as("nb"))
    val from = counts.select(col("step_idx"),
      col("step").as("step_from"),
      col("na").as("entrants_a"), col("nb").as("entrants_b"))
    val to = counts.select((col("step_idx") - 1).as("step_idx"),
      col("step").as("step_to"),
      col("na").as("conv_a"), col("nb").as("conv_b"))
    val d38 = "decimal(38,0)"
    val x1 = col("conv_a").cast(d38); val n1 = col("entrants_a").cast(d38)
    val x2 = col("conv_b").cast(d38); val n2 = col("entrants_b").cast(d38)
    val num = x1 * n2 - x2 * n1
    val bigX = x1 + x2
    val bigN = n1 + n2
    from.join(to, Seq("step_idx"))
      .withColumn("d_sign", signum(num).cast("long"))
      .withColumn("z2_e6",
        when(col("entrants_a") === 0L || col("entrants_b") === 0L,
          lit(null).cast("long"))
          .when(bigX === lit(0L).cast(d38) || bigX === bigN, lit(0L))
          .otherwise(call_function("div",
            num * num * bigN * lit(1000000L).cast(d38),
            n1 * n2 * bigX * (bigN - bigX))))
      .withColumn("sig",
        (col("z2_e6").isNotNull && col("z2_e6") >= Chi2Crit95E6)
          .cast("long"))
      .select(col("step_idx").as("from_idx"), col("step_from"),
        col("step_to"), col("entrants_a"), col("conv_a"),
        col("entrants_b"), col("conv_b"), col("d_sign"), col("z2_e6"),
        col("sig"))
  }
}
