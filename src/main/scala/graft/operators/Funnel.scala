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
}
