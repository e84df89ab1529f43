package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-window burst detection — "did this entity ever fire more
  * than K events inside any W-long window": the bot/abuse/scraper
  * screen every telemetry pipeline runs before its events feed
  * curation or billing (a crawler that bursts 10⁴ requests/hour is a
  * data-quality event, not a user), and the entity-level companion of
  * [[Skew]]'s bot-burst hot-KEY treatment — Skew protects the PLAN
  * from the burst, this operator FINDS the burster.
  *
  * Semantics (exact, the event-anchored sliding maximum): for each
  * event at time t, the window [t, t + W) counts the entity's events
  * inside it; the entity's `peak_burst` is the maximum such count —
  * and because any W-long interval's count is maximized by sliding
  * its left edge right until it hits an event, the event-anchored
  * maximum IS the true sliding-window maximum. `peak_start_us` is the
  * earliest anchor achieving the peak (deterministic under ties:
  * equal timestamps land in the same frame, and min() breaks anchor
  * ties). `flagged` = peak ≥ threshold.
  *
  * Scale shape: ONE exchange — both windows (the RANGE count and the
  * per-entity max) share `partitionBy(entity)`, so the frame shuffles
  * once and both passes are sort-based and spillable inside the same
  * partition. Per-entity cost is linear in that entity's history; a
  * pathologically hot entity is the [[Transitions.matrixChunked]]
  * class — at this operator's intended place (POST-ingest telemetry,
  * entity = user/agent) histories are bounded by reality, and the
  * range frame never materializes more than one window. The oracle
  * replays the identical RANGE frame. */
object Burst {

  /** Per-entity burst report: (entityCol, n_events, peak_burst,
    * peak_start_us, flagged). `windowUs` is the window length W in
    * microseconds (the frame is [t, t+W), i.e. RANGE 0..W−1);
    * `threshold` the flagging peak. Null entities/timestamps drop. */
  def slidingPeak(df: DataFrame, entityCol: String, tsUs: Column,
      windowUs: Long, threshold: Long): DataFrame = {
    require(windowUs >= 1L, s"windowUs $windowUs must be >= 1")
    require(threshold >= 1L, s"threshold $threshold must be >= 1")
    Reserved.guard(Seq(entityCol), Seq("__t", "__c", "__peak"), "Burst")
    val e = df
      .select(col(entityCol), tsUs.cast("long").as("__t"))
      .filter(col(entityCol).isNotNull && col("__t").isNotNull)
    val wRange = Window.partitionBy(col(entityCol)).orderBy(col("__t"))
      .rangeBetween(0L, windowUs - 1L)
    val wEnt = Window.partitionBy(col(entityCol))
    e.withColumn("__c", count(lit(1)).over(wRange))
      .withColumn("__peak", max(col("__c")).over(wEnt))
      .groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_events"),
        max(col("__c")).as("peak_burst"),
        min(when(col("__c") === col("__peak"), col("__t")))
          .as("peak_start_us"))
      .withColumn("flagged",
        (col("peak_burst") >= threshold).cast("long"))
  }
}
