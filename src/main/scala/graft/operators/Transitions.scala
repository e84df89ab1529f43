package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-type transition matrix — the first-order Markov view of an
  * event stream (product-analytics "users who did X next did Y", the
  * sequence complement to L57's ordered funnel and L58's cohort
  * retention: the funnel asks "did the fixed sequence happen", the
  * matrix asks "what sequences happen"). Per entity, events order by
  * (event time, id) — the battery's total-order convention — and every
  * adjacent pair contributes one (from_type, to_type) observation;
  * output carries the count, the from-row total, and the row-normalized
  * transition probability as an exact ppm floor (n·10⁶ div row_n — no
  * float anywhere).
  *
  * Scale shape: ONE window pass (lead over the per-entity order) and
  * two grid-sized aggregations (|types|² matrix, |types| row totals).
  * The per-entity window serializes a hot entity's history into one
  * task — the documented L20 pathology; at 100 TB reuse the Sessions
  * chunkWidth treatment (local transitions per (entity, time-chunk),
  * boundary pairs stitched from the chunk-edge rows — same stitch
  * algebra, one extra grid join). The battery corpus has no hot
  * entities, so the plain window is the honest measured form here.
  * Null entities, types, ids or times drop (a transition needs a total
  * order and two named endpoints). */
object Transitions {

  /** (from_type, to_type, n, row_n, p_ppm), one row per observed
    * transition. `usCol` is the event-time column in epoch micros
    * (callers pass `Tables.epochMicros` output — the physical-type
    * adapting helper). */
  def matrix(events: DataFrame, entityCol: String, usCol: Column,
      idCol: String, typeCol: String): DataFrame = {
    val base = events
      .withColumn("__us", usCol)
      .filter(col(entityCol).isNotNull && col(typeCol).isNotNull &&
        col(idCol).isNotNull && col("__us").isNotNull)
      .select(col(entityCol).as("__e"), col("__us"),
        col(idCol).as("__id"), col(typeCol).as("from_type"))
    val w = Window.partitionBy(col("__e"))
      .orderBy(col("__us"), col("__id"))
    val counts = base
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("row_n"))
    counts
      .join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("row_n"),
        call_function("div", col("n") * lit(1000000L), col("row_n"))
          .as("p_ppm"))
  }

  /** The hot-entity-safe form of [[matrix]] (the Sessions `chunkWidth`
    * treatment, implemented rather than just documented): adjacency is
    * computed per (entity, time-chunk) — a hot entity's history SPANS
    * partitions instead of serializing into one window task — and the
    * one pair each chunk boundary owns is stitched from a per-chunk
    * summary table carrying only each chunk's FIRST and LAST event
    * (2 rows per non-empty chunk; the lead window that orders chunk
    * summaries serializes summaries, never events).
    *
    * Equivalence to [[matrix]] is exact, not approximate: chunk id =
    * us div width is monotone in the (us, id) order (equal timestamps
    * land in the SAME chunk, so no tie can straddle a boundary), hence
    * global adjacency = within-chunk adjacency ∪ (last of chunk k →
    * first of next non-empty chunk) — spec-pinned property-equal on
    * seeded data including a 90%-hot entity. */
  def matrixChunked(events: DataFrame, entityCol: String, usCol: Column,
      idCol: String, typeCol: String, chunkWidthUs: Long): DataFrame = {
    require(chunkWidthUs > 0L, s"chunkWidthUs $chunkWidthUs must be > 0")
    val base = events
      .withColumn("__us", usCol)
      .filter(col(entityCol).isNotNull && col(typeCol).isNotNull &&
        col(idCol).isNotNull && col("__us").isNotNull)
      .select(col(entityCol).as("__e"), col("__us"),
        col(idCol).as("__id"), col(typeCol).as("__ty"),
        call_function("div", col("__us"), lit(chunkWidthUs)).as("__ck"))
    val wCk = Window.partitionBy(col("__e"), col("__ck"))
      .orderBy(col("__us"), col("__id"))
    val inChunk = base
      .withColumn("__next", lead(col("__ty"), 1).over(wCk))
      .filter(col("__next").isNotNull)
      .select(col("__ty").as("from_type"), col("__next").as("to_type"))
    // per-chunk summary: first/last event types under the total order —
    // ONE row per (entity, chunk), struct-extremes (map-side
    // combinable), never a window over the entity's full history
    val summary = base
      .groupBy(col("__e"), col("__ck"))
      .agg(
        min(struct(col("__us"), col("__id"), col("__ty"))).as("__first"),
        max(struct(col("__us"), col("__id"), col("__ty"))).as("__last"))
    val wSum = Window.partitionBy(col("__e")).orderBy(col("__ck"))
    val boundary = summary
      .withColumn("__nf", lead(col("__first.__ty"), 1).over(wSum))
      .filter(col("__nf").isNotNull)
      .select(col("__last.__ty").as("from_type"),
        col("__nf").as("to_type"))
    val counts = inChunk.unionAll(boundary)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("row_n"))
    counts
      .join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("row_n"),
        call_function("div", col("n") * lit(1000000L), col("row_n"))
          .as("p_ppm"))
  }
}
