package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hopping (sliding) event-time window aggregation for BATCH tables —
  * the overlapping-window panel between the battery's tumbling buckets
  * (q_e14's resample grid) and the streaming windowed aggregates: one
  * result row per (group, window-start) where windows of width W open
  * every S ≤ W, so each event contributes to exactly W/S windows
  * (rolling rates, "errors in the last 30 min sampled every 5").
  *
  * Scale shape: each row expands to its W/S window indices via a
  * codegen'd `sequence` + explode — a constant small factor chosen by
  * the caller, NOT a join against a window table (a window-table range
  * join re-shuffles the corpus; this is a narrow map) — then ONE
  * map-side-combinable groupBy on (group, window). 100 TB in, W/S ×
  * rows through the exchange in partial-agg form, grid size out.
  *
  * Window membership is exact long arithmetic: start indices run
  * k ∈ [⌊(t−W)/S⌋+1, ⌊t/S⌋] with NEGATIVE-SAFE floor division (the
  * AsOf/RangeJoin pmod formula — truncating `div` alone drifts one
  * window for pre-epoch timestamps), so every engine derives identical
  * membership; the aggregate values follow the battery's conventions
  * (counts exact, double sums rounded by the caller). */
object TimeWindows {

  /** Exact floor division (negative-safe) — AsOf's chunk formula. */
  private def floorDiv(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  /** One row per (groupCols…, window_start) for every window a row's
    * `timeUs` (epoch-micros long) falls in: width `widthUs`, a new
    * window every `slideUs` (widthUs must be a multiple of slideUs so
    * membership count is uniform). `aggs` follow the groupBy; rows with
    * null time are dropped (no window membership). Window starts are
    * aligned to multiples of `slideUs` ("window_start_us"). */
  def hopping(df: DataFrame, timeUs: Column, widthUs: Long, slideUs: Long,
      groupCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(slideUs > 0 && widthUs > 0, "window width/slide must be positive")
    require(widthUs % slideUs == 0,
      s"width $widthUs must be a multiple of slide $slideUs " +
        "(uniform membership; ragged hops alias the window grid)")
    require(aggs.nonEmpty, "at least one aggregate")
    Seq("__k", "window_start_us").foreach(c =>
      require(!df.columns.contains(c), s"input column '$c' is reserved"))
    val kMax = floorDiv(timeUs, slideUs)
    val kMin = floorDiv(timeUs - lit(widthUs), slideUs) + lit(1L)
    // outer + null filter: the q_t6 InferFiltersFromGenerate lesson —
    // a plain explode over the computed sequence would re-evaluate it
    // inside an inferred size()>0 pushdown
    df.filter(timeUs.isNotNull)
      .withColumn("__k", explode_outer(sequence(kMin, kMax)))
      .filter(col("__k").isNotNull)
      .withColumn("window_start_us", col("__k") * lit(slideUs))
      .groupBy((groupCols :+ "window_start_us").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
