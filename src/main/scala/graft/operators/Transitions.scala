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
}
