package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling to a fixed grid with gap filling — turn an
  * irregular event stream into one row per (entity, bucket) over each
  * entity's observed span, carrying the last observed value forward
  * (LOCF) through buckets with no events. The shape every monitoring /
  * feature-engineering pipeline needs before windowed math: regular
  * grids make downstream joins and rolling aggregates trivial.
  *
  * Scale shape: one groupBy to the per-(entity, bucket) last value (the
  * raw stream is never touched again), one per-entity span aggregate,
  * one bounded `sequence` explode to the grid — grid rows are span ÷
  * step per entity, independent of event count, so size the step to the
  * span you query — a left join back on (entity, bucket), and ONE
  * running-frame window (rows unbounded-preceding → current, streaming
  * execution, never the quadratic whole-partition frame) for the
  * carry-forward. Buckets are integer `DIV`: timestamps must be
  * nonnegative epoch micros (the retention/as-of precondition). */
object Resample {

  /** (entity, bucket, value, gap_filled) for every bucket in the
    * entity's [first, last] event-bucket span. `value` is the value of
    * the latest event at or before the bucket's end — "latest" resolved
    * by (timestamp, `seqCol`) so ties at identical timestamps are
    * deterministic (pass a unique sequence/id column). `gap_filled` is
    * true where the bucket itself had no events and the value was
    * carried forward — PRESENCE marks a bucket as observed, not value
    * nullness. A null last-observed value defers to the previous
    * bucket's carry (the fill ignores nulls), while its bucket still
    * reports gap_filled = false. Null entities/timestamps are
    * dropped. */
  def locf(df: DataFrame, entityCol: String, tsUs: Column,
      valueCol: String, seqCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0L, s"stepUs must be > 0, got $stepUs")
    val e = df.select(col(entityCol).as("__ent"), tsUs.as("__t"),
        col(valueCol).as("__v"), col(seqCol).as("__s"))
      .filter(col("__ent").isNotNull && col("__t").isNotNull)
      .select(col("__ent"), expr(s"__t DIV ${stepUs}L").as("__b"),
        col("__t"), col("__v"), col("__s"))
    val lastPer = e.groupBy(col("__ent"), col("__b"))
      .agg(max_by(col("__v"), struct(col("__t"), col("__s"))).as("__lv"),
        lit(false).as("__gap"))
    val grid = e.groupBy(col("__ent"))
      .agg(min(col("__b")).as("__b0"), max(col("__b")).as("__b1"))
      .select(col("__ent"),
        explode(sequence(col("__b0"), col("__b1"))).as("__b"))
    val w = Window.partitionBy(col("__ent")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastPer, Seq("__ent", "__b"), "left")
      .select(col("__ent").as(entityCol), col("__b").as("bucket"),
        last(col("__lv"), ignoreNulls = true).over(w).as(valueCol),
        coalesce(col("__gap"), lit(true)).as("gap_filled"))
  }
}
