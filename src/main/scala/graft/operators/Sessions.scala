package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard event-stream / chat-log shaping
  * step for training-data pipelines (group a user's raw events into
  * conversations; a new session starts when the idle gap exceeds a
  * threshold). The reference has no event grouping, but its `events`-style
  * verification surface (SURVEY §2 A6 window volumetry) is the batch
  * analog; this is the per-entity generalization.
  *
  * Scale shape: ONE hash shuffle on the entity column (the window's
  * partitionBy) — sessions never span entities, so 100 TB of events
  * sessionize with no global ordering step. The downstream per-session
  * aggregation reuses the same partitioning (hash(entity) co-locates every
  * (entity, session) group), so Catalyst plans it without a second
  * exchange. Skewed entities (one bot user with 10⁸ events) are the one
  * hazard: cap or pre-split such keys with [[Skew]] before sessionizing.
  *
  * Time is carried as epoch MICROSECONDS in a long column: the testdata's
  * parquet timestamps are nanosecond-precision (read as nano longs under
  * `nanosAsLong`), and truncating to micros keeps engine results
  * bit-identical to oracle engines whose timestamp type is micros.
  */
object Sessions {

  /** Adds `session_idx` (1-based, per entity, in time order): a new
    * session starts at the first event and whenever the gap since the
    * previous event is STRICTLY greater than `gap`. `tsUs` must be epoch
    * micros (long); `tieBreak` makes ordering total when timestamps
    * collide. */
  def sessionize(df: DataFrame, entityCol: String, tsUs: Column,
      tieBreak: Column, gap: java.time.Duration): DataFrame = {
    // toNanos/1000, not toMillis*1000: the API contract is microseconds,
    // and the millisecond route silently floored sub-ms gaps (a 2.5 ms
    // gap became 2 ms; anything under 1 ms became 0 — every positive gap
    // then started a new session)
    val gapUs = gap.toNanos / 1000L
    val order = Window.partitionBy(col(entityCol)).orderBy(tsUs, tieBreak)
    val prev = lag(tsUs, 1).over(order)
    val isNew = when(prev.isNull || tsUs - prev > gapUs, 1).otherwise(0)
    // running sum over an explicit ROWS frame: the default RANGE frame
    // would group peer rows, miscounting when timestamps collide
    df.withColumn("session_idx",
      sum(isNew).over(order.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Per-session profile: event count and [start, end] in epoch micros.
    * One shuffle total — the groupBy reuses the window's partitioning. */
  def sessionStats(df: DataFrame, entityCol: String, tsUs: Column,
      tieBreak: Column, gap: java.time.Duration): DataFrame =
    sessionize(df.withColumn("__us", tsUs), entityCol, col("__us"),
        tieBreak, gap)
      .groupBy(col(entityCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__us")).as("session_start_us"),
        max(col("__us")).as("session_end_us"))
}
