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
  * hazard; `chunkWidth` is the wired mitigation (VERDICT r4 #3): events
  * chunk into fixed-width time buckets, local session indices are
  * computed per (entity, chunk) in parallel, and the cross-chunk stitch
  * (does the chunk's first session continue the previous chunk's last?
  * how many sessions came before?) runs on the per-(entity, chunk)
  * SUMMARY table — |entities|·|chunks| rows, never event-sized — then
  * joins back on (entity, chunk). Identical indices for every width
  * (property-tested).
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
      tieBreak: Column, gap: java.time.Duration,
      chunkWidth: Option[Long] = None, autoChunk: Boolean = true): DataFrame = {
    // toNanos/1000, not toMillis*1000: the API contract is microseconds,
    // and the millisecond route silently floored sub-ms gaps (a 2.5 ms
    // gap became 2 ms; anything under 1 ms became 0 — every positive gap
    // then started a new session)
    val gapUs = gap.toNanos / 1000L
    // Auto-chunking (VERDICT r5 #4, same scheme as AsOf): with no explicit
    // width, a per-partition reservoir probe (≤64 evenly-strided
    // partitions, escalating to all only on a borderline estimate —
    // Skew.hotKeyShare) estimates the hottest entity's share; above the
    // threshold one min/max pass sizes a width (~8 chunks per shuffle
    // partition) and the chunked plan engages. Uniform data pays only the
    // bounded probe; explicit `chunkWidth` always wins;
    // a non-integral ts expression cannot chunk (div needs exact longs).
    val integralTs = {
      import org.apache.spark.sql.types._
      Set[DataType](ByteType, ShortType, IntegerType, LongType)(
        df.select(tsUs).schema.head.dataType)
    }
    val effectiveWidth: Option[Long] = chunkWidth.orElse {
      if (!autoChunk || !integralTs) None
      else Skew.autoChunkWidth(df, Seq(col(entityCol)), tsUs)
    }
    effectiveWidth match {
      case None =>
        val order = Window.partitionBy(col(entityCol)).orderBy(tsUs, tieBreak)
        val prev = lag(tsUs, 1).over(order)
        val isNew = when(prev.isNull || tsUs - prev > gapUs, 1).otherwise(0)
        // running sum over an explicit ROWS frame: the default RANGE frame
        // would group peer rows, miscounting when timestamps collide
        df.withColumn("session_idx",
          sum(isNew).over(order.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      case Some(width) =>
        require(width > 0, s"chunkWidth $width must be positive")
        // same contract AsOf enforces via requireIntegralTs: the exact
        // `div` below fails analysis with a cryptic type mismatch on a
        // non-integral ts expression (ADVICE r6) — say it up front
        require(integralTs,
          "chunked sessionize needs an integral (exact long) ts expression")
        val reserved = Seq("__ck", "__lidx", "__off", "__r_ent", "__r_ck")
        require(!reserved.exists(df.columns.contains),
          s"input columns use reserved names: ${reserved.mkString(",")}")
        // negative-safe fixed-width bucket (RangeJoin's exact-long
        // formula); `div` keeps the math in longs — `/` would route
        // through DOUBLE and mis-chunk raw nano timestamps above 2^53
        val ck = call_function("div", tsUs - pmod(tsUs, lit(width)), lit(width))
        // 1. local session indices per (entity, chunk) — the plain window
        // partitioned one level finer, so a hot entity parallelizes
        val order = Window.partitionBy(col(entityCol), col("__ck"))
          .orderBy(tsUs, tieBreak)
        val prev = lag(tsUs, 1).over(order)
        val isNew = when(prev.isNull || tsUs - prev > gapUs, 1).otherwise(0)
        val local = df.withColumn("__ck", ck)
          .withColumn("__lidx",
            sum(isNew).over(order.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
        // 2. per-(entity, chunk) summary: first/last event ts + local
        // session count — |entities|·|chunks| rows, never event-sized
        val summary = local.groupBy(col(entityCol), col("__ck"))
          .agg(min(tsUs).as("__first"), max(tsUs).as("__last"),
            max(col("__lidx")).as("__n"))
        // 3. stitch on the summary: a chunk's first session CONTINUES the
        // previous (non-empty) chunk's last session iff the boundary gap
        // is within `gap`; the event's global index is then its local
        // index plus sessions-before-this-chunk minus one per merged
        // boundary up to and including this chunk:
        //   off(c) = Σ_{c'<c} n(c') − Σ_{c''≤c} merge(c'')
        // (induction: first session of c = 1 + off(c) lands on the last
        // session of c−1 exactly when merge(c) = 1)
        val wSum = Window.partitionBy(col(entityCol)).orderBy(col("__ck"))
        val prevLast = lag(col("__last"), 1).over(wSum)
        // staged: __merge is itself a window (lag) result, so the running
        // sums below must see it as a plain column, not a nested window
        val staged = summary.withColumn("__merge",
          when(prevLast.isNotNull && col("__first") - prevLast <= gapUs, 1L)
            .otherwise(0L))
        val offsets = staged
          .withColumn("__off",
            coalesce(sum(col("__n")).over(wSum.rowsBetween(
              Window.unboundedPreceding, -1)), lit(0L)) -
              sum(col("__merge")).over(wSum.rowsBetween(
                Window.unboundedPreceding, Window.currentRow)))
          .select(col(entityCol), col("__ck"), col("__off"))
        // 4. join back on (entity, chunk) — local is already partitioned
        // that way; the offsets side is summary-sized. Entity equality is
        // NULL-SAFE (<=>): the window path puts null entities in their
        // own partition and indexes them like any other, so the offsets
        // join must match them too — a plain inner equi-join would drop
        // every null-entity event, breaking the identical-results-for-
        // every-width contract. The offsets side is renamed so the
        // shared-lineage self-join stays unambiguous; __ck derives from
        // the (orderable, non-null in practice) ts expression — rows
        // where tsUs itself is null pair via <=> there as well.
        val offR = offsets.select(col(entityCol).as("__r_ent"),
          col("__ck").as("__r_ck"), col("__off"))
        local.join(offR,
            col(entityCol) <=> col("__r_ent") && col("__ck") <=> col("__r_ck"))
          .withColumn("session_idx", col("__lidx") + col("__off"))
          .drop("__ck", "__lidx", "__off", "__r_ent", "__r_ck")
    }
  }

  /** Per-session profile: event count and [start, end] in epoch micros.
    * One shuffle total — the groupBy reuses the window's partitioning
    * (plain path; the chunked path adds its summary join). */
  def sessionStats(df: DataFrame, entityCol: String, tsUs: Column,
      tieBreak: Column, gap: java.time.Duration,
      chunkWidth: Option[Long] = None, autoChunk: Boolean = true): DataFrame =
    sessionize(df.withColumn("__us", tsUs), entityCol, col("__us"),
        tieBreak, gap, chunkWidth, autoChunk)
      .groupBy(col(entityCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__us")).as("session_start_us"),
        max(col("__us")).as("session_end_us"))
}
