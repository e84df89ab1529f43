package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch as-of join (`operators/AsOf`) — the
  * event-time temporal enrichment Flink calls a temporal join: a stream
  * of left events is matched, per key, against the LATEST prior-or-equal
  * right event, with correctness under out-of-order arrival bought by
  * the watermark instead of a sort.
  *
  * Why not a stream-stream interval join: Spark's built-in one emits
  * EVERY right row in the interval (then needs a per-left top-1, which
  * Append-mode streaming cannot express), and its state retention is
  * interval-sized. Here `flatMapGroupsWithState` holds exactly what the
  * as-of semantics need and nothing more:
  *
  *  - a left event is held until the watermark passes its timestamp —
  *    only then can no earlier right event still arrive, so the match
  *    (largest `(rightTs, rightId)` at or before `leftTs`) is final;
  *  - right events are held while `rightTs > watermark`, plus ONE
  *    resolved right at or below it (the newest — any future left must
  *    see it as its prior state). Everything older is provably
  *    unmatchable and dropped, so per-key state is O(events inside the
  *    watermark horizon) + O(1), not O(history) — the horizon, not the
  *    stream's age, sizes the state store at 100 TB/day.
  *
  * Emission is Append-mode and final (no retractions): each left event
  * is emitted exactly once, on the first trigger whose watermark has
  * passed it — via the group's new-data invocation or, for keys with no
  * new traffic, the EventTimeTimeout set to the oldest pending left.
  * Events arriving later than the watermark allows are dropped by the
  * engine before reaching the state function (the standard streaming
  * lateness contract; size `watermarkDelay` to the source's real
  * disorder). Determinism: ties at equal `rightTs` resolve to the
  * largest `rightId` — the batch operator's rule, letting the spec pin
  * stream output against `AsOf.joinPriorOrEqual` on identical data.
  *
  * Event-time domain: `tsUs > 0`, STRICTLY epoch-positive (ADVICE r6).
  * The engine's initial watermark is 0 ms and its late-row filter
  * admits only event times strictly above the watermark, so rows at or
  * before the epoch are dropped by the ENGINE before any user code
  * runs (measured: a ts=0 row shows up in
  * `numRowsDroppedByWatermark` on the first micro-batch, spec-pinned).
  * Timelines carrying epoch/pre-epoch timestamps need re-basing, not a
  * bigger delay. As defense-in-depth the state function also treats a
  * reported 0 watermark as "none yet" instead of a real horizon, so it
  * can never finalize anything off the engine's pre-first-update
  * placeholder. */
object StreamingAsOf {

  final case class LeftEvent(key: String, tsUs: Long, leftId: Long)
  final case class RightEvent(key: String, tsUs: Long, rightId: Long,
    value: Double)
  /** One row per resolved left event; unmatched lefts keep None. */
  final case class AsOfMatch(key: String, tsUs: Long, leftId: Long,
    rightId: Option[Long], rightTsUs: Option[Long], value: Option[Double])

  private[graft] final case class Tagged(key: String, tsUs: Long, side: Int,
    leftId: Long, rightId: Long, value: Double,
    eventTime: java.sql.Timestamp) // the watermark column must survive
                                   // into the grouped Dataset
  private[graft] final case class BufferState(lefts: List[(Long, Long)], // (ts, id)
    rights: List[(Long, Long, Double)]) // (ts, id, value)

  private def taggedUnion(left: Dataset[LeftEvent], right: Dataset[RightEvent],
      watermarkDelay: String)(implicit spark: SparkSession): Dataset[Tagged] = {
    import spark.implicits._
    // one tagged union stream → one grouped state machine per key; the
    // watermark column must be a TimestampType — micros map exactly
    left
      .select(col("key"), col("tsUs"), lit(0).as("side"),
        col("leftId"), lit(0L).as("rightId"), lit(0.0).as("value"))
      .unionAll(right.select(col("key"), col("tsUs"), lit(1).as("side"),
        lit(0L).as("leftId"), col("rightId"), col("value")))
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[Tagged]
  }

  /** Enrich `left` with the latest prior-or-equal `right` per key.
    * Both inputs must be streaming Datasets; `watermarkDelay` (e.g.
    * "10 seconds") bounds tolerated disorder in EVENT time and therefore
    * both result latency and state size. */
  def joinPriorOrEqual(left: Dataset[LeftEvent], right: Dataset[RightEvent],
      watermarkDelay: String)(implicit spark: SparkSession): Dataset[AsOfMatch] = {
    import spark.implicits._
    taggedUnion(left, right, watermarkDelay).groupByKey(_.key)
      .flatMapGroupsWithState[BufferState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Tagged], state: GroupState[BufferState]) =>
          val prior = state.getOption.getOrElse(BufferState(Nil, Nil))
          val batch = rows.toList
          val lefts = prior.lefts ++ batch.collect {
            case t if t.side == 0 => (t.tsUs, t.leftId) }
          val rights = prior.rights ++ batch.collect {
            case t if t.side == 1 => (t.tsUs, t.rightId, t.value) }
          // the engine's watermark is milliseconds; anything at or below
          // it in event time is FINAL (sub-ms residue rounds down, which
          // only delays finality, never breaks it). The engine REPORTS
          // 0 ms until the first trigger's watermark update — under the
          // tsUs > 0 contract (scaladoc) no row sits at or below that
          // placeholder, and as defense-in-depth we refuse to treat it
          // as a real horizon anyway (ADVICE r6): with no genuine
          // watermark, nothing finalizes and nothing prunes.
          val wmMs = state.getCurrentWatermarkMs()
          val hasWm = wmMs > 0L
          val wmUs = wmMs * 1000L
          val (ripe, pending) =
            if (hasWm) lefts.partition(_._1 <= wmUs) else (Nil, lefts)
          val out = ripe.sorted.map { case (lts, lid) =>
            val m = rights.filter(_._1 <= lts) match {
              case Nil => None
              case ms => Some(ms.maxBy { case (ts, id, _) => (ts, id) })
            }
            AsOfMatch(key, lts, lid, m.map(_._2), m.map(_._1), m.map(_._3))
          }
          // prune: unresolved rights (> wm) stay; of the resolved ones
          // only the NEWEST can still match a future left — future lefts
          // have ts > wm >= every other resolved right's ts. No real
          // watermark yet ⇒ nothing is provably resolved; keep all.
          val (open, resolved) =
            if (hasWm) rights.partition(_._1 > wmUs) else (rights, Nil)
          val keepRights = open ++ (resolved match {
            case Nil => Nil
            case rs => List(rs.maxBy { case (ts, id, _) => (ts, id) })
          })
          if (pending.isEmpty && keepRights.isEmpty) state.remove()
          else {
            state.update(BufferState(pending, keepRights))
            // wake this key when the watermark passes its oldest pending
            // left even if no new traffic arrives for it (must be set
            // strictly above the current watermark)
            pending.map(_._1).minOption.foreach { ts =>
              state.setTimeoutTimestamp(
                math.max(ts / 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
            }
          }
          out.iterator
      }
  }

  /** Streaming twin of `AsOf.joinFollowing` (VERDICT r6 #4): each left
    * event takes the EARLIEST right with `rightTs >= leftTs` within
    * `toleranceUs`; equal-`rightTs` ties resolve to the smallest
    * `rightId` — the batch operator's forward conventions, so the spec
    * pins stream output against `AsOf.joinFollowing(tolerance = ...)`.
    *
    * The tolerance is REQUIRED here where the batch operator makes it
    * optional: an unbounded forward join can never finalize a left that
    * has no following right — "none arrived yet" is indistinguishable
    * from "none ever will" at every finite watermark. The bound makes
    * the forward direction watermark-friendly:
    *
    *  - a left finalizes EARLY once its earliest in-window candidate is
    *    itself final (`candidateTs <= watermark` — no earlier right can
    *    still arrive into `[leftTs, candidateTs)`), and at the LATEST
    *    once the watermark passes `leftTs + toleranceUs` (every
    *    possible match is then final; none found ⇒ null payload);
    *  - rights prune to `ts > watermark` (could match a future left,
    *    which must arrive with `ts > watermark <= its match`) plus
    *    those at or after the oldest pending left — per-key state is
    *    O(events inside watermark horizon + tolerance window), sized by
    *    disorder and staleness bound, never by stream age. */
  def joinFollowing(left: Dataset[LeftEvent], right: Dataset[RightEvent],
      watermarkDelay: String, toleranceUs: Long)(
      implicit spark: SparkSession): Dataset[AsOfMatch] = {
    import spark.implicits._
    require(toleranceUs >= 0, s"toleranceUs $toleranceUs must be non-negative")
    // saturating: a left near Long.MaxValue must not wrap its deadline
    def deadline(lts: Long): Long =
      try Math.addExact(lts, toleranceUs)
      catch { case _: ArithmeticException => Long.MaxValue }

    taggedUnion(left, right, watermarkDelay).groupByKey(_.key)
      .flatMapGroupsWithState[BufferState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Tagged], state: GroupState[BufferState]) =>
          val prior = state.getOption.getOrElse(BufferState(Nil, Nil))
          val batch = rows.toList
          val lefts = prior.lefts ++ batch.collect {
            case t if t.side == 0 => (t.tsUs, t.leftId) }
          val rights = prior.rights ++ batch.collect {
            case t if t.side == 1 => (t.tsUs, t.rightId, t.value) }
          val wmMs = state.getCurrentWatermarkMs()
          val hasWm = wmMs > 0L // placeholder-0 guard, as prior-or-equal
          val wmUs = wmMs * 1000L
          // the earliest in-window candidate and the instant this left
          // becomes decidable: min(candidateTs, leftTs + tolerance)
          def best(lts: Long): Option[(Long, Long, Double)] =
            rights.filter(r => r._1 >= lts && r._1 <= deadline(lts))
              .minByOption(r => (r._1, r._2))
          def decidableAt(lts: Long): Long =
            best(lts).map(b => math.min(b._1, deadline(lts)))
              .getOrElse(deadline(lts))
          val (ripe, pending) =
            if (hasWm) lefts.partition(l => decidableAt(l._1) <= wmUs)
            else (Nil, lefts)
          val out = ripe.sorted.map { case (lts, lid) =>
            // decidableAt <= wm and candidateTs <= deadline together
            // imply the candidate (when present) is itself final
            val m = best(lts)
            AsOfMatch(key, lts, lid, m.map(_._2), m.map(_._1), m.map(_._3))
          }
          // prune: keep unresolved rights and anything a pending left's
          // window could still need (at or after the oldest pending)
          val minPending = pending.map(_._1).minOption
          val keepRights =
            if (!hasWm) rights
            else rights.filter(r =>
              r._1 > wmUs || minPending.exists(_ <= r._1))
          if (pending.isEmpty && keepRights.isEmpty) state.remove()
          else {
            state.update(BufferState(pending, keepRights))
            // wake at the earliest instant any pending left decides
            pending.map(l => decidableAt(l._1)).minOption.foreach { at =>
              state.setTimeoutTimestamp(
                math.max(at / 1000L + 1L, wmMs + 1L))
            }
          }
          out.iterator
      }
  }

  /** Streaming twin of `AsOf.joinNearest`, completing the family: each
    * left event takes whichever of the latest prior-or-equal and the
    * earliest following right is CLOSER in event time, with the batch
    * operator's exact resolution — a prior match wins distance ties (an
    * equal-ts right is a distance-0 prior match), equal-ts rights
    * resolve to the largest `rightId` on the prior side and the
    * smallest on the following side, and `toleranceUs` bounds the
    * distance on BOTH sides.
    *
    * The tolerance is REQUIRED for the same reason as [[joinFollowing]]:
    * the following half of the candidate window can otherwise never
    * close for a left with no following right. Finality generalizes the
    * forward rule: with a provisional winner at distance `d`, any right
    * that could still BEAT it (strictly closer: `ts ∈ (leftTs−d,
    * leftTs+d)`) or TIE-AFFECT it (equal distance at `leftTs ± d`) has
    * `ts <= leftTs + d` — so a left is decidable once the watermark
    * passes `min(leftTs + d, leftTs + toleranceUs)`: EARLY when a close
    * candidate exists, at its deadline otherwise (no candidate by then
    * ⇒ null payload, also final). Rights prune to
    * `ts > watermark − toleranceUs` (a future left arrives with
    * `ts > watermark` and its prior window reaches back `toleranceUs`)
    * plus those inside the oldest pending left's window — per-key state
    * is O(horizon + tolerance window), as the forward variant. */
  def joinNearest(left: Dataset[LeftEvent], right: Dataset[RightEvent],
      watermarkDelay: String, toleranceUs: Long)(
      implicit spark: SparkSession): Dataset[AsOfMatch] = {
    import spark.implicits._
    require(toleranceUs >= 0, s"toleranceUs $toleranceUs must be non-negative")
    def deadline(lts: Long): Long =
      try Math.addExact(lts, toleranceUs)
      catch { case _: ArithmeticException => Long.MaxValue }
    def floorSub(x: Long, t: Long): Long =
      try Math.subtractExact(x, t)
      catch { case _: ArithmeticException => Long.MinValue }

    taggedUnion(left, right, watermarkDelay).groupByKey(_.key)
      .flatMapGroupsWithState[BufferState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Tagged], state: GroupState[BufferState]) =>
          val prior = state.getOption.getOrElse(BufferState(Nil, Nil))
          val batch = rows.toList
          val lefts = prior.lefts ++ batch.collect {
            case t if t.side == 0 => (t.tsUs, t.leftId) }
          val rights = prior.rights ++ batch.collect {
            case t if t.side == 1 => (t.tsUs, t.rightId, t.value) }
          val wmMs = state.getCurrentWatermarkMs()
          val hasWm = wmMs > 0L // placeholder-0 guard, as prior-or-equal
          val wmUs = wmMs * 1000L
          // both direction candidates under their own tie rules; prior
          // wins distance ties (which also makes an equal-ts right a
          // distance-0 prior match, exactly the batch rule)
          def pick(lts: Long): Option[(Long, Long, Double)] = {
            val back = rights.filter(r =>
                r._1 <= lts && r._1 >= floorSub(lts, toleranceUs))
              .maxByOption(r => (r._1, r._2))
            val fwd = rights.filter(r =>
                r._1 >= lts && r._1 <= deadline(lts))
              .minByOption(r => (r._1, r._2))
            (back, fwd) match {
              case (Some(b), Some(f)) =>
                if (lts - b._1 <= f._1 - lts) Some(b) else Some(f)
              case (b, f) => b.orElse(f)
            }
          }
          def decidableAt(lts: Long): Long =
            pick(lts).map { w =>
              val d = math.abs(w._1 - lts)
              math.min(deadline(lts),
                try Math.addExact(lts, d)
                catch { case _: ArithmeticException => Long.MaxValue })
            }.getOrElse(deadline(lts))
          val (ripe, pending) =
            if (hasWm) lefts.partition(l => decidableAt(l._1) <= wmUs)
            else (Nil, lefts)
          val out = ripe.sorted.map { case (lts, lid) =>
            val m = pick(lts)
            AsOfMatch(key, lts, lid, m.map(_._2), m.map(_._1), m.map(_._3))
          }
          // prune: a right at or below wm − tolerance can never enter a
          // future left's window (future lefts have ts > wm); keep it
          // only while a pending left's window still reaches it
          val minPending = pending.map(_._1).minOption
          val keepRights =
            if (!hasWm) rights
            else rights.filter(r =>
              r._1 > floorSub(wmUs, toleranceUs) ||
                minPending.exists(p => r._1 >= floorSub(p, toleranceUs)))
          if (pending.isEmpty && keepRights.isEmpty) state.remove()
          else {
            state.update(BufferState(pending, keepRights))
            pending.map(l => decidableAt(l._1)).minOption.foreach { at =>
              state.setTimeoutTimestamp(
                math.max(at / 1000L + 1L, wmMs + 1L))
            }
          }
          out.iterator
      }
  }
}
