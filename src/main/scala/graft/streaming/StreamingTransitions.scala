package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch transition matrix
  * ([[graft.operators.Transitions]]) — continuous "what did users do
  * next" over a live event stream, correct under out-of-order arrival:
  * per entity, a transition (from, to) is emitted exactly once for each
  * ADJACENT pair of events under the (event time, id) total order, with
  * adjacency judged only among FINAL events (event time at or below the
  * watermark — no earlier event can still arrive between them).
  *
  * State per entity is the StreamingAsOf discipline: the not-yet-final
  * buffer (bounded by the watermark horizon, never by history) plus ONE
  * resolved event — the newest final one, carried as the chain head so
  * cross-trigger adjacency never tears at micro-batch boundaries.
  * Emission is Append-mode and final (no retractions); keys with no new
  * traffic finalize via EventTimeTimeout. Late rows beyond the
  * watermark are dropped by the engine before user code (the standard
  * lateness contract — size `watermarkDelay` to the source's real
  * disorder). Event-time domain: `tsUs > 0` strictly (the r6 epoch
  * contract shared by every streaming operator here); a reported 0
  * watermark is treated as "none yet".
  *
  * The spec pins stream output ≡ [[graft.operators.Transitions]] pair
  * counts on identical data under disorder, the cross-batch chain
  * head, and the timeout path. Downstream aggregation to the matrix
  * (counts, row totals, ppm) is the batch operator's own algebra over
  * the emitted pairs — counts are a sum monoid, so the streaming form
  * feeds the L71 incremental-agg sink directly. */
object StreamingTransitions {

  final case class Ev(entity: Long, tsUs: Long, eventId: Long,
    eventType: String)
  final case class Transition(entity: Long, fromType: String,
    toType: String)

  private[graft] final case class TaggedEv(entity: Long, tsUs: Long,
    eventId: Long, eventType: String,
    eventTime: java.sql.Timestamp) // the watermark column

  private[graft] final case class ChainState(
    pending: List[(Long, Long, String)], // (ts, id, type) not yet final
    last: Option[(Long, Long, String)])  // newest FINAL event (chain head)

  /** Transitions from a streaming Dataset of events; `watermarkDelay`
    * (e.g. "10 seconds") bounds tolerated event-time disorder and
    * therefore emission latency and state size. */
  def transitions(events: Dataset[Ev], watermarkDelay: String)
      (implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._
    events
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[TaggedEv]
      .groupByKey(_.entity)
      .flatMapGroupsWithState[ChainState, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (entity: Long, rows: Iterator[TaggedEv],
            state: GroupState[ChainState]) =>
          val prior = state.getOption.getOrElse(ChainState(Nil, None))
          val all = prior.pending ++
            rows.map(t => (t.tsUs, t.eventId, t.eventType))
          // 0 ms = the engine's pre-first-update placeholder, never a
          // real horizon (the StreamingAsOf defense-in-depth)
          val wmMs = state.getCurrentWatermarkMs()
          val hasWm = wmMs > 0L
          val wmUs = wmMs * 1000L
          val (ripe, pending) =
            if (hasWm) all.partition(_._1 <= wmUs) else (Nil, all)
          val ordered = ripe.sortBy(e => (e._1, e._2))
          val chain = prior.last.toList ++ ordered
          val out = chain.sliding(2).collect {
            case List(a, b) => Transition(entity, a._3, b._3)
          }.toList
          val newLast = ordered.lastOption.orElse(prior.last)
          if (pending.isEmpty && newLast.isEmpty) state.remove()
          else {
            state.update(ChainState(pending, newLast))
            // wake this key when the watermark passes its oldest
            // pending event even with no new traffic (strictly above
            // the current watermark, the engine's requirement)
            pending.map(_._1).minOption.foreach { ts =>
              state.setTimeoutTimestamp(
                math.max(ts / 1000L + 1L, wmMs + 1L))
            }
          }
          out.iterator
      }
  }
}
