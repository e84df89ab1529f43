package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

import graft.operators.IdempotentAppend

/** Streaming execution mode of the same batch operators (SURVEY.md §2 G:
  * the reference is batch-only, but its semantics map 1:1 onto Structured
  * Streaming — re-runnable windows = batch reprocessing, the idempotent
  * sink = an exactly-once sink contract, `ingested_at_utc` =
  * processing time). Everything here reuses the batch operators — the
  * logical plan is the same; only the source/sink run incrementally.
  *
  * Scale notes: the windowed aggregation is the standard
  * watermark + tumbling-window partial-agg pattern (state store bounded by
  * the watermark horizon); the dedup state in [[dedupByKeyStateful]] is
  * per-key and evicted by processing-time timeout, so state size is
  * O(active keys in the horizon), not O(stream history). */
object StreamingIngest {

  /** Tumbling-window event counts/sums with a watermark — the streaming
    * form of A6 (multi-key groupBy agg). `events` needs an event-time
    * column `ts` (TimestampType) and a `value` column. */
  def windowedActivity(events: DataFrame, windowDur: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total"))

  /** Hopping-window event aggregation — the continuous form of the batch
    * [[graft.operators.TimeWindows.hopping]] (L68): overlapping windows
    * of `windowDur` opening every `slideDur`, each event folded into
    * width/slide window states incrementally; a window's row is emitted
    * (append mode) once the watermark passes its end. Same bounded-state
    * discipline as the tumbling form — the state store holds the
    * watermark horizon's open windows × groups, not stream history;
    * the overlap factor multiplies state rows, not events retained.
    * `StreamingIngestSpec` pins stream ≡ batch under disorder. */
  def hoppingActivity(events: DataFrame, windowDur: String,
      slideDur: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Streaming sessionization — the continuous form of the batch
    * `Sessions` operator (L20): Spark's built-in `session_window` merges
    * events into gap-separated sessions incrementally, closing a session
    * once the watermark passes its end + gap. State is O(open sessions
    * inside the watermark horizon), not O(stream history) — the same
    * bounded-state discipline as the windowed aggregation above. Batch
    * and streaming answer the same question; only the session id differs
    * (batch: per-entity ordinal; streaming: the [start,end) interval). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Windowed heavy hitters — the streaming twin of L53's semantic
    * restricted to an event-time window: keys whose occurrence count
    * within a tumbling window reaches `minCount` (trending tokens /
    * hot domains per window). Exact per window — streaming state plays
    * the screen's role and the watermark bounds it to the horizon;
    * append mode emits each window's final answer exactly once when the
    * watermark closes it, so the output is the batch
    * `GROUP BY window, key HAVING count >= T` row for row
    * (stream ≡ batch over NON-NULL event times, pinned in spec with
    * disorder). `occurrences` needs an event-time `ts` (TimestampType)
    * column; null-ts rows are dropped up front — a null window can
    * never be closed by the watermark, so it would otherwise pin a
    * state-store row forever and never emit (review-caught). */
  def windowedHeavyHitters(occurrences: DataFrame, keyCol: String,
      minCount: Long, windowDur: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame = {
    require(minCount > 0, s"minCount $minCount must be positive")
    occurrences
      .filter(col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))
  }

  /** Exactly-once-style sink: every micro-batch goes through the SAME
    * IdempotentAppend protocol as the batch path (J3) via foreachBatch —
    * a replayed micro-batch inserts 0, which is precisely the reference's
    * re-run contract (README.md:176-187) applied per trigger. */
  def idempotentSink(stream: DataFrame, sinkPath: String, key: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val inserted = IdempotentAppend.toParquet(batch, sinkPath, key)
        batch.sparkSession.sparkContext.setJobDescription(
          s"micro-batch $batchId inserted $inserted")
        ()
      }

  /** The per-batch step of [[incrementalAggSink]], exposed for replay
    * testing: fold `batch` into the versioned partial-table directory.
    * Version `v<batchId>` is derived ONLY from `v<batchId−1>` (the
    * highest version BELOW this batch) plus this batch's rows, and is
    * overwritten whole — so a redelivered micro-batch recomputes the
    * identical version instead of double-counting, which is the
    * exactly-once effect without a transactional sink. */
  private[streaming] def mergeAggBatch(batch: DataFrame, dir: String,
      groupCols: Seq[String], valueCol: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val prevId = {
      val base = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(base)) None
      else fs.listStatus(base).toSeq
        .map(_.getPath.getName).filter(_.startsWith("v"))
        .flatMap(n => scala.util.Try(n.drop(1).toLong).toOption)
        .filter(_ < batchId).sorted.lastOption
    }
    val p = graft.operators.IncrementalAgg.partials(batch, groupCols, valueCol)
    val merged = prevId match {
      case Some(id) => graft.operators.IncrementalAgg.merge(
        spark.read.parquet(s"$dir/v$id"), p, groupCols)
      case None => p
    }
    merged.write.mode("overwrite").parquet(s"$dir/v$batchId")
  }

  /** Streaming form of L71's incremental aggregate maintenance: each
    * micro-batch folds into a VERSIONED partial-aggregate table
    * (`<dir>/v<batchId>`) via [[graft.operators.IncrementalAgg]]'s
    * monoid merge — the history is never rescanned, the latest version
    * is always a complete report, and batch replay is idempotent by
    * construction (see [[mergeAggBatch]]). Reading side: pick the
    * highest `v*` directory. */
  def incrementalAggSink(stream: DataFrame, dir: String,
      groupCols: Seq[String], valueCol: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeAggBatch(batch, dir, groupCols, valueCol, batchId)
      }

  /** Seen-key state for streaming dedup. */
  final case class SeenState(firstSeenMs: Long, count: Long)
  /** One output row per key per batch-with-news: first occurrence flag +
    * running duplicate count. */
  final case class KeyedEvent(key: String, tsMs: Long)
  final case class DedupResult(key: String, isFirst: Boolean, dupCount: Long)

  /** Streaming dedup-across-batches (J1 as continuous state):
    * `flatMapGroupsWithState` keeps one [[SeenState]] per key; a key's
    * first event emits isFirst=true, later ones bump dupCount. The
    * output contract is strict: one row per key per batch-with-news and
    * NOTHING else — in particular a timeout eviction emits NO row (a
    * timer firing is not an observation; a phantom `isFirst=false` row
    * would be indistinguishable from a real duplicate downstream).
    *
    * `idleTimeout = Some(d)` (the production default) evicts idle keys by
    * processing-time timeout so state stays bounded — at 100 TB/day the
    * horizon, not history, sizes the state store. A key re-arriving
    * AFTER its eviction re-reports isFirst=true with a fresh count —
    * bounded state trades exactly this: dedup memory spans the idle
    * horizon, not all history. Pass None for bounded test corpora: with
    * a processing-time timeout the engine re-triggers micro-batches
    * forever to check timers, which keeps `processAllAvailable` from
    * ever observing quiescence. */
  def dedupByKeyStateful(events: Dataset[KeyedEvent],
      idleTimeout: Option[String] = Some("10 minutes"))
      (implicit spark: SparkSession): Dataset[DedupResult] = {
    import spark.implicits._
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events.groupByKey(_.key)
      .flatMapGroupsWithState[SeenState, DedupResult](
        OutputMode.Update, timeoutConf) {
        (key: String, rows: Iterator[KeyedEvent], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val prior = state.getOption
            val first = prior.isEmpty
            val s = SeenState(
              prior.map(_.firstSeenMs).getOrElse(batch.map(_.tsMs).min),
              prior.map(_.count).getOrElse(0L) + batch.size)
            state.update(s)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single(DedupResult(key, first, s.count))
          }
      }
  }

  /** File-source stream over an events directory — readStream analog of the
    * batch Tables loader (schema must be explicit for streaming reads). */
  def eventsFileStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)
}
