package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamingIngest._

/** Streaming mode of the batch operators: windowed agg with watermark,
  * exactly-once sink via the J3 protocol per micro-batch, stateful dedup. */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed aggregation with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = windowedActivity(events, "1 minute", "2 minutes")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("update").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:10"), "click", 1.0),
        (ts("2024-01-01 10:00:40"), "click", 2.0),
        (ts("2024-01-01 10:01:10"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .select("event_type", "n", "total").as[(String, Long, Double)]
        .collect().toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("session windows merge gap-separated events incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val q = sessionWindows(events, gap = "10 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:05:00"), 1L), // +5 min  -> same session
        (ts("2024-01-01 10:30:00"), 1L), // +25 min -> new session
        (ts("2024-01-01 10:00:00"), 2L))
      q.processAllAvailable()
      val rows = spark.table("sess_win")
        .select("user_id", "session_start", "n_events")
        .as[(Long, Timestamp, Long)].collect().toSet
      assert(rows == Set(
        (1L, ts("2024-01-01 10:00:00"), 2L),
        (1L, ts("2024-01-01 10:30:00"), 1L),
        (2L, ts("2024-01-01 10:00:00"), 1L)))
      // session extent = last event + gap (session_window semantics)
      val end = spark.table("sess_win")
        .filter(col("user_id") === 1L &&
          col("session_start") === ts("2024-01-01 10:00:00"))
        .select("session_end").as[Timestamp].head()
      assert(end == ts("2024-01-01 10:15:00"))
    } finally q.stop()
  }

  test("foreachBatch idempotent sink: replayed batch inserts 0 (exactly-once)") {
    implicit val sqlCtx = spark.sqlContext
    val sink = tmpDir("stream_sink")
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("id", "v")
    val q = idempotentSink(stream, sink, "id").start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      // same keys again in a later micro-batch — the J3 contract: 0 inserted
      input.addData((1L, "a2"), (2L, "b2"), (3L, "c"))
      q.processAllAvailable()
      val rows = spark.read.parquet(sink).orderBy("id")
        .as[(Long, String)].collect().toSeq
      assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("mapGroupsWithState dedup: first occurrence flagged, dups counted") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val input = MemoryStream[KeyedEvent]
    val q = dedupByKeyStateful(input.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("dedup_state")
      .outputMode("update").start()
    try {
      input.addData(KeyedEvent("a", 1000), KeyedEvent("a", 2000),
        KeyedEvent("b", 1500))
      q.processAllAvailable()
      input.addData(KeyedEvent("a", 3000))
      q.processAllAvailable()
      val rows = spark.table("dedup_state")
        .as[DedupResult].collect()
      val aRows = rows.filter(_.key == "a").sortBy(_.dupCount)
      assert(aRows.head.isFirst && aRows.head.dupCount == 2)  // batch 1: 2 events
      assert(!aRows.last.isFirst && aRows.last.dupCount == 3) // batch 2: +1
      assert(rows.filter(_.key == "b").forall(r => r.isFirst && r.dupCount == 1))
    } finally q.stop()
  }

  test("file-source stream reads the events table incrementally") {
    val src = tmpDir("stream_src")
    spark.read.parquet(s"$sf0001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .limit(100).write.parquet(src)
    val stream = eventsFileStream(spark, src)
    assert(stream.isStreaming)
    val q = stream.groupBy(col("event_type")).count()
      .writeStream.format("memory").queryName("file_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("file_stream").agg(sum("count")).head.getLong(0) == 100)
    } finally q.stop()
  }

  test("incremental agg sink: versioned merge == direct recompute; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incagg")
      .toString + "/table"
    val input = MemoryStream[(String, Double)]
    val q = incrementalAggSink(input.toDF().toDF("g", "v"), dir,
      Seq("g"), "v").start()
    val b1 = Seq(("a", 1.0), ("a", 2.5), ("b", 4.0))
    val b2 = Seq(("a", 3.0), ("c", 0.5))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    def latest() = {
      val vs = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.startsWith("v")).map(_.drop(1).toLong)
      spark.read.parquet(s"$dir/v${vs.max}")
    }
    def norm(df: org.apache.spark.sql.DataFrame) = df.orderBy(col("g"))
      .as[(String, Long, BigDecimal, BigDecimal, BigDecimal)]
      .collect().toSeq
    val direct = graft.operators.IncrementalAgg.partials(
      (b1 ++ b2).toDF("g", "v"), Seq("g"), "v")
    assert(norm(latest()) === norm(direct))
    // redelivered micro-batch: recomputes its version from v0 — the
    // final table is unchanged, not double-counted
    mergeAggBatch(b2.toDF("g", "v"), dir, Seq("g"), "v", batchId = 1L)
    assert(norm(latest()) === norm(direct))
  }

  test("hopping windows: stream (append, disorder) == batch TimeWindows.hopping") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = hoppingActivity(events, "1 minute", "30 seconds",
        watermark = "1 minute")
      .writeStream.format("memory").queryName("hop_stream")
      .outputMode("append").start()
    val data = Seq(
      (ts("2024-01-01 10:00:40"), "click", 2.0), // out of order...
      (ts("2024-01-01 10:00:10"), "click", 1.0), // ...within the horizon
      (ts("2024-01-01 10:01:05"), "view", 5.0),
      (ts("2024-01-01 10:01:20"), "click", 3.0))
    val late = (ts("2024-01-01 10:01:40"), "view", 7.0)
    val sentinel = (ts("2024-01-01 10:30:00"), "z", 0.0)
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      input.addData(late) // late but inside the watermark horizon
      q.processAllAvailable()
      input.addData(sentinel) // advance the watermark: close everything
      q.processAllAvailable()
      val cutoff = ts("2024-01-01 10:10:00")
      val got = spark.table("hop_stream")
        .filter(col("window_start") < cutoff)
        .select(unix_micros(col("window_start")), col("event_type"),
          col("n"), col("total"))
        .as[(Long, String, Long, Double)].collect().toSet
      // the batch operator over the same rows (sentinel excluded by the
      // same cutoff): overlap factor 2, identical window grid
      val all = (data :+ late).toDF("ts", "event_type", "value")
      val want = graft.operators.TimeWindows.hopping(all,
          unix_micros(col("ts")), 60000000L, 30000000L,
          Seq("event_type"),
          Seq(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total")))
        .filter(col("window_start_us") < unix_micros(lit(cutoff)))
        .select(col("window_start_us"), col("event_type"), col("n"),
          col("total"))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(want.nonEmpty && got === want, s"stream $got != batch $want")
      // the overlap is real: some event contributes to 2 emitted windows
      assert(got.toSeq.map(_._3).sum > (data :+ late).size)
    } finally q.stop()
  }

  test("windowed heavy hitters: stream (append, disorder) == batch HAVING") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val occ = input.toDF().toDF("ts", "k")
    val q = windowedHeavyHitters(occ, "k", minCount = 2,
        windowDur = "1 minute", watermark = "1 minute")
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("append").start()
    try {
      // batch 1: two windows, out-of-order within the watermark
      input.addData(
        (ts("2024-01-01 10:00:40"), "a"),
        (ts("2024-01-01 10:00:10"), "a"),
        (ts("2024-01-01 10:00:20"), "b"), // below threshold in w0
        (ts("2024-01-01 10:01:05"), "b"))
      q.processAllAvailable()
      // batch 2: late-but-in-horizon b lands back in w1, then advance
      // the watermark far enough to close both windows
      input.addData(
        (ts("2024-01-01 10:01:50"), "b"),
        (ts("2024-01-01 10:05:00"), "z"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:10:00"), "z"))
      q.processAllAvailable()
      val got = spark.table("hh_stream")
        .select("window_start", "k", "n").as[(Timestamp, String, Long)]
        .collect().toSet
      // the batch answer over the same rows
      val rows = Seq(
        (ts("2024-01-01 10:00:40"), "a"), (ts("2024-01-01 10:00:10"), "a"),
        (ts("2024-01-01 10:00:20"), "b"), (ts("2024-01-01 10:01:05"), "b"),
        (ts("2024-01-01 10:01:50"), "b"), (ts("2024-01-01 10:05:00"), "z"),
        (ts("2024-01-01 10:10:00"), "z")).toDF("ts", "k")
      val want = rows.groupBy(window(col("ts"), "1 minute"), col("k"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
        .select(col("window.start"), col("k"), col("n"))
        .as[(Timestamp, String, Long)].collect().toSet
      assert(want.nonEmpty && got === want,
        s"stream $got != batch $want")
    } finally q.stop()
  }
}
