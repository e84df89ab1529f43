package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.BlocklistScan
import StreamingBlocklist.{Doc, DocHits}

/** The streaming blocklist twin must reproduce the batch Aho–Corasick
  * scan row-for-row on identical data — cross-batch disorder included
  * (the scan is stateless, so it commutes with any micro-batch split) —
  * and its windowed totals must match the batch window aggregation with
  * watermark-late rows dropped. */
class StreamingBlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000L // 1 second in micros
  private implicit val ss: org.apache.spark.sql.SparkSession = spark

  private val patterns = Seq("he", "she", "his", "hers")

  private def runScan(batches: Seq[Seq[Doc]]): Seq[DocHits] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Doc]
    val name = s"bl_scan_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = StreamingBlocklist.scan(in.toDS(), patterns)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[DocHits].collect().toSeq
  }

  private def batchScan(docs: Seq[Doc]): Map[Long, (Long, Long)] =
    BlocklistScan.scan(docs.toDF("doc_id", "ts_us", "text"),
        "doc_id", "text", patterns)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("the classic AC fixture streams identically to batch: 'ushers'") {
    // "ushers": she@2, he@3, hers@3 -> 3 hits, 3 distinct patterns
    val got = runScan(Seq(Seq(Doc(1L, 1 * S, "ushers"))))
    assert(got === Seq(DocHits(1L, 1 * S, 3L, 3L)))
    assert(batchScan(Seq(Doc(1L, 1 * S, "ushers")))(1L) === ((3L, 3L)))
  }

  test("stream ≡ batch row-for-row on a seeded disordered multi-batch run") {
    val rnd = new scala.util.Random(29)
    val words = Vector("he", "she", "hers", "his", "ushers", "x", "hishe")
    val docs = (0 until 60).map { i =>
      Doc(i.toLong, (1 + rnd.nextInt(50)).toLong * S,
        Seq.fill(1 + rnd.nextInt(6))(words(rnd.nextInt(words.size)))
          .mkString(" "))
    }
    // shuffled 3-way split: arrival order and batch boundaries carry
    // no information for a stateless scan — pin it
    val shuffled = rnd.shuffle(docs)
    val batches = shuffled.grouped(20).toSeq
    val got = runScan(batches).map(d => d.docId -> (d.nHits, d.nPatterns))
      .toMap
    assert(got === batchScan(docs))
  }

  test("windowed totals ≡ batch window aggregation under disorder") {
    val docs = Seq(
      Doc(1L, 2 * S, "she sells"), Doc(2L, 8 * S, "his x"),
      Doc(3L, 4 * S, "nothing"), Doc(4L, 12 * S, "ushers"),
      Doc(5L, 3 * S, "he he"), Doc(6L, 14 * S, "plain"),
      Doc(7L, 7 * S, "hers y"))
    // batch 1 internally out of order; batch 2 continues AND delivers a
    // 7 s straggler across the batch boundary — inside the watermark
    // (post-batch-1 horizon is 8 − 2 = 6 s), so it must land in its
    // event-time window; flush rows then finalize every real window
    val flush = Seq(Doc(-1L, 1000L * S, "x"), Doc(-2L, 2000L * S, "x"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Doc]
    val name = s"bl_win_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = StreamingBlocklist.windowedHits(in.toDS(), patterns,
        "2 seconds", "5 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      Seq(Seq(docs(1), docs(0), docs(4), docs(2)),
          Seq(docs(3), docs(6), docs(5)),
          flush.take(1), flush.drop(1))
        .foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table(name)
      .filter(col("window_start") < timestamp_micros(lit(500L * S)))
      .collect()
      .map(r => (r.getTimestamp(0).getTime / 1000L, r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    // batch twin: same scan, same tumbling windows, replayed exactly
    val scanned = docs.map { d =>
      val hits = batchScan(docs)(d.docId)
      (d.tsUs / S / 5 * 5, hits._1, hits._2)
    }
    val expected = scanned.groupBy(_._1).map { case (w, rs) =>
      (w, rs.size.toLong, rs.map(_._2).sum,
        rs.count(_._3 > 0).toLong)
    }.toSet
    assert(got === expected)
  }

  test("rows later than the watermark are dropped, not re-windowed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Doc]
    val name = s"bl_late_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = StreamingBlocklist.windowedHits(in.toDS(), patterns,
        "2 seconds", "5 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(Doc(1L, 2 * S, "he")); q.processAllAvailable()
      // advance the watermark far past window [0, 5)
      in.addData(Doc(-1L, 100 * S, "x")); q.processAllAvailable()
      in.addData(Doc(-2L, 101 * S, "x")); q.processAllAvailable()
      // a straggler for the long-closed first window: must vanish
      in.addData(Doc(2L, 3 * S, "she she she")); q.processAllAvailable()
      in.addData(Doc(-3L, 200 * S, "x")); q.processAllAvailable()
      in.addData(Doc(-4L, 201 * S, "x")); q.processAllAvailable()
    } finally q.stop()
    val firstWindow = spark.table(name)
      .filter(col("window_start") === timestamp_micros(lit(0L)))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(firstWindow.toSeq === Seq((1L, 1L, 1L)),
      s"closed window must hold only the on-time doc, got " +
        firstWindow.mkString(","))
  }
}
