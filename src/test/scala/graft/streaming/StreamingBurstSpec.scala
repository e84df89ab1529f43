package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Burst
import StreamingBurst.Ev

/** Streaming burst twin (r13, the L142 companion). Pins stream ≡ batch
  * grid-window counts under cross-batch disorder, sliding-window
  * multiplicity, the watermark-late drop, and the HONEST relation to
  * the batch event-anchored maximum (grid peak ≤ true sliding peak,
  * equality on an aligned fixture). */
class StreamingBurstSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000L
  private implicit val ss: org.apache.spark.sql.SparkSession = spark

  private def runStream(batches: Seq[Seq[Ev]], windowDur: String,
      slide: String, threshold: Long): Set[(Long, Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val name = s"bw_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = StreamingBurst.windowedCounts(in.toDS(), "2 seconds",
        windowDur, slide, threshold)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) in.addData(b: _*)
        q.processAllAvailable()
      }
      in.addData(Ev(-1L, 5000L * S)); q.processAllAvailable()
      in.addData(Ev(-2L, 5001L * S)); q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
      .filter(col("entity") >= 0L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getLong(3))).toSet
  }

  private def batchSet(evs: Seq[Ev], windowDur: String, slide: String,
      threshold: Long): Set[(Long, Long, Long, Long)] =
    StreamingBurst.batchWindowedCounts(
        evs.toDF("entity", "tsUs"), windowDur, slide, threshold)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getLong(3))).toSet

  test("stream ≡ batch grid counts under cross-batch disorder") {
    // batch 1 holds 0–9 s out of order; batch 2 delivers an 8 s
    // straggler (inside the 2 s watermark of batch 1's 9 s max)
    val b1 = Seq(Ev(1L, 9 * S), Ev(1L, 2 * S), Ev(2L, 3 * S),
      Ev(1L, 7 * S), Ev(2L, 8 * S))
    val b2 = Seq(Ev(1L, 8 * S), Ev(2L, 14 * S), Ev(1L, 15 * S))
    val all = b1 ++ b2
    val got = runStream(Seq(b1, b2), "5 seconds", "5 seconds", 3L)
    assert(got === batchSet(all, "5 seconds", "5 seconds", 3L))
    // the burst window [5, 10) for entity 1 holds {7, 8, 9} -> flagged
    assert(got.contains((1L, 5000L, 3L, 1L)))
  }

  test("sliding windows: each event is counted by every covering window") {
    val evs = Seq(Ev(1L, 10 * S))
    val got = runStream(Seq(evs), "6 seconds", "2 seconds", 99L)
    // a 6 s window sliding by 2 s covers t=10 s three times
    assert(got === Set((1L, 6000L, 1L, 0L), (1L, 8000L, 1L, 0L),
      (1L, 10000L, 1L, 0L)))
  }

  test("rows later than the watermark drop from closed windows") {
    val b1 = Seq(Ev(1L, 2 * S), Ev(1L, 3 * S))
    val advance = Seq(Ev(2L, 100 * S))
    val late = Seq(Ev(1L, 4 * S)) // window [0,5) closed long ago
    val got = runStream(Seq(b1, advance, advance.map(e =>
      e.copy(tsUs = e.tsUs + S)), late), "5 seconds", "5 seconds", 3L)
    assert(got.contains((1L, 0L, 2L, 0L)),
      s"closed window must hold only on-time rows: $got")
    assert(!got.contains((1L, 0L, 3L, 1L)))
  }

  test("honest relation: grid peak ≤ batch event-anchored peak; " +
      "equality when the burst aligns to the grid") {
    val aligned = Seq(10L, 11L, 12L, 13L).map(t => Ev(1L, t * S))
    val straddle = Seq(12L, 13L, 14L, 15L).map(t => Ev(1L, t * S))
    def gridPeak(evs: Seq[Ev]) =
      batchSet(evs, "5 seconds", "5 seconds", 99L).map(_._3).max
    def truePeak(evs: Seq[Ev]) = Burst.slidingPeak(
      evs.toDF("entity", "tsUs"), "entity", col("tsUs"), 5L * S, 99L)
      .collect().head.getLong(2)
    assert(gridPeak(aligned) === 4L && truePeak(aligned) === 4L)
    assert(gridPeak(straddle) === 3L && truePeak(straddle) === 4L,
      "a straddling burst reads lower on the grid — the documented gap")
  }
}
