package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Transitions
import StreamingTransitions.{Ev, Transition}

/** The streaming transition emitter must reproduce, pair for pair, the
  * batch matrix's adjacency on identical data — disorder inside the
  * watermark, cross-batch chain heads and timeout-driven finalization
  * included. */
class StreamingTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000L // 1 second in micros

  private def runStream(batches: Seq[Seq[Ev]],
      delay: String = "2 seconds"): Seq[Transition] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val in = MemoryStream[Ev]
    val q = StreamingTransitions.transitions(in.toDS(), delay)
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) in.addData(b: _*)
        q.processAllAvailable()
      }
      // flush entity -1 advances the global watermark so pending keys
      // finalize via EventTimeTimeout (two passes — a batch uses the
      // watermark computed after the PREVIOUS one)
      in.addData(Ev(-1L, 1000000L * S, -1L, "x"))
      q.processAllAvailable()
      in.addData(Ev(-1L, 1000001L * S, -2L, "x"))
      q.processAllAvailable()
    } finally q.stop()
    spark.table("trans_out").as[Transition].collect().toSeq
      .filterNot(_.entity == -1L)
  }

  private def batchPairs(evs: Seq[Ev]): Seq[(Long, String, String)] =
    Transitions.matrix(
        evs.toDF("user_id", "us", "event_id", "et"),
        "user_id", col("us"), "event_id", "et")
      .collect().flatMap(r => Seq.fill(r.getLong(2).toInt)(
        (0L, r.getString(0), r.getString(1)))).toSeq
  // batch matrix loses the entity; compare per-PAIR multisets instead
  private def pairBag(ts: Seq[(String, String)]): Map[(String, String), Int] =
    ts.groupBy(identity).view.mapValues(_.size).toMap

  test("in-order single entity: the chain emits every adjacent pair once") {
    val evs = Seq(Ev(1L, 1 * S, 1L, "a"), Ev(1L, 2 * S, 2L, "b"),
      Ev(1L, 3 * S, 3L, "a"), Ev(1L, 4 * S, 4L, "c"))
    val got = runStream(Seq(evs))
    assert(got.map(t => (t.fromType, t.toType)) ===
      Seq(("a", "b"), ("b", "a"), ("a", "c")))
  }

  test("disorder inside the watermark sorts out; chain heads survive " +
      "micro-batch boundaries") {
    // batch 1 delivers t=2 before t=1 (disorder), batch 2 continues the
    // same entity — the cross-batch pair (b@2 -> c@10) must emit even
    // though b finalized in an earlier trigger
    val b1 = Seq(Ev(1L, 2 * S, 2L, "b"), Ev(1L, 1 * S, 1L, "a"))
    val b2 = Seq(Ev(1L, 10 * S, 3L, "c"), Ev(1L, 11 * S, 4L, "d"))
    val got = runStream(Seq(b1, b2))
    assert(got.map(t => (t.fromType, t.toType)) ===
      Seq(("a", "b"), ("b", "c"), ("c", "d")))
  }

  test("stream ≡ batch pair multiset on a seeded disordered stream") {
    val rnd = new scala.util.Random(83)
    val types = Vector("v", "w", "x", "y")
    val evs = (0 until 120).map { i =>
      Ev((i % 5).toLong, (1 + rnd.nextInt(60)).toLong * S, i.toLong,
        types(rnd.nextInt(types.size)))
    }
    // deliver in 4 shuffled batches; disorder within a batch is
    // unbounded, across batches bounded by the generous delay
    val batches = rnd.shuffle(evs).grouped(30).toSeq
    val got = runStream(batches, delay = "120 seconds")
    val want = batchPairs(evs).map(p => (p._2, p._3))
    assert(pairBag(got.map(t => (t.fromType, t.toType))) === pairBag(want))
  }

  test("a timestamp tie orders by event id, same as batch") {
    val evs = Seq(Ev(1L, 5 * S, 2L, "b"), Ev(1L, 5 * S, 1L, "a"),
      Ev(1L, 5 * S, 3L, "c"))
    val got = runStream(Seq(evs))
    assert(got.map(t => (t.fromType, t.toType)) ===
      Seq(("a", "b"), ("b", "c")))
  }
}
