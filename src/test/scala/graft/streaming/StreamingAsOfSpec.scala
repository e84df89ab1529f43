package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOf
import StreamingAsOf.{AsOfMatch, LeftEvent, RightEvent}

/** The streaming as-of join must emit, per left event, exactly the batch
  * operator's answer — out-of-order arrival, cross-batch timelines and
  * watermark-driven (timeout) emission included. */
class StreamingAsOfSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000L // 1 second in micros

  private def runStream(
      batches: Seq[(Seq[LeftEvent], Seq[RightEvent])],
      delay: String = "2 seconds"): Seq[AsOfMatch] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val lIn = MemoryStream[LeftEvent]
    val rIn = MemoryStream[RightEvent]
    val out = StreamingAsOf.joinPriorOrEqual(lIn.toDS(), rIn.toDS(), delay)
    val q = out.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      batches.foreach { case (ls, rs) =>
        if (ls.nonEmpty) lIn.addData(ls: _*)
        if (rs.nonEmpty) rIn.addData(rs: _*)
        q.processAllAvailable()
      }
      // flush: a far-future dummy event advances the GLOBAL watermark so
      // every pending left resolves via its key's EventTimeTimeout (the
      // pending keys receive NO new data in these batches — two passes
      // because the watermark used by a batch is the one computed after
      // the PREVIOUS batch)
      lIn.addData(LeftEvent("__flush", 1000000L * S, -1L))
      q.processAllAvailable()
      lIn.addData(LeftEvent("__flush", 1000001L * S, -2L))
      q.processAllAvailable()
    } finally q.stop()
    spark.table("asof_out").as[AsOfMatch].collect().toSeq
      .filterNot(_.key == "__flush")
  }

  private def batchReference(ls: Seq[LeftEvent],
      rs: Seq[RightEvent]): Set[AsOfMatch] = {
    val lDf = ls.toDF()
    // the matched right TIMESTAMP rides as an ordinary payload copy (the
    // batch operator consumes `rts` as the join time, not as output)
    val rDf = rs.toDS()
      .select(col("key"), col("tsUs").as("rts"), col("rightId"),
        col("tsUs").as("rightTsUs"), col("value"))
    AsOf.joinPriorOrEqual(lDf, rDf, Seq("key"), "tsUs", "rts",
        tieBreak = "rightId", autoChunk = false)
      .select(col("key"), col("tsUs"), col("leftId"), col("rightId"),
        col("rightTsUs"), col("value"))
      .as[AsOfMatch].collect().toSet
  }

  /** Forward-direction harness: same shape as [[runStream]] but through
    * `joinFollowing` with a required tolerance; the watermark flush rides
    * RIGHT events so no pending flush-left lingers in state. `flush`
    * can be disabled to observe EARLY finalization (before the
    * watermark reaches any left's deadline). */
  private def runStreamF(
      batches: Seq[(Seq[LeftEvent], Seq[RightEvent])], tolUs: Long,
      delay: String = "2 seconds", flush: Boolean = true): Seq[AsOfMatch] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val lIn = MemoryStream[LeftEvent]
    val rIn = MemoryStream[RightEvent]
    val out = StreamingAsOf.joinFollowing(lIn.toDS(), rIn.toDS(), delay, tolUs)
    val q = out.writeStream.format("memory").queryName("asof_fwd_out")
      .outputMode("append").start()
    try {
      batches.foreach { case (ls, rs) =>
        if (ls.nonEmpty) lIn.addData(ls: _*)
        if (rs.nonEmpty) rIn.addData(rs: _*)
        q.processAllAvailable()
      }
      if (flush) {
        rIn.addData(RightEvent("__flush", 2000000L * S, -1L, 0.0))
        q.processAllAvailable()
        rIn.addData(RightEvent("__flush", 2000001L * S, -2L, 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table("asof_fwd_out").as[AsOfMatch].collect().toSeq
      .filterNot(_.key == "__flush")
  }

  private def batchReferenceF(ls: Seq[LeftEvent], rs: Seq[RightEvent],
      tolUs: Long): Set[AsOfMatch] = {
    val lDf = ls.toDF()
    val rDf = rs.toDS()
      .select(col("key"), col("tsUs").as("rts"), col("rightId"),
        col("tsUs").as("rightTsUs"), col("value"))
    AsOf.joinFollowing(lDf, rDf, Seq("key"), "tsUs", "rts",
        tieBreak = "rightId", tolerance = Some(tolUs), autoChunk = false)
      .select(col("key"), col("tsUs"), col("leftId"), col("rightId"),
        col("rightTsUs"), col("value"))
      .as[AsOfMatch].collect().toSet
  }

  test("following: stream equals the batch forward as-of under disorder and tolerance nulls") {
    val tol = 8 * S
    val b1l = Seq(LeftEvent("a", 5 * S, 1), // right at 7s follows, in window
      LeftEvent("b", 6 * S, 2)) // nearest following right is 20s away → null
    val b1r = Seq(RightEvent("a", 7 * S, 100, 1.5),
      RightEvent("a", 7 * S, 101, 2.5)) // equal-ts: SMALLEST id wins forward
    val b2l = Seq(LeftEvent("a", 9 * S, 3)) // matches the 9s right exactly (>=)
    val b2r = Seq(RightEvent("a", 9 * S, 102, 3.5),
      RightEvent("b", 26 * S, 200, 9.0)) // 20s after left b: outside tol
    val got = runStreamF(Seq((b1l, b1r), (b2l, b2r)), tol, delay = "30 seconds")
    assert(got.size === got.map(_.leftId).distinct.size, "exactly-once per left")
    val byId = got.map(m => m.leftId -> m).toMap
    assert(byId(1).rightId === Some(100L), s"equal-ts forward tie → smallest id: $got")
    assert(byId(2).rightId === None, s"outside tolerance → null: $got")
    assert(got.toSet === batchReferenceF(b1l ++ b2l, b1r ++ b2r, tol))
  }

  test("following: a left finalizes EARLY once its candidate is final, not at its deadline") {
    // tolerance 1000s — if the implementation waited for the deadline,
    // nothing could emit here (the watermark never gets past 26s); the
    // left must resolve as soon as the watermark passes its 12s
    // candidate, proving the min(candidateTs, deadline) rule
    val tol = 1000 * S
    val batches = Seq(
      (Seq(LeftEvent("a", 10 * S, 1)), Seq(RightEvent("a", 12 * S, 100, 7.0))),
      (Nil, Seq(RightEvent("z", 30 * S, 900, 0.0))), // advance wm to 25s
      (Nil, Seq(RightEvent("z", 31 * S, 901, 0.0)))) // trigger a's timeout
    val got = runStreamF(batches, tol, delay = "5 seconds", flush = false)
      .filterNot(_.key == "z")
    assert(got.map(m => (m.leftId, m.rightId)) === Seq((1L, Some(100L))),
      s"candidate-final left must emit before its deadline: $got")
  }

  test("following: randomized stream == batch on a seeded multi-key timeline") {
    val rnd = new scala.util.Random(131)
    val keys = Seq("k1", "k2", "k3")
    var lid = 0L
    var rid = 1000L
    val batches = (1 to 5).map { b =>
      val ls = Seq.fill(rnd.nextInt(5)) {
        lid += 1
        LeftEvent(keys(rnd.nextInt(3)), (b * 10 + rnd.nextInt(10)) * S, lid)
      }
      val rs = Seq.fill(rnd.nextInt(5)) {
        rid += 1
        RightEvent(keys(rnd.nextInt(3)), (b * 10 + rnd.nextInt(10) - 3) * S,
          rid, rnd.nextDouble())
      }
      (ls, rs)
    }
    val tol = 7 * S // some lefts match, some null — both paths exercised
    val got = runStreamF(batches, tol, delay = "15 seconds")
    val allL = batches.flatMap(_._1)
    val allR = batches.flatMap(_._2)
    assert(got.size === allL.size, s"every left resolves exactly once: $got")
    assert(got.toSet === batchReferenceF(allL, allR, tol))
  }

  /** Nearest harness: same flush-by-rights shape as [[runStreamF]] (a
    * nearest left with no in-window right finalizes at its deadline,
    * which the advancing watermark reaches). */
  private def runStreamN(
      batches: Seq[(Seq[LeftEvent], Seq[RightEvent])], tolUs: Long,
      delay: String = "2 seconds", flush: Boolean = true): Seq[AsOfMatch] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val lIn = MemoryStream[LeftEvent]
    val rIn = MemoryStream[RightEvent]
    val out = StreamingAsOf.joinNearest(lIn.toDS(), rIn.toDS(), delay, tolUs)
    val q = out.writeStream.format("memory").queryName("asof_near_out")
      .outputMode("append").start()
    try {
      batches.foreach { case (ls, rs) =>
        if (ls.nonEmpty) lIn.addData(ls: _*)
        if (rs.nonEmpty) rIn.addData(rs: _*)
        q.processAllAvailable()
      }
      if (flush) {
        rIn.addData(RightEvent("__flush", 2000000L * S, -1L, 0.0))
        q.processAllAvailable()
        rIn.addData(RightEvent("__flush", 2000001L * S, -2L, 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table("asof_near_out").as[AsOfMatch].collect().toSeq
      .filterNot(_.key == "__flush")
  }

  private def batchReferenceN(ls: Seq[LeftEvent], rs: Seq[RightEvent],
      tolUs: Long): Set[AsOfMatch] = {
    val lDf = ls.toDF()
    val rDf = rs.toDS()
      .select(col("key"), col("tsUs").as("rts"), col("rightId"),
        col("tsUs").as("rightTsUs"), col("value"))
    AsOf.joinNearest(lDf, rDf, Seq("key"), "tsUs", "rts",
        tieBreak = "rightId", tolerance = Some(tolUs), autoChunk = false)
      .select(col("key"), col("tsUs"), col("leftId"), col("rightId"),
        col("rightTsUs"), col("value"))
      .as[AsOfMatch].collect().toSet
  }

  test("nearest: stream equals the batch nearest as-of; prior wins distance ties; tolerance nulls") {
    val tol = 8 * S
    val b1l = Seq(
      LeftEvent("a", 10 * S, 1), // prior at 7s (d=3) vs following at 13s
                                 // (d=3): distance TIE → prior wins
      LeftEvent("a", 20 * S, 2), // prior at 13s (d=7) vs following at
                                 // 22s (d=2): following wins
      LeftEvent("b", 6 * S, 3))  // nearest right is 20s away → null
    val b1r = Seq(RightEvent("a", 7 * S, 100, 1.5),
      RightEvent("a", 13 * S, 101, 2.5))
    val b2l = Seq(LeftEvent("a", 13 * S, 4)) // equal-ts right: d=0 prior
    val b2r = Seq(RightEvent("a", 22 * S, 102, 3.5),
      RightEvent("b", 26 * S, 200, 9.0))
    val got = runStreamN(Seq((b1l, b1r), (b2l, b2r)), tol, delay = "30 seconds")
    assert(got.size === got.map(_.leftId).distinct.size, "exactly-once per left")
    val byId = got.map(m => m.leftId -> m).toMap
    assert(byId(1).rightId === Some(100L), s"distance tie → prior side: $got")
    assert(byId(2).rightId === Some(102L), s"closer following wins: $got")
    assert(byId(3).rightId === None, s"outside tolerance → null: $got")
    assert(byId(4).rightId === Some(101L), s"equal-ts = distance-0 prior: $got")
    assert(got.toSet === batchReferenceN(b1l ++ b2l, b1r ++ b2r, tol))
  }

  test("nearest: a left finalizes EARLY at wm >= leftTs + distance, not at its deadline") {
    // tolerance 1000s — waiting for the deadline could never emit here
    // (the watermark stops at 26s); the left must resolve once the
    // watermark passes leftTs + d = 12s, the min(leftTs+d, deadline) rule
    val tol = 1000 * S
    val batches = Seq(
      (Seq(LeftEvent("a", 10 * S, 1)), Seq(RightEvent("a", 12 * S, 100, 7.0))),
      (Nil, Seq(RightEvent("z", 30 * S, 900, 0.0))), // advance wm to 25s
      (Nil, Seq(RightEvent("z", 31 * S, 901, 0.0)))) // trigger a's timeout
    val got = runStreamN(batches, tol, delay = "5 seconds", flush = false)
      .filterNot(_.key == "z")
    assert(got.map(m => (m.leftId, m.rightId)) === Seq((1L, Some(100L))),
      s"close-candidate left must emit before its deadline: $got")
  }

  test("nearest: randomized stream == batch on a seeded multi-key timeline") {
    val rnd = new scala.util.Random(211)
    val keys = Seq("k1", "k2", "k3")
    var lid = 0L
    var rid = 1000L
    val batches = (1 to 5).map { b =>
      val ls = Seq.fill(rnd.nextInt(5)) {
        lid += 1
        LeftEvent(keys(rnd.nextInt(3)), (b * 10 + rnd.nextInt(10)) * S, lid)
      }
      val rs = Seq.fill(rnd.nextInt(5)) {
        rid += 1
        RightEvent(keys(rnd.nextInt(3)), (b * 10 + rnd.nextInt(10) - 3) * S,
          rid, rnd.nextDouble())
      }
      (ls, rs)
    }
    val tol = 7 * S // mixes prior wins, following wins, and nulls
    val got = runStreamN(batches, tol, delay = "15 seconds")
    val allL = batches.flatMap(_._1)
    val allR = batches.flatMap(_._2)
    assert(got.size === allL.size, s"every left resolves exactly once: $got")
    assert(got.toSet === batchReferenceN(allL, allR, tol))
  }

  test("stream equals the batch as-of: in-order, cross-batch, unmatched lefts") {
    // delay covers the whole timeline: nothing is late, the flush
    // finalizes everything — stream must equal the batch join exactly
    val b1l = Seq(LeftEvent("a", 5 * S, 1), LeftEvent("b", 6 * S, 2))
    val b1r = Seq(RightEvent("a", 3 * S, 100, 1.5),
      RightEvent("a", 5 * S, 101, 2.5)) // equal-ts: visible, largest id wins
    val b2l = Seq(LeftEvent("a", 9 * S, 3), LeftEvent("c", 8 * S, 4))
    val b2r = Seq(RightEvent("a", 7 * S, 102, 3.5),
      RightEvent("b", 1 * S, 200, 9.0)) // cross-batch disorder, not late
    val got = runStream(Seq((b1l, b1r), (b2l, b2r)), delay = "30 seconds")
    assert(got.size === got.map(_.leftId).distinct.size, "exactly-once per left")
    assert(got.toSet === batchReference(b1l ++ b2l, b1r ++ b2r))
  }

  test("out-of-order within the watermark: a right arriving after later lefts still wins") {
    // batch 1 pushes max event time to 10s; with a 5s delay the
    // watermark after batch 1 is 5s, so lefts at 8s/10s are NOT final
    // yet, and rights at 6s/9s arriving in LATER batches (behind the
    // lefts in arrival order, ahead of the watermark in event time)
    // must still become their matches
    val b1l = Seq(LeftEvent("a", 8 * S, 1), LeftEvent("a", 10 * S, 2))
    val b2r = Seq(RightEvent("a", 6 * S, 100, 7.0))
    val b3r = Seq(RightEvent("a", 9 * S, 101, 8.0))
    val got = runStream(Seq((b1l, Nil), (Nil, b2r), (Nil, b3r)),
      delay = "5 seconds")
    val byId = got.map(m => m.leftId -> m).toMap
    assert(byId(1).rightId === Some(100L), s"out-of-order right must match: $got")
    assert(byId(2).rightId === Some(101L), got.toString)
    assert(got.toSet === batchReference(b1l, b2r ++ b3r))
  }

  test("state prunes to the single newest resolved right per key") {
    // many rights far in the past, then a flush far beyond the watermark:
    // every resolved right but the newest is unmatchable and dropped; a
    // later left must still see that newest one (kept as O(1) state)
    val b1r = (1 to 20).map(i => RightEvent("a", i * S, 100L + i, i.toDouble))
    val b2l = Seq(LeftEvent("a", 100 * S, 1))
    val got = runStream(Seq((Nil, b1r), (b2l, Nil)))
    assert(got.map(m => (m.leftId, m.rightId)) === Seq((1L, Some(120L))))
    assert(got.toSet === batchReference(b2l, b1r))
  }

  test("epoch boundary: tsUs > 0 contract holds; 1 µs events resolve, ts=0 is engine-dropped (ADVICE r6)") {
    // The engine admits only event times STRICTLY above the watermark,
    // and its pre-first-update watermark is 0 — so a ts=0 row never
    // reaches the state function (the scaladoc's tsUs > 0 contract),
    // while a 1 µs row must survive the placeholder watermark, wait for
    // its equal-ts right one batch later, and resolve exactly once.
    val b1l = Seq(LeftEvent("a", 1L, 1), LeftEvent("z", 0L, 99))
    val b2r = Seq(RightEvent("a", 1L, 100, 7.0))
    val got = runStream(Seq((b1l, Nil), (Nil, b2r)))
    assert(got.map(m => (m.leftId, m.rightId)) === Seq((1L, Some(100L))),
      s"1 µs left resolves with its right; epoch-zero left is dropped: $got")
    assert(got.toSet === batchReference(b1l.take(1), b2r))
  }

  test("randomized: stream == batch on a seeded multi-key, multi-batch timeline") {
    val rnd = new scala.util.Random(97)
    val keys = Seq("k1", "k2", "k3")
    var lid = 0L
    var rid = 1000L
    val batches = (1 to 5).map { b =>
      val ls = Seq.fill(rnd.nextInt(5)) {
        lid += 1
        LeftEvent(keys(rnd.nextInt(3)), (b * 10 + rnd.nextInt(10)) * S, lid)
      }
      val rs = Seq.fill(rnd.nextInt(5)) {
        rid += 1
        // event times drift mildly backwards too (within the delay)
        RightEvent(keys(rnd.nextInt(3)), (b * 10 + rnd.nextInt(10) - 3) * S,
          rid, rnd.nextDouble())
      }
      (ls, rs)
    }
    val got = runStream(batches, delay = "15 seconds")
    val allL = batches.flatMap(_._1)
    val allR = batches.flatMap(_._2)
    assert(got.size === allL.size, s"every left resolves exactly once: $got")
    assert(got.toSet === batchReference(allL, allR))
  }
}
