package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Contingency
import StreamingContingency.{Cells, Rec}

/** The streaming MH twin must land on EXACTLY the batch cells whatever
  * the micro-batch split and arrival order (cell counts are a
  * commutative monoid), and its snapshot scorer must read the SAME
  * adjusted association as the batch operator from the same cells —
  * the L192 twin's two identities, pinned. */
class StreamingContingencySpec extends SparkSpec {
  import spark.implicits._

  private implicit val ss: org.apache.spark.sql.SparkSession = spark

  private def runStream(batches: Seq[Seq[Rec]])
      : Map[(String, String), (Long, Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Rec]
    val name = s"smh_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = StreamingContingency.cells(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // cells only grow: the max-total row per key is the latest state
    spark.table(name).as[Cells].collect()
      .groupBy(c => (c.panel, c.stratum)).view
      .mapValues(_.maxBy(c => c.n11 + c.n10 + c.n01 + c.n00))
      .mapValues(c => (c.n11, c.n10, c.n01, c.n00)).toMap
  }

  private def recs(n: Int): Seq[Rec] = {
    val rnd = new scala.util.Random(1959)
    (1 to n).map { i =>
      val r = rnd.nextInt(2)
      val c = if (rnd.nextInt(10) < 3 + 3 * r) 1 else 0
      Rec("p", s"s${i % 3}", r.toLong, c.toLong)
    }
  }

  private def batchCells(rows: Seq[Rec])
      : Map[(String, String), (Long, Long, Long, Long)] =
    rows.filter(r => (r.r == 0 || r.r == 1) && (r.c == 0 || r.c == 1))
      .groupBy(r => (r.panel, r.stratum)).view
      .mapValues { g =>
        (g.count(r => r.r == 1 && r.c == 1).toLong,
          g.count(r => r.r == 1 && r.c == 0).toLong,
          g.count(r => r.r == 0 && r.c == 1).toLong,
          g.count(r => r.r == 0 && r.c == 0).toLong)
      }.toMap

  test("stream equals batch cells whatever the split and order") {
    val all = recs(600)
    val shuffled = new scala.util.Random(16).shuffle(all)
    val want = batchCells(all)
    for (bs <- Seq(Seq(all), all.grouped(37).toSeq,
        shuffled.grouped(101).toSeq))
      assert(runStream(bs) === want, s"split into ${bs.size} batches")
  }

  test("non-binary rows are dropped in the fold (batch hygiene parity)") {
    val all = recs(120) ++ Seq(Rec("p", "s0", 2L, 1L),
      Rec("p", "s1", 0L, -1L))
    assert(runStream(Seq(all)) === batchCells(all))
  }

  test("a stratum fed ONLY non-binary rows never materializes " +
      "(batch stratum-set parity, r17 ADVICE)") {
    // batch drops non-binary rows BEFORE the groupBy, so stratum s9
    // never exists there; the stream twin must not emit an all-zero
    // Cells row for it (the StreamingHll all-NULL-key class)
    val all = recs(120) ++ Seq(Rec("p", "s9", 2L, 1L),
      Rec("p", "s9", 0L, 7L), Rec("p", "s9", -1L, 0L))
    val got = runStream(Seq(all.take(60), all.drop(60)))
    assert(!got.contains(("p", "s9")), s"phantom stratum emitted: $got")
    assert(got.keySet === batchCells(all).keySet)
  }

  test("snapshot scorer equals the batch operator on the same data") {
    val all = recs(500)
    val live = runStream(Seq(all.take(250), all.drop(250)))
    val fromStream = StreamingContingency.score(
      live.toSeq.map { case ((p, s), (a, b, c, d)) =>
        Cells(p, s, a, b, c, d) })
    val batch = Contingency.mantelHaenszel(
        all.map(r => (r.panel, r.stratum, r.r, r.c))
          .toDF("p", "s", "r", "c"), "p", "s", "r", "c")
      .collect().head
    val fromBatch = (
      if (batch.isNullAt(3)) None else Some(batch.getLong(3)),
      if (batch.isNullAt(4)) None else Some(batch.getLong(4)),
      batch.getLong(5), batch.getLong(6))
    assert(fromStream === fromBatch)
  }

  test("mid-stream snapshot equals the batch operator on the prefix") {
    val all = recs(400)
    val prefix = all.take(180)
    val live = runStream(Seq(prefix))
    val fromStream = StreamingContingency.score(
      live.toSeq.map { case ((p, s), (a, b, c, d)) =>
        Cells(p, s, a, b, c, d) })
    val batch = Contingency.mantelHaenszel(
        prefix.map(r => (r.panel, r.stratum, r.r, r.c))
          .toDF("p", "s", "r", "c"), "p", "s", "r", "c")
      .collect().head
    assert(fromStream === (
      (if (batch.isNullAt(3)) None else Some(batch.getLong(3))),
      (if (batch.isNullAt(4)) None else Some(batch.getLong(4))),
      batch.getLong(5), batch.getLong(6)))
  }
}
