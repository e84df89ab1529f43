package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Hll
import StreamingHll.{Rec, Sketch}

/** The streaming HLL twin must land on EXACTLY the batch registers
  * whatever the micro-batch split and arrival order — register max
  * is a commutative, idempotent monoid, so this is an identity;
  * plus the JVM-vs-expression register mirror, duplicate-delivery
  * idempotence, and estimate parity through [[Hll.estimate]]. */
class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  private implicit val ss: org.apache.spark.sql.SparkSession = spark

  private def runStream(batches: Seq[Seq[Rec]]): Map[String, Seq[Long]] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Rec]
    val name = s"shll_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = StreamingHll.sketch(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // registers only grow: the row with the largest register sum per
    // group is the latest state
    spark.table(name).as[Sketch].collect()
      .groupBy(_.group).view
      .mapValues(_.maxBy(_.hll.sum).hll).toMap
  }

  private def batchSketch(recs: Seq[Rec]): Map[String, Seq[Long]] =
    Hll.sketch(recs.map(r => (r.group, r.key)).toDF("g", "k"),
        Seq("g"), "k")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  private def recs(n: Int): Seq[Rec] =
    (0 until n).map(i => Rec(s"g${i % 3}", s"k${i * 31 % 997}"))

  test("stream equals batch registers whatever the split and order") {
    val all = recs(600)
    val shuffled = new scala.util.Random(15).shuffle(all)
    val splits = Seq(
      Seq(all),
      all.grouped(17).toSeq,
      shuffled.grouped(101).toSeq)
    val want = batchSketch(all)
    splits.foreach { bs =>
      assert(runStream(bs) === want, s"split into ${bs.size} batches")
    }
  }

  test("re-delivered rows are absorbed (max idempotence)") {
    val all = recs(200)
    val withDups = Seq(all.take(120), all.take(120), all)
    assert(runStream(withDups) === batchSketch(all))
  }

  test("registerJvm mirrors the batch (j, rho) expressions per key") {
    val keys = (0 until 64).map(i => s"mirror-$i")
    val batch = batchSketch(keys.map(Rec("g", _)).map(r =>
      Rec(r.group, r.key)))("g")
    val expected = Array.fill(Hll.M)(0L)
    keys.foreach { k =>
      val (j, rho) = Hll.registerJvm(k)
      expected(j) = math.max(expected(j), rho)
    }
    assert(batch === expected.toSeq)
  }

  test("a group fed only NULL keys is never populated — no state, " +
      "no all-zero row (batch parity, r16)") {
    val real = recs(100)
    // gnull sees only nulls across TWO batches; g0 absorbs a null
    // alongside real keys
    val b1 = real.take(50) ++ Seq(Rec("gnull", null), Rec("g0", null))
    val b2 = real.drop(50) :+ Rec("gnull", null)
    val live = runStream(Seq(b1, b2))
    assert(!live.contains("gnull"),
      "null-only group must not emit an all-zero sketch")
    assert(live === batchSketch(real))
  }

  test("estimate parity: the live sketch feeds Hll.estimate unchanged") {
    val all = recs(500)
    val live = runStream(Seq(all.take(250), all.drop(250)))
    val fromStream = Hll.estimate(
      live.toSeq.map { case (g, h) => (g, h) }.toDF("g", "hll"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val fromBatch = Hll.estimate(
      Hll.sketch(all.map(r => (r.group, r.key)).toDF("g", "k"),
        Seq("g"), "k"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(fromStream === fromBatch)
  }
}
