package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Drift
import StreamingDrift.{BucketCount, Rec}

/** The streaming drift twin: per-bucket counts are a commutative
  * monoid, so stream ≡ batch counts whatever the split/order (pinned
  * on shuffled multi-batch runs), and the JVM scoring mirrors must
  * read bit-for-bit what the batch column expressions read on the
  * same counts — for BOTH panel members (table-PSI and JSD). */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private implicit val ss: org.apache.spark.sql.SparkSession = spark

  private def runStream(batches: Seq[Seq[Long]]): Map[Long, Long] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Rec]
    val name = s"sdr_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = StreamingDrift.counts(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) in.addData(b.map(Rec): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[BucketCount].collect()
      .groupBy(_.bucket).view
      .mapValues(_.map(_.n_cur).max).toMap
  }

  private def seeded(n: Int, seed: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => rnd.nextInt(8).toLong)
  }

  test("stream counts ≡ batch counts under shuffled multi-batch splits") {
    val rows = seeded(500, 47)
    val batch = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rnd = new scala.util.Random(48)
    val shuffled = rnd.shuffle(rows)
    val splits = Seq(
      Seq(rows),
      shuffled.grouped(97).toSeq,
      shuffled.grouped(13).toSeq :+ Seq.empty)
    for ((s, i) <- splits.zipWithIndex)
      assert(runStream(s) === batch, s"split $i")
  }

  test("psi mirror reads bit-for-bit what the batch expression reads") {
    val ref = seeded(400, 51); val cur = seeded(300, 52)
    val got = StreamingDrift.scorePsi(
      ref.groupBy(identity).view.mapValues(_.size.toLong).toMap,
      cur.groupBy(identity).view.mapValues(_.size.toLong).toMap)
    val want = Drift.categoricalExact(ref.toDF("nb"), cur.toDF("nb"), "nb")
      .orderBy(col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === want)
  }

  test("jsd mirror reads bit-for-bit what the batch expression reads") {
    val ref = seeded(400, 53); val cur = seeded(300, 54)
    val got = StreamingDrift.scoreJsd(
      ref.groupBy(identity).view.mapValues(_.size.toLong).toMap,
      cur.groupBy(identity).view.mapValues(_.size.toLong).toMap)
    val want = Drift.jensenShannonExact(ref.toDF("nb"), cur.toDF("nb"), "nb")
      .orderBy(col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === want)
  }

  test("end to end: live counts scored mid-stream match the batch " +
      "operator on the prefix") {
    val ref = seeded(300, 55)
    val refMap = ref.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val stream = seeded(200, 56)
    val (b1, b2) = stream.splitAt(120)
    // score after batch 1 only — the monitor's mid-stream read
    val mid = runStream(Seq(b1))
    val wantMid = Drift.categoricalExact(
        ref.toDF("nb"), b1.toDF("nb"), "nb")
      .orderBy(col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(StreamingDrift.scorePsi(refMap, mid) === wantMid)
    // and after both batches — the full-stream read
    val full = runStream(Seq(b1, b2))
    val wantFull = Drift.categoricalExact(
        ref.toDF("nb"), stream.toDF("nb"), "nb")
      .orderBy(col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(StreamingDrift.scorePsi(refMap, full) === wantFull)
  }
}
