package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.QuantileSketch
import StreamingQuantileSketch.{Rec, Sketch}

/** The streaming quantile-sketch twin must land on EXACTLY the batch
  * sketch whatever the micro-batch split and arrival order — the
  * bottom-k-by-hash sample is an order-free monoid, so this is an
  * identity, pinned here on shuffled multi-batch runs, plus the
  * JVM-vs-expression hash equivalence that makes the twins
  * drift-free and estimate parity through the batch estimator. */
class StreamingQuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private implicit val ss: org.apache.spark.sql.SparkSession = spark

  private def runStream(batches: Seq[Seq[Rec]], k: Int)
      : Map[String, (Seq[Long], Seq[Long])] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Rec]
    val name = s"qsk_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = StreamingQuantileSketch.sketch(in.toDS(), k)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // Update mode appends a row per (trigger, changed group): the
    // LATEST row per group is the live sketch. Sink row order is not
    // contractual, but the sample improves monotonically — a later
    // trigger's k-smallest-of-a-superset dominates elementwise — so
    // the latest row is recoverable as the hash-lexicographic winner
    collectLatest(spark.table(name).as[Sketch].collect())
  }

  /** Later-of-two under the monotone-improvement order: first
    * differing hash decides (smaller = later); a pure extension
    * (longer sample) is later. */
  private def later(a: Sketch, b: Sketch): Sketch = {
    val n = math.min(a.hs.size, b.hs.size)
    var i = 0
    while (i < n && a.hs(i) == b.hs(i)) i += 1
    if (i < n) { if (a.hs(i) < b.hs(i)) a else b }
    else if (a.hs.size >= b.hs.size) a else b
  }

  private def collectLatest(rows: Seq[Sketch])
      : Map[String, (Seq[Long], Seq[Long])] =
    rows.groupBy(_.group).view
      .mapValues(rs => { val l = rs.reduce(later); (l.hs, l.vs) }).toMap

  private def batchSketch(recs: Seq[Rec], k: Int)
      : Map[String, (Seq[Long], Seq[Long])] =
    QuantileSketch.sketch(
        recs.map(r => (r.group, r.value, r.id)).toDF("g", "v", "id"),
        Seq("g"), "v", "id", k)
      .collect().map { r =>
        val pairs = r.getSeq[org.apache.spark.sql.Row](1)
          .map(s => (s.getLong(0), s.getLong(1)))
        r.getString(0) -> (pairs.map(_._1), pairs.map(_._2))
      }.toMap

  private def recs(n: Int): Seq[Rec] =
    (0 until n).map(i => Rec(s"g${i % 3}", ((i * 53) % 200).toLong,
      i.toLong))

  test("rowHashJvm is the batch expression, bit for bit") {
    val df = (0 until 50).map(i => (((i * 97) % 30).toLong, i.toLong))
      .toDF("v", "id")
    val exprSide = df.select(col("id"),
        QuantileSketch.rowHash(col("v"), col("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 0 until 50)
      assert(QuantileSketch.rowHashJvm(((i * 97) % 30).toLong, i.toLong)
        === exprSide(i.toLong), s"row $i")
  }

  test("stream ≡ batch sketch on shuffled multi-batch splits") {
    val data = recs(120)
    val expect = batchSketch(data, 8)
    val rnd = new scala.util.Random(31)
    for (round <- 1 to 3) {
      val shuffled = rnd.shuffle(data)
      val batches = shuffled.grouped(30 + round * 7).toSeq
      assert(runStream(batches, 8) === expect, s"round $round")
    }
  }

  test("prefix property: mid-stream state is the batch sketch of the prefix") {
    val data = recs(90)
    val (b1, b2) = data.splitAt(40)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Rec]
    val name = s"qskp_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = StreamingQuantileSketch.sketch(in.toDS(), 8)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      val mid = collectLatest(spark.table(name).as[Sketch].collect())
      assert(mid === batchSketch(b1, 8))
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
  }

  test("estimates off the streamed sketch equal the batch estimates") {
    val data = recs(150)
    val streamed = runStream(Seq(data.take(70), data.drop(70)), 16)
    val streamedTable = streamed.toSeq.map { case (g, (hs, vs)) =>
      (g, hs.zip(vs).map { case (h, v) => (h, v) })
    }.toDF("g", "qs")
      .withColumn("qs", col("qs").cast(
        "array<struct<h:bigint,v:bigint>>"))
    val ps = Seq(250000L, 500000L, 750000L)
    val fromStream = QuantileSketch.estimateQuantiles(streamedTable, ps)
      .collect().map(r => ((r.getString(0), r.getLong(2)), r.getLong(3)))
      .toMap
    val fromBatch = QuantileSketch.estimateQuantiles(
        QuantileSketch.sketch(
          data.map(r => (r.group, r.value, r.id)).toDF("g", "v", "id"),
          Seq("g"), "v", "id", 16), ps)
      .collect().map(r => ((r.getString(0), r.getLong(2)), r.getLong(3)))
      .toMap
    assert(fromStream === fromBatch)
  }
}
