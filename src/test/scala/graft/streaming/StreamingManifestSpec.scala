package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Manifest
import StreamingManifest.{Digest, Rec}

/** The streaming manifest twin must land on EXACTLY the batch digest
  * whatever the micro-batch split and arrival order — (count, sum,
  * xor) is a commutative monoid, so this is an identity, pinned on
  * shuffled multi-batch runs; plus the JVM-vs-expression hash mirror
  * (nulls, empties, unicode incl. an astral code point) and the
  * merge-identity through [[Manifest.merge]]. */
class StreamingManifestSpec extends SparkSpec {
  import spark.implicits._

  private implicit val ss: org.apache.spark.sql.SparkSession = spark

  private def runStream(batches: Seq[Seq[Rec]]): Map[String, Digest] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Rec]
    val name = s"smf_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = StreamingManifest.digest(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) in.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // latest row per group = max n_rows (counts only grow)
    spark.table(name).as[Digest].collect()
      .groupBy(_.group).view
      .mapValues(_.maxBy(_.n_rows)).toMap
  }

  private def batchDigest(recs: Seq[Rec]): Map[String, Digest] =
    Manifest.digest(
        recs.map(r => (r.group, r.keys.head.orNull,
          r.keys(1).orNull)).toDF("g", "k1", "k2"),
        Seq("g"), Seq("k1", "k2"))
      .collect()
      .map(r => r.getString(0) ->
        Digest(r.getString(0), r.getLong(1), r.getString(2),
          r.getLong(3))).toMap

  private def recs(n: Int): Seq[Rec] =
    (0 until n).map { i =>
      val k1 = if (i % 11 == 0) None else Some(s"v${i * 31 % 97}")
      val k2 = if (i % 13 == 0) None
        else if (i % 7 == 0) Some("") else Some(s"§π𝄞${i % 5}")
      Rec(s"g${i % 3}", Seq(k1, k2))
    }

  test("rowHashJvm is the batch hash expression, bit for bit") {
    // nulls, empty strings, multi-byte AND astral code points (the
    // 𝄞 pins code-point length semantics against UTF-16 units)
    val rows = Seq(
      (Some("abc"), Some("d")), (None, Some("abc")),
      (Some("abc"), None), (Some(""), Some("a")),
      (Some("a"), Some("")), (Some("§π"), Some("𝄞")),
      (Some("𝄞𝄞"), None), (None, None), (Some("-"), Some("1:x")))
    val df = rows.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a.orNull, b.orNull) }
      .toDF("i", "k1", "k2")
    // re-derive the batch hash through a 1-group digest per row:
    // n_rows=1 ⇒ h_sum IS the row hash
    val exprSide = Manifest.digest(df, Seq("i"), Seq("k1", "k2"))
      .collect().map(r => r.getLong(0) -> r.getString(2).toLong).toMap
    for (((a, b), i) <- rows.zipWithIndex)
      assert(Manifest.rowHashJvm(Seq(a, b)) === exprSide(i.toLong),
        s"row $i ($a, $b)")
  }

  test("stream equals batch digest whatever the split and order") {
    val all = recs(120)
    val shuffled = new scala.util.Random(5).shuffle(all)
    for (splits <- Seq(Seq(all), all.grouped(7).toSeq,
        shuffled.grouped(40).toSeq)) {
      val got = runStream(splits)
      val want = batchDigest(all)
      assert(got === want, s"splits of size ${splits.map(_.size)}")
    }
  }

  test("final state equals Manifest.merge of per-batch digests") {
    val all = recs(90)
    val parts = all.grouped(30).toSeq
    val folded = parts.map(p =>
        Manifest.digest(p.map(r => (r.group, r.keys.head.orNull,
          r.keys(1).orNull)).toDF("g", "k1", "k2"),
          Seq("g"), Seq("k1", "k2")))
      .reduce((a, b) => Manifest.merge(a, b, Seq("g")))
      .collect()
      .map(r => r.getString(0) -> Digest(r.getString(0), r.getLong(1),
        r.getString(2), r.getLong(3))).toMap
    assert(runStream(parts) === folded)
  }

  test("state is the three accumulators — a re-sent duplicate row " +
      "changes the digest (bag semantics, the double-append alarm)") {
    val one = Seq(Rec("g", Seq(Some("a"), Some("b"))))
    val once = runStream(Seq(one))
    val twice = runStream(Seq(one, one))
    assert(once("g").n_rows === 1L && twice("g").n_rows === 2L)
    assert(once("g").h_sum !== twice("g").h_sum)
    assert(twice("g").h_xor === 0L, "xor of an even multiset cancels")
  }
}
