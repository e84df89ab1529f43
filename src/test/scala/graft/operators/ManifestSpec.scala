package graft.operators

import java.security.MessageDigest

import graft.SparkSpec

/** Order-insensitive mergeable corpus digest (r13, L144). Pins order/
  * partition/batch invariance, merge ≡ direct on randomized splits,
  * single-row-change and double-append detection, the injective
  * null/empty rendering, and a plain-Scala replay of the triple. */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def refHash(cols: Seq[Option[String]]): Long = {
    val rendered = cols.map {
      case None => "-"
      case Some(v) => s"${v.length}:$v"
    }.mkString
    val hex = MessageDigest.getInstance("MD5")
      .digest(rendered.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(14)
    java.lang.Long.parseLong(hex, 16)
  }

  private def rows(n: Int): Seq[(String, Long, String)] =
    (0 until n).map(i => (s"g${i % 3}", i.toLong, s"payload$i"))

  private def dig(data: Seq[(String, Long, String)]) =
    Manifest.digest(data.toDF("g", "id", "v"), Seq("g"), Seq("id", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3))).toMap

  test("plain-Scala replay of (n, sum, xor) per group") {
    val data = rows(60)
    val got = dig(data)
    for ((g, rs) <- data.groupBy(_._1)) {
      val hs = rs.map(r => refHash(Seq(Some(r._2.toString), Some(r._3))))
      assert(got(g) === ((rs.size.toLong,
        hs.map(BigInt(_)).sum.toString, hs.reduce(_ ^ _))), s"group $g")
    }
  }

  test("row order, partitioning and batch boundaries do not matter") {
    val data = rows(80)
    val direct = dig(data)
    val rnd = new scala.util.Random(59)
    assert(dig(rnd.shuffle(data)) === direct)
    val repart = Manifest.digest(
      data.toDF("g", "id", "v").repartition(13), Seq("g"), Seq("id", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    assert(repart === direct)
  }

  test("merge ≡ direct digest on randomized splits; empty delta identity") {
    val data = rows(90)
    val direct = dig(data)
    val rnd = new scala.util.Random(67)
    for (_ <- 1 to 3) {
      val mask = data.map(_ => rnd.nextBoolean())
      val (a, b) = data.zip(mask).partition(_._2)
      def d(part: Seq[(String, Long, String)]) = Manifest.digest(
        part.toDF("g", "id", "v"), Seq("g"), Seq("id", "v"))
      val merged = Manifest.merge(d(a.map(_._1)), d(b.map(_._1)), Seq("g"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getString(2), r.getLong(3))).toMap
      assert(merged === direct)
    }
    val empty = Manifest.digest(
      Seq.empty[(String, Long, String)].toDF("g", "id", "v"),
      Seq("g"), Seq("id", "v"))
    val withEmpty = Manifest.merge(
      Manifest.digest(data.toDF("g", "id", "v"), Seq("g"),
        Seq("id", "v")), empty, Seq("g"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    assert(withEmpty === direct)
  }

  test("a single changed row changes the digest; a double-append too") {
    val data = rows(50)
    val direct = dig(data)
    val tampered = data.updated(17, data(17).copy(_3 = "payload17x"))
    val tDig = dig(tampered)
    assert(tDig("g2") != direct("g2"), "change must surface")
    assert(tDig.filterNot(_._1 == "g2") === direct.filterNot(_._1 == "g2"),
      "untouched groups must agree")
    val doubled = dig(data ++ data.filter(_._1 == "g0"))
    assert(doubled("g0")._1 === 2 * direct("g0")._1)
    assert(doubled("g0") != direct("g0"), "bag semantics count dups")
  }

  test("integration: the digest witnesses idempotent-append idempotence") {
    // the manifest's reason to exist, end to end: append a batch to a
    // parquet sink TWICE through the J3 protocol — the sink digest
    // after the replay must equal the digest after the first append
    // (and differ from the pre-append digest), all without comparing
    // a single row
    import org.apache.spark.sql.functions.col
    val sink = tmpDir("manifest_j3")
    val batch0 = rows(30).toDF("g", "id", "v")
    val batch1 = (100 until 120).map(i =>
      (s"g${i % 3}", i.toLong, s"late$i")).toDF("g", "id", "v")
    IdempotentAppend.toParquet(batch0, sink, "id")
    def digestSink() = Manifest.digest(
      spark.read.parquet(sink).select(col("g"), col("id"), col("v")),
      Seq("g"), Seq("id", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    val before = digestSink()
    IdempotentAppend.toParquet(batch1, sink, "id")
    val after1 = digestSink()
    IdempotentAppend.toParquet(batch1, sink, "id") // the replay
    val after2 = digestSink()
    assert(after1 !== before, "the append must change the digest")
    assert(after2 === after1,
      "the replayed append must leave the digest fixed — idempotence " +
        "witnessed by arithmetic, not row comparison")
  }

  test("injective rendering: null, empty and space-like values differ") {
    def one(v: Option[String]) = Manifest.digest(
      Seq(("g", v)).toDF("g", "v"), Seq("g"), Seq("v"))
      .collect().head.getLong(3)
    val xs = Seq(None, Some(""), Some(" "), Some("-"), Some("0:"))
    val hs = xs.map(one)
    assert(hs.distinct.size === xs.size,
      s"renderings must be pairwise distinct: ${xs.zip(hs)}")
    // and the reference agrees
    assert(one(None) === refHash(Seq(None)))
    assert(one(Some("")) === refHash(Seq(Some(""))))
  }
}
