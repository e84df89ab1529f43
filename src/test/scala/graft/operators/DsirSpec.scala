package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1024

  // ---- plain-Scala replication of the whole model, from scratch ----

  /** First 4 hex chars of md5 = first 2 bytes, big-endian — the
    * portable 16-bit bucket both engines compute. */
  private def bucket(f: String, m: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(f.getBytes("UTF-8"))
    (((md(0) & 0xff) << 8) | (md(1) & 0xff)) % m
  }

  private def feats(t: String): Seq[String] = {
    val tr = t.trim
    val tk = if (tr.isEmpty) Seq.empty[String] else tr.split("\\s+").toSeq
    tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  /** Exact reference scores: quantized per-bucket log ratios summed per
    * doc in exact Long arithmetic, association order matching the
    * engine's ((ln(ct+1) - ln(nt+m)) - ln(cr+1)) + ln(nr+m). */
  private def reference(raw: Seq[(Long, String)], target: Seq[(Long, String)],
      m: Int): Map[Long, (Long, Long)] = {
    val ct = target.flatMap(d => feats(d._2)).groupBy(bucket(_, m))
      .map { case (b, v) => b -> v.size.toLong }
    val cr = raw.flatMap(d => feats(d._2)).groupBy(bucket(_, m))
      .map { case (b, v) => b -> v.size.toLong }
    val nt = ct.values.sum; val nr = cr.values.sum
    def w(b: Int): Long = math.floor(
      (((math.log(ct.getOrElse(b, 0L) + 1.0) - math.log(nt + m.toDouble)) -
        math.log(cr.getOrElse(b, 0L) + 1.0)) + math.log(nr + m.toDouble)) *
        10000.0 + 0.5).toLong
    raw.map { case (id, t) =>
      val bs = feats(t).map(bucket(_, m))
      id -> ((bs.size.toLong, bs.map(w).sum))
    }.toMap
  }

  private def runScores(raw: Seq[(Long, String)],
      target: Seq[(Long, String)], m: Int): Map[Long, (Long, Long)] = {
    val rawDf = raw.toDF("doc_id", "text")
    val (weights, totals) = Dsir.importanceWeights(
      rawDf, target.toDF("doc_id", "text"), "doc_id", "text", m)
    Dsir.score(rawDf, "doc_id", "text", weights, totals, m)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, s) => id -> (n, s) }.toMap
  }

  test("hand fixture: scores replicate the exact reference model") {
    val target = Seq((100L, "spark shuffle spark join"), (101L, "spark agg"))
    val raw = Seq((1L, "spark shuffle join"), (2L, "cat dog cat"),
      (3L, "spark agg shuffle"), (4L, "  "), (5L, "dog"))
    val got = runScores(raw, target, M)
    val want = reference(raw, target, M)
    assert(got === want)
    // featureless doc scores 0 over 0 features
    assert(got(4L) === ((0L, 0L)))
  }

  test("target-like documents outscore off-domain documents") {
    val target = Seq.tabulate(20)(i =>
      (1000L + i, "spark shuffle partition join agg broadcast"))
    val onDomain = Seq.tabulate(5)(i =>
      (i.toLong, "spark join shuffle agg partition"))
    val offDomain = Seq.tabulate(5)(i =>
      (100L + i, "banana apple cherry mango kiwi"))
    val got = runScores(onDomain ++ offDomain, target, M)
    val worstOn = onDomain.map(d => got(d._1)._2).min
    val bestOff = offDomain.map(d => got(d._1)._2).max
    assert(worstOn > bestOff,
      s"on-domain floor $worstOn must beat off-domain ceiling $bestOff")
  }

  test("selectTopK is deterministic: score desc, then id asc, exactly k rows") {
    // two ids with IDENTICAL text → identical score; tie breaks on id
    val raw = Seq((7L, "spark spark"), (3L, "spark spark"),
      (9L, "unrelated words here"))
    val target = Seq((0L, "spark"))
    val top = Dsir.selectTopK(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), "doc_id", "text", M, k = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(top.map(_._1) === Seq(3L, 7L))
    assert(top.head._2 === top(1)._2 && top.head._3 === top(1)._3)
  }

  test("matches the exact reference on real documents (en target)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val raw = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    val target = docs.filter($"lang" === "en")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(target.nonEmpty && target.size < raw.size)
    val got = runScores(raw, target, M)
    val want = reference(raw, target, M)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, g) => assert(g === want(id), s"doc $id") }
  }

  test("bucket arithmetic: engine bucket equals the md5 first-2-bytes convention") {
    val words = Seq("spark", "shuffle", "a b", "ünïcode", "123")
    val got = words.toDF("f")
      .select(col("f"),
        (conv(substring(md5(col("f")), 1, 4), 16, 10).cast("int") % M)
          .as("b"))
      .as[(String, Int)].collect().toMap
    words.foreach(w => assert(got(w) === bucket(w, M), s"feature $w"))
  }
}
