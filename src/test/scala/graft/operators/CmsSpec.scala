package graft.operators

import graft.SparkSpec

class CmsSpec extends SparkSpec {
  import spark.implicits._

  // plain-Scala replay: md5 via MessageDigest, same cell derivation
  private def cellOf(r: Int, key: String, w: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"cms:$r:$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13)
    java.lang.Long.parseLong(hex, 16) % w
  }

  private def refSketch(keys: Seq[String], d: Int, w: Int): Map[(Int, Long), Long] =
    keys.flatMap(k => (0 until d).map(r => (r, cellOf(r, k, w))))
      .groupBy(identity).map { case (cell, v) => cell -> v.size.toLong }

  private def refEstimate(sk: Map[(Int, Long), Long], key: String,
      d: Int, w: Int): Long =
    (0 until d).map(r => sk.getOrElse((r, cellOf(r, key, w)), 0L)).min

  private val corpus: Seq[String] = {
    val rnd = new scala.util.Random(101)
    // zipf-ish: key i appears ~ 200/i times over 60 distinct keys
    (1 to 60).flatMap(i => Seq.fill(math.max(200 / i, 1))(s"tok$i")) ++
      Seq.fill(50)(s"rare${rnd.nextInt(500)}")
  }

  test("sketch grid and estimates == plain-Scala replay, bit-for-bit") {
    val df = corpus.toDF("k")
    val sk = Cms.sketch(df, "k", d = 4, w = 64)
    val got = sk.as[(Int, Long, Long)].collect()
      .map { case (r, c, n) => (r, c) -> n }.toMap
    assert(got === refSketch(corpus, 4, 64))
    val probes = corpus.distinct
    val est = Cms.estimate(sk, probes.toDF("k"), "k", d = 4, w = 64)
      .as[(String, Long)].collect().toMap
    val want = probes.map(k =>
      k -> refEstimate(refSketch(corpus, 4, 64), k, 4, 64)).toMap
    assert(est === want)
  }

  test("never underestimates; exact when w is collision-free for the corpus") {
    val df = corpus.toDF("k")
    val exact = corpus.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    // tight grid: overestimates allowed, underestimates never
    val skSmall = Cms.sketch(df, "k", d = 4, w = 64)
    val estSmall = Cms.estimate(skSmall, corpus.distinct.toDF("k"), "k",
      d = 4, w = 64).as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(estSmall(k) >= n, s"$k underestimated: ${estSmall(k)} < $n")
    }
    // huge grid: the distinct-key load is far under w, and any residual
    // collision must be caught by at least one of the 4 rows — on this
    // seeded corpus every estimate is exact
    val skBig = Cms.sketch(df, "k", d = 4, w = 1 << 16)
    val estBig = Cms.estimate(skBig, corpus.distinct.toDF("k"), "k",
      d = 4, w = 1 << 16).as[(String, Long)].collect().toMap
    assert(estBig === exact)
  }

  test("mergeability: sketch(A ++ B) == cellwise sketch(A) + sketch(B)") {
    val (a, b) = corpus.splitAt(corpus.size / 3)
    val skA = Cms.sketch(a.toDF("k"), "k", d = 3, w = 32)
      .as[(Int, Long, Long)].collect().map { case (r, c, n) => (r, c) -> n }
    val skB = Cms.sketch(b.toDF("k"), "k", d = 3, w = 32)
      .as[(Int, Long, Long)].collect().map { case (r, c, n) => (r, c) -> n }
    val merged = (skA ++ skB).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val whole = Cms.sketch(corpus.toDF("k"), "k", d = 3, w = 32)
      .as[(Int, Long, Long)].collect()
      .map { case (r, c, n) => (r, c) -> n }.toMap
    assert(merged === whole)
  }

  test("hygiene and guards: null keys drop; d/w domains") {
    val withNulls = Seq(Some("a"), None, Some("a")).toDF("k")
    val sk = Cms.sketch(withNulls, "k", d = 2, w = 16)
    val est = Cms.estimate(sk, Seq("a").toDF("k"), "k", d = 2, w = 16)
      .as[(String, Long)].collect().toMap
    assert(est("a") === 2L)
    intercept[IllegalArgumentException] {
      Cms.sketch(withNulls, "k", d = 0)
    }
    intercept[IllegalArgumentException] {
      Cms.sketch(withNulls, "k", w = 1)
    }
  }
}
