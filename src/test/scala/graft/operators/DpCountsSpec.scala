package graft.operators

import graft.SparkSpec

class DpCountsSpec extends SparkSpec {
  import spark.implicits._

  // plain-Scala replay of the release: md5 via MessageDigest, the same
  // 52-bit dyadic uniform, inverse-CDF geometric, Z = G1 - G2
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def uniform(tag: Int, seed: String, gk: String): Double =
    (java.lang.Long.parseLong(md5Hex(s"dpl:$tag:$seed:$gk").take(13), 16)
      .toDouble + 0.5) / 4503599627370496.0

  private def noise(seed: String, gk: String, eps: Double,
      sensitivity: Int): Long = {
    val lnAlpha = -(eps / sensitivity)
    def g(tag: Int): Long =
      math.floor(math.log(uniform(tag, seed, gk)) / lnAlpha).toLong
    g(1) - g(2)
  }

  test("release == plain-Scala replay (md5 uniforms + inverse CDF), bit-for-bit") {
    val rows = Seq(("en", "web"), ("en", "web"), ("en", "book"),
      ("de", "web"), (null, "web"), ("de", null))
    val df = rows.toDF("lang", "source")
    val got = Privacy.dpCounts(df, Seq("lang", "source"), eps = 1.0,
        seed = "s1")
      .as[(Option[String], Option[String], Long, Double, Int)]
      .collect().toSeq.sortBy(r => (r._1.getOrElse(""), r._2.getOrElse("")))
    val want = rows.groupBy(identity).map { case ((l, s), v) =>
      val gk = Option(l).getOrElse(" ") + "|" + Option(s).getOrElse(" ")
      (Option(l), Option(s), v.size + noise("s1", gk, 1.0, 1), 1.0, 1)
    }.toSeq.sortBy(r => (r._1.getOrElse(""), r._2.getOrElse("")))
    assert(got === want)
  }

  test("distribution: geometric tails decay at rate alpha, P(G=0) tracks 1-alpha") {
    // 4000 synthetic cells; each contributes two geometric draws. At
    // eps=1 (alpha = e^-1 ~ 0.368) the exact P(G=0) = 1-alpha ~ 0.632.
    val eps = 1.0
    val draws = (0 until 4000).flatMap { i =>
      Seq(1, 2).map(t => math.floor(
        math.log(uniform(t, "dist", s"cell$i")) / -(eps / 1)).toLong)
    }
    val p0 = draws.count(_ == 0L).toDouble / draws.size
    assert(math.abs(p0 - (1 - math.exp(-1.0))) < 0.02, s"P(G=0) = $p0")
    // tail ratio P(G>=k+1)/P(G>=k) = alpha for every k (geometric
    // memorylessness) — check the first three ratios empirically
    for (k <- 0 to 2) {
      val a = draws.count(_ >= k + 1).toDouble / draws.count(_ >= k)
      assert(math.abs(a - math.exp(-1.0)) < 0.05, s"tail ratio at $k: $a")
    }
  }

  test("(eps, sensitivity) accounting: likelihood ratios bounded by e^eps") {
    // the mechanism's pmf is P(Z=z) = (1-a)/(1+a) * a^|z|; neighboring
    // databases shift a count by at most Delta, so the worst ratio is
    // a^(-Delta) = e^eps. Verify numerically over a wide output window
    // for several (eps, Delta).
    for ((eps, delta) <- Seq((0.5, 1), (1.0, 1), (1.0, 2), (3.0, 1))) {
      val a = math.exp(-(eps / delta))
      def pmf(z: Long): Double = (1 - a) / (1 + a) * math.pow(a, math.abs(z))
      val worst = (for {
        z <- -50L to 50L
        shift <- 1 to delta // neighboring true counts differ by <= Delta
      } yield pmf(z) / pmf(z - shift)).max
      assert(worst <= math.exp(eps) + 1e-9,
        s"eps=$eps delta=$delta worst ratio $worst")
      // and the bound is TIGHT (attained in the tail), so the epsilon
      // accounting is exact, not conservative
      assert(worst > math.exp(eps) - 1e-6)
    }
  }

  test("seed changes the release; true counts never appear in the output") {
    val df = Seq(("en", "a"), ("en", "a"), ("de", "b")).toDF("lang", "source")
    val r1 = Privacy.dpCounts(df, Seq("lang", "source"), 1.0, "s1")
    val r2 = Privacy.dpCounts(df, Seq("lang", "source"), 1.0, "s2")
    assert(r1.columns.toSeq ===
      Seq("lang", "source", "noisy_n", "eps", "sensitivity"))
    val n1 = r1.orderBy("lang").select("noisy_n").as[Long].collect().toSeq
    val n2 = r2.orderBy("lang").select("noisy_n").as[Long].collect().toSeq
    assert(n1 !== n2) // different seeds, different noise
  }

  test("guards: eps domain, sensitivity domain") {
    val df = Seq(("en", "a")).toDF("lang", "source")
    intercept[IllegalArgumentException] {
      Privacy.dpCounts(df, Seq("lang"), eps = 0.0, seed = "x")
    }
    intercept[IllegalArgumentException] {
      Privacy.dpCounts(df, Seq("lang"), eps = 1.0, seed = "x",
        sensitivity = 0)
    }
  }
}
