package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def md5hex4(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(4)

  test("hashSplit matches a reference MD5 computation row by row") {
    val got = Sampling.hashSplit(spark.range(100).toDF("id"), col("id"), splits)
      .select(col("id"), col("split")).as[(Long, String)].collect()
    got.foreach { case (id, split) =>
      val h = md5hex4(id.toString)
      val want =
        if (h < "cccc") "train" else if (h < "e666") "val" else "test"
      assert(split === want, s"id=$id hex4=$h")
    }
  }

  test("hashSplit is a total partition, stable under repartitioning") {
    val base = spark.range(2000).toDF("id")
    val a = Sampling.hashSplit(base, col("id"), splits)
      .as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(base.repartition(13), col("id"), splits)
      .as[(Long, String)].collect().toMap
    assert(a.size === 2000 && a === b) // every row, same fate, any layout
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("hashSplit fractions land near the requested ratios") {
    val n = 20000
    val counts = Sampling.hashSplit(spark.range(n).toDF("id"), col("id"), splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.02)
    assert(math.abs(counts("val").toDouble / n - 0.1) < 0.01)
    assert(math.abs(counts("test").toDouble / n - 0.1) < 0.01)
  }

  test("sampleByHash: nested thresholds give nested samples; rate 1 is identity") {
    val base = spark.range(5000).toDF("id")
    val s30 = Sampling.sampleByHash(base, col("id"), 0.3)
      .as[Long].collect().toSet
    val s60 = Sampling.sampleByHash(base, col("id"), 0.6)
      .as[Long].collect().toSet
    assert(s30.subsetOf(s60), "a smaller rate must be a subset of a larger one")
    assert(Sampling.sampleByHash(base, col("id"), 1.0).count() === 5000)
    assert(math.abs(s60.size / 5000.0 - 0.6) < 0.03)
  }

  test("mixture: rate-1.0 groups keep every row; sampled groups match sampleByHash") {
    val df = (0 until 2000).map(i => (if (i % 2 == 0) "full" else "qtr",
      i.toLong)).toDF("src", "id")
    val kept = Sampling.mixture(df, "src", col("id"),
        Map("full" -> 1.0), defaultRate = 0.25)
      .as[(String, Long)].collect()
    val (full, qtr) = kept.partition(_._1 == "full")
    assert(full.length === 1000, "rate 1.0 must keep ALL rows (hex 'ffff' included)")
    // the sampled group must agree row-for-row with the standalone sampler
    val expectQtr = Sampling.sampleByHash(df.filter(col("src") === "qtr"),
      col("id"), 0.25).as[(String, Long)].collect().toSet
    assert(qtr.toSet === expectQtr)
    assert(math.abs(qtr.length / 1000.0 - 0.25) < 0.04)
  }

  test("hashSplit drops null keys like its sibling samplers") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("id")
    val got = Sampling.hashSplit(df, col("id"), splits)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L),
      "null-key rows must be dropped, not silently assigned to the last split")
  }

  test("hashSplit rejects bad fraction sets") {
    val df = spark.range(1).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, col("id"), Seq("a" -> 0.9, "b" -> 0.2))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, col("id"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, col("id"), Seq("a" -> 0.5, "b" -> -0.1))
    }
  }

  test("hashSplit/sampleByHash stay shuffle-free (narrow projection/filter)") {
    val df = Sampling.sampleByHash(
      Sampling.hashSplit(spark.range(100).toDF("id"), col("id"), splits),
      col("id"), 0.5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("capPerGroup keeps exactly the hash-smallest N keys of each group") {
    val rows = (0 until 300).map(i => (s"g${i % 3}", i.toLong))
    val df = rows.toDF("src", "id")
    val got = Sampling.capPerGroup(df, "src", col("id"), 7)
      .as[(String, Long)].collect().toSet
    // .toSeq first: Map.flatMap over tuple results would rebuild a Map
    // and collapse each group's picks to one entry
    val want = rows.groupBy(_._1).toSeq.flatMap { case (_, members) =>
      members.sortBy { case (_, id) => (md5hex(s"cap:$id"), id) }.take(7)
    }.toSet
    assert(got === want)
    // stability: a different physical layout keeps the SAME rows
    val again = Sampling.capPerGroup(df.repartition(17), "src", col("id"), 7)
      .as[(String, Long)].collect().toSet
    assert(again === got)
  }

  test("capPerGroup leaves groups under the cap intact and drops null keys") {
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None),
      ("b", Some(3L))).toDF("src", "id")
    val got = Sampling.capPerGroup(df, "src", col("id"), 5)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L))
  }

  test("capPerGroup composes with hashSplit without bias (domain-separated hashes)") {
    // REGRESSION: when the cap ranked by the same md5(key) hexBucket uses,
    // the kept subset was exactly the low-bucket rows and an 80/10/10
    // split of the capped set came out ~99/1/0
    val capped = Sampling.capPerGroup(
      spark.range(5000).select(lit("g").as("src"), col("id")),
      "src", col("id"), 1000)
    val counts = Sampling.hashSplit(capped, col("id"), splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts.getOrElse("train", 0L) / 1000.0 - 0.8) < 0.05)
    assert(math.abs(counts.getOrElse("val", 0L) / 1000.0 - 0.1) < 0.04)
    assert(math.abs(counts.getOrElse("test", 0L) / 1000.0 - 0.1) < 0.04)
  }

  test("capPerGroup plans as a WindowGroupLimit (map-side per-group top-k)") {
    // the rank<=k filter must rewrite to WindowGroupLimit so a hot group
    // ships ~k rows per map task, not the whole group, through the shuffle
    val df = Sampling.capPerGroup(
      spark.range(1000).select((col("id") % 5).cast("string").as("src"),
        col("id")), "src", col("id"), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("capTokensPerGroup: fills each group in budget-hash order, crossing row kept") {
    val df = (1 to 20).map(i => (if (i <= 10) "a" else "b", i.toLong, 100L))
      .toDF("g", "id", "toks")
    val got = Sampling.capTokensPerGroup(df, "g", col("id"), col("toks"), 350L)
      .select(col("g"), col("id")).as[(String, Long)].collect()
    // budget 350 over 100-token docs: 3 full + the crossing 4th per group
    assert(got.count(_._1 == "a") === 4 && got.count(_._1 == "b") === 4)
    // membership is exactly the 4 hash-smallest ids of each group under
    // the "budget:" domain — reference recomputation
    for ((g, ids) <- got.groupBy(_._1)) {
      val pool = if (g == "a") (1L to 10L) else (11L to 20L)
      val want = pool.sortBy(i => (md5hex(s"budget:$i"), i)).take(4).toSet
      assert(ids.map(_._2).toSet === want, s"group $g")
    }
    // budget larger than the group keeps everything; null tokens drop
    val all = Sampling.capTokensPerGroup(df, "g", col("id"), col("toks"), 100000L)
    assert(all.count() === 20)
    val withNull = df.withColumn("toks",
      when(col("id") === 1L, lit(null)).otherwise(col("toks")))
    assert(Sampling.capTokensPerGroup(withNull, "g", col("id"), col("toks"),
      100000L).count() === 19)
  }

  test("capTokensPerGroup: kept set is prefix-stable as the budget grows") {
    val rnd = new scala.util.Random(61)
    val df = (1 to 200).map(i =>
      (s"s${i % 3}", i.toLong, rnd.nextInt(50) + 1L)).toDF("g", "id", "toks")
    val small = Sampling.capTokensPerGroup(df, "g", col("id"), col("toks"), 300L)
      .select("id").as[Long].collect().toSet
    val big = Sampling.capTokensPerGroup(df, "g", col("id"), col("toks"), 900L)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big), "raising the budget must only ADD rows")
  }

  test("stratifiedSplit: every stratum honors the fractions to ±1 row") {
    // deliberately small, imbalanced strata — the case hashSplit drifts on
    val df = ((1 to 30).map(i => ("small", i.toLong)) ++
      (31 to 530).map(i => ("big", i.toLong))).toDF("g", "id")
    val got = Sampling.stratifiedSplit(df, "g", col("id"), splits)
    val counts = got.groupBy(col("g"), col("split")).count()
      .as[(String, String, Long)].collect()
      .map { case (g, s, n) => (g, s) -> n }.toMap
    // floor(30*0.8*65536/65536)=floor(30*52428/65536)=23 (52428/65536 =
    // 0.79999…); cumulative val boundary floor(30*58981/65536)=26
    assert(counts(("small", "train")) === 23)
    assert(counts(("small", "val")) === 3)
    assert(counts(("small", "test")) === 4)
    assert(counts(("big", "train")) === 399) // floor(500*52428/65536)
    assert(counts(("big", "val")) === 50)
    assert(counts(("big", "test")) === 51)
    // assignment is rank-based on the "strat:" hash — reference check
    val smallTrain = got.filter(col("g") === "small" && col("split") === "train")
      .select("id").as[Long].collect().toSet
    val want = (1L to 30L).sortBy(i => (md5hex(s"strat:$i"), i)).take(23).toSet
    assert(smallTrain === want)
    // fractions must PARTITION the stratum — a sum below 1 would silently
    // hand the last split the remainder instead of its nominal fraction
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSplit(df, "g", col("id"),
        Seq("train" -> 0.5, "test" -> 0.2))
    }
  }

  test("shuffleShard: shards are hash-range buckets and ranks are the within-shard hash order") {
    val df = spark.range(500).toDF("id")
    val got = Sampling.shuffleShard(df, col("id"), shards = 8, seed = 42)
      .select(col("id"), col("shard"), col("shuffle_rank"))
      .as[(Long, Int, Long)].collect()
    assert(got.length === 500)
    val withHash = got.map { case (id, sh, rk) =>
      (id, sh, rk, md5hex(s"42:$id")) }
    withHash.foreach { case (id, sh, _, h) =>
      val bucket = Integer.parseInt(h.take(4), 16)
      assert(sh === bucket * 8 / 65536, s"id=$id hex4=${h.take(4)}")
    }
    // within each shard, rank order == hash order, ranks contiguous from 1
    withHash.groupBy(_._2).foreach { case (_, members) =>
      val byRank = members.sortBy(_._3)
      assert(byRank.map(_._3).toSeq === (1 to members.length).map(_.toLong))
      assert(byRank.map(_._4).toSeq === members.map(_._4).sorted.toSeq)
    }
    // concatenating shards in rank order reproduces the GLOBAL hash order
    val concat = withHash.sortBy { case (_, sh, rk, _) => (sh, rk) }.map(_._1)
    val global = withHash.sortBy(_._4).map(_._1)
    assert(concat.toSeq === global.toSeq,
      "shard-then-rank order must equal the global hash permutation")
  }

  test("writeShuffled: one file per shard; in-file row order replays the permutation") {
    val dir = tmpDir("shuf")
    val df = spark.range(300).toDF("id")
    Sampling.writeShuffled(df, col("id"), shards = 4, seed = 9, dir)
    val want = Sampling.shuffleShard(df, col("id"), shards = 4, seed = 9)
      .orderBy(col("shard"), col("shuffle_rank"))
      .select("id").as[Long].collect().toSeq
    val got = (0 until 4).flatMap { k =>
      val files = new java.io.File(s"$dir/shard=$k").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"shard $k must be exactly one file")
      // one small file → one input partition → collect preserves file order
      val rows = spark.read.parquet(files.head.toString)
        .select("id", "shuffle_rank").as[(Long, Long)].collect()
      assert(rows.map(_._2).toSeq === (1 to rows.length).map(_.toLong),
        s"shard $k file order must be rank order")
      rows.map(_._1)
    }
    assert(got === want, "loader order (shard asc, file order) must equal the permutation")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("shuffleShard: a different seed is a different permutation; same seed is stable") {
    val df = spark.range(200).toDF("id")
    def perm(seed: Long, d: org.apache.spark.sql.DataFrame) =
      Sampling.shuffleShard(d, col("id"), shards = 4, seed = seed)
        .orderBy(col("shard"), col("shuffle_rank"))
        .select("id").as[Long].collect().toSeq
    val p1 = perm(7, df)
    assert(p1 === perm(7, df.repartition(11)), "layout must not change the order")
    assert(p1 !== perm(8, df), "a new seed must re-shuffle")
    intercept[IllegalArgumentException] {
      Sampling.shuffleShard(df, col("id"), shards = 0, seed = 1)
    }
    // boundary shard count: bucket*shards must not overflow int (ANSI
    // would throw); every shard id stays inside [0, shards)
    val bounds = Sampling.shuffleShard(df, col("id"), shards = 65536, seed = 1)
      .agg(min(col("shard")), max(col("shard"))).as[(Int, Int)].head()
    assert(bounds._1 >= 0 && bounds._2 < 65536)
  }

  // ---- gumbelTopK (seeded weighted sampling without replacement) ----

  /** Exact reference replay: md5-derived 52-bit uniform, Gumbel key,
    * half-up floor to 1e-4, ties by id. */
  private def gumbelReference(rows: Seq[(Long, Long)], k: Int,
      seed: String): Seq[(Long, Long)] = {
    def keyE4(id: Long, wE4: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"gum:$seed:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val u = (java.lang.Long.parseLong(md, 16) + 0.5) / 4503599627370496.0
      math.floor((wE4.toDouble / 10000.0 - math.log(-math.log(u))) *
        10000.0 + 0.5).toLong
    }
    rows.map { case (id, w) => (id, keyE4(id, w)) }
      .sortBy { case (id, key) => (-key, id) }.take(k)
  }

  test("gumbelTopK replays the exact reference keys on a seeded fixture") {
    val rows = (1L to 200L).map(i => (i, (i % 17) * 2500L - 10000L))
    val got = Sampling.gumbelTopK(rows.toDF("id", "w_e4"), "id", "w_e4",
        k = 25, seed = "s1")
      .select(col("id"), col("gumbel_key_e4"))
      .as[(Long, Long)].collect().toSeq
    assert(got === gumbelReference(rows, 25, "s1"))
  }

  test("gumbelTopKPerGroup: per-group reference replay, exactly k per group") {
    val rnd = new scala.util.Random(75)
    val rows = (1L to 300L).map(i =>
      (i, s"g${i % 7}", rnd.nextInt(30000).toLong - 10000L))
    val k = 4
    val got = Sampling.gumbelTopKPerGroup(
        rows.toDF("id", "g", "w_e4"), "g", "id", "w_e4", k, seed = "s2")
      .select(col("g"), col("rank"), col("id"), col("gumbel_key_e4"))
      .as[(String, Int, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    val want = rows.groupBy(_._2).toSeq.flatMap { case (g, grp) =>
      gumbelReference(grp.map(r => (r._1, r._3)), k, "s2").zipWithIndex
        .map { case ((id, key), i) => (g, i + 1, id, key) }
    }.sortBy(r => (r._1, r._2))
    assert(got === want)
    assert(got.groupBy(_._1).values.forall(_.size == k))
  }

  test("gumbelTopK: same seed is stable; different seed is a different sample") {
    val rows = (1L to 500L).map(i => (i, 0L)) // uniform weights
    def ids(seed: String) = Sampling.gumbelTopK(rows.toDF("id", "w_e4"),
      "id", "w_e4", k = 50, seed = seed).select("id").as[Long].collect().toSet
    assert(ids("a") === ids("a"))
    assert(ids("a") !== ids("b"))
  }

  test("gumbelTopK samples proportionally: heavy items dominate across seeds") {
    // 10 items at weight e^4, 490 at weight 1 (w_e4 = 40000 vs 0): each
    // heavy item is ~e^4 ≈ 55x likelier per draw; over 20 seeds x k=20
    // the heavy ids must win far more often than uniform would give.
    val rows = (1L to 500L).map(i => (i, if (i <= 10) 40000L else 0L))
    val df = rows.toDF("id", "w_e4")
    val heavyWins = (1 to 20).map { s =>
      Sampling.gumbelTopK(df, "id", "w_e4", k = 20, seed = s"seed$s")
        .select("id").as[Long].collect().count(_ <= 10)
    }.sum
    // uniform sampling would give E[heavy] = 20*20*(10/500) = 8; the
    // weighted draw ~ 20*10*(55/(55*10+490)) ≈ 106 — assert a wide gap
    assert(heavyWins > 60, s"heavy ids won only $heavyWins/400 slots")
  }

  test("gumbelTopK composes with Dsir scores on real documents") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val scores = {
      val (w, tot) = Dsir.importanceWeights(docs,
        docs.filter($"lang" === "en"), "doc_id", "text", 1024)
      Dsir.score(docs, "doc_id", "text", w, tot, 1024)
    }
    val got = Sampling.gumbelTopK(scores, "doc_id", "score_e4",
        k = 30, seed = "r7")
      .select(col("doc_id"), col("gumbel_key_e4"))
      .as[(Long, Long)].collect().toSeq
    val rows = scores.select(col("doc_id"), col("score_e4"))
      .as[(Long, Long)].collect().toSeq
    assert(got === gumbelReference(rows, 30, "r7"))
    // the cached composed form is row-identical to the manual composition
    val composed = Dsir.sampleK(docs, docs.filter($"lang" === "en"),
        "doc_id", "text", 1024, k = 30, seed = "r7")
      .select(col("doc_id"), col("gumbel_key_e4"))
      .as[(Long, Long)].collect().toSeq
    assert(composed === got)
  }

  // ---------------------------------------------- temperatureMixture (L48)

  private def mixCounts(df: org.apache.spark.sql.DataFrame, budget: Long,
      alpha: Double): Map[String, Long] =
    Sampling.temperatureMixture(df, "g", col("id"), budget, alpha)
      .groupBy("g").count().as[(String, Long)].collect().toMap

  private def groupsOf(sizes: (String, Int)*) =
    sizes.flatMap { case (g, n) => (1 to n).map(i => (g, s"$g$i")) }
      .toDF("g", "id")

  test("temperatureMixture: exact Hamilton allocation, by hand") {
    // counts 100/25/4 → sqrt weights exactly 10/5/2 (×1e6): at B=17 the
    // base quotas are exact (10/5/2, no leftover); at B=18 the single
    // leftover seat goes to the largest remainder (a: rem 10e6 > b: 5e6
    // > c: 2e6) — worked by hand from the operator's own integer rule
    val df = groupsOf("a" -> 100, "b" -> 25, "c" -> 4)
    assert(mixCounts(df, 17, 0.5) === Map("a" -> 10L, "b" -> 5L, "c" -> 2L))
    assert(mixCounts(df, 18, 0.5) === Map("a" -> 11L, "b" -> 5L, "c" -> 2L))
  }

  test("temperatureMixture: alpha=1 is proportional; alpha<1 flattens") {
    val df = groupsOf("big" -> 320, "small" -> 20)
    val prop = mixCounts(df, 17, 1.0)
    // exact: w = n·1e6, base = 17·320/340 = 16, 17·20/340 = 1
    assert(prop === Map("big" -> 16L, "small" -> 1L))
    val flat = mixCounts(df, 17, 0.5)
    // sqrt weights 17.888544e6 / 4.472136e6: small's share rises — the
    // low-resource boost is the point of the α rule
    assert(flat("small") > prop("small") && flat("big") < prop("big"))
    assert(flat.values.sum === 17L)
  }

  test("temperatureMixture: a saturated group is capped at its row count") {
    // α=0.1 flattens hard: the 2-row group's quota exceeds 2 and is
    // LEAST-capped; the realized total undershoots the budget (documented
    // single-pass rule — no iterative redistribution)
    val df = groupsOf("a" -> 10000, "b" -> 2)
    val got = mixCounts(df, 20, 0.1)
    assert(got("b") === 2L)
    assert(got.values.sum < 20L)
  }

  test("temperatureMixture: no 64-bit overflow at large budget x group (review)") {
    // review-caught: with LONG products, budget 1e9 x a 10k-row group at
    // alpha=1 overflows (1e9 * 1e10 > Long.Max) and ANSI throws; the
    // DECIMAL(38,0) allocation must survive and stay exact
    val df = groupsOf("a" -> 10000, "b" -> 100)
    val got = Sampling.temperatureMixture(df, "g", col("id"),
        totalBudget = 1000000000L, alpha = 1.0)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    // budget dwarfs the corpus: every group saturates at its row count
    assert(got === Map("a" -> 10000L, "b" -> 100L))
  }

  test("temperatureMixture: randomized vs a Scala reference model") {
    // the operator's whole allocation, replayed in plain Scala BigInt
    // arithmetic + the md5 rank rule, on seeded random group sizes
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val sizes = (1 to 2 + rnd.nextInt(6))
        .map(i => s"g$i" -> (1 + rnd.nextInt(200))).toMap
      val budget = 1L + rnd.nextInt(150)
      val df = groupsOf(sizes.toSeq: _*)
      val got = mixCounts(df, budget, 0.5)

      // reference: quantized sqrt weights, Hamilton seats, cap at n
      val w = sizes.map { case (g, n) =>
        g -> BigInt(math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong)
      }
      val s = w.values.sum
      val base = w.map { case (g, wg) => g -> (BigInt(budget) * wg / s) }
      val rem = w.map { case (g, wg) => g -> (BigInt(budget) * wg % s) }
      val left = (BigInt(budget) - base.values.sum).toInt
      val seated = rem.toSeq.sortBy { case (g, r) => (-r, g) }
        .take(left).map(_._1).toSet
      val want = sizes.map { case (g, n) =>
        g -> math.min(n.toLong,
          (base(g) + (if (seated(g)) 1 else 0)).toLong)
      }.filter(_._2 > 0)
      assert(got === want, s"trial $trial sizes=$sizes budget=$budget")
    }
  }

  test("temperatureMixture: membership is stable under repartitioning") {
    val df = groupsOf("a" -> 100, "b" -> 25, "c" -> 4)
    val a = Sampling.temperatureMixture(df, "g", col("id"), 17, 0.5)
      .select("id").as[String].collect().toSet
    val b = Sampling.temperatureMixture(df.repartition(13), "g", col("id"),
        17, 0.5)
      .select("id").as[String].collect().toSet
    assert(a === b && a.size === 17)
  }

  test("temperatureMixture plans the selection as a WindowGroupLimit") {
    // the rank <= totalBudget LITERAL bound must rewrite to
    // WindowGroupLimit — map tasks ship ≤ budget rows per group, so a
    // 10⁹-row source never funnels into one sort task; the exact
    // per-group quota then applies above as a broadcast-joined filter
    val df = Sampling.temperatureMixture(
      groupsOf("a" -> 500, "b" -> 100), "g", col("id"), 30, 0.5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"expected the quota join to broadcast:\n${plan.take(3000)}")
  }
}
