package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.PaginatedRest.RefreshingToken

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAggregate: same result as a plain groupBy on skewed data") {
    // one hot key with 10k rows, 100 cold keys with 10 each
    val rows = (1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).flatMap(k => (1 to 10).map(i => (s"k$k", i.toDouble)))
    val df = rows.toDF("k", "v").repartition(8)
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedAggregate(df, Seq("k"), salt = 16,
        partialAggs = Seq(sum("v").as("s"), count(lit(1)).as("n")),
        mergeAggs = Seq(sum("s").as("s"), sum("n").cast("long").as("n")))
      .as[(String, Double, Long)].collect().toSet
    assert(salted.map(r => (r._1, r._3)) == plain.map(r => (r._1, r._3)))
    // sums can reassociate differently; compare at fp tolerance
    val ps = plain.map(r => r._1 -> r._2).toMap
    salted.foreach { case (k, s, _) => assert(math.abs(s - ps(k)) < 1e-6) }
  }

  test("explodeJoinSmallSide: row-preserving salted join on a hot key") {
    val big = ((1 to 5000).map(_ => ("hot", 1)) ++
      (1 to 50).map(i => (s"k$i", i))).toDF("k", "v")
    val small = (Seq("hot") ++ (1 to 50).map(i => s"k$i"))
      .map(k => (k, s"dim_$k")).toDF("k", "d")
    val joined = Skew.explodeJoinSmallSide(big, small, "k", salt = 8)
    assert(joined.count() == big.count()) // exactly one match per big row
    assert(joined.filter(col("k") === "hot")
      .filter(col("d") =!= "dim_hot").count() == 0)
  }

  test("hotKeyShare: reservoir sees a hot key CLUSTERED AWAY from partition heads") {
    // the shape a head-only probe misses: every partition starts with
    // uniform keys and carries the bot's burst later in its iterator —
    // the reservoir weights all rows, so the ~89% hot share is seen
    val rows = (0 until 10).flatMap { p =>
      (0 until 110).map(i => s"u${p * 110 + i}") ++ // uniform heads
        Seq.fill(890)("hot")
    }
    val df = spark.sparkContext.parallelize(rows, 10).toDF("k")
    val share = Skew.hotKeyShare(df)
    assert(share > Skew.AutoChunkHotShare,
      f"clustered hot key must be detected, probe read $share%.3f")
    // and near-zero on genuinely uniform keys, whatever the layout
    val uni = spark.sparkContext.parallelize(
      (0 until 10000).map(i => s"k${i % 500}"), 10).toDF("k")
    assert(Skew.hotKeyShare(uni) < 0.1)
  }

  test("hotKeyShare: wide inputs probe a bounded partition subset (VERDICT r6 #3)") {
    // 200 partitions — over 3× the 64-partition budget; the strided
    // sample must still see a hot key clustered AWAY from partition 0
    val hotWide = (0 until 200).flatMap { p =>
      if (p >= 50) Seq.fill(100)("hot")
      else (0 until 100).map(i => s"u${p * 100 + i}")
    }
    val share = Skew.hotKeyShare(
      spark.sparkContext.parallelize(hotWide, 200).toDF("k"))
    assert(share > Skew.AutoChunkHotShare,
      f"hot key over 150/200 partitions must be detected, read $share%.3f")
    // and a uniform wide input stays cold through the sampled path
    val uniWide = spark.sparkContext.parallelize(
      (0 until 20000).map(i => s"k${i % 1000}"), 200).toDF("k")
    assert(Skew.hotKeyShare(uniWide) < 0.1)
  }

  test("hotKeyShare: partition-size weighting sees a hot key packed into few big partitions") {
    // 2 huge all-hot partitions (5000 rows each) among 8 small uniform
    // ones (100 rows) — true hot share 10000/10800 ≈ 0.93. An
    // UNWEIGHTED per-partition sample would read 2/10 = 0.2 and miss
    // it; the size-weighted estimator must not (this is the parquet
    // reality: a constant hot key compresses into fewer, bigger splits)
    // one seed element per partition, expanded in place — parallelize
    // on the flat row list would re-slice it evenly and erase the
    // unequal layout this test is about
    val df = spark.sparkContext.parallelize(0 until 10, 10).flatMap { p =>
      if (p == 3 || p == 7) Seq.fill(5000)("hot")
      else (0 until 100).map(i => s"u${p * 100 + i}")
    }.toDF("k")
    val share = Skew.hotKeyShare(df)
    assert(share > Skew.AutoChunkHotShare,
      f"size-weighted probe must see the packed hot key, read $share%.3f")
  }

  test("hotKeyShare: a borderline sample escalates to the full scan") {
    // 10 partitions, budget 5 → strides pick {0,2,4,6,8}. The hot key
    // fills partitions {0,2,5,7,9}: the sample reads exactly 2/5 = 0.40
    // — dead on the threshold, inside the escalation band — so the full
    // scan must run and report the true 5/10 = 0.50
    val hot = Set(0, 2, 5, 7, 9)
    val rows = (0 until 10).flatMap { p =>
      if (hot(p)) Seq.fill(100)("hot")
      else (0 until 100).map(i => s"u${p * 100 + i}")
    }
    val df = spark.sparkContext.parallelize(rows, 10).toDF("k")
    val share = Skew.hotKeyShare(df, maxParts = 5)
    assert(math.abs(share - 0.5) < 0.02,
      f"escalated probe must read the full-scan 0.50, got $share%.3f")
  }

  test("autoChunkWidth: sentinel timestamps overflow the span → plain plan (ADVICE r6)") {
    import org.apache.spark.sql.functions.col
    // all-hot key guarantees the probe trips; the Long.MinValue/MaxValue
    // sentinels overflow max−min+1 — the old code clamped width to 1
    // (one chunk per distinct timestamp); now the chunk plan must bow out
    val sentinels = ((0 until 1000).map(i => ("hot", i.toLong)) ++
      Seq(("hot", Long.MinValue), ("hot", Long.MaxValue)))
      .toDF("k", "ts").repartition(4)
    assert(Skew.autoChunkWidth(sentinels, Seq(col("k")), col("ts")).isEmpty)
    // positive control: the same data without sentinels sizes a width
    val plain = (0 until 1000).map(i => ("hot", i.toLong))
      .toDF("k", "ts").repartition(4)
    assert(Skew.autoChunkWidth(plain, Seq(col("k")), col("ts")).nonEmpty)
  }

  test("RefreshingToken: caches until expiry, refreshes after (S3)") {
    var now = 0L
    var fetches = 0
    val tp = new RefreshingToken(
      fetch = () => { fetches += 1; (s"tok$fetches", 10000L) },
      marginMs = 1000L, clock = () => now)
    assert(tp.token() == "tok1")
    now = 5000L
    assert(tp.token() == "tok1" && fetches == 1) // cached
    now = 9500L // past 10000-1000 margin
    assert(tp.token() == "tok2" && fetches == 2) // refreshed
  }
}
