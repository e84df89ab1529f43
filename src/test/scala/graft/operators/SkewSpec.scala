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
