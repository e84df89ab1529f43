package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact mass-weighted quantiles (r14, L156). Hand cases, the
  * ceiling-threshold convention at both ends, hygiene drops, the
  * mass-vs-count contrast the operator exists for, and a seeded
  * plain-Scala replay. (Rank convention differs from
  * MedianImpute.exactQuantiles' floor(p·(n−1)) by design — this is
  * the ceil(q·W) lower weighted quantile; both documented.) */
class WeightedQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], qs: Seq[Long]) =
    WeightedQuantiles.quantiles(
        rows.toDF("g", "v", "m"), "g", "v", col("m"), qs)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

  private def ref(rows: Seq[(Long, Long)], qPpm: Long): Long = {
    val sorted = rows.filter(_._2 > 0).sortBy(_._1)
    val wTot = sorted.map(_._2).sum
    val t = (wTot * qPpm + 999999L) / 1000000L
    var cum = 0L
    sorted.find { case (_, m) => cum += m; cum >= t }.get._1
  }

  test("hand case: one heavy value owns the median") {
    // (1,w1) (2,w1) (3,w98): the p50 CHARACTER lives in value 3
    val got = run(Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 98L)),
      Seq(10000L, 500000L))
    assert(got(("g", 500000L)) === ((100L, 3L)))
    assert(got(("g", 10000L)) === ((100L, 1L)), "t=1 → smallest value")
  }

  test("q = 1e6 is the max; threshold ceiling is exact at boundaries") {
    // W=4, q=750000 → t = ceil(3.0) = 3 exactly (not 4)
    val got = run(Seq(("g", 10L, 1L), ("g", 20L, 1L), ("g", 30L, 1L),
      ("g", 40L, 1L)), Seq(750000L, 1000000L))
    assert(got(("g", 750000L))._2 === 30L)
    assert(got(("g", 1000000L))._2 === 40L)
  }

  test("null/zero/negative masses drop; massless groups emit nothing") {
    val df = Seq(("a", 1L, Some(5L)), ("a", 2L, Some(0L)),
      ("a", 3L, Some(-4L)), ("a", 9L, None),
      ("b", 7L, Some(0L))).toDF("g", "v", "m")
    val got = WeightedQuantiles.quantiles(df, "g", "v", col("m"),
      Seq(500000L)).collect()
    assert(got.length === 1)
    assert(got.head.getString(0) === "a" && got.head.getLong(3) === 1L)
  }

  test("mass-weighted median exceeds the count median under skew") {
    // many short docs, few huge ones — the statistic's raison d'être
    val rows = (1 to 50).map(i => ("g", 100L, 100L)) ++
      Seq(("g", 10000L, 10000L), ("g", 12000L, 12000L))
    val mass = run(rows, Seq(500000L))(("g", 500000L))._2
    val count = run(rows.map { case (g, v, _) => (g, v, 1L) },
      Seq(500000L))(("g", 500000L))._2
    assert(count === 100L && mass === 10000L,
      s"count-median $count, mass-median $mass")
  }

  test("plain-Scala replay, seeded, multiple groups and quantiles") {
    val rnd = new scala.util.Random(43)
    val rows = (0 until 300).map(i =>
      (s"g${i % 3}", rnd.nextInt(500).toLong, rnd.nextInt(50).toLong))
    val qs = Seq(100000L, 500000L, 990000L)
    val got = run(rows, qs)
    for (g <- Seq("g0", "g1", "g2"); q <- qs) {
      val expect = ref(rows.filter(_._1 == g).map(r => (r._2, r._3)), q)
      assert(got((g, q))._2 === expect, s"$g q=$q")
    }
  }

  test("bad quantiles and reserved collisions are guarded") {
    val df = Seq(("a", 1L, 1L)).toDF("g", "v", "m")
    intercept[IllegalArgumentException] {
      WeightedQuantiles.quantiles(df, "g", "v", col("m"), Seq(0L))
    }
    intercept[IllegalArgumentException] {
      WeightedQuantiles.quantiles(df, "g", "v", col("m"),
        Seq(500000L, 500000L))
    }
    val bad = Seq((1L, 2L, 3L)).toDF("q_ppm", "v", "m")
    val e = intercept[IllegalArgumentException] {
      WeightedQuantiles.quantiles(bad, "q_ppm", "v", col("m"),
        Seq(500000L))
    }
    assert(e.getMessage.contains("reserves column name"))
  }
}
