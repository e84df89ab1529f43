package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: edges half-open, underflow/overflow reported, nulls dropped") {
    val df = Seq[(String, Option[Long])](
      ("a", Some(0L)),   // bin 0 (lo edge inclusive)
      ("a", Some(24L)),  // bin 0
      ("a", Some(25L)),  // bin 1 (edge belongs right)
      ("a", Some(99L)),  // bin 3
      ("a", Some(100L)), // overflow (hi exclusive)
      ("a", Some(-1L)),  // underflow
      ("a", None),       // dropped
      ("b", Some(50L))   // bin 2
    ).toDF("g", "v")
    val got = QualityReport.histogram(df, Seq("g"), "v", 0L, 100L, 4)
      .orderBy(col("g"), col("bin"))
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", -1, 1L, -1L, -1L),
      ("a", 0, 2L, 0L, 24L),
      ("a", 1, 1L, 25L, 25L),
      ("a", 3, 1L, 99L, 99L),
      ("a", 4, 1L, 100L, 100L),
      ("b", 2, 1L, 50L, 50L)))
  }

  test("2^63-scale values: decimal product cannot overflow (hash-valued column)") {
    val df = Seq(Long.MaxValue - 1, Long.MinValue + 1, 0L).toDF("v")
    val got = QualityReport.histogram(df, Seq.empty, "v",
        Long.MinValue / 2, Long.MaxValue / 2, 1024)
      .orderBy(col("bin"))
      .as[(Int, Long, Long, Long)].collect().toSeq
    // extremes land in the under/overflow bins; zero in the exact middle
    assert(got.map(_._1) === Seq(-1, 512, 1024))
    assert(got.map(_._2) === Seq(1L, 1L, 1L))
  }

  test("property: bins partition the range; counts reconcile (seeded)") {
    val rnd = new scala.util.Random(67)
    val vals = (1 to 500).map(_ => rnd.nextLong() % 1000L)
    val df = vals.toDF("v")
    val (lo, hi, bins) = (-400L, 600L, 7)
    val got = QualityReport.histogram(df, Seq.empty, "v", lo, hi, bins)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got.map(_._2).sum === 500L)
    val expected = vals.groupBy { v =>
      if (v < lo) -1
      else if (v >= hi) bins
      else ((BigInt(v - lo) * bins) / (hi - lo)).toInt
    }.map { case (b, vs) => (b, vs.size.toLong, vs.min, vs.max) }
    assert(got.toSet === expected.toSet)
    // every interior bin's [min_v, max_v] stays inside its edges
    got.filter(r => r._1 >= 0 && r._1 < bins).foreach { case (b, _, mn, mx) =>
      assert(mn >= lo + b * (hi - lo) / bins - 1)
      assert(mx < lo + (b + 1) * (hi - lo) / bins + 1)
    }
  }
}
