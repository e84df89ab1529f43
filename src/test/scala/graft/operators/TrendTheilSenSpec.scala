package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Theil–Sen robust slope (r13, L146). Pins the exact pairwise-slope
  * median on a perfect line, the ~29% breakdown robustness (with the
  * OLS contrast), a plain-Scala replay with negative-slope truncation,
  * and the degenerate single-day NULL. */
class TrendTheilSenSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L

  private def events(counts: Seq[(Long, Long)]): Seq[(String, Long)] =
    counts.flatMap { case (x, n) =>
      (0L until n).map(i => ("g", x * Day + i))
    }

  private def run(counts: Seq[(Long, Long)]) = {
    val r = Trend.dailyVolumeTheilSen(
      events(counts).toDF("g", "us"), "g", col("us"))
      .collect().head
    (r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))
  }

  test("perfect line y = 3x + 7: slope 3e6, intercept 7e6, exactly") {
    val counts = (0L until 10L).map(x => x -> (3 * x + 7))
    assert(run(counts) === ((10L, 45L, Some(3000000L), Some(7000000L))))
  }

  test("2 of 10 wild days do not move the slope; OLS moves (contrast)") {
    val base = (0L until 10L).map(x => x -> (3 * x + 7))
    val wild = base.updated(4, 4L -> 500L).updated(7, 7L -> 1L)
    val (_, _, slope, _) = run(wild)
    assert(slope === Some(3000000L), "the median absorbs 20% corruption")
    val ols = Trend.dailyVolumeSlope(
      events(wild).toDF("g", "us"), "g", col("us"))
      .collect().head.getDouble(3)
    assert(math.abs(ols - 3.0) > 1.0,
      f"OLS must be dragged by the spikes, got $ols%.2f")
  }

  test("plain-Scala replay with a negative slope (truncation pinned)") {
    val counts = Seq(0L -> 90L, 2L -> 77L, 3L -> 80L, 5L -> 41L,
      6L -> 40L, 9L -> 11L)
    val (nDays, nPairs, slope, icept) = run(counts)
    val pairs = for {
      i <- counts.indices; j <- counts.indices
      if counts(i)._1 < counts(j)._1
    } yield 1000000L * (counts(j)._2 - counts(i)._2) /
      (counts(j)._1 - counts(i)._1)
    // NB: Scala / on Long truncates toward zero — exactly the Spark
    // div / DuckDB // semantics the operator uses
    def lowerMed(xs: Seq[Long]) = { val s = xs.sorted; s((s.size + 1) / 2 - 1) }
    val expS = lowerMed(pairs)
    val expI = lowerMed(counts.map { case (x, y) => 1000000L * y - expS * x })
    assert(nDays === 6L && nPairs === 15L)
    assert(slope === Some(expS) && expS < 0L)
    assert(icept === Some(expI))
  }

  test("a single observed day yields NULL slope and intercept") {
    assert(run(Seq(3L -> 42L)) === ((1L, 0L, None, None)))
  }
}
