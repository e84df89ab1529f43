package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Weekday-profile seasonal adjustment (r13, L143). Pins the phase
  * medians, the residual Hampel verdict, the motivating contrast with
  * the trailing screen (a rhythmic quiet day must NOT flag), a
  * plain-Scala replay, and the degenerate conventions. */
class TrendSeasonalSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L

  /** One event row per unit of count, on the given day index. */
  private def events(counts: Seq[(Long, Long)]): Seq[(String, Long)] =
    counts.flatMap { case (x, n) =>
      (0L until n).map(i => ("g", x * Day + i))
    }

  private def run(counts: Seq[(Long, Long)], k: Int = 3000) =
    Trend.weekdayAdjustedAnomaly(
      events(counts).toDF("g", "us"), "g", col("us"), k)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getInt(6))).toMap

  test("rhythmic quiet phases do not flag; an injected spike does") {
    // 4 weeks of a hard rhythm: phases 0-4 at 10, phases 5-6 at 2,
    // plus one spiked day (day 9, phase 2) at 60
    val counts = (0L until 28L).map { x =>
      x -> (if (x == 9L) 60L else if (x % 7 < 5) 10L else 2L)
    }
    val got = run(counts)
    assert(got(9L)._5 === 1, "the spike must flag")
    assert(got.filterNot(_._1 == 9L).values.forall(_._5 === 0),
      "no rhythmic day may flag — the weekly profile absorbs the 2s")
    // phase medians: phase 2 carries the spike but its median is the
    // lower median of {10,10,10,60} = 10, so the residual is 50
    assert(got(9L)._3 === 10L && got(9L)._4 === 50L)
    // quiet phases read their own median
    assert(got(5L)._3 === 2L && got(5L)._4 === 0L)
  }

  test("the trailing MadAnomaly screen DOES flag the rhythm (contrast)") {
    // same series without the spike: the 7-day trailing screen flags
    // the weekend cliff repeatedly — the blindness L143 exists to fix
    val counts = (0L until 28L).map(x =>
      x -> (if (x % 7 < 5) 10L else 2L))
    val trailing = Trend.dailyVolumeMadAnomaly(
        events(counts).toDF("g", "us"), "g", col("us"),
        window = 7, kMilli = 3000)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(5)) -1 else r.getInt(5))).toMap
    assert(trailing.values.count(_ == 1) >= 3,
      s"the trailing screen should repeatedly flag the rhythm: $trailing")
    val seasonal = run(counts)
    assert(seasonal.values.forall(_._5 === 0),
      "the seasonal screen must stay quiet on a pure rhythm")
  }

  test("plain-Scala replay on a seeded series") {
    val rnd = new scala.util.Random(41)
    val counts = (0L until 35L).map(x =>
      x -> (5L + (x % 7) + rnd.nextInt(3)))
    val got = run(counts)
    def lowerMed(xs: Seq[Long]): Long = {
      val s = xs.sorted; s((s.size + 1) / 2 - 1)
    }
    val byPhase = counts.groupBy(_._1 % 7)
      .view.mapValues(cs => lowerMed(cs.map(_._2))).toMap
    val resid = counts.map { case (x, y) => x -> (y - byPhase(x % 7)) }
    val medR = lowerMed(resid.map(_._2))
    val madR = lowerMed(resid.map(r => math.abs(r._2 - medR)))
    for ((x, y) <- counts) {
      val r = y - byPhase(x % 7)
      val anom = if (math.abs(r - medR) * 1000 > 3000L * madR) 1 else 0
      assert(got(x) === ((y, x % 7, byPhase(x % 7), r, anom)), s"day $x")
    }
  }

  test("a phase observed once reads its own median; residual 0") {
    val counts = Seq(0L -> 9L, 1L -> 4L, 2L -> 6L) // 3 days, 3 phases
    val got = run(counts)
    assert(got.values.forall(v => v._3 === v._1 && v._4 === 0L))
    assert(got.values.forall(_._5 === 0), "all residuals 0: no flags")
  }

  test("mad_r = 0: any deviating residual flags (documented Hampel edge)") {
    // phases repeat exactly except one day: residuals {0,...,0, 5}
    val counts = (0L until 14L).map(x =>
      x -> (if (x == 13L) 12L else 7L))
    val got = run(counts)
    assert(got(13L)._5 === 1 &&
      got.filterNot(_._1 == 13L).values.forall(_._5 === 0))
  }
}
