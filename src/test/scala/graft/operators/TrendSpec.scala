package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrendSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L

  private def run(rows: Seq[(String, Long)]) =
    Trend.dailyVolumeSlope(rows.toDF("g", "us"), "g", col("us"))
      .orderBy(col("g"))
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq

  test("a linear ramp recovers its exact slope and intercept") {
    // group "up": day d carries d+1 events for d = 0..3 → y = x + 1
    val up = for (d <- 0L to 3L; i <- 0L to d)
      yield ("up", d * Day + i * 1000L)
    val got = run(up)
    assert(got === Seq(("up", 4L, 10L, Some(1.0), Some(1.0))))
  }

  test("a flat series has slope 0; single-day groups null out") {
    val rows = (for (d <- 0L until 5L; _ <- 1 to 3)
      yield ("flat", d * Day + 17L)) ++
      Seq(("one", 2 * Day), ("one", 2 * Day + 5L))
    val got = run(rows)
    assert(got(0) === (("flat", 5L, 15L, Some(0.0), Some(3.0))))
    assert(got(1) === (("one", 1L, 2L, None, None)))
  }

  test("pre-epoch timestamps floor to the previous day") {
    // -1 us is day -1, not day 0: one event each on days -1 and 0 →
    // slope over x ∈ {-1, 0}, y = {1, 2}
    val rows = Seq(("g", -1L), ("g", 1L), ("g", 2L))
    val got = run(rows)
    assert(got === Seq(("g", 2L, 3L, Some(1.0), Some(2.0))))
  }

  test("moment replay agreement on a seeded irregular series") {
    val rnd = new scala.util.Random(3)
    val rows = for (d <- 0L until 40L; _ <- 0 until (1 + rnd.nextInt(9)))
      yield ("g", d * Day + rnd.nextInt(1000000).toLong)
    val counts = rows.groupBy(r => r._2 / Day).view.mapValues(_.size).toMap
    val (m, sx, sy, sxx, sxy) = (counts.size.toLong,
      counts.keys.sum, counts.values.map(_.toLong).sum,
      counts.keys.map(x => x * x).sum,
      counts.map { case (x, y) => x * y }.sum)
    val slope = (m * sxy - sx * sy).toDouble / (m * sxx - sx * sx).toDouble
    val icept = (sy.toDouble - slope * sx.toDouble) / m.toDouble
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6 // round HALF_UP
    val got = run(rows)
    assert(got.head._2 === m && got.head._3 === sy)
    assert(math.abs(got.head._4.get - r6(slope)) < 1e-12)
    assert(math.abs(got.head._5.get - r6(icept)) < 1e-12)
  }
}
