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

  private def runMk(rows: Seq[(String, Long)]) =
    Trend.dailyVolumeMannKendall(rows.toDF("g", "us"), "g", col("us"))
      .orderBy(col("g"))
      .as[(String, Long, Long, Long)].collect().toSeq

  // driver reference: brute-force S and tie-adjusted 18·Var(S)
  private def mkReference(counts: Map[Long, Long]) = {
    val xs = counts.keys.toSeq.sorted
    val s = (for (i <- xs.indices; j <- i + 1 until xs.size)
      yield java.lang.Long.signum(counts(xs(j)) - counts(xs(i))).toLong)
      .sum
    val n = xs.size.toLong
    val tieSum = counts.values.groupBy(identity).values
      .map(g => g.size.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    (n, s, n * (n - 1) * (2 * n + 5) - tieSum)
  }

  test("Mann–Kendall: monotone ramp gives S = n(n-1)/2, full-tie variance 0") {
    // strictly increasing daily counts, no ties: every pair votes +1
    val up = for (d <- 0L to 4L; i <- 0L to d)
      yield ("up", d * Day + i)
    assert(runMk(up) === Seq(("up", 5L, 10L, 5L * 4 * 15)))
    // all-equal counts: S = 0 and the tie adjustment cancels Var to 0
    val flat = for (d <- 0L until 4L) yield ("flat", d * Day)
    assert(runMk(flat) === Seq(("flat", 4L, 0L, 0L)))
  }

  test("Mann–Kendall: outlier robustness vs OLS, 1-day group, seeded parity") {
    // a single 100× spike day: |S| moves by at most n-1 from the flat 0
    val spiky = (for (d <- 0L until 9L) yield ("s", d * Day)) ++
      (1 to 100).map(_ => ("s", 4L * Day + 7L))
    val (_, sGot, _) = mkReference(Map((0L until 9L).map(d =>
      d -> (if (d == 4L) 101L else 1L)): _*))
    assert(math.abs(sGot) <= 8L)
    assert(runMk(spiky) === Seq(("s", 9L, sGot,
      mkReference(Map((0L until 9L).map(d =>
        d -> (if (d == 4L) 101L else 1L)): _*))._3)))
    // 1-day group: no pairs, S = 0, var18 = 0 (n(n-1)(2n+5) = 0 = ties)
    assert(runMk(Seq(("one", Day), ("one", Day + 3L))) ===
      Seq(("one", 1L, 0L, 0L)))
    // seeded irregular series with ties: engine ≡ brute force
    val rnd = new scala.util.Random(21)
    val rows = for (d <- 0L until 30L; _ <- 0 until (1 + rnd.nextInt(4)))
      yield ("g", d * Day + rnd.nextInt(100000).toLong)
    val counts = rows.groupBy(_._2 / Day).view
      .mapValues(_.size.toLong).toMap
    val (n, s, v) = mkReference(counts)
    assert(runMk(rows) === Seq(("g", n, s, v)))
  }

  // ------------------------------------------------- MAD anomaly (L100)

  /** Events with `counts(d)` records on day d for one group. */
  private def series(counts: Seq[Long]): Seq[(String, Long)] =
    counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c.toInt)(("g", d * Day + 1000L)) }

  private def runMad(rows: Seq[(String, Long)], window: Int = 7) =
    Trend.dailyVolumeMadAnomaly(rows.toDF("g", "us"), "g", col("us"),
        window = window)
      .orderBy(col("x"))
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Int])]
      .collect().toSeq

  /** Plain-Scala Hampel reference: trailing-window lower median/MAD. */
  private def madReference(counts: Seq[Long], window: Int,
      kMilli: Long = 3000L) =
    counts.zipWithIndex.map { case (y, d) =>
      if (d < window) (d.toLong, y, None, None, None)
      else {
        val arr = counts.slice(d - window, d).sorted
        val med = arr((window + 1) / 2 - 1)
        val mad = arr.map(v => math.abs(v - med))
          .sorted.apply((window + 1) / 2 - 1)
        (d.toLong, y, Some(med), Some(mad),
          Some(if (math.abs(y - med) * 1000 > kMilli * mad) 1 else 0))
      }
    }

  test("MAD anomaly: a spike is flagged, its window neighbors are not") {
    // 10 steady days at 5, a 50-spike on day 10, steady again
    val counts = Seq.fill(10)(5L) ++ Seq(50L) ++ Seq.fill(5)(5L)
    val got = runMad(series(counts))
    assert(got.size === 16)
    // warm-up: first 7 days NULL
    got.take(7).foreach(r => assert(r._4.isEmpty && r._6.isEmpty))
    assert(got(10)._6 === Some(1), s"spike unflagged: ${got(10)}")
    (11 to 15).foreach(d => assert(got(d)._6 === Some(0),
      s"post-spike day $d misflagged: ${got(d)}"))
  }

  test("MAD anomaly: an earlier spike inside the window cannot mask a second") {
    // the Hampel point: day 12's spike keeps being flagged even though
    // day 10's spike sits in its trailing window (median moves one
    // rank; a mean/sigma detector would swallow it)
    val counts = Seq.fill(10)(5L) ++ Seq(50L, 5L, 50L) ++ Seq.fill(3)(5L)
    val got = runMad(series(counts))
    assert(got(10)._6 === Some(1) && got(12)._6 === Some(1), s"$got")
    // and the zero-MAD constant window flags ANY deviation
    val flat = Seq.fill(8)(4L) ++ Seq(5L)
    assert(runMad(series(flat)).last._6 === Some(1))
  }

  test("MAD anomaly: engine matches the plain-Scala reference (seeded)") {
    val rnd = new scala.util.Random(83)
    val counts = Seq.fill(30)(1L + rnd.nextInt(8).toLong)
    val got = runMad(series(counts))
      .map { case (_, x, y, med, mad, a) => (x, y, med, mad, a) }
    val want = madReference(counts, 7)
      .map { case (x, y, med, mad, a) => (x, y, med, mad, a) }
    assert(got === want)
  }

  // ------------------------------------------------- EWMA level (L112)

  private def runEwma(rows: Seq[(String, Long)], window: Int = 8) =
    Trend.dailyVolumeEwma(rows.toDF("g", "us"), "g", col("us"),
        window = window)
      .orderBy(col("x"))
      .as[(String, Long, Long, Int, Long, Long)]
      .collect().toSeq

  test("EWMA: constant series is the constant, warm-up included") {
    val got = runEwma(series(Seq(5L, 5L, 5L, 5L)))
    got.foreach { case (_, _, y, _, ewma, dev) =>
      assert(ewma === y * 1000000L && dev === 0L)
    }
    assert(got.head._4 === 1 && got.last._4 === 4) // k grows through warm-up
  }

  test("EWMA: hand-computed two-day case") {
    // y = [4, 8]: day 1 → 4e6; day 2 → (4·1 + 8·2)·1e6 DIV 3 = 6666666
    val got = runEwma(series(Seq(4L, 8L)))
    assert(got.map(_._5) === Seq(4000000L, 6666666L))
    assert(got.last._6 === 8000000L - 6666666L)
  }

  test("EWMA: newest observation dominates (vs the arithmetic mean)") {
    // (zero-count days never appear in an observed series, so the step
    // uses low counts): y = [1,1,1,13] → mean 4e6, ewma well above
    val got2 = runEwma(series(Seq(1L, 1L, 1L, 13L)))
    val last = got2.last
    assert(last._5 > 4000000L, s"not newest-weighted: $last") // mean = 4e6
  }

  // ------------------------------------------------- CUSUM (L117)

  private def runCusum(counts: Seq[Long]) =
    Trend.dailyVolumeCusum(series(counts).toDF("g", "us"), "g", col("us"))
      .orderBy(col("x"))
      .as[(String, Long, Long, Option[Long], Option[Int])]
      .collect().toSeq

  test("CUSUM: prefix identity matches the textbook recurrence (seeded)") {
    val rnd = new scala.util.Random(43)
    val counts = (1 to 40).map(_ => rnd.nextInt(12).toLong + 4)
    val got = runCusum(counts)
    val base = counts.take(7).sum
    var s = 0L
    val want = counts.zipWithIndex.map { case (y, i) =>
      if (i < 7) None
      else { s = math.max(0L, s + y * 7 - base - 14); Some(s) }
    }
    assert(got.map(_._4) === want)
  }

  test("CUSUM: a persistent small shift alarms; a single spike does not") {
    // baseline 10/day; +4/day from day 8 → drift 14/step, alarm (>70)
    // on the 6th shifted day
    val shifted = runCusum(Seq.fill(7)(10L) ++ Seq.fill(8)(14L))
    val alarms = shifted.drop(7).map(_._5.get)
    assert(alarms === Seq(0, 0, 0, 0, 0, 1, 1, 1))
    // one +20 spike contributes 56 < 70, then decays at −14/day
    val spike = runCusum(Seq.fill(7)(10L) ++ Seq(20L) ++ Seq.fill(5)(10L))
    assert(spike.drop(7).forall(_._5.get === 0))
    assert(spike(7)._4.get === 56L && spike(9)._4.get === 28L)
  }

  test("CUSUM: warm-up rows and short groups report NULL") {
    val got = runCusum(Seq(5L, 6L, 7L))
    assert(got.forall(r => r._4.isEmpty && r._5.isEmpty))
    assert(runCusum(Seq.fill(9)(5L)).take(7).forall(_._4.isEmpty))
  }

  test("EWMA: matches a plain-Scala reference on a seeded series") {
    val rnd = new scala.util.Random(31)
    val counts = (1 to 30).map(_ => rnd.nextInt(20).toLong + 1)
    val got = runEwma(series(counts))
    val want = counts.zipWithIndex.map { case (_, d) =>
      val win = counts.slice(math.max(0, d - 7), d + 1)
      val num = win.zipWithIndex.map { case (v, i) => v << i }.sum
      Math.floorDiv(num * 1000000L, (1L << win.size) - 1L)
    }
    assert(got.map(_._5) === want)
  }
}
