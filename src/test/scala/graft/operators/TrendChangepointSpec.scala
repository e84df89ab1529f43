package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Binary-segmentation changepoint (r13, L148). Pins a clean step
  * (split at the step day, explained_ppm = 10⁶ exactly), the
  * deterministic tie-break, the constant-series NULL, the single-day
  * no-row, and a plain-Scala replay over all candidate splits. */
class TrendChangepointSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L

  private def events(counts: Seq[(Long, Long)]): Seq[(String, Long)] =
    counts.flatMap { case (x, n) =>
      (0L until n).map(i => ("g", x * Day + i))
    }

  private def run(counts: Seq[(Long, Long)]) =
    Trend.changepoint(events(counts).toDF("g", "us"), "g", col("us"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))

  test("a clean step splits at the step day and explains 1e6 exactly") {
    val counts = (0L until 20L).map(x => x -> (if (x < 10) 5L else 50L))
    val got = run(counts)
    assert(got.length === 1)
    val (n, split, nl, nr, gain, f) = got.head
    assert(n === 20L && split === 10L && nl === 10L && nr === 10L)
    assert(f === Some(1000000L), "two perfect levels explain everything")
    // gain_e6 = 1e6 * between-SS = 1e6 * 10125 (hand: R = 10125)
    assert(gain === 1000000L * 10125L)
  }

  test("ties break to the smallest split day") {
    // symmetric bump: {2,2,9,9,2,2} — splits at x=2 (left {2,2}) and
    // x=4 (left {2,2,9,9}) score equally by symmetry; x=2 must win
    val counts = Seq(0L -> 2L, 1L -> 2L, 2L -> 9L, 3L -> 9L,
      4L -> 2L, 5L -> 2L)
    val (_, split, _, _, _, _) = run(counts).head
    assert(split === 2L, "the earlier of the tied splits must win")
  }

  test("constant series: gain 0, explained NULL (not a division)") {
    val counts = (0L until 8L).map(x => x -> 7L)
    val (_, _, _, _, gain, f) = run(counts).head
    assert(gain === 0L && f === None)
  }

  test("a single observed day emits no row — no split exists") {
    assert(run(Seq(3L -> 10L)).isEmpty)
  }

  test("plain-Scala replay over every candidate split, seeded") {
    val rnd = new scala.util.Random(97)
    val counts = (0L until 15L).map(x =>
      x -> (4L + rnd.nextInt(10) + (if (x >= 9) 12L else 0L)))
    val got = run(counts).head
    val ys = counts.map(_._2)
    val n = BigInt(ys.size); val sy = BigInt(ys.sum)
    val syy = ys.map(y => BigInt(y) * y).sum
    val cands = (1 until ys.size).map { k =>
      val nl = BigInt(k); val nr = n - nl
      val sl = BigInt(ys.take(k).sum); val sr = sy - sl
      val rNum = sl * sl * nr * n + sr * sr * nl * n - sy * sy * nl * nr
      val gain = rNum * 1000000 / (nl * nr * n)
      val sNum = n * syy - sy * sy
      val f = if (sNum == 0) None
        else Some((rNum * 1000000 / (nl * nr * sNum)).toLong)
      (gain.toLong, counts(k)._1, k.toLong, f)
    }
    val best = cands.maxBy(c => (c._1, -c._2))
    assert(got === ((15L, best._2, best._3, 15L - best._3, best._1,
      best._4)))
    assert(got._2 === 9L, "the planted level shift must be found")
  }
}
