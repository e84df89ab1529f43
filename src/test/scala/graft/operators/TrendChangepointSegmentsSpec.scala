package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Recursive multi-changepoint segmentation (r14, L150). Pins two
  * planted shifts recovered exactly, the K=1 ≡ [[Trend.changepoint]]
  * special case, the relative-gain stop in both directions, the
  * constant/single-day leaves, and a plain-Scala BigInt recursion
  * replay on seeded data. */
class TrendChangepointSegmentsSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L

  private def events(counts: Seq[(Long, Long)]): Seq[(String, Long)] =
    counts.flatMap { case (x, n) =>
      (0L until n).map(i => ("g", x * Day + i))
    }

  /** (seg_idx, lo, hi, n_days, sum_y, mean_e6) rows, ordered. */
  private def run(counts: Seq[(Long, Long)], depth: Int = 2,
      minPpm: Long = 100000L) =
    Trend.changepointSegments(events(counts).toDF("g", "us"), "g",
        col("us"), depth, minPpm)
      .orderBy(col("seg_idx")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))

  test("two planted shifts are both recovered at depth 2") {
    // 5,…,5 | 50,…,50 | 200,…,200 — level 1 must split at one shift,
    // level 2 at the other; three exact segments out
    val counts = (0L until 30L).map(x =>
      x -> (if (x < 10) 5L else if (x < 20) 50L else 200L))
    val got = run(counts)
    assert(got.toSeq === Seq(
      (1L, 0L, 9L, 10L, 50L, 5000000L),
      (2L, 10L, 19L, 10L, 500L, 50000000L),
      (3L, 20L, 29L, 10L, 2000L, 200000000L)))
  }

  test("depth 1, minPpm 0 recovers changepoint()'s split exactly") {
    val rnd = new scala.util.Random(41)
    val counts = (0L until 18L).map(x =>
      x -> (3L + rnd.nextInt(8) + (if (x >= 11) 15L else 0L)))
    val df = events(counts).toDF("g", "us")
    val single = Trend.changepoint(df, "g", col("us")).collect().head
    val splitX = single.getLong(2)
    val segs = run(counts, depth = 1, minPpm = 0L)
    assert(segs.length === 2)
    assert(segs(1)._2 === splitX,
      "right segment must start at the single-split day")
    assert(segs(0)._4 === single.getLong(3) // n_l
      && segs(1)._4 === single.getLong(4)) // n_r
  }

  test("the relative-gain stop freezes weak segments (both directions)") {
    // one strong shift + mild noise: level 1 splits, level 2's best
    // sub-splits explain < 40% of their segments' deviance → leaves
    val counts = (0L until 24L).map(x =>
      x -> (100L + (x % 3) + (if (x >= 12) 400L else 0L)))
    val strict = run(counts, depth = 2, minPpm = 400000L)
    assert(strict.length === 2, s"stop failed: ${strict.toSeq}")
    assert(strict(1)._2 === 12L)
    // the SAME data with the threshold at 0 splits further — the stop
    // (not the depth) is what kept it at 2
    val loose = run(counts, depth = 2, minPpm = 0L)
    assert(loose.length === 4, s"minPpm 0 must split every level")
  }

  test("constant series and single-day groups are leaves") {
    assert(run((0L until 9L).map(_ -> 7L)).toSeq ===
      Seq((1L, 0L, 8L, 9L, 63L, 7000000L)))
    assert(run(Seq(4L -> 11L)).toSeq ===
      Seq((1L, 4L, 4L, 1L, 11L, 11000000L)))
  }

  test("mean_e6 is the truncating integer division") {
    // 3,4,3: both candidate splits explain 250000 ppm (hand-computed:
    // rNum = 1, sNum = 2 either side) — below 300000, so ONE segment;
    // mean 10/3 → 3333333, truncated
    val got = run(Seq(0L -> 3L, 1L -> 4L, 2L -> 3L), depth = 2,
      minPpm = 300000L)
    assert(got.toSeq === Seq((1L, 0L, 2L, 3L, 10L, 3333333L)))
  }

  test("plain-Scala BigInt recursion replay, seeded") {
    val rnd = new scala.util.Random(73)
    val counts = (0L until 26L).map(x =>
      x -> (6L + rnd.nextInt(12)
        + (if (x >= 8) 30L else 0L) + (if (x >= 17) 55L else 0L)))
    val minPpm = 100000L
    def bestSplit(ys: Seq[Long]): Option[Int] = {
      if (ys.size < 2) return None
      val n = BigInt(ys.size); val sy = BigInt(ys.sum)
      val syy = ys.map(y => BigInt(y) * y).sum
      val sNum = n * syy - sy * sy
      val cands = (1 until ys.size).map { k =>
        val nl = BigInt(k); val nr = n - nl
        val sl = BigInt(ys.take(k).sum); val sr = sy - sl
        val rNum = sl * sl * nr * n + sr * sr * nl * n -
          sy * sy * nl * nr
        (rNum * 1000000 / (nl * nr * n), k, rNum)
      }
      val (_, k, rNum) = cands.maxBy(c => (c._1, -c._2))
      if (sNum != 0 && rNum * 1000000 / (BigInt(k) * (ys.size - k) * sNum)
          >= minPpm) Some(k) else None
    }
    def recurse(off: Int, ys: Seq[Long], depth: Int): Seq[(Int, Int)] =
      if (depth == 0) Seq((off, off + ys.size - 1))
      else bestSplit(ys) match {
        case Some(k) => recurse(off, ys.take(k), depth - 1) ++
          recurse(off + k, ys.drop(k), depth - 1)
        case None => Seq((off, off + ys.size - 1))
      }
    val ys = counts.map(_._2)
    val want = recurse(0, ys, 2).zipWithIndex.map { case ((lo, hi), i) =>
      val seg = ys.slice(lo, hi + 1)
      (i + 1L, lo.toLong, hi.toLong, seg.size.toLong, seg.sum,
        (BigInt(seg.sum) * 1000000 / seg.size).toLong)
    }
    assert(run(counts).toSeq === want)
    assert(want.length >= 3, "both planted shifts should be found")
  }

  test("a group column colliding with an output name is guarded") {
    val e = intercept[IllegalArgumentException] {
      Trend.changepointSegments(
        Seq(("a", 1L)).toDF("seg_idx", "us"), "seg_idx", col("us"))
    }
    assert(e.getMessage.contains("reserves column name"))
  }
}
