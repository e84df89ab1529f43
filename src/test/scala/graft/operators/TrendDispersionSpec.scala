package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Daily-volume Fano factor (r14, L152). Hand-computed rationals,
  * the constant/single-day degenerate cases, and a seeded plain-Scala
  * replay. */
class TrendDispersionSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L

  private def run(counts: Seq[(Long, Long)]) =
    Trend.dailyVolumeDispersion(
        counts.flatMap { case (x, n) =>
          (0L until n).map(i => ("g", x * Day + i))
        }.toDF("g", "us"), "g", col("us"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))

  test("hand case: days (2,4) → vmr_e6 = 4e6 // 12 = 333333") {
    assert(run(Seq(0L -> 2L, 1L -> 4L)).toSeq ===
      Seq((2L, 6L, 333333L)))
  }

  test("constant series is maximally regular: vmr exactly 0") {
    assert(run((0L until 6L).map(_ -> 9L)).head._3 === 0L)
  }

  test("a single observed day has no variance: vmr 0, n_days 1") {
    assert(run(Seq(5L -> 42L)).toSeq === Seq((1L, 42L, 0L)))
  }

  test("clumping raises vmr past 1e6; near-uniform stays below") {
    // same total mass, two shapes: spiky (one heavy day) vs flat
    val spiky = run(Seq(0L -> 91L) ++ (1L until 10L).map(_ -> 1L))
    val flat = run((0L until 10L).map(_ -> 10L))
    assert(spiky.head._3 > 1000000L, s"spiky read ${spiky.head._3}")
    assert(flat.head._3 === 0L)
  }

  test("plain-Scala BigInt replay, seeded") {
    val rnd = new scala.util.Random(31)
    val counts = (0L until 21L).map(x => x -> (1L + rnd.nextInt(40)))
    val ys = counts.map(_._2)
    val n = BigInt(ys.size); val s = BigInt(ys.sum)
    val q = ys.map(y => BigInt(y) * y).sum
    val want = ((n * q - s * s) * 1000000 / (n * s)).toLong
    assert(run(counts).toSeq === Seq((ys.size.toLong, ys.sum, want)))
  }
}
