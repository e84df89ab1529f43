package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Lead–lag cross-correlation (r13, L147). Pins the lag convention on
  * a constructed 2-day lead (corr 1.0 exactly at lag +2), the
  * anti-correlation sign, per-lag overlap shrinkage, degenerate NULLs,
  * and a plain-Scala moments replay. */
class TrendLeadLagSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L

  private def events(byType: Map[String, Seq[(Long, Long)]])
      : org.apache.spark.sql.DataFrame =
    byType.toSeq.flatMap { case (t, counts) =>
      counts.flatMap { case (x, n) =>
        (0L until n).map(i => (t, x * Day + i))
      }
    }.toDF("t", "us")

  private def run(byType: Map[String, Seq[(Long, Long)]], maxLag: Int = 3) =
    Trend.leadLag(events(byType), "t", col("us"), maxLag)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap

  // a jagged base pattern over days 0..9
  private val base = Seq(5L, 9L, 2L, 7L, 4L, 8L, 1L, 6L, 3L, 9L)

  test("a 2-day shifted copy reads corr 1.0 at lag +2 and only there") {
    val a = (0L until 10L).map(x => x -> base(x.toInt))
    // b(x) = a(x - 2): b carries a's pattern two days later
    val b = (2L until 12L).map(x => x -> base((x - 2).toInt))
    val got = run(Map("a" -> a, "b" -> b))
    assert(got(("a", "b", 2L))._2 === Some(1.0))
    for (k <- Seq(-3L, -2L, -1L, 0L, 1L, 3L))
      assert(got(("a", "b", k))._2.forall(_ < 0.999), s"lag $k")
    // the mirrored pair sees the lead at -2
    assert(got(("b", "a", -2L))._2 === Some(1.0))
  }

  test("an inverted copy reads corr -1.0 at lag 0") {
    val a = (0L until 10L).map(x => x -> base(x.toInt))
    val b = (0L until 10L).map(x => x -> (10L - base(x.toInt)))
    val got = run(Map("a" -> a, "b" -> b))
    assert(got(("a", "b", 0L))._2 === Some(-1.0))
  }

  test("overlap shrinks by |lag|; a constant series is NULL not NaN") {
    val a = (0L until 10L).map(x => x -> base(x.toInt))
    val c = (0L until 10L).map(x => x -> 4L) // constant
    val got = run(Map("a" -> a, "c" -> c))
    for (k <- -3L to 3L) {
      assert(got(("a", "c", k))._1 === 10L - math.abs(k), s"overlap $k")
      assert(got(("a", "c", k))._2 === None, s"constant must NULL at $k")
    }
  }

  test("plain-Scala moments replay on a seeded pair") {
    val rnd = new scala.util.Random(73)
    val a = (0L until 20L).map(x => x -> (3L + rnd.nextInt(9)))
    val b = (0L until 20L).map(x => x -> (2L + rnd.nextInt(11)))
    val got = run(Map("a" -> a, "b" -> b))
    val am = a.toMap; val bm = b.toMap
    for (k <- -3L to 3L) {
      val pairs = a.flatMap { case (x, ya) =>
        bm.get(x + k).map(yb => (ya, yb)) }
      val n = pairs.size.toLong
      val (sa, sb) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val saa = pairs.map(p => p._1 * p._1).sum
      val sbb = pairs.map(p => p._2 * p._2).sum
      val sab = pairs.map(p => p._1 * p._2).sum
      val vx = n * saa - sa * sa; val vy = n * sbb - sb * sb
      val expect =
        if (n < 2 || vx == 0 || vy == 0) None
        else Some(BigDecimal((n * sab - sa * sb).toDouble
          / math.sqrt(vx.toDouble) / math.sqrt(vy.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(got(("a", "b", k))._1 === n, s"n at lag $k")
      assert(got(("a", "b", k))._2 === expect, s"corr at lag $k")
    }
  }
}
