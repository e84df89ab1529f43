package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** L174 ACF + Ljung–Box (r15): hand-worked alternation rationals,
  * the zero-fill gap semantics, toward-zero truncation on a negative
  * numerator, degenerate conventions, and a seeded BigInt replay of
  * both the ACF and the quantized-cascade Q. */
class AcfSpec extends SparkSpec {
  import spark.implicits._

  private val DayUs = 86400000000L

  private def events(days: Seq[Long]): org.apache.spark.sql.DataFrame =
    days.map(d => ("g", d * DayUs + 17L)).toDF("g", "us")

  private def acf(days: Seq[Long], maxLag: Int = 7) =
    Acf.dailyVolumeAcf(events(days), "g", col("us"), maxLag)
      .orderBy(col("lag")).collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))

  test("hand alternation: r1 = -0.8 and r2 = 17/30 exactly") {
    // counts (2,0,2,0,2) over days 0..4: z = 5y−6 = (4,−6,4,−6,4),
    // D = 120, lag-1 Σzz' = −96 → −800000; lag-2 Σzz' = 68 → 566666
    val out = acf(Seq(0L, 0L, 2L, 2L, 4L, 4L), maxLag = 2)
    assert(out.toSeq === Seq((1L, Some(-800000L)), (2L, Some(566666L))))
  }

  test("gap fill: absent days are REAL zeros; negative div truncates toward zero") {
    // events on days 0 and 4 only: y = (1,0,0,0,1), z = (3,−2,−2,−2,3),
    // D = 30, lag-1 Σzz' = −4 → div(−4e6, 30) = −133333 (floor would
    // give −133334 — the toward-zero pin)
    val out = acf(Seq(0L, 4L), maxLag = 1)
    assert(out.toSeq === Seq((1L, Some(-133333L))))
  }

  test("constant series: zero variance reads NULL, not zero") {
    val out = acf(Seq(0L, 1L, 2L, 3L), maxLag = 1)
    assert(out.toSeq === Seq((1L, None)))
  }

  test("ljung-box: short series (n <= maxLag+1) is NULL verdict") {
    val r = Acf.dailyVolumeLjungBox(events(Seq(0L, 1L, 2L, 3L, 4L)),
      "g", col("us"), maxLag = 7).collect().head
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("ljung-box: planted period-2 rhythm flags; replay matches the cascade") {
    // counts (2,0)×9 + (2) over days 0..18 — heavy alternation
    val days = (0L to 18L by 2L).flatMap(d => Seq(d, d))
    val r = Acf.dailyVolumeLjungBox(events(days), "g", col("us"),
      maxLag = 7).collect().head
    val (q, sig) = (r.getLong(3), r.getLong(4))
    assert(sig === 1L)
    assert(q === lbReplay(countsOf(days), 7))
  }

  test("seeded replay: acf grid and Q match the plain-Scala mirror") {
    val rnd = new scala.util.Random(1521)
    val days = Seq.fill(900)(rnd.nextInt(40).toLong)
    val got = acf(days, maxLag = 7)
    val ys = countsOf(days)
    val expect = (1 to 7).map(k => acfReplay(ys, k))
    assert(got.map(_._2.get).toSeq === expect)
    val q = Acf.dailyVolumeLjungBox(events(days), "g", col("us"),
      maxLag = 7).collect().head.getLong(3)
    assert(q === lbReplay(ys, 7))
  }

  test("span guard: a corrupt far-future timestamp raises, never a grid OOM") {
    // one year-9999-class day would gap-fill a multi-million-cell
    // array; the guard fails loudly at the group row instead
    val ex = intercept[Exception] {
      acf(Seq(0L, Acf.MaxSpanDays + 2L), maxLag = 1)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("day span exceeds")),
      s"unexpected failure: ${messages(ex).mkString(" | ")}")
  }

  private def countsOf(days: Seq[Long]): Seq[Long] = {
    val (lo, hi) = (days.min, days.max)
    val m = days.groupBy(identity).view.mapValues(_.size.toLong)
    (lo to hi).map(d => m.getOrElse(d, 0L))
  }

  private def acfReplay(ys: Seq[Long], k: Int): Long = {
    val n = ys.size
    val s = ys.sum
    val z = ys.map(y => BigInt(n) * y - s)
    val d = z.map(v => v * v).sum
    val num = (0 until n - k).map(t => z(t) * z(t + k)).sum
    (BigInt(1000000) * num / d).toLong
  }

  private def lbReplay(ys: Seq[Long], maxLag: Int): Long = {
    val n = BigInt(ys.size)
    (1 to maxLag).map { k =>
      val r = BigInt(acfReplay(ys, k))
      (n * (n + 2) * r * r / (BigInt(1000000) * (n - k))).toLong
    }.sum
  }
}
