package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sliding-window burst detection (r13, L142). Pins the event-anchored
  * sliding maximum against hand fixtures (incl. the boundary the [t,
  * t+W) half-open frame implies), timestamp ties, the deterministic
  * peak anchor, per-entity isolation, and a brute-force replay on a
  * seeded stream. */
class BurstSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], w: Long, k: Long = 3L) =
    Burst.slidingPeak(rows.toDF("u", "ts"), "u", col("ts"), w, k)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("hand case: the 3-in-10 burst is found, window boundary exact") {
    // events at 0, 5, 9, 10: [0, 10) holds {0,5,9} = 3 — t=10 is OUT
    // of the half-open frame anchored at 0; anchor 5 sees {5,9,10} = 3
    val got = run(Seq((1L, 0L), (1L, 5L), (1L, 9L), (1L, 10L)), 10L)
    assert(got(1L) === ((4L, 3L, 0L, 1L)))
    // shrink the window to 5: anchors see {0}, {5,9}, {9,10}... peak 2
    val got5 = run(Seq((1L, 0L), (1L, 5L), (1L, 9L), (1L, 10L)), 5L)
    assert(got5(1L) === ((4L, 2L, 5L, 0L)))
  }

  test("equal timestamps count together and tie-break to the anchor") {
    val got = run(Seq((1L, 7L), (1L, 7L), (1L, 7L), (1L, 100L)), 1L)
    assert(got(1L) === ((4L, 3L, 7L, 1L)))
  }

  test("entities are isolated; threshold flags per entity") {
    val rows = Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (2L, 50L))
    val got = run(rows, 10L, k = 3L)
    assert(got(1L)._2 === 3L && got(1L)._4 === 1L)
    assert(got(2L)._2 === 1L && got(2L)._4 === 0L)
  }

  test("brute-force replay on a seeded stream") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 300).map(_ =>
      ((rnd.nextInt(4) + 1).toLong, rnd.nextInt(200).toLong))
    val w = 17L
    val got = run(rows, w, k = 5L)
    for ((u, rs) <- rows.groupBy(_._1)) {
      val ts = rs.map(_._2).sorted
      val peaks = ts.map(t => (t, ts.count(x => x >= t && x < t + w)))
      val peak = peaks.map(_._2).max
      val start = peaks.filter(_._2 == peak).map(_._1).min
      assert(got(u) === ((ts.size.toLong, peak.toLong, start,
        if (peak >= 5) 1L else 0L)), s"entity $u")
    }
  }

  test("null entities and timestamps drop; guards fire") {
    val df = Seq((Some(1L), Some(3L)), (None, Some(4L)),
      (Some(1L), None)).toDF("u", "ts")
    val out = Burst.slidingPeak(df, "u", col("ts"), 10L, 2L).collect()
    assert(out.length === 1 && out.head.getLong(1) === 1L)
    intercept[IllegalArgumentException] {
      Burst.slidingPeak(df, "u", col("ts"), 0L, 2L)
    }
  }
}
