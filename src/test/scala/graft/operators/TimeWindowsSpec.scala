package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeWindowsSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: width 30 slide 10 — each event in exactly 3 windows") {
    val df = Seq((1L, 0L), (2L, 10L), (3L, 29L), (4L, 30L))
      .toDF("id", "t")
    val got = TimeWindows.hopping(df, col("t"), widthUs = 30L, slideUs = 10L,
        Seq.empty, Seq(count(lit(1)).as("n"), sum(col("id")).as("ids")))
      .orderBy(col("window_start_us"))
      .as[(Long, Long, Long)].collect().toSeq
    // t=0 → windows starting -20,-10,0; t=10 → -10,0,10;
    // t=29 → 0,10,20; t=30 → 10,20,30
    assert(got === Seq(
      (-20L, 1L, 1L),
      (-10L, 2L, 3L), // ids 1, 2
      (0L, 3L, 6L),   // ids 1, 2, 3
      (10L, 3L, 9L),  // ids 2, 3, 4
      (20L, 2L, 7L),  // ids 3, 4
      (30L, 1L, 4L)))
  }

  test("tumbling degenerates correctly (width == slide); nulls dropped") {
    val df = Seq((1L, Some(5L)), (2L, Some(15L)), (3L, None))
      .toDF("id", "t")
    val got = TimeWindows.hopping(df, col("t"), 10L, 10L, Seq.empty,
        Seq(count(lit(1)).as("n")))
      .orderBy(col("window_start_us")).as[(Long, Long)].collect().toSeq
    assert(got === Seq((0L, 1L), (10L, 1L)))
  }

  test("negative timestamps: floor (not truncating) division places pre-epoch rows") {
    val df = Seq((1L, -1L), (2L, -10L), (3L, -11L)).toDF("id", "t")
    val got = TimeWindows.hopping(df, col("t"), 10L, 10L, Seq.empty,
        Seq(sum(col("id")).as("ids")))
      .orderBy(col("window_start_us")).as[(Long, Long)].collect().toSeq
    // t=-1 and t=-10 are both in [-10, 0); t=-11 in [-20, -10)
    assert(got === Seq((-20L, 3L), (-10L, 3L)))
  }

  test("property: membership matches per-event reference; per-group (seeded)") {
    val rnd = new scala.util.Random(69)
    val events = (1 to 300).map { i =>
      (i.toLong, s"g${rnd.nextInt(3)}", rnd.nextLong() % 1000L)
    }
    val (width, slide) = (60L, 20L)
    val got = TimeWindows.hopping(events.toDF("id", "g", "t"), col("t"),
        width, slide, Seq("g"),
        Seq(count(lit(1)).as("n"), sum(col("id")).as("ids")))
      .as[(String, Long, Long, Long)].collect().toSet
    def floorDiv(a: Long, b: Long) = Math.floorDiv(a, b)
    val want = events
      .flatMap { case (id, g, t) =>
        (floorDiv(t - width, slide) + 1 to floorDiv(t, slide))
          .map(k => (g, k * slide) -> id)
      }
      .groupBy(_._1)
      .map { case ((g, ws), xs) =>
        (g, ws, xs.size.toLong, xs.map(_._2).sum) }
      .toSet
    assert(got === want)
    // uniform membership: every event lands in exactly width/slide windows
    val totalRows = got.toSeq.map(_._3).sum
    assert(totalRows === events.size * (width / slide))
  }

  test("guards: ragged hop, reserved column, empty aggs") {
    val df = Seq((1L, 1L)).toDF("id", "t")
    intercept[IllegalArgumentException] {
      TimeWindows.hopping(df, col("t"), 30L, 7L, Seq.empty,
        Seq(count(lit(1)).as("n")))
    }
    intercept[IllegalArgumentException] {
      TimeWindows.hopping(df.withColumnRenamed("id", "window_start_us"),
        col("t"), 30L, 10L, Seq.empty, Seq(count(lit(1)).as("n")))
    }
    intercept[IllegalArgumentException] {
      TimeWindows.hopping(df, col("t"), 30L, 10L, Seq.empty, Seq.empty)
    }
  }
}
