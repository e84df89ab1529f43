package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "buy")

  private def times(rows: Seq[(Long, Long, String)],
      windowUs: Option[Long] = None): Set[(Long, Int, String, Long)] = {
    val df = rows.toDF("user_id", "t", "event_type")
    Funnel.stepTimes(df, "user_id", col("t"), "event_type", steps, windowUs)
      .as[(Long, Int, String, Long)].collect().toSet
  }

  test("strict ordered sequence, by hand") {
    val got = times(Seq(
      // user 1 completes: view@10, click@20, buy@30
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
      // user 2 skips click: view@10, buy@30 — stops after step 1
      (2L, 10L, "view"), (2L, 30L, "buy"),
      // user 3 clicks BEFORE its only view — order matters
      (3L, 5L, "click"), (3L, 10L, "view"),
      // user 4 never enters the funnel
      (4L, 10L, "buy")))
    assert(got === Set(
      (1L, 1, "view", 10L), (1L, 2, "click", 20L), (1L, 3, "buy", 30L),
      (2L, 1, "view", 10L),
      (3L, 1, "view", 10L)))
  }

  test("steps at identical timestamps do not advance (strictly after)") {
    val got = times(Seq((1L, 10L, "view"), (1L, 10L, "click")))
    assert(got === Set((1L, 1, "view", 10L)))
  }

  test("t1 anchors at the FIRST step-1 event, even when a later one would convert") {
    // clicks at t=5 and t=8 both precede the first view at t=10; the
    // later view at t=20 would pair with nothing — no step 2
    val got = times(Seq(
      (1L, 5L, "click"), (1L, 8L, "click"),
      (1L, 10L, "view"), (1L, 20L, "view")))
    assert(got === Set((1L, 1, "view", 10L)))
  }

  test("the conversion window anchors at funnel ENTRY, not the previous step") {
    // click at 90 is inside the 100-wide window from view@10; buy@115
    // is 25 past the CLICK but 105 past ENTRY — excluded
    val got = times(Seq(
      (1L, 10L, "view"), (1L, 90L, "click"), (1L, 115L, "buy"),
      // user 2: same shape, buy@105 lands exactly ON the bound (<=)
      (2L, 10L, "view"), (2L, 90L, "click"), (2L, 110L, "buy")),
      windowUs = Some(100L))
    assert(got === Set(
      (1L, 1, "view", 10L), (1L, 2, "click", 90L),
      (2L, 1, "view", 10L), (2L, 2, "click", 90L), (2L, 3, "buy", 110L)))
  }

  test("the first QUALIFYING step event is kept, not the globally first") {
    // user's first click (t=5) precedes the view; the kept step-2 time
    // must be the first click AFTER t1 (t=30), not min over all clicks
    val got = times(Seq(
      (1L, 5L, "click"), (1L, 10L, "view"), (1L, 30L, "click"),
      (1L, 40L, "click")))
    assert(got === Set((1L, 1, "view", 10L), (1L, 2, "click", 30L)))
  }

  test("report aggregates counts and the id-sum witness; unreached steps emit no row") {
    val df = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"),
      (2L, 10L, "view"), (2L, 25L, "click"),
      (3L, 10L, "view")).toDF("user_id", "t", "event_type")
    val got = Funnel.report(df, "user_id", col("t"), "event_type", steps)
      .as[(Int, String, Long, String)].collect().toSet
    assert(got === Set(
      (1, "view", 3L, "6"),
      (2, "click", 2L, "3"))) // no 'buy' row at all
  }

  test("rejects duplicate step labels and non-positive windows") {
    val df = Seq((1L, 10L, "view")).toDF("user_id", "t", "event_type")
    intercept[IllegalArgumentException] {
      Funnel.stepTimes(df, "user_id", col("t"), "event_type",
        Seq("view", "view"))
    }
    intercept[IllegalArgumentException] {
      Funnel.stepTimes(df, "user_id", col("t"), "event_type", steps,
        windowUs = Some(0L))
    }
  }

  test("null entities and null timestamps drop") {
    val df = Seq(
      (Some(1L), Some(10L), "view"), (Some(1L), Some(20L), "click"),
      (None, Some(10L), "view"), (Some(2L), None, "view"))
      .toDF("user_id", "t", "event_type")
    val got = Funnel.stepTimes(df, "user_id", col("t"), "event_type", steps)
      .as[(Long, Int, String, Long)].collect().toSet
    assert(got === Set((1L, 1, "view", 10L), (1L, 2, "click", 20L)))
  }
}
