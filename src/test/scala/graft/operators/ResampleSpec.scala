package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Double, Long)], stepUs: Long = 10L)
      : Seq[(Long, Long, Double, Boolean)] = {
    val df = rows.toDF("user_id", "t", "value", "event_id")
    Resample.locf(df, "user_id", col("t"), "value", "event_id", stepUs)
      .as[(Long, Long, Double, Boolean)].collect().toSeq.sorted
  }

  test("gaps fill with the carried value, observed buckets keep their own") {
    // events in buckets 0 and 3 — buckets 1/2 are gaps carrying 1.5
    val got = run(Seq(
      (1L, 5L, 1.5, 100L), (1L, 35L, 9.0, 101L)))
    assert(got === Seq(
      (1L, 0L, 1.5, false),
      (1L, 1L, 1.5, true),
      (1L, 2L, 1.5, true),
      (1L, 3L, 9.0, false)))
  }

  test("within a bucket the LAST event wins, ties broken by the sequence column") {
    val got = run(Seq(
      (1L, 5L, 1.0, 100L), (1L, 9L, 2.0, 101L),   // later ts wins
      (2L, 5L, 3.0, 200L), (2L, 5L, 4.0, 201L)))  // same ts: higher seq
    assert(got === Seq(
      (1L, 0L, 2.0, false),
      (2L, 0L, 4.0, false)))
  }

  test("a single-event entity spans one bucket") {
    assert(run(Seq((1L, 42L, 7.0, 1L))) === Seq((1L, 4L, 7.0, false)))
  }

  test("presence marks observation: a null last value defers the fill but not the flag") {
    val df = Seq(
      (1L, 5L, Some(1.0), 100L),
      (1L, 15L, Option.empty[Double], 101L), // observed bucket, null value
      (1L, 35L, Some(9.0), 102L))
      .toDF("user_id", "t", "value", "event_id")
    val got = Resample.locf(df, "user_id", col("t"), "value", "event_id", 10L)
      .as[(Long, Long, Option[Double], Boolean)].collect().toSeq.sorted
    assert(got === Seq(
      (1L, 0L, Some(1.0), false),
      (1L, 1L, Some(1.0), false), // observed (not a gap), value carried
      (1L, 2L, Some(1.0), true),
      (1L, 3L, Some(9.0), false)))
  }

  test("the carry-forward window is a running frame (streaming execution)") {
    val df = Seq((1L, 5L, 1.0, 100L), (1L, 35L, 9.0, 101L))
      .toDF("user_id", "t", "value", "event_id")
    val plan = Resample.locf(df, "user_id", col("t"), "value", "event_id",
      10L).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("unboundedfollowing"),
      s"quadratic window frame in:\n$plan")
  }

  test("null entities/timestamps drop; step must be positive") {
    val df = Seq((Some(1L), Some(5L), 1.0, 100L),
      (None, Some(5L), 2.0, 101L), (Some(2L), Option.empty[Long], 3.0, 102L))
      .toDF("user_id", "t", "value", "event_id")
    val got = Resample.locf(df, "user_id", col("t"), "value", "event_id",
        10L)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got === Seq((1L, 0L, 1.0, false)))
    intercept[IllegalArgumentException] {
      Resample.locf(df, "user_id", col("t"), "value", "event_id", 0L)
    }
  }
}
