package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private type Row5 = (Long, String, Long, Option[Long], Boolean)

  private def hist(rows: Seq[(Long, String)], atUs: Long = 0L) =
    Scd2.init(rows.toDF("k", "v"), "k", Seq("v"), atUs)

  private def collect(df: org.apache.spark.sql.DataFrame): Set[Row5] =
    df.as[Row5].collect().toSet

  test("init opens every snapshot row; null keys drop") {
    val got = collect(Scd2.init(
      Seq((Some(1L), "a"), (Some(2L), "b"), (None, "ghost"))
        .toDF("k", "v"), "k", Seq("v"), atUs = 5L))
    assert(got === Set((1L, "a", 5L, None, true), (2L, "b", 5L, None, true)))
  }

  test("merge closes superseded versions and opens new ones, by hand") {
    val h = hist(Seq((1L, "same"), (2L, "old"), (3L, "keeper")))
    val changes = Seq((1L, "same"), (2L, "new"), (4L, "fresh"))
      .toDF("k", "v")
    val got = collect(Scd2.merge(h, changes, "k", Seq("v"), atUs = 10L))
    assert(got === Set(
      (1L, "same", 0L, None, true),        // unchanged re-delivery: no-op
      (2L, "old", 0L, Some(10L), false),   // closed
      (2L, "new", 10L, None, true),        // successor
      (3L, "keeper", 0L, None, true),      // absent from batch: stays open
      (4L, "fresh", 10L, None, true)))     // brand-new key
  }

  test("re-applying the same batch is a no-op (idempotent delivery)") {
    val h = hist(Seq((1L, "a"), (2L, "b")))
    val changes = Seq((1L, "a2")).toDF("k", "v")
    val once = Scd2.merge(h, changes, "k", Seq("v"), atUs = 10L)
    val twice = Scd2.merge(once, changes, "k", Seq("v"), atUs = 20L)
    assert(collect(twice) === collect(once))
  }

  test("three merges accrete a full version chain") {
    val h = hist(Seq((1L, "v0")))
    val m1 = Scd2.merge(h, Seq((1L, "v1")).toDF("k", "v"), "k", Seq("v"), 10L)
    val m2 = Scd2.merge(m1, Seq((1L, "v2")).toDF("k", "v"), "k", Seq("v"), 20L)
    assert(collect(m2) === Set(
      (1L, "v0", 0L, Some(10L), false),
      (1L, "v1", 10L, Some(20L), false),
      (1L, "v2", 20L, None, true)))
  }

  test("value comparison is null-safe") {
    val h = Scd2.init(Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "v"), "k", Seq("v"), 0L)
    val changes = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "v")
    val got = Scd2.merge(h, changes, "k", Seq("v"), 10L)
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    assert(got === Set(
      (1L, None, 0L, None, true),          // null == null: no-op
      (2L, Some("x"), 0L, Some(10L), false),
      (2L, None, 10L, None, true)))        // x -> null IS a change
  }

  test("multi-column values change when ANY column differs") {
    val h = Scd2.init(Seq((1L, "a", 10), (2L, "b", 20))
      .toDF("k", "v1", "v2"), "k", Seq("v1", "v2"), 0L)
    val changes = Seq((1L, "a", 10), (2L, "b", 99)).toDF("k", "v1", "v2")
    val got = Scd2.merge(h, changes, "k", Seq("v1", "v2"), 10L)
      .as[(Long, String, Int, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(got === Set(
      (1L, "a", 10, 0L, None, true),
      (2L, "b", 20, 0L, Some(10L), false),
      (2L, "b", 99, 10L, None, true)))
  }

  test("lookup picks the version valid at each fact's time") {
    val h = hist(Seq((1L, "v0")))
    val m = Scd2.merge(h, Seq((1L, "v1")).toDF("k", "v"), "k", Seq("v"), 10L)
    val facts = Seq((1L, -5L), (1L, 0L), (1L, 9L), (1L, 10L), (1L, 50L),
      (2L, 5L)).toDF("k", "t")
    val got = Scd2.lookup(m, facts, "k", col("t"), Seq("v"))
      .as[(Long, Long, Option[String], Option[Long])].collect().toSet
    assert(got === Set(
      (1L, -5L, None, None),             // predates the first version
      (1L, 0L, Some("v0"), Some(0L)),    // valid_from inclusive
      (1L, 9L, Some("v0"), Some(0L)),
      (1L, 10L, Some("v1"), Some(10L)),  // valid_to exclusive: flips here
      (1L, 50L, Some("v1"), Some(10L)),  // open version matches onward
      (2L, 5L, None, None)))             // key never dimensioned
  }

  test("closed history rides through untouched") {
    val h = hist(Seq((1L, "v0")))
    val m1 = Scd2.merge(h, Seq((1L, "v1")).toDF("k", "v"), "k", Seq("v"), 10L)
    val m2 = Scd2.merge(m1, Seq((2L, "other")).toDF("k", "v"), "k",
      Seq("v"), 20L)
    val closed = collect(m2).filter(!_._5)
    assert(closed === Set((1L, "v0", 0L, Some(10L), false)))
  }
}
