package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  test("cohort × offset matrix, by hand") {
    // bucket width 10: user 1 first seen in bucket 0, active 0/1/3;
    // user 2 first seen in bucket 1; user 3 first seen bucket 0,
    // active 0/2
    val df = Seq(
      (1L, 5L), (1L, 12L), (1L, 33L),
      (2L, 15L),
      (3L, 1L), (3L, 25L)).toDF("user_id", "t")
    val got = Retention.matrix(df, "user_id", col("t"), bucketUs = 10L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === Set(
      (0L, 0L, 2L, "4"),  // users 1 and 3 (witness 1+3)
      (0L, 1L, 1L, "1"),
      (0L, 2L, 1L, "3"),
      (0L, 3L, 1L, "1"),
      (1L, 0L, 1L, "2")))
  }

  test("multiple events in one bucket count the entity once") {
    val df = Seq((1L, 0L), (1L, 1L), (1L, 2L), (1L, 10L))
      .toDF("user_id", "t")
    val got = Retention.matrix(df, "user_id", col("t"), bucketUs = 10L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === Set((0L, 0L, 1L, "1"), (0L, 1L, 1L, "1")))
  }

  test("null entities and timestamps drop; bucket width must be positive") {
    val df = Seq((Some(1L), Some(5L)), (None, Some(5L)),
      (Some(2L), Option.empty[Long])).toDF("user_id", "t")
    val got = Retention.matrix(df, "user_id", col("t"), bucketUs = 10L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === Set((0L, 0L, 1L, "1")))
    intercept[IllegalArgumentException] {
      Retention.matrix(df, "user_id", col("t"), bucketUs = 0L)
    }
  }
}
