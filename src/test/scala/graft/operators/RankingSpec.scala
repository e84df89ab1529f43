package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("indexWithinGroups equals the window row_number on a seeded frame") {
    val rnd = new scala.util.Random(11)
    val df = (1L to 3000L).map(i => (i, s"g${rnd.nextInt(7)}"))
      .toDF("id", "g")
    val got = Ranking.indexWithinGroups(df, "g", Seq(col("id")))
      .select(col("id"), col("r")).as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("id"))
    val want = df.select(col("id"),
        (row_number().over(w) - 1).cast("long").as("r"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("a 95%-hot group ranks correctly (the window-skew case)") {
    val df = (1L to 5000L).map(i =>
      (i, if (i % 20 == 0) "cold" else "hot")).toDF("id", "g")
    val got = Ranking.indexWithinGroups(df, "g", Seq(col("id")))
    // dense 0-based per group: counts and max index agree
    val sizes = got.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), max(col("r")).as("mx"),
        min(col("r")).as("mn"), countDistinct(col("r")).as("d"))
      .as[(String, Long, Long, Long, Long)].collect()
    sizes.foreach { case (g, n, mx, mn, d) =>
      assert(mn == 0L && mx == n - 1 && d == n, s"group $g")
    }
    // order preserved: rank increases with id inside each group
    val hot = got.filter(col("g") === "hot").orderBy(col("id"))
      .select(col("r")).as[Long].collect()
    assert(hot.toSeq === hot.sorted.toSeq)
  }

  test("null group ranks as its own group; reserved/collision guards") {
    val df = Seq((1L, "a"), (2L, null), (3L, null), (4L, "a"))
      .toDF("id", "g")
    val got = Ranking.indexWithinGroups(df, "g", Seq(col("id")))
      .select(col("id"), col("r")).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    intercept[IllegalArgumentException] {
      Ranking.indexWithinGroups(df.withColumn("r", lit(1)), "g",
        Seq(col("id")))
    }
    intercept[IllegalArgumentException] {
      Ranking.indexWithinGroups(df.withColumn("__rk_pid", lit(1)), "g",
        Seq(col("id")))
    }
  }
}
