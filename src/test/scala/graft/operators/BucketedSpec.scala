package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val db: String = {
    val dir = tmpDir("bucketdb")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '$dir'")
    "bucketdemo"
  }

  // materialized once, lazily — every test can run standalone
  private lazy val tables: Unit = {
    val left = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("a"))
    val right = spark.range(800).select($"id".as("k"), ($"id" + 7).as("b"))
    Bucketed.materialize(left, s"$db.bj_left", Seq("k"), 8)
    Bucketed.materialize(right, s"$db.bj_right", Seq("k"), 8)
  }

  // AQE prints Final and Initial plans; count the FINAL section only
  private def exchanges(plan: String): Int =
    "Exchange".r.findAllIn(plan.split("== Initial Plan ==").head).size

  private def withSqlConf[A](kv: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val old = kv.map { case (k, _) => k -> conf.getOption(k) }
    kv.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("joining two co-bucketed tables plans with ZERO exchanges") {
    tables
    val joined = withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = Bucketed.table(spark, s"$db.bj_left")
        .join(Bucketed.table(spark, s"$db.bj_right"), Seq("k"))
        .select($"k", $"a", $"b")
      j.collect() // materialize under the conf so AQE finalizes the plan
      j
    }
    val plan = joined.queryExecution.executedPlan.toString
    assert(exchanges(plan) === 0,
      s"co-bucketed join still exchanges:\n${plan.take(3000)}")
    // and the shuffle-free plan is the same join
    assert(joined.count() === 800)
  }

  test("aggregation on the bucket key plans with ZERO exchanges") {
    tables
    val agged = Bucketed.table(spark, s"$db.bj_left")
      .groupBy($"k").agg(sum($"a").as("s"))
    agged.collect()
    val plan = agged.queryExecution.executedPlan.toString
    assert(exchanges(plan) === 0,
      s"bucket-key aggregation still exchanges:\n${plan.take(3000)}")
  }

  test("bucketed vs unbucketed join shuffles ONE side only") {
    tables
    val probe = spark.range(500).select($"id".as("k"), lit("p").as("tag"))
    // the probe side can reuse the bucketed side's distribution only when
    // the target partition count matches the bucket count — at production
    // scale numBuckets is CHOSEN as the pipeline's shuffle parallelism
    val joined = withSqlConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.shuffle.partitions" -> "8") {
      val j = Bucketed.table(spark, s"$db.bj_left").join(probe, Seq("k"))
      j.collect()
      j
    }
    val plan = joined.queryExecution.executedPlan.toString
    assert(exchanges(plan) === 1,
      s"expected exactly the probe-side exchange:\n${plan.take(3000)}")
  }

  test("bucketed join result equals the plain-parquet join") {
    tables
    val left = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("a"))
    val right = spark.range(800).select($"id".as("k"), ($"id" + 7).as("b"))
    val want = left.join(right, Seq("k")).select($"k", $"a", $"b")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = Bucketed.table(spark, s"$db.bj_left")
      .join(Bucketed.table(spark, s"$db.bj_right"), Seq("k"))
      .select($"k", $"a", $"b")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === want)
  }

  test("one file per bucket (the layout sortBy relies on)") {
    tables
    val files = spark.sql(s"DESCRIBE EXTENDED $db.bj_left")
      .filter($"col_name" === "Location")
      .select($"data_type").as[String].head()
    val dir = new java.io.File(new java.net.URI(files))
    val parts = dir.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length === 8,
      s"expected 8 bucket files, got ${parts.length}")
  }
}
