package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def md5hex4(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(4)

  test("hashSplit matches a reference MD5 computation row by row") {
    val got = Sampling.hashSplit(spark.range(100).toDF("id"), col("id"), splits)
      .select(col("id"), col("split")).as[(Long, String)].collect()
    got.foreach { case (id, split) =>
      val h = md5hex4(id.toString)
      val want =
        if (h < "cccc") "train" else if (h < "e666") "val" else "test"
      assert(split === want, s"id=$id hex4=$h")
    }
  }

  test("hashSplit is a total partition, stable under repartitioning") {
    val base = spark.range(2000).toDF("id")
    val a = Sampling.hashSplit(base, col("id"), splits)
      .as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(base.repartition(13), col("id"), splits)
      .as[(Long, String)].collect().toMap
    assert(a.size === 2000 && a === b) // every row, same fate, any layout
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("hashSplit fractions land near the requested ratios") {
    val n = 20000
    val counts = Sampling.hashSplit(spark.range(n).toDF("id"), col("id"), splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.02)
    assert(math.abs(counts("val").toDouble / n - 0.1) < 0.01)
    assert(math.abs(counts("test").toDouble / n - 0.1) < 0.01)
  }

  test("sampleByHash: nested thresholds give nested samples; rate 1 is identity") {
    val base = spark.range(5000).toDF("id")
    val s30 = Sampling.sampleByHash(base, col("id"), 0.3)
      .as[Long].collect().toSet
    val s60 = Sampling.sampleByHash(base, col("id"), 0.6)
      .as[Long].collect().toSet
    assert(s30.subsetOf(s60), "a smaller rate must be a subset of a larger one")
    assert(Sampling.sampleByHash(base, col("id"), 1.0).count() === 5000)
    assert(math.abs(s60.size / 5000.0 - 0.6) < 0.03)
  }

  test("mixture: rate-1.0 groups keep every row; sampled groups match sampleByHash") {
    val df = (0 until 2000).map(i => (if (i % 2 == 0) "full" else "qtr",
      i.toLong)).toDF("src", "id")
    val kept = Sampling.mixture(df, "src", col("id"),
        Map("full" -> 1.0), defaultRate = 0.25)
      .as[(String, Long)].collect()
    val (full, qtr) = kept.partition(_._1 == "full")
    assert(full.length === 1000, "rate 1.0 must keep ALL rows (hex 'ffff' included)")
    // the sampled group must agree row-for-row with the standalone sampler
    val expectQtr = Sampling.sampleByHash(df.filter(col("src") === "qtr"),
      col("id"), 0.25).as[(String, Long)].collect().toSet
    assert(qtr.toSet === expectQtr)
    assert(math.abs(qtr.length / 1000.0 - 0.25) < 0.04)
  }

  test("hashSplit drops null keys like its sibling samplers") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("id")
    val got = Sampling.hashSplit(df, col("id"), splits)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L),
      "null-key rows must be dropped, not silently assigned to the last split")
  }

  test("hashSplit rejects bad fraction sets") {
    val df = spark.range(1).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, col("id"), Seq("a" -> 0.9, "b" -> 0.2))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, col("id"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, col("id"), Seq("a" -> 0.5, "b" -> -0.1))
    }
  }

  test("hashSplit/sampleByHash stay shuffle-free (narrow projection/filter)") {
    val df = Sampling.sampleByHash(
      Sampling.hashSplit(spark.range(100).toDF("id"), col("id"), splits),
      col("id"), 0.5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
