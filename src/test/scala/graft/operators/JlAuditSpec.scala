package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JL Rademacher projection audit (L108): sign-matrix derivation,
  * one-hot projection identity, L2 kernel parity, estimator
  * unbiasedness on a seeded cloud, codegen residency, null/coincident
  * hygiene. */
class JlAuditSpec extends SparkSpec {
  import spark.implicits._

  test("sign matrix: shape, ±1 values, md5-recomputable, seed-sensitive") {
    val s = JlAudit.signs("jl42", 64, 16)
    assert(s.length === 16 && s.forall(_.length === 64))
    assert(s.flatMap(_.toSeq).forall(v => v == 1 || v == -1))
    // direct recompute of one cell: dim 3's row key, hex digit 5
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("jl42-3".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val expect = if (Character.digit(hex.charAt(5), 16) % 2 == 1) -1 else 1
    assert(s(5)(3) === expect.toByte)
    assert(JlAudit.signs("other", 64, 16).flatMap(_.toSeq).toSeq !==
      s.flatMap(_.toSeq).toSeq)
  }

  test("one-hot vectors project to their sign column") {
    val s = JlAudit.signs("jl42", 8, 4)
    val oneHot = (0 until 8).map(d =>
      (d.toLong, (0 until 8).map(i => if (i == d) 1.0f else 0.0f).toArray))
    val out = oneHot.toDF("id", "v")
      .select(col("id"), JlAudit.project(col("v"), "jl42", 8, 4).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for (d <- 0 until 8; j <- 0 until 4)
      assert(out(d.toLong)(j) === s(j)(d).toDouble, s"d=$d j=$j")
  }

  test("l2sq matches a plain-Scala fold on floats") {
    val a = Array(1.0f, 2.5f, -3.0f)
    val b = Array(0.5f, 2.0f, 1.0f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(JlAudit.l2sq(col("a"), col("b")).as("d"))
      .collect().head.getDouble(0)
    val exp = a.zip(b).map { case (x, y) =>
      val d = x.toDouble - y.toDouble; d * d
    }.foldLeft(0.0)(_ + _)
    assert(got === exp)
  }

  test("estimator is near-unbiased over a seeded cloud") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val out = JlAudit.distortionPairs(vecs.toDF("id", "v"), "id", "v",
        "jl42", 64, 16)
      .agg(avg(col("ratio_e6"))).collect().head.getDouble(0) / 1e6
    assert(out > 0.8 && out < 1.2, s"mean distortion ratio $out")
  }

  test("projection stays in whole-stage codegen") {
    val df = spark.range(8).select(
      JlAudit.project(
        array((0 until 4).map(_ => (col("id") + 1).cast("float")): _*),
        "jl42", 4, 2).as("p"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"JlProject fell out of codegen:\n$plan")
    df.collect()
  }

  test("null vector projects to null; coincident pair ratio is NULL") {
    val rows = Seq(
      (1L, Option(Array(1.0f, 2.0f))),
      (2L, Option(Array(1.0f, 2.0f))),
      (3L, Option.empty[Array[Float]])).toDF("id", "v")
    val proj = rows.select(
      JlAudit.project(col("v"), "jl42", 2, 2).as("p")).collect()
    assert(proj.count(_.isNullAt(0)) === 1)
    val pairs = JlAudit.distortionPairs(rows, "id", "v", "jl42", 2, 2)
      .collect()
    assert(pairs.length === 1 && pairs.head.isNullAt(4))
  }
}
