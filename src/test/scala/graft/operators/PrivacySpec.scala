package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (id, zip, age_band, salary) — zip×age_band are the quasi-identifiers
  private def rows = Seq(
    (1L, "10115", "30s", 50),
    (2L, "10115", "30s", 60),
    (3L, "10115", "30s", 70),
    (4L, "10115", "40s", 50),   // group of 1 → suppressed at k=2
    (5L, "20095", "30s", 80),
    (6L, "20095", "30s", 80),   // group of 2 but only ONE salary value
    (7L, null,    "30s", 10),
    (8L, null,    "30s", 20)    // null zip is a group, not a free pass
  ).toDF("id", "zip", "age_band", "salary")

  private val quasi = Seq("zip", "age_band")

  test("kAnonymous: suppresses small groups whole; null quasi values form a group") {
    val got = Privacy.kAnonymous(rows, quasi, k = 2)
      .select(col("id")).as[Long].collect().sorted
    assert(got === Seq(1L, 2L, 3L, 5L, 6L, 7L, 8L))
    // k=3: only the 10115/30s triple survives
    val got3 = Privacy.kAnonymous(rows, quasi, k = 3)
      .select(col("id")).as[Long].collect().sorted
    assert(got3 === Seq(1L, 2L, 3L))
    // schema: original columns only, no leaked internals
    assert(Privacy.kAnonymous(rows, quasi, 2).columns.toSeq ===
      rows.columns.toSeq)
  }

  test("lDiverse: a uniform-sensitive group fails even when k-anonymous") {
    val got = Privacy.lDiverse(rows, quasi, "salary", l = 2)
      .select(col("id")).as[Long].collect().sorted
    // 20095/30s has 2 rows but 1 distinct salary → excluded
    assert(got === Seq(1L, 2L, 3L, 7L, 8L))
  }

  test("groupReport: sizes, distinct counts, verdicts") {
    val got = Privacy.groupReport(rows, quasi, "salary", k = 2, l = 2)
      .select(col("zip"), col("age_band"), col("n"), col("n_sensitive"),
        col("k_ok"), col("l_ok"))
      .as[(Option[String], String, Long, Long, Int, Int)]
      .collect().sortBy(r => (r._1.getOrElse(""), r._2))
    assert(got === Seq(
      (None, "30s", 2L, 2L, 1, 1),
      (Some("10115"), "30s", 3L, 3L, 1, 1),
      (Some("10115"), "40s", 1L, 1L, 0, 0),
      (Some("20095"), "30s", 2L, 1L, 1, 0)))
  }

  test("reserved-column guard: inputs carrying n / n_sensitive / __g_* are rejected") {
    // without the guard, drop("n") after the join-back would also drop
    // the USER's n column (drop-by-name drops all occurrences)
    val withN = rows.withColumn("n", lit(7))
    intercept[IllegalArgumentException] {
      Privacy.kAnonymous(withN, quasi, k = 2)
    }
    val withNs = rows.withColumn("n_sensitive", lit(1))
    intercept[IllegalArgumentException] {
      Privacy.lDiverse(withNs, quasi, "salary", l = 2)
    }
    val withPrefix = rows.withColumn("__g_zip", lit("x"))
    intercept[IllegalArgumentException] {
      Privacy.groupReport(withPrefix, quasi, "salary", k = 2, l = 2)
    }
  }

  test("property: kAnonymous output is exactly rows in >=k windows (seeded)") {
    val rnd = new scala.util.Random(66)
    val df = (1 to 400).map { i =>
      (i.toLong, s"z${rnd.nextInt(8)}", s"a${rnd.nextInt(4)}", rnd.nextInt(5))
    }.toDF("id", "zip", "age_band", "salary")
    for (k <- Seq(1, 5, 20)) {
      val got = Privacy.kAnonymous(df, quasi, k).select(col("id"))
        .as[Long].collect().sorted.toSeq
      val counts = df.groupBy(quasi.map(col): _*).count()
        .as[(String, String, Long)].collect()
        .map { case (z, a, n) => (z, a) -> n }.toMap
      val want = df.select(col("id"), col("zip"), col("age_band"))
        .as[(Long, String, String)].collect()
        .filter { case (_, z, a) => counts((z, a)) >= k }
        .map(_._1).sorted.toSeq
      assert(got === want, s"k=$k")
    }
  }
}
