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

  // ---------------------------------------------------- SVT (q_p7)

  private def svtRows(counts: Map[String, Int]) =
    counts.toSeq.flatMap { case (g, n) => Seq.fill(n)(Tuple1(g)) }
      .toDF("g")

  test("SVT halts exactly after the c-th above") {
    // 12 groups far above T=5, c=3 with near-zero noise (eps 20):
    // output ends with the 3rd above; later groups are never evaluated
    val df = svtRows((1 to 12).map(i => f"g$i%02d" -> 100).toMap)
    val out = Privacy.svtAboveThreshold(df, Seq("g"), 5L, 20.0, 3, "s1")
      .orderBy("g").collect()
    assert(out.length === 3)
    assert(out.forall(_.getInt(1) === 1))
    assert(out.map(_.getString(0)).toSeq === Seq("g01", "g02", "g03"))
  }

  test("SVT with near-zero noise matches the exact comparison") {
    // eps 20 => noise magnitude ~0 with overwhelming probability under
    // the seeded draws; far-from-threshold counts answer exactly
    val counts = Map("a" -> 2, "b" -> 50, "c" -> 3, "d" -> 60, "e" -> 1)
    val out = Privacy.svtAboveThreshold(svtRows(counts), Seq("g"),
        20L, 20.0, 2, "s2")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // key order a..e: aboves at b and d; halt after d
    assert(out === Map("a" -> 0, "b" -> 1, "c" -> 0, "d" -> 1))
  }

  test("SVT is deterministic under repartitioning and seed-sensitive") {
    val df = svtRows((1 to 10).map(i => s"g$i" -> (i * 7)).toMap)
    val a = Privacy.svtAboveThreshold(df, Seq("g"), 35L, 1.0, 4, "s3")
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = Privacy.svtAboveThreshold(df.repartition(5), Seq("g"),
        35L, 1.0, 4, "s3")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a === b)
    val c = Privacy.svtAboveThreshold(df, Seq("g"), 35L, 1.0, 4, "s4")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a !== c) // different seed, different noise stream
  }
}
