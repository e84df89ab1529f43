package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV mergeable distinct-count sketch (L124). Pins the sketch against
  * a plain-Scala k-smallest-distinct-hash reference, the merge ≡
  * recompute identity on randomized splits (the IncrementalAggSpec
  * discipline — this operator closes that file's COUNT(DISTINCT)
  * fence), the exact BIGINT estimator against BigInt division, the
  * under-full exactness guarantee, and duplicate invariance. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8

  /** The operator's 56-bit hash, replayed in plain Scala. */
  private def refHash(key: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(14)
    java.lang.Long.parseLong(hex, 16)
  }

  private def refSketch(keys: Seq[String], k: Int): Seq[Long] =
    keys.map(refHash).distinct.sorted.take(k)

  private def rows(n: Int): Seq[(String, String)] =
    (0 until n).map(i => (if (i % 3 == 0) "g1" else "g2",
      s"key${i % (n / 2 + 1)}")) // duplicates by construction

  test("sketch = the k smallest distinct hashes, per group") {
    val df = rows(60).toDF("g", "key")
    val got = Kmv.sketch(df, Seq("g"), "key", K)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val byGroup = rows(60).groupBy(_._1)
    for ((g, rs) <- byGroup)
      assert(got(g) === refSketch(rs.map(_._2), K), s"group $g")
  }

  test("merge ≡ recompute on randomized splits (closes the L71 fence)") {
    val data = rows(80)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val mask = data.map(_ => rnd.nextBoolean())
      val (a, b) = data.zip(mask).partition(_._2)
      val sa = Kmv.sketch(a.map(_._1).toDF("g", "key"), Seq("g"), "key", K)
      val sb = Kmv.sketch(b.map(_._1).toDF("g", "key"), Seq("g"), "key", K)
      val merged = Kmv.merge(sa, sb, Seq("g"), K)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val direct = Kmv.sketch(data.toDF("g", "key"), Seq("g"), "key", K)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(merged === direct)
    }
  }

  test("generation-over-generation: 4 sequential merges ≡ the one-shot " +
      "sketch, schema stable (the L71 sink shape)") {
    val data = rows(100)
    val gens = data.grouped(25).toSeq // 4 ingest generations
    var table = Kmv.sketch(gens.head.toDF("g", "key"), Seq("g"), "key", K)
    val schema0 = table.schema
    for (gen <- gens.tail) {
      table = Kmv.merge(table,
        Kmv.sketch(gen.toDF("g", "key"), Seq("g"), "key", K), Seq("g"), K)
      assert(table.schema === schema0) // sink-table schema never drifts
    }
    val folded = table
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = Kmv.sketch(data.toDF("g", "key"), Seq("g"), "key", K)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(folded === direct)
  }

  test("merging an empty delta is the identity") {
    val s = Kmv.sketch(rows(40).toDF("g", "key"), Seq("g"), "key", K)
    val empty = s.filter(lit(false))
    val merged = Kmv.merge(s, empty, Seq("g"), K)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val orig = s.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged === orig)
  }

  test("under-full sketch: estimate IS the exact distinct count") {
    val df = Seq(("g", "a"), ("g", "b"), ("g", "c"), ("g", "a"))
      .toDF("g", "key")
    val out = Kmv.estimate(Kmv.sketch(df, Seq("g"), "key", K), K).head()
    assert(out.getAs[Long]("n_kept") === 3L)
    assert(out.getAs[Any]("kth_min") === null)
    assert(out.getAs[Long]("est_distinct") === 3L)
  }

  test("full sketch: estimator equals the BigInt (k-1)·M/t floor exactly") {
    val df = (0 until 500).map(i => ("g", s"u$i")).toDF("g", "key")
    val out = Kmv.estimate(Kmv.sketch(df, Seq("g"), "key", K), K).head()
    val t = out.getAs[Long]("kth_min")
    val want = (BigInt(K - 1) * BigInt(Kmv.M) / BigInt(t)).toLong
    assert(out.getAs[Long]("est_distinct") === want)
    // and the estimate is in the right ballpark (~1/sqrt(8) rel. error;
    // generous 3x band so the test never flakes on hash luck)
    val est = out.getAs[Long]("est_distinct")
    assert(est > 500 / 3 && est < 500 * 3, s"estimate $est vs 500")
  }

  test("duplicates never change the sketch") {
    val once = rows(50).toDF("g", "key")
    val tripled = (rows(50) ++ rows(50) ++ rows(50)).toDF("g", "key")
    val a = Kmv.sketch(once, Seq("g"), "key", K)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val b = Kmv.sketch(tripled, Seq("g"), "key", K)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(a === b)
  }

  test("null keys are dropped; k outside [2, 64] is rejected") {
    val df = Seq(("g", Option("a")), ("g", Option.empty[String]))
      .toDF("g", "key")
    assert(Kmv.sketch(df, Seq("g"), "key", K).head().getSeq[Long](1)
      .size === 1)
    intercept[IllegalArgumentException] {
      Kmv.sketch(df, Seq("g"), "key", 1)
    }
    intercept[IllegalArgumentException] {
      Kmv.sketch(df, Seq("g"), "key", 65)
    }
    intercept[IllegalArgumentException] { // reserved-name guard
      Kmv.sketch(df.withColumnRenamed("g", "kmv"), Seq("kmv"), "key", K)
    }
  }
}
