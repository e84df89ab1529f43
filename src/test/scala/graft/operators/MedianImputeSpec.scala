package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics pinned to the reference (fill_in_missing_values.py:13-18):
  * sorted(non-null values)[n // 2] — the UPPER median for even n, no
  * interpolation. */
class MedianImputeSpec extends SparkSpec {
  import spark.implicits._

  private def refMedian(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  test("odd count: middle element") {
    val m = MedianImpute.exactUpperMedian(Seq(5.0, 1.0, 3.0).toDF("x"), "x")
    assert(m.contains(3.0))
  }

  test("even count: UPPER median (index n/2), matching the reference") {
    val m = MedianImpute.exactUpperMedian(Seq(1.0, 2.0, 3.0, 4.0).toDF("x"), "x")
    assert(m.contains(3.0)) // sorted[4//2] = sorted[2] = 3.0, NOT 2.5
  }

  test("all-null column yields None") {
    val df = Seq[Option[Double]](None, None).toDF("x")
    assert(MedianImpute.exactUpperMedian(df, "x").isEmpty)
  }

  test("empty input yields None") {
    val df = Seq.empty[Double].toDF("x")
    assert(MedianImpute.exactUpperMedian(df, "x").isEmpty)
  }

  test("nulls are ignored, not counted") {
    val df = Seq(Some(10.0), None, Some(30.0), None, Some(20.0)).toDF("x")
    assert(MedianImpute.exactUpperMedian(df, "x").contains(20.0))
  }

  test("property: matches in-memory sorted[n/2] on random data (seeded)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val n = rnd.nextInt(200) + 1
      val xs = List.fill(n)(rnd.nextDouble() * 2e6 - 1e6)
      val m = MedianImpute.exactUpperMedian(xs.toDF("x"), "x")
      assert(m.contains(refMedian(xs)), s"trial $trial n=$n")
    }
  }

  test("exactQuantile: floor(p*(n-1)) rank on sorted values, endpoints included") {
    val rnd = new scala.util.Random(7)
    val xs = List.fill(501)(rnd.nextDouble() * 1e4)
    val sorted = xs.sorted
    val df = xs.toDF("x")
    for (p <- Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)) {
      val want = sorted(math.floor(p * (xs.size - 1)).toInt)
      assert(MedianImpute.exactQuantile(df, "x", p).contains(want), s"p=$p")
    }
    assert(MedianImpute.exactQuantile(
      Seq.empty[Double].toDF("x"), "x", 0.5).isEmpty)
    intercept[IllegalArgumentException] {
      MedianImpute.exactQuantile(df, "x", 1.5)
    }
    // batched = one sort pass; must agree with the singles (dup ps too)
    val batched = MedianImpute.exactQuantiles(df, "x",
      Seq(0.5, 0.9, 0.99, 0.5))
    assert(batched === Seq(0.5, 0.9, 0.99, 0.5).map(p =>
      Some(sorted(math.floor(p * (xs.size - 1)).toInt))))
  }

  test("distributed rank-select path (forced tiny window cutoff) is exact") {
    // maxWindowRows=10 forces the approxQuantile bracket + recursion path
    // that production only hits beyond 4M rows.
    val xs = (1 to 5000).map(_.toDouble * 7 % 1013)
    val vals = xs.toDF("v")
    for (k <- Seq(0L, 1L, 2500L, 4999L)) {
      val got = MedianImpute.selectRank(vals, k, xs.size.toLong, maxWindowRows = 10)
      assert(got == xs.sorted.apply(k.toInt), s"rank $k")
    }
  }

  test("duplicate-heavy distribution terminates via bisection and is exact") {
    val xs = Seq.fill(2000)(5.0) ++ Seq.fill(1500)(1.0) ++ Seq.fill(1500)(9.0)
    val got = MedianImpute.selectRank(xs.toDF("v"), xs.size / 2L,
      xs.size.toLong, maxWindowRows = 10)
    assert(got == xs.sorted.apply(xs.size / 2))
  }

  test("impute fills nulls with each column's own upper median") {
    val df = Seq(
      (Some(1.0), Some(10.0)), (Some(2.0), None),
      (None, Some(30.0)), (Some(4.0), Some(40.0)), (Some(5.0), None)
    ).toDF("a", "b")
    val filled = MedianImpute.impute(df, Seq("a", "b"))
    assert(filled.filter(col("a").isNull || col("b").isNull).count() == 0)
    // a: sorted [1,2,4,5] -> idx 2 = 4.0 ; b: sorted [10,30,40] -> idx 1 = 30.0
    assert(filled.agg(sum("a")).head.getDouble(0) == 1 + 2 + 4 + 5 + 4.0)
    assert(filled.agg(sum("b")).head.getDouble(0) == 10 + 30 + 40 + 30 + 30.0)
  }

  test("impute leaves all-null columns untouched") {
    val df = Seq[(Option[Double], Option[Double])](
      (None, Some(1.0)), (None, Some(2.0))).toDF("a", "b")
    val filled = MedianImpute.impute(df, Seq("a", "b"))
    assert(filled.filter(col("a").isNull).count() == 2)
  }

  test("impute counts values AFTER the double cast (ADVICE r2): junk strings") {
    // raw non-null n=5, but only {1,2,3} survive the cast — the median must
    // be 2 (rank 3/2=1 of the CAST set), not a rank computed against n=5.
    val df = Seq(Some("1"), Some("2"), Some("3"), Some("abc"), Some("xyz"),
      None).toDF("c")
    val filled = MedianImpute.impute(df, Seq("c"))
    assert(filled.filter(col("c") === "2.0" || col("c") === "2").count() >= 1,
      "null must be filled with the cast-set median 2.0")
    assert(filled.filter(col("c").isNull).count() == 0)
    // junk values are untouched (only nulls are filled — pandas semantics)
    assert(filled.filter(col("c") === "abc").count() == 1)
  }

  test("impute skips a column whose values are ALL non-castable (no crash)") {
    val df = Seq(Some("abc"), Some("xyz"), None).toDF("c")
    val filled = MedianImpute.impute(df, Seq("c"))
    assert(filled.filter(col("c").isNull).count() == 1) // nothing to fill with
  }
}
