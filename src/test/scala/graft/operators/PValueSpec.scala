package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PValue tail-table pins (r16, L187) — the classic critical points
  * land where a century of tables says they do, the bucket lookup is
  * exact on constructed perfect squares, and the conservative
  * lower-edge convention holds (p never under-reads). */
class PValueSpec extends SparkSpec {
  import spark.implicits._

  test("table landmarks: the classic critical points") {
    // Q_KS(1.36) ≈ 0.049, the 5% KS point; 2(1−Φ(1.96)) ≈ 0.050
    assert(PValue.KsTail2E6ByLambdaE2(136) > 48000L &&
      PValue.KsTail2E6ByLambdaE2(136) < 50000L)
    assert(PValue.NormTail2E6ByZE2(196) > 49000L &&
      PValue.NormTail2E6ByZE2(196) <= 50000L)
    // 1% points: Q_KS(1.63) ≈ 0.0098, 2(1−Φ(2.58)) ≈ 0.0099
    assert(PValue.KsTail2E6ByLambdaE2(163) > 9000L &&
      PValue.KsTail2E6ByLambdaE2(163) < 10000L)
    assert(PValue.NormTail2E6ByZE2(258) > 9000L &&
      PValue.NormTail2E6ByZE2(258) < 10000L)
    // edges: a zero statistic is no evidence; the far tail is dust
    assert(PValue.KsTail2E6ByLambdaE2.head === 1000000L)
    assert(PValue.NormTail2E6ByZE2.head === 1000000L)
    assert(PValue.KsTail2E6ByLambdaE2.last === 0L)
    assert(PValue.NormTail2E6ByZE2.last <= 1L)
    assert(PValue.KsTail2E6ByLambdaE2.size === 350)
    assert(PValue.NormTail2E6ByZE2.size === 500)
  }

  test("tables are monotone nonincreasing (a tail must be)") {
    for (t <- Seq(PValue.KsTail2E6ByLambdaE2, PValue.NormTail2E6ByZE2))
      t.sliding(2).foreach { case Seq(a, b) => assert(a >= b) }
  }

  test("ksTail2E6: exact bucket on a constructed perfect square") {
    // n1 = n2 = 200, ks_num = 5440 (D = 0.136): λ²·10⁴ =
    // 10⁴·5440²/(200·200·400) = 18496 = 136² exactly → bucket 136
    val p = Seq((5440L, 200L, 200L)).toDF("k", "a", "b")
      .select(PValue.ksTail2E6(col("k"), col("a"), col("b")))
      .head.getLong(0)
    assert(p === PValue.KsTail2E6ByLambdaE2(136))
  }

  test("ksTail2E6: empty cohort reads p = 1; deep tail reads 0") {
    val rows = Seq((0L, 0L, 400L), (400L * 400L, 400L, 400L))
      .toDF("k", "a", "b")
      .select(PValue.ksTail2E6(col("k"), col("a"), col("b")))
      .collect().map(_.getLong(0))
    assert(rows(0) === 1000000L)
    // D = 1 at n = 400/side: λ = √(400·400/800) ≈ 14 ≥ 3.5 → 0
    assert(rows(1) === 0L)
  }

  test("normTail2E6: z = 1.96 hand case, far tail 0, NULL rides through") {
    // z²·10⁶ = 3841600 → //100 = 38416 = 196² exactly → bucket 196
    val df = Seq(Some(3841600L), Some(26000000L), None)
      .toDF("z2").select(PValue.normTail2E6(col("z2")))
    val rows = df.collect()
    assert(rows(0).getLong(0) === PValue.NormTail2E6ByZE2(196))
    assert(rows(1).getLong(0) === 0L) // z ≈ 5.10 past the table
    assert(rows(2).isNullAt(0))
  }

  test("bucket floor is conservative: p at the lower edge over-reads") {
    // λ²·10⁴ = 18497 (just past 136²) still reads bucket 136 — the
    // SAME p as the exact square, never the smaller next-bucket p
    // (n1·n2·(n1+n2) chosen so the div floors to 18497:
    //  ks_num²·10⁴ = 18497·16·10⁶ + r)
    val p1 = Seq((5440L, 200L, 200L)).toDF("k", "a", "b")
      .select(PValue.ksTail2E6(col("k"), col("a"), col("b")))
      .head.getLong(0)
    val p2 = Seq((5441L, 200L, 200L)).toDF("k", "a", "b")
      .select(PValue.ksTail2E6(col("k"), col("a"), col("b")))
      .head.getLong(0)
    assert(p2 === p1, "a hair past the square must stay in its bucket")
  }
}
