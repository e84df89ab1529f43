package graft.operators

import graft.SparkSpec

/** Split-conformal calibration (r13, L140). Pins the ⌈(n+1)(1−α)⌉
  * ceiling-rank arithmetic against hand cases, the rank-th-smallest
  * pick under ties, the rank > n no-guarantee NULL, the coverage
  * audit's exact counting, a measured exchangeable-coverage check, and
  * a BigInt replay of the rank formula across α values. */
class ConformalSpec extends SparkSpec {
  import spark.implicits._

  private def thr(scores: Seq[Long], alphaE6: Long) = {
    val r = Conformal.splitThreshold(
      scores.map(("g", _)).toDF("g", "s"), "g", "s", alphaE6)
      .collect().head
    (r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))
  }

  test("hand ranks: n=9 α=0.1 takes the 9th; n=19 takes the 18th") {
    // ceil(10·0.9) = 9 — the max of 9 sorted scores
    val nine = (1L to 9L).map(_ * 10L)
    assert(thr(nine, 100000L) === ((9L, 9L, Some(90L))))
    // ceil(20·0.9) = 18 — the 18th of 19
    val nineteen = (1L to 19L).map(_ * 10L)
    assert(thr(nineteen, 100000L) === ((19L, 18L, Some(180L))))
    // α = 0.5, n = 9: ceil(10·0.5) = 5 → the 5th
    assert(thr(nine, 500000L) === ((9L, 5L, Some(50L))))
  }

  test("rank > n: too few calibration points emits NULL, never a clamp") {
    // n = 3, α = 0.1: ceil(4·0.9) = 4 > 3 — the guarantee does not
    // exist; clamping to the max would claim coverage the math lacks
    assert(thr(Seq(1L, 2L, 3L), 100000L) === ((3L, 4L, None)))
  }

  test("ties: the rank-th value is tie-order-invariant") {
    val scores = Seq(5L, 5L, 5L, 5L, 1L, 1L, 2L, 3L, 9L)
    val (_, rank, q) = thr(scores, 100000L)
    assert(rank === 9L && q === Some(scores.max))
    val (_, r2, q2) = thr(scores, 500000L) // rank 5 lands inside the 5s
    assert(r2 === 5L && q2 === Some(5L))
  }

  test("BigInt replay of the ceiling rank across n and α") {
    for (n <- Seq(1, 7, 19, 100, 9999); aE6 <- Seq(1L, 50000L, 100000L,
        500000L, 999999L)) {
      val expect = ((BigInt(n) + 1) * (1000000L - aE6) + 999999L) /
        1000000L
      val scores = (1L to n.toLong).toSeq
      val (_, rank, _) = thr(scores, aE6)
      assert(rank === expect.toLong, s"n=$n alpha=$aE6")
      // and the definitional form: the smallest r with r/(n+1) ≥ 1−α
      val defForm = (1 to n + 1).find(r =>
        BigInt(r) * 1000000 >= BigInt(n + 1) * (1000000L - aE6)).get
      assert(rank === defForm.toLong, s"ceiling ≡ definition n=$n")
    }
  }

  test("coverage audit counts exactly; NULL threshold audits as NULL") {
    val calib = ((1L to 19L).map(("g", _)) ++ Seq(("h", 1L)))
      .toDF("g", "s")
    val test = (Seq(5L, 17L, 18L, 19L, 200L).map(("g", _)) ++
      Seq(("h", 1L), ("h", 2L))).toDF("g", "s")
    val out = Conformal.coverage(test,
        Conformal.splitThreshold(calib, "g", "s", 100000L), "g", "s")
      .collect().map(r => r.getString(0) -> (r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))).toMap
    // g: qhat = 18 → covered {5, 17, 18}, not {19, 200}
    assert(out("g") === ((5L, Some(3L), Some(600000L))))
    // h: n_cal = 1 < 9 → no guarantee → NULL coverage
    assert(out("h") === ((2L, None, None)))
  }

  test("measured exchangeable coverage: iid splits land near 1 − α") {
    // deterministic pseudo-random scores, even/odd split — coverage of
    // the α = 0.1 bound must sit in the DKW-ish band around 0.9
    val vals = (0 until 4000).map(i =>
      (i.toLong, ((i.toLong * 2654435761L) % 100000L)))
    val calib = vals.filter(_._1 % 2 == 0).map(v => ("g", v._2))
      .toDF("g", "s")
    val test = vals.filter(_._1 % 2 == 1).map(v => ("g", v._2))
      .toDF("g", "s")
    val r = Conformal.coverage(test,
        Conformal.splitThreshold(calib, "g", "s", 100000L), "g", "s")
      .collect().head
    val cov = r.getLong(6) / 1e6
    info(f"coverage at alpha=0.1: $cov%.4f (n_cal=2000, n_test=2000)")
    assert(cov >= 0.87 && cov <= 0.93,
      f"coverage $cov%.4f outside the exchangeable band")
  }
}
