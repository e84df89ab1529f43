package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Integer log-table PSI (r14, L151). Pins the plain-Scala BigInt
  * replay (range reduction, table, quantization), the hand-computed
  * power-of-two and mantissa cases, the A/A zero, the approximation
  * bound against the float path, and the table constants themselves. */
class DriftExactSpec extends SparkSpec {
  import spark.implicits._

  /** The reference range-reduced table log — mirrors the operator and
    * its oracle: k from binary lengths + one exact compare, floor
    * mantissa cell, k·ln2 + T[i]. */
  private def lnE9Ref(num: BigInt, den: BigInt): Long = {
    var k = num.bitLength - den.bitLength
    def sn(k: Int) = if (k >= 0) num else num << -k
    def sd(k: Int) = if (k >= 0) den << k else den
    if (sn(k) < sd(k)) k -= 1
    val mi = (sn(k) * 256 / sd(k) - 256).toInt
    k.toLong * Drift.Ln2E9 + Drift.MantissaLnE9(mi)
  }

  /** Full plain-Scala replay of categoricalExact over bucket counts. */
  private def psiRef(counts: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
    val tr = counts.map(_._2).sum; val tc = counts.map(_._3).sum
    val b = counts.size
    counts.map { case (bucket, nr, nc) =>
      val d1 = BigInt(2) * tr + b; val d2 = BigInt(2) * tc + b
      val num = (BigInt(2) * nr + 1) * d2
      val den = (BigInt(2) * nc + 1) * d1
      bucket -> ((num - den) * lnE9Ref(num, den) / (d1 * d2)).toLong
    }
  }

  /** Run the operator on exploded rows for the given bucket counts. */
  private def run(counts: Seq[(Long, Long, Long)]): Map[Long, (Long, Long, Long)] = {
    def side(f: ((Long, Long, Long)) => Long) = counts
      .flatMap(c => Seq.fill(f(c).toInt)(c._1)).toDF("nb")
    Drift.categoricalExact(side(_._2), side(_._3), "nb")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
  }

  test("table constants: T[0] = 0, T monotone, ln2 pinned") {
    assert(Drift.MantissaLnE9.head === 0L)
    assert(Drift.MantissaLnE9.sliding(2).forall(p => p(0) < p(1)))
    assert(Drift.MantissaLnE9.size === 256)
    assert(Drift.Ln2E9 === 693147181L)
    // last cell just under ln 2
    assert(Drift.MantissaLnE9.last < Drift.Ln2E9)
  }

  test("hand case: ratio 4 hits k=2 exactly; ratio 24/42 hits cell 36") {
    // ref (1,1), cur (3,0): bucket 1 has num=24, den=6 → ratio 4,
    // ln = 2·ln2 exactly; psi = 18·2·693147181 // 48 = 519860385
    val got = run(Seq((0L, 1L, 3L), (1L, 1L, 0L)))
    assert(got(1L) === ((1L, 0L, 519860385L)))
    // bucket 0: num=24, den=42 → k=−1, scaled 48/42 → cell 36:
    // psi = (−18)·(−693147181 + T[36]) // 48
    val expect0 = (BigInt(-18) *
      (-693147181L + Drift.MantissaLnE9(36)) / 48).toLong
    assert(got(0L) === ((1L, 3L, expect0)))
  }

  test("identical cohorts: every bucket contributes exactly 0") {
    val got = run(Seq((0L, 5L, 5L), (1L, 9L, 9L), (2L, 1L, 1L)))
    assert(got.values.forall(_._3 === 0L), got.toString)
  }

  test("empty-side buckets are defined (smoothing), never an error") {
    val got = run(Seq((0L, 4L, 0L), (1L, 0L, 4L)))
    assert(got(0L)._3 > 0L && got(1L)._3 > 0L)
  }

  test("plain-Scala BigInt replay, seeded counts") {
    val rnd = new scala.util.Random(19)
    val counts = (0L until 9L).map(bkt =>
      (bkt, rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
    val want = psiRef(counts).toMap
    val got = run(counts)
    for ((bkt, psi) <- want)
      assert(got(bkt)._3 === psi, s"bucket $bkt")
  }

  test("range reduction tracks StrictMath.log within one table cell") {
    // the documented approximation bound: the floor mantissa cell
    // under-reads ln by at most ln(1+1/256) ≈ 3.9e-3 nats
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val num = BigInt(rnd.nextLong(1000000000000L) + 1)
      val den = BigInt(rnd.nextLong(1000000000000L) + 1)
      val got = lnE9Ref(num, den)
      val truth = StrictMath.log(num.toDouble / den.toDouble) * 1e9
      assert(got <= truth + 1 && got > truth - 3906251,
        s"ln($num/$den): $got vs $truth")
    }
  }

  test("table psi tracks the float path within the documented bound") {
    val rnd = new scala.util.Random(23)
    val counts = (0L until 8L).map(bkt =>
      (bkt, rnd.nextInt(900).toLong + 10L, rnd.nextInt(900).toLong + 10L))
    val tr = counts.map(_._2).sum.toDouble
    val tc = counts.map(_._3).sum.toDouble
    val got = run(counts)
    for ((bkt, nr, nc) <- counts) {
      val p = (nr + 0.5) / (tr + 0.5 * counts.size)
      val q = (nc + 0.5) / (tc + 0.5 * counts.size)
      val floatPsi = (p - q) * StrictMath.log(p / q) * 1e9
      // smoothing conventions agree exactly ((2n+1)/(2N+B) ≡ the
      // float (n+.5)/(N+.5B)); the gap is the mantissa floor alone
      assert(math.abs(got(bkt)._3 - floatPsi) <= 4000000.0,
        s"bucket $bkt: ${got(bkt)._3} vs $floatPsi")
    }
  }

  // ---- Jensen–Shannon (r14, L159) ----------------------------------

  /** Full plain-Scala replay of jensenShannonExact. */
  private def jsdRef(counts: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    val tr = counts.map(_._2).sum; val tc = counts.map(_._3).sum
    val b = counts.size
    counts.map { case (bucket, nr, nc) =>
      val d1 = BigInt(2) * tr + b; val d2 = BigInt(2) * tc + b
      val np = (BigInt(2) * nr + 1) * d2
      val nq = (BigInt(2) * nc + 1) * d1
      val pln = lnE9Ref(2 * np, np + nq)
      val qln = lnE9Ref(2 * nq, np + nq)
      bucket -> ((np * pln + nq * qln) / (2 * d1 * d2)).toLong
    }.toMap
  }

  private def runJsd(counts: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    def side(f: ((Long, Long, Long)) => Long) = counts
      .flatMap(c => Seq.fill(f(c).toInt)(c._1)).toDF("nb")
    Drift.jensenShannonExact(side(_._2), side(_._3), "nb")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
  }

  test("jsd: identical cohorts read an EXACT 0 (cell-0 on both lns)") {
    val got = runJsd(Seq((0L, 5L, 5L), (1L, 9L, 9L), (2L, 1L, 1L)))
    assert(got.values.forall(_ === 0L), got.toString)
  }

  test("jsd: symmetric in its arguments, bucket by bucket") {
    val counts = Seq((0L, 7L, 2L), (1L, 1L, 9L), (2L, 4L, 4L))
    def side(f: ((Long, Long, Long)) => Long) = counts
      .flatMap(c => Seq.fill(f(c).toInt)(c._1)).toDF("nb")
    val ab = Drift.jensenShannonExact(side(_._2), side(_._3), "nb")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val ba = Drift.jensenShannonExact(side(_._3), side(_._2), "nb")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(ab === ba)
  }

  test("jsd: disjoint support totals under the ln 2 cap") {
    // maximal drift: all ref mass in bucket 0, all cur in bucket 1 —
    // true JSD < ln 2 (smoothing keeps it strictly under), and the
    // floored table can only read lower
    val got = runJsd(Seq((0L, 50L, 0L), (1L, 0L, 50L)))
    val total = got.values.sum
    assert(total > 500000000L && total < Drift.Ln2E9,
      s"total $total")
  }

  test("jsd: the near-identical negative-read class, pinned live") {
    // p ≈ q puts one ratio just UNDER 1 (k=−1, cell 255: ln reads
    // ~−3.9e-3 instead of ~−1e-3-ish) — the documented under-read;
    // the magnitude must stay inside the (p+q)/2·ln(257/256) bound
    val got = runJsd(Seq((0L, 499L, 500L), (1L, 500L, 499L)))
    assert(got.values.exists(_ < 0L),
      s"expected a floored-negative read: $got")
    // per-bucket bound: (p+q)/2 ≤ ~0.5 ⇒ |term| ≤ ~2e6; total ≤ 3.9e6
    assert(got.values.forall(v => v > -2500000L && v < 2500000L), got.toString)
  }

  test("jsd: plain-Scala BigInt replay, seeded counts") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      val counts = (0L until 8L).map(bkt =>
        (bkt, rnd.nextInt(800).toLong, rnd.nextInt(800).toLong))
      assert(runJsd(counts) === jsdRef(counts), s"trial $trial")
    }
  }

  test("jsd: tracks float JSD within the documented total bound") {
    val rnd = new scala.util.Random(31)
    val counts = (0L until 8L).map(bkt =>
      (bkt, rnd.nextInt(900).toLong + 10L, rnd.nextInt(900).toLong + 10L))
    val tr = counts.map(_._2).sum.toDouble
    val tc = counts.map(_._3).sum.toDouble
    val b = counts.size
    val floatTotal = counts.map { case (_, nr, nc) =>
      val p = (nr + 0.5) / (tr + 0.5 * b)
      val q = (nc + 0.5) / (tc + 0.5 * b)
      val m = (p + q) / 2
      (p * StrictMath.log(p / m) + q * StrictMath.log(q / m)) / 2 * 1e9
    }.sum
    val total = runJsd(counts).values.sum.toDouble
    // floored lns ⇒ reading ≤ true; total under-read ≤ ln(257/256)
    assert(total <= floatTotal + 1 && total > floatTotal - 3906251,
      s"$total vs $floatTotal")
  }
}
