package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** L168 HyperLogLog register sketch (r15): merge ≡ direct identity,
  * duplicate idempotence, both estimator regimes (linear counting and
  * raw), the plain-Scala register replay, and accuracy measured
  * against the DKW-ish 1.04/√m envelope. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int, salt: String) =
    (1 to n).map(i => ("g", s"$salt-$i")).toDF("g", "k")

  test("merge of arbitrary splits ≡ direct sketch (max-monoid identity)") {
    val all = keys(1000, "m")
    val direct = Hll.sketch(all, Seq("g"), "k").collect()
    // three unequal splits, one empty-overlapping (duplicates across
    // splits must not perturb the merge — max is idempotent)
    val a = Hll.sketch(all.limit(200), Seq("g"), "k")
    val b = Hll.sketch(all.filter(substring(col("k"), 3, 9).cast("int") > 150),
      Seq("g"), "k")
    val c = Hll.sketch(all, Seq("g"), "k")
    val merged = Hll.merge(a.unionByName(b).unionByName(c), Seq("g")).collect()
    assert(merged.length === 1 && direct.length === 1)
    assert(merged.head.getSeq[Long](1) === direct.head.getSeq[Long](1))
  }

  test("duplicate rows leave the sketch bit-identical (idempotence)") {
    val d = keys(500, "d")
    val once = Hll.sketch(d, Seq("g"), "k").collect().head.getSeq[Long](1)
    val thrice = Hll.sketch(d.unionByName(d).unionByName(d), Seq("g"), "k")
      .collect().head.getSeq[Long](1)
    assert(once === thrice)
  }

  test("register math matches the plain-Scala replay on every key") {
    val d = keys(64, "r")
    val fromEngine = Hll.sketch(d, Seq("g"), "k")
      .collect().head.getSeq[Long](1)
    val expected = Array.fill(Hll.M)(0L)
    (1 to 64).foreach { i =>
      val (j, rho) = Hll.registerJvm(s"r-$i")
      expected(j) = math.max(expected(j), rho)
    }
    assert(fromEngine === expected.toSeq)
  }

  test("small range takes linear counting and tracks the exact count") {
    val d = keys(5, "s")
    val est = Hll.estimate(Hll.sketch(d, Seq("g"), "k")).collect().head
    val vz = est.getAs[Long]("v_zero")
    assert(vz > 0L && vz >= Hll.M - 5) // ≤5 registers hit
    // linear counting at n ≪ m is near-exact: m·ln(m/V) with V ≥ m−5;
    // the table ln under-reads by ≤1 count (documented), so [n−1, n]
    val e = est.getAs[Long]("est")
    assert(e >= 4L && e <= 5L, s"lc estimate $e for 5 distinct")
  }

  test("large range takes the raw path inside the 3σ envelope") {
    val n = 10000
    val est = Hll.estimate(Hll.sketch(keys(n, "b"), Seq("g"), "k"))
      .collect().head
    assert(est.getAs[Long]("v_zero") === 0L) // 10k keys fill 256 registers
    val e = est.getAs[Long]("est").toDouble
    // σ = 1.04/√256 = 6.5%; 3σ ≈ 19.5% — deterministic md5 makes this
    // a fixed measurement, the band just documents the envelope
    assert(math.abs(e - n) / n < 0.195, s"raw estimate $e for $n distinct")
  }

  test("null keys drop; a group with only null keys emits no row") {
    val d = Seq(("g", Option("a")), ("g", None), ("h", None))
      .toDF("g", "k")
    val sk = Hll.sketch(d, Seq("g"), "k").collect()
    assert(sk.length === 1 && sk.head.getString(0) === "g")
  }

  test("estimator constants are the documented literals") {
    // the oracle embeds these integers — a drift here is a cross-engine
    // break the battery would catch later; pin it at the source
    assert(Hll.AlphaE6 === Math.round(1e6 * 0.7213 / (1 + 1.079 / 256)))
    assert(Hll.W === (1L << 48))
    assert(Hll.RawNum === BigInt(Hll.AlphaE6) * 256 * 256 * (BigInt(1) << 49))
  }
}
