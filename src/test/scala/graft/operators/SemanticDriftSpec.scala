package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** L178 embedding centroid drift (r15): exact hand vectors, the
  * A/A ≈ 1e6 calibration, the planted-shift growth, quantize-once
  * determinism, and a seeded BigInt replay. */
class SemanticDriftSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Seq[Double])]) = {
    val df = rows.map { case (c, v) => ("p", c, v.map(_.toFloat)) }
      .toDF("p", "c", "emb")
    SemanticDrift.centroidCos(df, "p", "c", "emb", "a", "b")
      .collect().head
  }

  test("hand vectors: aligned cohorts read cos2 = 1e6 and the exact gap") {
    // a = (1,0), b = (2,0): sums sa=(1000,0), sb=(2000,0)
    // dot = 2e6, na2 = 1e6, nb2 = 4e6 → cos2 = 1e6 exactly
    // gap2 = (1·2000 − 1·1000)² = 1e6; t2 = 1e6+4e6 = 5e6
    // drift = 1e6·1e6/(1·1·5e6) = 200000
    val r = run(Seq(("a", Seq(1.0, 0.0)), ("b", Seq(2.0, 0.0))))
    assert(r.getLong(3) === 1L)          // d_sign
    assert(r.getLong(4) === 1000000L)    // cos2
    assert(r.getLong(5) === 200000L)     // drift
  }

  test("orthogonal centroids: cos2 = 0 with sign 0") {
    val r = run(Seq(("a", Seq(1.0, 0.0)), ("b", Seq(0.0, 1.0))))
    assert(r.getLong(3) === 0L && r.getLong(4) === 0L)
  }

  test("opposed centroids: negative sign, cos2 positive") {
    val r = run(Seq(("a", Seq(1.0, 0.0)), ("b", Seq(-1.0, 0.0))))
    assert(r.getLong(3) === -1L && r.getLong(4) === 1000000L)
  }

  test("zero cohort vector: NULL cos2, drift still defined") {
    val r = run(Seq(("a", Seq(0.0, 0.0)), ("b", Seq(1.0, 0.0))))
    assert(r.isNullAt(4))
    assert(!r.isNullAt(5))
  }

  test("A/A calibration: exchangeable split reads drift near 1e6") {
    val rnd = new scala.util.Random(178)
    val rows = Seq.fill(400)((if (rnd.nextBoolean()) "a" else "b",
      Seq.fill(16)(rnd.nextGaussian() * 0.2)))
    val r = run(rows)
    val drift = r.getLong(5)
    // χ²₁₆/16 fluctuation band around the constructed 1e6 baseline
    assert(drift > 300000L && drift < 2500000L,
      s"A/A drift read $drift, outside the null band")
  }

  test("planted shift: drift grows far past the null band; seeded replay") {
    val rnd = new scala.util.Random(515)
    val rows = Seq.fill(400) {
      val c = if (rnd.nextBoolean()) "a" else "b"
      val shift = if (c == "b") 0.15 else 0.0
      (c, Seq.fill(16)(rnd.nextGaussian() * 0.2 + shift))
    }
    val r = run(rows)
    assert(r.getLong(5) > 5000000L,
      s"planted shift read ${r.getLong(5)}")
    // plain-Scala replay of the full integer cascade
    val q = rows.map { case (c, v) =>
      (c, v.map(x => math.floor(x.toFloat.toDouble * 1000 + 0.5).toLong))
    }
    val nA = q.count(_._1 == "a"); val nB = q.count(_._1 == "b")
    val dims = q.head._2.indices
    def s(c: String, d: Int) =
      BigInt(q.filter(_._1 == c).map(_._2(d)).sum)
    val gap2 = dims.map(d => {
      val g = BigInt(nA) * s("b", d) - BigInt(nB) * s("a", d); g * g
    }).sum
    val t2 = q.flatMap(_._2).map(x => BigInt(x) * x).sum
    assert(r.getLong(5) ===
      (BigInt(1000000) * gap2 / (BigInt(nA) * nB * t2)).toLong)
  }
}
