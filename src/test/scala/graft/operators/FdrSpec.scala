package graft.operators

import graft.SparkSpec

/** L183 Benjamini–Hochberg step-up (r15): hand-worked thresholds,
  * the classic step-up trap (a failing compare below a passing one
  * still rejects), tie determinism, and null hygiene. */
class FdrSpec extends SparkSpec {
  import spark.implicits._

  private def run(ps: Seq[(String, Long)], alphaE6: Long = 50000L) = {
    val df = ps.map { case (t, p) => ("f", t, p) }.toDF("f", "t", "p")
    Fdr.benjaminiHochberg(df, "f", "t", "p", alphaE6)
      .collect()
      .map(r => r.getString(1) -> (r.getLong(3), r.getLong(5))).toMap
  }

  test("hand-worked 4-test panel: only the floor p survives the step-up") {
    // sorted p·m vs k·α at m = 4, α = 0.05: 0.04 ≤ 0.05 ✓;
    // 0.12 > 0.10 ✗; 0.16 > 0.15 ✗; 3.2 > 0.2 ✗ → kmax = 1
    val out = run(Seq(("a", 10000L), ("b", 40000L), ("c", 30000L),
      ("d", 800000L)))
    assert(out("a") === ((1L, 1L)))
    assert(out("c") === ((2L, 0L)) && out("b") === ((3L, 0L)))
    assert(out("d") === ((4L, 0L)))
  }

  test("step-up: a test FAILING its own compare is still rejected " +
      "when a later rank passes (the classic implementation trap)") {
    // m = 3: k2's 0.04·3 = 0.12 > 0.10 fails, but k3's
    // 0.045·3 = 0.135 ≤ 0.15 passes → kmax = 3, ALL reject
    val out = run(Seq(("a", 1000L), ("b", 40000L), ("c", 45000L)))
    assert(out.values.forall(_._2 == 1L), s"step-up broke: $out")
  }

  test("pure-noise panel: empty discovery set") {
    val out = run((1 to 10).map(i => (s"t$i", 90000L + 10000L * i)))
    assert(out.values.forall(_._2 == 0L))
  }

  test("tied p's rank deterministically by test id") {
    val out = run(Seq(("z", 1000L), ("a", 1000L), ("m", 1000L)))
    assert(out("a")._1 === 1L && out("m")._1 === 2L && out("z")._1 === 3L)
  }

  test("p outside [0, 1e6] raises — the domain guard (r16)") {
    // a silently-ranked 2e6 "p" would inflate m and distort every
    // compare; the guard fails loudly at the offending row
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    Seq(2000000L, -1L).foreach { bad =>
      val df = Seq(("f", "a", 1000L), ("f", "b", bad))
        .toDF("f", "t", "p")
      val ex = intercept[Exception] {
        Fdr.benjaminiHochberg(df, "f", "t", "p").collect()
      }
      assert(messages(ex).exists(_.contains("Fdr: p_e6 outside")),
        s"unexpected failure: ${messages(ex).mkString(" | ")}")
    }
  }

  test("null p's drop and shrink m; empty panel emits nothing") {
    val df = Seq(("f", "a", Some(1000L)), ("f", "b", None))
      .toDF("f", "t", "p")
    val rows = Fdr.benjaminiHochberg(df, "f", "t", "p").collect()
    assert(rows.length === 1 && rows.head.getLong(4) === 1L)
    assert(Fdr.benjaminiHochberg(df.filter("p IS NULL"), "f", "t", "p")
      .collect().isEmpty)
  }
}
