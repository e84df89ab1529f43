package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's adaptive stall correction (VERDICT r6 #1): a first-pass
  * time over ~3× its previous-round cal-normalized prior re-runs once
  * after the battery and the min is kept, so a mid-run host stall can
  * never again publish phantom regressions. No SparkSession needed —
  * the pass is a pure function over measurements plus an injected
  * runner. */
class BenchRerunSpec extends AnyFunSuite {

  private val cal = 0.30 // a typical cal_cs=30 host

  test("stallSuspect: fires on a 2x+ blowup, not on normal variance") {
    // r6's real phantom: q_t8 published 1.00 s against a 0.21 s prior
    assert(Bench.stallSuspect(1.00, cal, Some(0.21 / cal)))
    // r12's miss: q_a5 published 0.53 s against a 0.21 s prior (2.53×
    // cal-normalized) and the old 3× trigger let it through — the A/B
    // showed a host stall. The 2× trigger catches it.
    assert(Bench.stallSuspect(0.53, cal, Some(0.21 / cal)))
    // same query at its true steady state is not a suspect
    assert(!Bench.stallSuspect(0.22, cal, Some(0.21 / cal)))
    // the observed cal-normalized noise tail (≤1.34× in r12) never
    // re-runs — 1.5× is still inside the no-trigger zone
    assert(!Bench.stallSuspect(0.31, cal, Some(0.21 / cal)))
    // a brand-new query has no prior and is never a suspect
    assert(!Bench.stallSuspect(9.99, cal, None))
    // sub-15 ms priors are floored: 3x jitter on a 10 ms query is noise
    // (absolute tiny-query threshold unchanged at 0.15 norm-sec)
    assert(!Bench.stallSuspect(0.03, cal, Some(0.01 / cal)))
    assert(!Bench.stallSuspect(0.04, cal, Some(0.01 / cal)))
    assert(Bench.stallSuspect(0.05, cal, Some(0.01 / cal)))
  }

  test("stallSuspect: normalization makes the check host-speed invariant") {
    // same 3.3x regression ratio, host running at half speed (cal 0.60):
    // raw seconds double but the normalized comparison is unchanged
    assert(Bench.stallSuspect(2.00, 0.60, Some(0.21 / 0.30 * (0.30 / 0.30))))
    assert(!Bench.stallSuspect(0.44, 0.60, Some(0.21 / 0.30)))
  }

  test("adaptivePass: a sleep-injected stall triggers the re-run and the min wins") {
    // synthetic stall: the first measurement of q_slow was taken while
    // the host stalled (a literal sleep stands in for the stall); the
    // tail re-run measures the true cost and must replace it
    def timedSleep(ms: Long): Double = {
      val t0 = System.nanoTime()
      Thread.sleep(ms)
      (System.nanoTime() - t0) / 1e9
    }
    val stalled = timedSleep(400) // ~0.4 s recorded during the "stall"
    val firstPass = Seq("q_slow_stalled" -> stalled, "q_ok_steady" -> 0.10)
    val prior = Map("slow" -> 0.10 / cal, "ok" -> 0.10 / cal)
    val keys = Map("q_slow_stalled" -> "slow", "q_ok_steady" -> "ok")
    var rerunCalls = List.empty[String]
    val (res, reran) = Bench.adaptivePass(firstPass, cal, prior, keys,
      skip = _ => false,
      rerunSec = { n => rerunCalls ::= n; timedSleep(30) }) // stall gone
    assert(rerunCalls === List("q_slow_stalled"), "only the suspect re-runs")
    assert(reran === List("slow"))
    val byName = res.toMap
    assert(byName("q_slow_stalled") < 0.2,
      s"re-measured time replaces the stalled one: $byName")
    assert(byName("q_ok_steady") === 0.10)
  }

  test("adaptivePass: io_bound/error queries are skipped even when suspect") {
    val firstPass = Seq("q_j3_idempotent_append" -> 9.0)
    val prior = Map("j3" -> 0.5 / cal)
    val (res, reran) = Bench.adaptivePass(firstPass, cal, prior,
      Map("q_j3_idempotent_append" -> "j3"),
      skip = Bench.IoBound, // the real exemption set
      rerunSec = _ => fail("io_bound must never re-run"))
    assert(reran.isEmpty && res.head._2 === 9.0)
  }

  test("loadPriorNorm: the shipped resource parses and normalizes by its own cal") {
    val prior = Bench.loadPriorNorm()
    assert(prior.nonEmpty, "bench_prior.json must ride the classpath")
    // spot-check one stable key: stored sec / (cal_cs/100)
    assert(prior.contains("a1") && prior("a1") > 0.0)
  }
}
