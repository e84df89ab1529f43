package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DoReMi-style domain reweighting (L129). Pins the invariants the
  * allocation algebra promises (Σweight = 10⁶ exactly, Σalloc = budget
  * exactly), the direction of the update (higher excess ⇒ never a
  * smaller weight), the uniform fixed point, the smoothing floor, and
  * the guards. The bit-exact recurrence itself is driver-gated by
  * q_e22's generated HUGEINT oracle. */
class DoremiSpec extends SparkSpec {
  import spark.implicits._

  /** A corpus whose domains differ in REPETITIVENESS: domain "easy"
    * repeats one bigram (low perplexity), "hard" cycles fresh tokens
    * (high perplexity), "mid" mixes. */
  private def corpus = {
    val easy = (0 until 10).map(i =>
      (i.toLong, "easy", Seq.fill(12)("aa bb").mkString(" ")))
    val hard = (0 until 10).map(i =>
      (100L + i, "hard", (0 until 24).map(j => s"w${(i * 24 + j) % 97}")
        .mkString(" ")))
    val mid = (0 until 10).map(i =>
      (200L + i, "mid", ("aa bb " * 6 + (0 until 12)
        .map(j => s"m${(i * 12 + j) % 31}").mkString(" ")).trim))
    (easy ++ hard ++ mid).toDF("doc_id", "source", "text")
  }

  private def run(etaE6: Long = 3000000L, smoothingE6: Long = 200000L,
      rounds: Int = 4, budget: Long = 1000000L) =
    Doremi.weights(corpus, "source", "doc_id", "text", etaE6,
        smoothingE6, rounds, budget)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("weights sum to exactly 1e6 and the allocation to exactly budget") {
    val out = run(budget = 777777L)
    assert(out.map(_._6).sum === 1000000L)
    assert(out.map(_._7).sum === 777777L)
  }

  test("the hard domain is upweighted, the easy one down (direction)") {
    val byName = run().map(r => r._1 -> r).toMap
    assert(byName("hard")._4 > 0L, "hard domain shows no excess")
    assert(byName("easy")._4 === 0L, "easy domain shows excess")
    assert(byName("hard")._6 > byName("easy")._6)
    assert(byName("hard")._7 > byName("easy")._7)
    // monotone: excess order never inverts weight order
    val sorted = run().sortBy(_._4)
    sorted.sliding(2).foreach { case Seq(a, b) =>
      assert(a._6 <= b._6, s"excess ${a._4} < ${b._4} but weight " +
        s"${a._6} > ${b._6}")
    }
  }

  test("zero excess everywhere is the uniform fixed point") {
    // one domain only: its mean IS the baseline, excess 0, mult 1e6 —
    // weights stay the Hamilton uniform (here: all of it)
    val solo = corpus.filter(col("source") === "hard")
    val out = Doremi.weights(solo, "source", "doc_id", "text")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length === 1)
    assert(out.head._4 === 0L && out.head._5 === 1000000L &&
      out.head._6 === 1000000L)
  }

  test("smoothing keeps every domain near-alive; c=0 lets weights spread") {
    val smoothed = run(smoothingE6 = 500000L).map(_._6)
    val free = run(smoothingE6 = 0L).map(_._6)
    // heavier smoothing pulls toward uniform: smaller spread
    assert(smoothed.max - smoothed.min < free.max - free.min)
    // with c = 0.5 every domain keeps at least ~half its uniform share
    // (floor slack: the recurrence floors twice per round)
    val u = 1000000L / 3
    assert(smoothed.min >= u / 2 - 2)
  }

  test("more rounds concentrate harder (unsmoothed exponentiation)") {
    val w2 = run(smoothingE6 = 0L, rounds = 2).map(r => r._1 -> r._6).toMap
    val w8 = run(smoothingE6 = 0L, rounds = 8).map(r => r._1 -> r._6).toMap
    assert(w8("hard") > w2("hard"))
  }

  test("guards: eta domain, eta*excess capacity, empty frame") {
    intercept[IllegalArgumentException] { run(etaE6 = 0L) }
    intercept[IllegalArgumentException] {
      // eta 10 nats^-1 times a >2.7-nat excess would overflow the
      // BIGINT multiplier — the require names the fix
      val spread = (0 until 50).map(i =>
        (i.toLong, "flat", Seq.fill(30)("xx yy").mkString(" "))) ++
        (0 until 2).map(i => (900L + i, "wild",
          (0 until 400).map(j => s"u${i * 400 + j}").mkString(" ")))
      Doremi.weights(spread.toDF("doc_id", "source", "text"), "source",
        "doc_id", "text", etaE6 = 10000000L)
    }
    val empty = Doremi.weights(
      Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text"),
      "source", "doc_id", "text")
    assert(empty.count() === 0L)
  }
}
