package graft.operators

import graft.SparkSpec

/** Bradley–Terry MM fitting (L105): the 2-item closed form, transitive
  * ordering, one-sided-record positivity (the λ smoothing), the Σw
  * renormalization invariant, and partitioning-independence. */
class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  private def fitMap(rows: Seq[(String, String)], rounds: Int = 10) =
    BradleyTerry.fit(rows.toDF("winner", "loser"), "winner", "loser",
        rounds = rounds)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("two items: strength ratio converges to the smoothed win ratio") {
    // A beats B 3:1; λ=1 smoothing → W_A=4, W_B=2 — the 2-item BT MLE
    // has ŵ_A/ŵ_B = W_A/W_B = 2 exactly
    val w = fitMap(Seq.fill(3)(("A", "B")) ++ Seq(("B", "A")))
    assert(math.abs(w("A").toDouble / w("B") - 2.0) < 0.01,
      s"ratio ${w("A").toDouble / w("B")} should be ~2")
  }

  test("transitive chain orders strictly") {
    val w = fitMap(
      Seq.fill(5)(("A", "B")) ++ Seq.fill(5)(("B", "C")) ++
        Seq.fill(5)(("A", "C")))
    assert(w("A") > w("B") && w("B") > w("C"), s"not ordered: $w")
  }

  test("one-sided records stay positive and ordered (λ positivity)") {
    val w = fitMap(Seq.fill(5)(("A", "B")))
    assert(w("A") > w("B") && w("B") >= 1L, s"smoothing failed: $w")
  }

  test("renormalization: strengths sum to K·1e6 up to floor slack") {
    val w = fitMap(Seq(("A", "B"), ("B", "C"), ("C", "A"), ("A", "C")))
    val total = w.values.sum
    assert(math.abs(total - 3L * 1000000L) <= 3L,
      s"sum $total drifted from 3e6")
  }

  test("deterministic under repartitioning") {
    val rnd = new scala.util.Random(11)
    val items = Vector("a", "b", "c", "d", "e")
    val cmp = (1 to 400).map { _ =>
      val i = rnd.nextInt(5); var j = rnd.nextInt(5)
      if (j == i) j = (j + 1) % 5
      // stronger items win more often
      if (i < j) (items(i), items(j)) else (items(j), items(i))
    }
    val df = cmp.toDF("winner", "loser")
    val a = BradleyTerry.fit(df, "winner", "loser")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val b = BradleyTerry.fit(df.repartition(7), "winner", "loser")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
    // index order wins by construction
    val m = a.toMap
    assert(m("a") > m("c") && m("c") > m("e"), s"not win-ordered: $m")
  }

  test("empty comparisons yield an empty frame, not a crash") {
    val out = BradleyTerry.fit(
      Seq.empty[(String, String)].toDF("winner", "loser"),
      "winner", "loser")
    assert(out.count() === 0L)
  }

  test("self-comparisons and null sides are dropped") {
    val w = fitMap(Seq(("A", "A"), ("A", "B"), ("A", "B"), (null, "B"),
      ("B", null)))
    assert(w.keySet === Set("A", "B") && w("A") > w("B"))
  }

  test("overflow guard rejects past ~9.2e6, not 9.2e9 (ADVICE r11)") {
    // bigW(i)·10¹² must fit a long ⇒ the guard bites at 9.0e6 smoothed
    // wins. λ inflates smoothed counts without materializing 9e6 rows:
    // bigW(A) = 1 + λ·1 = 1e7 + 1 > 9e6 — the old ·1000 guard passed
    // this and the MM update silently overflowed.
    val df = Seq(("A", "B")).toDF("winner", "loser")
    val e = intercept[IllegalArgumentException] {
      BradleyTerry.fit(df, "winner", "loser", lambda = 10000000L)
    }
    assert(e.getMessage.contains("capacity"))
    // just under the line still fits: λ = 4e6 ⇒ bigW = 4000001,
    // pair n = 1 + 2λ = 8000001 — both inside 9e6, fit succeeds
    val ok = BradleyTerry.fit(df, "winner", "loser", lambda = 4000000L)
    assert(ok.count() === 2L)
  }
}
