package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Item co-occurrence lift (r14, L167). Hand rationals for the three
  * association regimes, presence (not multiplicity) semantics, pair
  * canonicalization, and a seeded BigInt replay. */
class AffinitySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Affinity.lift(rows.toDF("b", "i"), "b", "i")
      .orderBy(col("item_a"), col("item_b")).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap

  test("hand rationals: perfect, independent, and repelled pairs") {
    // 4 baskets: a&b always together (2), c alone (2) — lift(a,b) =
    // 2·4/(2·2) = 2; lift(a,c)/lift(b,c) absent (never co-occur)
    val rows = Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b",
      3L -> "c", 4L -> "c")
    val got = run(rows)
    assert(got(("a", "b")) === ((2L, 2L, 2L, 500000L, 2000000L)))
    assert(!got.contains(("a", "c")) && !got.contains(("b", "c")),
      "never-co-occurring pairs are absent by design")
    // independence: a in 1,2; d in 1,3 of baskets 1..4 → n_ab=1,
    // lift = 1·4/(2·2) = 1 exactly
    val rows2 = rows ++ Seq(1L -> "d", 3L -> "d")
    assert(run(rows2)(("a", "d")) === ((2L, 2L, 1L, 250000L, 1000000L)))
  }

  test("presence semantics: duplicates collapse before counting") {
    val rows = Seq(1L -> "a", 1L -> "a", 1L -> "b", 1L -> "b",
      2L -> "a", 2L -> "b")
    assert(run(rows)(("a", "b"))._3 === 2L, "n_ab counts baskets")
  }

  test("pairs are unordered and canonical: (a,b) once, never (b,a)") {
    val got = run(Seq(1L -> "b", 1L -> "a"))
    assert(got.size === 1 && got.contains(("a", "b")))
  }

  test("explicit universe undoes the Berkson depression (the " +
      "motivating contrast)") {
    // two INDEPENDENT rare flags over 100 baskets: x on baskets
    // 0..19, y on multiples of 5 (4 joint). Flagged-only universe =
    // 20 + 16 = 36 baskets → lift = 4·36/(20·20) = 0.36 —
    // collider-depressed; the full 100 reads the true 4·100/400 = 1.0
    val pres = (0L until 20L).map(b => (b, "x")) ++
      (0L until 100L by 5L).map(b => (b, "y"))
    val universe = (0L until 100L).map(b => (b, "")).toDF("b", "junk")
    val conditioned = Affinity.lift(pres.toDF("b", "i"), "b", "i")
      .collect().head.getLong(6)
    val unconditional = Affinity.lift(pres.toDF("b", "i"), "b", "i",
        universe).collect().head.getLong(6)
    assert(conditioned === 360000L, "flagged-only universe: Berkson")
    assert(unconditional === 1000000L, "full universe: independence")
  }

  test("seeded BigInt replay") {
    val rnd = new scala.util.Random(73)
    val rows = (0 until 500).map(_ =>
      (rnd.nextInt(60).toLong, s"i${rnd.nextInt(6)}"))
    val got = run(rows)
    val pres = rows.distinct
    val baskets = pres.map(_._1).distinct
    val items = pres.map(_._2).distinct.sorted
    for (i <- items.indices; k <- i + 1 until items.size) {
      val (a, b) = (items(i), items(k))
      val na = BigInt(pres.count(_._2 == a))
      val nb = BigInt(pres.count(_._2 == b))
      val withA = pres.filter(_._2 == a).map(_._1).toSet
      val nab = BigInt(pres.count(p => p._2 == b && withA(p._1)))
      if (nab > 0) {
        val want = (BigInt(1000000) * nab * baskets.size /
          (na * nb)).toLong
        assert(got((a, b))._5 === want, s"($a,$b)")
        assert(got((a, b))._4 ===
          (BigInt(1000000) * nab / baskets.size).toLong)
      } else assert(!got.contains((a, b)))
    }
  }
}
