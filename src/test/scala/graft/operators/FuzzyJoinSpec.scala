package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def run(rows: Seq[(Long, String)], maxDist: Int,
      cap: Int = 10000): Seq[(Long, Long, Int)] =
    FuzzyJoin.selfPairs(rows.toDF("id", "name"), "id", "name", maxDist, cap)
      .orderBy(col("id_a"), col("id_b"))
      .as[(Long, Long, Int)].collect().toSeq

  private def brute(rows: Seq[(Long, String)],
      maxDist: Int): Seq[(Long, Long, Int)] =
    (for {
      (a, sa) <- rows
      (b, sb) <- rows
      if a < b
      d = lev(sa, sb)
      if d <= maxDist
    } yield (a, b, d)).sortBy(p => (p._1, p._2))

  test("deletionVariants: counts, dedup on repeated characters") {
    assert(FuzzyJoin.deletionVariants("abc", 1) ===
      Set("abc", "bc", "ac", "ab"))
    assert(FuzzyJoin.deletionVariants("abc", 2) ===
      Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    assert(FuzzyJoin.deletionVariants("aa", 1) === Set("aa", "a"))
    assert(FuzzyJoin.deletionVariants("x", 1) === Set("x", ""))
    assert(FuzzyJoin.deletionVariants("", 2) === Set(""))
  }

  test("hand case: substitution, insertion, deletion at d=1; d=2 stays out") {
    val rows = Seq(
      1L -> "Supplier#01", 2L -> "Supplier#02", // substitution, d=1
      3L -> "Supplier#012",                     // insertion vs 1, d=1
      4L -> "Suplier#01",                       // deletion vs 1, d=1
      5L -> "Suppliar#02",                      // d=1 vs 2, d=2 vs 1
      6L -> "totally different")
    val got = run(rows, 1)
    assert(got === brute(rows, 1))
    assert(got.map(p => (p._1, p._2)).contains((1L, 2L)))
    assert(!got.map(p => (p._1, p._2)).contains((1L, 5L)))
    val got2 = run(rows, 2)
    assert(got2 === brute(rows, 2))
    assert(got2.map(p => (p._1, p._2)).contains((1L, 5L)))
  }

  test("property: equals brute force under random edits (seeded, d=1 and d=2)") {
    val rnd = new scala.util.Random(70)
    val alpha = "abcde"
    def randStr(n: Int) =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (trial <- 1 to 5) {
      val base = (1 to 20).map(i => i.toLong -> randStr(rnd.nextInt(8) + 4))
      val edited = base.filter(_ => rnd.nextBoolean()).map { case (id, s) =>
        val ops = rnd.nextInt(3)
        val pos = rnd.nextInt(s.length)
        val mutated = ops match {
          case 0 => s.updated(pos, alpha(rnd.nextInt(alpha.length)))
          case 1 => s.substring(0, pos) + alpha(rnd.nextInt(alpha.length)) +
            s.substring(pos)
          case 2 => s.substring(0, pos) + s.substring(pos + 1)
        }
        (id + 100) -> mutated
      }
      val rows = base ++ edited
      for (d <- Seq(1, 2)) {
        assert(run(rows, d) === brute(rows, d), s"trial $trial d=$d")
      }
    }
  }

  test("identical-string clique rides the bucket cap valve") {
    val rows = (1L to 5L).map(_ -> "same") :+ (9L -> "sane")
    assert(run(rows, 1).size === 15)          // C(5,2) + 5 cross pairs
    assert(run(rows, 1, cap = 2).isEmpty)     // valve drops the clique
  }

  test("cross-table pairs: brute-force equality; colliding numeric ids across sides safe") {
    val rnd = new scala.util.Random(76)
    val alpha = "abcd"
    def randStr(n: Int) =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    // deliberately OVERLAPPING id spaces — the cross form must keep the
    // two sides separate, never pool ids
    val left = (1L to 15L).map(i => i -> randStr(rnd.nextInt(5) + 4))
    val right = (1L to 15L).map { i =>
      val base = left(rnd.nextInt(left.size))._2
      val mutated =
        if (rnd.nextBoolean()) base.updated(rnd.nextInt(base.length),
          alpha(rnd.nextInt(alpha.length)))
        else randStr(rnd.nextInt(5) + 4)
      i -> mutated
    }
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.pairs(left.toDF("id", "s"), "id", "s",
          right.toDF("id", "s"), "id", "s", maxDist = d)
        .orderBy(col("left_id"), col("right_id"))
        .as[(Long, Long, Int)].collect().toSeq
      val want = (for {
        (a, sa) <- left; (b, sb) <- right
        dd = lev(sa, sb) if dd <= d
      } yield (a, b, dd)).sortBy(p => (p._1, p._2))
      assert(got === want, s"d=$d left=$left right=$right")
    }
  }

  test("cross-table pairs: the variant-df valve drops mass-duplicate names") {
    val left = (1L to 5L).map(_ -> "same").toDF("id", "s")
    val right = (1L to 5L).map(_ -> "sane").toDF("id", "s")
    assert(FuzzyJoin.pairs(left, "id", "s", right, "id", "s", 1).count() === 25)
    assert(FuzzyJoin.pairs(left, "id", "s", right, "id", "s", 1,
      maxVariantDf = 2).count() === 0)
  }

  test("null ids, null strings and over-maxLen strings are dropped") {
    val rows = Seq((Some(1L), "abc"), (Some(2L), "abd"),
      (None, "abc"), (Some(4L), null))
      .toDF("id", "name")
    val got = FuzzyJoin.selfPairs(rows, "id", "name", 1)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got === Seq((1L, 2L, 1)))
    // the length valve: a pathological long "key" cannot detonate the
    // variant generator — it simply doesn't participate
    val long = Seq((1L, "abc"), (2L, "abd"), (3L, "x" * 500))
      .toDF("id", "name")
    val got2 = FuzzyJoin.selfPairs(long, "id", "name", 1)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got2 === Seq((1L, 2L, 1)))
  }
}
