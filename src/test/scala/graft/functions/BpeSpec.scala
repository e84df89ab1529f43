package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("countWord: hand-checked merges under the default table") {
    val m = Bpe.DefaultMerges.toArray
    // t h e -> th e -> the
    assert(Bpe.countWord("the", m) === 1)
    // a n d -> (i,n miss) an d -> and
    assert(Bpe.countWord("and", m) === 1)
    // t h e r n -> th e r n -> the r n ; (e,r) cannot cross the symbol
    // boundary inside "the"
    assert(Bpe.countWord("thern", m) === 3)
    // no merges apply
    assert(Bpe.countWord("zzz", m) === 3)
    assert(Bpe.countWord("x", m) === 1)
  }

  test("left-to-right non-overlapping per pair; rank order") {
    // (a,a)->aa on "aaa": positions 0-1 fuse, lone tail a survives
    val m = Array("a" -> "a")
    assert(Bpe.countWord("aaa", m) === 2)
    assert(Bpe.countWord("aaaa", m) === 2)
    // rank decides: with (a,b) before (b,c), "abc" -> ab c; reversed
    // table gives a bc
    assert(Bpe.countWord("abc", Array("a" -> "b", "b" -> "c")) === 2)
    assert(Bpe.countWord("abc", Array("b" -> "c", "a" -> "b")) === 2)
    // both are 2 symbols but different splits — pin via a longer chain:
    // (b,c) first blocks (a,b) in "abcb c? ..." use "abcbc"
    // rank (a,b) first: ab c b c -> ab (b,c)->bc: ab c? recompute:
    // merges (a,b) then (b,c): a b c b c -> ab c b c -> ab c bc = 3
    assert(Bpe.countWord("abcbc", Array("a" -> "b", "b" -> "c")) === 3)
    // merges (b,c) then (a,b): a bc bc (no a-b adjacency left) = 3
    assert(Bpe.countWord("abcbc", Array("b" -> "c", "a" -> "b")) === 3)
  }

  test("wellFormed: accepts the default table, rejects forward references") {
    assert(Bpe.wellFormed(Bpe.DefaultMerges))
    assert(!Bpe.wellFormed(Seq("th" -> "e"))) // 'th' never produced
    assert(!Bpe.wellFormed(Seq("a" -> "", "b" -> "c"))) // empty side
    assert(Bpe.wellFormed(Seq("t" -> "h", "th" -> "e")))
  }

  test("property: scan-merge equals the oracle's boundary-safe REPLACE chain (seeded)") {
    // replicate the DuckDB oracle mechanics in Scala: wrap each char as
    // "(c)", space-join, then one global left-to-right REPLACE per merge
    def viaReplace(word: String, merges: Seq[(String, String)]): Int = {
      val wrapped = word.map(c => s"($c)").mkString(" ")
      val after = merges.foldLeft(wrapped) { case (s, (a, b)) =>
        s.replace(s"($a) ($b)", s"($a$b)")
      }
      if (after.isEmpty) 0 else after.split(" ").length
    }
    val rnd = new scala.util.Random(71)
    val alphabet = "aabcdeint" // skewed so merges actually fire
    for (trial <- 1 to 300) {
      val w = (1 to (rnd.nextInt(12) + 1))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = Bpe.countWord(w, Bpe.DefaultMerges.toArray)
      val want = viaReplace(w, Bpe.DefaultMerges)
      assert(got === want, s"trial $trial word=$w")
    }
  }

  test("tokenCounts: per-doc sums, empty/null guards, long ids") {
    val df = Seq((1L, "the cat and the hat"), (2L, "   "), (3L, null))
      .toDF("doc_id", "text")
    val got = Bpe.tokenCounts(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val m = Bpe.DefaultMerges.toArray
    val expect1 = Seq("the", "cat", "and", "the", "hat")
      .map(Bpe.countWord(_, m).toLong).sum
    assert(got === Map(1L -> expect1, 2L -> 0L, 3L -> 0L))
  }
}
