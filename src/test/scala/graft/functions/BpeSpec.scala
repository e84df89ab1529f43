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

  test("Merges1k: loads, is well-formed, 1000 ranks, SQL-quote-safe sides") {
    val m = Bpe.Merges1k
    assert(m.length === 1000)
    assert(Bpe.wellFormed(m), "learned table must be well-formed")
    assert(m.forall { case (a, b) =>
      (a + b).forall(c => c >= 'a' && c <= 'z') },
      "sides must be [a-z]+ so oracle REPLACE literals never need escaping")
    // vocabulary-realistic: the classic English pairs rank near the top
    assert(m.take(20).contains("t" -> "h"))
    assert(m.take(20).contains("th" -> "e"))
    // and real words become single tokens under it
    val arr = m.toArray
    assert(Bpe.countWord("the", arr) === 1)
    assert(Bpe.countWord("and", arr) === 1)
    assert(Bpe.countWord("window", arr) <= 2)
  }

  test("property: scan-merge equals the REPLACE oracle under the LEARNED 1k table") {
    def viaReplace(word: String, merges: Seq[(String, String)]): Int = {
      val wrapped = word.map(c => s"($c)").mkString(" ")
      val after = merges.foldLeft(wrapped) { case (s, (a, b)) =>
        s.replace(s"($a) ($b)", s"($a$b)")
      }
      if (after.isEmpty) 0 else after.split(" ").length
    }
    val rnd = new scala.util.Random(79)
    val words = Seq("the", "and", "window", "streaming", "tokenizer",
      "boundary", "aggregation", "watermark", "xylophone", "zzzquux")
    for (trial <- 1 to 200) {
      val w = if (trial <= words.length) words(trial - 1)
        else (1 to (rnd.nextInt(12) + 1))
          .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      assert(Bpe.countWord(w, Bpe.Merges1k.toArray) ===
        viaReplace(w, Bpe.Merges1k), s"trial $trial word=$w")
    }
  }

  test("oracleCtes: staged chain stays under DuckDB's 128 nesting cap; generation is cheap at 50k merges") {
    // 1k table: 10 stages of <=100 REPLACEs
    val (ctes, last) = Bpe.oracleCtes("w2", "word", Bpe.Merges1k)
    assert(last === "m10")
    val stages = ctes.split("\\bm\\d+ AS\\b").length - 1
    assert(stages === 11, s"expected m0..m10, got $stages stages")
    // nesting inside one stage = batch size, far under the 128 cap
    val maxNest = ctes.split(",\n").map(s =>
      "REPLACE\\(".r.findAllIn(s).length).max
    assert(maxNest <= 100, s"stage nests $maxNest deep")

    // oracle GENERATION cost at vocabulary scale (VERDICT r5 #5): a
    // synthetic well-formed 50k-merge table (chained single chars, then
    // ever-longer outputs) generates its staged SQL in well under a
    // second and linear size — the oracle mechanism survives real vocab
    // sizes even though DuckDB would be slow to RUN it at that depth.
    // realistic side lengths (a learned vocab's sides stay short): all
    // 1+1 merges, then 2+1, then 3+1 — 676 + 17.5k + enough 4-char
    // outputs to pass 50k, every side <= 3 chars
    val big = {
      val singles = ('a' to 'z').map(_.toString)
      val l1 = for (a <- singles; b <- singles) yield (a, b)
      val l2 = for ((a, b) <- l1; c <- singles) yield (a + b, c)
      val l3 = for ((ab, c) <- l2.take(2000); d <- singles) yield (ab + c, d)
      (l1 ++ l2 ++ l3).take(50000)
    }
    assert(Bpe.wellFormed(big))
    val t0 = System.nanoTime()
    val (bigCtes, bigLast) = Bpe.oracleCtes("w2", "word", big)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(bigLast === "m500")
    assert(secs < 5.0, f"50k-merge oracle generation took $secs%.2f s")
    // closure-size reality check (SCALE.md): 50k merges serialize ~MB,
    // comfortably closure/broadcast territory
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(big.toArray); oos.close()
    assert(bos.size() < 8 * 1024 * 1024,
      s"50k merge table serialized to ${bos.size()} bytes")
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
