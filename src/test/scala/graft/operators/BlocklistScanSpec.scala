package graft.operators

import graft.SparkSpec

/** Aho–Corasick multi-pattern blocklist scan (L128). Pins the textbook
  * automaton example, overlapping-occurrence counting, the suffix-output
  * flattening, a plain-Scala sliding-window reference on seeded text,
  * and the guards. */
class BlocklistScanSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)],
      patterns: Seq[String]): Map[Long, (Long, Long)] =
    BlocklistScan.scan(docs.toDF("doc_id", "text"), "doc_id", "text",
        patterns)
      .as[(Long, Long, Long)].collect()
      .map { case (id, h, p) => id -> (h, p) }.toMap

  /** The per-position substring-equality definition, replayed. */
  private def reference(text: String,
      patterns: Seq[String]): (Long, Long) = {
    val counts = patterns.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }
    (counts.sum, counts.count(_ > 0).toLong)
  }

  test("the textbook example: ushers hits {she, he, hers}") {
    val got = run(Seq(1L -> "ushers"),
      Seq("he", "she", "his", "hers"))
    assert(got(1L) === ((3L, 3L))) // she@1, he@2, hers@2 — his absent
  }

  test("overlapping occurrences all count") {
    // "aaaa": a×4, aa×3, aaa×2 = 9 hits, 3 patterns
    val got = run(Seq(1L -> "aaaa"), Seq("a", "aa", "aaa"))
    assert(got(1L) === ((9L, 3L)))
  }

  test("suffix outputs: a phrase hit also scores its suffix patterns") {
    val got = run(Seq(1L -> "x agg row y"), Seq("agg row", "row", "agg"))
    assert(got(1L) === ((3L, 3L)))
  }

  test("absent patterns score zero; zero-hit docs still report") {
    val got = run(Seq(1L -> "nothing here"), Seq("zzz", "qqq"))
    assert(got(1L) === ((0L, 0L)))
  }

  test("property: equals the sliding-window reference (seeded)") {
    val rnd = new scala.util.Random(91)
    val alphabet = "abc "
    val docs = (1L to 30L).map(i =>
      i -> Seq.fill(5 + rnd.nextInt(60))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val patterns = Seq("a", "ab", "ba", "abc", "ca", "c b", "aaa", "zz")
    val got = run(docs, patterns)
    for ((id, text) <- docs)
      assert(got(id) === reference(text, patterns), s"doc $id: '$text'")
  }

  test("null hygiene and guards") {
    val df = Seq((Option(1L), Option("the a")),
      (Option.empty[Long], Option("x")),
      (Option(2L), Option.empty[String])).toDF("doc_id", "text")
    assert(BlocklistScan.scan(df, "doc_id", "text", Seq("the"))
      .count() === 1L)
    intercept[IllegalArgumentException] {
      BlocklistScan.scan(df, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      BlocklistScan.scan(df, "doc_id", "text", Seq("a", ""))
    }
    intercept[IllegalArgumentException] {
      BlocklistScan.scan(df, "doc_id", "text", Seq("a", "a"))
    }
  }
}
