package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gopher/MassiveWeb rule battery: each rule exercised by a fixture
  * engineered to fail exactly that rule, plus composite/keeper checks. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  // A clean doc that passes every rule: 60 alphabetic words of sane
  // length including several required stopwords.
  private val good: String =
    (Seq("the", "be", "to", "of", "and", "that", "have", "with") ++
      Seq.fill(52)("words")).mkString(" ")

  private def reportOf(docs: (Int, String)*) =
    GopherRules.report(docs.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")

  test("good doc passes all rules") {
    val r = reportOf(0 -> good).collect().head
    assert(r.getAs[Long]("keep") === 1L)
    assert(r.getAs[Int]("n_words") === 60)
    assert(r.getAs[Int]("n_req_stopwords") === 8)
    assert(r.getAs[Double]("alpha_word_ratio") === 1.0)
  }

  test("word-count bounds: short docs and word floods fail") {
    val r = reportOf(
      0 -> "the be to of and that have with too few words here",
      1 -> good).collect()
    assert(r(0).getAs[Long]("keep") === 0L) // 12 words < 50
    assert(r(1).getAs[Long]("keep") === 1L)
    // custom bounds: the same 12-word doc passes with minWords=10
    val loose = GopherRules.report(
      Seq((0, "the be to of and that have with too few words here"))
        .toDF("doc_id", "text"), "doc_id", "text", minWords = 10)
      .collect().head
    assert(loose.getAs[Long]("keep") === 1L)
  }

  test("mean word length bounds: letter soup and long-token soup fail") {
    val shortSoup = good + " " + Seq.fill(300)("a b").mkString(" ")
    val longSoup = ("the be to of and that have with " +
      Seq.fill(60)("pneumonoultramicroscopicsilicovolcanoconiosis")
        .mkString(" "))
    val r = reportOf(0 -> shortSoup, 1 -> longSoup).collect()
    assert(r(0).getAs[Double]("mean_word_len") < 3.0)
    assert(r(0).getAs[Long]("keep") === 0L)
    assert(r(1).getAs[Double]("mean_word_len") > 10.0)
    assert(r(1).getAs[Long]("keep") === 0L)
  }

  test("symbol ratios: '#' spam and ellipsis spam fail independently") {
    val hashes = good + " " + Seq.fill(10)("####").mkString(" ")
    val dots = good + " " + Seq.fill(10)("so...").mkString(" ")
    val uniDots = good + " " + Seq.fill(10)("so…").mkString(" ")
    val r = reportOf(0 -> hashes, 1 -> dots, 2 -> uniDots).collect()
    // 40 hashes / 70 words and 10 ellipses / 70 words are both > 0.1
    assert(r(0).getAs[Double]("hash_ratio") > 0.1)
    assert(r.forall(_.getAs[Long]("keep") === 0L))
    assert(r(1).getAs[Double]("ellipsis_ratio") ===
      r(2).getAs[Double]("ellipsis_ratio")) // "..." and '…' count alike
  }

  test("line-shape rules: bullet-dominated and ellipsis-ended lines fail") {
    val bullets = (good +: Seq.fill(20)("• item")).mkString("\n")
    val trailing = (good +: Seq.fill(10)("cliffhanger ...")).mkString("\n")
    val r = reportOf(0 -> bullets, 1 -> trailing).collect()
    assert(r(0).getAs[Double]("bullet_line_ratio") > 0.9) // 20/21
    assert(r(0).getAs[Long]("keep") === 0L)
    assert(r(1).getAs[Double]("ellipsis_line_ratio") > 0.3) // 10/11
    assert(r(1).getAs[Long]("keep") === 0L)
    // '-' and '*' bullets count; space indentation is ignored (ltrim is
    // space-only on both engines — a tab-indented bullet does NOT count)
    val dash = reportOf(0 -> "  - one\n  * two\nthree\n\t- tabbed").collect().head
    assert(dash.getAs[Double]("bullet_line_ratio") === 0.5) // 2 of 4
  }

  test("alphabetic floor: number soup fails at < 80% alpha words") {
    val numbers = good + " " + (1 to 20).map(_.toString).mkString(" ")
    val r = reportOf(0 -> numbers).collect().head
    assert(r.getAs[Double]("alpha_word_ratio") === 0.75) // 60/80
    assert(r.getAs[Long]("keep") === 0L)
  }

  test("required stopwords: fewer than 2 of the list fails; case-folded") {
    val noStops = Seq.fill(60)("lorem ipsum dolor").mkString(" ")
    val twoStops = "THE " + Seq.fill(58)("lorem") .mkString(" ") + " With"
    val r = reportOf(0 -> noStops, 1 -> twoStops).collect()
    assert(r(0).getAs[Int]("n_req_stopwords") === 0)
    assert(r(0).getAs[Long]("keep") === 0L)
    assert(r(1).getAs[Int]("n_req_stopwords") === 2)
    assert(r(1).getAs[Long]("keep") === 1L)
  }

  test("empty and whitespace docs fail every word-based rule at 0 ratios") {
    val r = reportOf(0 -> "", 1 -> "   ").collect()
    r.foreach { row =>
      assert(row.getAs[Int]("n_words") === 0)
      assert(row.getAs[Double]("mean_word_len") === 0.0)
      assert(row.getAs[Double]("alpha_word_ratio") === 0.0)
      assert(row.getAs[Long]("keep") === 0L)
    }
  }

  test("prune keeps exactly the keep=1 docs") {
    val docs = Seq(0 -> good, 1 -> "too short", 2 -> (good + " extra"))
      .toDF("doc_id", "text")
    val kept = GopherRules.prune(docs, "text")
      .select("doc_id").as[Int].collect().sorted
    assert(kept === Array(0, 2))
  }

  test("report agrees with keep() column-for-column on a mixed corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val viaReport = GopherRules.report(docs, "doc_id", "text")
      .filter(col("keep") === 1).count()
    val viaPrune = GopherRules.prune(docs, "text").count()
    assert(viaReport === viaPrune)
  }
}
