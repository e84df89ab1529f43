package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/MassiveWeb-style document rule filter — the published heuristic
  * battery (Rae et al. 2021, "Scaling Language Models: ... Gopher",
  * App. A1.1) that most large-scale text pipelines run before any
  * model-based scoring: word-count bounds, mean word length bounds,
  * symbol-to-word caps for '#' and ellipsis, bullet/ellipsis line-shape
  * caps, an alphabetic-word floor, and a required-stopword floor.
  * Complements [[TextAnalysis.qualityScore]] (a weighted score to rank by)
  * with hard pass/fail gates to drop by — reference capability analog:
  * the validation/filtering surface (README.md:181-185).
  *
  * Scale shape: every rule is a composed built-in Catalyst expression over
  * one row — no UDFs, no shuffle, no state — so the whole battery runs
  * inside whole-stage codegen as a narrow projection; filtering 100 TB is
  * a single scan that AQE/pushdown treat like any other predicate.
  *
  * Oracle parity: ratios are double divisions of exact integer counts,
  * computed in the same order on both sides, so flag comparisons at the
  * published thresholds (0.1/0.9/0.3/0.8) are bit-identical; `replace`
  * counting is non-overlapping left-to-right on both engines.
  */
object GopherRules {

  /** Gopher's required-stopword list: a doc must contain >= 2 of these. */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Occurrences of literal `what` in `c` via non-overlapping replace. */
  private def countOcc(c: Column, what: String): Column =
    (length(c) - length(replace(c, lit(what), lit("")))) / lit(what.length)

  /** '#' occurrences per word (0.0 for wordless docs). */
  def hashWordRatio(c: Column): Column = {
    val n = TextAnalysis.tokenCount(c)
    when(n === 0, lit(0.0)).otherwise(countOcc(c, "#").cast("double") / n)
  }

  /** Ellipsis occurrences ("..." or Unicode '…') per word. */
  def ellipsisWordRatio(c: Column): Column = {
    val n = TextAnalysis.tokenCount(c)
    val ell = countOcc(c, "...").cast("long") + countOcc(c, "…").cast("long")
    when(n === 0, lit(0.0)).otherwise(ell.cast("double") / n)
  }

  private def docLines(c: Column): Column = split(c, "\n")

  /** Fraction of lines whose first non-space char is a bullet (•, *, -).
    * A text with no newlines is one line; empty text is one empty line
    * (split semantics on both engines), so no zero-line guard is needed —
    * kept anyway for composability with pre-split inputs. */
  def bulletLineRatio(c: Column): Column = {
    val ls = docLines(c)
    when(size(ls) === 0, lit(0.0)).otherwise(
      size(filter(ls, l => ltrim(l).rlike("^[•*-]"))).cast("double")
        / size(ls))
  }

  /** Fraction of lines ending (ignoring trailing spaces) in an ellipsis. */
  def ellipsisLineRatio(c: Column): Column = {
    val ls = docLines(c)
    when(size(ls) === 0, lit(0.0)).otherwise(
      size(filter(ls, l => rtrim(l).rlike("(\\.\\.\\.|…)$"))).cast("double")
        / size(ls))
  }

  /** Fraction of words containing at least one ASCII letter. */
  def alphaWordRatio(c: Column): Column = {
    val toks = TextAnalysis.tokens(c)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double")
        / size(toks))
  }

  /** How many of [[RequiredStopwords]] appear (case-folded) in the doc. */
  def requiredStopwordCount(c: Column): Column = {
    val lowToks = TextAnalysis.tokens(lower(c))
    RequiredStopwords
      .map(w => when(array_contains(lowToks, w), 1).otherwise(0))
      .reduce(_ + _)
  }

  /** The full Gopher keep predicate at the published thresholds. */
  def keep(c: Column, minWords: Int = 50, maxWords: Int = 100000): Column =
    TextAnalysis.tokenCount(c).between(minWords, maxWords) &&
      TextAnalysis.avgWordLen(c).between(3.0, 10.0) &&
      hashWordRatio(c) <= 0.1 &&
      ellipsisWordRatio(c) <= 0.1 &&
      bulletLineRatio(c) <= 0.9 &&
      ellipsisLineRatio(c) <= 0.3 &&
      alphaWordRatio(c) >= 0.8 &&
      requiredStopwordCount(c) >= 2

  /** Per-document rule report: every metric plus the composite keep flag
    * (1/0 — int for oracle-stable hashing). Ratios are rounded for
    * display only; `keep` compares the unrounded values. */
  def report(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val c = col(textCol)
    df.select(
      col(idCol),
      TextAnalysis.tokenCount(c).as("n_words"),
      round(TextAnalysis.avgWordLen(c), 4).as("mean_word_len"),
      round(hashWordRatio(c), 4).as("hash_ratio"),
      round(ellipsisWordRatio(c), 4).as("ellipsis_ratio"),
      round(bulletLineRatio(c), 4).as("bullet_line_ratio"),
      round(ellipsisLineRatio(c), 4).as("ellipsis_line_ratio"),
      round(alphaWordRatio(c), 4).as("alpha_word_ratio"),
      requiredStopwordCount(c).as("n_req_stopwords"),
      when(keep(c, minWords, maxWords), 1L).otherwise(0L).as("keep"))
  }

  /** Corpus with every rule-failing document dropped. */
  def prune(df: DataFrame, textCol: String, minWords: Int = 50,
      maxWords: Int = 100000): DataFrame =
    df.filter(keep(col(textCol), minWords, maxWords))
}
