package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.CmsAtLeast
import graft.functions.TextAnalysis

/** Sketch-screened EXACT heavy hitters — "which keys occur at least T
  * times corpus-wide" (hot tokens, hot domains, boilerplate candidates)
  * without shuffling the full occurrence stream. The L49 bloom pattern
  * applied to counts: a Count-Min sketch (Cormode & Muthukrishnan 2005,
  * the conservative point-query bound) is built in ONE distributed pass
  * (Spark's own `DataFrameStatFunctions.countMinSketch` treeAggregate —
  * the driver receives a constant-size sketch, never data), every
  * occurrence is then screened by the codegen'd [[CmsAtLeast]] predicate
  * BEFORE the exact groupBy, and survivors are exact-counted. Count-Min
  * never underestimates, so no true heavy hitter can fail the screen —
  * false positives only, and the exact count removes those. Output is
  * therefore IDENTICAL to `GROUP BY key HAVING count >= T` at ANY sketch
  * size (spec-pinned under an adversarially tiny sketch), which keeps
  * the operator oracle-exact.
  *
  * Scale shape: the screen turns the exact aggregation's input from
  * "every occurrence" into "occurrences of candidate keys" — under a
  * Zipfian corpus the tail (the overwhelming majority of DISTINCT keys,
  * which is what sizes the groupBy's hash tables and shuffle) is
  * dropped map-side at scan speed. Sketch width/depth are
  * `eps`/`confidence` knobs sized by SPARK'S convention (CountMinSketch
  * .create): w = ⌈2/eps⌉, d = ⌈log₂(1/(1−confidence))⌉ — the default
  * 1e-4 at 99% is a 20000 × 7 long grid, ~1.1 MB in the task closure
  * regardless of corpus size (advice-corrected: NOT the textbook
  * ⌈e/eps⌉ × ⌈ln(1/δ)⌉, and an order of magnitude bigger than a
  * back-of-envelope might budget — tighten `eps` to shrink it). The
  * sketch pass and the confirm pass each scan once; both stay in
  * whole-stage codegen.
  *
  * Keys are screened by their xxhash64 image: a 64-bit hash collision
  * can only merge two keys' counts — an OVERestimate, absorbed by the
  * same exact confirm that absorbs sketch noise, so exactness holds
  * regardless. */
object HeavyHitters {

  /** Exact keys-with-count >= minCount over an occurrence relation.
    * `occurrences` is one row per occurrence; `key` the column to count.
    * Output: (key, n), exactly `GROUP BY key HAVING count(*) >= minCount`.
    *
    * Two-pass contract: the sketch build and the screened confirm are
    * SEPARATE jobs over `occurrences`. The no-false-negative guarantee
    * therefore requires the relation to be deterministic and its
    * backing files stable between the two scans — a non-deterministic
    * source (rand(), a mutating directory, an uncheckpointed shuffle
    * replay under speculative retry) can make the sketch undercount
    * what the confirm pass then sees. Persisting `occurrences` would
    * close the window but means caching every occurrence (corpus-sized
    * at 100 TB); for batch parquet inputs — this operator's use case —
    * stability holds by construction, so the requirement is documented
    * rather than paid for. */
  def frequent(occurrences: DataFrame, key: Column, minCount: Long,
      eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(minCount > 0, s"minCount $minCount must be positive")
    val keyed = occurrences.select(key.as("k"))
      .filter(col("k").isNotNull)
      .select(col("k"), xxhash64(col("k")).as("__h"))
    val cms = keyed.stat.countMinSketch(col("__h"), eps, confidence, seed)
    import org.apache.spark.sql.GraftBridge
    val screened = keyed.filter(GraftBridge.column(
      CmsAtLeast(GraftBridge.expression(col("__h")), cms, minCount)))
    screened.groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Token-level form over a document table: tokens occurring at least
    * `minCount` times corpus-wide — the hot-token / boilerplate-candidate
    * report. (No id column: occurrence counting is corpus-global.) */
  def frequentTokens(docs: DataFrame, textCol: String,
      minCount: Long, eps: Double = 1e-4,
      confidence: Double = 0.99): DataFrame =
    // outer + null filter (the q_t6 lesson): plain explode lets the
    // inferred size()>0 filter tokenize every row a second time
    frequent(
      docs.select(explode_outer(TextAnalysis.tokens(col(textCol)))
          .as("tok"))
        .filter(col("tok").isNotNull),
      col("tok"), minCount, eps, confidence)
      .select(col("k").as("token"), col("n"))

  /** Phrase-level form: space-joined n-token windows (every OCCURRENCE —
    * unlike [[TextAnalysis.wordShingles]] this does not dedup within a
    * document, occurrence counts are the point) occurring at least
    * `minCount` times corpus-wide — the "find the boilerplate phrases"
    * report at occurrence granularity. */
  def frequentPhrases(docs: DataFrame, textCol: String,
      n: Int, minCount: Long, eps: Double = 1e-4,
      confidence: Double = 0.99): DataFrame = {
    require(n > 0, s"n $n must be positive")
    // Token-staging discipline (the q_t15 lesson): materialize the token
    // array in its OWN projection before the positional lambda —
    // otherwise every lambda element re-evaluates the regex split and
    // the shingling goes quadratic in document length.
    val staged = docs.select(TextAnalysis.tokens(col(textCol)).as("tk"))
    val tk = col("tk")
    val sh = when(size(tk) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(tk) - (n - 1)),
        i => array_join(slice(tk, i, lit(n)), " ")))
    // outer + null filter (the q_t6 lesson): plain explode would
    // re-shingle every row inside the inferred size()>0 filter
    frequent(staged.select(explode_outer(sh).as("ng"))
        .filter(col("ng").isNotNull),
      col("ng"), minCount, eps, confidence)
      .select(col("k").as("phrase"), col("n"))
  }
}
