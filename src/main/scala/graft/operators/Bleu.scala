package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus BLEU (Papineni et al. 2002) — the n-gram overlap metric of
  * the eval half of a data pipeline: score candidate generations
  * against references (distillation QA, translation-pair filtering,
  * round-trip-consistency screens). BLEU-2 form: clipped modified
  * 1/2-gram precision pooled over the corpus, geometric mean, brevity
  * penalty `exp(min(0, 1 − r/c))`.
  *
  * Exactness: every count — clipped matches, candidate/reference gram
  * totals and lengths — is an exact BIGINT the gate compares directly;
  * the one float surface (two lns, one exp) lives inside a single
  * half-up floor to `bleu_e6` that the oracle replays token-for-token
  * (the Drift/L43 discipline). Zero matches at any order ⇒ BLEU 0 (the
  * standard corpus convention), no ln(0).
  *
  * Scale shape: ONE corpus pass — both sides' 1- and 2-grams emerge
  * from a single side/order-tagged explode (no per-side re-scan, no
  * joins at all), then one (id, n, gram) partial agg does the per-pair
  * clipping and one (group) agg pools the corpus sums; the per-row
  * gram builders are array expressions over each DOC row (the q_t27
  * tier — never per exploded element). */
object Bleu {

  /** 2-grams of a token array as space-joined strings (tokens are
    * whitespace-split, so the separator cannot collide). */
  private def bigrams(tk: Column): Column = {
    val len = greatest(size(tk) - 1, lit(0))
    zip_with(slice(tk, lit(1), len), slice(tk, lit(2), len),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Per-pair clipped gram counts `(grp, id, n, g, c, r)` for n = 1, 2
    * on both sides from ONE tagged explode — shared by [[corpusBleu]]
    * and [[Rouge.rougeN]] so the two metrics cannot drift on gram
    * extraction. */
  private[operators] def perPairGramCounts(pairs: DataFrame,
      groupCol: String, idCol: String,
      candToks: Column, refToks: Column): DataFrame = {
    def tagged(side: String, n: Int, grams: Column): Column =
      transform(grams, g =>
        struct(lit(side).as("side"), lit(n).as("n"), g.as("g")))
    pairs
      .filter(col(groupCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol).as("grp"), col(idCol).as("id"),
        explode(concat(
          tagged("c", 1, candToks), tagged("c", 2, bigrams(candToks)),
          tagged("r", 1, refToks), tagged("r", 2, bigrams(refToks))))
          .as("t"))
      .groupBy(col("grp"), col("id"), col("t.n").as("n"),
        col("t.g").as("g"))
      .agg(count(when(col("t.side") === "c", 1)).as("c"),
        count(when(col("t.side") === "r", 1)).as("r"))
  }

  /** Corpus BLEU-2 per group over (candidate, reference) token-array
    * pairs. Output: (groupCol, c_len, r_len, match1, total1, match2,
    * total2, bleu_e6), all counts exact. */
  def corpusBleu(pairs: DataFrame, groupCol: String, idCol: String,
      candToks: Column, refToks: Column): DataFrame = {
    val perPair = perPairGramCounts(pairs, groupCol, idCol,
      candToks, refToks)
    val pooled = perPair.groupBy(col("grp")).agg(
      sum(when(col("n") === 1, col("c"))).as("c_len"),
      sum(when(col("n") === 1, col("r"))).as("r_len"),
      sum(when(col("n") === 1, least(col("c"), col("r")))).as("match1"),
      sum(when(col("n") === 1, col("c"))).as("total1"),
      sum(when(col("n") === 2, least(col("c"), col("r")))).as("match2"),
      sum(when(col("n") === 2, col("c"))).as("total2"))
    val d = (c: Column) => c.cast("double")
    pooled.select(col("grp"),
      coalesce(col("c_len"), lit(0L)).as("c_len"),
      coalesce(col("r_len"), lit(0L)).as("r_len"),
      coalesce(col("match1"), lit(0L)).as("match1"),
      coalesce(col("total1"), lit(0L)).as("total1"),
      coalesce(col("match2"), lit(0L)).as("match2"),
      coalesce(col("total2"), lit(0L)).as("total2"))
      .withColumn("bleu_e6",
        when(col("total1") === 0 || col("total2") === 0 ||
          col("match1") === 0 || col("match2") === 0, lit(0L))
          .otherwise(floor(
            exp(least(lit(0.0), lit(1.0) - d(col("r_len")) / d(col("c_len")))
              + lit(0.5) * (log(d(col("match1")) / d(col("total1")))
                + log(d(col("match2")) / d(col("total2")))))
              * lit(1000000.0) + lit(0.5)).cast("long")))
  }
}
