package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Token-distribution divergence per source — KL(source ‖ corpus) over
  * smoothed unigram distributions: the mixture-governance companion to
  * [[Drift]] (which compares two SNAPSHOTS on caller-chosen buckets;
  * this compares each SOURCE against the whole corpus on the token
  * distribution itself). Sources with high divergence dominate or
  * starve the mixture's token budget in ways document counts can't
  * see; the per-token contributions name WHICH tokens carry the skew
  * (the distribution-grounded cousin of c-TF-IDF's class terms).
  *
  * Definitions (the [[Drift]] smoothing discipline): with c_st the
  * count of token t in source s, T_s = Σ_t c_st, C_t the corpus count,
  * T = Σ C_t and V the corpus vocabulary size,
  *   p = (c_st + 0.5) / (T_s + 0.5·V)   (Laplace 0.5 — absent tokens
  *   q = (C_t + 0.5) / (T + 0.5·V)       contribute, no ln 0)
  *   term_e9(s, t) = ⌊p · ln(p/q) · 10⁹ + 0.5⌋,  kl_e9(s) = Σ_t term_e9
  * Each term is quantized ONCE to integer 1e-9 (finer than Drift's
  * 1e-6: per-token terms are V-fold smaller than per-bucket PSI terms,
  * and the BIGINT sum still tops out ≤ ~ln(V)·10⁹). Totals are exact
  * integer sums — order-independent, engine-portable; the oracle
  * replays the one float expression token-for-token (the L43 ln-ulp
  * caveat applies, as everywhere the repo takes an ln inside a floor).
  *
  * Scale shape: one token-count aggregation (map-side combinable; the
  * (source, token) relation is the only corpus-sized shuffle), then
  * everything is GRID-sized: vocab and per-source totals are
  * aggregations OF that relation (no second corpus scan — it is
  * persisted across the three consumers), the totals row broadcasts
  * (the Drift 1-row crossJoin shape), and the |S|·|V| source×vocab
  * grid is the DECLARED cost of smoothing over the full vocabulary —
  * absent tokens must contribute, so the grid is the semantics, not an
  * implementation accident. At 10M vocab × 100 sources that is 10⁹
  * narrow rows — one shuffle-join against the sparse counts, linear,
  * no corpus re-scan. */
object SourceDivergence {

  /** (source, token, c) — token counts per source; null sources and
    * empty documents drop. */
  def tokenCounts(df: DataFrame, srcCol: String, textCol: String): DataFrame =
    df.filter(col(srcCol).isNotNull)
      .select(col(srcCol).as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"))

  /** The full source×vocabulary contribution grid:
    * (source, token, ttot, kl_term_e9) — including absent tokens
    * (c_st = 0), whose smoothed mass is what makes KL finite. */
  def contributions(df: DataFrame, srcCol: String,
      textCol: String): DataFrame =
    NearDup.materialized { cache =>
      val st = cache(tokenCounts(df, srcCol, textCol))
      val ct = st.groupBy(col("token"))
        .agg(sum(col("c")).cast("long").as("ctot"))
      val ts = st.groupBy(col("source"))
        .agg(sum(col("c")).cast("long").as("ttot"))
      val tot = ct.agg(sum(col("ctot")).cast("long").as("t"),
        count(lit(1)).as("v"))
      val c0 = coalesce(col("c"), lit(0L))
      // the one float surface — replayed token-for-token by the oracle
      val p: Column = (c0 + lit(0.5)) / (col("ttot") + lit(0.5) * col("v"))
      val q: Column = (col("ctot") + lit(0.5)) / (col("t") + lit(0.5) * col("v"))
      ct.crossJoin(broadcast(ts))
        .join(st, Seq("source", "token"), "left")
        .crossJoin(broadcast(tot))
        .select(col("source"), col("token"), col("ttot"),
          floor(p * log(p / q) * lit(1000000000.0) + lit(0.5))
            .cast("long").as("kl_term_e9"))
    }

  /** Per-source rollup: (source, n_tokens, kl_e9). */
  def report(df: DataFrame, srcCol: String, textCol: String): DataFrame =
    contributions(df, srcCol, textCol)
      .groupBy(col("source"))
      .agg(min(col("ttot")).as("n_tokens"),
        sum(col("kl_term_e9")).cast("long").as("kl_e9"))

  /** The k largest-contribution tokens per source (signed — for a
    * source with fewer than k over-represented tokens the tail of the
    * list is the LEAST under-represented ones, which is itself the
    * honest answer to "what carries this source's divergence"; ties to
    * the lexicographically smaller token): (source, rank, token,
    * kl_term_e9). Plans as WindowGroupLimit — hot sources ship ~k rows
    * per map task, not their vocabulary. */
  def topTokens(df: DataFrame, srcCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("kl_term_e9").desc, col("token"))
    contributions(df, srcCol, textCol)
      .select(col("source"), col("token"), col("kl_term_e9"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("token"), col("kl_term_e9"))
  }
}
