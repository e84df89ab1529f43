package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Data Selection via Importance Resampling — DSIR (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): select raw-corpus documents that look like a
  * target domain by scoring each under a pair of hashed n-gram
  * bag-of-words models. Per document the importance weight is
  * `log p_target(doc) - log p_raw(doc)` where both are unigram models
  * over HASHED n-gram features (unigrams + bigrams md5-bucketed into
  * `m` buckets, the paper's hashed generative model), Laplace-smoothed:
  * `p(b) = (count(b) + 1) / (N + m)`. Top-weight documents are the
  * target-like subset; the paper resamples with Gumbel noise, this
  * operator exposes the deterministic score and a deterministic top-k
  * (the oracle-checkable form — callers wanting the sampled variant add
  * Gumbel keys upstream of [[Sampling]]).
  *
  * Oracle parity (the L43 float discipline): the per-bucket log ratio
  * `ln(ct+1) - ln(Nt+m) - ln(cr+1) + ln(Nr+m)` is quantized ONCE to
  * integer 1e-4 nats (half-up floor); every per-document total is then
  * exact BIGINT arithmetic over those integers — order-independent and
  * engine-portable. The feature hash is the portable md5 convention:
  * `conv(substr(md5(feature), 1, 4), 16, 10) % m` (≡ DuckDB
  * `CAST('0x' || substr(md5(f), 1, 4) AS INT) % m`), so both engines
  * bucket identically; `m` must be ≤ 65536 (16 hash bits).
  *
  * Scale shape: featurization is a codegen'd narrow projection (tokens
  * + adjacent pairs, exploded); both model fits are ONE partial-
  * aggregated `groupBy(bucket)` each — at most `m` rows survive the
  * combine, so the shuffle is bounded by `m`, not the corpus; the
  * fitted weight table is `≤ m` rows and BROADCAST into the scoring
  * join (no shuffle of the corpus against the model); scoring reduces
  * per document with one partial-aggregated `groupBy(id)`. Nothing in
  * the plan grows with corpus size except the two narrow passes —
  * exactly the shape the paper runs over the Pile.
  *
  * Complements the quality family: L12/L14 score surface shape, L43
  * scores fluency under ONE reference model, this scores CONTRAST
  * between a target domain and the raw pool — the knob that tilts a
  * 100 TB crawl toward a curated distribution. */
object Dsir {

  /** (id, bucket) — one row per hashed n-gram feature OCCURRENCE:
    * word unigrams and adjacent-pair bigrams (space-joined), md5-hashed
    * into `m` buckets via the portable 16-bit convention. */
  def features(df: DataFrame, idCol: String, textCol: String,
      m: Int): DataFrame = {
    require(m > 0 && m <= 65536, s"m $m must be in 1..65536 (16 hash bits)")
    // Token-hash staging discipline (L43's lesson): materialize the
    // token array in its own projection before positional lambdas.
    val toks = df.select(col(idCol).as("__id"),
      TextAnalysis.tokens(col(textCol)).as("tk"))
    // outer + null filter (the q_t6 lesson): plain explode would
    // rebuild the unigram+bigram array inside the inferred size()>0
    // filter
    val feats = toks.select(col("__id"),
        explode_outer(concat(
          col("tk"),
          when(size(col("tk")) < 2, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), size(col("tk")) - 1),
              i => concat_ws(" ", element_at(col("tk"), i),
                element_at(col("tk"), i + 1)))))).as("f"))
      .filter(col("f").isNotNull)
    feats.select(col("__id").as(idCol),
      (conv(substring(md5(col("f")), 1, 4), 16, 10).cast("int") % m)
        .as("bucket"))
  }

  /** Fits both hashed models and returns the quantized per-bucket log
    * importance weights: (bucket, w_e4) for every bucket observed in
    * `raw` or `target` (unobserved buckets score the smoothing-only
    * weight, added at scoring time via coalesce with the same formula's
    * zero-count value — callers never see the gap). Also returns the
    * two feature totals needed for that default, as a 1-row DataFrame
    * (nt, nr) — see [[score]]. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, m: Int): (DataFrame, DataFrame) =
    fitFromFeatures(features(raw, idCol, textCol, m),
      features(target, idCol, textCol, m), m)

  private def fitFromFeatures(fRaw: DataFrame, fTarget: DataFrame,
      m: Int): (DataFrame, DataFrame) = {
    val ct = fTarget.groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val cr = fRaw.groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val totals = ct.agg(sum(col("ct")).as("nt")).crossJoin(
      cr.agg(sum(col("cr")).as("nr")))
    // Quantize HERE, once per bucket; everything downstream is BIGINT.
    // The expression tree ((ln(ct+1) - ln(nt+m)) - ln(cr+1)) + ln(nr+m)
    // is replicated token-for-token by the oracle so the one float
    // surface (four libm lns inside a half-up floor) is identical.
    val weights = ct.join(cr, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor((log(coalesce(col("ct"), lit(0L)) + lit(1.0)) -
          log(col("nt") + lit(m.toDouble)) -
          log(coalesce(col("cr"), lit(0L)) + lit(1.0)) +
          log(col("nr") + lit(m.toDouble))) * lit(10000.0) + lit(0.5))
          .as("w_e4"))
    (weights, totals)
  }

  /** Scores every `docs` row under a fitted weight table:
    * (id, n_feats, score_e4), `score_e4` the exact BIGINT sum of the
    * document's per-occurrence quantized weights. Documents whose
    * features hit buckets unseen by BOTH models get that bucket's
    * smoothing-only weight `floor((ln(nr+m) - ln(nt+m)) * 1e4 + 0.5)`
    * — the formula's own zero-count value, not an arbitrary default.
    * Featureless documents score 0 over 0 features. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, totals: DataFrame, m: Int): DataFrame =
    scoreFromFeatures(features(docs, idCol, textCol, m),
      docs.select(col(idCol)), idCol, weights, totals, m)

  private def scoreFromFeatures(f: DataFrame, ids: DataFrame, idCol: String,
      weights: DataFrame, totals: DataFrame, m: Int): DataFrame = {
    val scored = f.join(broadcast(weights), Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol), coalesce(col("w_e4"),
        floor((log(col("nr") + lit(m.toDouble)) -
          log(col("nt") + lit(m.toDouble))) * lit(10000.0) + lit(0.5)))
        .as("w_e4"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("w_e4")).cast("long").as("score_e4"))
    ids.join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score_e4"), lit(0L)).as("score_e4"))
  }

  /** The full fit-and-score pipeline with the raw feature relation
    * PERSISTED through the cache hook: uncached, the raw explode (the
    * corpus-sized projection) executes once per plan branch that
    * references it — the cr fit, the totals broadcast and the scoring
    * join each re-derive it (measured 8.3 s → the cached plan's cost
    * at sf0.1). The cached relation is narrow (id, bucket) and spills;
    * the target explode is cached too (three totals broadcasts re-run
    * its agg chain otherwise). */
  private def cachedScores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, m: Int, cache: DataFrame => DataFrame): DataFrame = {
    val fRaw = cache(features(raw, idCol, textCol, m))
    val fTarget = cache(features(target, idCol, textCol, m))
    val (weights, totals) = fitFromFeatures(fRaw, fTarget, m)
    scoreFromFeatures(fRaw, raw.select(col(idCol)), idCol,
      weights, totals, m)
  }

  /** The composed selector: fit target-vs-raw hashed models, score all
    * of `raw`, return the `k` most target-like documents —
    * (id, n_feats, score_e4), ties broken by ascending id (total,
    * deterministic order). The top-k is a TakeOrdered plan (per-
    * partition heaps + driver merge of k rows), never a global sort;
    * shared subplans ride the bounded materialized-result cache
    * (the L3 ensemble's discipline — result is k rows, intermediates
    * release on return). */
  def selectTopK(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, m: Int, k: Int): DataFrame =
    NearDup.materialized { cache =>
      cachedScores(raw, target, idCol, textCol, m, cache)
        .orderBy(col("score_e4").desc, col(idCol))
        .limit(k)
    }

  /** DSIR's actual resampling step: seeded Gumbel top-k (weighted
    * sampling without replacement, [[Sampling.gumbelTopK]]) over the
    * importance scores — k documents drawn ∝ exp(score), deterministic
    * in `seed`. Returns the sampled rows with their `gumbel_key_e4`. */
  def sampleK(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, m: Int, k: Int, seed: String): DataFrame =
    NearDup.materialized { cache =>
      Sampling.gumbelTopK(
        cachedScores(raw, target, idCol, textCol, m, cache),
        idCol, "score_e4", k, seed)
    }
}
