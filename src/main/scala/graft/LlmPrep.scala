package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{Clusters, NearDup, Packing, Sampling}

/** The composed LLM training-data prep pipeline — raw document table in,
  * packed/split corpus out. This is the extension battery's analog of
  * [[Pipeline]] (the reference's backfill composition): every stage is one
  * of the first-class operators, chained the way a production corpus run
  * chains them:
  *
  *   scrub PII → exact dedup → near-dup prune (MinHash-LSH) →
  *   quality + language enrichment → quality filter →
  *   per-source document cap (optional) →
  *   deterministic train/val/test split → sequence packing
  *
  * Stage order is load-bearing: dedup runs on SCRUBBED text (two docs
  * differing only in a redacted email are duplicates), the near-dup prune
  * runs after exact dedup (fingerprint collapse shrinks the LSH input),
  * the split happens before packing, and packs shard on (source, split)
  * so no pack spans a train/test boundary.
  *
  * Near-dup keeper rule: by default a document is dropped iff it is the
  * LARGER id of some confirmed pair — every near-dup cluster keeps its
  * chain minima; deterministic, so the whole pipeline is reproducible run
  * to run and engine to engine (the oracle recomputes it exhaustively).
  * With `consolidateClusters = true` the keeper is the CONNECTED-COMPONENT
  * minimum instead ([[graft.operators.Clusters]]): pairs (1,3) and (2,3)
  * keep only 1, where the per-pair rule keeps 1 AND 2 — strictly stronger
  * dedup, still deterministic (`LlmPrepSpec` pins the divergence case).
  *
  * Scale: inherits each operator's audited shape (SCALE.md) — the
  * shuffles are the dedup fingerprint groupBy, the LSH band groupBy +
  * Jaccard-confirm join, the losers anti-join, and ONE window shuffle
  * for packing; the quality filter and the hash split are shuffle-free
  * projections. Nothing here collects, broadcasts the corpus, or orders
  * globally. */
object LlmPrep {

  /** Returns the prepared corpus: input columns plus `lid`, `quality`,
    * `split`, `n_toks`, `pack_id` — one row per surviving document. */
  def run(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shardCol: String = "source",
      nearDupThreshold: Double = 0.8, minQuality: Double = 0.7,
      budget: Int = 512,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      consolidateClusters: Boolean = false,
      capPerSource: Option[Int] = None): DataFrame = {
    val scrubbed = docs.withColumn(textCol,
      TextAnalysis.scrubPii(col(textCol)))
    val exact = NearDup.exactByContent(scrubbed, textCol, idCol)
    val pairs = NearDup
      .minhashPairs(exact, idCol, textCol, threshold = nearDupThreshold)
    val pruned =
      if (consolidateClusters) Clusters.consolidate(exact, pairs, idCol)
      else exact.join(pairs.select(col("id_b").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
    val enriched = TextAnalysis.withLangId(
      pruned.withColumn("quality",
        TextAnalysis.qualityScore(col(textCol))), textCol)
    val kept = enriched.filter(col("quality") > minQuality)
    // domain cap runs on the deduped, quality-filtered corpus — the cap
    // should spend its budget on documents that made the cut
    val capped = capPerSource match {
      case Some(n) => Sampling.capPerGroup(kept, shardCol, col(idCol), n)
      case None => kept
    }
    val split = Sampling.hashSplit(capped, col(idCol), splits)
    Packing.packBySize(
      split.withColumn("n_toks", TextAnalysis.tokenCount(col(textCol))),
      Seq(shardCol, "split"), idCol, col("n_toks"), budget)
  }
}
