package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe train/validation/test splitting — the contamination
  * guarantee a plain row-hash split cannot give: if two documents are
  * near-duplicates of each other, a row-level split can put one in train
  * and the other in test, and the "held-out" example was effectively
  * trained on (the dedup/decontamination literature's split-leakage
  * problem). Here the split key is the document's NEAR-DUP CLUSTER, so
  * an entire duplicate family lands in one split atomically.
  *
  * Composition (all existing engine pieces, no new kernels):
  * near-dup pairs → [[Clusters.connectedComponents]] (cluster = component
  * min id) → [[Sampling.hashSplit]] keyed by the cluster id. With the
  * default [[SetSimJoin]] pair source the guarantee is a THEOREM — the
  * prefix filter has 100% recall, so *no* pair with Jaccard ≥ threshold
  * can straddle splits; with a caller-supplied LSH pair set
  * ([[assignFromPairs]]) the guarantee inherits the banding recall
  * (≥ 1−5e-8 per pair at the q_d2 parameters).
  *
  * Scale shape: the pair set is orders of magnitude smaller than the
  * corpus, CC runs on pairs only, and the final assignment is one
  * left join (docs × slim label table, key-partitioned on bigint ids)
  * plus a codegen'd md5 projection — the corpus is never shuffled by
  * anything wider than its id column. Split fate is a pure function of
  * cluster id (md5 hex compare), reproducible in any engine.
  *
  * Null ids follow the sampling family's convention: dropped (a null
  * key has no stable split fate — [[Sampling.hashSplit]]'s contract). */
object SafeSplit {

  /** Label-table broadcast cap for [[assignFromPairs]]: 4M (id, cluster)
    * rows ≈ 64 MB framed — comfortable executor/driver cost, far inside
    * Spark's 8 GB / 512M-row broadcast relation limit. Beyond it the
    * plan falls back to the key-partitioned join. */
  private[operators] val BroadcastMaxLabelRows = 4L * 1000 * 1000

  /** Assign every document a (cluster, split): cluster = component-min id
    * of its near-dup family (its own id when unpaired), split from
    * `splits` (name, fraction) in [[Sampling.hashSplit]]'s priority-order
    * contract, keyed by the CLUSTER id. Pairs come from the exact
    * [[SetSimJoin]], making the no-straddle guarantee deterministic. */
  def assign(docs: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)], shingleLen: Int = 3,
      threshold: Double = 0.8): DataFrame =
    assignFromPairs(docs, SetSimJoin.pairs(docs, idCol, textCol,
      shingleLen, threshold), idCol, splits)

  /** [[assign]] with a caller-supplied near-dup pair set (id_a, id_b) —
    * e.g. the LSH candidates-confirmed pairs when approximate recall is
    * acceptable, or a pair set already computed for dedup. Document ids
    * must be unique (the pair family's precondition; a duplicate id
    * would fan out through the label join). */
  def assignFromPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    val reserved = Seq("cluster", "split")
    reserved.foreach(c => require(!docs.columns.contains(c),
      s"input already has a '$c' column — rename it before splitting"))
    val labels = Clusters.connectedComponents(pairs)
      .select(col("id").as(idCol), col("cluster"))
    // Size-dispatched broadcast (r17 optimization, guide §3.1): the label
    // table is checkpoint-backed and bounded by the PAIRED doc count —
    // orders of magnitude under the corpus. Un-hinted, Spark cannot size
    // the LogicalRDD leaf and plans a SortMergeJoin that exchanges + sorts
    // the FULL corpus by id (measured sf0.1: both sides exchanged for a
    // 477-row label table). The count is one job over checkpointed rows;
    // above the cap (64 MB of (long, long) rows ≈ well inside the 8 GB /
    // 512M-row broadcast limit) the key-partitioned join stands.
    val nLabels = labels.count()
    val labelSide =
      if (nLabels <= BroadcastMaxLabelRows) broadcast(labels) else labels
    val clustered = docs
      .join(labelSide, Seq(idCol), "left")
      .withColumn("cluster",
        coalesce(col("cluster"), col(idCol).cast("long")))
    Sampling.hashSplit(clustered, col("cluster"), splits)
  }
}
