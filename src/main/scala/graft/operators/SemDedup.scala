package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication",
  * arXiv:2303.09540): group documents whose EMBEDDINGS are near-identical
  * — paraphrases, templated rewrites, boilerplate variants that no
  * lexical dedup (L1-L4) catches — and keep ONE representative per
  * group. This is the semantic peer of [[Clusters.consolidate]]'s
  * lexical pruning: candidate pairs come from embedding cosine instead
  * of MinHash, and the keeper rule can follow the paper's
  * "most distinctive member" heuristic instead of the id order.
  *
  * Stages (all existing scale-audited machinery):
  *  1. near-dup pairs via [[Similarity.nearDupPairs]] — the size
  *     dispatcher: exact broadcast baseline under the row cap, sign-LSH
  *     bucketed candidates above it (never all-pairs, no driver collect);
  *  2. clusters via [[Clusters.connectedComponents]] — O(log n) pointer
  *     jumping over the PAIR set (duplicate-sized, not corpus-sized);
  *  3. one keeper per cluster (see [[label]]); non-keepers are pruned.
  *
  * Keeper rules:
  *  - default (`distinctive=false`, oracle-exact): the component-minimum
  *    id — deterministic, integer-only, engine-portable;
  *  - `distinctive=true` (the paper's rule): the member LEAST similar to
  *    the cluster centroid — the cluster's most distinctive exemplar,
  *    which SemDeDup found preserves more downstream performance than a
  *    random/arbitrary keeper. Float discipline: centroid similarity is
  *    rounded once to `roundTo` decimals and ties break to the smaller
  *    id, so the choice is deterministic for any fixed fold order; it is
  *    NOT bit-portable across engines (per-dimension mean is an
  *    order-sensitive float sum), so this variant is spec-tested rather
  *    than oracle-paired.
  *
  * 100 TB shape: the corpus-sized work is stage 1's bucketed candidate
  * generation (shared with q_d4x); stages 2-3 touch only CLUSTERED
  * members — the centroid explode is members × dim rows keyed on
  * (cluster, dim) through one hash aggregation, and the keeper window
  * partitions by cluster (near-dup clusters are small by construction;
  * a pathological mega-cluster is already chunk-capped upstream by
  * `maxBucketSize` in the LSH path). Nothing corpus-sized is collected
  * or broadcast. */
object SemDedup {

  /** Per-document dedup labels: `(idCol, cluster, keep)` — `cluster` is
    * the component-minimum id of the doc's near-dup cluster (NULL for
    * docs with no near-dup), `keep` marks unclustered docs and each
    * cluster's keeper. Ids ride the battery's bigint contract. */
  def label(embeddings: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      distinctive: Boolean = false,
      maxBruteForceRows: Long = 100000, roundTo: Int = 6): DataFrame = {
    val pairs = Similarity.nearDupPairs(embeddings, threshold,
      idCol, vecCol, maxBruteForceRows, roundTo = roundTo)
    val comps = Clusters.connectedComponents(pairs) // (id, cluster)

    val keepers =
      if (!distinctive)
        comps.select(col("id"), col("cluster"),
          (col("id") === col("cluster")).as("keep0"))
      else {
        val members = embeddings
          .select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"))
          .join(comps, "id")
        // Per-dimension mean over each cluster's members: explode is
        // members × dim rows (clustered subset only), one hash agg on
        // (cluster, dim), then the centroid array reassembles in
        // dimension order (array_sort on struct orders by the leading
        // pos field — deterministic).
        val centroids = members
          .select(col("cluster"),
            posexplode(col("__v")).as(Seq("pos", "x")))
          .groupBy(col("cluster"), col("pos"))
          .agg(avg(col("x").cast("double")).as("m"))
          .groupBy(col("cluster"))
          .agg(transform(
            array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s("m")).as("__cent"))
        val w = Window.partitionBy(col("cluster"))
          .orderBy(col("__csim").asc, col("id").asc)
        members.join(centroids, "cluster")
          .select(col("cluster"), col("id"),
            round(Similarity.cosine(col("__v"), col("__cent")), roundTo)
              .as("__csim"))
          .withColumn("__rn", row_number().over(w))
          .select(col("id"), col("cluster"), (col("__rn") === 1).as("keep0"))
      }

    embeddings.select(col(idCol).cast("long").as("id"))
      .join(keepers, Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        coalesce(col("keep0"), lit(true)).as("keep"))
  }

  /** The pruned corpus: every near-dup cluster collapsed to its keeper;
    * pair-free docs survive untouched. */
  def prune(embeddings: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      distinctive: Boolean = false,
      maxBruteForceRows: Long = 100000, roundTo: Int = 6): DataFrame = {
    val kept = label(embeddings, threshold, idCol, vecCol, distinctive,
        maxBruteForceRows, roundTo)
      .filter(col("keep")).select(col(idCol))
    embeddings.join(kept, Seq(idCol), "left_semi")
  }
}
