package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction — the classic "who should be
  * connected next" graph feature (Liben-Nowell & Kleinberg 2003;
  * Adamic & Adar 2003): for every NON-adjacent vertex pair that shares
  * at least one neighbor, the shared-neighbor count and the
  * Adamic–Adar score Σ_z 1/ln(deg z) over the shared neighbors z —
  * hub neighbors count for less. In a data-curation stack this is the
  * candidate generator for entity-graph completion and the "related
  * sources" suggestion surface next to L67's triangle census.
  *
  * Determinism: each neighbor's 1/ln(deg z) contribution is quantized
  * ONCE to integer 1e-6 (floor half-up, the L43 float discipline), so
  * per-pair scores are exact BIGINT sums the oracle replays
  * token-for-token. A shared neighbor is adjacent to both endpoints, so
  * deg(z) ≥ 2 and ln(deg z) > 0 — the division is total by
  * construction, no guard needed.
  *
  * Scale shape: wedge enumeration — ONE self-join of the adjacency list
  * on the center vertex (cost Σ_z deg(z)², the L67 triangle-census
  * budget; hot hubs are bounded upstream by the bucketPairs
  * `maxBucketSize` valve exactly as in q_g3/q_g5), one anti-join
  * against the edge set to keep non-adjacent pairs only, one key join
  * against the |V|-row degree table, one (a, b) partial agg. The top-k
  * surfaces via TakeOrderedAndProject — no global sort. */
object LinkPredict {

  /** `(a, b, cn, aa_e6)` for non-adjacent pairs with ≥ 1 shared
    * neighbor. `edges` must be undirected-canonical (a < b, distinct,
    * non-null) — exactly what `NearDup.bucketPairs` emits. */
  def adamicAdar(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") < col("b"))
      .distinct()
    // both directions: one row per (center z, leaf u)
    val adj = e.select(col("a").as("z"), col("b").as("u"))
      .unionAll(e.select(col("b").as("z"), col("a").as("u")))
    val deg = adj.groupBy(col("z"))
      .agg(count(lit(1)).as("d"))
      // a degree-1 vertex can never be a SHARED neighbor, so dropping it
      // here is semantically free — and it keeps ln(d) > 0 total (ANSI
      // double division by ln(1)=0 throws in Spark 4)
      .filter(col("d") > 1)
      // quantize once: every downstream sum is exact BIGINT
      .select(col("z"),
        floor(lit(1000000.0) / log(col("d").cast("double")) + lit(0.5))
          .cast("long").as("w_e6"))
    val wedges = adj.as("p").join(adj.as("q"),
        col("p.z") === col("q.z") && col("p.u") < col("q.u"))
      .select(col("p.u").as("a"), col("q.u").as("b"), col("p.z").as("z"))
    wedges.join(e, Seq("a", "b"), "left_anti")
      .join(deg, Seq("z"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"), sum(col("w_e6")).as("aa_e6"))
  }
}
