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
    * non-null) — exactly what `NearDup.bucketPairs` emits.
    *
    * Shuffle order matters here (measured 7.9 s → see SCALE.md): the
    * degree weight joins the |adj|-sized adjacency BEFORE wedge
    * expansion (never the wedge set), and the (a, b) aggregation runs
    * BEFORE the adjacency anti-join — the wedge set (Σ deg², 16M rows
    * at sf0.1 vs 220k adjacency rows) feeds straight from the
    * expansion join into a map-side-combining partial agg and is never
    * shuffled again; the anti-join then sees one row per candidate
    * PAIR, not per wedge. Dropping adjacent pairs after aggregation is
    * semantically identical to dropping their wedges before it. */
  def adamicAdar(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // the canonical edge set feeds FIVE plan branches (both adjacency
    // directions, the weight join, the probe side, the final
    // anti-join) — un-checkpointed, each branch re-runs the upstream
    // bucket expansion + distinct (measured: ~5 re-executions dominated
    // the 10 s sf0.1 cost); lazily checkpointed it computes once.
    // Released through the bounded LRU pool (the PageRank pattern).
    val e = edges.select(col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") < col("b"))
      .distinct()
      .localCheckpoint(false)
    liveEdges.synchronized {
      liveEdges.addLast(e)
      if (liveEdges.size > MaxLiveEdges)
        Checkpoints.release(liveEdges.removeFirst())
    }
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
    // weight rides the CENTER side of the expansion join: w_e6 lands on
    // every wedge for free instead of re-keying the wedge set by z.
    // The explicit z-repartition is load-bearing (the bucketPairs
    // lesson): the adjacency is a few MB, so AQE would coalesce the
    // self-join to ~1 partition — and then the Σdeg² wedge expansion
    // (16M rows at sf0.1 from 220k adjacency rows) runs in ONE task
    val shuffleN = edges.sparkSession.sessionState.conf.numShufflePartitions
    val adjw = adj.join(deg, Seq("z")).repartition(shuffleN, col("z"))
    adjw.as("p").join(adj.repartition(shuffleN, col("z")).as("q"),
        col("p.z") === col("q.z") && col("p.u") < col("q.u"))
      .select(col("p.u").as("a"), col("q.u").as("b"), col("p.w_e6"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"), sum(col("w_e6")).as("aa_e6"))
      .join(e, Seq("a", "b"), "left_anti")
  }

  /** Bound on concurrently-live checkpointed edge sets (the
    * PageRank/Clusters LRU discipline). */
  private val MaxLiveEdges = 8
  private val liveEdges = new java.util.ArrayDeque[DataFrame]()

  /** Release every live edge checkpoint. */
  def releaseEdges(): Unit = liveEdges.synchronized {
    while (!liveEdges.isEmpty)
      Checkpoints.release(liveEdges.removeFirst())
  }
}
