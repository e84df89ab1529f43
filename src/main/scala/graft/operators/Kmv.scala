package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) mergeable distinct-count sketch — Bar-Yossef
  * et al. 2002 ("Counting distinct elements in a data stream") with the
  * unbiased estimator of Beyer et al. 2007 (SIGMOD, "On synopses for
  * distinct-value estimation under multiset operations"): keep the k
  * smallest distinct hash values per group; the k-th smallest t of n
  * distinct uniform hashes sits near k/n of the hash space M, so
  * n̂ = (k−1)·M/t.
  *
  * Why it exists (VERDICT r11 #4): [[IncrementalAgg]]'s scaladoc fences
  * exact COUNT(DISTINCT) as non-mergeable across partial-table
  * generations, and A2x's HLL is a query-time estimate that cannot be
  * PERSISTED as a table and merged. KMV closes the fence: the sketch IS
  * a table column (a sorted ≤k-element BIGINT array), and union =
  * k-smallest of the concatenation — an EXACT, deterministic, order-free
  * operation the oracle replays bit-for-bit. merge(sketch(A), sketch(B))
  * ≡ sketch(A ∪ B) is an algebraic identity (the k smallest of a union
  * are among the k smallest of each side), spec-pinned next to
  * IncrementalAggSpec's merge ≡ recompute.
  *
  * Determinism/exactness: the hash is the house md5 idiom — the first
  * 14 hex chars of md5(key) as a 56-bit integer (M = 2^56; both engines
  * compute it identically, the q_p6/q_e10 form). 56 bits rather than 64
  * so the ESTIMATOR stays BIGINT-exact: with k ≤ 64 and t ≤ M,
  * n̂ = (k−1)·(M div t) + ((k−1)·(M mod t)) div t — the exact long
  * division identity with every intermediate ≤ 63·2^56 < 2^63. The
  * 56-bit collision assumption is the battery's usual no-collision
  * class (weaker than xxhash64's but documented: a collision merely
  * perturbs the estimate by ±1 distinct — a sketch already carries
  * ~1/√k relative error).
  *
  * Scale shape: one map-side-combinable DISTINCT on (group, hash)
  * (dups collapse in the partial hash aggregate before the exchange),
  * then a dense_rank ≤ k per group — Spark's InferWindowGroupLimit
  * inserts a PARTIAL WindowGroupLimit before the group exchange, so
  * each map task ships at most k rows per group and no hot group ever
  * serializes its full distinct set into one task (the L79 window
  * lesson, here sidestepped by the rank pushdown — plan-pinned).
  * Merge unions GRID×k-sized tables; nothing corpus-sized moves. */
object Kmv {

  /** Hash space: 2^56 (14 hex chars of md5). */
  val M: Long = 72057594037927936L

  /** Ceiling on k keeping the estimator BIGINT-exact ((k−1)·2^56 terms
    * must fit a long via the division identity). */
  val MaxK = 64

  /** 56-bit key hash, the house md5 idiom (shared verbatim with the
    * oracle: `CAST(concat('0x', substr(md5(CAST(key AS VARCHAR)), 1,
    * 14)) AS BIGINT)`). */
  def keyHash(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 14),
      16, 10).cast("long")

  /** Per-group sketch: (groupCols…, kmv) where kmv is the SORTED array
    * of the ≤k smallest distinct key hashes. Null keys are dropped
    * (a keyless row has no identity to count); groups with no non-null
    * keys emit no row. */
  def sketch(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(k >= 2 && k <= MaxK, s"k $k outside [2, $MaxK]")
    Reserved.guard(groupCols, Seq("kmv", "__h", "__dr"), "Kmv")
    val hashed = df
      .filter(col(keyCol).isNotNull)
      .select(groupCols.map(col) :+ keyHash(col(keyCol)).as("__h"): _*)
      .dropDuplicates(groupCols :+ "__h")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__h"))
    hashed
      .withColumn("__dr", dense_rank().over(w))
      .filter(col("__dr") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(slice(array_sort(collect_set(col("__h"))), 1, k).as("kmv"))
  }

  /** The estimator columns over a sketch table: n_kept (sketch size),
    * kth_min (null when the sketch is not full — the group's distinct
    * count is then EXACTLY n_kept), est_distinct.
    *
    * Division safety (self-review r12): the divisor `t` can never be 0 —
    * sketch values are DISTINCT nonnegative integers sorted ascending,
    * so the k-th smallest is ≥ k−1 ≥ 1 under the k ≥ 2 require; no
    * ANSI divide-by-zero path exists on either engine. */
  def estimate(sketchTable: DataFrame, k: Int): DataFrame = {
    require(k >= 2 && k <= MaxK, s"k $k outside [2, $MaxK]")
    val t = element_at(col("kmv"), k)
    val q = call_function("div", lit(M), t)
    val r = pmod(lit(M), t)
    sketchTable
      .withColumn("n_kept", size(col("kmv")).cast("long"))
      .withColumn("kth_min", when(col("n_kept") >= k, t))
      .withColumn("est_distinct",
        when(col("kth_min").isNull, col("n_kept"))
          .otherwise(lit((k - 1).toLong) * q +
            call_function("div", lit((k - 1).toLong) * r, t)))
  }

  /** Union of two sketch tables in [[sketch]]'s schema: per group the
    * k smallest of the concatenated value sets — exact SQL over
    * grid-sized inputs (collect_list gathers ≤2 arrays per group).
    * Groups on one side only pass through, so merging an empty delta
    * is the identity (the IncrementalAgg contract). */
  def merge(base: DataFrame, delta: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    require(k >= 2 && k <= MaxK, s"k $k outside [2, $MaxK]")
    base.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(slice(array_sort(array_distinct(
        flatten(collect_list(col("kmv"))))), 1, k).as("kmv"))
  }
}
