package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the recurring-pipeline form of a
  * grouped report: instead of rescanning the whole corpus every run, the
  * sink keeps a PARTIAL-AGGREGATE table (count / sum / min / max per
  * group) and each new batch folds in by merging partials — the same
  * algebra Spark's own partial+final aggregation uses inside one query,
  * lifted across RUNS. A 100 TB history never gets rescanned: run cost
  * is O(batch) + O(groups).
  *
  * The merge algebra is the standard commutative monoid: n adds, sums
  * add, min/max combine; AVG must be DERIVED from (sum, n) — a stored
  * average is famously non-mergeable. Exact COUNT(DISTINCT) is likewise
  * non-mergeable from these partials by design — that needs either the
  * sketch path (A2x at query time; [[Kmv]] for a PERSISTABLE, mergeable
  * sketch table — the r12 closure of this fence) or a key-level table.
  *
  * Sums run in DECIMAL(38,2) (the q_x12 money convention): partial
  * tables make reassociation EXPLICIT — base+delta orders differ run to
  * run, so a float sum would drift between a merged and a recomputed
  * report; decimal addition is associative, making merge ≡ recompute an
  * exact identity (spec + q_s11 pin it cross-engine).
  *
  * Scale shape: `partials` is one map-side-combinable groupBy over the
  * batch; `merge` unions two GRID-SIZED tables and re-aggregates —
  * nothing corpus-sized moves. Min/max over an all-null group stay
  * null through the merge (Spark agg semantics on both legs). */
object IncrementalAgg {

  private val PartialCols = Seq("n", "sum_v", "min_v", "max_v")

  /** Partial-aggregate table of `df`: (groupCols…, n, sum_v, min_v,
    * max_v) over `valueCol` cast to DECIMAL(18,2) (sum widened to
    * DECIMAL(38,2)). Null values count toward `n` (row count) but not
    * the value aggregates — SQL aggregate semantics. */
  def partials(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    groupCols.foreach(c => require(!PartialCols.contains(c),
      s"group column '$c' collides with a partial-aggregate column"))
    val v = col(valueCol).cast("decimal(18,2)")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(v).cast("decimal(38,2)").as("sum_v"),
        min(v).as("min_v"), max(v).as("max_v"))
  }

  /** Fold `delta` partials into `base` partials (both in [[partials]]'
    * schema, same group columns): the monoid combine per group. Groups
    * present on one side only pass through unchanged — which is what
    * makes repeated merging of empty deltas the identity. */
  def merge(base: DataFrame, delta: DataFrame,
      groupCols: Seq[String]): DataFrame =
    base.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      // coalesce keeps `n` NON-NULLABLE like partials' count() — a
      // stable sink-table schema across merge generations is part of
      // the contract (sum() alone re-types it nullable)
      .agg(coalesce(sum(col("n")), lit(0L)).cast("long").as("n"),
        sum(col("sum_v")).cast("decimal(38,2)").as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))

  /** The consumer-facing report from a partial table: derived average
    * (2-dp half-up decimal — exact from the decimal pair) next to the
    * stored aggregates. */
  def report(partialTable: DataFrame, groupCols: Seq[String]): DataFrame =
    partialTable.select(groupCols.map(col) ++ Seq(col("n"), col("sum_v"),
      col("min_v"), col("max_v"),
      (col("sum_v") / col("n")).cast("decimal(38,2)").as("avg_v")): _*)
}
