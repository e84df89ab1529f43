package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's per-run verification epilogue (README.md:209-226, 289-297;
  * executed in every run — "FINAL VERIFICATION AND METRICS" in
  * save_to_raw_customers_py.log): total count (A1), distinct keys (A2),
  * null keys / conditional counts (A3/F4), min/max ingest timestamps (A4),
  * dup arithmetic (A7) — all in ONE aggregate pass instead of the
  * reference's three separate SQL round-trips.
  *
  * Scale note: single scan, single partial+final aggregate; `COUNT(DISTINCT)`
  * expands to a two-stage aggregate that shares the scan. For monitoring at
  * 100 TB swap `countDistinct` for `approx_count_distinct` (declared
  * extension, SURVEY.md §2 X).
  */
object QualityReport {

  def apply(sink: DataFrame, key: String, ingestTs: String,
      approx: Boolean = false): DataFrame = {
    val k = col(key)
    val distinctCount =
      if (approx) approx_count_distinct(k).as("distinct_ids")
      else countDistinct(k).as("distinct_ids")
    sink.agg(
      count(lit(1)).as("total"),
      distinctCount,
      count(when(k.isNull, lit(1))).as("null_ids"),
      (count(lit(1)) - countDistinct(k)).as("duplicate_ids"),
      min(col(ingestTs)).as("first_ingested"),
      max(col(ingestTs)).as("last_ingested"))
  }

  /** Sparse equi-width histogram of an integer-valued column, optionally
    * per group — the distribution panel of a dataset card (document
    * lengths per source, tokens per document, session sizes per cohort).
    * One row per OCCUPIED bin: (groupCols…, bin, n, min_v, max_v) with
    * `bin` = ⌊(v − lo)·bins / (hi − lo)⌋ over the half-open [lo, hi),
    * −1 for underflow and `bins` for overflow — out-of-range mass is
    * reported, never silently clipped (a clipped histogram reads as "no
    * outliers" exactly when outliers exist). Empty bins are absent by
    * construction (sparse), which keeps output exact on any engine
    * without a grid join. Null values are dropped — they are absence of
    * a measurement, not a magnitude; count them separately if needed.
    *
    * Exactness: the bin index is pure integer arithmetic — the product
    * runs in DECIMAL(38,0) (the Hamilton-allocation overflow lesson:
    * (v−lo)·bins overflows a LONG for 2⁶³-scale values, e.g.
    * hash-valued columns) and the division is integral, so every engine
    * computes the identical index; no float width, no float edges.
    *
    * Scale shape: one narrow projection + one map-side-combinable
    * groupBy on (groupCols, bin) — cardinality ≤ |groups|·(bins+2),
    * independent of row count. The histogram of 100 TB is one shuffle
    * of a few thousand partial-agg rows. */
  def histogram(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Long, hi: Long, bins: Int): DataFrame = {
    require(bins >= 1, s"bins $bins must be >= 1")
    require(lo < hi, s"empty value range [$lo, $hi)")
    // hi − lo is the divisor; a wider-than-2⁶³ range wraps NEGATIVE in
    // long arithmetic (lo=Long.Min, hi=Long.Max) and would silently
    // corrupt every interior bin — reject it here (review-caught; the
    // in-range subtraction v − lo is then provably overflow-free too)
    require(hi - lo > 0,
      s"range [$lo, $hi) wider than 2^63 — split into two histograms")
    val v = col(valueCol).cast("long")
    val idx = call_function("div",
      (v - lit(lo)).cast("decimal(38,0)") * lit(bins), lit(hi - lo))
    val bin = when(v < lo, lit(-1)).when(v >= hi, lit(bins))
      .otherwise(idx.cast("int"))
    df.filter(v.isNotNull)
      .select(groupCols.map(col) :+ bin.as("bin") :+ v.as("__v"): _*)
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n"), min(col("__v")).as("min_v"),
        max(col("__v")).as("max_v"))
  }
}
