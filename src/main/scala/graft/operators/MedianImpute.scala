package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A8/X11: the reference's exact median imputation
  * (transformers/fill_in_missing_values.py:13-18): per column, sort the
  * non-null values and take the element at index `floor(n/2)` — the *upper*
  * median for even n, no interpolation. `percentile_approx` and interpolated
  * medians diverge from this; the oracle-checked path must be exact
  * (SURVEY.md §7.3).
  *
  * Scale note: exact selection without a global sort — bracket the target
  * rank with `approxQuantile` (one pass, bounded error), count below the
  * bracket (one pass), then top-k only the tiny in-bracket slice. Falls back
  * to a global TakeOrdered if the bracket misses (never at these error
  * bounds, but correctness must not depend on a sketch).
  */
object MedianImpute {

  /** Exact value at 0-based rank `floor(n/2)` of the sorted non-null values. */
  def exactLowerMedian(df: DataFrame, column: String): Option[Double] = {
    val vals = df.select(col(column).cast("double").as("v"))
      .filter(col("v").isNotNull)
    vals.persist()
    try {
      val n = vals.count()
      if (n == 0) return None
      val k = n / 2 // 0-based target rank (upper median for even n)
      val frac = k.toDouble / n
      val eps = 0.001
      val bounds = vals.stat.approxQuantile("v",
        Array(math.max(0.0, frac - eps), math.min(1.0, frac + eps)), 1e-4)
      val (lo, hi) = (bounds(0), bounds(1))
      val below = vals.filter(col("v") < lo).count()
      val offset = k - below // rank of the target within the slice
      val sliceSize = vals.filter(col("v") >= lo && col("v") <= hi).count()
      if (offset >= 0 && offset < sliceSize) {
        val slice = vals.filter(col("v") >= lo && col("v") <= hi)
          .orderBy(col("v")).limit(offset.toInt + 1)
          .collect()
        Some(slice.last.getDouble(0))
      } else {
        // sketch missed — exact fallback via top-k (k+1 smallest values)
        Some(vals.orderBy(col("v")).limit(k.toInt + 1).collect().last.getDouble(0))
      }
    } finally vals.unpersist()
  }

  /** Fill nulls in each column with that column's exact lower median. */
  def impute(df: DataFrame, columns: Seq[String]): DataFrame = {
    val fills = columns.flatMap { c =>
      exactLowerMedian(df, c).map(m => c -> m)
    }.toMap
    df.na.fill(fills)
  }
}
