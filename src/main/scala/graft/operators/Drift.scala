package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution drift between two corpus snapshots — the train/serving
  * skew monitor a recurring data pipeline runs next to [[CorpusDiff]]:
  * Population Stability Index per bucket,
  * `PSI_b = (p_b − q_b) · ln(p_b / q_b)` over reference and current
  * bucket shares (the standard model-monitoring drift score; the sum is
  * a symmetrized discrete KL). Shares are Laplace-smoothed with 0.5 per
  * bucket (`p_b = (n_b + 0.5) / (N + 0.5·B)`) so empty cells never
  * divide by zero or take `ln 0`, and every per-bucket contribution is
  * quantized ONCE to integer 1e-6 (floor half-up, the repo's L43 float
  * discipline) — totals are exact BIGINT sums, order-independent within
  * the engine; the oracle replays the identical expression tree
  * token-for-token. Cross-engine caveat (same as L43/L46's ln-in-floor
  * oracles, which have held across rounds): `ln` is libm-specified to
  * ~1 ulp, not correctly rounded, so a contribution landing within an
  * ulp of a .5 quantization boundary could read one off between
  * engines — accepted here exactly as in the established families.
  *
  * Scale shape: one partial-aggregated count per snapshot (output ≤ B
  * buckets each), a B-row full-outer join, a 1-row totals broadcast,
  * then narrow math — nothing scales with the corpus except the two
  * scans. Numeric drift uses CALLER-FROZEN uniform bin edges (frozen at
  * train time, exactly as production monitors do) so the binning is
  * data-independent — no quantile pass, no second scan. */
object Drift {

  private def smoothedPsi(j: DataFrame): DataFrame = {
    val tot = j.agg(sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"),
      count(lit(1)).as("__b"))
    // the one float surface: two smoothed shares and one ln, inside a
    // single half-up floor — replicated token-for-token by the oracle
    val p = (col("n_ref") + lit(0.5)) / (col("__tr") + lit(0.5) * col("__b"))
    val q = (col("n_cur") + lit(0.5)) / (col("__tc") + lit(0.5) * col("__b"))
    j.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        floor((p - q) * log(p / q) * lit(1000000.0) + lit(0.5))
          .cast("long").as("psi_e6"))
  }

  private def joinCounts(ref: DataFrame, cur: DataFrame,
      bucket: DataFrame => Column): DataFrame = {
    def cnt(df: DataFrame, n: String) =
      df.select(bucket(df).as("bucket")).filter(col("bucket").isNotNull)
        .groupBy(col("bucket")).agg(count(lit(1)).as(n))
    cnt(ref, "n_ref").join(cnt(cur, "n_cur"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
  }

  /** Categorical drift: one row per category with both counts and the
    * quantized PSI contribution; `sum(psi_e6)` is the headline score
    * (rule of thumb: total PSI < 0.1 stable, > 0.25 shifted). */
  def categorical(ref: DataFrame, cur: DataFrame, keyCol: String): DataFrame =
    smoothedPsi(joinCounts(ref, cur, df => df.col(keyCol)))

  /** Numeric drift over `nBins` uniform bins frozen at `[lo, hi)`:
    * bucket −1 catches underflow, `nBins` overflow, so the index is
    * total and the two snapshots always bin identically. */
  def numericUniform(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins $nBins must be positive")
    require(lo < hi, s"empty bin range [$lo, $hi)")
    val step = (hi - lo) / nBins
    def bucket(df: DataFrame): Column = {
      val v = df.col(valueCol).cast("double")
      when(v.isNull, lit(null))
        .when(v < lo, lit(-1))
        .when(v >= hi, lit(nBins))
        // least-clamp: for v just under hi the float division can round
        // to exactly nBins, which must stay a distinct overflow bucket
        .otherwise(least(floor((v - lit(lo)) / lit(step)),
          lit((nBins - 1).toLong)).cast("int"))
    }
    smoothedPsi(joinCounts(ref, cur, bucket))
  }
}
