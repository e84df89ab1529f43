package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting — the
  * train/validation/test split step of a training-data pipeline.
  *
  * Why not `df.sample()`/`randomSplit()`: those are seeded per-partition
  * RNG draws — the assignment of a ROW depends on how the data happens to
  * be partitioned, so re-running after a repartition (or on a grown
  * corpus) reshuffles examples between train and test, leaking test data
  * into training. Hashing the example's KEY makes membership a pure
  * function of identity: stable across runs, partitionings, engines and
  * corpus growth (a new document never moves an old one).
  *
  * Scale shape: a codegen'd md5 projection + string compare — narrow, no
  * shuffle, no state. md5 (not xxhash64) is deliberate: every engine
  * agrees on md5's hex form, so the same split can be reproduced in the
  * warehouse, in Spark, and in a Python loader reading the manifest.
  * Thresholds compare the first 4 hex chars (16 bits): split fractions
  * resolve to 1/65536 granularity, plenty for split ratios.
  */
object Sampling {

  /** First 4 hex chars of md5 of the key's string form — a deterministic,
    * engine-portable 16-bit bucket, as a lowercase hex string. */
  def hexBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 4)

  /** Exclusive upper bound for `hexBucket < boundary` at the given keep
    * fraction. Fraction 1.0 returns "g" — lexicographically above every
    * 4-hex-char bucket (a 5-char "10000" would compare BELOW "ffff" and
    * drop rows; string comparison is per-char, not numeric). */
  private def hexBoundary(fraction: Double): String = {
    val b = math.round(math.floor(fraction * 65536.0))
    if (b >= 65536L) "g" else f"$b%04x"
  }

  /** Adds a `split` column assigning each row to exactly one named split.
    * `splits` are (name, fraction) in priority order; fractions must sum
    * to ≤ 1 and the LAST split absorbs any rounding remainder (so the
    * partition is total). Example:
    * `hashSplit(df, col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))`. */
  def hashSplit(df: DataFrame, key: Column,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 > 0), "split fractions must be positive")
    val sum = splits.map(_._2).sum
    require(sum <= 1.0 + 1e-9, s"split fractions sum to $sum > 1")
    // Null keys are DROPPED, matching sampleByHash/mixture (their filters
    // are null-rejecting). Without this, md5(null) = null made every
    // comparison null and the CASE fell through to the LAST split — every
    // null-key row landed deterministically in 'test', the worst place to
    // leak unkeyed rows.
    val keyed = df.filter(key.isNotNull)
    val bucket = hexBucket(key)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    // boundaries for all but the last split; the last takes the remainder
    val expr = splits.init.zip(cum.init).foldLeft(when(lit(false), "")) {
      case (acc, ((name, _), cumFrac)) =>
        acc.when(bucket < lit(hexBoundary(cumFrac)), name)
    }.otherwise(splits.last._1)
    keyed.withColumn("split", expr)
  }

  /** Keep a deterministic `rate` fraction of rows by key hash — the
    * corpus-subsampling primitive (same stability contract as
    * [[hashSplit]]): a row's fate depends only on its key. */
  def sampleByHash(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate $rate outside [0,1]")
    if (rate >= 1.0) df
    else df.filter(hexBucket(key) < lit(hexBoundary(rate)))
  }

  /** Dataset mixing: per-group sampling rates in ONE pass — the
    * source-reweighting step of a pretraining mixture (keep 100% of
    * high-quality sources, a hash-stable fraction of the rest). A row
    * survives iff its key bucket clears its group's rate; groups absent
    * from `rates` get `defaultRate`. Same narrow no-shuffle shape as
    * [[sampleByHash]] — the rate lookup is a literal CASE chain, so one
    * scan mixes any number of sources (vs N filtered unions re-scanning
    * the corpus N times). */
  def mixture(df: DataFrame, groupCol: String, key: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"rate $r outside [0,1]"))
    val boundary = rates.foldLeft(when(lit(false), "")) {
      case (acc, (g, r)) => acc.when(col(groupCol) === g, hexBoundary(r))
    }.otherwise(hexBoundary(defaultRate))
    df.filter(hexBucket(key) < boundary)
  }
}
