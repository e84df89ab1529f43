package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Multi-dimensional data layout — writing a table Z-ORDERED on two
  * key columns so parquet min/max stats prune files for predicates on
  * EITHER column (or both). A single-column sort prunes one dimension
  * and leaves every file full-width in the other; interleaving the key
  * bits makes each file a small rectangle in both. At 100 TB this is
  * the difference between "fast by customer OR by part, pick one at
  * write time" and both — without double-bucketing. [[audit]] is the
  * measurable form of the claim: per-file (min, max) footprints and
  * the count of files a box predicate cannot prune (the same evidence
  * a scan's PushedFilters + row-group stats act on).
  *
  * Plan shape: one `repartitionByRange` on the z-value (range, not
  * hash — files must OWN z-ranges for the rectangles to be small),
  * local sort, write; the z-value itself is five branch-free bitwise
  * ops per column ([[graft.functions.ZOrder]]), codegen'd. */
object Layout {

  /** Write `df` z-ordered on (c1, c2) into `path` as `files` files. */
  def zorderWrite(df: DataFrame, c1: String, c2: String, path: String,
      files: Int): Unit = {
    require(files >= 1, s"files $files must be positive")
    df.withColumn("__z", ZOrder.zValue(col(c1), col(c2)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file footprint of a written table: (file, min1, max1, min2,
    * max2) — what min/max stat pruning sees. */
  def footprints(spark: SparkSession, path: String, c1: String,
      c2: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c1)).as("min1"), max(col(c1)).as("max1"),
        min(col(c2)).as("min2"), max(col(c2)).as("max2"))

  /** How many of the table's files a box predicate `[lo1, hi1] ×
    * [lo2, hi2]` CANNOT prune by footprint intersection — the file
    * count a stats-pruning scan must open. */
  def filesTouched(spark: SparkSession, path: String, c1: String,
      c2: String, lo1: Long, hi1: Long, lo2: Long, hi2: Long): Long =
    footprints(spark, path, c1, c2)
      .filter(col("max1") >= lo1 && col("min1") <= hi1 &&
        col("max2") >= lo2 && col("min2") <= hi2)
      .count()
}
