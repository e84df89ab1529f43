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

  /** Write `df` z-ordered on (c1, c2) into `path` as `files` files.
    * Keys must be nonnegative (checked below): [[ZOrder.spread]] masks a
    * negative key to a large 32-bit value (-1 → 0xFFFFFFFF), which would
    * z-order it ABOVE every positive key and silently destroy the
    * clustering locality this operator exists for (ADVICE r9). The check
    * is one map-side-combinable aggregate over the two key columns —
    * negligible next to the write it guards. */
  def zorderWrite(df: DataFrame, c1: String, c2: String, path: String,
      files: Int): Unit = {
    require(files >= 1, s"files $files must be positive")
    require(!df.columns.contains("__z"),
      "input already has reserved column __z") // ADVICE r9: match the
      // Interleave/Ranking/Privacy reserved-column discipline
    val mins = df.agg(min(col(c1).cast("long")),
      min(col(c2).cast("long"))).head()
    require(mins.isNullAt(0) || mins.getLong(0) >= 0L,
      s"zorderWrite: negative $c1 keys break Morton ordering")
    require(mins.isNullAt(1) || mins.getLong(1) >= 0L,
      s"zorderWrite: negative $c2 keys break Morton ordering")
    df.withColumn("__z", ZOrder.zValue(col(c1), col(c2)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` Hilbert-ordered on (c1, c2) into `path` as `files`
    * files — the tighter-locality sibling of [[zorderWrite]]
    * ([[graft.functions.Hilbert]]): consecutive curve indices are
    * always grid neighbors, so a file owning a contiguous index range
    * covers a tighter rectangle than the Morton curve's (measured in
    * HilbertSpec on the identical table and box predicate). Domain
    * check mirrors the zorderWrite negative-key guard (ADVICE r9):
    * keys must sit in [0, 2^bits) or the top-level quadrant walk is
    * meaningless. */
  def hilbertWrite(df: DataFrame, c1: String, c2: String, path: String,
      files: Int, bits: Int = graft.functions.Hilbert.MaxBits): Unit = {
    require(files >= 1, s"files $files must be positive")
    require(!df.columns.contains("__h"),
      "input already has reserved column __h")
    val r = df.agg(min(col(c1).cast("long")), max(col(c1).cast("long")),
      min(col(c2).cast("long")), max(col(c2).cast("long"))).head()
    val lim = 1L << bits
    for ((idx, name) <- Seq(0 -> c1, 2 -> c2)) {
      require(r.isNullAt(idx) ||
        (r.getLong(idx) >= 0L && r.getLong(idx + 1) < lim),
        s"hilbertWrite: $name keys outside [0, 2^$bits)")
    }
    graft.functions.Hilbert.withHilbert(df, c1, c2, "__h", bits)
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
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
