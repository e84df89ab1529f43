package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact key-based dedup and duplicate detection.
  *
  * Reference: save_to_raw_customers_py.py:20 (`drop_duplicates(subset=['id'])`,
  * J1 — pandas keeps first occurrence); README.md:181-185 (dup detection via
  * GROUP BY … HAVING COUNT(*) > 1, A5).
  *
  * Scale note: both shapes are a single hash-aggregate shuffle on the key with
  * map-side partial aggregation; `firstByKey` uses a window only when a
  * deterministic keeper with full row payload is required, and even then the
  * window shares the same hash partitioning as the dedup shuffle.
  */
object Dedup {

  /** J1: keep one arbitrary row per key — Spark's `dropDuplicates`. The
    * reference keeps the first in page order; Spark's keeper is
    * partition-order dependent, so oracle-checked paths use [[firstByKey]]. */
  def byKey(df: DataFrame, keys: String*): DataFrame =
    df.dropDuplicates(keys)

  /** J1-deterministic: keep the row with the smallest `tiebreak` per key. */
  def firstByKey(df: DataFrame, key: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tiebreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** A5: keys occurring more than `minCount` times (dup report). */
  def duplicateKeys(df: DataFrame, key: String, minCount: Long = 1): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .filter(col("c") > minCount)
}
