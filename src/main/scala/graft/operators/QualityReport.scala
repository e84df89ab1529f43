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
}
