package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Date-window filters replicating the reference's client-side extraction
  * window semantics. The reference compares ISO-date *strings*
  * lexicographically ('2024-01-01' <= s <= '2025-12-31'), never date types —
  * we keep that (SURVEY.md §7.3): ISO dates sort lexicographically, so the
  * semantics agree for well-formed values and diverge only on the malformed
  * edge cases the reference also mishandles.
  *
  * Reference: extract_qb_customers_py.py:61-67 (window filter, F1);
  * extract_qb_invoices.py:61-69 (coalescing key, F2);
  * save_to_raw_customers_py.py:19 (null-key filter, F3).
  *
  * Scale note: these are plain Catalyst predicates — they push down to the
  * parquet/JDBC scan and stay inside whole-stage codegen.
  */
object WindowFilters {

  /** X1: ISO day prefix (`s[:10]`) of a timestamp-ish column. */
  def isoDay(c: Column): Column = substring(c.cast("string"), 1, 10)

  private val IsoDate = "\\d{4}-\\d{2}-\\d{2}".r

  /** A redundant PUSHABLE range predicate implied by
    * `isoDay(ts).between(lo, hi)` — the exact predicate wraps the raw
    * column in substring(cast(...)), which no source can push, so at 100 TB
    * the scan would read everything. The derived bound references the RAW
    * column only (parquet row-group skipping + partition pruning apply) and
    * is provably implied by the exact predicate, so AND-ing it on preserves
    * semantics exactly:
    *  - string column: prefix ∈ [lo,hi] ⇒ c >= lo && c <= hi+"￿"
    *    (lexicographic, ISO days sort correctly — SURVEY §7.3);
    *  - date/timestamp column (UTC session): day(ts) ∈ [lo,hi] ⇒
    *    ts >= lo 00:00 && ts < hi+1d 00:00.
    * Only applied when lo/hi are well-formed ISO dates (else `lit(true)`).
    */
  private def pushableBound(df: DataFrame, ts: Column, lo: String,
      hi: String): Column = {
    if (!IsoDate.matches(lo) || !IsoDate.matches(hi)) return lit(true)
    import org.apache.spark.sql.types._
    df.select(ts).schema.head.dataType match {
      case StringType =>
        ts >= lit(lo) && ts <= lit(hi + "￿")
      case DateType =>
        ts >= to_date(lit(lo)) && ts <= to_date(lit(hi))
      case TimestampType | TimestampNTZType =>
        ts >= to_timestamp(lit(lo)) &&
          ts < to_timestamp(date_add(to_date(lit(hi)), 1))
      case _ => lit(true)
    }
  }

  /** F1: keep rows whose `ts` ISO day lies in [lo, hi]; null keys dropped.
    * The exact reference semantics (string compare of the day prefix) plus
    * an implied raw-column range that reaches the scan as a pushed filter.
    */
  def dateWindow(df: DataFrame, ts: Column, lo: String, hi: String): DataFrame =
    df.filter(pushableBound(df, ts, lo, hi) &&
      ts.isNotNull && isoDay(ts).between(lo, hi))

  /** F2: invoice semantics — the filter key is `primary` when present, else
    * the ISO day of `fallback`; rows with neither are dropped.
    *
    * Scale: the exact predicate wraps `coalesce`, which no source can push.
    * A passing row provably has `primary` present OR its fallback day in
    * range, so we AND-on that disjunction over the RAW columns: when both
    * arguments are real source columns (the reference's invoice shape —
    * TxnDate / MetaData.LastUpdatedTime), it reaches the scan as
    * `Or(IsNotNull(primary), fallback-range)` and parquet row-group
    * skipping applies (asserted in PlanAuditSpec). When `primary` is a
    * derived expression (as in q_f2's synthetic probe) the disjunction
    * stays a cheap post-scan predicate — semantics unchanged either way. */
  def coalescingDateWindow(df: DataFrame, primary: Column, fallback: Column,
      lo: String, hi: String): DataFrame = {
    val key = coalesce(primary, isoDay(fallback))
    val implied = primary.isNotNull || pushableBound(df, fallback, lo, hi)
    df.filter(implied && key.isNotNull && key.between(lo, hi))
  }

  /** F3: drop rows with a null sink key before writing. */
  def dropNullKeys(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNotNull)
}
