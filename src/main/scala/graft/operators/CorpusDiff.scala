package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-over-snapshot corpus diff — the data-versioning report a
  * recurring pipeline ships with every release ("what changed since the
  * last crawl"): per document id, whether it was ADDED, REMOVED,
  * CHANGED (present in both, content differs) or UNCHANGED between two
  * corpus snapshots, plus the one-line volumetry rollup release notes
  * quote.
  *
  * Scale shape: both snapshots are projected to `(id, md5(content))`
  * BEFORE the join, so the full-outer join on id ships 16-byte
  * fingerprints, never documents — at 100 TB the diff moves ~(rows ×
  * 48 bytes) through the shuffle regardless of document size, and the
  * narrow fingerprint projection is the only full-content scan on each
  * side. Status derivation is a codegen'd null/equality case over the
  * joined pair. A plain-text-equality variant would re-ship every
  * document; md5 collisions (2⁻¹²⁸) are the accepted trade, same as
  * L1's fingerprint dedup. */
object CorpusDiff {

  /** Per-id diff between `oldSnap` and `newSnap`: (id, status) with
    * status ∈ added | removed | changed | unchanged. NULL content is a
    * legal value, not absence: the fingerprint coalesces to an empty
    * binary sentinel (a real md5 is always 16 bytes, so no collision),
    * so presence is carried by the join itself — a null-text doc in one
    * snapshot only is removed/added, in both with equal nullness
    * unchanged (review-caught: a raw `md5` would read its null as the
    * row being ABSENT).
    *
    * Precondition: `idCol` is unique WITHIN each snapshot ("per
    * document id" is the contract). Duplicate ids fan out through the
    * full-outer join (k_old × k_new rows per id) and would silently
    * inflate [[report]]'s counts and witness; snapshots produced by
    * this library's own dedup (L1) satisfy the contract, foreign inputs
    * should be deduped on id first. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    def fp(df: DataFrame, side: String): DataFrame =
      df.filter(col(idCol).isNotNull)
        .select(col(idCol),
          coalesce(unhex(md5(col(contentCol).cast("binary"))),
            lit(Array.emptyByteArray)).as(side))
    val joined = fp(oldSnap, "__old_fp")
      .join(fp(newSnap, "__new_fp"), Seq(idCol), "full_outer")
    joined.select(col(idCol),
      when(col("__old_fp").isNull, lit("added"))
        .when(col("__new_fp").isNull, lit("removed"))
        .when(col("__old_fp") === col("__new_fp"), lit("unchanged"))
        .otherwise(lit("changed")).as("status"))
  }

  /** The rollup: one row per status with document count and an id-sum
    * membership witness (pins WHICH ids, not just how many). The sum
    * runs in DECIMAL(38,0) — 64-bit ids over billions of rows overflow
    * a LONG sum (the temperatureMixture review lesson applied here) —
    * but the COLUMN goes out as its canonical decimal STRING: wide
    * scale-0 decimals render differently across engines' binary
    * representations (r7's only driver-red was exactly this column
    * hash-mismatching while bit-exact by value), and the digit string
    * is the one representation every engine agrees on. */
  def report(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      contentCol: String): DataFrame =
    diff(oldSnap, newSnap, idCol, contentCol)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        sum(col(idCol).cast("decimal(38,0)")).cast("string").as("id_sum"))
}
