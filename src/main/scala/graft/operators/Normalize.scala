package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode normalization for dedup keys — the curation step in front of
  * L1's exact fingerprint dedup: canonically-equivalent text arrives
  * from the web in byte-different encodings (precomposed U+00E9 vs
  * e + combining U+0301, full NFC vs NFD exports), and an
  * un-normalized md5 keeps every variant. NFC (UAX #15 canonical
  * composition) is the W3C-recommended interchange form; normalizing
  * BEFORE fingerprinting merges the variants without touching visible
  * content (unlike NFKC, which also folds compatibility characters —
  * ligatures, full-width forms — and does change content; NFC is the
  * safe default for dedup keys).
  *
  * Scale shape: normalization is a per-row projection inside
  * whole-stage codegen ([[graft.expressions.NfcNormalize]], with an
  * already-normalized quick-check fast path — the common case in a web
  * corpus allocates nothing); the dedup report shuffles 16-byte md5
  * fingerprints, never text (the L1/L54 fixed-width-shuffle rule). */
object Normalize {

  /** NFC normalization as a codegen'd native column
    * (SQL: `graft_nfc(s)`). */
  def nfc(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.NfcNormalize(
        org.apache.spark.sql.GraftBridge.expression(c)))

  /** Per-group dedup-gain report: how many exact-dup groups NFC
    * normalization merges that raw byte equality misses.
    * Output: (group, n_rows, raw_distinct, nfc_distinct, merged) —
    * `merged = raw_distinct − nfc_distinct` is the number of variant
    * classes the normalization collapses. */
  def nfcDedupGain(docs: DataFrame, textCol: String,
      groupCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"),
        md5(col(textCol).cast("binary")).as("raw_fp"),
        md5(nfc(col(textCol)).cast("binary")).as("nfc_fp"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("raw_fp")).as("raw_distinct"),
        countDistinct(col("nfc_fp")).as("nfc_distinct"))
      .select(col("grp"), col("n_rows"), col("raw_distinct"),
        col("nfc_distinct"),
        (col("raw_distinct") - col("nfc_distinct")).as("merged"))
}
