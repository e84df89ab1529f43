package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Paragraph-level exact deduplication — the RefinedWeb / CCNet
  * line-dedup modality (Penedo et al. 2023, arXiv:2306.01116 §3.3;
  * Wenzek et al. 2019, arXiv:1911.00359 §3.1): instead of dropping
  * whole near-duplicate documents, remove the REPEATED UNITS (paragraphs
  * / lines / token windows) inside every document, keeping exactly the
  * first occurrence corpus-wide and reassembling each document from its
  * surviving units in original order. Catches the boilerplate that
  * whole-document dedup (L1/L2) can't touch — a nav header shared by a
  * million pages never makes two DOCUMENTS near-identical, but this
  * operator strips it from all but one.
  *
  * The winner election is ONE partial-aggregated shuffle and nothing
  * else: group the unit relation BY THE UNIT STRING and take
  * `min(struct(id, pos))` — the winning occurrence IS the surviving
  * row, so no join back is needed to identify keepers. Two formulations
  * that look equivalent lose at scale (both measured, ScaleProbe /
  * SCALE.md): a window `row_number` per unit routes every copy of a
  * corpus-wide boilerplate unit into ONE task's sort (2.1× slower at
  * 90% unit skew on 10M units, unboundedly worse as the hot unit
  * grows); a groupBy-then-join-back marks flags in 3 unit-level
  * shuffles and re-ships a fingerprint column, a 12× tax on uniform
  * corpora. The keeper rule (globally smallest `(doc, pos)` pair) is
  * total and deterministic, so reruns and engines agree.
  *
  * Scale shape: segmentation is a codegen'd narrow projection
  * (split/posexplode — rows multiply but nothing shuffles); the winner
  * election's map-side combine collapses the hottest unit to one row
  * per input partition (unit skew CANNOT serialize a task); reassembly
  * is one `groupBy(doc)` whose groups are document-sized; the final
  * per-document join runs at document granularity, not unit
  * granularity. Two unit-level shuffles total, both narrow.
  *
  * Units shorter than `minLen` characters never participate: they are
  * always kept in place (blank lines between real paragraphs must
  * survive in every document, not dedupe to one global keeper — the
  * classic line-dedup footgun CCNet §3.1 sidesteps the same way).
  *
  * Reference capability analog: the dedup surface of
  * qb-data-pipeline-backfill `README.md:181-185` (whole-record dedup by
  * key); this extends the family to sub-document granularity. */
object ParagraphDedup {

  /** (id, pos, unit) — one row per delimiter-separated unit, `pos` the
    * 0-based position inside the document. An all-delimiter or empty
    * document still yields its (empty-string) units, so reassembly
    * round-trips byte-identically when nothing is dropped. */
  def explodeDelim(df: DataFrame, idCol: String, textCol: String,
      delim: String = "\n"): DataFrame =
    // outer + null filter (the q_t6 lesson): plain posexplode would
    // re-split every row inside the inferred size()>0 filter
    df.select(col(idCol).as("__pd_id"),
        posexplode_outer(split(col(textCol),
          java.util.regex.Pattern.quote(delim), -1)).as(Seq("pos", "unit")))
      .filter(col("unit").isNotNull)
      .select(col("__pd_id").as(idCol), col("pos"), col("unit"))

  /** (id, pos, unit) — tumbling `width`-token windows (the segmentation
    * for single-line corpora, reusing the L37 chunker with
    * stride == width so units partition the token stream). */
  def explodeTokenWindows(df: DataFrame, idCol: String, textCol: String,
      width: Int): DataFrame =
    df.select(col(idCol).as("__pd_id"),
        posexplode_outer(TextAnalysis.tokenChunks(col(textCol), width,
          width)).as(Seq("pos", "unit")))
      .filter(col("unit").isNotNull)
      .select(col("__pd_id").as(idCol), col("pos"), col("unit"))

  /** The surviving unit occurrences of a unit relation: for each
    * distinct unit of `≥ minLen` chars, the row with the corpus-wide
    * smallest `(id, pos)`; short units pass through untouched (every
    * occurrence survives). One partial-aggregated `groupBy(unit)` —
    * the winning occurrence rides the `min(struct)`, so there is no
    * join back and unit skew collapses map-side. `idCol` must be
    * orderable; ordering is the natural one on `(id, pos)` pairs. */
  def keepers(units: DataFrame, idCol: String, posCol: String,
      unitCol: String, minLen: Int = 1): DataFrame = {
    val won = units.filter(length(col(unitCol)) >= minLen)
      .groupBy(col(unitCol))
      .agg(min(struct(col(idCol), col(posCol))).as("__pd_w"))
      .select(col("__pd_w")(idCol).as(idCol),
        col("__pd_w")(posCol).as(posCol), col(unitCol))
    won.unionByName(
      units.filter(length(col(unitCol)) < minLen)
        .select(col(idCol), col(posCol), col(unitCol)))
  }

  /** The composed operator: segment on `delim`, dedup exact units
    * corpus-wide (first occurrence by `(id, pos)` wins, short units
    * exempt), reassemble survivors in original order. One row per input
    * row: (id, n_units, n_kept, text). */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      delim: String = "\n", minLen: Int = 1): DataFrame = {
    val nUnits = df.select(col(idCol),
      size(split(col(textCol), java.util.regex.Pattern.quote(delim), -1))
        .cast("long").as("n_units"))
    composed(nUnits, explodeDelim(df, idCol, textCol, delim), idCol, delim,
      minLen)
  }

  /** [[dedupParagraphs]] over tumbling `width`-token windows — the
    * segmentation for corpora without newline structure; reassembly
    * joins with single spaces (token-exact round-trip when nothing is
    * dropped, since units are themselves space-joined token runs). */
  def dedupTokenWindows(df: DataFrame, idCol: String, textCol: String,
      width: Int, minLen: Int = 1): DataFrame = {
    val nUnits = df.select(col(idCol),
      size(TextAnalysis.tokenChunks(col(textCol), width, width))
        .cast("long").as("n_units"))
    composed(nUnits, explodeTokenWindows(df, idCol, textCol, width), idCol,
      " ", minLen)
  }

  /** `nUnits` is (id, n_units) — a narrow projection of the source
    * docs, which also resurrects documents whose segmentation produced
    * no units (empty under token windows): they re-enter with
    * n_kept = 0 and empty text. */
  private def composed(nUnits: DataFrame, units: DataFrame, idCol: String,
      delim: String, minLen: Int): DataFrame = {
    val kept = keepers(units, idCol, "pos", "unit", minLen)
    val perDoc = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("unit")))),
          s => s("unit")), delim).as("text"))
    nUnits.join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_units"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }
}
