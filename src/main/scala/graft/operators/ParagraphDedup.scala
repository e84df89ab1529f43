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
  * Unit identity is `sha2(unit, 256)` — the standard content-identity
  * convention for exact dedup at scale (collision mass ~2^-128 is far
  * below any pipeline's error budget), and it is what keeps the winner
  * shuffle narrow: the winner election groups (hash → min (doc, pos)),
  * a hash-partial-aggregated shuffle of fixed-width rows, never of
  * paragraph text. The keeper rule (globally smallest `(doc, pos)`
  * pair) is total and deterministic, so reruns and engines agree.
  *
  * Scale shape: segmentation is a codegen'd narrow projection
  * (split/posexplode — rows multiply but nothing shuffles); the winner
  * election is one partial-aggregated `groupBy(hash)` — the hottest
  * unit (the million-page nav header) map-side combines to one row per
  * input partition, so unit skew CANNOT serialize a task (the exact
  * failure the window-rank formulation would hit); marking keepers is
  * one equi-join back on `(hash, doc, pos)`; reassembly is one
  * `groupBy(doc)` whose groups are document-sized. Three shuffles
  * total, each on narrow keys, none skew-vulnerable.
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
    df.select(col(idCol).as("__pd_id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(delim), -1)).as(Seq("pos", "unit")))
      .select(col("__pd_id").as(idCol), col("pos"), col("unit"))

  /** (id, pos, unit) — tumbling `width`-token windows (the segmentation
    * for single-line corpora, reusing the L37 chunker with
    * stride == width so units partition the token stream). */
  def explodeTokenWindows(df: DataFrame, idCol: String, textCol: String,
      width: Int): DataFrame =
    df.select(col(idCol).as("__pd_id"),
        posexplode(TextAnalysis.tokenChunks(col(textCol), width, width))
          .as(Seq("pos", "unit")))
      .select(col("__pd_id").as(idCol), col("pos"), col("unit"))

  /** Adds a `keep` flag to a unit relation: true iff the unit is short
    * (`< minLen` chars — never deduped) or is the corpus-wide first
    * occurrence of its content (smallest `(id, pos)` over all rows
    * sharing its sha-256). `idCol` must be orderable; ordering is the
    * natural one on `(id, pos)` pairs. */
  def markKeepers(units: DataFrame, idCol: String, posCol: String,
      unitCol: String, minLen: Int = 1): DataFrame = {
    val hashed = units.withColumn("__pd_h",
      when(length(col(unitCol)) >= minLen, sha2(col(unitCol), 256)))
    // Winner election: partial-aggregated min over (id, pos) per hash —
    // the hot-unit row count collapses map-side, so no single task ever
    // sees all copies of a corpus-wide boilerplate unit.
    // Winner side renames every column (fresh projection) so the
    // derived-from-self join resolves unambiguously.
    val winners = hashed.filter(col("__pd_h").isNotNull)
      .groupBy(col("__pd_h"))
      .agg(min(struct(col(idCol), col(posCol))).as("__pd_w"))
      .select(col("__pd_h").as("__pd_wh"), col("__pd_w")(idCol).as("__pd_wid"),
        col("__pd_w")(posCol).as("__pd_wpos"))
    hashed.join(winners,
        col("__pd_h") === col("__pd_wh") &&
          col(idCol) === col("__pd_wid") && col(posCol) === col("__pd_wpos"),
        "left")
      .select(col(idCol), col(posCol), col(unitCol),
        (col("__pd_h").isNull || col("__pd_wid").isNotNull).as("keep"))
  }

  /** Reassembles per-document text from the kept units, in original
    * order, joined with `delim`. Returns one row per unit-relation
    * document: (id, n_units, n_kept, text). Documents that produced no
    * units (empty after segmentation) are absent — callers wanting
    * every input row left-join this back (as [[dedupParagraphs]] does). */
  def reassemble(marked: DataFrame, idCol: String, posCol: String,
      unitCol: String, delim: String): DataFrame =
    marked.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_units"),
        sum(col("keep").cast("long")).as("n_kept"),
        // when() without otherwise yields NULL for dropped units and
        // collect_list skips NULLs — only kept units are gathered.
        array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col(posCol), col(unitCol))))),
          s => s(unitCol)), delim).as("text"))

  /** The composed operator: segment on `delim`, dedup exact units
    * corpus-wide (first occurrence by `(id, pos)` wins, short units
    * exempt), reassemble. One row per input row:
    * (id, n_units, n_kept, text). */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      delim: String = "\n", minLen: Int = 1): DataFrame = {
    val units = explodeDelim(df, idCol, textCol, delim)
    composed(df, units, idCol, delim, minLen)
  }

  /** [[dedupParagraphs]] over tumbling `width`-token windows — the
    * segmentation for corpora without newline structure; reassembly
    * joins with single spaces (token-exact round-trip when nothing is
    * dropped, since units are themselves space-joined token runs). */
  def dedupTokenWindows(df: DataFrame, idCol: String, textCol: String,
      width: Int, minLen: Int = 1): DataFrame = {
    val units = explodeTokenWindows(df, idCol, textCol, width)
    composed(df, units, idCol, " ", minLen)
  }

  private def composed(df: DataFrame, units: DataFrame, idCol: String,
      delim: String, minLen: Int): DataFrame = {
    val marked = markKeepers(units, idCol, "pos", "unit", minLen)
    val docs = reassemble(marked, idCol, "pos", "unit", delim)
    df.select(col(idCol)).join(docs, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_units"), lit(0L)).as("n_units"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }
}
