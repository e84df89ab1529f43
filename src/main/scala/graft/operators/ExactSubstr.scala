package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-global exact-substring deduplication — the ExactSubstr
  * modality of Lee et al. 2022 (arXiv:2107.06499 §4.1): remove every
  * verbatim token run of length ≥ `minRun` that occurs more than once
  * ANYWHERE in the corpus, keeping one canonical occurrence. This is
  * the corpus-level complement of the existing dedup family: L1/L2
  * drop whole near-identical documents, L45 (ParagraphDedup) drops
  * repeated delimiter/window UNITS, L42 (SharedPassages.maxSharedRun)
  * MEASURES per-pair overlap — none of them removes a duplicated run
  * that crosses unit boundaries or hides inside otherwise-unique
  * documents. ExactSubstr does, corpus-globally.
  *
  * The paper finds maximal duplicated substrings with a corpus suffix
  * array — a shared-memory structure with no distributed analog. The
  * Spark-native reformulation is WINDOWED-GRAM COVERAGE, equivalent on
  * run semantics: a duplicated run of length L ≥ k is exactly the union
  * of its L−k+1 duplicated k-grams, so marking every token covered by a
  * NON-CANONICAL duplicated k-gram window removes precisely the
  * duplicated runs (k = minRun). Declared keeper rule: for each
  * duplicated gram the corpus-wide smallest `(id, pos)` occurrence is
  * canonical (deterministic, engine-portable — the ParagraphDedup
  * election); a token survives iff NO non-canonical duplicated window
  * covers it. Overlapping duplications compose by union, and a doc
  * repeating a run internally loses its second occurrence too.
  *
  * Scale shape (the reason this formulation wins at 100 TB):
  *  - gram build is a codegen'd narrow projection (sequence → slice →
  *    array_join), no shuffle;
  *  - the winner election is ONE partial-aggregated `groupBy(gram)` —
  *    `min(struct(id, pos))` rides the combine, so a boilerplate gram
  *    repeated a billion times collapses map-side (the ParagraphDedup
  *    skew argument, measured there);
  *  - only DUPLICATED occurrences expand further: the `df >= 2` filter
  *    happens before the join back, so the coverage expansion costs
  *    O(duplicated tokens × 1), not O(corpus × k) — the k offsets per
  *    loser window dedupe into per-token rows of 12 bytes;
  *  - rebuild is one token-level `groupBy(id)` with document-sized
  *    groups — same cost class as ParagraphDedup's reassembly.
  *  Grams group by their STRING (not a 64-bit hash): at 10^11 grams a
  *  64-bit space expects collisions, and a collision here would merge
  *  distinct runs and delete innocent text; the shuffle pays k tokens
  *  of width per gram for exactness (ParagraphDedup's discipline).
  *
  * Reference capability analog: the dedup surface of
  * qb-data-pipeline-backfill `README.md:181-185` (whole-record dedup by
  * key), extended to sub-document corpus-global granularity. */
object ExactSubstr {

  /** (id, pos, gram) — one row per sliding `k`-token window of each
    * document, `pos` the 0-based token index of the window start; docs
    * shorter than `k` tokens emit nothing. */
  def windowGrams(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    gramsFromTokens(tokenize(df, idCol, textCol), k)

  private def tokenize(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    // null ids would all collapse into ONE rebuild group and null text
    // would surface null n_tokens/n_removed — filter/coalesce like the
    // sibling operators (Interleave, KMeansLloyd, Trend; ADVICE r9)
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.tokens(coalesce(col(textCol), lit(""))).as("tk"))

  private def gramsFromTokens(toks: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"minRun $k must be >= 2")
    toks.filter(size(col("tk")) >= k)
      .select(col("id"), explode(transform(
          sequence(lit(0), size(col("tk")) - k),
          i => struct(i.as("pos"),
            array_join(slice(col("tk"), i + 1, lit(k)), " ").as("gram"))))
        .as("w"))
      .select(col("id"), col("w.pos").as("pos"), col("w.gram").as("gram"))
  }

  /** Non-canonical occurrences of corpus-duplicated grams:
    * (id, pos) of every window whose gram has df >= 2, minus the
    * corpus-wide `min(struct(id, pos))` winner per gram. */
  def loserWindows(grams: DataFrame): DataFrame = {
    val dup = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("df"),
        min(struct(col("id"), col("pos"))).as("win"))
      .filter(col("df") >= 2)
      .select(col("gram"), col("win"))
    grams.join(dup, Seq("gram"))
      .filter(!(col("id") === col("win.id") && col("pos") === col("win.pos")))
      .select(col("id"), col("pos"))
  }

  /** The composed operator: one row per input document —
    * (id, n_tokens, n_removed, text) where `text` is the document
    * rebuilt (space-joined) from the tokens NOT covered by any
    * non-canonical duplicated window. Documents shorter than `minRun`
    * tokens (or empty) pass through whole. */
  def dedupSubstrings(df: DataFrame, idCol: String, textCol: String,
      minRun: Int): DataFrame = NearDup.materialized { cache =>
    // tokenize ONCE, gram ONCE: toks feeds both the rebuild stream and
    // the n_tokens join, grams feed both the winner election and the
    // join back — uncached this operator re-tokenized the corpus up to
    // 4x (review-caught r9); the SourceDivergence cache discipline
    val toks = cache(tokenize(df, idCol, textCol))
    val covered = loserWindows(cache(gramsFromTokens(toks, minRun)))
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(minRun - 1))).as("tp"))
      .distinct()
    val stream = toks.select(col("id"),
      posexplode(col("tk")).as(Seq("tp", "tok")))
    val rebuilt = stream.join(covered, Seq("id", "tp"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("tp"), col("tok")))),
          s => s("tok")), " ").as("text"))
    toks.select(col("id"), size(col("tk")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text"), lit("")).as("text"))
  }
}
