package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML-to-text extraction with boilerplate-block removal — the FRONT of
  * a web-curation pipeline (VERDICT r11 #2): everything downstream (L12
  * quality scoring, L48 Gopher rules, L45 paragraph dedup) assumes
  * extracted text, but raw crawl data is HTML. This is a
  * jusText/trafilatura-class RULE battery (Pomikálek 2011, "Removing
  * boilerplate and duplicate content from web corpora"; Barbaresi 2021,
  * trafilatura, ACL demo), not a DOM parser: real extractors on this
  * path are regex/heuristic pipelines precisely because a 100 TB crawl
  * cannot afford a per-document DOM allocation, and the rule chain below
  * is expressible as codegen'd string expressions on BOTH engines, so
  * the DuckDB oracle replays it byte-for-byte.
  *
  * The chain (each step a documented, order-pinned rule):
  *   1. drop `<head>…</head>` (title/meta are chrome, not content);
  *   2. drop `<script>…</script>` and `<style>…</style>` anywhere in the
  *      body (non-greedy, attribute-tolerant);
  *   3. segment into blocks on CLOSING block-level tags
  *      (`</p> </div> </li> </nav> </footer> </h1>..</h3>` — the
  *      jusText block model: classification happens per block, never
  *      per page);
  *   4. per block: strip all remaining tags, collapse runs of spaces,
  *      trim; measure `text_chars`, `link_chars` (total length of
  *      `<a …>…</a>` anchor texts BEFORE tag-stripping — the pattern
  *      requires an attribute after `<a `, so a bare attributeless
  *      `<a>` counts as text, not anchor: a documented rule-battery
  *      simplification, shared verbatim with the oracle, and real
  *      crawl anchors carry hrefs), `n_words` and
  *      `n_stop` (members of a fixed function-word list);
  *   5. classify — `short` if text_chars < minTextChars (default 25);
  *      else `link` if 2·link_chars >= text_chars (link density >= 50%,
  *      the nav/share-bar signature); else `low_stop` if
  *      20·n_stop < n_words (stopword density < 5% — the
  *      copyright-line/breadcrumb signature; jusText's insight is that
  *      running prose carries function words, chrome does not) UNLESS
  *      text_chars >= longContentChars (default 200 — long low-link
  *      blocks are content in any language, the jusText length
  *      override); else `content`;
  *   6. reassemble the `content` blocks in document order, joined by
  *      `\n`.
  *
  * Everything is integer-exact (the two densities are the cross-
  * multiplied compares 2·link >= chars and 20·stop < words — no
  * division, no floats), so the md5 of the extracted text is a stable
  * oracle surface.
  *
  * Scale shape: one projection chain per page (regexp_replace / split —
  * all codegen'd, no UDF, no DOM), one posexplode to block rows (fan-out
  * = blocks per page, ~10–100), per-block columns again codegen'd
  * string ops, then ONE per-doc hash aggregation whose reassembly
  * carries only the kept block texts. No join, no window, no driver
  * traffic — the whole operator is embarrassingly parallel and
  * partition-preserving, exactly what a 100 TB crawl shard wants. The
  * only HOF lambdas (stopword filter, reassembly sort) run on
  * block-word arrays (≤ page words) and per-doc kept-block arrays —
  * both bounded by page size, with their argument arrays materialized
  * as columns first (the r11 interpreted-HOF lesson). */
object HtmlExtract {

  /** Function words whose per-block density separates prose from chrome
    * (step 5). Fixed, case-sensitive, shared verbatim with the oracle. */
  val Stopwords: Seq[String] =
    Seq("a", "an", "and", "in", "is", "of", "the", "to")

  /** Closing tags that end a text block (step 3) — the jusText block
    * model's segmentation points. */
  val BlockSplit = "</(?:p|div|li|nav|footer|h1|h2|h3)>"

  /** Per-block classification + per-doc reassembly (steps 1–6).
    * Output: (idCol, n_blocks, n_short, n_link, n_low_stop, n_content,
    * content_chars, extract_md5, text) — one row per input page, `text`
    * the extracted content ('' when no block survives). */
  def extract(pages: DataFrame, idCol: String, htmlCol: String,
      minTextChars: Int = 25, longContentChars: Int = 200): DataFrame = {
    require(minTextChars >= 1 && longContentChars >= minTextChars,
      s"need 1 <= minTextChars ($minTextChars) <= longContentChars " +
        s"($longContentChars)")
    // steps 1-2: chrome removal, order-pinned (head first, then any
    // body scripts/styles); single-line pages — '.' need not cross \n
    val cleaned = regexp_replace(regexp_replace(regexp_replace(
      col(htmlCol), "<head>.*?</head>", " "),
      "<script[^>]*>.*?</script>", " "),
      "<style[^>]*>.*?</style>", " ")
    val blocks = pages
      .filter(col(idCol).isNotNull && col(htmlCol).isNotNull)
      .select(col(idCol), posexplode(split(cleaned, BlockSplit))
        .as(Seq("pos", "block")))
    // step 4: per-block measurements — each regexp runs ONCE per block
    // row in codegen; the word array is materialized as a column before
    // the stopword lambda touches it (assign-before-HOF)
    val measured = blocks
      .withColumn("btxt", trim(regexp_replace(
        regexp_replace(col("block"), "<[^>]*>", " "), " +", " ")))
      .withColumn("text_chars", length(col("btxt")))
      .withColumn("link_chars", length(array_join(
        regexp_extract_all(col("block"), lit("<a [^>]*>([^<]*)</a>"),
          lit(1)), "")))
      .withColumn("words", split(col("btxt"), " "))
      .withColumn("n_words", size(col("words")))
      .withColumn("n_stop", size(filter(col("words"),
        w => w.isin(Stopwords: _*))))
    // step 5: the classification ladder (first match wins)
    val cls = when(col("text_chars") < minTextChars, "short")
      .when(col("link_chars") * 2 >= col("text_chars"), "link")
      .when(col("n_stop") * 20 < col("n_words") &&
        col("text_chars") < longContentChars, "low_stop")
      .otherwise("content")
    // step 6: one per-doc aggregation; collect_list drops the nulls the
    // `when` leaves on non-content blocks, array_sort restores document
    // order (the ParagraphDedup reassembly idiom)
    measured
      .withColumn("cls", cls)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("cls") === "short", 1L).otherwise(0L)).as("n_short"),
        sum(when(col("cls") === "link", 1L).otherwise(0L)).as("n_link"),
        sum(when(col("cls") === "low_stop", 1L).otherwise(0L))
          .as("n_low_stop"),
        sum(when(col("cls") === "content", 1L).otherwise(0L))
          .as("n_content"),
        sum(when(col("cls") === "content", col("text_chars"))
          .otherwise(0L)).as("content_chars"),
        array_join(transform(
          array_sort(collect_list(when(col("cls") === "content",
            struct(col("pos"), col("btxt"))))),
          _.getField("btxt")), "\n").as("text"))
      .withColumn("extract_md5", md5(col("text").cast("binary")))
  }

  /** Deterministic synthetic crawl page for the oracle fixture: the
    * document's words re-flowed into `wordsPerPara`-word `<p>` blocks,
    * wrapped in the boilerplate a real crawl page carries — head with
    * title/style/script (step-1/2 food), a link-dense nav and a
    * share bar (the `link` class), a short subscribe box (`short`), a
    * stopword-free copyright footer (`low_stop`). Shared parameter-for-
    * parameter with the generated oracle SQL, so engine and oracle
    * build then extract the SAME page (the generated-oracle
    * discipline). */
  def synthesize(docs: DataFrame, idCol: String, textCol: String,
      wordsPerPara: Int = 12): DataFrame = {
    require(wordsPerPara >= 1, s"wordsPerPara $wordsPerPara must be >= 1")
    val words = split(col(textCol), " ")
    val nPara = expr(s"(size(split($textCol, ' ')) + ${wordsPerPara - 1})" +
      s" DIV $wordsPerPara")
    val paras = transform(sequence(lit(0), (nPara - 1).cast("int")),
      i => concat(lit("<p>"),
        array_join(slice(words, i * wordsPerPara + 1, lit(wordsPerPara)),
          " "),
        lit("</p>")))
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), concat(
        lit("<html><head><title>Doc "), col(idCol),
        lit("</title><style>body{margin:0}</style>" +
          "<script>var t=1;</script></head><body>" +
          "<nav><a href=\"/\">Home</a> <a href=\"/news\">News</a> " +
          "<a href=\"/about\">About</a> <a href=\"/contact\">Contact</a> " +
          "<a href=\"/archive\">Archive</a> " +
          "<a href=\"/subscribe\">Subscribe</a></nav>" +
          "<div><a href=\"/subscribe\">Subscribe</a> " +
          "<a href=\"/signin\">Sign in</a></div>"),
        array_join(paras, ""),
        lit("<div>Share: <a href=\"/t\">Tweet</a> " +
          "<a href=\"/f\">Share</a> <a href=\"/l\">Like</a> " +
          "<a href=\"/fo\">Follow</a> <a href=\"/p\">Pin</a></div>" +
          "<footer>Copyright 2026 Example Corp " +
          "<a href=\"/terms\">Terms</a> " +
          "<a href=\"/privacy\">Privacy</a></footer></body></html>")
      ).as("html"))
  }
}
