package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM training-data pipelines
  * (BASELINE.json north star; SURVEY.md §2 X): tokenization, shingling,
  * Jaccard, quality metrics, language ID, fingerprinting.
  *
  * Everything here is composed from built-in Catalyst expressions — no UDFs —
  * so the whole stage stays inside whole-stage codegen and scales linearly
  * with executor count: per-row narrow transforms, no shuffle, no
  * driver-side work. (Higher-order functions `transform`/`filter`/`aggregate`
  * are evaluated per-row on executors.)
  */
object TextAnalysis {

  /** Whitespace tokenization (the reference corpus is plain lowercase text;
    * for BPE-ish subword counting see [[bpeishTokenCount]]). */
  def tokens(c: Column): Column = {
    val t = trim(c)
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Token-window passage chunks — the chunking step of embedding/RAG
    * prep: the token stream cut into windows of `chunkTokens`, one window
    * starting every `stride` tokens (stride < chunkTokens ⇒ overlapping
    * passages; stride == chunkTokens ⇒ tumbling). Returns an array of
    * chunk STRINGS (tokens re-joined with single spaces) — empty for an
    * empty document. Window starts stop once a window has reached the
    * document's end (upper bound len − chunk + stride), so the final,
    * possibly short window is the ONLY tail — naive starts-to-the-end
    * would emit trailing chunks that are strict sub-spans of the previous
    * one (duplicate passages in the downstream embedding index); every
    * token is still covered because the last start is ≥ len − chunk + 1.
    *
    * Pure Catalyst composition (sequence → transform → slice →
    * array_join): codegen'd, per-row, no shuffle — chunking 100 TB is a
    * narrow projection; the downstream explode is where rows multiply. */
  def tokenChunks(c: Column, chunkTokens: Int, stride: Int): Column = {
    require(chunkTokens > 0 && stride > 0,
      s"chunkTokens $chunkTokens and stride $stride must be positive")
    val toks = tokens(c)
    // Clamped at len: with stride > chunkTokens (gap-sampling) the raw
    // bound len − chunk + stride can pass the document's end, and a start
    // past the end slices nothing — an EMPTY-STRING chunk that downstream
    // explodes turn into empty passages (corpus artifacts, ADVICE r4).
    val lastStart = greatest(
      least(size(toks), size(toks) - chunkTokens + stride), lit(1))
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), lastStart, lit(stride)),
        s => array_join(slice(toks, s, lit(chunkTokens)), " ")))
  }

  /** BPE-ish token estimate without a vocab: count word pieces after
    * splitting on whitespace AND between letter/digit/punct boundaries —
    * the usual cheap stand-in for a real tokenizer's token count. */
  def bpeishTokenCount(c: Column): Column = {
    val pieces = regexp_replace(c,
      "(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|(?=[^a-zA-Z0-9\\s])|(?<=[^a-zA-Z0-9\\s])",
      " ")
    size(when(length(trim(pieces)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(pieces), "\\s+")))
  }

  /** Distinct n-word shingles ("word n-grams"), the unit of near-dup
    * similarity. Returns an empty array when the doc has < n tokens. */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
  }

  /** Exact Jaccard similarity of two array columns (treated as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b))
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0)).otherwise(
      (length(c) - length(regexp_replace(c, "\\p{Punct}", "")))
        .cast("double") / length(c))

  /** Fraction of tokens that appear in `stopwords`. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isInCollection(stopwords))).cast("double")
        / size(toks))
  }

  /** Mean characters per token (0 for empty docs). */
  def avgWordLen(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks))
  }

  /** Composite quality score in [0,1] — the usual pre-training heuristics:
    * long enough, not punctuation soup, some stopword signal, sane word
    * lengths. Weights are arbitrary but fixed; callers filter on it. */
  def qualityScore(c: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val lenOk = when(length(c) >= 100 && length(c) <= 20000, 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(c) < 0.2, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(c, stopwords) > 0.02, 1.0).otherwise(0.0)
    val wordOk = when(avgWordLen(c).between(2.0, 12.0), 1.0).otherwise(0.0)
    round((lenOk * 0.4 + punctOk * 0.2 + stopOk * 0.2 + wordOk * 0.2), 2)
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Per-language marker words for [[langId]]. Alphabetical language order
    * is the deterministic tiebreak. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "to", "is", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "una", "por"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une", "est", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Marker-hit count for one language. */
  def langScore(c: Column, markers: Seq[String]): Column =
    size(filter(tokens(c), t => t.isInCollection(markers)))

  /** Argmax-of-scores CASE chain shared by [[langId]] and [[withLangId]]:
    * first (alphabetical) language whose score >= every other; all-zero →
    * "und". Semantics deliberately expressible as a SQL CASE for the
    * DuckDB oracle. */
  private def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val allZero = scores.map(_._2 === 0).reduce(_ && _)
    val cases = scores.zipWithIndex.map { case ((lang, s), i) =>
      val geAll = scores.zipWithIndex.collect { case ((_, o), j) if j != i => s >= o }
        .reduce(_ && _)
      (geAll, lang)
    }
    val chain = cases.foldRight(lit("und")) { case ((cond, lang), els) =>
      when(cond, lit(lang)).otherwise(els)
    }
    when(allZero, lit("und")).otherwise(chain)
  }

  /** n-gram-heuristic language ID as a single column expression. The CASE
    * chain references every score ~n_langs times — fine for ad-hoc use, but
    * pipelines should use [[withLangId]], which stages tokens and scores as
    * materialized projections (the inline form re-tokenized the text ~25×
    * and cost 4.5 s on the 5000-doc bench vs sub-second staged). */
  def langId(c: Column, markers: Seq[(String, Seq[String])] = LangMarkers): Column =
    langIdFromScores(markers.map { case (lang, words) =>
      lang -> langScore(c, words) })

  /** Staged language ID: tokens once, one score column per language, then
    * the argmax CASE over plain column refs; helper columns dropped. */
  def withLangId(df: org.apache.spark.sql.DataFrame, textCol: String,
      as: String = "lid",
      markers: Seq[(String, Seq[String])] = LangMarkers): org.apache.spark.sql.DataFrame = {
    val toksCol = "__langid_toks"
    val scoreCol = markers.map { case (l, _) => l -> s"__langid_s_$l" }.toMap
    val staged = markers.foldLeft(df.withColumn(toksCol, tokens(col(textCol)))) {
      case (d, (lang, words)) =>
        d.withColumn(scoreCol(lang),
          size(filter(col(toksCol), t => t.isInCollection(words))))
    }
    staged.withColumn(as,
        langIdFromScores(markers.map { case (l, _) => l -> col(scoreCol(l)) }))
      .drop(toksCol +: markers.map { case (l, _) => scoreCol(l) }: _*)
  }

  /** Per-token 64-bit hashes — stage this as its OWN projection column
    * before calling [[shingleHashesFromTokens]]: referencing the transform
    * inline inside the nested shingle lambda would re-evaluate the whole
    * tokenization per shingle element. */
  def tokenHashes(c: Column): Column = transform(tokens(c), t => xxhash64(t))

  /** Distinct n-word shingles as 64-bit HASHES from a pre-staged token-hash
    * array — the cheap representation for near-dup pipelines: one
    * fixed-width combine per shingle, no per-shingle string building
    * (wordShingles' array_join cost ~4 s per 5000-doc scan on the bench).
    * Set semantics match [[wordShingles]] up to 64-bit hash collisions
    * (P ≈ 10⁻¹⁶ per doc pair — Jaccard over these equals Jaccard over the
    * string shingles for oracle purposes). */
  def shingleHashesFromTokens(th: Column, n: Int): Column =
    when(size(th) < n, array().cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(th) - (n - 1)),
        i => xxhash64((0 until n).map(j => element_at(th, i + j)): _*))))

  /** POSITION-ORDERED (non-distinct) n-gram shingle hashes from a
    * pre-staged token-hash array: element p is the hash of tokens
    * p..p+n-1, so equal values at positions (i, j) of two documents
    * certify an n-token verbatim match STARTING there — the
    * representation run-growth needs
    * ([[graft.operators.SharedPassages.maxSharedRun]]), where
    * [[shingleHashesFromTokens]]'s set semantics deliberately erase
    * positions. Same tokenization and hash family, so the two agree on
    * membership. Like the sibling, `th` MUST be a pre-staged projection
    * column, never an inline [[tokenHashes]] call: the shingle lambda
    * references `th` ~8n times per row, and inlining re-tokenizes the
    * text at every reference (measured: 30 s vs 0.2 s on the 5000-doc
    * bench corpus). */
  def positionalShingleHashesFromTokens(th: Column, n: Int): Column =
    when(size(th) < n, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), size(th) - (n - 1)),
        i => xxhash64((0 until n).map(j => element_at(th, i + j)): _*)))

  /** TF-IDF over a corpus: per (doc, term) — term frequency, document
    * frequency, and the smoothed score tf · (ln((N+1)/(df+1)) + 1)
    * (sklearn-style smoothing, never negative/divide-by-zero).
    *
    * Scale shape: one explode + two hash aggregates (terms ride a single
    * shuffle each) + a 1-row broadcast for the corpus size — no collect, no
    * all-pairs; at 100 TB the (id, term) aggregate is the only large
    * shuffle and it partial-aggregates map-side. */
  def tfidf(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val terms = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs)) // 1 row — corpus size
      .withColumn("tfidf", round(col("tf") *
        (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)),
        4))
      .select(col("id"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Per-document character-distribution Shannon entropy (bits/char) —
    * the encoding-junk / gibberish signal of CCNet-style quality
    * filtering: natural-language text sits in a narrow entropy band
    * (~3.5–4.5 bits for English), while base64 blobs, binary spills and
    * single-char spam land far outside it. Returns ("<idCol>",
    * "char_entropy"), 0.0 for empty docs.
    *
    * Declarative TF-IDF shape (explode + two hash aggregates, both
    * partial-aggregating map-side): the per-(doc, char) counts collapse
    * to ≤ alphabet-size rows per doc before the second shuffle, so 100 TB
    * of text shuffles O(docs × alphabet), not O(chars). Entropy via the
    * exact algebra H = log2(n) − (Σ c·log2 c)/n — one pass over the
    * per-char counts, no per-row probability vector. */
  def charEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    val ent = df.filter(length(col(textCol)) > 0)
      .select(col(idCol), explode(split(col(textCol), "")).as("__c"))
      .groupBy(col(idCol), col("__c")).agg(count(lit(1)).as("__cnt"))
      .groupBy(col(idCol)).agg(sum(col("__cnt")).as("__n"),
        sum(col("__cnt") * log2(col("__cnt"))).as("__sl"))
      .select(col(idCol),
        round(log2(col("__n")) - col("__sl") / col("__n"), roundTo)
          .as("char_entropy"))
    df.select(col(idCol))
      .join(ent, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("char_entropy"), lit(0.0)).as("char_entropy"))
  }

  /** Whole-document fingerprint: md5 of the whitespace-normalized lowercase
    * text — the exact-dedup key. */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** 64-bit rolling-shingle fingerprint (winnowing-lite): the minimum
    * xxhash64 over the doc's n-word shingles. Equal for near-identical docs
    * with high probability; the 1-hash special case of a MinHash signature. */
  def shingleFingerprint(c: Column, n: Int = 3): Column =
    array_min(transform(wordShingles(c, n), s => xxhash64(s)))

  /** POSITIONAL sequence (not set) of n-gram hashes from a pre-staged
    * token-hash array — winnowing needs positions, so no dedup. Each
    * position combines n already-hashed tokens: O(1) per position, the
    * same cost profile a textbook rolling hash achieves, with the
    * determinism of the fixed xxhash64 family. */
  def shingleHashSeq(th: Column, n: Int): Column =
    when(size(th) < n, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), size(th) - (n - 1)),
        i => xxhash64((0 until n).map(j => element_at(th, i + j)): _*)))

  /** Winnowing document sketch (the MOSS fingerprinting scheme): slide a
    * window of `w` consecutive k-gram hashes and keep each window's
    * minimum; the deduped selections are the sketch. GUARANTEE: two
    * documents sharing any token run of length >= w + k - 1 share at
    * least one sketch element (every such run contains a full window, and
    * both docs select that window's minimum) — measured, not assumed, in
    * TextNearDupSpec. Sketch density ~ 2/(w+1) of positions, so `w` sets
    * the size/recall trade. Docs shorter than one window contribute their
    * global minimum. */
  def winnowingSketch(hseq: Column, w: Int): Column =
    when(size(hseq) === 0, array().cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), greatest(size(hseq) - (w - 1), lit(1))),
        i => array_min(slice(hseq, i, least(lit(w), size(hseq)))))))

  /** Staged winnowing over a text column: tokens → token hashes → k-gram
    * hash sequence → sketch, each as its own projection so nothing
    * re-evaluates inside nested lambdas. */
  def withWinnowing(df: org.apache.spark.sql.DataFrame, textCol: String,
      as: String = "sketch", k: Int = 3, w: Int = 4): org.apache.spark.sql.DataFrame =
    df.withColumn("__wn_th", tokenHashes(col(textCol)))
      .withColumn("__wn_seq", shingleHashSeq(col("__wn_th"), k))
      .withColumn(as, winnowingSketch(col("__wn_seq"), w))
      .drop("__wn_th", "__wn_seq")

  /** PORTABLE positional k-gram hash sequence: each position hashes its
    * space-joined k-gram through the engine-portable md5 convention
    * (DSIR's trick, widened from 16 to 60 bits so window-min ties stay
    * ~2⁻⁶⁰-rare): `conv(substr(md5(gram), 1, 15), 16, 10)` ≡ DuckDB
    * `CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT)` — 15 hex digits
    * = 60 bits, always positive, always < 2⁶³. O(k) per position with
    * k fixed; ~2× the xxhash64 path's cost (md5 + string staging), which
    * is why BOTH exist: this one whenever cross-engine reproducibility
    * of sketch CONTENT matters (the oracle, polyglot pipelines), the
    * xxhash64 path when only within-engine agreement is needed. */
  def portableShingleHashSeq(tk: Column, k: Int): Column =
    when(size(tk) < k, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), size(tk) - (k - 1)),
        i => conv(substring(md5(array_join(slice(tk, i, lit(k)), " ")),
          1, 15), 16, 10).cast("bigint")))

  /** [[withWinnowing]] on the portable hash family: identical window
    * min-select, sketches reproducible in any engine with md5 —
    * oracle-exact, not just rows-countable. */
  def withPortableWinnowing(df: org.apache.spark.sql.DataFrame,
      textCol: String, as: String = "sketch", k: Int = 3,
      w: Int = 4): org.apache.spark.sql.DataFrame =
    df.withColumn("__wn_tk", tokens(col(textCol)))
      .withColumn("__wn_seq", portableShingleHashSeq(col("__wn_tk"), k))
      .withColumn(as, winnowingSketch(col("__wn_seq"), w))
      .drop("__wn_tk", "__wn_seq")

  // ------------------------------------------------------------ PII scrub

  /** Email/URL patterns for scrubbing — restricted to syntax both Java's
    * regex and RE2-family engines (DuckDB, Go, Rust) interpret
    * identically (no backtracking constructs, no backreferences), so the
    * scrub is reproducible outside the JVM. Redaction beats deletion for
    * training text: the token structure around the PII survives. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"

  /** Replace URLs then emails with redaction tags. URL scrub runs FIRST:
    * an email-shaped userinfo inside a URL (`https://user@host/...`)
    * belongs to the URL match, and the reverse order would split it. */
  def scrubPii(c: Column, emailTag: String = "<EMAIL>",
      urlTag: String = "<URL>"): Column =
    regexp_replace(
      regexp_replace(c, UrlPattern, urlTag),
      EmailPattern, emailTag)

  /** Number of non-overlapping matches of `pattern` — the scrub's audit
    * counter (how many emails/URLs a document carried). To count the
    * email redactions [[scrubPii]] would actually perform, pass the
    * URL-scrubbed text, not the raw text: an email-shaped userinfo inside
    * a URL matches [[EmailPattern]] on raw text but belongs to the URL
    * replacement (scrubPii's URL-first order). */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  // ------------------------------------------------- checksum-validated PII

  /** Contiguous digit runs of payment-card length. Deliberately
    * separator-free (no embedded spaces/dashes): a separator-tolerant
    * greedy class would swallow the gap BETWEEN two adjacent numbers,
    * and RE2-family engines offer no lookahead to stop it — runs of
    * > 19 digits match their first 19 on both engines (leftmost-first
    * greedy, the q_x13 parity class). */
  val CardRunPattern = "[0-9]{13,19}"

  /** Luhn mod-10 checksum of a digit-run string (ISO/IEC 7812-1;
    * Luhn 1960, US patent 2,950,048): from the RIGHT, double every
    * second digit folding > 9 back by −9, sum, valid ⇔ ≡ 0 (mod 10).
    * The precision gate regex-only PII detection lacks: a random
    * 16-digit run passes the length test but Luhn only 1 time in 10 —
    * validating drops ~90% of the false positives while keeping every
    * real card number (all issued PANs carry the check digit).
    * Pure column arithmetic (ascii/substr/fold), replayed verbatim by
    * the oracle; evaluates once per CANDIDATE row (bounded per doc),
    * never per corpus row × pattern. */
  def luhnValid(d: Column): Column = {
    val n = length(d)
    val total = aggregate(sequence(lit(1), n), lit(0), (acc, i) => {
      val digit = ascii(d.substr(n - i + 1, lit(1))) - lit(48)
      acc + when(pmod(i, lit(2)) === 0,
        when(digit * 2 > 9, digit * 2 - 9).otherwise(digit * 2))
        .otherwise(digit)
    })
    pmod(total, lit(10)) === 0
  }

  /** Per-document card audit: (idCol, n_digit_runs, n_valid_cards) —
    * how many card-length digit runs the text carries, and how many
    * survive the Luhn gate. Every input row appears (0/0 for no
    * candidates); null text reads as empty. */
  def cardAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cands = df
      .select(col(idCol).as("__id"),
        explode_outer(regexp_extract_all(coalesce(col(textCol), lit("")),
          lit(CardRunPattern), lit(0))).as("s"))
      .filter(col("s").isNotNull)
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_digit_runs"),
        sum(luhnValid(col("s")).cast("long")).as("n_valid_cards"))
    df.select(col(idCol).as("__id"))
      .join(cands, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_digit_runs"), lit(0L)).as("n_digit_runs"),
        coalesce(col("n_valid_cards"), lit(0L)).as("n_valid_cards"))
  }

  /** Good–Turing unseen-mass estimate per group (Good 1953; Gale &
    * Sampson 1995 simple GT): the probability mass of UNSEEN vocabulary
    * ≈ N₁/N (hapax share of tokens) — the data-card answer to "how much
    * more vocabulary would more data buy" — plus the
    * frequency-of-frequencies counts (N₁, N₂) and the hapax share of
    * the vocabulary. All exact floor divisions over ONE (group, token)
    * map-side-combinable aggregation + one per-group rollup. Output:
    * (groupCol, n_tokens, v_types, n1, n2, p_unseen_e6,
    * hapax_share_e6). */
  def goodTuring(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val tf = df
      .filter(col(textCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol), explode(tokens(col(textCol))).as("__tok"))
      .groupBy(col(groupCol), col("__tok"))
      .agg(count(lit(1)).as("__n"))
    tf.groupBy(col(groupCol))
      .agg(sum(col("__n")).as("n_tokens"),
        count(lit(1)).as("v_types"),
        count(when(col("__n") === 1, 1)).as("n1"),
        count(when(col("__n") === 2, 1)).as("n2"))
      .select(col(groupCol), col("n_tokens"), col("v_types"),
        col("n1"), col("n2"),
        expr("n1 * 1000000L DIV n_tokens").as("p_unseen_e6"),
        expr("n1 * 1000000L DIV v_types").as("hapax_share_e6"))
  }

  // ---- readability panel (r15, L175) ---------------------------------

  /** Heuristic syllable count (r15, L175): vowel-group runs across
    * the text (runs never span whitespace, so the text-wide count
    * equals the per-word sum) plus one per vowel-less token (the
    * "every word has at least one syllable" floor — "rhythm", "72").
    * A DOCUMENTED dictionary-free heuristic, the standard automated
    * form; silent-e and diphthong edge cases are stated non-goals
    * (both engines replay the same rule, so the statistic is exact
    * even where English is not). */
  def syllableCount(c: Column): Column =
    regexp_count(c, lit("[aeiouyAEIOUY]+")) +
      size(filter(tokens(c), t => !t.rlike("[aeiouyAEIOUY]")))

  /** Sentence count: [.!?]+ runs, floored at 1 (a fragment is one
    * sentence for rate purposes — the Flesch convention). */
  def sentenceCount(c: Column): Column =
    greatest(lit(1), regexp_count(c, lit("[.!?]+"))).cast("long")

  /** Flesch Reading Ease at 1e-6 (Flesch 1948, J. Appl. Psych. 32):
    *   FRE = 206.835 − 1.015·(W/S) − 84.6·(Syl/W)
    * as the exact cascade 206835000 − div(1015000·W, S) −
    * div(84600000·Syl, W), one truncating division per term (each
    * subtracted term floors, so fre_e6 over-reads by < 2e-6 — the
    * L157 cascade stance). W = 0 ⇒ NULL (no text to grade). */
  def fleschReadingEase(c: Column): Column = {
    val w = tokenCount(c).cast("long")
    val s = sentenceCount(c)
    val syl = syllableCount(c).cast("long")
    when(w === 0L, lit(null).cast("long"))
      .otherwise(lit(206835000L)
        - call_function("div", lit(1015000L) * w, s)
        - call_function("div", lit(84600000L) * syl, w))
  }

  /** Flesch–Kincaid grade level at 1e-6 (Kincaid et al. 1975, the
    * US Navy recalibration): FK = 0.39·(W/S) + 11.8·(Syl/W) − 15.59,
    * same cascade contract as [[fleschReadingEase]]. */
  def fleschKincaidGrade(c: Column): Column = {
    val w = tokenCount(c).cast("long")
    val s = sentenceCount(c)
    val syl = syllableCount(c).cast("long")
    when(w === 0L, lit(null).cast("long"))
      .otherwise(call_function("div", lit(390000L) * w, s)
        + call_function("div", lit(11800000L) * syl, w)
        - lit(15590000L))
  }
}
