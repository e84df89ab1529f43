package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Bpe, GopherRules, TextAnalysis}
import graft.operators._

/** LLM-training-data pipeline query battery (BASELINE.json north star) over
  * the `documents` and `embeddings` test tables: text analysis, exact and
  * near dedup, similarity search, multimodal columns.
  *
  * Oracle parity notes (on top of Relational's conventions):
  *  - DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  *    global-by-default semantics;
  *  - tokenization is `split(trim(text), '\s+')` with the empty-string
  *    guard mirrored on both sides;
  *  - all vector arithmetic folds left in DOUBLE on both sides (Spark
  *    `aggregate`, DuckDB `list_sum(list_transform(...))`), then rounds;
  *  - near-dup pair queries return LSH-candidate ∩ exact-Jaccard-confirmed
  *    pairs; the oracle computes the exhaustive exact answer — they agree
  *    because the query threshold (0.8) sits in the banding family's
  *    certain-recall band (detect prob ≥ 1-5e-8 at exactly J=0.8 with
  *    r=4/b=32), so parity holds for ANY corpus shape, not just one with
  *    no pairs in a marginal band (ADVICE r2). The spec tests measure
  *    recall rather than assume it.
  */
object LlmPipeline {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Driver-gated recall report for an approximate top-k result: joins
    * the ANN pairs against the in-engine exact brute-force top-3 (the
    * same computation the oracle-green q_v1 pins), emits per query the
    * exact k-th similarity plus the corpus-level floor verdict. `ann`
    * must carry (query_id, neighbor_id); queries are vec_id < 5 of
    * `emb`, corpus the rest — mirrored by the shared oracle SQL. */
  private def annRecallReport(s: SparkSession, ann: DataFrame,
      emb: DataFrame, minHits: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exact = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb.filter(col("vec_id") >= 5), k = 3)
    val perQuery = ann.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("__hits"))
    // the floor verdict is corpus-level: a deliberately global window
    // over the |queries|-row report (5 rows — never corpus-sized) sums
    // the hits without the 1-row cross join a scalar would need (the
    // ANN plan audit pins "no cross product", and it should)
    exact.filter(col("rank") === 3)
      .select(col("query_id"), col("sim").as("exact_kth_sim"))
      .join(perQuery, Seq("query_id"), "left")
      .withColumn("recall_ok",
        sum(coalesce(col("__hits"), lit(0L)))
          .over(Window.partitionBy()) >= minHits)
      .select(col("query_id"), col("exact_kth_sim"), col("recall_ok"))
      .orderBy(col("query_id"))
  }

  /** The MIPS twin of [[annRecallReport]]: exact baseline =
    * [[Similarity.mipsBruteForceTopK]] (raw inner product), same
    * corpus-level floor verdict over the |queries|-row report. */
  private def mipsRecallReport(s: SparkSession, ann: DataFrame,
      emb: DataFrame, minHits: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exact = Similarity.mipsBruteForceTopK(
      emb.filter(col("vec_id") < 5), emb.filter(col("vec_id") >= 5), k = 3)
    val perQuery = ann.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("__hits"))
    exact.filter(col("rank") === 3)
      .select(col("query_id"), col("score").as("exact_kth_score"))
      .join(perQuery, Seq("query_id"), "left")
      .withColumn("recall_ok",
        sum(coalesce(col("__hits"), lit(0L)))
          .over(Window.partitionBy()) >= minHits)
      .select(col("query_id"), col("exact_kth_score"), col("recall_ok"))
      .orderBy(col("query_id"))
  }

  /** Model fitted by the q_t20 query run, consumed by [[dynamicOracles]].
    * Training is bit-exact under any partitioning (QualityClassifierSpec),
    * so the weights are a pure function of the input table — Verify runs
    * every query BEFORE dumping oracle_sql.json, which makes the fitted
    * vector legal oracle material: the oracle replays the corpus-scale
    * SCORING join with the weights as literals, exactly what a user
    * deploying a trained filter runs. */
  @volatile private var trainedT20: Option[QualityClassifier.Model] = None

  /** Merge sequence learned by the q_t28 run, consumed by
    * [[dynamicOracles]] — same legality argument as [[trainedT20]]:
    * learning is a deterministic function of the input table (exact
    * integer counts, total-order tie-break), and Verify runs every
    * query before dumping oracle_sql.json. The oracle does NOT echo
    * the sequence: it recomputes each round's argmax from its own pair
    * counts ([[BpeLearn.oracleSql]]). */
  @volatile private var learnedT28: Option[Seq[BpeLearn.Merge]] = None

  // Shared tokenizer fragment for DuckDB oracles.
  /** q_t41's blocklist — single tokens, multi-word phrases, an
    * overlapping token/phrase pair and one absent phrase, shared
    * literal-for-literal with the oracle. */
  private val BlocklistPatterns = Seq("the", "agg", "agg row",
    "fast merge", "table", "spark", "stream", "customer query",
    "forbidden phrase")

  private val duckToks =
    "CASE WHEN length(trim(text)) = 0 THEN [] " +
      "ELSE string_split_regex(trim(text), '\\s+') END"
  private def duckMarkerScore(words: Seq[String]): String =
    s"len(list_filter($duckToks, t -> list_contains(${words.mkString("['", "','", "']")}, t)))"

  // Distinct 3-gram shingle list over `text` — the nearDupOracle
  // formulation, shared by the r8 snapshot-diff oracles.
  private val duckSh3 =
    s"""list_distinct(list_transform(
         range(1, greatest(len($duckToks) - 2, 0) + 1),
         i -> array_to_string(($duckToks)[i:i+2], ' ')))"""

  // Shared CTE chain for the q_qr9/q_qr10 oracles: the SourceDivergence
  // contribution grid (per-source smoothed unigram KL terms vs the
  // corpus, each term floored once to integer 1e-9).
  private val duckDivergenceTerms =
    s"""tk AS (SELECT source, unnest($duckToks) AS token
            FROM documents WHERE source IS NOT NULL),
        st AS (SELECT source, token, COUNT(*) AS c
               FROM tk GROUP BY source, token),
        ct AS (SELECT token, CAST(SUM(c) AS BIGINT) AS ctot
               FROM st GROUP BY token),
        ts AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ttot
               FROM st GROUP BY source),
        tot AS (SELECT CAST(SUM(ctot) AS BIGINT) AS t, COUNT(*) AS v
                FROM ct),
        term AS (SELECT ts.source, ts.ttot, ct.token,
              CAST(FLOOR(
                ((COALESCE(st.c, 0) + 0.5) / (ts.ttot + 0.5 * tot.v)) *
                ln(((COALESCE(st.c, 0) + 0.5) / (ts.ttot + 0.5 * tot.v)) /
                   ((ct.ctot + 0.5) / (tot.t + 0.5 * tot.v)))
                * 1000000000 + 0.5) AS BIGINT) AS kl_term_e9
            FROM ct CROSS JOIN ts
            LEFT JOIN st ON st.source = ts.source AND st.token = ct.token
            CROSS JOIN tot)"""

  // Shared CTE chain replaying LmScore.bigramPerplexity (L43) for the
  // q_t16/q_t17 oracles: retrains the identical add-one bigram model —
  // counts are exact integers, the one float step per position is
  // ln((c1+V)/(c2+1)) inside a half-up floor to 1e-4 nats, per-doc
  // totals/perplexity derive from those identical BIGINTs (division
  // order matches the Spark side: nll::DOUBLE / 1e4 / n). Yields `ppl`
  // (doc_id, n_bigrams, nll_e4, ppl_milli); embed as `WITH $duckLmPerplexity`.
  // Shared CTE chain replaying Dsir (L46) for the q_e9/q_e10 oracles:
  // retrains both hashed-n-gram models from scratch; yields `dsir`
  // (doc_id, n_feats, score_e4 for EVERY document); embed as
  // `WITH $duckDsir`.
  private val duckDsir =
    s"""tk AS (SELECT doc_id, lang, $duckToks AS tk FROM documents),
          uni AS (SELECT doc_id, lang, unnest(tk) AS f FROM tk),
          big AS (SELECT doc_id, lang,
                    unnest(list_transform(range(1, len(tk)),
                      i -> tk[i] || ' ' || tk[i+1])) AS f
                  FROM tk WHERE len(tk) >= 2),
          feats AS (SELECT doc_id, lang,
                      CAST(concat('0x', substr(md5(f), 1, 4)) AS INT) % 1024
                        AS b
                    FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
          ct AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM feats
                 WHERE lang = 'en' GROUP BY b),
          cr AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM feats
                 GROUP BY b),
          tot AS (SELECT (SELECT SUM(ct) FROM ct) AS nt,
                         (SELECT SUM(cr) FROM cr) AS nr),
          w AS (SELECT cr.b,
                  CAST(FLOOR((((ln(COALESCE(ct.ct, 0) + 1.0) -
                    ln(nt + 1024.0)) - ln(cr.cr + 1.0)) + ln(nr + 1024.0)) *
                    10000.0 + 0.5) AS BIGINT) AS w_e4
                FROM cr LEFT JOIN ct USING (b), tot),
          sc AS (SELECT f.doc_id, COUNT(*) AS n_feats,
                   CAST(SUM(w.w_e4) AS BIGINT) AS score_e4
                 FROM feats f JOIN w ON f.b = w.b GROUP BY f.doc_id),
          dsir AS (SELECT d.doc_id, COALESCE(n_feats, 0) AS n_feats,
                     COALESCE(score_e4, 0) AS score_e4
                   FROM documents d LEFT JOIN sc USING (doc_id))"""

  private val duckLmPerplexity =
    s"""toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
          bge AS (SELECT doc_id,
                         struct_extract(s, 'w1') AS w1,
                         struct_extract(s, 'w2') AS w2
                  FROM (SELECT doc_id,
                               unnest(list_transform(range(1, len(tk)),
                                 i -> {'w1': tk[i], 'w2': tk[i+1]})) AS s
                        FROM toks WHERE len(tk) >= 2)),
          c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
                 FROM bge GROUP BY w1, w2),
          c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
                 FROM bge GROUP BY w1),
          v AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v
                FROM (SELECT unnest(tk) AS t FROM toks)),
          sc AS (SELECT b.doc_id,
                        CAST(floor(ln((c1.c1 + v.v) / (c2.c2 + 1.0))
                          * 10000.0 + 0.5) AS BIGINT) AS nll
                 FROM bge b
                 JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
                 JOIN c1 ON b.w1 = c1.w1
                 CROSS JOIN v),
          agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                         CAST(SUM(nll) AS BIGINT) AS nll_e4
                  FROM sc GROUP BY doc_id),
          ppl AS (SELECT d.doc_id,
                 COALESCE(agg.n_bigrams, 0) AS n_bigrams,
                 COALESCE(agg.nll_e4, 0) AS nll_e4,
                 CASE WHEN agg.n_bigrams > 0 THEN
                   CAST(floor(exp(agg.nll_e4::DOUBLE / 10000.0
                     / agg.n_bigrams) * 1000.0 + 0.5) AS BIGINT)
                 END AS ppl_milli
          FROM documents d LEFT JOIN agg USING (doc_id))"""

  // Exact contamination oracle shared by q_t9 (broadcast-set path) and
  // q_t19 (bloom-screened path) — both compute the identical overlap.
  private lazy val duckDecontaminate =
    s"""WITH sh AS (SELECT doc_id, list_distinct(list_transform(
            range(1, greatest(len($duckToks) - 3, 0) + 1),
            i -> array_to_string(($duckToks)[i:i+3], ' '))) AS sh
          FROM documents),
        ev AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 50 = 0),
        tr AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 50 != 0)
        SELECT doc_id, COUNT(*) AS n_overlap
        FROM tr WHERE g IN (SELECT g FROM ev)
        GROUP BY doc_id ORDER BY doc_id"""

  // Quality formula == the q_t2 oracle's, rounded to 2 (thresholds sit
  // off the score's discrete levels {0.4,0.6,0.8,1.0}, so downstream
  // filters never compare at a rounding boundary). Shared by the q_lp
  // pipeline oracle and the q_qr2 corpus card.
  private val duckQuality2 =
    s"""ROUND(
         (CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1.0 ELSE 0.0 END) * 0.4 +
         (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
            ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0
                 / length(text) END) < 0.2 THEN 1.0 ELSE 0.0 END) * 0.2 +
         (CASE WHEN (CASE WHEN len($duckToks) = 0 THEN 0.0
            ELSE len(list_filter($duckToks, t -> list_contains(
                   ['the','a','of','and','to','in','is','it','that','for'], t))) * 1.0
                 / len($duckToks) END) > 0.02 THEN 1.0 ELSE 0.0 END) * 0.2 +
         (CASE WHEN (CASE WHEN len($duckToks) = 0 THEN 0.0
            ELSE list_sum(list_transform($duckToks, t -> length(t))) * 1.0
                 / len($duckToks) END) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.2,
         2)"""

  val queries: Map[String, Q] = Map(
    "q_s17_hll" -> ((s, dir) => {
      // HyperLogLog register sketch (r15, L168; Flajolet et al. 2007):
      // the fixed-memory companion of q_s14's KMV — 256 one-integer
      // registers buy 1.04/√256 ≈ 6.5% where KMV's 64 longs buy ~12%.
      // The query runs the MERGE path (parity-split halves, register-
      // wise max fold) against the oracle's DIRECT one-pass registers
      // — identical because max-merge ≡ sketch-of-union is an
      // algebraic identity (the s15/s16 convention). Two legs so BOTH
      // estimator regimes are live at gate scale: per-lang doc_id
      // (hundreds distinct → the linear-counting small-range path
      // through the L151 table ln) and per-returnflag l_orderkey
      // (thousands distinct at sf0.01+ → the raw HLL path). n_exact
      // sits beside est so the ~6.5% error band is visible in the
      // result itself.
      val docs = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("lang").isNotNull)
        .select(lit("docs").as("leg"), col("lang").as("grp"),
          col("doc_id").cast("string").as("k"),
          pmod(col("doc_id"), lit(2L)).as("half"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey").isNotNull && col("l_returnflag").isNotNull)
        .select(lit("orders").as("leg"), col("l_returnflag").as("grp"),
          col("l_orderkey").cast("string").as("k"),
          pmod(col("l_orderkey"), lit(2L)).as("half"))
      val base = docs.unionByName(li)
      val skA = Hll.sketch(base.filter(col("half") === 0L),
        Seq("leg", "grp"), "k")
      val skB = Hll.sketch(base.filter(col("half") === 1L),
        Seq("leg", "grp"), "k")
      val est = Hll.estimate(
        Hll.merge(skA.unionByName(skB), Seq("leg", "grp")))
      val exact = base.groupBy(col("leg"), col("grp"))
        .agg(countDistinct(col("k")).as("n_exact"))
      exact.join(est, Seq("leg", "grp"))
        .select(col("leg"), col("grp"), col("n_exact"),
          col("v_zero"), col("est"))
        .orderBy(col("leg"), col("grp"))
    }),
    // ------------------------------------------------------ text analysis
    "q_t1_token_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"),
          round(avg(TextAnalysis.avgWordLen(col("text"))), 4).as("avg_word_len"))
        .orderBy(col("lang"))),
    "q_t2_quality" -> ((s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 50)
        .select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          round(TextAnalysis.punctRatio(col("text")), 4).as("punct_ratio"),
          round(TextAnalysis.stopwordRatio(col("text"),
            TextAnalysis.EnglishStopwords), 4).as("stopword_ratio"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))),
    "q_t3_langid" -> ((s, dir) =>
      TextAnalysis.withLangId(t(s, dir, "documents"), "text")
        .groupBy(col("lid"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lid"))),
    "q_t5_tfidf" -> ((s, dir) =>
      // df/idf computed over the WHOLE corpus; output restricted after
      TextAnalysis.tfidf(t(s, dir, "documents"), "doc_id", "text")
        .filter(col("id") < 20)
        .orderBy(col("id"), col("term"))),
    "q_t6_winnowing" -> ((s, dir) =>
      // winnowing (MOSS) sketches on the PORTABLE md5-60-bit hash family
      // (r8): sketch CONTENT is oracle-exact — DuckDB replays the token
      // k-grams, the same 60-bit hash prefix and the same w-window
      // min-select value for value; the w+k-1 shared-run guarantee is
      // measured in TextNearDupSpec (xxhash64 fast path kept for
      // engine-internal use)
      // explode_OUTER + null filter, not plain explode: a non-outer
      // generate lets InferFiltersFromGenerate push `size(sketch) > 0`
      // BELOW the staged projections with the whole winnowing chain
      // inlined — the window-min lambda then recomputes the full md5
      // k-gram sequence per window position (quadratic per doc; 5 s for
      // 50 docs at sf0.1, 0.15 s this way). The outer form infers no
      // filter; the post-generate null check is an attribute compare.
      TextAnalysis.withPortableWinnowing(
          t(s, dir, "documents").filter(col("doc_id") < 50), "text")
        .select(col("doc_id"), explode_outer(col("sketch")).as("fp"))
        .filter(col("fp").isNotNull)
        .orderBy(col("doc_id"), col("fp"))),
    "q_t4_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(TextAnalysis.fingerprint(col("text"))).as("n_distinct"),
          min(TextAnalysis.fingerprint(col("text"))).as("min_fp"),
          max(TextAnalysis.fingerprint(col("text"))).as("max_fp"))),

    // -------------------------------------------------------------- dedup
    "q_d1_exact_dedup" -> ((s, dir) => {
      // doubled corpus → exact content dedup must halve it again
      val docs = t(s, dir, "documents")
      NearDup.exactByContent(docs.unionAll(docs), "text", "doc_id")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),
    "q_d2_minhash_neardup" -> ((s, dir) =>
      // Threshold sits in the near-certain-recall band of the banding
      // family (ADVICE r2): at r=4/b=32 a pair at exactly J=0.8 is
      // detected with prob 1-(1-0.8^4)^32 ≈ 1-5e-8, so oracle parity does
      // NOT depend on the corpus having no pairs in a marginal band (at
      // the old 0.5, a pair at exactly J=0.5 had ~13% miss probability).
      // Measured: every near-dup pair in the test corpora has J >= 0.800,
      // so the result set is the same as at 0.5.
      NearDup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
          shingleLen = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))),
    "q_d9_setsim_exact" -> ((s, dir) =>
      // exact prefix-filtered set-similarity join (r8, L63): the SAME
      // answer as q_d2's exhaustive oracle but with recall guaranteed by
      // construction (lossless prefix filter, no banding probability) —
      // same threshold, same oracle, deterministically zero missed pairs
      SetSimJoin.pairs(t(s, dir, "documents"), "doc_id", "text",
          shingleLen = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))),
    "q_d16_dup_coverage" -> ((s, dir) => {
      // Chapman capture–recapture dup-coverage estimate (r16, L191):
      // "how many near-dup pairs are still out there" after a
      // detector pass is a population-size question — answered here
      // with the estimator AUDITED against a known truth: the exact
      // d9 pair set is the population, and two deterministically
      // hash-thinned channels (independent base-3 digits of the pair
      // key, each keeping ~2/3) play the two detectors, so the
      // independence assumption holds BY CONSTRUCTION and N̂ must
      // land near the true count carried alongside (n_true). The
      // production use is two real imperfect detectors (L2 MinHash vs
      // L3 SimHash); correlated misses under-read — the operator
      // scaladoc states the direction.
      val pairs = SetSimJoin.pairs(t(s, dir, "documents"), "doc_id",
          "text", shingleLen = 3, threshold = 0.8)
        .select(col("id_a"), col("id_b"))
      val u = pmod(conv(substring(md5(concat(
        col("id_a").cast("string"), lit(":"),
        col("id_b").cast("string"))), 1, 14), 16, 10)
        .cast("long"), lit(1000000000L))
      val tagged = pairs.withColumn("__u", u)
      val chA = tagged.filter(pmod(col("__u"), lit(3L)) =!= 0L)
        .select(col("id_a"), col("id_b"))
      val chB = tagged
        .filter(pmod(expr("__u DIV 3"), lit(3L)) =!= 0L)
        .select(col("id_a"), col("id_b"))
      val truth = pairs.agg(count(lit(1)).as("n_true"))
      CaptureRecapture.chapman(chA, chB, Seq("id_a", "id_b"))
        .crossJoin(truth)
    }),
    "q_d3_neardup_ensemble" -> ((s, dir) =>
      // MinHash ∪ SimHash candidates → exact confirm: recall guaranteed by
      // the MinHash leg (SimHash-64 alone misses J≈0.9 pairs at hamming 8+
      // on this corpus); threshold in the certain-recall band as q_d2.
      NearDup.ensemblePairs(t(s, dir, "documents"), "doc_id", "text",
          shingleLen = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))),

    "q_d4_embedding_neardup" -> ((s, dir) =>
      // embedding-cosine near-dup through the size-dispatching FRONT DOOR
      // (VERDICT r4 #1): the test corpus sits under the brute-force
      // threshold, so this still exercises the broadcast baseline — but
      // the API q_d4 demonstrates can no longer collect a big corpus to
      // the driver (it would route to the LSH path); q_d4x pins that
      // scale path explicitly against the same oracle.
      Similarity.nearDupPairs(t(s, dir, "embeddings"), threshold = 0.45)
        .orderBy(col("id_a"), col("id_b"))),
    "q_d5_neardup_clusters" -> ((s, dir) =>
      // cluster consolidation: connected components over the confirmed
      // MinHash pair set — (id, component-minimum) per clustered doc; the
      // oracle recomputes reachability exhaustively (recursive CTE)
      Clusters.connectedComponents(
          NearDup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
            shingleLen = 3, threshold = 0.8))
        .orderBy(col("id"))),

    "q_d4x_embedding_neardup_lsh" -> ((s, dir) =>
      // the SCALE path (VERDICT r2 #2): sign-LSH bucket candidates → exact
      // cosine confirm — no driver collect, no corpus broadcast; checked
      // against the SAME exhaustive oracle as q_d4.
      Similarity.lshNearDupPairs(t(s, dir, "embeddings"), threshold = 0.45)
        .orderBy(col("id_a"), col("id_b"))),
    "q_d7_semantic_prune" -> ((s, dir) =>
      // SemDeDup-style semantic dedup (r7, L44): embedding near-dup
      // clusters collapsed to one keeper each — the per-doc label table
      // (cluster = component min, keep flag) with the oracle-exact min-id
      // keeper; the paper's centroid-distinctiveness keeper is the
      // spec-tested `distinctive = true` variant (its per-dim float mean
      // is not bit-portable across engines). Same 0.45 threshold as
      // q_d4/q_d4x, so the pair set is the proven-parity one.
      SemDedup.label(t(s, dir, "embeddings"), threshold = 0.45)
        .select(col("vec_id"), col("cluster"),
          col("keep").cast("int").as("keep"))
        .orderBy(col("vec_id"))),
    "q_d8_paragraph_dedup" -> ((s, dir) =>
      // RefinedWeb/CCNet paragraph-level exact dedup (r7, L45): the
      // corpus is single-line, so units are tumbling 12-token windows
      // (the newline segmentation is spec-covered); first (doc, pos)
      // occurrence wins corpus-wide, each doc reassembled from its
      // survivors in order — md5 pins the exact rebuilt text
      ParagraphDedup.dedupTokenWindows(t(s, dir, "documents"),
          "doc_id", "text", width = 12)
        .select(col("doc_id"), col("n_units"), col("n_kept"),
          md5(col("text").cast("binary")).as("dedup_md5"))
        .orderBy(col("doc_id"))),
    "q_d11_cdc_chunk_dedup" -> ((s, dir) => {
      // content-defined chunk dedup (r10, L90): corpus ∪ a 7-char
      // prefix-edited copy of every doc — doc-level dedup (q_d1/q_m5)
      // sees 2× distinct documents; CDC boundaries re-synchronize
      // right after the edit, so the shared-chunk stats expose the
      // duplication chunk-exactly. Only 16-byte digests shuffle.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("text").isNotNull)
      // the +100000 edited-copy id space must be disjoint from the
      // originals — engine and oracle share the literal, so a colliding
      // corpus would pass the gate silently (ADVICE r10): fail loudly
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      require(maxId < 100000L,
        s"q_d11 doubled-corpus offset collides: max doc_id $maxId >= 100000")
      val corpus = docs.unionAll(docs.select(
        (col("doc_id") + 100000L).as("doc_id"),
        concat(lit("EDITED:"), col("text")).as("text")))
      val ch = CdcChunk.chunks(corpus, "doc_id", "text")
      val counts = ch.groupBy(col("chunk_md5"))
        .agg(countDistinct(col("id")).as("n_docs"))
      ch.join(counts, Seq("chunk_md5"))
        .filter(col("id") < 100000L)
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("n_docs") >= 2, 1L).otherwise(0L))
            .as("shared_chunks"),
          sum(when(col("n_docs") >= 2, col("chunk_len")).otherwise(0L))
            .as("shared_chars"))
        .select(col("id").as("doc_id"), col("n_chunks"),
          col("shared_chunks"), col("shared_chars"))
        .orderBy(col("doc_id"))
    }),

    "q_d12_cdc_delta" -> ((s, dir) => {
      // streaming CDC delta dedup (r11, L95; VERDICT r10 #6): q_m7's
      // two-phase admit protocol at CHUNK granularity — docs < 250 seed
      // the digest history through the batch kernel, docs >= 250 are
      // admitted only if >= 50% of their distinct chunk digests are
      // unseen (history + conservative smaller-id batch owners). The
      // oracle replays both phases from the generated Horner chunk CTEs.
      val hist = s"${System.getProperty("java.io.tmpdir")}/graft_d12_hist_" +
        java.util.UUID.randomUUID().toString.take(8)
      val docs = t(s, dir, "documents")
      // finally-guarded so a failed phase can't leak the staging dir
      // into tmp across repeated bench/verify runs (ADVICE r11)
      try {
        graft.streaming.StreamingCdcDedup.dedupBatch(
          docs.filter(col("doc_id") < 250), hist, batchId = 0L)
        graft.streaming.StreamingCdcDedup.dedupBatch(
          docs.filter(col("doc_id") >= 250), hist, batchId = 1L)
        s.read.parquet(s"$hist/admitted")
          .select(col("id").as("doc_id")).localCheckpoint()
          .orderBy(col("doc_id"))
      } finally {
        val p = new Path(hist)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    "q_d13_containment" -> ((s, dir) => {
      // containment-similarity join (r12, L125; VERDICT r11 #5): the
      // asymmetric C(A→B) = |A∩B|/|A| ≥ 0.8 quote-inclusion detector —
      // symmetric Jaccard (q_d9) scores a short doc inside a long one
      // LOW; containment scores it 1.0. Fixture makes the gap live via
      // the q_d11 doubled-corpus trick: every 5th doc contributes a
      // 15-token "quote" at id+100000 whose shingles are a SUBSET of
      // its source's — containment exactly 1.0 quote→source, far below
      // threshold in reverse. The oracle replays the same construction
      // exhaustively (all directed pairs — quadratic by design, the
      // q_d2 precedent: skip at sf0.1).
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      require(maxId < 100000L,
        s"q_d13 quote-corpus offset collides: max doc_id $maxId >= 100000")
      val quotes = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          array_join(slice(TextAnalysis.tokens(col("text")), 1, 15), " ")
            .as("text"))
      SetSimJoin.containmentPairs(docs.unionAll(quotes), "doc_id", "text",
          shingleLen = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "q_d14_eval_decontaminate" -> ((s, dir) => {
      // containment-based eval decontamination (r12, L130; the Brown
      // et al. 2020 / Gao et al. n-gram decontamination generalized to
      // set containment via the L125 machinery's two-frame form): an
      // eval item is CONTAMINATED when ≥ 80% of its shingles are
      // contained in some training document. The eval set is
      // synthesized as 15-token quotes of every 25th doc at id+100000
      // — leaked items BY CONSTRUCTION, so the detector's recall is
      // directly visible (every quote must surface against its source,
      // plus any near-dups of the source). The probe side is bounded,
      // so the directed oracle is |eval|×|corpus|, NOT quadratic —
      // fully oracled at all three SFs, unlike q_d13.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      require(maxId < 100000L,
        s"q_d14 eval-id offset collides: max doc_id $maxId >= 100000")
      val eval = docs.filter(pmod(col("doc_id"), lit(25)) === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          array_join(slice(TextAnalysis.tokens(col("text")), 1, 15), " ")
            .as("text"))
      SetSimJoin.containmentJoin(eval, docs, "doc_id", "text",
          shingleLen = 3, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "q_d10_exact_substr" -> ((s, dir) =>
      // corpus-global ExactSubstr dedup (r9, L76; Lee et al. 2022,
      // arXiv:2107.06499): every duplicated >= 8-token run is removed
      // from all but its canonical min-(doc, pos) occurrence via
      // windowed-gram coverage — the run-level gap L45's unit dedup and
      // L42's per-pair max-shared-run both leave open; md5 pins the
      // exact rebuilt text per document
      ExactSubstr.dedupSubstrings(t(s, dir, "documents"), "doc_id",
          "text", minRun = 8)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_removed"),
          md5(col("text").cast("binary")).as("dedup_md5"))
        .orderBy(col("doc_id"))),
    "q_d6_delta_neardup" -> ((s, dir) => {
      // incremental (delta) near-dup ingestion — the batch-backfill form
      // of the streaming admit pipeline: docs < 250 build the admitted
      // history, docs >= 250 arrive as the new batch and are admitted
      // only if near-dup of neither an admitted history doc nor a
      // smaller-id batch doc. Result = the final admitted corpus read
      // back from the history store. The oracle replays BOTH phases
      // exhaustively (conservative family drop: a smaller-id batch doc
      // blocks even when itself dropped).
      val hist = s"${System.getProperty("java.io.tmpdir")}/graft_d6_hist_" +
        java.util.UUID.randomUUID().toString.take(8)
      val docs = t(s, dir, "documents")
      // pin the tiny id set in memory, then drop the staging dir so a
      // repeat-run bench doesn't accumulate history copies in tmp —
      // finally-guarded so a failed phase can't leak it either
      try {
        graft.streaming.StreamingNearDup.dedupBatch(
          docs.filter(col("doc_id") < 250), hist, batchId = 0L)
        graft.streaming.StreamingNearDup.dedupBatch(
          docs.filter(col("doc_id") >= 250), hist, batchId = 1L)
        s.read.parquet(s"$hist/shingles")
          .select(col("id").as("doc_id")).localCheckpoint()
          .orderBy(col("doc_id"))
      } finally {
        val p = new Path(hist)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),

    // --------------------------------------------------------- similarity
    "q_v8_kmeans" -> ((s, dir) =>
      // distributed quantized Lloyd (r9, L77): 8 clusters, 3 integer
      // rounds from smallest-id seeds — the whole recurrence (squared
      // distances, struct-min argmin, pmod-floor centroid means) is
      // exact BIGINT, so assignment AND squared distance replay digit
      // -exact; KMeansLloyd.oracleCtes generates the unrolled oracle
      // from the same (k, rounds), the KCore generator discipline
      KMeansLloyd.fit(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 8, rounds = 3)
        .orderBy(col("vec_id"))),
    "q_v21_conformal_bound" -> ((s, dir) => {
      // split-conformal upper bound + coverage audit (r13, L140;
      // Papadopoulos 2002, Vovk 2005, Lei 2018): per lang, the
      // ⌈(n+1)·0.9⌉-th smallest calibration n_chars is a
      // distribution-free 90% upper bound for exchangeable new docs —
      // calibrated on the even-doc_id split, audited on the odd split,
      // where coverage must land near (and, per the guarantee, in
      // expectation at least) 0.9. The exact ceiling-rank arithmetic
      // and the coverage count both replay in the oracle.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull
          && col("lang").isNotNull)
      val calib = d.filter(pmod(col("doc_id"), lit(2L)) === 0L)
      val test = d.filter(pmod(col("doc_id"), lit(2L)) === 1L)
      Conformal.coverage(test,
          Conformal.splitThreshold(calib, "lang", "n_chars", 100000L),
          "lang", "n_chars")
        .orderBy(col("lang"))
    }),
    "q_v22_auc" -> ((s, dir) => {
      // exact ROC-AUC via the rank-sum identity (r14, L158; Hanley &
      // McNeil 1982: AUC = U/(n₊n₋), ties at half weight) — the
      // classifier-quality audit next to q_v13's threshold metrics,
      // computed WITHOUT picking a threshold. Two legs, the q_e26
      // design: "zh_len" scores lang='zh' by n_chars (zh length sits
      // OFF the pooled rest — AUC 0.465 at sf0.1, below chance, and
      // the carried-over Mann–Whitney z² = 9.47 flags it); "aa_null"
      // labels by
      // doc_id parity (exchangeable → AUC ≈ 0.5, no flag). One exact
      // integral division atop the q_qr16 doubled-midrank machinery.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull
          && col("lang").isNotNull)
      val zh = d.select(lit("zh_len").as("leg"),
        (col("lang") === "zh").cast("long").as("y"), col("n_chars"))
      val aa = d.select(lit("aa_null").as("leg"),
        pmod(col("doc_id"), lit(2L)).as("y"), col("n_chars"))
      RankTest.auc(zh.unionByName(aa), "leg", "y", "n_chars")
        .orderBy(col("leg"))
    }),
    "q_v20_rater_kappa" -> ((s, dir) => {
      // Cohen's κ rater-agreement audit (r13, L138; Cohen 1960): the
      // chance-corrected label-quality statistic an RLHF-era pipeline
      // runs over its annotators — here over two HEURISTIC raters, the
      // battery's deterministic stand-ins. Two legs, the q_e26 design:
      // "len_vs_tok" (global exact-tercile labels of n_chars vs
      // whitespace-token count — two length-family raters; κ lands
      // high but < 10⁶ since word lengths vary) and "random_vs_len"
      // (doc_id % 3 in the SAME t0/t1/t2 label space vs the length
      // tercile — independent by construction; κ ≈ 0, and the shared
      // alphabet keeps the diagonal a real coincidence count, not a
      // vacuous zero). Both regimes live at every SF and the
      // independent leg guards the chance correction itself. Tercile
      // cuts are the exact lower-quantile rank picks (the
      // groupedQuantiles convention), κ is one exact LONG rational —
      // the oracle replays cuts, labels, confusion and κ
      // digit-for-digit.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull
          && col("n_chars").isNotNull)
      val sig = d.select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tok"))
      def cuts2(valueCol: String, a: String, b: String) =
        MedianImpute.groupedQuantiles(
            sig.withColumn("__g", lit("all")), "__g", valueCol,
            Seq(333333L, 666667L))
          .agg(max(when(col("p_e6") === 333333L, col("v"))).cast("long")
            .as(a),
            max(when(col("p_e6") === 666667L, col("v"))).cast("long")
              .as(b))
      def ter(v: org.apache.spark.sql.Column,
          c1: org.apache.spark.sql.Column,
          c2: org.apache.spark.sql.Column) =
        when(v > c2, "t2").when(v > c1, "t1").otherwise("t0")
      val labeled = sig
        .crossJoin(broadcast(cuts2("n_chars", "cc1", "cc2"))) // 1-row
        .crossJoin(broadcast(cuts2("n_tok", "tc1", "tc2")))   // stats
        .select(col("lang"),
          ter(col("n_chars"), col("cc1"), col("cc2")).as("ra_len"),
          ter(col("n_tok"), col("tc1"), col("tc2")).as("rb_tok"),
          concat(lit("t"), pmod(col("doc_id"), lit(3L))).as("rc_rand"))
      Agreement.cohenKappa(labeled, "lang", "ra_len", "rb_tok")
        .withColumn("pair", lit("len_vs_tok"))
        .unionByName(
          Agreement.cohenKappa(labeled, "lang", "rc_rand", "ra_len")
            .withColumn("pair", lit("random_vs_len")))
        .select(col("pair"), col("lang"), col("n_items"), col("n_agree"),
          col("po_e6"), col("pe_e6"), col("kappa_e6"))
        .orderBy(col("pair"), col("lang"))
    }),
    "q_v19_embedding_outliers" -> ((s, dir) => {
      // embedding-space outlier audit (r12, L131): the cleaning pass
      // behind SemDeDup-style curation — per k-means cluster, the exact
      // p95 of the (already exact-integer) squared distance to the
      // centroid, and how many vectors sit beyond it. Composes L77's
      // digit-exact Lloyd assignment with L71-family exact grouped
      // quantiles (same div(p·(n−1), 1e6) rank convention); dist_q ≤
      // 2.6e14 so the quantile machinery's double pass-through is exact
      // (< 2^53). The oracle nests the generated k-means replay and
      // re-ranks per cluster.
      val asg = KMeansLloyd.fit(t(s, dir, "embeddings"), "vec_id",
        "embedding", k = 8, rounds = 3)
      val p95 = MedianImpute.groupedQuantiles(asg, "cluster", "dist_q",
          Seq(950000L))
        .select(col("cluster"), col("v").cast("long").as("p95_dist_q"))
      asg.join(p95, "cluster")
        .groupBy(col("cluster"), col("p95_dist_q"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(when(col("dist_q") > col("p95_dist_q"), 1L).otherwise(0L))
            .as("n_outliers"))
        .select(col("cluster"), col("n_vectors"), col("p95_dist_q"),
          col("n_outliers"))
        .orderBy(col("cluster"))
    }),
    "q_v7_class_centroids" -> ((s, dir) =>
      // exact per-label centroids (r8): quantize-once integer floor-means
      // — the engine-portable form of the float mean no engine pair can
      // agree on bit-wise; negative-safe pmod floor division
      Similarity.classCentroids(t(s, dir, "embeddings"), "label")
        .orderBy(col("label"), col("dim"))),

    "q_v1_cosine_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
          e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5), k = 3)
        .orderBy(col("query_id"), col("rank"))
    }),
    "q_v15_matryoshka_audit" -> ((s, dir) => {
      // Matryoshka truncation audit (r11, L101): top-5 neighbor
      // overlap between prefix-truncated cosine (dims 8/16/32) and the
      // full 64-dim ranking — the measurement behind serve-truncated /
      // rerank-full deployments. Exhaustively replayed per dim.
      val e = t(s, dir, "embeddings")
      Similarity.matryoshkaAudit(
          e.filter(col("vec_id") < 20), e.filter(col("vec_id") >= 20),
          k = 5, dims = Seq(8, 16, 32))
        .orderBy(col("trunc_dim"), col("query_id"))
    }),
    "q_e22_doremi_weights" -> ((s, dir) =>
      // DoReMi-style domain reweighting (r12, L129; Xie et al. 2023,
      // arXiv:2305.10429 — the offline static-loss variant): per-source
      // excess perplexity (the battery's own integer NLL surface) fed
      // through 4 exponentiated-gradient rounds with Hamilton
      // renormalization and uniform smoothing, then a token budget
      // allocated by the final weights. The ONE float per domain (the
      // exp step multiplier) is quantized immediately; rounds are
      // BigInt driver arithmetic on the 20-source grid, and the oracle
      // GENERATED from the same (eta, c, rounds, budget) replays the
      // identical HUGEINT recurrence (the IvfPq/j13 discipline).
      Doremi.weights(t(s, dir, "documents"), "source", "doc_id", "text",
          etaE6 = 3000000L, smoothingE6 = 200000L, rounds = 4,
          budget = 1000000L)
        .orderBy(col("source"))),
    "q_v18_bitext_margin" -> ((s, dir) => {
      // margin-based bitext mining (r12, L126; Artetxe & Schwenk 2019
      // "ratio" margin — the CCMatrix/LASER extraction rule): the
      // corpus splits into two "languages" by vec_id parity (the q_t30
      // split-train trick), queries are the fixed eval slice
      // (vec_id < 200 — same 100 queries at every SF, the L101
      // bounded-measurement pattern), k = 4 neighborhoods both
      // directions, and each query's best-margin candidate is kept
      // when margin > 1.04 (the paper's operating band). Forward AND
      // backward top-k are replayed exhaustively by the oracle.
      val e = t(s, dir, "embeddings")
      val src = e.filter(pmod(col("vec_id"), lit(2)) === 0)
      val tgt = e.filter(pmod(col("vec_id"), lit(2)) === 1)
      Similarity.bitextMarginMine(src.filter(col("vec_id") < 200),
          src, tgt, k = 4, marginE6 = 1040000L)
        .orderBy(col("src_id"))
    }),
    "q_v14_hard_negatives" -> ((s, dir) => {
      // contrastive triplet mining (r11, L99): per anchor (vec_id <
      // 50), the nearest ≥0.45 neighbor is the positive and the
      // nearest <0.45 neighbor the hard negative — the DPR/SimCSE
      // batch-construction step; 0.45 is the battery's proven-parity
      // dedup threshold, so pos = near-duplicate, neg = maximally
      // confusable non-duplicate. One struct-extreme per side, no
      // per-anchor window.
      val e = t(s, dir, "embeddings")
      Similarity.hardNegatives(e.filter(col("vec_id") < 50), e,
          posThreshold = 0.45)
        .orderBy(col("query_id"))
    }),
    "q_v13_pca_pc1" -> ((s, dir) =>
      // distributed PCA, top principal component (r11, L96): exact
      // integer second-moment grid in ONE kernel pass, centered scatter
      // + 8 power iterations on the driver's 64×64 grid, per-doc
      // projection onto the resulting axis. The oracle recomputes the
      // moments and unrolls the identical iteration recurrence.
      Pca.projectPc1(t(s, dir, "embeddings"), "vec_id", "embedding",
          rounds = 8)
        .orderBy(col("vec_id"))),
    // ANN recall reports (r8, VERDICT r7 #4): each approximate index is
    // now DRIVER-gated, not just spec-measured. Output per query:
    // (query_id, exact_kth_sim, recall_ok) — exact_kth_sim is the k-th
    // exact-cosine similarity (a pure function of the data, recomputed
    // independently by the DuckDB oracle), recall_ok the aggregate
    // verdict `Σ per-query |ANN ∩ exact top-k| >= floor` that the
    // oracle declares TRUE. A recall regression under ANY future data
    // regeneration flips the boolean and reds the driver gate. Floors
    // sit well under measured totals (LSH 10/15, IVF 7/15 at sf0.01;
    // aggregate because per-query recall legitimately hits 0 on a
    // worst-case query while the index stays healthy). The top-k LISTS
    // remain spec-tested (SimilaritySpec, AnnRecallProbe).
    "q_v2_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      annRecallReport(s,
        Similarity.lshTopK(
          e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5), k = 3),
        e, minHits = 7L)
    }),
    "q_v4_ann_ivf" -> ((s, dir) => {
      // IVF inverted-list ANN — the second scale-path family next to LSH
      // (north star: "an IVF or LSH-bucketed variant")
      val e = t(s, dir, "embeddings")
      annRecallReport(s,
        Similarity.ivfTopK(
          e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5), k = 3),
        e, minHits = 4L)
    }),
    "q_v6_ann_ivf_quantized" -> ((s, dir) => {
      // IVF over int8-coded inverted lists with float re-rank of the
      // top candidates (VERDICT r6 #5) — the volume path moves 1-byte
      // codes, fp32 touched only for rerank×|queries| rows;
      // rerank-covers-corpus equality pinned in SimilaritySpec
      val e = t(s, dir, "embeddings")
      annRecallReport(s,
        Similarity.ivfTopKQuantized(
          e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5), k = 3),
        e, minHits = 4L)
    }),
    "q_v9_ann_ivfpq" -> ((s, dir) => {
      // IVF-PQ (r10, VERDICT r9 #3): the canonical 100 TB ANN layout —
      // KMeansLloyd coarse lists (the corpus-scale distributed trainer,
      // not a driver-side sample), m=8 product-quantized blocks scored
      // by ADC lookup tables, float rerank of the top 64. Floor 5 of 15
      // sits under measured hits 11/10/7 at sf0.001/0.01/0.1 (isotropic
      // worst case; AnnRecallProbe reproduces). The codebook fit itself
      // is digit-exact replayed by q_v10's generated oracle. Residual
      // (IVFADC) encoding since r10's second pass: codes encode
      // x − coarse_centroid, lifting the worst-case gate hits from
      // 11/10/7 (raw) to 9/10/11 across sf0.001/0.01/0.1 — the floor
      // keeps its margin at every scale; the residual fit replays in
      // q_v11's generated oracle.
      val e = t(s, dir, "embeddings")
      annRecallReport(s,
        IvfPq.ivfPqTopK(
          e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
          k = 3, nlist = 16, nprobe = 8, m = 8, rerank = 64,
          residual = true),
        e, minHits = 5L)
    }),
    "q_v12_ann_mips" -> ((s, dir) => {
      // MIPS (r10, L91): retrieval by RAW inner product — the scoring
      // of un-normalized learned embeddings, where cosine's
      // normalization changes the ranking. Candidates via the
      // norm-augmentation reduction (SIMPLE-LSH): corpus lifted onto
      // the unit sphere with one extra coordinate, bucketed by the
      // SAME sign-LSH machinery as q_v2, scored by the raw dot on the
      // original vectors (augmentation never leaves candidate-gen).
      // Floor 5/15 under measured hits (see SURVEY L91 row).
      val e = t(s, dir, "embeddings")
      mipsRecallReport(s,
        Similarity.mipsLshTopK(
          e.filter(col("vec_id") < 5), e.filter(col("vec_id") >= 5),
          k = 3),
        e, minHits = 5L)
    }),
    "q_v11_pq_residual_codes" -> ((s, dir) => {
      // the residual (IVFADC) code table (r10): coarse KMeansLloyd
      // assignment → integer residual → per-block Lloyd — the whole
      // two-stage fit replayed by IvfPq.residualOracleSql from the
      // same (nlist, coarseRounds, m, sub, ksub, rounds)
      val emb = t(s, dir, "embeddings")
      val coarse = KMeansLloyd.fitModel(emb, "vec_id", "embedding",
        k = 8, rounds = 2)
      IvfPq.fitPqResidual(emb, "vec_id", "embedding", coarse,
          m = 8, ksub = 8, rounds = 2)
        .codes.orderBy(col("vec_id"), col("block"))
    }),
    "q_v10_pq_codes" -> ((s, dir) =>
      // the product-quantizer code table (r10): m=8 blocks × ksub=8
      // centroids × 2 Lloyd rounds over the corpus — every (vec_id,
      // block) row carries the assigned code AND its exact integer
      // squared distance; IvfPq.pqOracleSql GENERATES the per-block
      // unrolled DuckDB replay from the same parameters (the q_v8
      // generator discipline applied to the PQ fit)
      IvfPq.fitPq(t(s, dir, "embeddings"), "vec_id", "embedding",
          m = 8, ksub = 8, rounds = 2)
        .codes.orderBy(col("vec_id"), col("block"))),
    "q_v3_norm_stats" -> ((s, dir) =>
      Similarity.normStats(t(s, dir, "embeddings"), "label")
        .orderBy(col("label"))),

    // --------------------------------------------------------- multimodal
    "q_m5_blob_dedup" -> ((s, dir) => {
      // exact binary-payload dedup (r8): q_d1's content dedup on the
      // MULTIMODAL surface — doubled corpus packed to blobs, one keeper
      // (min id) per content fingerprint, copy count carried; at 100 TB
      // the groupBy ships 16-byte fingerprints, never payloads
      val docs = t(s, dir, "documents")
      Multimodal.packBinary(docs.unionAll(docs), "doc_id", "text")
        .groupBy(col("meta.checksum").as("blob_md5"))
        .agg(min(col("doc_id")).as("keeper"),
          count(lit(1)).as("n_copies"),
          max(col("meta.n_bytes")).as("n_bytes"))
        .orderBy(col("keeper"))
    }),
    "q_m8_magic_sniff" -> ((s, dir) => {
      // magic-byte media-type sniff + declared-vs-sniffed audit (r13,
      // L145): deterministic blobs built by prepending REAL magic
      // numbers (PNG/JPEG/GIF89a/RIFF-WAVE/BMP/PDF/ZIP, one plain
      // variant) to each doc's text bytes; the DECLARED label is
      // correct except every 5th doc claims image/png — so the audit
      // must surface exactly the injected mislabelings. The oracle
      // rebuilds the same blobs (unhex || encode) and replays every
      // prefix rule over the hex rendering.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val v = pmod(col("doc_id"), lit(8L))
      val prefixes = Seq("89504E470D0A1A0A", "FFD8FFE000104A46",
        "474946383961", "524946460000000057415645", "424D760200",
        "255044462D312E34", "504B03041400", "")
      val labels = Seq("image/png", "image/jpeg", "image/gif",
        "audio/wav", "image/bmp", "application/pdf", "application/zip",
        "application/octet-stream")
      val blob = (0 until 8).map(i =>
          (v === i.toLong, if (prefixes(i).isEmpty)
            col("text").cast("binary")
          else concat(unhex(lit(prefixes(i))), col("text").cast("binary"))))
        .foldLeft(when(lit(false), lit(null).cast("binary"))) {
          case (acc, (cond, b)) => acc.when(cond, b)
        }
      val declared = (0 until 8).map(i => (v === i.toLong, labels(i)))
        .foldLeft(when(lit(false), lit(null).cast("string"))) {
          case (acc, (cond, l)) => acc.when(cond, lit(l))
        }
      val packed = d.select(col("doc_id"), blob.as("content"),
        when(pmod(col("doc_id"), lit(5L)) === 0L, lit("image/png"))
          .otherwise(declared).as("declared"))
      Multimodal.declaredMismatch(packed, "declared")
        .orderBy(col("declared"), col("sniffed"))
    }),
    "q_m13_mp3_metadata" -> ((s, dir) => {
      // MP3/ID3v2 header audit (r15, L176): the audio sibling of
      // q_m9's box walk — synthetic MPEG1-Layer-III heads whose ID3
      // tag length (id % 23, present for id % 3 ≠ 0) and inter-tag
      // zero padding (id % 5) shift the frame sync to a
      // DATA-DEPENDENT offset; bitrate/samplerate/channel-mode all
      // derive from doc_id; every 11th doc writes bitrate index 15
      // ("bad") and every 13th breaks the sync byte — both violation
      // legs live. The oracle replays the generator formulas — the
      // bounded sync scan must invert the construction exactly.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val packed = d.select(col("doc_id"),
        Mp3Header.syntheticMp3(col("doc_id")).as("content"))
      Mp3Header.metadata(packed, "doc_id", "content")
        .groupBy(col("mpeg_version"), col("layer"), col("channels"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("id3_size")).as("sum_id3"),
          sum(col("bitrate_kbps")).as("sum_kbps"),
          sum(col("sample_rate")).as("sum_rate"))
        .orderBy(col("mpeg_version"), col("layer"), col("channels"))
    }),
    "q_m14_audio_quality" -> ((s, dir) => {
      // audio quality audit over REAL WAV decode (r15, L177): peak /
      // clipping / silence on the mono mix — and, unlike the
      // spec-gated energy fingerprint, ORACLE-ABLE: the synthetic
      // 16-bit PCM payload is a closed-form square wave, so the
      // metrics replay as formulas while javax.sound.sampled must
      // invert the 44-byte canonical WAV header byte-for-byte.
      // All-silent (id%33=0), all-clipped (id%33=32) and truncated
      // (id%23=0) legs live at gate scale.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val packed = d.select(col("doc_id"),
        Multimodal.syntheticWav(col("doc_id")).as("content"))
      Multimodal.audioQualityAudit(packed, "doc_id", "content")
        .groupBy(col("sample_rate"), col("channels"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_frames")).as("sum_frames"),
          sum(col("peak")).as("sum_peak"),
          sum(col("n_clipped")).as("sum_clipped"),
          sum(col("n_silent")).as("sum_silent"),
          count(when(col("n_clipped") > 0L, 1)).as("n_clip_docs"),
          count(when(col("n_silent") === col("n_frames"), 1))
            .as("n_silent_docs"))
        .orderBy(col("sample_rate"))
    }),
    "q_m9_mp4_metadata" -> ((s, dir) => {
      // MP4/ISO-BMFF container-metadata audit (r14, L149): deterministic
      // synthetic MP4s built per doc as EXPRESSIONS (the q_m8 unhex
      // discipline) — brand, mvhd version (v0 32-bit / v1 64-bit
      // duration), timescale, duration, track count, per-track stsd
      // codec fourcc, and a variable-length free box all derived from
      // doc_id, so box OFFSETS vary per doc and a layout-assuming
      // parser fails. IsoBmff.metadata walks the real bytes back to
      // the parameters; the oracle replays the generator formulas —
      // the parse must invert the construction exactly (a STRONGER
      // gate than hex slicing: every varying field round-trips).
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val packed = d.select(col("doc_id"),
        IsoBmff.syntheticMp4(col("doc_id")).as("content"))
      IsoBmff.metadata(packed, "doc_id", "content")
        .groupBy(col("major_brand"), col("n_tracks"), col("codecs"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("duration_ms")).as("sum_dur_ms"),
          sum(col("timescale")).as("sum_ts"))
        .orderBy(col("major_brand"), col("n_tracks"), col("codecs"))
    }),
    "q_m16_ogg_metadata" -> ((s, dir) => {
      // Ogg/Opus+Vorbis container-metadata audit (r16, L194; RFC
      // 3533/7845): the audio-container closure beside MP3/ID3 (m13)
      // and WAV (m14) — crawl audio is predominantly Ogg. All
      // integers LITTLE-endian (the BMFF/EBML walks are big-endian —
      // both byte disciplines exercised). THREE routes live: every
      // 11th doc a TXT decoy the sniffer keeps from the walk, every
      // 13th a TRUNCATED page header that sniffs audio/ogg but
      // surfaces as the NULL-metadata violation row, the rest
      // two-page streams the walk inverts back to the generator
      // formulas — incl. the Opus-vs-Vorbis granule-clock split
      // (Opus durations run on 48 kHz net of pre-skip whatever the
      // input rate; Vorbis on the stream rate). Checkpointed before
      // routing (the q_m10 pushdown-inlining lesson).
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val full = Ogg.syntheticOgg(col("doc_id"))
      val blob = when(pmod(col("doc_id"), lit(11L)) === 0L,
          col("text").cast("binary"))
        .when(pmod(col("doc_id"), lit(13L)) === 0L,
          substring(full, 1, 20))
        .otherwise(full)
      val packed = d.select(col("doc_id"), blob.as("content"))
        .localCheckpoint()
      val routed = packed
        .filter(Multimodal.sniffType(col("content")) === "audio/ogg")
      Ogg.metadata(routed, "doc_id", "content")
        .groupBy(col("codec"), col("channels"), col("sample_rate"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("duration_ms")).as("sum_dur_ms"),
          sum(col("n_pages")).as("sum_pages"))
        .orderBy(col("codec"), col("channels"), col("sample_rate"))
    }),
    "q_m17_flac_metadata" -> ((s, dir) => {
      // FLAC container-metadata audit (r17, L202; RFC 9639): the
      // lossless-audio closure beside Ogg (m16), MP3 (m13) and WAV
      // (m14) — all integers BIG-endian where Ogg is little-endian,
      // so both byte disciplines stay exercised. THREE routes live:
      // every 11th doc a TXT decoy the sniffer keeps from the walk,
      // every 13th a TRUNCATED STREAMINFO that sniffs audio/flac but
      // surfaces as the NULL-metadata violation row, the rest full
      // streams the walk inverts back to the generator formulas
      // (112-way rate×channels×bps×samples grid + 0–2 trailing
      // padding blocks). Checkpointed before routing (the q_m10
      // pushdown-inlining lesson).
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val full = Flac.syntheticFlac(col("doc_id"))
      val blob = when(pmod(col("doc_id"), lit(11L)) === 0L,
          col("text").cast("binary"))
        .when(pmod(col("doc_id"), lit(13L)) === 0L,
          substring(full, 1, 20))
        .otherwise(full)
      val packed = d.select(col("doc_id"), blob.as("content"))
        .localCheckpoint()
      val routed = packed
        .filter(Multimodal.sniffType(col("content")) === "audio/flac")
      Flac.metadata(routed, "doc_id", "content")
        .groupBy(col("channels"), col("bits_per_sample"),
          col("sample_rate"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("duration_ms")).as("sum_dur_ms"),
          sum(col("n_blocks")).as("sum_blocks"))
        .orderBy(col("channels"), col("bits_per_sample"),
          col("sample_rate"))
    }),
    "q_m15_webm_metadata" -> ((s, dir) => {
      // WebM/Matroska EBML container-metadata audit (r16, L186;
      // VERDICT r15 #6 — the q_m9 discipline on the EBML surface,
      // closing the last JDK-only multimodal gap: crawl video is
      // predominantly WebM): synthetic containers whose element
      // OFFSETS vary per doc (Void filler 0–7 bytes, variable
      // DocType/codec lengths), with THREE routes live — every 11th
      // doc a TXT decoy the sniffer must keep away from the walk,
      // every 13th (non-11th) doc a TRUNCATED header that sniffs
      // video/webm but must surface as the NULL-metadata violation
      // row, the rest full containers the walk inverts back to the
      // generator formulas. duration_ms is the family's ONE double
      // quantization (EBML Duration is a float by spec) — timescales
      // are quarters of a µs so both engines land on exact longs.
      // The packed frame is checkpointed before routing (the q_m10
      // lesson, applied from day one): predicate pushdown otherwise
      // inlines the blob expression into every sniff CASE branch and
      // overruns the 64 KB codegen limit; blobs are table DATA when
      // routed in production anyway.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val full = Ebml.syntheticWebm(col("doc_id"))
      val blob = when(pmod(col("doc_id"), lit(11L)) === 0L,
          col("text").cast("binary"))
        .when(pmod(col("doc_id"), lit(13L)) === 0L,
          substring(full, 1, 6))
        .otherwise(full)
      val packed = d.select(col("doc_id"), blob.as("content"))
        .localCheckpoint()
      val routed = packed
        .filter(Multimodal.sniffType(col("content")) === "video/webm")
      Ebml.metadata(routed, "doc_id", "content")
        .groupBy(col("doc_type"), col("n_tracks"), col("codecs"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("duration_ms")).as("sum_dur_ms"),
          sum(col("timescale")).as("sum_ts"))
        .orderBy(col("doc_type"), col("n_tracks"), col("codecs"))
    }),
    "q_m12_jpeg_dims" -> ((s, dir) => {
      // JPEG SOF dimension walk (r14, L161): the kernel-shaped sibling
      // of q_m11's fixed-offset slices — synthetic JPEG segment soup
      // whose APP0 padding and COM length vary per doc_id, so the SOF
      // marker sits at a DATA-DEPENDENT offset and a layout-assuming
      // parser fails; every 9th doc puts SOS before any SOF (dims
      // must precede entropy data → NULL, the violation leg live at
      // gate scale). The oracle replays the generator formulas — the
      // walk must invert the construction (the q_m9 gate).
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val w = lit(16L) + pmod(col("doc_id"), lit(101L)) * 7L
      val h = lit(16L) + pmod(expr("doc_id DIV 101"), lit(53L)) * 12L
      def hex4(v: org.apache.spark.sql.Column) = lpad(hex(v), 4, "0")
      val app0 = concat(lit("FFE0"),
        hex4(pmod(col("doc_id"), lit(7L)) + 16L),
        expr("repeat('00', cast(pmod(doc_id, 7) + 14 as int))"))
      val comSeg = concat(lit("FFFE"),
        hex4(pmod(expr("doc_id DIV 7"), lit(5L)) + 2L),
        expr("repeat('41', cast(pmod(doc_id DIV 7, 5) as int))"))
      val sof = concat(lit("FFC0001108"), hex4(h), hex4(w),
        lit("03011100021101031101"))
      val sosDecoy = when(pmod(col("doc_id"), lit(9L)) === 0L,
        lit("FFDA00080101010100003F00")).otherwise(lit(""))
      val blob = unhex(concat(lit("FFD8"), app0, comSeg, sosDecoy,
        sof, lit("FFD9")))
      ImageHeaders.jpegDimsOf(
          d.select(col("doc_id"), blob.as("content")), "doc_id",
          "content")
        .groupBy(col("width").isNotNull.cast("long").as("parsed"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("width")).as("sum_w"),
          sum(col("height")).as("sum_h"),
          count(when(col("width") < 512L || col("height") < 512L, 1))
            .as("n_small"))
        .orderBy(col("parsed"))
    }),
    "q_m11_dims_audit" -> ((s, dir) => {
      // image-resolution header audit (r14, L160): the pre-decode
      // resolution screen — dims parsed from ≤26 HEADER bytes as a
      // pure codegen'd slice (PNG IHDR big-endian, GIF descriptor
      // little-endian, BMP signed little-endian with the top-down
      // negative-height leg live every 4th bmp), routed by the shared
      // q_m8 sniffer; every 11th doc carries a TXT decoy that lands in
      // 'other' with NULL dims. Blobs are built per doc as expressions
      // with dims DERIVED from doc_id (the q_m9 discipline), so the
      // oracle replays the generator FORMULAS and the parse must
      // invert the construction byte-exactly.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val w = lit(16L) + pmod(col("doc_id"), lit(97L)) * 13L
      val h = lit(16L) + pmod(expr("doc_id DIV 97"), lit(89L)) * 11L
      val td = pmod(expr("doc_id DIV 3"), lit(4L)) === 0L
      def be4(v: org.apache.spark.sql.Column) =
        unhex(lpad(hex(v), 8, "0"))
      def le2(v: org.apache.spark.sql.Column) = {
        val x = lpad(hex(v), 4, "0")
        unhex(concat(substring(x, 3, 2), substring(x, 1, 2)))
      }
      def le4(v: org.apache.spark.sql.Column) = {
        val x = lpad(hex(v), 8, "0")
        unhex(concat(substring(x, 7, 2), substring(x, 5, 2),
          substring(x, 3, 2), substring(x, 1, 2)))
      }
      val png = concat(
        unhex(lit("89504E470D0A1A0A0000000D49484452")),
        be4(w), be4(h), unhex(lit("0806000000")))
      val gif = concat(unhex(lit("474946383961")), le2(w), le2(h),
        unhex(lit("F70000")))
      val hSigned = when(td, lit(4294967296L) - h).otherwise(h)
      val bmp = concat(
        unhex(lit("424D" + "00" * 12 + "28000000")), le4(w),
        le4(hSigned))
      val r = pmod(col("doc_id"), lit(3L))
      val blob = when(pmod(col("doc_id"), lit(11L)) === 0L,
          concat(unhex(lit("5458543A")), col("text").cast("binary")))
        .when(r === 0L, png).when(r === 1L, gif).otherwise(bmp)
      ImageHeaders.resolutionAudit(
          d.select(col("doc_id"), blob.as("content")), "content", 512L)
        .orderBy(col("fmt"))
    }),
    "q_m10_codec_audit" -> ((s, dir) => {
      // declared-vs-ACTUAL codec audit (r14) — the L145+L149
      // integration, end to end: blobs ROUTE by magic sniff (the r14
      // ftyp rule; every 11th doc carries a plain-text blob that must
      // NOT reach the walk), routed containers PARSE via the box walk,
      // and the audit compares the declared codec (correct except
      // every 7th doc claims avc1) against the first stsd fourcc the
      // bytes actually carry — the q_m8 mislabel-surfacing discipline
      // one level deeper than the container type. r16 shape (VERDICT
      // r15 #1), two levers against the 64 KB codegen overrun that
      // had this stage running interpreted: (a) the declared label
      // rides THROUGH the walk kernel (metadataTagged) instead of
      // joining back — the old join evaluated the blob tree on both
      // branches; (b) the packed frame is CHECKPOINTED before
      // routing, because predicate pushdown otherwise inlines the
      // full blob expression into every branch of the sniff CASE
      // cascade (~12 copies in one generated method). The checkpoint
      // is also the production shape: real blobs are table DATA when
      // routed, never a live construction expression — the synthetic
      // build is harness-only.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val ci = pmod(expr("doc_id DIV 3"), lit(3L))
      val actualF = when(ci === 0L, "avc1").when(ci === 1L, "mp4a")
        .otherwise("hev1")
      val packed = d.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(11L)) === 0L,
          col("text").cast("binary"))
          .otherwise(IsoBmff.syntheticMp4(col("doc_id"))).as("content"),
        when(pmod(col("doc_id"), lit(7L)) === 0L, lit("avc1"))
          .otherwise(actualF).as("declared"))
        .localCheckpoint()
      val routed = packed
        .filter(Multimodal.sniffType(col("content")) === "video/mp4")
      IsoBmff.metadataTagged(routed, "doc_id", "content", "declared")
        .select(col("declared"),
          substring_index(col("codecs"), ",", 1).as("actual"))
        .groupBy(col("declared"), col("actual"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("mismatch",
          (col("declared") =!= col("actual")).cast("long"))
        .orderBy(col("declared"), col("actual"))
    }),
    "q_m7_perceptual_delta" -> ((s, dir) => {
      // incremental (delta) PERCEPTUAL ingestion (r10) — q_d6's two-phase
      // admit protocol on the multimodal surface: blobs < 250 build the
      // admitted history through the streaming batch kernel, blobs >= 250
      // arrive as the new batch and are admitted only if within Hamming 3
      // of neither an admitted history doc nor a smaller-id batch doc
      // (conservative family drop). The oracle replays both phases
      // exhaustively over the same dHashes.
      val hist = s"${System.getProperty("java.io.tmpdir")}/graft_m7_hist_" +
        java.util.UUID.randomUUID().toString.take(8)
      val docs = t(s, dir, "documents")
      // finally-guarded staging-dir drop (the q_d6/q_d12 convention)
      try {
        graft.streaming.StreamingPerceptualDedup.dedupBatch(
          docs.filter(col("doc_id") < 250), hist, batchId = 0L)
        graft.streaming.StreamingPerceptualDedup.dedupBatch(
          docs.filter(col("doc_id") >= 250), hist, batchId = 1L)
        s.read.parquet(s"$hist/hashes")
          .select(col("id").as("doc_id")).localCheckpoint()
          .orderBy(col("doc_id"))
      } finally {
        val p = new Path(hist)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }),
    "q_m6_perceptual_neardup" -> ((s, dir) =>
      // perceptual near-dup on the multimodal surface (r10, VERDICT r9
      // #4): blobs stub-decode to a 36-cell luminance grid, hash to a
      // 32-bit dHash, and Hamming-≤3 pairs are found via 4-band
      // SimHash blocking — by pigeonhole that EQUALS the exhaustive
      // all-pairs scan, which is exactly what the oracle replays
      Multimodal.perceptualNearDup(
          Multimodal.packBinary(t(s, dir, "documents"), "doc_id", "text"))
        .orderBy(col("id_a"), col("id_b"))),
    "q_m1_multimodal_profile" -> ((s, dir) =>
      Multimodal.metaProfile(
          Multimodal.packBinary(t(s, dir, "documents"), "doc_id", "text",
            keep = Seq("source")),
          "source")
        .orderBy(col("source"))),
    "q_m2_decode_stub" -> ((s, dir) => {
      import s.implicits._
      implicit val sp: SparkSession = s
      val packed = Multimodal.packBinary(
        t(s, dir, "documents").filter(col("doc_id") < 50), "doc_id", "text")
      Multimodal.extractFeatures(packed.as[MediaRecord])
        .toDF().orderBy(col("doc_id"))
    }),

    "q_m3_resize_stub" -> ((s, dir) =>
      // decode/extract/RESIZE/frame-sample set, the resize leg: binary
      // substr to the target byte budget + metadata refresh, all codegen'd
      Multimodal.resizeStub(
          Multimodal.packBinary(
            t(s, dir, "documents").filter(col("doc_id") < 50),
            "doc_id", "text"),
          targetW = 64, targetH = 48)
        .select(col("doc_id"), col("width"), col("height"),
          col("meta.n_bytes").as("out_bytes"),
          col("meta.checksum").as("out_md5"))
        .orderBy(col("doc_id"))),

    "q_m4_frame_sample" -> ((s, dir) => {
      // decode/extract/resize/FRAME-SAMPLE set, the sampling leg: every
      // stride-th fixed-size slice of the blob (codegen'd binary substr),
      // one row per sampled chunk via posexplode
      val packed = Multimodal.packBinary(
        t(s, dir, "documents").filter(col("doc_id") < 50), "doc_id", "text")
      Multimodal.sampleChunks(packed, chunkBytes = 16, stride = 4,
          maxChunks = 8)
        .select(col("doc_id"), posexplode(col("chunks")))
        .select(col("doc_id"), col("pos").as("chunk_idx"),
          md5(col("col")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // ------------------------------------- training-data shaping (events)
    "q_e1_sessionize" -> ((s, dir) => {
      // gap-based sessionization of the event stream (12 h idle gap).
      // Time rides as epoch micros (Tables.epochMicros — robust to the
      // generator's physical timestamp encoding), matching the oracle's
      // epoch_us(ts) exactly.
      // autoChunk OFF (ADVICE r6): measure the sessionize, not the
      // plan-build skew probe — q_e1x covers the chunked plan, the auto
      // path is spec-covered and measured in SCALE.md
      val ev = t(s, dir, "events")
      Sessions.sessionStats(ev, "user_id",
          Tables.epochMicros(ev, "ts"), col("event_id"),
          java.time.Duration.ofHours(12), autoChunk = false)
        .orderBy(col("user_id"), col("session_idx"))
    }),
    "q_e7_token_budget" -> ((s, dir) =>
      // fill each source to a 2000-token budget in budget-hash order —
      // mixtures are set in tokens, not document counts; the crossing
      // doc is kept (soft budget). kept_sum pins exact membership.
      Sampling.capTokensPerGroup(
          t(s, dir, "documents").withColumn("n_toks",
            TextAnalysis.tokenCount(col("text")).cast("long")),
          "source", col("doc_id"), col("n_toks"), 2000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_toks")).as("kept_tokens"),
          sum(col("doc_id")).as("kept_sum"))
        .orderBy(col("source"))),
    "q_e8_stratified_split" -> ((s, dir) =>
      // EXACT per-stratum 80/10/10 (hashSplit holds fractions only in
      // expectation — small strata drift); member_sum pins membership
      Sampling.stratifiedSplit(t(s, dir, "documents"), "source",
          col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("member_sum"))
        .orderBy(col("source"), col("split"))),
    "q_e9_dsir_select" -> ((s, dir) => {
      // DSIR importance-resampling selection (r7, L46): hashed-n-gram
      // target-vs-raw contrast scores, top 50 most English-like docs
      // under an en-target model, ties by id — per-bucket log ratios
      // quantized once to 1e-4 nats, doc totals exact BIGINT
      val docs = t(s, dir, "documents")
      Dsir.selectTopK(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", m = 1024, k = 50)
    }),
    "q_e10_gumbel_sample" -> ((s, dir) => {
      // DSIR's resampling step (r7, L47): seeded Gumbel top-k over the
      // L46 importance scores — weighted sampling without replacement,
      // deterministic via md5-derived uniforms, keys quantized to 1e-4
      val docs = t(s, dir, "documents")
      Dsir.sampleK(docs, docs.filter(col("lang") === "en"),
          "doc_id", "text", m = 1024, k = 50, seed = "r7")
        .select(col("doc_id"), col("gumbel_key_e4"))
        .orderBy(col("gumbel_key_e4").desc, col("doc_id"))
    }),
    "q_e11_temperature_mix" -> ((s, dir) =>
      // temperature-scaled language mixing (r7, L50): a 200-doc budget
      // allocated across languages ∝ n^0.5 (α = 0.5 — the sqrt path is
      // IEEE-exact cross-engine), largest-remainder seats, per-language
      // quota filled in 'cap:'-hash order. en's raw 43.6% share flattens
      // to ~30% — the low-resource boost the α rule exists for.
      // kept_sum pins exact membership, not just the quota arithmetic.
      Sampling.temperatureMixture(t(s, dir, "documents"), "lang",
          col("doc_id"), totalBudget = 200L, alpha = 0.5)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_sum"))
        .orderBy(col("lang"))),
    "q_e12_funnel" -> ((s, dir) => {
      // ordered-step funnel (r8, L57): view → click → purchase with a
      // 48 h conversion window anchored at funnel ENTRY; at sf0.01 the
      // steps count 150 → 96 → 41 — every stage bites. entity_sum pins
      // WHICH users converted, not just how many.
      val ev = t(s, dir, "events")
      Funnel.report(ev, "user_id", Tables.epochMicros(ev, "ts"),
          "event_type", Seq("view", "click", "purchase"),
          windowUs = Some(48L * 3600L * 1000000L))
        .orderBy(col("step_idx"))
    }),

    "q_e24_funnel_ttc" -> ((s, dir) => {
      // funnel time-to-convert quantiles (r12, L133): for each reached
      // step past entry, the exact p50/p90 of (step time − ENTRY time)
      // — the product-analytics question q_e12's counts don't answer
      // ("how LONG does converting take"). Composes L57's step-times
      // machinery with the exact grouped-quantile rank pick (same
      // div(p·(n−1), 1e6) convention); ttc ≤ the 48 h window in micros
      // (1.7e11 < 2^53) so the quantile machinery's double
      // pass-through is exact. The oracle extends q_e12's step-wise
      // CTE chain with the same differences and rank replay.
      val ev = t(s, dir, "events")
      val st = Funnel.stepTimes(ev, "user_id",
        Tables.epochMicros(ev, "ts"), "event_type",
        Seq("view", "click", "purchase"),
        windowUs = Some(48L * 3600L * 1000000L))
      val entry = st.filter(col("step_idx") === 1)
        .select(col("user_id"), col("t_us").as("__t1"))
      val ttc = st.filter(col("step_idx") > 1)
        .join(entry, "user_id")
        .select(col("step"), (col("t_us") - col("__t1")).as("ttc_us"))
      val counts = ttc.groupBy(col("step")).agg(count(lit(1)).as("n"))
      MedianImpute.groupedQuantiles(ttc, "step", "ttc_us",
          Seq(500000L, 900000L))
        .join(counts, "step")
        .select(col("step"), col("n"), col("p_e6"),
          col("v").cast("long").as("ttc_us"))
        .orderBy(col("step"), col("p_e6"))
    }),
    "q_e25_stationary_mix" -> ((s, dir) => {
      // stationary distribution of the transition matrix (r12, L134):
      // 6 synchronous power-iteration rounds from uniform over the
      // q_e23 matrix's ALREADY-quantized ppm cells — where the event
      // stream settles. BigInt driver rounds on the type grid with the
      // shared Hamilton renormalization; the oracle unrolls the same
      // rounds in HUGEINT from the same matrix CTEs (the Doremi
      // discipline). Σ pi_e6 = 1e6 exactly.
      val e = t(s, dir, "events")
      Transitions.stationary(
          Transitions.matrix(e, "user_id", Tables.epochMicros(e, "ts"),
            "event_id", "event_type"),
          rounds = 6)
        .orderBy(col("event_type"))
    }),
    "q_e31_logrank" -> ((s, dir) => {
      // two-sample log-rank over the q_e30 churn protocol (r14, L165;
      // Mantel 1966): "do these cohorts CHURN differently" as a test,
      // not a pair of curves to eyeball. Two panels on the purchase
      // stream: a hash-parity A/A split (exchangeable → z² ~ χ²₁,
      // null) and the entry-time cohort split (first purchase before
      // day 10 vs after — late entrants' tenures are horizon-capped,
      // the classic cohort-mix effect the test must flag).
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("user_id").isNotNull &&
        col("event_type") === "purchase")
      val dur = Survival.durations(purchases, "user_id",
        graft.Tables.epochMicros(purchases, "ts"), gapDays = 7)
      val h = pmod(conv(substring(md5(col("user_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(2L))
      val aa = dur.select(lit("aa_null").as("panel"),
        h.cast("string").as("grp"), col("tenure"), col("event"))
      val minDay = dur.agg(min(col("first_day")).as("__mind"))
      val ec = dur.crossJoin(broadcast(minDay))
        .select(lit("entry_cohort").as("panel"),
          when(col("first_day") < col("__mind") + 10L, "early")
            .otherwise("late").as("grp"), col("tenure"), col("event"))
      Survival.logRank(aa, "panel", "grp", "tenure", "event", "0", "1")
        .unionByName(Survival.logRank(ec, "panel", "grp", "tenure",
          "event", "early", "late"))
        .orderBy(col("panel"))
    }),
    "q_e30_churn_survival" -> ((s, dir) => {
      // Kaplan–Meier churn survival (r14, L163; Kaplan & Meier 1958):
      // the retention curve under RIGHT-CENSORING — users still
      // active in the stream's closing 7 days are censored, not
      // counted churned (the bias q_e8's plain cohort retention
      // cannot remove). Emitted as the exact log-survival through the
      // L151 table (its FOURTH consumer): every step an integer both
      // engines replay; censoring-only steps hold the curve exactly
      // flat; an emptied risk set ends the curve in honest NULLs.
      // The curve runs on the SPARSE purchase stream: the full stream
      // is so dense (~2 events/user/day) that every user is active in
      // the closing week and no churn exists to estimate (measured
      // before choosing the leg — gate-scale purchase churn: 55 of
      // 1500 users, 21 distinct tenures, both regimes live).
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("user_id").isNotNull &&
        col("event_type") === "purchase")
      Survival.kaplanMeier(
          Survival.durations(purchases, "user_id",
            graft.Tables.epochMicros(purchases, "ts"), gapDays = 7),
          "tenure", "event")
        .orderBy(col("t"))
    }),
    "q_e29_lead_lag" -> ((s, dir) => {
      // lead-lag cross-correlation (r13, L147): which event type LEADS
      // which — corr(a@x, b@x+lag) over lags [−3, +3] for every
      // ordered type pair, on the pre-aggregated daily grid. Exact
      // integral moments over the per-lag aligned overlap (n shrinks
      // with |lag|, emitted), ONE double correlation rounded 6 dp
      // (the q_a13 convention), degenerate cells NULL. On the uniform
      // synthetic stream the ridge is flat noise — the gate pins the
      // MACHINERY (moments, alignment, NULLs) cross-engine, the spec
      // pins the semantics on constructed leads.
      val ev = t(s, dir, "events")
      Trend.leadLag(ev.filter(col("event_type").isNotNull),
          "event_type", Tables.epochMicros(ev, "ts"), maxLag = 3)
        .orderBy(col("type_a"), col("type_b"), col("lag"))
    }),
    "q_e28_seasonal_anomaly" -> ((s, dir) => {
      // weekday-profile seasonal adjustment + residual Hampel screen
      // (r13, L143): the volume screen q_a17's trailing window cannot
      // be — that one is blind to weekly rhythm (a legitimately-quiet
      // phase flags every week, contrast spec-pinned). Per event_type:
      // exact lower-median per period-7 phase forms the profile,
      // residual = y − med_phase, Hampel on the WHOLE-series residuals
      // (retrospective audit semantics, the documented complement of
      // the trailing/streaming-shaped q_a17). Every statistic an
      // integer, the verdict an exact integer compare; the oracle
      // replays phase medians, residuals and both rank selects.
      val ev = t(s, dir, "events")
      Trend.weekdayAdjustedAnomaly(
          ev.filter(col("event_type").isNotNull), "event_type",
          Tables.epochMicros(ev, "ts"), kMilli = 3000)
        .orderBy(col("event_type"), col("x"))
    }),
    "q_e27_burst_detection" -> ((s, dir) => {
      // sliding-window burst detection (r13, L142): per user, the
      // exact maximum event count in any 24 h window ([t, t+W)
      // event-anchored — which IS the true sliding maximum), the
      // earliest anchor achieving it, and a flag at peak ≥ 8 — the
      // bot/scraper screen, the entity-level companion of Skew's
      // bot-burst hot-key treatment. At sf0.1 the flag splits the
      // population (peaks run 1–11 over the 30-day stream), so both
      // regimes are live. One exchange: the RANGE count and the
      // per-user max share the entity partitioning. The oracle
      // replays the identical RANGE frame.
      val ev = t(s, dir, "events")
      Burst.slidingPeak(ev, "user_id", Tables.epochMicros(ev, "ts"),
          windowUs = 24L * 3600L * 1000000L, threshold = 8L)
        .orderBy(col("user_id"))
    }),
    "q_e26_funnel_significance" -> ((s, dir) => {
      // funnel step drop-off significance (r13, L136; VERDICT r12 #6):
      // the decision layer over L57/L133 — per adjacent step pair, the
      // exact integer two-proportion z² between two cohorts, run TWICE:
      // an "activity" split (above/below the exact lower-median
      // per-user event count — the power-user vs casual cohorting,
      // which at sf0.1 shows real rate differences: z² = 4.6 and 10.2,
      // both pairs significant) and a "parity_aa" split (user_id % 2 —
      // an A/A test that MUST come out null; z² ≤ 1.9 at every SF).
      // Both significant and null pairs are live at gate scale, and
      // the A/A leg guards the machinery itself. All arithmetic is
      // DECIMAL(38,0)/HUGEINT-exact; the oracle replays the step
      // chain, the median split and the z² rational digit-for-digit.
      val ev = t(s, dir, "events")
      val st = Funnel.stepTimes(ev, "user_id",
        Tables.epochMicros(ev, "ts"), "event_type",
        Seq("view", "click", "purchase"),
        windowUs = Some(48L * 3600L * 1000000L))
      val cnts = ev
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_ev"))
      val med = MedianImpute.groupedQuantiles(
          cnts.withColumn("__g", lit("all")), "__g", "n_ev", Seq(500000L))
        .select(col("v").cast("long").as("__med"))
      val act = cnts.crossJoin(broadcast(med)) // 1-row stat frame
        .select(col("user_id"),
          when(col("n_ev") > col("__med"), "hi").otherwise("lo")
            .as("cohort"))
      val par = cnts.select(col("user_id"),
        when(pmod(col("user_id"), lit(2L)) === 0L, "even")
          .otherwise("odd").as("cohort"))
      Funnel.dropoffSignificance(st, "user_id", act, "cohort", "hi", "lo")
        .withColumn("split", lit("activity"))
        .unionByName(
          Funnel.dropoffSignificance(st, "user_id", par, "cohort",
              "even", "odd")
            .withColumn("split", lit("parity_aa")))
        .select(col("split"), col("from_idx"), col("step_from"),
          col("step_to"), col("entrants_a"), col("conv_a"),
          col("entrants_b"), col("conv_b"), col("d_sign"), col("z2_e6"),
          col("sig"))
        .orderBy(col("split"), col("from_idx"))
    }),
    "q_e23_event_transitions" -> ((s, dir) => {
      // event-type transition matrix (r12, L132): the first-order
      // Markov view of the event stream — per user, adjacent pairs
      // under the (us, event_id) total order, counts + exact-ppm
      // row-normalized probabilities. The sequence complement to the
      // funnel (q_e12) and retention (q_e13) views; oracle replays the
      // same lead window and floor division.
      val e = t(s, dir, "events")
      Transitions.matrix(e, "user_id", Tables.epochMicros(e, "ts"),
          "event_id", "event_type")
        .orderBy(col("from_type"), col("to_type"))
    }),
    "q_e13_retention" -> ((s, dir) => {
      // cohort retention (r8, L58): first-seen day cohorts × day
      // offsets over the 30-day window; offset 0 is the cohort size
      val ev = t(s, dir, "events")
      Retention.matrix(ev, "user_id", Tables.epochMicros(ev, "ts"),
          bucketUs = 24L * 3600L * 1000000L)
        .orderBy(col("cohort_bucket"), col("offset_buckets"))
    }),

    "q_e14_locf_resample" -> ((s, dir) => {
      // gap-filled resampling (r8, L59): each user's event values on a
      // regular 6 h grid over their observed span, last observation
      // carried forward (~2.2 events/user/day → a majority of buckets
      // are genuine gaps, so the fill is load-bearing)
      val ev = t(s, dir, "events")
      Resample.locf(ev, "user_id", Tables.epochMicros(ev, "ts"),
          "value", "event_id", stepUs = 6L * 3600L * 1000000L)
        .orderBy(col("user_id"), col("bucket"))
    }),

    "q_e1x_sessionize_chunked" -> ((s, dir) => {
      // the SAME sessionization through the hot-key-safe chunked plan —
      // 6 h chunks, deliberately SMALLER than the 12 h gap so sessions
      // cross chunk boundaries and the summary stitch is load-bearing;
      // checked against the SAME oracle as q_e1
      val ev = t(s, dir, "events")
      Sessions.sessionStats(ev, "user_id",
          Tables.epochMicros(ev, "ts"), col("event_id"),
          java.time.Duration.ofHours(12),
          chunkWidth = Some(6L * 3600L * 1000000L))
        .orderBy(col("user_id"), col("session_idx"))
    }),
    "q_e2_hash_split" -> ((s, dir) =>
      // deterministic md5-bucket train/val/test split — row membership is
      // a pure function of doc_id (stable across runs/engines/partitionings,
      // unlike randomSplit's per-partition RNG)
      Sampling.hashSplit(t(s, dir, "documents"), col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("split"))),
    "q_e15_safe_split" -> ((s, dir) =>
      // leakage-safe split (r8, L64): split fate keyed by the near-dup
      // CLUSTER id, so duplicate families move between splits atomically
      // — with the exact SetSimJoin pair source the no-straddle property
      // is deterministic, and the oracle can replay it exhaustively
      // (recursive-CTE reachability over the exact pair set, then the
      // same md5 hex boundaries as q_e2)
      SafeSplit.assign(t(s, dir, "documents"), "doc_id", "text",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), threshold = 0.8)
        .select(col("doc_id"), col("cluster"), col("split"))
        .orderBy(col("doc_id"))),
    "q_e3_seq_pack" -> ((s, dir) =>
      // concatenate-and-chunk sequence packing at a 512-token budget,
      // sharded by source (each shard packs independently — the scale
      // shape; a global pack order would serialize at 100 TB)
      Packing.packBySize(
          t(s, dir, "documents").withColumn("n_toks",
            TextAnalysis.tokenCount(col("text"))),
          "source", "doc_id", col("n_toks"), budget = 512)
        .groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("pack_tokens"))
        .orderBy(col("source"), col("pack_id"))),
    "q_e4_source_mixture" -> ((s, dir) =>
      // pretraining mixture: keep all of src0-src9, a deterministic 25%
      // of the rest — ONE scan, rate looked up per row (vs N filtered
      // unions re-scanning the corpus per source)
      Sampling.mixture(t(s, dir, "documents"), "source", col("doc_id"),
          rates = (0 until 10).map(i => s"src$i" -> 1.0).toMap,
          defaultRate = 0.25)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_id"))
        .orderBy(col("source"))),
    "q_e5_shuffle_shard" -> ((s, dir) =>
      // deterministic seeded corpus shuffle as (shard, rank): shards are
      // contiguous ranges of the md5(seed:key) order, so concatenating
      // shards 0..7 in rank order IS the global permutation — no global
      // sort. perm_sum = SUM(doc_id * rank) pins the entire permutation,
      // not just the partition sizes.
      Sampling.shuffleShard(t(s, dir, "documents"), col("doc_id"),
          shards = 8, seed = 42)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id") * col("shuffle_rank")).as("perm_sum"))
        .orderBy(col("shard"))),
    "q_e6_source_cap" -> ((s, dir) =>
      // per-source document cap (the host/domain cap of web curation):
      // keep a deterministic hash-chosen 15 per source. kept_sum pins
      // WHICH rows survived, not just how many.
      Sampling.capPerGroup(t(s, dir, "documents"), "source", col("doc_id"),
          maxPerGroup = 15)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_sum"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("source"))),
    "q_v5_quantize_int8" -> ((s, dir) =>
      // int8 embedding quantization audit: per-vector scale, code L1
      // mass, mean squared dequant error (floor(x+0.5) half-up on both
      // engines — `round` half-even/half-up semantics differ)
      Similarity.quantizeProfile(t(s, dir, "embeddings"))
        .orderBy(col("vec_id"))),
    "q_t12_chunking" -> ((s, dir) =>
      // token-window passage chunking (embedding/RAG prep): 64-token
      // windows starting every 48 tokens (overlapping); md5 pins each
      // chunk's exact text, posexplode pins the order
      t(s, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokenChunks(col("text"), 64, 48)))
        .select(col("doc_id"), col("pos").as("chunk_idx"),
          size(TextAnalysis.tokens(col("col"))).as("n_toks"),
          md5(col("col").cast("binary")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))),
    "q_t13_bpe_tokens" -> ((s, dir) =>
      // REAL byte-pair-encoding token counts under the 1000-merge table
      // learned offline (scripts/learn_bpe.py → bpe_merges_1k.tsv) — the
      // oracle replays the identical merges as a STAGED REPLACE chain
      // generated from the same table (Bpe.oracleCtes; DuckDB's binder
      // caps expression nesting at 128, so the chain is cut into
      // 100-merge CTE stages)
      Bpe.tokenCounts(t(s, dir, "documents").filter(col("doc_id") < 50),
          "doc_id", "text", merges = Bpe.Merges1k)
        .orderBy(col("doc_id"))),
    "q_t14_char_entropy" -> ((s, dir) =>
      // character-distribution entropy (encoding-junk/gibberish signal);
      // the oracle uses DuckDB's native entropy() aggregate — same log2
      // Shannon definition, met at 6 decimals
      TextAnalysis.charEntropy(
          t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text")
        .orderBy(col("doc_id"))),
    "q_t16_lm_perplexity" -> ((s, dir) =>
      // CCNet-style LM quality score (r7): self-trained add-one bigram
      // perplexity per document — the fluency signal surface statistics
      // can't see. Per-position NLL quantized once to integer 1e-4 nats
      // (floor half-up), per-doc totals exact BIGINT, perplexity derived
      // from those identical integers — the oracle replays the same
      // counts/ln/floor pipeline and must match bit-for-bit
      LmScore.bigramPerplexity(
          t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),
    "q_t38_pmi" -> ((s, dir) => {
      // PMI collocations (r11, L121; Church & Hanks 1990): adjacent
      // token pairs scored by ln(n_ab·N / (n_a·n_b)) — the classic
      // collocation extractor (multiword expressions, tokenizer-merge
      // candidates); min-count 5 kills the rare-pair PMI explosion,
      // the one ln quantized once, top-30 with a total tie-break
      val tk = TextAnalysis.tokens(col("text"))
      val len = greatest(size(tk) - 1, lit(0))
      val bg = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(explode(zip_with(
          slice(tk, lit(1), len), slice(tk, lit(2), len),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      val pair = bg.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 5)
      val uni = bg.select(explode(array(col("w1"), col("w2"))).as("w"))
        .groupBy(col("w")).agg((count(lit(1))).as("n_w"))
      val tot = bg.agg(count(lit(1)).as("n_tot"))
      pair
        .join(uni.select(col("w").as("w1"), col("n_w").as("n_a")),
          Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("n_w").as("n_b")),
          Seq("w2"))
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("n_ab"),
          floor(log((col("n_ab") * col("n_tot")).cast("double") /
              (col("n_a") * col("n_b")).cast("double"))
            * lit(1000000.0) + lit(0.5)).cast("long").as("pmi_e6"))
        .orderBy(col("pmi_e6").desc, col("w1"), col("w2"))
        .limit(30)
    }),
    "q_t41_blocklist_scan" -> ((s, dir) =>
      // Aho–Corasick multi-pattern blocklist scan (r12, L128; Aho &
      // Corasick 1975): every (position, pattern) occurrence of the
      // fixed phrase list counted in ONE automaton pass per doc —
      // O(len + matches) regardless of pattern count, where the
      // L15/L23 contains/regex family is O(len × patterns). The list
      // mixes single tokens, multi-word phrases, an overlapping
      // token/phrase pair (agg ⊂ agg row — output links live) and an
      // absent phrase (zero path live); the oracle replays the
      // per-position substring-equality definition per pattern.
      BlocklistScan.scan(t(s, dir, "documents"), "doc_id", "text",
          BlocklistPatterns)
        .orderBy(col("doc_id"))),
    "q_t43_url_canon" -> ((s, dir) => {
      // URL canonicalization for crawl dedup (r13, L141; the
      // CCNet/RefinedWeb URL-level dedup front). Deterministic messy
      // URLs (the q_t39 synthetic-page discipline): each doc renders
      // its item's URL in one of six crawler spellings — raw, default
      // port + doubled slashes, case + trailing slash, tracking-only
      // params, real params, same params reordered + junk + fragment —
      // so variants 0–3 of an item MUST collapse to one canonical key
      // and 4–5 to a second (params preserved, order-free). The oracle
      // replays both the construction and every canonicalization rule.
      val d = t(s, dir, "documents").filter(col("doc_id").isNotNull)
      val item = call_function("div", col("doc_id"), lit(6L))
      val base = concat(lit("/s"), pmod(item, lit(10L)).cast("string"),
        lit("/item/"), item.cast("string"))
      val v = pmod(col("doc_id"), lit(6L))
      val url = when(v === 0L, concat(lit("HTTP://Example.COM"), base))
        .when(v === 1L, concat(lit("http://example.com:80/"), base))
        .when(v === 2L, concat(lit("http://EXAMPLE.com"), base, lit("/")))
        .when(v === 3L,
          concat(lit("http://example.com"), base,
            lit("?utm_source=feed&ref=tw")))
        .when(v === 4L,
          concat(lit("http://example.com"), base, lit("?b=2&a=1")))
        .otherwise(concat(lit("http://example.com"), base,
          lit("?a=1&utm_campaign=x&b=2#frag")))
      UrlCanon.dedupReport(
          d.select(col("doc_id"), url.as("url")), "doc_id", "url")
        .orderBy(col("canon_url"))
    }),
    "q_t42_deflate_ratio" -> ((s, dir) =>
      // deflate-compression-ratio quality signal (r13, L137; VERDICT
      // r12 #7): per-doc 1e6·deflate_len DIV utf8_len — the
      // repetition/gibberish axis the Gopher battery reads only
      // indirectly (template spam compresses ≪ natural prose; pasted
      // random payloads push past prose). ROWS-ONLY by design: DuckDB
      // cannot deflate, and a cross-engine value compare would pin a
      // zlib build, not a semantic — DeflateSignalSpec is the gate
      // (in-JVM reference replay, inflate round-trips, ordering
      // properties, state isolation). No oracleSql entry on purpose.
      DeflateSignal.ratios(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),
    "q_t39_html_extract" -> ((s, dir) =>
      // HTML-to-text extraction + boilerplate removal (r12, L123;
      // VERDICT r11 #2; Pomikálek 2011 jusText, Barbaresi 2021
      // trafilatura): the curation FRONT — deterministic synthetic
      // crawl pages (each doc's words re-flowed into <p> blocks inside
      // real chrome: head/style/script, link-dense nav + share bar,
      // short subscribe box, stopword-free footer), then the rule
      // battery: chrome strip, block segmentation on closing tags,
      // per-block link-density / stopword-density / length
      // classification, content reassembly. All four block classes are
      // live at battery scale; md5 pins the exact extracted text. The
      // oracle rebuilds the SAME pages and replays the same rules.
      HtmlExtract.extract(
          HtmlExtract.synthesize(t(s, dir, "documents"), "doc_id", "text"),
          "doc_id", "html")
        .select(col("doc_id"), col("n_blocks"), col("n_short"),
          col("n_link"), col("n_low_stop"), col("n_content"),
          col("content_chars"), col("extract_md5"))
        .orderBy(col("doc_id"))),
    "q_t37_good_turing" -> ((s, dir) => {
      // Good–Turing unseen-mass estimate (r11, L119; Good 1953, Gale &
      // Sampson 1995): per source, the probability mass of UNSEEN
      // vocabulary ≈ N1/N (hapax share of tokens) — the data-card
      // answer to "how much more vocabulary would more data buy";
      // plus hapax/dis-legomena counts and the hapax share of the
      // vocabulary. All exact floor divisions over one (source, token)
      // aggregation.
      TextAnalysis.goodTuring(t(s, dir, "documents"), "text", "source")
        .orderBy(col("source"))
    }),
    "q_t36_chrf" -> ((s, dir) => {
      // chrF2 (r11, L115): the tokenization-free member of the eval
      // trio — char 1..4-grams over whitespace-stripped text, same
      // candidate construction as q_t34/35; Fβ=2 collapses to
      // 5m/(4r+c), exact floor division per order. Runs on the FIXED
      // eval slice (doc_id < 1000, the L101 bounded-measurement
      // pattern): char-gram volume is ~8× text bytes, and chrF is an
      // eval-set metric, not a corpus sweep — unbounded at sf0.1 it
      // exploded 112M gram rows for 133 s (bench-caught)
      val tk = TextAnalysis.tokens(col("text"))
      val cand = array_join(filter(tk,
        (x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
          pmod(i + 1, lit(4)) =!= 0), " ")
      ChrF.chrF(t(s, dir, "documents")
            .filter(col("text").isNotNull && col("doc_id") < 1000),
          "source", "doc_id", cand, col("text"), maxN = 4, beta = 2)
        .orderBy(col("grp"), col("n"))
    }),
    "q_t35_rouge" -> ((s, dir) => {
      // corpus ROUGE-1/2 (r11, L109): same candidate construction as
      // q_t34 — recall-oriented twin, and FULLY exact: P, R and the
      // micro F1 (= 2m/(c+r), algebraically float-free) are all floor
      // divisions the gate compares digit-for-digit
      val tk = TextAnalysis.tokens(col("text"))
      val cand = filter(tk,
        (x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
          pmod(i + 1, lit(4)) =!= 0)
      Rouge.rougeN(
          t(s, dir, "documents").filter(col("text").isNotNull),
          "source", "doc_id", cand, tk)
        .orderBy(col("grp"), col("n"))
    }),
    "q_t34_bleu" -> ((s, dir) => {
      // corpus BLEU-2 (r11, L107): candidate = the doc with every 4th
      // token dropped, reference = the doc — p1 is exactly 1 (the
      // candidate is a sub-multiset), deletion-spanning bigrams pull
      // p2 below 1, and the shortened candidate exercises the brevity
      // penalty; all counts exact BIGINT, the one exp/ln surface in a
      // single half-up floor
      val tk = TextAnalysis.tokens(col("text"))
      val cand = filter(tk,
        (x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
          pmod(i + 1, lit(4)) =!= 0)
      Bleu.corpusBleu(
          t(s, dir, "documents").filter(col("text").isNotNull),
          "source", "doc_id", cand, tk)
        .orderBy(col("grp"))
    }),
    "q_t33_zipf_slope" -> ((s, dir) =>
      // Zipf rank-frequency slope (r11, L106): per-source OLS of
      // ln(freq) on ln(rank) over the top-100 token ranks — the
      // vocabulary-health data-card number (natural text ≈ −1;
      // boilerplate flattens it); each ln quantized once, exact BIGINT
      // moments, one rounded division (the a13/a15 discipline)
      Zipf.slopeByGroup(t(s, dir, "documents"), "text", "source",
          TextAnalysis.tokens, topRanks = 100)
        .orderBy(col("source"))),
    "q_t32_nfc_dedup" -> ((s, dir) => {
      // Unicode NFC dedup gain (r11, L103): every doc arrives twice —
      // once suffixed precomposed (U+00E9), once with the canonically
      // equivalent decomposition (e + U+0301) — byte-different, so raw
      // md5 keeps both; the graft_nfc codegen'd normalization merges
      // them. merged == distinct-text count per source, by construction
      val d = t(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
        .select(col("source"), col("text"))
      val doubled = d.select(col("source"),
          concat(col("text"), lit(" caf\u00e9")).as("text"))   // NFC
        .unionAll(d.select(col("source"),
          concat(col("text"), lit(" cafe\u0301")).as("text"))) // NFD
      Normalize.nfcDedupGain(doubled, "text", "source")
        .orderBy(col("grp"))
    }),
    "q_t31_luhn_audit" -> ((s, dir) => {
      // checksum-validated card-number PII audit (r11, L98): docs get
      // seeded card-length digit runs appended — one VALID test PAN
      // (4111…1111), one single-digit typo of it, one valid Amex test
      // PAN — and the audit must separate them: the regex alone counts
      // all runs, the Luhn gate keeps only the two real check digits.
      // Exactly the precision step regex-only PII scrubbing lacks.
      val aug = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), concat(coalesce(col("text"), lit("")),
          when(col("doc_id") % 3 === 0,
            lit(" card 4111111111111111 ok")).otherwise(lit("")),
          when(col("doc_id") % 4 === 0,
            lit(" typo 4111111111111112 bad")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit(" amex 378282246310005 fine")).otherwise(lit("")))
          .as("text"))
      TextAnalysis.cardAudit(aug, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),
    "q_t40_kn3_perplexity" -> ((s, dir) => {
      // interpolated TRIGRAM Kneser–Ney (r12, L127; VERDICT r11 #7):
      // order 3 is the KenLM order CCNet actually runs — raw-count
      // discounting at the top order, CONTINUATION counts at the
      // middle (ck(w2,w3) = distinct left contexts), the L93 add-one
      // continuation unigram at the bottom. Split-train (even half) so
      // every backoff path — seen trigram, unseen trigram context,
      // unseen middle context — executes on the gate corpus; the
      // oracle retrains the identical model with the same fixed fp
      // operation order (the retrained-oracle discipline).
      val docs = t(s, dir, "documents")
      LmScore.knTrigramPerplexity(docs, "doc_id", "text",
          reference = Some(docs.filter(col("doc_id") % 2 === 0)))
        .orderBy(col("doc_id"))
    }),
    "q_t30_kn_perplexity" -> ((s, dir) => {
      // interpolated Kneser–Ney perplexity (r11, L93; VERDICT r10 #4):
      // the actual KenLM/CCNet fluency smoothing — discounted seen
      // mass redistributed by CONTINUATION count, not frequency. Model
      // trains on the even-doc_id half and scores EVERY doc, so the
      // unseen-context and unseen-continuation paths both execute on
      // the gate corpus; the oracle retrains the identical model
      // (the q_t16 discipline) with the same fixed fp operation order
      val docs = t(s, dir, "documents")
      LmScore.knBigramPerplexity(docs, "doc_id", "text",
          reference = Some(docs.filter(col("doc_id") % 2 === 0)))
        .orderBy(col("doc_id"))
    }),
    "q_t17_ccnet_buckets" -> ((s, dir) => {
      // CCNet's head/middle/tail corpus split (r7): bin every document by
      // which perplexity TERCILE it lands in. Boundaries are the exact
      // rank-select quantiles (MedianImpute.exactQuantiles — distributed
      // bracket/recurse, no global sort), then labeling is a broadcast
      // scalar comparison: the scale-correct shape for "split 100 TB by
      // a corpus-wide threshold". ppl_milli is integer (L43's quantized
      // perplexity), so the tercile comparisons are exact on both engines.
      val scored = LmScore.bigramPerplexity(
        t(s, dir, "documents"), "doc_id", "text")
      val Seq(b1, b2) = MedianImpute
        .exactQuantiles(scored.filter(col("ppl_milli").isNotNull),
          "ppl_milli", Seq(1.0 / 3, 2.0 / 3))
        .map(_.map(lit(_)).getOrElse(lit(null).cast("double")))
      scored.select(col("doc_id"), col("ppl_milli"),
        when(col("ppl_milli").isNull, lit("unscored"))
          .when(col("ppl_milli") <= b1, lit("head"))
          .when(col("ppl_milli") <= b2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
        .orderBy(col("doc_id"))
    }),
    "q_t18_gopher_rules" -> ((s, dir) =>
      // the published Gopher/MassiveWeb rule battery (r7): hard pass/fail
      // document gates — word-count and mean-word-length bounds, '#' and
      // ellipsis symbol caps, bullet/ellipsis line-shape caps, alphabetic
      // floor, required-stopword floor. Pure narrow Catalyst projection;
      // the oracle recomputes every ratio from the same integer counts
      GopherRules.report(
          t(s, dir, "documents").filter(col("doc_id") < 60), "doc_id", "text")
        .orderBy(col("doc_id"))),
    "q_t8_repetition" -> ((s, dir) =>
      // Gopher-style repetition signals: most-common-word share and the
      // share of tokens whose word occurs 2+ times — the boilerplate /
      // keyword-stuffing filters of an LLM quality pipeline
      t(s, dir, "documents")
        .select(col("doc_id"),
          // outer + null filter: see q_t6 — a plain explode re-tokenizes
          // every row inside the inferred size()>0 filter
          explode_outer(TextAnalysis.tokens(col("text"))).as("w"))
        .filter(col("w").isNotNull)
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(
          sum(col("c")).as("n_toks"),
          count(lit(1)).as("n_unique"),
          round(max(col("c")).cast("double") / sum(col("c")), 6)
            .as("top_word_ratio"),
          round(sum(when(col("c") >= 2, col("c")).otherwise(0L))
            .cast("double") / sum(col("c")), 6).as("dup_word_ratio"))
        .orderBy(col("doc_id"))),
    "q_t7_pii_scrub" -> ((s, dir) => {
      // the corpus carries no emails/URLs (verified), so the query injects
      // synthetic ones deterministically and scrubs them back out — the
      // scrub path runs against a non-trivial oracle on every row
      val injected = concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" see https://example.com/d/"),
            col("doc_id").cast("string"), lit(" next"))).otherwise(lit("")))
      t(s, dir, "documents")
        .select(col("doc_id"), injected.as("t"))
        .withColumn("urls_masked",
          regexp_replace(col("t"), TextAnalysis.UrlPattern, "<URL>"))
        .withColumn("scrubbed", TextAnalysis.scrubPii(col("t")))
        .select(col("doc_id"),
          // email audit over the URL-masked text = the redactions scrubPii
          // actually performs (userinfo emails belong to the URL match)
          TextAnalysis.matchCount(col("urls_masked"),
            TextAnalysis.EmailPattern).as("n_emails"),
          TextAnalysis.matchCount(col("t"),
            TextAnalysis.UrlPattern).as("n_urls"),
          md5(col("scrubbed").cast("binary")).as("scrubbed_md5"),
          (length(col("t")) - length(col("scrubbed"))).as("chars_removed"))
        .orderBy(col("doc_id"))
    }),

    "q_t9_decontaminate" -> ((s, dir) => {
      // benchmark decontamination: eval set = every 50th doc; training
      // docs sharing any 4-gram are flagged with their exact distinct-
      // shingle overlap (membership check — exact, no sketch)
      val docs = t(s, dir, "documents")
      Decontaminate.overlaps(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", shingleLen = 4)
        .select(col("id").as("doc_id"), col("n_overlap"))
        .orderBy(col("doc_id"))
    }),

    "q_t19_bloom_decontaminate" -> ((s, dir) => {
      // same contamination question as q_t9, answered through the
      // bloom-screened path (r7): constant-size sketch probe prunes the
      // corpus shingle stream before the exact confirm join — the oracle
      // is IDENTICAL to q_t9's because the screen is exact end-to-end
      val docs = t(s, dir, "documents")
      Decontaminate.overlapsBloomScreened(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", shingleLen = 4)
        .select(col("id").as("doc_id"), col("n_overlap"))
        .orderBy(col("doc_id"))
    }),

    "q_t20_quality_classifier" -> ((s, dir) => {
      // trained GPT-3/LLaMA-style quality filter (r7, L51): logistic
      // regression over hashed uni+bigram features; positives = the raw
      // documents, negatives = deterministic token-sorted scrambles of
      // the SAME documents (identical unigram mass, destroyed order —
      // the learned signal is bigram fluency, the thing the deployed
      // classifiers actually measure). Train on the doc_id%10==0
      // subsample, score the full corpus. The iterative GD rounds are
      // outside one SQL statement, but training is bit-exact under any
      // partitioning (spec-pinned), so the fitted weights ARE a
      // deterministic function of the input table — the query stashes
      // them and [[dynamicOracles]] embeds them as a literal VALUES CTE
      // whose oracle replays the corpus-scale SCORING join exactly
      // (featurize, broadcast weight join, exact floorDiv half-up).
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val scrambled = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", sort_array(split(col("text"), "\\s+"))).as("text"))
      val trainRows = col("doc_id") % 10 === 0
      val model = QualityClassifier.train(docs.filter(trainRows),
        scrambled.filter(trainRows), "doc_id", "text", m = 2048,
        iters = 8)
      trainedT20 = Some(model)
      QualityClassifier.score(docs, "doc_id", "text", model)
        .select(col("doc_id"), col("n_feats"), col("logit_e6"))
        .orderBy(col("doc_id"))
    }),

    "q_t28_bpe_learn" -> ((s, dir) => {
      // distributed BPE merge LEARNING (r10, VERDICT r9 #5): 12 rounds
      // of one map-side-combinable pair aggregation + a 1-row argmax —
      // the training loop scripts/learn_bpe.py ran driver-side, now on
      // the cluster over the distinct-word table. The learned sequence
      // is stashed and [[dynamicOracles]] generates a DuckDB replay
      // that recomputes every round's pair counts and argmax itself
      // (q_t20's discipline — verified, not echoed).
      import s.implicits._
      val merges = BpeLearn.learn(t(s, dir, "documents"), "text", 12)
      learnedT28 = Some(merges)
      merges.toDF().orderBy(col("rank"))
    }),
    "q_t21_heavy_phrases" -> ((s, dir) =>
      // sketch-screened exact heavy hitters (r7, L53): 3-token phrases
      // occurring >= 6 times corpus-wide — the boilerplate-candidate
      // report. Count-Min screens every occurrence before the exact
      // groupBy (no false negatives — CMS never underestimates), the
      // exact count removes the screen's false positives, so the answer
      // IS GROUP BY HAVING and the oracle is exact at any sketch size.
      HeavyHitters.frequentPhrases(t(s, dir, "documents"),
          "text", n = 3, minCount = 6L)
        .orderBy(col("phrase"))),

    "q_qr3_corpus_diff" -> ((s, dir) => {
      // snapshot-over-snapshot diff (r7, L54): two deterministic
      // snapshots derived from the documents table — old = ids not
      // divisible by 7, new = ids not divisible by 5, with every id
      // divisible by 3 carrying revised content in the new snapshot —
      // rollup counts + id-sum membership witness per status
      val docs = t(s, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("text"))
      val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      CorpusDiff.report(oldSnap, newSnap, "doc_id", "text")
        .orderBy(col("status"))
    }),

    "q_g1_pagerank" -> ((s, dir) => {
      // quantized-integer PageRank (r8, L62) over the customer⇄supplier
      // trade graph (both directions of every distinct pair traded via
      // an order; supplier ids offset by 1e6 out of the customer id
      // space): 5 exact integer steps — floor division everywhere, so
      // the unrolled-SQL oracle agrees on every digit
      val orders = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val pairs = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .select(col("o_custkey").as("cust"),
          (col("l_suppkey") + lit(1000000L)).as("supp"))
        .distinct()
      val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
        .unionAll(pairs.select(col("supp").as("src"), col("cust").as("dst")))
      PageRank.ranks(edges, "src", "dst", iterations = 5)
        .orderBy(col("id"))
    }),

    "q_t27_lm_export" -> ((s, dir) => {
      // count-based bigram LM table export (r8): for each context
      // token the top-3 continuations by count — the artifact form of
      // L43's bigram model (what a smoothing/serving layer loads);
      // adjacent-pair extraction via zip_with over two slices (narrow,
      // codegen'd), WindowGroupLimit top-k, deterministic tie-break
      val tk = TextAnalysis.tokens(col("text"))
      val len = greatest(size(tk) - 1, lit(0))
      t(s, dir, "documents")
        .select(explode_outer(zip_with(
          slice(tk, lit(1), len), slice(tk, lit(2), len),
          (a, b) => struct(a.as("ctx"), b.as("nxt")))).as("bg"))
        .filter(col("bg").isNotNull)
        .groupBy(col("bg.ctx").as("ctx"), col("bg.nxt").as("nxt"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("ctx"))
            .orderBy(col("n").desc, col("nxt"))))
        .filter(col("rank") <= 3)
        .select(col("ctx"), col("rank"), col("nxt"), col("n"))
        .orderBy(col("ctx"), col("rank"))
    }),
    "q_t26_url_canonical" -> ((s, dir) => {
      // URL canonicalization as a dedup key (r8, L74): a synthetic URL
      // stream where the same page arrives in two shapes (tracking
      // params + fragment + shouting authority vs clean) — after
      // normalization both collapse to one canonical key; the rollup
      // counts arrivals per key with a min-id keeper (the L1 shape)
      val docs = t(s, dir, "documents").filter(col("doc_id") < 200)
      val raw = when(col("doc_id") % 3 === 0,
          concat(lit("HTTPS://Example"), pmod(col("doc_id"), lit(20L)),
            lit(".COM/p/"), pmod(col("doc_id"), lit(50L)),
            lit("?utm_source=x&b=2&a=1#frag")))
        .otherwise(
          concat(lit("https://example"), pmod(col("doc_id"), lit(20L)),
            lit(".com/p/"), pmod(col("doc_id"), lit(50L)),
            lit("?a=1&b=2")))
      docs.select(col("doc_id"), graft.functions.Urls.normalize(raw).as("url"))
        .groupBy(col("url"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
        .orderBy(col("url"))
    }),
    "q_t25_vocab_encode" -> ((s, dir) => {
      // vocabulary indexing + id encoding (r8, L73) — the last step
      // before tensors: frequency-ranked ids (minCount=2 tail cut),
      // docs re-emitted as position-ordered id sequences with OOV kept
      // as -1 (length must survive encoding); md5 pins each sequence
      val docs = t(s, dir, "documents")
      val v = Vocab.build(docs, "text", minCount = 2)
      Vocab.encode(docs.filter(col("doc_id") < 100), "doc_id", "text", v)
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          md5(array_join(transform(col("ids"), _.cast("string")), " ")
            .cast("binary")).as("ids_md5"))
        .orderBy(col("doc_id"))
    }),
    "q_t24_cluster_terms" -> ((s, dir) =>
      // c-TF-IDF class labeling (r8, L70): top-5 discriminative terms
      // per source — tf·⌊ln(1+A/f)·10⁴⌋ with the one float op inside a
      // half-up floor (L43 discipline), WindowGroupLimit top-k
      ClusterTerms.topTerms(t(s, dir, "documents"), "source", "text", k = 5)
        .orderBy(col("source"), col("rank"))),

    "q_j13_record_linkage" -> ((s, dir) => {
      // Fellegi–Sunter EM linkage (r11, L111): candidate pairs blocked
      // on (nation, custkey%5), three 0/1 agreement fields (segment,
      // acctbal-band, name-last-char), 8 quantized EM rounds on the
      // 2³-pattern grid; the oracle replays the unrolled rounds from
      // the same (fields, rounds) via RecordLinkage.oracleCtes
      val c = t(s, dir, "customer")
        .filter(col("c_custkey").isNotNull && col("c_nationkey").isNotNull
          && col("c_mktsegment").isNotNull && col("c_acctbal").isNotNull
          && col("c_name").isNotNull)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nat"),
          pmod(col("c_custkey"), lit(5)).as("blk"),
          col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") / 1000).as("bal"),
          expr("substr(c_name, length(c_name), 1)").as("lc"))
      val pr = c.as("a").join(c.as("b"),
          col("a.nat") === col("b.nat") && col("a.blk") === col("b.blk")
            && col("a.k") < col("b.k"))
        .select(
          when(col("a.seg") === col("b.seg"), 1).otherwise(0).as("g1"),
          when(col("a.bal") === col("b.bal"), 1).otherwise(0).as("g2"),
          when(col("a.lc") === col("b.lc"), 1).otherwise(0).as("g3"))
      RecordLinkage.emPatterns(pr, Seq("g1", "g2", "g3"), rounds = 8)
        .orderBy(col("g1"), col("g2"), col("g3"))
    }),
    "q_j10_fuzzy_match" -> ((s, dir) =>
      // exact edit-distance entity matching (r8, L69): SymSpell
      // deletion-neighborhood blocking (lossless for lev ≤ d, the L63
      // recall property replayed for edit distance) + exact levenshtein
      // confirm; the oracle is the exhaustive quadratic join
      FuzzyJoin.selfPairs(t(s, dir, "customer"), "c_custkey", "c_name",
          maxDist = 1)
        .orderBy(col("id_a"), col("id_b"))),

    "q_v17_mmr" -> ((s, dir) => {
      // MMR diversification (r11, L120): re-rank each q_v1 query's
      // top-20 page with λ=0.7 greedy relevance-vs-redundancy picks —
      // the stage between retrieval and consumption; rel and pairwise
      // sims are the q_v1 rounded cosines quantized to 1e-6 ints, the
      // oracle replays the unrolled greedy rounds from the same (k, λ)
      val emb = t(s, dir, "embeddings")
      val top = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 5), emb.filter(col("vec_id") >= 5),
        k = 20)
      val cand = top.select(col("query_id"), col("neighbor_id"),
        floor(col("sim") * lit(1000000) + lit(0.5)).cast("long")
          .as("rel_e6"))
      val pr = top.as("a").join(top.as("b"),
          col("a.query_id") === col("b.query_id") &&
            col("a.neighbor_id") < col("b.neighbor_id"))
        .select(col("a.query_id").as("query_id"),
          col("a.neighbor_id").as("id_a"), col("b.neighbor_id").as("id_b"))
      val ea = emb.select(col("vec_id").as("id_a"),
        col("embedding").as("av"))
      val eb = emb.select(col("vec_id").as("id_b"),
        col("embedding").as("bv"))
      val sims = pr.join(ea, Seq("id_a")).join(eb, Seq("id_b"))
        .select(col("query_id"), col("id_a"), col("id_b"),
          floor(round(Similarity.cosineNative(col("av"), col("bv")), 6)
            * lit(1000000) + lit(0.5)).cast("long").as("sim_e6"))
      Mmr.rerank(cand, sims, k = 5, lamE1 = 7)
        .orderBy(col("query_id"), col("rank"))
    }),
    "q_v16_jl_distortion" -> ((s, dir) =>
      // JL Rademacher projection audit (r11, L108): 64→16 dims via the
      // md5-derived ±1 matrix (both engines recompute the matrix from
      // the seed), per-pair ‖Sa−Sb‖²/k vs ‖a−b‖² distortion over the
      // fixed 100-vector pair set; projection is a native codegen loop
      // (JlProject), distances share the DotProduct fold contract
      JlAudit.distortionPairs(
          t(s, dir, "embeddings").filter(col("vec_id") < 100),
          "vec_id", "embedding", seed = "jl42", dims = 64, k = 16)
        .orderBy(col("id_a"), col("id_b"))),

    "q_e21_unimax" -> ((s, dir) =>
      // UniMax waterfilling (r11, L116): budget = 1.95× the corpus
      // token total, caps at 2 epochs — small sources cap out, the
      // rest share the level with the remainder going to the smallest
      // uncapped caps; every step integer floor arithmetic
      UniMax.allocate(t(s, dir, "documents"), "source",
          TextAnalysis.tokenCount(col("text")),
          budgetNum = 39, budgetDen = 20, maxEpochs = 2)
        .orderBy(col("source"))),
    "q_e20_negative_sampling" -> ((s, dir) => {
      // smoothed-unigram negative sampling (r11, L113): 5 deterministic
      // md5 draws per anchor doc from P(w) ∝ count^0.75 — the
      // contrastive-training staple; vocab cumulative via the shared
      // L87 prefix sum, lookup via L39's point-in-interval join
      val docs = t(s, dir, "documents")
      NegativeSampling.sample(docs, "text", TextAnalysis.tokens,
          docs.filter(col("doc_id") < 200)
            .select(col("doc_id")).distinct(),
          "doc_id", k = 5, seed = "neg:42")
        .orderBy(col("anchor"), col("j"))
    }),
    "q_e19_bradley_terry" -> ((s, dir) => {
      // Bradley–Terry preference strengths (r11, L105): pairwise
      // judgments synthesized deterministically from events — for each
      // (user, day), every event-type pair the user touched compares by
      // activity count (ties skipped) — then 10 quantized MM rounds on
      // the items² grid (the PCA/CMS bounded-grid pattern); the oracle
      // replays the identical unrolled rounds from the same parameters
      val ev = t(s, dir, "events")
      val c = ev
        .filter(col("event_type").isNotNull && col("ts").isNotNull &&
          col("user_id").isNotNull)
        .select(col("user_id"),
          call_function("div", Tables.epochMicros(ev, "ts"),
            lit(86400000000L)).as("d"),
          col("event_type"))
        .groupBy(col("user_id"), col("d"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val cmp = c.as("x").join(c.as("y"),
          col("x.user_id") === col("y.user_id") && col("x.d") === col("y.d")
            && col("x.event_type") < col("y.event_type")
            && col("x.n") =!= col("y.n"))
        .select(
          when(col("x.n") > col("y.n"), col("x.event_type"))
            .otherwise(col("y.event_type")).as("winner"),
          when(col("x.n") > col("y.n"), col("y.event_type"))
            .otherwise(col("x.event_type")).as("loser"))
      BradleyTerry.fit(cmp, "winner", "loser", rounds = 10, lambda = 1L)
        .orderBy(col("item"))
    }),

    "q_e18_interleave" -> ((s, dir) =>
      // deterministic proportional interleave (r9, L79): the training
      // data-loader ORDER — weighted fair queueing over sources with
      // integer weights (src<k> → k%3+1), position in exact integer
      // closed form over the skew-free hash rank; the oracle replays
      // the DEFINITIONAL (v, source, r) sort, exact because weights
      // {1,2,3} divide 6 so v6=(r+1)·(6/w) is integral
      Interleave.positions(t(s, dir, "documents"), "source", "doc_id",
          (substring(col("source"), 4, 10).cast("long") % 3) + 1)
        .select(col("doc_id"), col("source"), col("r"), col("pos"))
        .orderBy(col("pos"))),
    "q_e17_gumbel_per_group" -> ((s, dir) =>
      // per-group weighted sampling without replacement (r8): 3 length-
      // weighted exemplar docs per source via the shared deterministic
      // Gumbel key, selected by WindowGroupLimit instead of q_e10's
      // global TakeOrdered — the 10⁵-group shape
      Sampling.gumbelTopKPerGroup(
          t(s, dir, "documents").select(col("doc_id"), col("source"),
            (col("n_chars") * lit(10L)).as("w_e4")),
          "source", "doc_id", "w_e4", k = 3, seed = "42")
        .select(col("source"), col("rank"), col("doc_id"),
          col("gumbel_key_e4"))
        .orderBy(col("source"), col("rank"))),

    "q_j11_fuzzy_link" -> ((s, dir) => {
      // cross-table record linkage (r8, L69's A–B form): customers and
      // suppliers normalized into one entity-key space ("E#…"), linked
      // at lev ≤ 1 — exact matches plus one-digit typos; id spaces stay
      // separate (custkey 5 and suppkey 5 are different entities)
      val c = t(s, dir, "customer").select(col("c_custkey"),
        regexp_replace(col("c_name"), "^Customer#", "E#").as("name"))
      val sup = t(s, dir, "supplier").select(col("s_suppkey"),
        regexp_replace(col("s_name"), "^Supplier#", "E#").as("name"))
      FuzzyJoin.pairs(c, "c_custkey", "name", sup, "s_suppkey", "name",
          maxDist = 1)
        .orderBy(col("left_id"), col("right_id"))
    }),

    "q_e16_hopping_window" -> ((s, dir) => {
      // hopping event-time windows (r8, L68): 30-min windows opening
      // every 15 min per event type — each event expands to exactly 2
      // window indices via a codegen'd sequence (never a range join
      // against a window table), then one map-side-combinable groupBy
      val ev = t(s, dir, "events")
      TimeWindows.hopping(ev, Tables.epochMicros(ev, "ts"),
          widthUs = 30L * 60L * 1000000L, slideUs = 15L * 60L * 1000000L,
          Seq("event_type"),
          Seq(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v")))
        .orderBy(col("event_type"), col("window_start_us"))
    }),

    "q_t23_fertility" -> ((s, dir) => {
      // tokenizer fertility per language (r8): BPE tokens per whitespace
      // token under the learned 1000-merge table — the tokenizer-
      // efficiency panel of a multilingual dataset card (a language
      // with fertility 3 costs 3× the context budget per word). Ratio
      // in integral ppm arithmetic; q_t13's doc subset (the REPLACE
      // -chain oracle is quadratic in merge count)
      val docs = t(s, dir, "documents").filter(col("doc_id") < 50)
      val bpe = Bpe.tokenCounts(docs, "doc_id", "text",
        merges = Bpe.Merges1k)
      docs.select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("ws"))
        .join(bpe, "doc_id")
        .groupBy(col("lang"))
        .agg(sum(col("ws")).as("ws_tokens"),
          sum(col("bpe_tokens")).as("bpe_tokens"))
        .select(col("lang"), col("ws_tokens"), col("bpe_tokens"),
          when(col("ws_tokens") === 0L, lit(0L))
            .otherwise(call_function("div",
              col("bpe_tokens") * lit(1000000L), col("ws_tokens")))
            .as("fertility_e6"))
        .orderBy(col("lang"))
    }),

    "q_g2_triangles" -> ((s, dir) => {
      // exact triangle census (r8, L67) over the user co-activity graph:
      // users co-active in the same (event_type, minute) bucket are
      // linked; pair generation reuses the banding machinery's capped
      // in-bucket expansion, then the degree-ordered compact-forward
      // count (oriented out-degree ≤ √2m — degree skew cannot square).
      // 141 vertices / 207 edges / 8 triangles at the sf0.01 gate;
      // 23k edges / 8491 at sf0.1 — structure, not a clique artifact
      val ev = t(s, dir, "events")
      val buckets = ev.select(col("event_type").as("band"),
          call_function("div", Tables.epochMicros(ev, "ts"),
            lit(60000000L)).as("key"),
          col("user_id").as("id"))
        .filter(col("band").isNotNull && col("key").isNotNull &&
          col("id").isNotNull)
        .distinct()
      Triangles.stats(NearDup.bucketPairs(buckets, maxBucketSize = 10000),
        "id_a", "id_b")
    }),

    "q_g3_kcore" -> ((s, dir) => {
      // k-core peeling (r8): the 2-core of the co-activity graph — 8
      // fixed peeling rounds (spec-proved past the fixpoint depth for
      // these fixtures; the oracle replays the identical unrolled
      // rounds either way). 35 of 141 vertices peel at the gate scale;
      // the denser sf0.1 graph is its own 2-core (saturation documented)
      val ev = t(s, dir, "events")
      val buckets = ev.select(col("event_type").as("band"),
          call_function("div", Tables.epochMicros(ev, "ts"),
            lit(60000000L)).as("key"),
          col("user_id").as("id"))
        .filter(col("band").isNotNull && col("key").isNotNull &&
          col("id").isNotNull)
        .distinct()
      KCore.vertices(NearDup.bucketPairs(buckets, maxBucketSize = 10000),
          "id_a", "id_b", k = 2, rounds = 8)
        .orderBy(col("id"))
    }),

    "q_g6_link_predict" -> ((s, dir) => {
      // Adamic–Adar link prediction (r11, L104): non-adjacent pairs of
      // the co-activity graph ranked by shared-neighbor evidence, each
      // neighbor's 1/ln(deg) quantized once to 1e-6 — the candidate
      // generator next to L67's census; top-100 with a total tiebreak.
      // 5-minute buckets (vs the g3/g5 minute): link prediction needs
      // BOTH present and absent edges to rank — probed per SF: the
      // minute graph has zero edges at sf0.001 and zero non-adjacent
      // wedge pairs where it is dense; 5-minute co-activity yields
      // 22/7.4k/1.0M candidate pairs at sf0.001/0.01/0.1
      val ev = t(s, dir, "events")
      val buckets = ev.select(col("event_type").as("band"),
          call_function("div", Tables.epochMicros(ev, "ts"),
            lit(300000000L)).as("key"),
          col("user_id").as("id"))
        .filter(col("band").isNotNull && col("key").isNotNull &&
          col("id").isNotNull)
        .distinct()
      LinkPredict.adamicAdar(
          NearDup.bucketPairs(buckets, maxBucketSize = 10000),
          "id_a", "id_b")
        .orderBy(col("aa_e6").desc, col("cn").desc, col("a"), col("b"))
        .limit(100)
    }),

    "q_g5_label_prop" -> ((s, dir) => {
      // synchronous label propagation (r10, L85): community detection
      // over the same co-activity graph — 4 deterministic plurality
      // updates (ties to the smallest label), the oracle replays the
      // identical unrolled rounds from the same parameter
      // (LabelProp.oracleCtes, the KCore generator discipline)
      val ev = t(s, dir, "events")
      val buckets = ev.select(col("event_type").as("band"),
          call_function("div", Tables.epochMicros(ev, "ts"),
            lit(60000000L)).as("key"),
          col("user_id").as("id"))
        .filter(col("band").isNotNull && col("key").isNotNull &&
          col("id").isNotNull)
        .distinct()
      LabelProp.communities(
          NearDup.bucketPairs(buckets, maxBucketSize = 10000),
          "id_a", "id_b", rounds = 4)
        .orderBy(col("id"))
    }),

    "q_g4_assortativity" -> ((s, dir) => {
      // degree assortativity (r8): Newman's r over the same co-activity
      // graph — exact integer moments (the a13 discipline on degrees),
      // identical IEEE derivation both engines
      val ev = t(s, dir, "events")
      val buckets = ev.select(col("event_type").as("band"),
          call_function("div", Tables.epochMicros(ev, "ts"),
            lit(60000000L)).as("key"),
          col("user_id").as("id"))
        .filter(col("band").isNotNull && col("key").isNotNull &&
          col("id").isNotNull)
        .distinct()
      Triangles.degreeAssortativity(
        NearDup.bucketPairs(buckets, maxBucketSize = 10000), "id_a", "id_b")
    }),

    "q_j8_scd2" -> ((s, dir) => {
      // SCD2 history merge (r8, L61): bootstrap a versioned dimension
      // from the old snapshot, apply the new snapshot as a change
      // batch at t=1000 — unchanged keys ride through open, edits
      // close the old version and open the new, snapshot-absent keys
      // stay open (SCD2 never deletes), fresh keys open at t=1000
      val docs = t(s, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("text"))
      val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      val hist = Scd2.init(oldSnap, "doc_id", Seq("text"), atUs = 0L)
      Scd2.merge(hist, newSnap, "doc_id", Seq("text"), atUs = 1000L)
        .select(col("doc_id"), md5(col("text")).as("v_md5"),
          col("valid_from_us"), col("valid_to_us"), col("is_current"))
        .orderBy(col("doc_id"), col("valid_from_us"))
    }),

    "q_j9_scd2_lookup" -> ((s, dir) => {
      // temporal lookup into the q_j8 history (r8, L61): every doc id
      // probed at t=500 (inside version 1) and t=1500 (inside version
      // 2 where one exists); ids never dimensioned (in neither
      // snapshot) ride through with null version columns — the LEFT
      // join contract
      val docs = t(s, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("text"))
      val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      val hist = Scd2.merge(
        Scd2.init(oldSnap, "doc_id", Seq("text"), atUs = 0L),
        newSnap, "doc_id", Seq("text"), atUs = 1000L)
      val facts = docs.select(col("doc_id"),
        explode(array(lit(500L), lit(1500L))).as("t_us"))
      Scd2.lookup(hist, facts, "doc_id", col("t_us"), Seq("text"))
        .select(col("doc_id"), col("t_us"), md5(col("text")).as("v_md5"),
          col("valid_from_us"))
        .orderBy(col("doc_id"), col("t_us"))
    }),

    "q_t22_bm25" -> ((s, dir) =>
      // BM25 ranked retrieval (r8, L60): 3-term query with a 15×
      // rarity spread ('dup' df=25 vs 'spark'/'vector' df≈385 at
      // sf0.01), top-20 page; contributions integer-quantized at 1e-6
      // (L43 discipline) so the ranking is an exact BIGINT compare
      Bm25.topK(t(s, dir, "documents"), "doc_id", "text",
          Seq("dup", "spark", "vector"), k = 20)
        .orderBy(col("score_e6").desc, col("doc_id"))),

    "q_t29_hybrid_rrf" -> ((s, dir) => {
      // hybrid retrieval by reciprocal-rank fusion (r11, L92; VERDICT
      // r10 #3): the q_t22 lexical top-20 and a dense cosine top-20
      // (query = vec_id 0's embedding vs the rest of the corpus) fuse
      // by Σ floor(1e6/(60+rank)) — ranks only, no score calibration;
      // absent ranks surface as 0. Both inputs are 20-row pages, the
      // join is grid-sized, the corpus is never reshuffled.
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score_e6").desc, col("doc_id"))
      val lex = Bm25.topK(t(s, dir, "documents"), "doc_id", "text",
          Seq("dup", "spark", "vector"), k = 20)
        .withColumn("rank", row_number().over(w))
        .select(col("doc_id"), col("rank"))
      val e = t(s, dir, "embeddings")
      val dense = Similarity.bruteForceTopK(
          e.filter(col("vec_id") === 0), e.filter(col("vec_id") >= 1),
          k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      Rrf.fuseTwo(lex, dense, "doc_id", k0 = 60)
        .orderBy(col("rank"))
    }),

    "q_qr3x_fuzzy_diff" -> ((s, dir) => {
      // fuzzy snapshot diff (r8, L56): q_qr3's snapshots with a second
      // mutation class — ids divisible by 11 are REPLACED wholesale
      // (near-zero trigram overlap), ids divisible by 3 get the light
      // " v2" touch-up — and `changed` splits into edited vs rewritten
      // by the exact integer Jaccard compare (inter*1e6 >= 8e5*union)
      val docs = t(s, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("text"))
      val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0,
            concat(lit("rewritten placeholder document number "),
              col("doc_id")))
            .when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      CorpusDiff.fuzzyReport(oldSnap, newSnap, "doc_id", "text")
        .orderBy(col("status"))
    }),

    "q_qr5_rekeyed" -> ((s, dir) => {
      // re-keyed document detection (r8, L56): every id divisible by 7
      // migrates to id+1000000 with a light edit (a MOVE the id-keyed
      // diff double-books as removed+added), ids divisible by 13 (and
      // not re-keyed) are plain removals with no twin. The pool is
      // removed ∪ added only; banding generates candidates; the 0.8
      // threshold sits in the certain-recall band (same argument as
      // q_d2), so the exhaustive removed×added oracle agrees exactly.
      val docs = t(s, dir, "documents")
      val oldSnap = docs.select(col("doc_id"), col("text"))
      val newSnap = docs
        .filter(col("doc_id") % 7 === 0 || col("doc_id") % 13 =!= 0)
        .select(
          when(col("doc_id") % 7 === 0, col("doc_id") + 1000000)
            .otherwise(col("doc_id")).as("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      CorpusDiff.rekeyed(oldSnap, newSnap, "doc_id", "text")
        .orderBy(col("old_id"), col("new_id"))
    }),

    "q_qr4_drift" -> ((s, dir) => {
      // distribution drift (r7, L55): language-mix PSI between the
      // even-id reference snapshot and a deliberately skewed current
      // snapshot (odd ids, long docs only — shifts the language mix);
      // per-category counts + 1e-6-quantized PSI contributions
      val docs = t(s, dir, "documents")
      Drift.categorical(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1 && col("n_chars") >= 400),
          "lang")
        .orderBy(col("bucket"))
    }),

    "q_t11_shared_passages" -> ((s, dir) =>
      // passage-level (not whole-doc) duplication: pairs sharing >= 3
      // rare verbatim 8-gram runs; at sf0.1 this finds ~10x more pairs
      // than whole-doc near-dup — documents that QUOTE each other without
      // being near-identical
      SharedPassages.pairs(t(s, dir, "documents"), "doc_id", "text",
          shingleLen = 8, maxDf = 5, minShared = 3)
        .orderBy(col("id_a"), col("id_b"))),

    "q_t15_max_shared_run" -> ((s, dir) =>
      // contamination LENGTH (VERDICT r6 #6): for pairs sharing any rare
      // verbatim 8-gram, the longest shared token run — "how much is
      // copied", where q_t11 counts "how many places" and whole-doc
      // near-dup can't see a single long quote at all. Exact: positional
      // shingle chains == LCS-on-tokens for runs >= 8 (guaranteed by
      // candidacy); the oracle computes the token-level LCS via
      // diagonal-islands SQL over the same bounded candidate pairs
      SharedPassages.maxSharedRun(t(s, dir, "documents"), "doc_id", "text",
          shingleLen = 8, maxDf = 5)
        .orderBy(col("id_a"), col("id_b"))),

    "q_t10_boilerplate" -> ((s, dir) =>
      // corpus-level boilerplate profile: share of each doc's distinct
      // 3-gram shingles appearing in >= 5 documents (df threshold chosen
      // to be non-trivial at BOTH gate scales: 151 boilerplate shingles
      // at sf0.01, 25829 at sf0.1)
      Boilerplate.stats(t(s, dir, "documents"), "doc_id", "text",
          shingleLen = 3, minDf = 5)
        .orderBy(col("id"))),

    "q_qr9_source_divergence" -> ((s, dir) =>
      // per-source token-distribution KL vs the corpus (r9, L78): the
      // mixture-governance panel — smoothed unigram distributions, each
      // term quantized once to integer 1e-9 (the Drift discipline at
      // token granularity), exact BIGINT rollup
      SourceDivergence.report(t(s, dir, "documents"), "source", "text")
        .orderBy(col("source"))),
    "q_p7_svt" -> ((s, dir) => {
      // sparse vector technique (r11, L94's iterative sibling): stream
      // the per-source count queries in key order, answer only
      // above/below the average-count threshold (derived from the same
      // scan both engines see), halt after the 5th above — the
      // mechanism that pays ε only for hits; seeded md5 discrete
      // Laplace on threshold and every query
      val d = t(s, dir, "documents").filter(col("source").isNotNull)
      val thr = d.count() / 20
      Privacy.svtAboveThreshold(d, Seq("source"), thr,
          eps = 1.0, c = 5, seed = "svt:r11")
        .orderBy(col("source"))
    }),
    "q_qr15_quantile_norm" -> ((s, dir) => {
      // quantile normalization (r11, L114): every event value replaced
      // by the pooled order statistic at its within-type quantile —
      // integer index arithmetic, value pass-through (bit-identical
      // doubles), prefix-sum + interval-join machinery
      QuantileNormalize.toPooled(t(s, dir, "events"),
          "event_id", "event_type", "value")
        .orderBy(col("id"))
    }),
    "q_qr14_ece" -> ((s, dir) => {
      // reliability diagram + ECE (r11, L110's measurement half): the
      // q_qr13 bins read as confidence claims (bin midpoint
      // (2b+1)·1e6/20) vs the empirical F-rate; ECE is the n-weighted
      // mean absolute gap — all floor division, rides on every row as
      // the corpus scalar
      val o = t(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull &&
          col("o_orderstatus").isNotNull)
        .select(
          least(floor(col("o_totalprice") / 30000), lit(9L)).as("bin"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      Isotonic.reliability(o, "bin", "y",
          b => (b * 2 + 1) * lit(50000L)) // midpoint ·1e6/20, exact
        .orderBy(col("bin"))
    }),
    "q_qr13_isotonic" -> ((s, dir) => {
      // isotonic calibration (r11, L110): price-bucket "scores" vs the
      // F-status outcome — fit(b) = max_{j≤b} min_{k≥b} of the exact
      // quantized interval means (the minimax characterization; PAV's
      // sequential pooling replays in no SQL), all floor division
      val o = t(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull &&
          col("o_orderstatus").isNotNull)
        .select(
          least(floor(col("o_totalprice") / 30000), lit(9L)).as("bin"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      Isotonic.calibrate(o, "bin", "y").orderBy(col("bin"))
    }),
    "q_qr12_cms_heavy" -> ((s, dir) => {
      // count-min sketch frequency estimates (r11, L97): the fixed-
      // memory sibling of the exact heavy-hitter path — a 4×1024
      // md5-hashed counter grid built in one aggregation, point
      // estimates = min over rows. Output: exact top-20 tokens with
      // both the exact count and the sketch estimate; the oracle
      // rebuilds the identical grid, so even the approximation error
      // is hash-gated.
      val toks = t(s, dir, "documents")
        .select(explode_outer(TextAnalysis.tokens(col("text")))
          .as("token"))
        .filter(col("token").isNotNull)
      val exact = toks.groupBy(col("token"))
        .agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("token")).limit(20)
      val sk = Cms.sketch(toks, "token")
      Cms.estimate(sk, exact.select(col("token")), "token")
        .join(exact, Seq("token"))
        .select(col("token"), col("exact_n"), col("est").as("est_n"))
        .orderBy(col("exact_n").desc, col("token"))
    }),
    "q_qr20_gini" -> ((s, dir) => {
      // Gini concentration panel (r14, L155), two granularities live:
      // source contribution within each language (near-even corpus →
      // small gini) and per-document length mass within each source
      // (length inequality → materially larger gini) — the Lorenz
      // view beside q_qr19's entropy view.
      val docs = t(s, dir, "documents")
      val bySrc = Concentration.gini(docs, "lang", "source", lit(1L))
        .withColumn("leg", lit("src_docs"))
      val byDoc = Concentration.gini(docs, "source", "doc_id",
          col("n_chars"))
        .withColumnRenamed("source", "lang") // shared output key name
        .withColumn("leg", lit("doc_chars"))
      bySrc.unionByName(byDoc)
        .select(col("leg"), col("lang").as("g"), col("n_units"),
          col("total"), col("gini_e6"))
        .orderBy(col("leg"), col("g"))
    }),
    "q_qr19_lang_diversity" -> ((s, dir) => {
      // exact entropy/evenness panel (r14, L154): per-source language
      // mix through the L151 integer log table — the second consumer
      // of the table, zero float surface, oracle replays bit-exactly.
      Diversity.entropyExact(
          t(s, dir, "documents"), "source", "lang")
        .orderBy(col("source"))
    }),
    "q_qr18_benford_chisq" -> ((s, dir) => {
      // Benford χ² verdict (r14, L153): q_qr8 shows the digit mix,
      // this scores it — two legs live at gate scale: the money
      // column (wide log-ish range) and document n_chars (narrow
      // length band — decisively non-Benford). floor BEFORE the cast
      // on both engines (DuckDB CAST(double AS BIGINT) rounds).
      val money = t(s, dir, "orders")
        .select(lit("money").as("leg"),
          floor(col("o_totalprice")).cast("long").as("v"))
      val nch = t(s, dir, "documents")
        .select(lit("nchars").as("leg"), col("n_chars").as("v"))
      // the NULL regime: a first digit hash-sampled from Benford's
      // own law (inverse-CDF over the 56-bit md5 house hash against
      // the cumulative DigitPE9 thresholds) — χ² ~ df, no reject
      val u = pmod(conv(substring(md5(col("o_orderkey").cast("string")),
        1, 14), 16, 10).cast("long"), lit(1000000000L))
      val cums = Benford.DigitPE9.scanLeft(0L)(_ + _).tail
      val digit = cums.init.map(c =>
          when(u >= c, 1L).otherwise(0L))
        .foldLeft(lit(1L))(_ + _)
      val nul = t(s, dir, "orders")
        .select(lit("benford_null").as("leg"), digit.as("v"))
      Benford.chiSquare(money.unionByName(nch).unionByName(nul),
          "leg", "v")
        .orderBy(col("leg"))
    }),
    "q_a28_kendall" -> ((s, dir) => {
      // Kendall's τ-b (r15, L184; Kendall 1938/1945): the triad's
      // third member over exactly q_a26's legs, so the three
      // association readings sit side by side — Pearson (linear),
      // Spearman (monotone via ranks), τ (monotone via pairs, the
      // P(concordant) − P(discordant) probability). len-vs-tokens
      // reads high; the 56-bit-hash leg is exchangeable ≈ 0.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull
          && col("n_chars").isNotNull)
      val tok = TextAnalysis.tokenCount(col("text"))
      val h = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(1000000L))
      val legTok = d.select(lit("len_tokens").as("leg"),
        col("n_chars").as("x"), tok.cast("long").as("y"))
      val legH = d.select(lit("len_hash").as("leg"),
        col("n_chars").as("x"), h.as("y"))
      RankTest.kendallTauB(legTok.unionByName(legH), "leg", "x", "y")
        .orderBy(col("leg"))
    }),
    "q_a28x_kendall_inversions" -> ((s, dir) => {
      // Kendall's τ-b, inversion-count form (r16, VERDICT r15 #3):
      // EXACTLY q_a28's legs through the O(grid log grid)
      // bit-decomposed inversion count instead of the pair grid —
      // same (n, conc, disc, tau_b6) row for row, so the two forms
      // diff empty at every SF and the pair-frame scale caveat is
      // retired. The len_hash leg is the continuous one (10⁶-value
      // y grid → the rank decomposition earns its keep: ~20 bit
      // levels instead of a grid² join).
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull
          && col("n_chars").isNotNull)
      val tok = TextAnalysis.tokenCount(col("text"))
      val h = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(1000000L))
      val legTok = d.select(lit("len_tokens").as("leg"),
        col("n_chars").as("x"), tok.cast("long").as("y"))
      val legH = d.select(lit("len_hash").as("leg"),
        col("n_chars").as("x"), h.as("y"))
      RankTest.kendallTauBInversions(legTok.unionByName(legH),
          "leg", "x", "y")
        .orderBy(col("leg"))
    }),
    "q_a26_spearman" -> ((s, dir) => {
      // Spearman rank correlation (r14, L166; Spearman 1904): the
      // monotone-association member beside q_a13's exact-moment
      // Pearson — outlier- and transform-proof. Two legs: n_chars vs
      // whitespace token count (monotone by construction of text →
      // ρ ≈ 0.98 at sf0.1) and n_chars vs a 56-bit-hash value
      // (exchangeable → ρ ≈ 0). Doubled midranks keep every moment
      // integral; the tail is the q_a13 one-rounded-double convention.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull
          && col("n_chars").isNotNull)
      val tok = TextAnalysis.tokenCount(col("text"))
      val h = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(1000000L))
      val legTok = d.select(lit("len_tokens").as("leg"),
        col("n_chars").as("x"), tok.cast("long").as("y"))
      val legH = d.select(lit("len_hash").as("leg"),
        col("n_chars").as("x"), h.as("y"))
      RankTest.spearman(legTok.unionByName(legH), "leg", "x", "y")
        .orderBy(col("leg"))
    }),
    "q_qr25_flag_lift" -> ((s, dir) => {
      // quality-flag co-occurrence lift (r14, L167; Brin 1997
      // "interest"): the flag-REDUNDANCY audit — flags that always
      // co-fire are one signal wearing two names (L164's confounding
      // screen, one level down). Four flags per doc: short_doc
      // (n_chars < 150) and few_tokens (< 30 whitespace tokens) are
      // length-driven twins (lift ≫ 1); lang_zh rides the zh length
      // profile; hash_flag is the independence control (lift ≈ 1
      // against everything — BECAUSE the full doc table is passed as
      // the universe; the flagged-only default would Berkson-depress
      // it to ~0.66, the collider conditioning measured first and
      // pinned in AffinitySpec). Presence semantics.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull
          && col("n_chars").isNotNull && col("lang").isNotNull)
      val tok = TextAnalysis.tokenCount(col("text"))
      val h = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(1000000000L))
      val flagged = d.select(col("doc_id"), explode(array(
          when(col("n_chars") < 150L, "short_doc"),
          when(tok < 30, "few_tokens"),
          when(col("lang") === "zh", "lang_zh"),
          when(pmod(h, lit(2L)) === 0L, "hash_flag"))).as("flag"))
        .filter(col("flag").isNotNull)
      Affinity.lift(flagged, "doc_id", "flag", universe = d)
        .orderBy(col("item_a"), col("item_b"))
    }),
    "q_qr32_mantel_haenszel" -> ((s, dir) => {
      // MH adjusted association + the CMH test (r16, L192; Mantel &
      // Haenszel 1959): the ANSWER to q_qr24's detection — the SAME
      // planted mod-100 reversal whose POOLED Δ reads negative there
      // is read here within strata: d_sign = +1 with OR_MH = 1.714
      // EXACTLY at every SF (mod-class cells scale proportionally, so
      // the per-stratum floors coincide), the paradox undone side by
      // side in the battery; the χ²₁ verdict flags at sf0.1 (CMH =
      // 39.2; 3.47 at the small gates — just under the line, honest).
      // Real leg: zh × length≥350 ADJUSTED for source strata — flags
      // at sf0.1 with d_sign = −1 (zh is SHORTER, the a30 direction,
      // source-adjusted). Hash-bit null retained at every SF.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("lang").isNotNull
          && col("n_chars").isNotNull && col("source").isNotNull)
      val u = pmod(col("doc_id"), lit(100L))
      val planted = d.select(lit("planted_reversal").as("panel"),
        when(u < 50L, "s0").otherwise("s1").as("st"),
        when(u < 10L || (u >= 50L && u < 90L), 1L).otherwise(0L)
          .as("rv"),
        when(u < 8L || (u >= 10L && u < 38L)
          || (u >= 50L && u < 62L) || u >= 90L && u < 92L, 1L)
          .otherwise(0L).as("cv"))
      val real = d.select(lit("zh_len_by_source").as("panel"),
        col("source").as("st"),
        (col("lang") === "zh").cast("long").as("rv"),
        (col("n_chars") >= 350L).cast("long").as("cv"))
      val h = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(1000000000L))
      val nul = d.select(lit("hash_null").as("panel"),
        pmod(h, lit(2L)).cast("string").as("st"),
        pmod(call_function("div", h, lit(2L)), lit(2L)).as("rv"),
        pmod(call_function("div", h, lit(4L)), lit(2L)).as("cv"))
      Contingency.mantelHaenszel(
          planted.unionByName(real).unionByName(nul),
          "panel", "st", "rv", "cv")
        .orderBy(col("panel"))
    }),
    "q_qr24_simpson" -> ((s, dir) => {
      // Simpson's-paradox reversal detector (r14, L164; Simpson 1951,
      // Yule 1903): the confounding screen behind q_qr23 — a pooled
      // 2×2 association can be the ARTIFACT of a stratum mix. Two
      // panels: a PLANTED classic reversal built from doc_id mod-100
      // ranges (both strata Δ > 0, pooled Δ < 0 — the 8/2/28/12 vs
      // 12/28/2/8 construction, scale-invariant because every mod
      // class carries ~N/100 docs), and a hash-bit null (three md5
      // bits — independent, no reversal). The oracle replays the
      // ranges and the exact cross-product signs.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull)
      val u = pmod(col("doc_id"), lit(100L))
      val planted = d.select(lit("planted").as("panel"),
        when(u < 50L, "s0").otherwise("s1").as("st"),
        when(u < 10L || (u >= 50L && u < 90L), 1L).otherwise(0L)
          .as("rv"),
        when(u < 8L || (u >= 10L && u < 38L)
          || (u >= 50L && u < 62L) || u >= 90L && u < 92L, 1L)
          .otherwise(0L).as("cv"))
      val h = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(1000000000L))
      val nul = d.select(lit("hash_null").as("panel"),
        pmod(h, lit(2L)).cast("string").as("st"),
        pmod(call_function("div", h, lit(2L)), lit(2L)).as("rv"),
        pmod(call_function("div", h, lit(4L)), lit(2L)).as("cv"))
      Contingency.simpsonReversal(planted.unionByName(nul),
          "panel", "st", "rv", "cv")
        .orderBy(col("panel"))
    }),
    "q_qr31_drift_fdr" -> ((s, dir) => {
      // BH-FDR over the REAL drift panel (r16, L187; VERDICT r15 #7):
      // q_qr30 demonstrated the step-up on a synthetic mean panel —
      // this is the production dashboard it exists for: m = 30 tests
      // from three REAL drift families — KS per source vs rest on
      // n_chars (qr11's machinery), Mann–Whitney per non-en lang vs
      // the en baseline (qr16's), Mann–Kendall daily-volume trend per
      // event type (a16's) — each emitting an exact-integer p through
      // the PValue tail tables (exp/erfc are not bit-portable across
      // libms; the tables are), BH at α = 0.05 over all of them. ONE
      // planted leg (a +150-char location shift on a quarter of the
      // docs as a pseudo-source) keeps the rejection regime live: the
      // real families read null at gate scale (measured — KS p ≥ 0.06
      // at sf0.01, the daily volume is white, the lang shifts sit
      // under the 30-test bar). The qr30 b-floor lesson is honored by
      // construction: table resolution 1e-6 clears the rank-1 bar
      // α/m ≈ 1667e-6 with three orders to spare.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull
          && col("source").isNotNull && col("lang").isNotNull)
      // KS family: 20 sources each vs the REAL rest, plus the planted
      // shifted cohort on its OWN frame — folding the plant into one
      // frame would put the shifted rows inside every real source's
      // rest baseline and manufacture drift everywhere (measured at
      // sf0.1 before splitting: 14 phantom rejections from exactly
      // that contamination)
      val real = d.select(col("source").as("g"), col("n_chars").as("v"))
      val planted = d.filter(pmod(col("doc_id"), lit(4L)) === 0L)
        .select(lit("planted_shift").as("g"),
          (col("n_chars") + lit(150L)).as("v"))
      // The planted leg keeps ONE group (planted_shift vs the real rest);
      // its KS row depends only on the planted rows' jump points and the
      // corpus-wide CDF — never on how the rest rows are labeled — so the
      // rest side collapses to a single label and perGroup computes 2
      // group legs instead of 21 (20 of which were discarded by the
      // filter; r17 optimization, guide §1.2 "don't compute things you
      // throw away"). Row-identical by construction: n1, nTotal, cumAll
      // and the planted (g, v) jump set are all unchanged.
      val ksFrame = KsDrift.perGroup(real, "g", "v").unionByName(
        KsDrift.perGroup(
            real.select(lit("__rest").as("g"), col("v"))
              .unionByName(planted), "g", "v")
          .filter(col("g") === "planted_shift"))
      val ks = ksFrame
        .select(lit("drift").as("panel"),
          concat(lit("ks:"), col("g")).as("test"),
          PValue.ksTail2E6(col("ks_num"), col("n1"), col("n2")).as("p"))
      // MW family: the qr16 legs verbatim
      val langs = d.select(col("lang").as("cmp"))
        .filter(col("cmp") =!= "en").distinct()
      val cand = d.filter(col("lang") =!= "en")
        .select(col("lang").as("cmp"), lit("cand").as("cohort"),
          col("n_chars"))
      val base = d.filter(col("lang") === "en")
        .crossJoin(broadcast(langs))
        .select(col("cmp"), lit("base").as("cohort"), col("n_chars"))
      val mw = RankTest.mannWhitney(cand.unionByName(base), "cmp",
          "cohort", "n_chars", "cand", "base")
        .select(lit("drift").as("panel"),
          concat(lit("mw:"), col("cmp")).as("test"),
          PValue.normTail2E6(col("z2_e6")).as("p"))
      // MK family: a16's daily series; z² with the continuity
      // correction z = (|S|−1)/√(var18/18) ⇒ z²_e6 = 18e6·(|S|−1)²
      // div var18; S = 0 or a fully-tied series ⇒ z² = 0 (no evidence)
      val d38 = "decimal(38,0)"
      val ev = t(s, dir, "events")
      val mkz = when(col("s_stat") === 0L || col("var18") === 0L, lit(0L))
        .otherwise(call_function("div",
          lit(18000000L).cast(d38)
            * (abs(col("s_stat")) - 1L).cast(d38)
            * (abs(col("s_stat")) - 1L).cast(d38),
          col("var18").cast(d38)).cast("long"))
      val mk = Trend.dailyVolumeMannKendall(ev, "event_type",
          Tables.epochMicros(ev, "ts"))
        .select(lit("drift").as("panel"),
          concat(lit("mk:"), col("event_type")).as("test"),
          PValue.normTail2E6(mkz).as("p"))
      Fdr.benjaminiHochberg(
          ks.unionByName(mw).unionByName(mk), "panel", "test", "p")
        .orderBy(col("rank"))
    }),
    "q_qr30_bh_fdr" -> ((s, dir) => {
      // Benjamini–Hochberg FDR control (r15, L183; Benjamini &
      // Hochberg 1995): the multiple-comparisons layer over a REAL
      // 20-test panel — one L181 randomization test per source
      // ("does src_k's mean length differ from the rest"), then the
      // step-up over the 20 p's. At α = 0.05 a 20-test panel
      // false-flags once per run on noise; BH is what a monitoring
      // dashboard should sit behind. The source list is STATIC
      // (src0..src19) so panels missing at small SFs read the
      // conservative p = 1 instead of silently vanishing.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull
          && col("source").isNotNull)
      val base = d
        .withColumn("panel", explode(array(
          (0 until 20).map(i => lit(s"src$i")): _*)))
        .select(col("panel"),
          when(col("source") === col("panel"), "a").otherwise("b")
            .as("c"),
          col("n_chars"), col("doc_id"))
      // b = 512: the p resolution 1/513 must clear BH's rank-1 bar
      // α/m = 0.0025 (the structurally-empty-discovery-set lesson,
      // measured at b = 64 and documented on the operator)
      val ps = PermTest.meanDiff(base, "panel", "c", "n_chars",
          "doc_id", "a", "b", b = 512)
        .select(lit("sources").as("family"), col("panel").as("test"),
          col("p_e6"))
      Fdr.benjaminiHochberg(ps, "family", "test", "p_e6")
        .orderBy(col("rank"))
    }),
    "q_qr29_ca_trend" -> ((s, dir) => {
      // Cochran–Armitage trend test (r15, L182): does the zh share
      // RISE with the length band — the ordered question q_qr23's
      // unordered χ² dilutes across df. Bands 0..3 at 150/250/350;
      // the hash-bit leg is the no-trend control (negative reads of
      // the trend numerator exercise toward-zero truncation live).
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull
          && col("lang").isNotNull)
      val band = when(col("n_chars") < 150L, 0L)
        .when(col("n_chars") < 250L, 1L)
        .when(col("n_chars") < 350L, 2L).otherwise(3L)
      val h = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(1000000000L))
      val zh = d.select(lit("zh_trend").as("panel"), band.as("w"),
        (col("lang") === "zh").cast("long").as("v"))
      val nul = d.select(lit("hash_null").as("panel"), band.as("w"),
        pmod(h, lit(2L)).as("v"))
      Contingency.armitageTrend(zh.unionByName(nul), "panel", "w", "v")
        .orderBy(col("panel"))
    }),
    "q_qr26_mutual_info" -> ((s, dir) => {
      // table-exact mutual information + NMI (r15, L169; Shannon
      // 1948, Kvålseth 1987): the INFORMATION lens on exactly
      // q_qr23's three grids, so the association panels read side by
      // side — lang × source carries real structure (MI ≈ 0.089
      // nats, NMI ≈ 6%), the two md5 hash bits are independent
      // (MI ≈ 0, and the documented table-floor class reads it a few
      // 1e-3 units NEGATIVE — live, stated, not clamped), zh_len's
      // weak association sits inside the floor band at this N. NO
      // G-test verdict by measured design (the 2N·ε error scaling —
      // see the operator scaladoc); the verdict on these grids is
      // q_qr23's exact Pearson χ².
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull
          && col("lang").isNotNull && col("source").isNotNull)
      val u = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(1000000000L))
      val legLen = d.select(lit("zh_len").as("panel"),
        when(col("lang") === "zh", "zh").otherwise("rest").as("rv"),
        (col("n_chars") >= 350L).cast("long").cast("string").as("cv"))
      val legNull = d.select(lit("hash_null").as("panel"),
        pmod(u, lit(2L)).cast("string").as("rv"),
        pmod(call_function("div", u, lit(2L)), lit(2L)).cast("string")
          .as("cv"))
      val legSrc = d.select(lit("lang_source").as("panel"),
        col("lang").as("rv"), col("source").as("cv"))
      Contingency.mutualInformation(
          legLen.unionByName(legNull).unionByName(legSrc),
          "panel", "rv", "cv")
        .orderBy(col("panel"))
    }),
    "q_d15_centroid_drift" -> ((s, dir) => {
      // embedding centroid drift (r15, L178): the vector-space
      // drift member — the normalized centroid gap is calibrated to
      // read ≈ 1e6 under exchangeability. MEASURED before choosing
      // legs: these embeddings are zero-mean and the labels do NOT
      // move centroids, so label_split and the vec_id-parity A/A
      // both sit in the null band while the PLANTED +0.05 re-embed
      // bias (the systematic-encoder-drift simulation) reads ≫ 1e6
      // and grows with n. cos2_e6 rides along as the direction
      // diagnostic (≈ 0 here — noise directions, the measured
      // zero-mean story).
      val e = t(s, dir, "embeddings")
        .filter(col("vec_id").isNotNull && col("embedding").isNotNull
          && col("label").isNotNull)
      val labels = e.select(lit("label_split").as("panel"),
        when(col("label") === 0, "a")
          .when(col("label") === 1, "b").as("c"),
        col("embedding"))
      val parity = e.select(lit("parity_aa").as("panel"),
        when(pmod(col("vec_id"), lit(2L)) === 0L, "a").otherwise("b")
          .as("c"),
        col("embedding"))
      val shifted = e.select(lit("planted_shift").as("panel"),
        when(pmod(col("vec_id"), lit(2L)) === 0L, "a").otherwise("b")
          .as("c"),
        when(pmod(col("vec_id"), lit(2L)) === 0L, col("embedding"))
          .otherwise(transform(col("embedding"),
            x => x.cast("double") + lit(0.05d))).as("embedding"))
      SemanticDrift.centroidCos(
          labels.unionByName(parity).unionByName(shifted),
          "panel", "c", "embedding", "a", "b")
        .orderBy(col("panel"))
    }),
    "q_a27_perm_test" -> ((s, dir) => {
      // seeded randomization test (r15, L181; Fisher 1935, Dwass
      // 1957): "could this mean gap arise from relabeling" — 64
      // deterministic md5 reassignments, exact cross-multiplied
      // compares, add-one-in p. MEASURED: zh's length effect is a
      // SHAPE effect (MW/CvM flag it) with an unremarkable MEAN —
      // this test correctly declines it (p ≈ 0.55, the cross-panel
      // contrast stated, not hidden); the PLANTED +300 shift reads
      // the minimal p = 1/65; the parity A/A reads mid-range.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull
          && col("lang").isNotNull)
      val zh = d.select(lit("zh_len").as("panel"),
        when(col("lang") === "zh", "a").otherwise("b").as("c"),
        col("n_chars"), col("doc_id"))
      val aa = d.select(lit("aa_null").as("panel"),
        when(pmod(col("doc_id"), lit(2L)) === 0L, "a").otherwise("b")
          .as("c"),
        col("n_chars"), col("doc_id"))
      // planted +300 mean shift on the a-side: the flag regime
      val bit = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(2L))
      val planted = d.select(lit("planted_shift").as("panel"),
        when(bit === 0L, "a").otherwise("b").as("c"),
        (col("n_chars") + when(bit === 0L, 300L).otherwise(0L))
          .as("n_chars"),
        col("doc_id"))
      PermTest.meanDiff(zh.unionByName(aa).unionByName(planted),
          "panel", "c", "n_chars", "doc_id", "a", "b")
        .orderBy(col("panel"))
    }),
    "q_t44_readability" -> ((s, dir) => {
      // Flesch readability panel (r15, L175; Flesch 1948, Kincaid
      // 1975): the rate-based quality member beside punct/stopword
      // ratios — reading ease and grade level from the exact
      // words/sentences/syllables cascade (vowel-run heuristic,
      // documented). Per-lang means; the zh corpus's latinized short
      // tokens read differently from en — the panel's point.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull
          && col("lang").isNotNull)
      val graded = d.select(col("lang"),
        TextAnalysis.fleschReadingEase(col("text")).as("fre"),
        TextAnalysis.fleschKincaidGrade(col("text")).as("fk"))
      graded.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          count(col("fre")).as("n_graded"),
          sum(col("fre")).as("__sf"), sum(col("fk")).as("__sk"))
        .select(col("lang"), col("n_docs"), col("n_graded"),
          when(col("n_graded") === 0L, lit(null).cast("long"))
            .otherwise(call_function("div", col("__sf"),
              col("n_graded"))).as("fre_mean_e6"),
          when(col("n_graded") === 0L, lit(null).cast("long"))
            .otherwise(call_function("div", col("__sk"),
              col("n_graded"))).as("fk_mean_e6"))
        .orderBy(col("lang"))
    }),
    "q_qr28_hill" -> ((s, dir) => {
      // Hill tail-index (r15, L179; Hill 1975): "does this length
      // distribution have a hot tail" — the shuffle-skew screen
      // quantified. Three legs: doc_len (the real lengths), a
      // PLANTED Pareto(1) tail (x = 10⁶ div (u+1) — α̂ reads ≈ 1,
      // the estimator's calibration leg), and a bounded uniform
      // (α̂ reads large — no tail). k = 30 so the smallest gate
      // corpus still carries every leg.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull)
      val h = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(1000000000L))
      val lenLeg = d.select(lit("doc_len").as("leg"),
        col("n_chars").cast("long").as("v"), col("doc_id").as("id"))
      val parLeg = d.select(lit("pareto").as("leg"),
        call_function("div", lit(1000000L),
          pmod(h, lit(100000L)) + 1L).as("v"), col("doc_id").as("id"))
      val uniLeg = d.select(lit("uniform").as("leg"),
        (pmod(h, lit(1000L)) + 1L).as("v"), col("doc_id").as("id"))
      Hill.tailIndex(
          lenLeg.unionByName(parLeg).unionByName(uniLeg),
          "leg", "v", "id", k = 30)
        .orderBy(col("leg"))
    }),
    "q_v26_avg_precision" -> ((s, dir) => {
      // average precision + max-F1 operating point (r15, L173; Davis
      // & Goadrich 2006): the PR companion of q_v22's AUC plus the
      // DECISION layer — the threshold a deployed filter would use,
      // picked by exact arithmetic. Same two legs as v22: zh scored
      // by n_chars (AP near prevalence — length ranks zh poorly,
      // matching AUC < 0.5) and the doc-parity A/A (AP ≈ prevalence
      // = 0.5, best F1 ≈ the all-positive 2/3 point — the classic
      // no-signal signature).
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull
          && col("lang").isNotNull)
      val zh = d.select(lit("zh_len").as("leg"),
        (col("lang") === "zh").cast("long").as("y"), col("n_chars"))
      val aa = d.select(lit("aa_null").as("leg"),
        pmod(col("doc_id"), lit(2L)).as("y"), col("n_chars"))
      PrCurve.averagePrecision(zh.unionByName(aa), "leg", "y",
          "n_chars")
        .orderBy(col("leg"))
    }),
    "q_qr27_cvm" -> ((s, dir) => {
      // two-sample Cramér–von Mises (r15, L180; Anderson 1962): the
      // INTEGRATED-distance drift member — KS sees the worst single
      // ECDF gap, MW a location shift, CvM accumulates the squared
      // gap over the whole support. zh-vs-rest length distributions
      // differ in shape → flags; the doc-parity A/A reads null.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull
          && col("lang").isNotNull)
      val zh = d.select(lit("zh_rest").as("leg"),
        when(col("lang") === "zh", "a").otherwise("b").as("c"),
        col("n_chars"))
      val aa = d.select(lit("aa_null").as("leg"),
        when(pmod(col("doc_id"), lit(2L)) === 0L, "a").otherwise("b")
          .as("c"),
        col("n_chars"))
      RankTest.cramerVonMises(zh.unionByName(aa), "leg", "c",
          "n_chars", "a", "b")
        .orderBy(col("leg"))
    }),
    "q_v25_fleiss_kappa" -> ((s, dir) => {
      // Fleiss' κ multi-rater agreement (r15, L172; Fleiss 1971):
      // q_v20's Cohen κ generalized to m = 3 ratings per item — the
      // crowd-labeling shape. Three length "raters" with slightly
      // shifted band thresholds agree heavily (κ ≈ 0.9); three
      // salted-hash raters are independent uniform over 3 categories
      // (κ ≈ 0 — the chance-agreement correction live, possibly
      // slightly negative, toward-zero truncation on both engines).
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull)
      def band(lo: Long, hi: Long) =
        when(col("n_chars") < lo, "short")
          .when(col("n_chars") < hi, "mid").otherwise("long")
      def hrater(salt: String) =
        pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(salt))), 1, 14), 16, 10).cast("long"), lit(3L))
          .cast("string")
      val legLen = d.select(lit("length_raters").as("panel"),
        col("doc_id").as("item"),
        explode(array(band(150L, 350L), band(160L, 360L),
          band(140L, 340L))).as("rating"))
      val legHash = d.select(lit("hash_raters").as("panel"),
        col("doc_id").as("item"),
        explode(array(hrater("r1"), hrater("r2"), hrater("r3")))
          .as("rating"))
      Agreement.fleissKappa(legLen.unionByName(legHash),
          "panel", "item", "rating", m = 3)
        .orderBy(col("panel"))
    }),
    "q_e32_acf" -> ((s, dir) => {
      // daily-volume autocorrelation grid (r15, L174; Box & Jenkins
      // 1970): lags 1..7 over the gap-filled daily series. The real
      // stream carries day-to-day structure; the scatter leg remaps
      // each event to an i.i.d. md5 day in [0, 200) — a white series
      // whose r_k hover near 0 (negative reads exercise toward-zero
      // truncation live).
      val ev = t(s, dir, "events")
      val us = graft.Tables.epochMicros(ev, "ts")
      val h = pmod(conv(substring(md5(col("event_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(200L))
      val real = ev.select(lit("daily").as("leg"), us.as("us"))
      val white = ev.filter(col("event_id").isNotNull)
        .select(lit("scatter").as("leg"),
          (h * lit(86400000000L)).as("us"))
      // planted period-2 rhythm: only EVEN days occupied — strong
      // negative lag-1 / positive lag-2 ACF, the flagged regime
      val alt = ev.filter(col("event_id").isNotNull)
        .select(lit("alternating").as("leg"),
          (pmod(h, lit(100L)) * lit(2L * 86400000000L)).as("us"))
      Acf.dailyVolumeAcf(real.unionByName(white).unionByName(alt),
          "leg", col("us"), maxLag = 7)
        .orderBy(col("leg"), col("lag"))
    }),
    "q_e33_ljung_box" -> ((s, dir) => {
      // Ljung–Box portmanteau whiteness verdict (r15, L174; Ljung &
      // Box 1978) over the q_e32 legs: one χ²₇ number per series —
      // the "is there ANY serial structure left" gate an anomaly
      // screen's residuals should pass. Built from the quantized ACF
      // (the documented two-step cascade — quantize-once would
      // overflow DECIMAL(38,0) on real series).
      val ev = t(s, dir, "events")
      val us = graft.Tables.epochMicros(ev, "ts")
      val h = pmod(conv(substring(md5(col("event_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(200L))
      val real = ev.select(lit("daily").as("leg"), us.as("us"))
      val white = ev.filter(col("event_id").isNotNull)
        .select(lit("scatter").as("leg"),
          (h * lit(86400000000L)).as("us"))
      val alt = ev.filter(col("event_id").isNotNull)
        .select(lit("alternating").as("leg"),
          (pmod(h, lit(100L)) * lit(2L * 86400000000L)).as("us"))
      Acf.dailyVolumeLjungBox(real.unionByName(white).unionByName(alt),
          "leg", col("us"), maxLag = 7)
        .orderBy(col("leg"))
    }),
    "q_v23_mcnemar" -> ((s, dir) => {
      // McNemar paired flip test (r15, L170; McNemar 1947): two
      // "pipeline versions" of the short-doc flag on the SAME docs —
      // v2 loosens the threshold 150 → 200, so every flip is
      // one-directional (b = 0, c = #docs in [150, 200)) and the test
      // flags with d_sign = −1; the A/A leg pairs two disjoint md5
      // bits — flips balance, no flag. κ (q_v20) measures agreement
      // LEVEL; this tests flip DIRECTION.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull)
      val h = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(1000000000L))
      val legShift = d.select(lit("threshold_shift").as("panel"),
        (col("n_chars") < 150L).cast("long").as("ra"),
        (col("n_chars") < 200L).cast("long").as("rb"))
      val legNull = d.select(lit("hash_aa").as("panel"),
        pmod(h, lit(2L)).as("ra"),
        pmod(call_function("div", h, lit(2L)), lit(2L)).as("rb"))
      Agreement.mcnemar(legShift.unionByName(legNull),
          "panel", "ra", "rb")
        .orderBy(col("panel"))
    }),
    "q_v24_cochran_q" -> ((s, dir) => {
      // Cochran's Q (r15, L171; Cochran 1950): do k binary flags fire
      // at the same rate on the same docs — the within-subject
      // prevalence test. flag_mix mixes three different-prevalence
      // flags (short <150, long ≥350, a hash bit) → Q flags at
      // df = 2; hash_null uses three disjoint md5 bits (identical
      // p = 1/2) → no flag.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull)
      val h = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(1000000000L))
      def legs(panel: String,
          ts: Seq[(String, org.apache.spark.sql.Column)]) =
        d.select(lit(panel).as("panel"), col("doc_id").as("subj"),
            explode(array(ts.map { case (name, v) =>
              struct(lit(name).as("t"), v.cast("long").as("v"))
            }: _*)).as("x"))
          .select(col("panel"), col("subj"),
            col("x.t").as("t"), col("x.v").as("v"))
      val mix = legs("flag_mix", Seq(
        ("short", (col("n_chars") < 150L).cast("long")),
        ("long", (col("n_chars") >= 350L).cast("long")),
        ("hash", pmod(h, lit(2L)))))
      val nul = legs("hash_null", Seq(
        ("b0", pmod(h, lit(2L))),
        ("b1", pmod(call_function("div", h, lit(2L)), lit(2L))),
        ("b2", pmod(call_function("div", h, lit(4L)), lit(2L)))))
      Agreement.cochranQ(mix.unionByName(nul),
          "panel", "subj", "t", "v")
        .orderBy(col("panel"))
    }),
    "q_qr23_independence" -> ((s, dir) => {
      // exact χ² independence + Cramér's V² (r14, L162; Pearson 1900,
      // Cramér 1946): the categorical-ASSOCIATION panel member —
      // qr18's χ² asks "does a margin match a fixed law", this asks
      // "are two labelings related". THREE regimes live at gate
      // scale: zh-vs-rest × length≥350 is associated (χ² = 6.88 >
      // 3.84 at sf0.1 — the zh length skew, the sharpest 2×2 cut;
      // the full 5-lang × band grid reads under its higher df
      // threshold, measured before picking this leg); two disjoint
      // bits of the house 56-bit md5 hash are independent (the A/A
      // leg, χ² ≈ 0); lang × source has df = 76 > 8 — the
      // beyond-table leg where chi2/V² are emitted but the verdict
      // is honestly NULL rather than an invented threshold.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull
          && col("lang").isNotNull && col("source").isNotNull)
      val u = pmod(conv(substring(md5(col("doc_id").cast("string")),
        1, 14), 16, 10).cast("long"), lit(1000000000L))
      val legLen = d.select(lit("zh_len").as("panel"),
        when(col("lang") === "zh", "zh").otherwise("rest").as("rv"),
        (col("n_chars") >= 350L).cast("long").cast("string").as("cv"))
      val legNull = d.select(lit("hash_null").as("panel"),
        pmod(u, lit(2L)).cast("string").as("rv"),
        pmod(call_function("div", u, lit(2L)), lit(2L)).cast("string")
          .as("cv"))
      val legSrc = d.select(lit("lang_source").as("panel"),
        col("lang").as("rv"), col("source").as("cv"))
      Contingency.chiSquare(
          legLen.unionByName(legNull).unionByName(legSrc),
          "panel", "rv", "cv")
        .orderBy(col("panel"))
    }),
    "q_qr22_jsd" -> ((s, dir) => {
      // table-exact Jensen–Shannon drift (r14, L159; Lin 1991): the
      // BOUNDED, SYMMETRIC member of the drift panel — PSI grows
      // without bound on disjoint support, JSD caps at ln 2, so panel
      // thresholds compare across corpora. Same cohort pairs and
      // frozen 250-char buckets as q_qr17, so PSI and JSD read off
      // the SAME grid: the A/A parity pair sits at ≈0 (it reads
      // −1.4e6 e9-units at sf0.1 — the documented table-floor
      // under-read, inside the ln(257/256) ≈ 3.9e-3-nat bound,
      // exercised LIVE), the length-skew pair at 0.175 nats. Third
      // consumer of the L151 log table.
      val docs = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull)
      val bucketed = docs.select(col("doc_id"), col("n_chars"),
        least(expr("greatest(n_chars, 0L) DIV 250"), lit(7L)).as("nb"))
      val ref = bucketed.filter(pmod(col("doc_id"), lit(2L)) === 0L)
      val curNull = bucketed.filter(pmod(col("doc_id"), lit(2L)) === 1L)
      val curDrift = curNull.filter(col("n_chars") >= 400L)
      Drift.jensenShannonExact(ref, curNull, "nb")
        .withColumn("pair", lit("aa_null"))
        .unionByName(Drift.jensenShannonExact(ref, curDrift, "nb")
          .withColumn("pair", lit("len_drift")))
        .select(col("pair"), col("bucket"), col("n_ref"), col("n_cur"),
          col("jsd_e9"))
        .orderBy(col("pair"), col("bucket"))
    }),
    "q_qr21_kruskal" -> ((s, dir) => {
      // exact Kruskal–Wallis H (r14, L157; Kruskal & Wallis 1952): the
      // k-sample member of the drift panel — qr16's Mann–Whitney asks
      // "did cohort A shift vs B", this asks "does ANY of k cohorts
      // tend larger" in ONE test instead of k pairwise ones. Two
      // panels, both regimes live: "lang" tests n_chars across all 5
      // languages (the zh length profile differs → H huge, reject at
      // df=4); "aa_null" cuts the same corpus by doc_id mod 3
      // (exchangeable → H ~ χ²₂, no reject). The three-floor cascade
      // and the df-indexed χ² table replay token-for-token.
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull
          && col("lang").isNotNull)
      val byLang = d.select(lit("lang").as("panel"),
        col("lang").as("cohort"), col("n_chars"))
      val aa = d.select(lit("aa_null").as("panel"),
        pmod(col("doc_id"), lit(3L)).cast("string").as("cohort"),
        col("n_chars"))
      RankTest.kruskalWallis(byLang.unionByName(aa), "panel",
          "cohort", "n_chars")
        .orderBy(col("panel"))
    }),
    "q_qr17_psi_exact" -> ((s, dir) => {
      // integer log-table PSI panel member (r14, L151): table-PSI over
      // frozen 250-char length buckets, TWO cohort pairs live at gate
      // scale — an A/A parity split (exchangeable → per-bucket psi ≈ 0)
      // and the q_qr4 length-skew (odd ids, long docs only → mass
      // shifts to the high buckets). Every quantity is an integer the
      // oracle replays exactly — q_qr4's libm caveat does not exist
      // on this path.
      val docs = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull)
      val bucketed = docs.select(col("doc_id"), col("n_chars"),
        least(expr("greatest(n_chars, 0L) DIV 250"), lit(7L)).as("nb"))
      val ref = bucketed.filter(pmod(col("doc_id"), lit(2L)) === 0L)
      val curNull = bucketed.filter(pmod(col("doc_id"), lit(2L)) === 1L)
      val curDrift = curNull.filter(col("n_chars") >= 400L)
      Drift.categoricalExact(ref, curNull, "nb")
        .withColumn("pair", lit("aa_null"))
        .unionByName(Drift.categoricalExact(ref, curDrift, "nb")
          .withColumn("pair", lit("len_drift")))
        .select(col("pair"), col("bucket"), col("n_ref"), col("n_cur"),
          col("psi_e9"))
        .orderBy(col("pair"), col("bucket"))
    }),
    "q_qr16_rank_drift" -> ((s, dir) => {
      // exact Mann–Whitney rank-sum drift (r13, L139; Mann & Whitney
      // 1947): the ORDINAL member of the drift panel — q_qr11's KS
      // asks "any CDF difference", this asks the sharper "does one
      // cohort tend larger", with more power against location shifts.
      // Per non-en language vs the en baseline on n_chars: at sf0.1,
      // zh flags (z² = 7.05 — the generator's zh length profile really
      // does sit higher) while de/es/fr come out null (z² ≤ 0.32) —
      // both regimes live at gate scale. Doubled midranks keep ties
      // integral; the z² is one exact DECIMAL(38,0)/HUGEINT rational.
      // The en baseline replicates per comparison group (4× here —
      // comparisons × baseline is grid-scale, and the 4-row lang frame
      // broadcasts).
      val d = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull
          && col("lang").isNotNull)
      val langs = d.select(col("lang").as("cmp"))
        .filter(col("cmp") =!= "en").distinct()
      val cand = d.filter(col("lang") =!= "en")
        .select(col("lang").as("cmp"), lit("cand").as("cohort"),
          col("n_chars"))
      val base = d.filter(col("lang") === "en")
        .crossJoin(broadcast(langs))
        .select(col("cmp"), lit("base").as("cohort"), col("n_chars"))
      RankTest.mannWhitney(cand.unionByName(base), "cmp", "cohort",
          "n_chars", "cand", "base")
        .orderBy(col("cmp"))
    }),
    "q_qr11_ks_drift" -> ((s, dir) =>
      // exact two-sample KS per source vs rest-of-corpus (r10, L87):
      // the parameter-free member of the drift panel (PSI needs
      // buckets, KL a smoothing constant) — exact BIGINT sup numerator
      // evaluated only at each source's OWN jump points (no
      // source×value grid; the oracle builds the grid at oracle
      // scale), corpus CDF via partition-offset prefix sum (no
      // single-task global window)
      KsDrift.perGroup(t(s, dir, "documents"), "source", "n_chars")
        .select(col("g").as("source"), col("n1"), col("n2"),
          col("ks_num"), col("ks"))
        .orderBy(col("source"))),
    "q_qr10_divergent_tokens" -> ((s, dir) =>
      // the WHICH behind q_qr9's HOW MUCH: top-3 over-represented
      // tokens per source, deterministic (contribution DESC, token ASC)
      SourceDivergence.topTokens(t(s, dir, "documents"), "source", "text",
          k = 3)
        .orderBy(col("source"), col("rank"))),

    "q_qr8_benford" -> ((s, dir) => {
      // first-digit (Benford) distribution of the money column (r8) —
      // the classic synthetic-data / fraud smell test as a QC panel:
      // digit counts plus integral ppm shares (the grid is 9 rows, so
      // the share window is trivial)
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      t(s, dir, "orders")
        .select(substring(floor(col("o_totalprice")).cast("long")
          .cast("string"), 1, 1).as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .select(col("digit"), col("n"),
          call_function("div", col("n") * lit(1000000L),
            sum(col("n")).over(w)).as("share_e6"))
        .orderBy(col("digit"))
    }),
    "q_qr7_contamination_matrix" -> ((s, dir) =>
      // cross-source contamination matrix (r8, L72): q_t11's rare-
      // passage pairs rolled up per canonical source pair — the
      // governance panel behind mixture weights; same (8, 5, 3)
      // parameters so the pair set is the proven one
      SharedPassages.sourceMatrix(t(s, dir, "documents"), "doc_id",
          "text", "source", shingleLen = 8, maxDf = 5, minShared = 3)
        .orderBy(col("src_a"), col("src_b"))),
    "q_qr6_length_histogram" -> ((s, dir) =>
      // dataset-card distribution panel (r8, L66): sparse equi-width
      // histogram of document length per source, integer-exact bin
      // indices in decimal arithmetic, out-of-range mass in explicit
      // under/overflow bins (both non-empty at the gate scale: corpus
      // lengths span 48..553 vs the [100, 500) range)
      QualityReport.histogram(t(s, dir, "documents"), Seq("source"),
          "n_chars", lo = 100L, hi = 500L, bins = 8)
        .orderBy(col("source"), col("bin"))),

    // ------------------------------------------- privacy release gates
    "q_p3_k_anonymity" -> ((s, dir) =>
      // k-anonymity suppression (r8, L65) over (nation, segment) as the
      // quasi-identifier pair: rows in look-alike groups under k=12 are
      // suppressed whole (~12 expected rows/group at the gate scale, so
      // the threshold genuinely bites)
      Privacy.kAnonymous(t(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), k = 12)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),
    "q_p4_l_diversity" -> ((s, dir) =>
      // the privacy audit table behind both gates: group size, distinct
      // sensitive values (account balance), and 0/1 verdicts at k=12/l=10
      Privacy.groupReport(t(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 12, l = 10)
        .orderBy(col("c_nationkey"), col("c_mktsegment"))),
    "q_p6_dp_counts" -> ((s, dir) =>
      // seeded ε-DP noisy count release (r11, L94; VERDICT r10 #5):
      // per-(lang, source) document counts + discrete Laplace noise —
      // two md5-derived geometric draws per CELL (never per corpus
      // row), ε=1, Δ=1; the oracle replays uniforms and inverse CDF
      // bit-for-bit. True counts never appear in the output.
      Privacy.dpCounts(t(s, dir, "documents"), Seq("lang", "source"),
          eps = 1.0, seed = "r11")
        .orderBy(col("lang"), col("source"))),

    // -------------------------------------- composed end-to-end pipeline
    "q_lp_training_prep" -> ((s, dir) =>
      // the FULL prep chain (scrub → exact dedup → near-dup prune →
      // quality filter → per-source cap → split → pack) against an oracle
      // that recomputes every stage exhaustively — the flagship
      // composition check. LSH parity holds because the 0.8 threshold
      // sits in the banding family's certain-recall band (same argument
      // as q_d2). The cap (15/source) BITES at the sf0.01 gate, so the
      // oracle checks the stage, not a no-op.
      graft.LlmPrep.run(t(s, dir, "documents"), capPerSource = Some(15))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          countDistinct(concat_ws("#", col("source"), col("pack_id")))
            .as("n_packs"))
        .orderBy(col("split"))),

    "q_qr2_corpus_card" -> ((s, dir) => {
      // the data card a curation run ships with: per-source volumetry,
      // token mass, quality mass, language mix, exact-dup membership.
      // ONE scan: text reduces to a NARROW (source, lang, nt, q, fp)
      // frame, dup membership is a count-over-fp window on that frame —
      // an aggregate-and-rejoin would scan the corpus (and run the
      // regex-normalize+md5 fingerprint) twice, the q_d3 defect class.
      // sum_quality, not avg: a 2-dp sum rounds engine-portably; an
      // average can land on a 4-dp rounding boundary.
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
      t(s, dir, "documents").select(col("source"), col("lang"),
          TextAnalysis.tokenCount(col("text")).as("nt"),
          round(TextAnalysis.qualityScore(col("text")), 2).as("q"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .withColumn("dup", count(lit(1)).over(w) > 1)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("total_tokens"),
          round(sum(col("q")), 2).as("sum_quality"),
          count(when(col("lang") === "en", 1)).as("n_en"),
          count(when(col("dup"), 1)).as("n_dup"))
        .orderBy(col("source"))
    }),

    // ------------------------------------------- approx distinct (A2 ext)
    "q_a2x_approx_distinct" -> ((s, dir) =>
      // scale-out variant of A2, sketch-based — r9 gives it the q_a2y
      // error-bound treatment (VERDICT r8 #3): the HLL value itself
      // cannot be oracled, but (exact count, "sketch within 5% of
      // exact") is a fully driver-gated pair; rsd=0.02 makes the 5%
      // bound > 2σ headroom. Retires the battery's only `no_oracle` red.
      t(s, dir, "orders").agg(
          countDistinct(col("o_custkey")).as("exact_u"),
          approx_count_distinct(col("o_custkey"), rsd = 0.02).as("__a"))
        .select(col("exact_u"),
          (abs(col("__a") - col("exact_u")) * lit(100L) <=
            col("exact_u") * lit(5L)).cast("int").as("err_ok"))),
    "q_t45_ndcg" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // Ranked-retrieval scorecard (r17, L201): NDCG@10 + MRR@10 —
      // the eval layer over the retrieval stack (BM25 L60, RRF L92,
      // ANN v-series). Three panels: perfect_ranker (candidates
      // ranked BY their own graded relevance — ndcg_ppm = 10⁶ and
      // mrr_e6 = 10⁶ exactly, the metric's top end pinned);
      // hash_ranker (the SAME candidates and judgments ranked by an
      // independent md5 key — the chance baseline, measured);
      // bm25_dup (real — the q_t22 BM25 top-20 page scored against a
      // graded 'dup'-occurrence judgment: the ranking is 3-term +
      // length-normalized, the judgment single-term, so NDCG reads
      // high-but-not-1, measured not assumed).
      val docs = t(s, dir, "documents").filter(col("doc_id").isNotNull)
      val md = md5(col("doc_id").cast("string"))
      val rel = pmod(conv(substring(md, 1, 2), 16, 10).cast("long"),
        lit(4L))
      val rkey = conv(substring(md, 3, 14), 16, 10).cast("long")
      val base = docs.select(col("doc_id"),
        pmod(col("doc_id"), lit(20L)).cast("string").as("qid"),
        rel.as("rel"), rkey.as("rkey"))
      val wPerf = Window.partitionBy(col("qid"))
        .orderBy(col("rel").desc, col("doc_id"))
      val perfect = base.select(lit("perfect_ranker").as("panel"),
        col("qid"), row_number().over(wPerf).cast("long").as("rank"),
        col("rel"))
      val wHash = Window.partitionBy(col("qid"))
        .orderBy(col("rkey").desc, col("doc_id"))
      val hashed = base.select(lit("hash_ranker").as("panel"),
        col("qid"), row_number().over(wHash).cast("long").as("rank"),
        col("rel"))
      val page = Bm25.topK(docs, "doc_id", "text",
        Seq("dup", "spark", "vector"), k = 20)
      val wB = Window.orderBy(col("score_e6").desc, col("doc_id"))
      val dupGrade = least(lit(3L), call_function("div",
        length(col("text")) -
          length(replace(col("text"), lit("dup"), lit(""))),
        lit(3L)).cast("long"))
      val bm = page.join(docs.select(col("doc_id"), col("text")),
          "doc_id")
        .select(lit("bm25_dup").as("panel"), lit("q0").as("qid"),
          row_number().over(wB).cast("long").as("rank"),
          dupGrade.as("rel"))
      RankEval.ndcgMrrAtK(
          perfect.unionByName(hashed).unionByName(bm),
          "panel", "qid", "rank", "rel", k = 10)
        .orderBy(col("panel"))
    }),
    "q_a2y_approx_distinct_grouped" -> ((s, dir) =>
      // the q_v2 recall-report trick applied to HLL (r8): per group the
      // engine emits the EXACT distinct count (oracle-recomputable) and
      // a boolean error-bound verdict on its own sketch — the sketch
      // value itself can't be oracled, but the claim "within 5% of
      // exact, per group" becomes a driver-gated integer. rsd=0.02 ⇒
      // 5% is > 2σ headroom on every group
      t(s, dir, "orders").groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("exact_u"),
          approx_count_distinct(col("o_custkey"), rsd = 0.02).as("__a"))
        .select(col("o_orderpriority"), col("exact_u"),
          (abs(col("__a") - col("exact_u")) * lit(100L) <=
            col("exact_u") * lit(5L)).cast("int").as("err_ok"))
        .orderBy(col("o_orderpriority"))))

  /** Shared q_j8/q_j9 CTE chain: the SCD2 history that init(old, t=0) +
    * merge(new, t=1000) produces, replayed as the three outcome classes
    * of the same FULL OUTER join. */
  private val duckScd2Hist: String =
    """oldS AS (SELECT doc_id, text FROM documents
              WHERE doc_id % 7 <> 0),
          newS AS (SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN text || ' v2'
                     ELSE text END AS text
              FROM documents WHERE doc_id % 5 <> 0),
          j AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                  o.text AS ot, n.text AS nt,
                  o.doc_id IS NOT NULL AS has_o,
                  n.doc_id IS NOT NULL AS has_n
                FROM oldS o FULL OUTER JOIN newS n
                  ON o.doc_id = n.doc_id),
          h AS (
            SELECT doc_id, ot AS v, CAST(0 AS BIGINT) AS valid_from_us,
                   CAST(NULL AS BIGINT) AS valid_to_us, TRUE AS is_current
            FROM j WHERE has_o AND (NOT has_n
                                    OR ot IS NOT DISTINCT FROM nt)
            UNION ALL
            SELECT doc_id, ot, 0, 1000, FALSE FROM j
            WHERE has_o AND has_n AND ot IS DISTINCT FROM nt
            UNION ALL
            SELECT doc_id, nt, 1000, NULL, TRUE FROM j
            WHERE has_n AND (NOT has_o OR ot IS DISTINCT FROM nt))"""

  /** q_g1 oracle: the PageRank recurrence unrolled to 5 explicit CTE
    * rounds — every stage is BIGINT floor division (`//` ≡ Spark `DIV`
    * on the nonnegative values here), so equality is digit-exact with
    * no float surface at all. */
  private val pagerankOracle: String = {
    val iters = (1 to 5).map { k =>
      s"""i$k AS (SELECT e.dst AS id,
               CAST(SUM(p.pr // d.deg) AS BIGINT) AS infl
             FROM e JOIN p${k - 1} p ON e.src = p.id
                  JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
          p$k AS (SELECT nodes.id,
                    (150000000000 // (1000 * n)) +
                    (850 * COALESCE(i$k.infl, 0)) // 1000 AS pr
                  FROM nodes CROSS JOIN c
                  LEFT JOIN i$k ON nodes.id = i$k.id)"""
    }.mkString(",\n")
    s"""WITH pairs AS (SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS cust,
             CAST(l.l_suppkey + 1000000 AS BIGINT) AS supp
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        e AS (SELECT DISTINCT src, dst FROM (
                SELECT cust AS src, supp AS dst FROM pairs
                UNION ALL SELECT supp, cust FROM pairs)),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        c AS (SELECT COUNT(*) AS n FROM nodes),
        p0 AS (SELECT id, 1000000000 // n AS pr FROM nodes CROSS JOIN c),
        $iters
       SELECT id, CAST(pr AS BIGINT) AS pr_e9 FROM p5 ORDER BY id"""
  }

  /** Exhaustive exact near-dup oracle (all-pairs is fine at sf0.01: 500
    * docs → 125k pairs in DuckDB; the Spark side must NOT do this). */
  private val nearDupOracle: String = {
    s"""WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, greatest(len($duckToks) - 2, 0) + 1),
                   i -> array_to_string(($duckToks)[i:i+2], ' '))) AS sh
          FROM documents)
        SELECT id_a, id_b, jaccard FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                       nullif(len(list_distinct(list_concat(a.sh, b.sh))), 0),
                       6) AS jaccard
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        WHERE jaccard >= 0.8
        ORDER BY id_a, id_b"""
  }

  /** Exhaustive cluster oracle: the same exact pair computation as
    * [[nearDupOracle]], then component minima via recursive reachability —
    * DuckDB's recursive CTE dedupes with UNION, so the fixpoint
    * terminates. The pair CTEs are AS MATERIALIZED: DuckDB inlines plain
    * CTEs, and inlining `e` into the recursive part re-executes the
    * all-pairs Jaccard subquery EVERY iteration (observed: the sf0.1
    * validation pinned a core for 35+ minutes). Measured at the sf0.01
    * gate: 24 s plain → 11 s materialized, identical 47 rows. The oracle
    * stays quadratic by design (it is the exhaustive ground truth); at
    * sf0.1 the one-shot 12.5M-pair intersection itself costs tens of
    * minutes — validate the cluster oracle at the gate scale only. */
  private val clusterCtes: String =
    s"""WITH RECURSIVE sh AS MATERIALIZED (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, greatest(len($duckToks) - 2, 0) + 1),
                   i -> array_to_string(($duckToks)[i:i+2], ' '))) AS sh
          FROM documents),
        p AS MATERIALIZED (SELECT id_a, id_b FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                       nullif(len(list_distinct(list_concat(a.sh, b.sh))), 0),
                       6) AS jaccard
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
          WHERE jaccard >= 0.8),
        e AS MATERIALIZED (SELECT id_a AS s, id_b AS d FROM p
              UNION SELECT id_b, id_a FROM p),
        r(s, d) AS (
          SELECT s, d FROM e
          UNION
          SELECT r.s, e.d FROM r JOIN e ON r.d = e.s WHERE e.d <> r.s)"""

  private val clusterOracle: String =
    s"""$clusterCtes
        SELECT s AS id, least(s, MIN(d)) AS cluster
        FROM r GROUP BY s ORDER BY id"""

  /** Boilerplate oracle: document frequency over literal n-gram strings
    * (the engine rides 64-bit hashes — same collision-freedom assumption
    * as every hashed query in the battery). */
  private val boilerplateOracle: String =
    s"""WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(1, greatest(len($duckToks) - 2, 0) + 1),
                   i -> array_to_string(($duckToks)[i:i+2], ' '))) AS sh
          FROM documents),
        ex AS (SELECT doc_id, unnest(sh) AS g FROM sh),
        boiler AS (SELECT g FROM ex GROUP BY g HAVING COUNT(*) >= 5),
        nb AS (SELECT doc_id, COUNT(*) AS n_boiler
               FROM ex JOIN boiler USING (g) GROUP BY doc_id)
        SELECT s.doc_id AS id,
               CAST(len(s.sh) AS INTEGER) AS n_shingles,
               CAST(COALESCE(nb.n_boiler, 0) AS BIGINT) AS n_boiler,
               ROUND(CASE WHEN len(s.sh) = 0 THEN 0.0
                     ELSE COALESCE(nb.n_boiler, 0) * 1.0 / len(s.sh) END,
                     4) AS boiler_frac
        FROM sh s LEFT JOIN nb ON s.doc_id = nb.doc_id ORDER BY id"""

  /** Shared oracle for the three ANN recall reports — identical SQL:
    * only the engine-side floor differs, and the oracle's declaration is
    * TRUE for all of them. */
  private lazy val annRecallOracle: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id < 5),
             c AS (SELECT vec_id AS neighbor_id, embedding AS cv
                   FROM embeddings WHERE vec_id >= 5),
             s AS (SELECT query_id, neighbor_id,
                     ROUND(CASE WHEN sqrt(${duckNormSq("qv")}) = 0
                                  OR sqrt(${duckNormSq("cv")}) = 0 THEN 0.0
                           ELSE $duckDot / (sqrt(${duckNormSq("qv")})
                                            * sqrt(${duckNormSq("cv")})) END,
                           6) AS sim
                   FROM c CROSS JOIN q),
             e AS (SELECT query_id, sim,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS rank
                   FROM s)
       SELECT query_id, sim AS exact_kth_sim, TRUE AS recall_ok
       FROM e WHERE rank = 3 ORDER BY query_id"""

  // q_v12: the MIPS twin of annRecallOracle — the exact baseline ranks
  // by RAW inner product (no normalization; magnitude is the point)
  private lazy val mipsRecallOracle: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id < 5),
             c AS (SELECT vec_id AS neighbor_id, embedding AS cv
                   FROM embeddings WHERE vec_id >= 5),
             s AS (SELECT query_id, neighbor_id,
                     ROUND($duckDot, 6) AS score
                   FROM c CROSS JOIN q),
             e AS (SELECT query_id, score,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score DESC, neighbor_id) AS rank
                   FROM s)
       SELECT query_id, score AS exact_kth_score, TRUE AS recall_ok
       FROM e WHERE rank = 3 ORDER BY query_id"""

  private val duckDot =
    "list_sum(list_transform(range(1, len(qv) + 1), " +
      "i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))"
  private def duckNormSq(v: String) =
    s"list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

  /** Exhaustive exact embedding near-dup oracle — shared by the broadcast
    * baseline (q_d4) and the LSH scale path (q_d4x). */
  private val embeddingNearDupOracle: String =
    s"""SELECT id_a, id_b, sim FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 ROUND(
                   list_sum(list_transform(range(1, len(a.embedding) + 1),
                     i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                   / (sqrt(${duckNormSq("a.embedding")})
                      * sqrt(${duckNormSq("b.embedding")})), 6) AS sim
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        WHERE sim >= 0.45 ORDER BY id_a, id_b"""

  /** q_d7 oracle: exhaustive embedding pairs (same sim calc + 0.45
    * threshold as [[embeddingNearDupOracle]]) → recursive-CTE reachability
    * (the [[clusterOracle]] pattern) → min-id keeper per component;
    * unclustered docs keep with NULL cluster. */
  private val semanticPruneOracle: String =
    s"""WITH RECURSIVE p AS MATERIALIZED (
          SELECT id_a, id_b FROM (
            SELECT CAST(a.vec_id AS BIGINT) AS id_a,
                   CAST(b.vec_id AS BIGINT) AS id_b,
                   ROUND(
                     list_sum(list_transform(range(1, len(a.embedding) + 1),
                       i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                     / (sqrt(${duckNormSq("a.embedding")})
                        * sqrt(${duckNormSq("b.embedding")})), 6) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
          WHERE sim >= 0.45),
        e AS MATERIALIZED (SELECT id_a AS s, id_b AS d FROM p
              UNION SELECT id_b, id_a FROM p),
        r(s, d) AS (
          SELECT s, d FROM e
          UNION
          SELECT r.s, e.d FROM r JOIN e ON r.d = e.s WHERE e.d <> r.s),
        comp AS (SELECT s AS id, least(s, MIN(d)) AS cluster
                 FROM r GROUP BY s)
        SELECT CAST(emb.vec_id AS BIGINT) AS vec_id, comp.cluster,
               CAST(COALESCE(emb.vec_id = comp.cluster, TRUE) AS INT) AS keep
        FROM embeddings emb LEFT JOIN comp ON emb.vec_id = comp.id
        ORDER BY vec_id"""

  /** q_e1 / q_e1x oracle — 12 h gap in micros = 43200000000; epoch_us(ts)
    * is the same epoch-micros view the Spark side applies
    * (Tables.epochMicros). Shared by the plain and chunked sessionize
    * plans. */
  private val sessionizeOracle: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
          g AS (SELECT user_id, event_id, us,
                  CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w > 43200000000
                       THEN 1 ELSE 0 END AS ns
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
          s AS (SELECT user_id, us,
                  SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
                FROM g)
       SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
              COUNT(*) AS n_events,
              MIN(us) AS session_start_us, MAX(us) AS session_end_us
       FROM s GROUP BY user_id, session_idx
       ORDER BY user_id, session_idx"""

  val oracles: Map[String, String] = Map(
    // q_s17: DIRECT one-pass register replay (the merge path the
    // engine runs is algebraically identical); same 56-bit md5, the
    // bin()-length ρ, the HUGEINT 2^(49−M) common-denominator sum,
    // and the L151 table-ln linear-counting branch token-for-token
    "q_s17_hll" ->
      s"""WITH base AS (
            SELECT 'docs' AS leg, lang AS grp,
                   CAST(doc_id AS VARCHAR) AS k
            FROM documents
            WHERE doc_id IS NOT NULL AND lang IS NOT NULL
           UNION ALL
            SELECT 'orders', l_returnflag, CAST(l_orderkey AS VARCHAR)
            FROM lineitem
            WHERE l_orderkey IS NOT NULL AND l_returnflag IS NOT NULL),
          h AS (SELECT leg, grp,
                CAST(concat('0x', substr(md5(k), 1, 14)) AS BIGINT) AS h
              FROM base),
          rj AS (SELECT leg, grp, h // ${Hll.W} AS j, h % ${Hll.W} AS w
              FROM h),
          r AS (SELECT leg, grp, j,
                MAX(CASE WHEN w = 0 THEN 49
                    ELSE 49 - LENGTH(bin(w)) END) AS rho
              FROM rj GROUP BY 1, 2, 3),
          gs AS (SELECT DISTINCT leg, grp FROM base),
          grid AS (SELECT leg, grp, jj.j FROM gs
              CROSS JOIN (SELECT unnest(range(0, 256)) AS j) jj),
          reg AS (SELECT grid.leg, grid.grp, COALESCE(rho, 0) AS m
              FROM grid LEFT JOIN r ON r.leg = grid.leg
                AND r.grp = grid.grp AND r.j = grid.j),
          agg AS (SELECT leg, grp,
                SUM(CAST(power(2, 49 - m) AS HUGEINT)) AS d,
                CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS vz
              FROM reg GROUP BY 1, 2),
          raw AS (SELECT leg, grp, vz,
                CAST(${Hll.RawNum} // (1000000 * d) AS BIGINT) AS raw
              FROM agg),
          k0 AS (SELECT *, CAST(256 AS BIGINT) AS num,
                GREATEST(vz, 1) AS den FROM raw),
          kz AS (SELECT *, CAST(LENGTH(bin(num)) - LENGTH(bin(den))
                AS BIGINT) AS kz0 FROM k0),
          kk AS (SELECT *, CASE WHEN
                CAST(num AS HUGEINT)
                  * CAST(power(2, GREATEST(-kz0, 0)) AS HUGEINT)
                < CAST(den AS HUGEINT)
                  * CAST(power(2, GREATEST(kz0, 0)) AS HUGEINT)
                THEN kz0 - 1 ELSE kz0 END AS kke FROM kz),
          mm AS (SELECT *, (CAST(num AS HUGEINT)
                   * CAST(power(2, GREATEST(-kke, 0)) AS HUGEINT) * 256)
                // (CAST(den AS HUGEINT)
                   * CAST(power(2, GREATEST(kke, 0)) AS HUGEINT)) - 256
                AS mi FROM kk),
          ll AS (SELECT *, kke * ${graft.operators.Drift.Ln2E9}
                + (${graft.operators.Drift.MantissaLnE9
                      .mkString("[", ",", "]")})[CAST(mi AS INT) + 1]
                AS ln_e9 FROM mm),
          ex AS (SELECT leg, grp,
                CAST(COUNT(DISTINCT k) AS BIGINT) AS n_exact
              FROM base GROUP BY 1, 2)
         SELECT ll.leg, ll.grp, n_exact, vz AS v_zero,
                CAST(CASE WHEN vz > 0 AND raw <= 640
                  THEN (256 * ln_e9) // 1000000000
                  ELSE raw END AS BIGINT) AS est
         FROM ll JOIN ex ON ex.leg = ll.leg AND ex.grp = ll.grp
         ORDER BY ll.leg, ll.grp""",
    "q_t1_token_stats" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
            CAST(SUM(len($duckToks)) AS BIGINT) AS total_tokens,
            ROUND(AVG(CASE WHEN len($duckToks) = 0 THEN 0.0
              ELSE list_sum(list_transform($duckToks, t -> length(t))) * 1.0
                   / len($duckToks) END), 4) AS avg_word_len
          FROM documents GROUP BY lang ORDER BY lang""",
    "q_t2_quality" ->
      s"""SELECT doc_id,
            CAST(length(text) AS INTEGER) AS n_chars,
            CAST(len($duckToks) AS INTEGER) AS n_tokens,
            ROUND(CASE WHEN length(text) = 0 THEN 0.0
              ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0
                   / length(text) END, 4) AS punct_ratio,
            ROUND(CASE WHEN len($duckToks) = 0 THEN 0.0
              ELSE len(list_filter($duckToks, t -> list_contains(
                     ['the','a','of','and','to','in','is','it','that','for'], t))) * 1.0
                   / len($duckToks) END, 4) AS stopword_ratio,
            CAST(ROUND(
              (CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1.0 ELSE 0.0 END) * 0.4 +
              (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
                 ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0
                      / length(text) END) < 0.2 THEN 1.0 ELSE 0.0 END) * 0.2 +
              (CASE WHEN (CASE WHEN len($duckToks) = 0 THEN 0.0
                 ELSE len(list_filter($duckToks, t -> list_contains(
                        ['the','a','of','and','to','in','is','it','that','for'], t))) * 1.0
                      / len($duckToks) END) > 0.02 THEN 1.0 ELSE 0.0 END) * 0.2 +
              (CASE WHEN (CASE WHEN len($duckToks) = 0 THEN 0.0
                 ELSE list_sum(list_transform($duckToks, t -> length(t))) * 1.0
                      / len($duckToks) END) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) * 0.2,
              2) AS DOUBLE) AS quality
          FROM documents WHERE doc_id < 50 ORDER BY doc_id""",
    // q_t18: every ratio is a double division of exact integer counts in
    // the same order as the Spark side; replace-counting is
    // non-overlapping on both engines; `keep` compares UNROUNDED ratios.
    "q_t18_gopher_rules" ->
      s"""WITH tk AS (
            SELECT doc_id, text,
              $duckToks AS toks,
              CASE WHEN length(trim(lower(text))) = 0 THEN []
                ELSE string_split_regex(trim(lower(text)), '\\s+') END AS ltoks,
              string_split(text, chr(10)) AS ls
            FROM documents WHERE doc_id < 60),
          m AS (
            SELECT doc_id,
              CAST(len(toks) AS INTEGER) AS n_words,
              CASE WHEN len(toks) = 0 THEN 0.0
                ELSE list_sum(list_transform(toks, t -> length(t))) * 1.0
                     / len(toks) END AS mwl,
              CASE WHEN len(toks) = 0 THEN 0.0
                ELSE (length(text) - length(replace(text, '#', ''))) * 1.0
                     / len(toks) END AS hashr,
              CASE WHEN len(toks) = 0 THEN 0.0
                ELSE ((length(text) - length(replace(text, '...', ''))) // 3
                      + (length(text) - length(replace(text, '…', ''))))
                     * 1.0 / len(toks) END AS ellr,
              CASE WHEN len(ls) = 0 THEN 0.0
                ELSE len(list_filter(ls,
                       l -> regexp_matches(ltrim(l), '^[•*-]'))) * 1.0
                     / len(ls) END AS bullr,
              CASE WHEN len(ls) = 0 THEN 0.0
                ELSE len(list_filter(ls,
                       l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$$'))) * 1.0
                     / len(ls) END AS elliner,
              CASE WHEN len(toks) = 0 THEN 0.0
                ELSE len(list_filter(toks,
                       t -> regexp_matches(t, '[a-zA-Z]'))) * 1.0
                     / len(toks) END AS alphar,
              CAST(len(list_filter(
                ['the','be','to','of','and','that','have','with'],
                w -> list_contains(ltoks, w))) AS INTEGER) AS n_stop
            FROM tk)
          SELECT doc_id, n_words,
            ROUND(mwl, 4) AS mean_word_len,
            ROUND(hashr, 4) AS hash_ratio,
            ROUND(ellr, 4) AS ellipsis_ratio,
            ROUND(bullr, 4) AS bullet_line_ratio,
            ROUND(elliner, 4) AS ellipsis_line_ratio,
            ROUND(alphar, 4) AS alpha_word_ratio,
            n_stop AS n_req_stopwords,
            CAST(CASE WHEN n_words BETWEEN 50 AND 100000
              AND mwl BETWEEN 3.0 AND 10.0
              AND hashr <= 0.1 AND ellr <= 0.1
              AND bullr <= 0.9 AND elliner <= 0.3
              AND alphar >= 0.8 AND n_stop >= 2
              THEN 1 ELSE 0 END AS BIGINT) AS keep
          FROM m ORDER BY doc_id""",
    "q_t3_langid" -> {
      val langs = TextAnalysis.LangMarkers
      val scores = langs.map { case (l, ws) => l -> duckMarkerScore(ws) }
      val allZero = scores.map { case (_, e) => s"$e = 0" }.mkString(" AND ")
      val chain = scores.zipWithIndex.map { case ((l, e), i) =>
        val ge = scores.zipWithIndex.collect { case ((_, o), j) if j != i =>
          s"$e >= $o" }.mkString(" AND ")
        s"WHEN $ge THEN '$l'"
      }.mkString(" ")
      s"""SELECT lid, COUNT(*) AS n FROM (
            SELECT CASE WHEN $allZero THEN 'und' $chain ELSE 'und' END AS lid
            FROM documents)
          GROUP BY lid ORDER BY lid"""
    },
    "q_t5_tfidf" ->
      s"""WITH terms AS (
            SELECT doc_id AS id, unnest($duckToks) AS term FROM documents),
          tf AS (SELECT id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
          dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
          n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
          SELECT id, term, tf, df,
                 ROUND(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4) AS tfidf
          FROM tf JOIN dfr USING (term), n
          WHERE id < 20 ORDER BY id, term""",
    // q_t6: replays the portable winnowing sketch value for value — the
    // k=3 space-joined token grams, the md5-60-bit positional hash
    // (15 hex digits, DSIR's convention widened), and the w=4 window
    // min-select with the same short-doc clamp (one whole-sequence
    // window when fewer than w positions exist; slice-past-end clamps
    // identically on both engines). list_distinct mirrors the sketch's
    // array_distinct; empty sketches drop via unnest ≡ explode.
    "q_t6_winnowing" ->
      s"""WITH tk AS (SELECT doc_id, $duckToks AS tk FROM documents
              WHERE doc_id < 50),
          hs AS (SELECT doc_id, CASE WHEN len(tk) < 3 THEN []
                   ELSE list_transform(range(1, len(tk) - 1),
                     i -> CAST(concat('0x',
                       substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]),
                         1, 15)) AS BIGINT)) END AS hs
                 FROM tk),
          sk AS (SELECT doc_id, list_distinct(list_transform(
                   range(1, greatest(len(hs) - 3, 1) + 1),
                   i -> list_min(list_slice(hs, i, i + 3)))) AS sketch
                 FROM hs WHERE len(hs) > 0)
         SELECT doc_id, unnest(sketch) AS fp FROM sk
         ORDER BY doc_id, fp""",
    "q_t4_fingerprint" ->
      """SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_distinct,
           MIN(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS min_fp,
           MAX(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS max_fp
         FROM documents""",
    "q_d1_exact_dedup" ->
      // one keeper (min id) per NORMALIZED-text family — NOT "all ids":
      // the sf0.1 corpus contains exact-duplicate text pairs, so an
      // all-ids oracle was wrong at that scale (caught by running the
      // oracle battery at sf0.1, which the driver's sf0.01 gate cannot
      // see; the engine's 4992 rows were correct)
      """SELECT MIN(doc_id) AS doc_id FROM documents
         GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
         ORDER BY doc_id""",
    "q_d2_minhash_neardup" -> nearDupOracle,
    "q_d3_neardup_ensemble" -> nearDupOracle,
    // q_d9 (L63): the prefix filter is lossless, so the exact join's
    // contract IS the exhaustive all-pairs computation — same oracle
    "q_d9_setsim_exact" -> nearDupOracle,
    // q_d16: the d9 exact pair set as the population, the md5 base-3
    // thinning replayed, the two Chapman divisions in HUGEINT —
    // quadratic like its parent oracle (skip-list class at sf0.1)
    "q_d16_dup_coverage" ->
      s"""WITH sh AS MATERIALIZED (
            SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, greatest(len($duckToks) - 2, 0) + 1),
                     i -> array_to_string(($duckToks)[i:i+2], ' ')))
                     AS sh
            FROM documents),
          p AS MATERIALIZED (SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                         nullif(len(list_distinct(
                           list_concat(a.sh, b.sh))), 0), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
            WHERE jaccard >= 0.8),
          t AS (SELECT id_a, id_b,
                CAST(concat('0x', substr(md5(CAST(id_a AS VARCHAR)
                  || ':' || CAST(id_b AS VARCHAR)), 1, 14)) AS BIGINT)
                  % 1000000000 AS u
              FROM p),
          ca AS (SELECT id_a, id_b FROM t WHERE u % 3 <> 0),
          cb AS (SELECT id_a, id_b FROM t WHERE (u // 3) % 3 <> 0),
          st AS (SELECT
                (SELECT CAST(COUNT(*) AS BIGINT) FROM ca) AS n_a,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM cb) AS n_b,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM ca
                   JOIN cb USING (id_a, id_b)) AS n_both,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_true)
         SELECT n_a, n_b, n_both,
                CAST((1000000 * CAST(n_a + 1 AS HUGEINT) * (n_b + 1))
                  // (n_both + 1) - 1000000 AS BIGINT) AS nhat_e6,
                CAST((1000000 * CAST(n_a + 1 AS HUGEINT) * (n_b + 1)
                    * (n_a - n_both) * (n_b - n_both))
                  // (CAST(n_both + 1 AS HUGEINT) * (n_both + 1)
                    * (n_both + 2)) AS BIGINT) AS var_e6,
                n_true
         FROM st""",
    // q_d13: the same quote-corpus construction (every 5th doc's first
    // 15 tokens at id+100000), then the EXHAUSTIVE directed containment
    // scan — the decision compare is the identical integer form
    // (inter·10⁶ ≥ 8·10⁵·|A|), the reported score the family's 6-dp
    // round. Quadratic by design (the q_d2 precedent — sf0.1 skip).
    "q_d13_containment" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          corpus AS (
            SELECT doc_id, text FROM base
            UNION ALL
            SELECT doc_id + 100000 AS doc_id,
                   array_to_string(($duckToks)[1:15], ' ') AS text
            FROM base WHERE doc_id % 5 = 0),
          sh AS (SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, greatest(len($duckToks) - 2, 0) + 1),
                     i -> array_to_string(($duckToks)[i:i+2], ' '))) AS sh
                 FROM corpus),
          scored AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.sh, b.sh)) AS inter,
                   len(a.sh) AS na
                 FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
                 WHERE len(a.sh) > 0)
         SELECT id_a, id_b,
                round(inter * 1.0 / na, 6) AS containment
         FROM scored
         WHERE inter * 1000000 >= 800000 * na
         ORDER BY id_a, id_b""",
    "q_d5_neardup_clusters" -> clusterOracle,
    "q_d6_delta_neardup" ->
      // sequential replay of the two-phase admit: a1 = batch-1 docs with
      // no smaller-id J>=0.8 partner (partners of a <250 doc are all
      // <250 by id_a < id_b); a2 = batch-2 docs blocked by neither an
      // ADMITTED history doc nor a smaller-id batch-2 doc (admitted or
      // not — conservative family drop)
      s"""WITH sh AS MATERIALIZED (
            SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, greatest(len($duckToks) - 2, 0) + 1),
                     i -> array_to_string(($duckToks)[i:i+2], ' '))) AS sh
            FROM documents),
          p AS MATERIALIZED (SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.sh, b.sh)) * 1.0 /
                   nullif(len(list_distinct(list_concat(a.sh, b.sh))), 0)
                     AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
            WHERE jaccard >= 0.8),
          a1 AS (SELECT d.doc_id FROM documents d WHERE d.doc_id < 250
            AND NOT EXISTS (SELECT 1 FROM p WHERE p.id_b = d.doc_id)),
          a2 AS (SELECT d.doc_id FROM documents d WHERE d.doc_id >= 250
            AND NOT EXISTS (SELECT 1 FROM p JOIN a1 ON p.id_a = a1.doc_id
                            WHERE p.id_b = d.doc_id)
            AND NOT EXISTS (SELECT 1 FROM p
                            WHERE p.id_b = d.doc_id AND p.id_a >= 250))
         SELECT doc_id FROM a1 UNION ALL SELECT doc_id FROM a2
         ORDER BY doc_id""",
    "q_t10_boilerplate" -> boilerplateOracle,
    "q_t11_shared_passages" ->
      s"""WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, greatest(len($duckToks) - 7, 0) + 1),
                     i -> array_to_string(($duckToks)[i:i+7], ' '))) AS sh
            FROM documents),
          ex AS (SELECT doc_id, unnest(sh) AS g FROM sh),
          rare AS (SELECT g FROM ex GROUP BY g HAVING COUNT(*) BETWEEN 2 AND 5),
          pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM ex a JOIN ex b USING (g) JOIN rare USING (g)
                 WHERE a.doc_id < b.doc_id)
          SELECT id_a, id_b, COUNT(*) AS n_shared FROM pr
          GROUP BY id_a, id_b HAVING COUNT(*) >= 3
          ORDER BY id_a, id_b""",
    // q_qr9/q_qr10: the smoothed-KL replay — the one float expression
    // (two smoothed shares, one ln, one e9 floor) token-for-token as
    // the engine builds it; the full source×vocab grid via CROSS JOIN
    // so absent tokens contribute their smoothed mass
    "q_qr9_source_divergence" ->
      s"""WITH $duckDivergenceTerms
         SELECT source, MIN(ttot) AS n_tokens,
                CAST(SUM(kl_term_e9) AS BIGINT) AS kl_e9
         FROM term GROUP BY source ORDER BY source""",
    // q_qr12: rebuilds the identical 4×1024 grid — same md5 52-bit
    // cell derivation ("cms:r:token", the L47 integer form), same
    // min-over-rows estimate; the sketch is deterministic so the
    // approximation error itself hash-compares
    // q_p7: the SVT replay — same md5 dyadic uniforms, ln α written as
    // the same arithmetic expressions (−0.5/2 and −0.5/20), the same
    // key-ordered halting window
    "q_p7_svt" ->
      """WITH d AS (SELECT source FROM documents
              WHERE source IS NOT NULL),
          t AS (SELECT COUNT(*) // 20 AS thr FROM d),
          g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                FROM d GROUP BY source),
          nt AS (SELECT thr
              + CAST(floor(ln((CAST(concat('0x',
                  substr(md5('svt:t1:svt:r11:T'), 1, 13)) AS BIGINT)
                  + 0.5) / 4503599627370496.0) / (-(0.5) / 2.0))
                  AS BIGINT)
              - CAST(floor(ln((CAST(concat('0x',
                  substr(md5('svt:t2:svt:r11:T'), 1, 13)) AS BIGINT)
                  + 0.5) / 4503599627370496.0) / (-(0.5) / 2.0))
                  AS BIGINT) AS noisy_t
             FROM t),
          f AS (SELECT g.source,
                  CAST((g.n
                    + CAST(floor(ln((CAST(concat('0x',
                        substr(md5('svt:q1:svt:r11:' || g.source), 1, 13))
                        AS BIGINT) + 0.5) / 4503599627370496.0)
                        / (-(0.5) / 20.0)) AS BIGINT)
                    - CAST(floor(ln((CAST(concat('0x',
                        substr(md5('svt:q2:svt:r11:' || g.source), 1, 13))
                        AS BIGINT) + 0.5) / 4503599627370496.0)
                        / (-(0.5) / 20.0)) AS BIGINT)
                    >= nt.noisy_t) AS INTEGER) AS answer
                FROM g, nt),
          h AS (SELECT source, answer,
                  CAST(SUM(answer) OVER (ORDER BY source) AS BIGINT)
                    - answer AS prior
                FROM f)
         SELECT source, answer, CAST(1.0 AS DOUBLE) AS eps, 5 AS c
         FROM h WHERE prior < 5 ORDER BY source""",
    // q_qr15: ranks and pooled order statistics replayed with windows,
    // the integer index map, the same BETWEEN lookup
    "q_qr15_quantile_norm" ->
      """WITH e AS (SELECT event_id AS id, event_type AS g, value AS v
              FROM events
              WHERE event_id IS NOT NULL AND event_type IS NOT NULL
                AND value IS NOT NULL),
          rk AS (SELECT id, g, v,
                   ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, id)
                     AS r,
                   COUNT(*) OVER (PARTITION BY g) AS ng
                 FROM e),
          nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
          pv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c
                 FROM e GROUP BY v),
          pc AS (SELECT v AS target_v, c,
                   CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum
                 FROM pv),
          ix AS (SELECT id, g, v,
                   ((r - 1) * nn.n) // ng + 1 AS idx
                 FROM rk, nn)
         SELECT ix.id, ix.g, ix.v, pc.target_v
         FROM ix JOIN pc
           ON ix.idx BETWEEN pc.cum - pc.c + 1 AND pc.cum
         ORDER BY ix.id""",
    // q_qr14: same bins, midpoint confidence (2b+1)·50000, acc and ECE
    // as exact floor divisions
    "q_qr14_ece" ->
      """WITH r AS (SELECT LEAST(CAST(floor(o_totalprice / 30000)
                                  AS BIGINT), 9) AS bin,
                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
              FROM orders
              WHERE o_totalprice IS NOT NULL
                AND o_orderstatus IS NOT NULL),
          bins AS (SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS s
                   FROM r GROUP BY bin),
          b2 AS (SELECT bin, n, s,
                   (bin * 2 + 1) * 50000 AS conf_e6,
                   CAST(s * 1000000 // n AS BIGINT) AS acc_e6
                 FROM bins),
          b3 AS (SELECT bin, n, s, conf_e6, acc_e6,
                   n * abs(acc_e6 - conf_e6) AS gap_contrib
                 FROM b2),
          tt AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                        CAST(SUM(gap_contrib) AS BIGINT) AS gg
                 FROM b3)
         SELECT bin, n, s, conf_e6, acc_e6,
                CAST(gap_contrib AS BIGINT) AS gap_contrib,
                CAST(gg // nn AS BIGINT) AS ece_e6
         FROM b3, tt ORDER BY bin""",
    // q_qr13: the minimax replay — same bins, every interval mean one
    // exact floor division, the same nested max-of-min over integers
    "q_qr13_isotonic" ->
      """WITH r AS (SELECT LEAST(CAST(floor(o_totalprice / 30000)
                                  AS BIGINT), 9) AS bin,
                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
              FROM orders
              WHERE o_totalprice IS NOT NULL
                AND o_orderstatus IS NOT NULL),
          bins AS (SELECT bin, COUNT(*) AS w, CAST(SUM(y) AS BIGINT) AS s
                   FROM r GROUP BY bin),
          iv AS (SELECT a.bin AS j, b.bin AS k,
                   CAST(SUM(t.s) AS BIGINT) * 1000000
                     // CAST(SUM(t.w) AS BIGINT) AS rate_e6
                 FROM bins a JOIN bins b ON a.bin <= b.bin
                 JOIN bins t ON t.bin BETWEEN a.bin AND b.bin
                 GROUP BY 1, 2),
          im AS (SELECT bins.bin, iv.j, MIN(iv.rate_e6) AS mn
                 FROM iv JOIN bins
                   ON iv.j <= bins.bin AND bins.bin <= iv.k
                 GROUP BY 1, 2),
          fit AS (SELECT bin, CAST(MAX(mn) AS BIGINT) AS fit_e6
                  FROM im GROUP BY bin)
         SELECT bins.bin, bins.w, bins.s,
                CAST(bins.s * 1000000 // bins.w AS BIGINT) AS raw_e6,
                fit.fit_e6
         FROM bins JOIN fit ON bins.bin = fit.bin
         ORDER BY bins.bin""",
    "q_qr12_cms_heavy" ->
      s"""WITH t2 AS MATERIALIZED (
             SELECT t.token FROM (SELECT unnest($duckToks) AS token
                                  FROM documents) t
             WHERE t.token IS NOT NULL),
          ex AS MATERIALIZED (
             SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
             FROM t2 GROUP BY token
             ORDER BY exact_n DESC, token LIMIT 20),
          rr AS (SELECT unnest(range(0, 4)) AS r),
          cells AS MATERIALIZED (
             SELECT rr.r,
                    CAST(concat('0x', substr(md5('cms:' ||
                        CAST(rr.r AS VARCHAR) || ':' || t2.token), 1, 13))
                      AS BIGINT) % 1024 AS c,
                    CAST(COUNT(*) AS BIGINT) AS n
             FROM t2 CROSS JOIN rr GROUP BY 1, 2),
          est AS (SELECT e.token, MIN(COALESCE(cells.n, 0)) AS est_n
                  FROM ex e CROSS JOIN rr
                  LEFT JOIN cells ON cells.r = rr.r
                    AND cells.c = CAST(concat('0x', substr(md5('cms:' ||
                          CAST(rr.r AS VARCHAR) || ':' || e.token), 1, 13))
                        AS BIGINT) % 1024
                  GROUP BY e.token)
         SELECT e.token, e.exact_n, CAST(est.est_n AS BIGINT) AS est_n
         FROM ex e JOIN est USING (token)
         ORDER BY exact_n DESC, token""",
    // q_t43: the same six crawler spellings rebuilt verbatim, then
    // every canonicalization rule replayed — scheme/host lower, the
    // scheme-conditional default-port strip, slash collapse + trailing
    // strip with the '/' root guard, tracking-param regex filter +
    // sort + bare-? drop, fragment drop, NULL for non-URLs
    "q_t43_url_canon" ->
      """WITH d AS (SELECT doc_id,
                '/s' || CAST((doc_id // 6) % 10 AS VARCHAR)
                  || '/item/' || CAST(doc_id // 6 AS VARCHAR) AS base,
                doc_id % 6 AS v
              FROM documents WHERE doc_id IS NOT NULL),
          u AS (SELECT doc_id,
                CASE v
                  WHEN 0 THEN 'HTTP://Example.COM' || base
                  WHEN 1 THEN 'http://example.com:80/' || base
                  WHEN 2 THEN 'http://EXAMPLE.com' || base || '/'
                  WHEN 3 THEN 'http://example.com' || base
                    || '?utm_source=feed&ref=tw'
                  WHEN 4 THEN 'http://example.com' || base || '?b=2&a=1'
                  ELSE 'http://example.com' || base
                    || '?a=1&utm_campaign=x&b=2#frag'
                END AS url
              FROM d),
          p1 AS (SELECT doc_id, url,
                lower(regexp_extract(url,
                  '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
                lower(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)) AS auth,
                regexp_replace(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1),
                  '/{2,}', '/') AS path0
              FROM u),
          p2 AS (SELECT doc_id, scheme, auth,
                CASE WHEN scheme = 'http'
                       THEN regexp_replace(auth, ':80$', '')
                     WHEN scheme = 'https'
                       THEN regexp_replace(auth, ':443$', '')
                     ELSE auth END AS authnp,
                CASE WHEN path0 = '' OR path0 = '/' THEN '/'
                     ELSE regexp_replace(path0, '/$', '') END AS path,
                COALESCE(array_to_string(list_sort(list_filter(
                  string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
                  x -> NOT (regexp_matches(x,
                    '^(utm_[^=]*|fbclid|gclid|msclkid|ref)=')
                    OR x = ''))), '&'), '') AS kept
              FROM p1),
          c AS (SELECT doc_id,
                CASE WHEN scheme = '' OR auth = '' THEN NULL
                     ELSE scheme || '://' || authnp || path ||
                       CASE WHEN kept = '' THEN ''
                            ELSE '?' || kept END
                END AS canon_url
              FROM p2)
         SELECT canon_url, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(CAST(SUM(doc_id) AS DECIMAL(38,0)) AS VARCHAR)
                  AS doc_id_sum
         FROM c WHERE canon_url IS NOT NULL
         GROUP BY canon_url ORDER BY canon_url""",
    // q_qr20: two generated Gini replays, one per granularity
    "q_qr20_gini" -> {
      val bySrc = Concentration.giniOracleSql(
        "SELECT lang AS g, source AS unit, 1 AS mass FROM documents")
      val byDoc = Concentration.giniOracleSql(
        "SELECT source AS g, doc_id AS unit, n_chars AS mass " +
          "FROM documents")
      s"""SELECT 'src_docs' AS leg, * FROM $bySrc
          UNION ALL
          SELECT 'doc_chars' AS leg, * FROM $byDoc
          ORDER BY leg, g"""
    },
    // q_qr19: generated replay over the same 256-entry table
    "q_qr19_lang_diversity" -> (
      Diversity.entropyExactOracleSql(
        "SELECT source AS g, lang AS cat FROM documents",
        gAlias = "source") + " ORDER BY source"),
    // q_qr18: generator-beside-operator (the q_qr17 convention) — the
    // replay embeds the same StrictMath e9 Benford constants; the
    // null leg's inverse-CDF thresholds derive from the SAME seq
    "q_qr18_benford_chisq" -> {
      val cums = Benford.DigitPE9.scanLeft(0L)(_ + _).tail.init
      val digitExpr = cums.map(c =>
        s"(CASE WHEN CAST(concat('0x', substr(md5(" +
          s"CAST(o_orderkey AS VARCHAR)), 1, 14)) AS BIGINT) " +
          s"% 1000000000 >= $c THEN 1 ELSE 0 END)")
        .mkString("1 + ", " + ", "")
      Benford.chiSquareOracleSql(
        s"""SELECT 'money' AS leg,
              CAST(FLOOR(o_totalprice) AS BIGINT) AS value FROM orders
           UNION ALL
           SELECT 'nchars' AS leg, n_chars AS value FROM documents
           UNION ALL
           SELECT 'benford_null' AS leg,
              CAST($digitExpr AS BIGINT) AS value FROM orders""") +
        " ORDER BY leg"
    },
    // q_qr17: the table-PSI replay is GENERATED by the operator itself
    // (Drift.categoricalExactOracleSql embeds the same MantissaLnE9
    // integers, bin()-length range reduction, exact compare and //
    // quantization), so the table and its replay cannot drift apart
    "q_qr17_psi_exact" -> {
      def cohort(where: String) =
        "SELECT LEAST(GREATEST(n_chars, 0) // 250, 7) AS bucket " +
          "FROM documents WHERE doc_id IS NOT NULL " +
          s"AND n_chars IS NOT NULL AND $where"
      val ref = cohort("doc_id % 2 = 0")
      val aa = Drift.categoricalExactOracleSql(ref,
        cohort("doc_id % 2 = 1"))
      val dr = Drift.categoricalExactOracleSql(ref,
        cohort("doc_id % 2 = 1 AND n_chars >= 400"))
      s"""SELECT 'aa_null' AS pair, * FROM $aa
          UNION ALL
          SELECT 'len_drift' AS pair, * FROM $dr
          ORDER BY pair, bucket"""
    },
    // q_a26: doubled-midrank grids per column, the exact HUGEINT
    // moments, the q_a13 one-rounded-double tail
    // q_a28x: the inversion-count replay, mirror-exact — dense
    // 0-based y rank, len(bin(maxRank)) bit levels, the (k, prefix)
    // window with RANGE … 1 PRECEDING for strict x' < x, D from the
    // (1,0)-bit cross pairs, C by inclusion–exclusion over the
    // doubled margins ('//' truncates like the engine's div; the
    // numerator is even so it is exact)
    "q_a28x_kendall_inversions" ->
      s"""WITH d AS (SELECT doc_id, text, CAST(n_chars AS BIGINT) AS nc
              FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL
                AND n_chars IS NOT NULL),
          base AS (SELECT 'len_tokens' AS leg, nc AS x,
                CAST(len($duckToks) AS BIGINT) AS y
              FROM d
             UNION ALL
                   SELECT 'len_hash', nc,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 14)) AS BIGINT) % 1000000
              FROM d),
          grid AS (SELECT leg, x, y, CAST(COUNT(*) AS BIGINT) AS c
              FROM base GROUP BY 1, 2, 3),
          yr AS (SELECT leg, y,
                CAST(DENSE_RANK() OVER (PARTITION BY leg ORDER BY y)
                  AS BIGINT) - 1 AS r
              FROM (SELECT DISTINCT leg, y FROM grid)),
          g2 AS (SELECT grid.leg, x, c, r FROM grid
              JOIN yr ON yr.leg = grid.leg AND yr.y = grid.y),
          mx AS (SELECT leg, MAX(r) AS mr FROM g2 GROUP BY 1),
          lv AS (SELECT leg, CAST(u.k AS BIGINT) AS k
              FROM mx, UNNEST(generate_series(0,
                len(bin(mr)) - 1)) AS u(k)),
          ex AS (SELECT g2.leg, k, x, c,
                (r >> CAST(k + 1 AS INTEGER)) AS g,
                ((r >> CAST(k AS INTEGER)) & 1) AS b
              FROM g2 JOIN lv ON lv.leg = g2.leg),
          pf AS (SELECT leg, b, c,
                SUM(CASE WHEN b = 1 THEN c END) OVER (
                  PARTITION BY leg, k, g ORDER BY x
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS ones
              FROM ex),
          dd AS (SELECT leg,
                SUM(CAST(c AS HUGEINT) * COALESCE(ones, 0)) AS dsum
              FROM pf WHERE b = 0 GROUP BY 1),
          tx AS (SELECT leg, SUM(CAST(t AS HUGEINT) * (t - 1)) AS txx
              FROM (SELECT leg, x, SUM(c) AS t FROM grid
                    GROUP BY 1, 2) GROUP BY 1),
          ty AS (SELECT leg, SUM(CAST(t AS HUGEINT) * (t - 1)) AS tyy
              FROM (SELECT leg, y, SUM(c) AS t FROM grid
                    GROUP BY 1, 2) GROUP BY 1),
          n3 AS (SELECT leg, SUM(CAST(c AS HUGEINT) * (c - 1)) AS n33
              FROM grid GROUP BY 1),
          tot AS (SELECT leg, CAST(SUM(c) AS BIGINT) AS n
              FROM grid GROUP BY 1),
          fin AS (SELECT tot.leg, n,
                CAST(n AS HUGEINT) * (n - 1) - txx AS v1,
                CAST(n AS HUGEINT) * (n - 1) - tyy AS v2,
                (CAST(n AS HUGEINT) * (n - 1) - txx - tyy + n33) // 2
                  - COALESCE(dsum, 0) AS cc,
                COALESCE(dsum, 0) AS ddd
              FROM tot
              LEFT JOIN dd ON dd.leg = tot.leg
              JOIN tx ON tx.leg = tot.leg
              JOIN ty ON ty.leg = tot.leg
              JOIN n3 ON n3.leg = tot.leg)
         SELECT leg, n, CAST(cc AS BIGINT) AS conc,
                CAST(ddd AS BIGINT) AS disc,
                CASE WHEN n < 2 OR v1 = 0 OR v2 = 0 THEN NULL
                  ELSE ROUND(CAST(2 * (cc - ddd) AS DOUBLE)
                    / sqrt(CAST(v1 AS DOUBLE))
                    / sqrt(CAST(v2 AS DOUBLE)), 6)
                END AS tau_b6
         FROM fin ORDER BY leg""",
    // q_a28: pair-grid replay — C/D from the x-ordered grid join,
    // doubled tie/total pair counts (the 2s cancel), one rounded
    // double (the a13/a26 tail). LEFT JOIN cd + COALESCE mirrors the
    // operator's constant-x convention (RankTest.scala left join): a
    // leg with NO x-ordered pairs keeps its NULL-tau row (r16 fix)
    "q_a28_kendall" ->
      s"""WITH d AS (SELECT doc_id, text, CAST(n_chars AS BIGINT) AS nc
              FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL
                AND n_chars IS NOT NULL),
          base AS (SELECT 'len_tokens' AS leg, nc AS x,
                CAST(len($duckToks) AS BIGINT) AS y
              FROM d
             UNION ALL
                   SELECT 'len_hash', nc,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 14)) AS BIGINT) % 1000000
              FROM d),
          grid AS (SELECT leg, x, y, CAST(COUNT(*) AS BIGINT) AS c
              FROM base GROUP BY 1, 2, 3),
          cd AS (SELECT a.leg,
                SUM(CASE WHEN b.y > a.y
                  THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS cc,
                SUM(CASE WHEN b.y < a.y
                  THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS dd
              FROM grid a JOIN grid b
                ON b.leg = a.leg AND b.x > a.x
              GROUP BY 1),
          tx AS (SELECT leg, SUM(CAST(t AS HUGEINT) * (t - 1)) AS txx
              FROM (SELECT leg, x, SUM(c) AS t FROM grid
                    GROUP BY 1, 2) GROUP BY 1),
          ty AS (SELECT leg, SUM(CAST(t AS HUGEINT) * (t - 1)) AS tyy
              FROM (SELECT leg, y, SUM(c) AS t FROM grid
                    GROUP BY 1, 2) GROUP BY 1),
          tot AS (SELECT leg, CAST(SUM(c) AS BIGINT) AS n
              FROM grid GROUP BY 1)
         SELECT tot.leg, n,
                CAST(COALESCE(cc, 0) AS BIGINT) AS conc,
                CAST(COALESCE(dd, 0) AS BIGINT) AS disc,
                CASE WHEN n < 2
                    OR CAST(n AS HUGEINT) * (n - 1) - txx = 0
                    OR CAST(n AS HUGEINT) * (n - 1) - tyy = 0
                  THEN NULL
                  ELSE ROUND(CAST(2 * (COALESCE(cc, 0)
                      - COALESCE(dd, 0)) AS DOUBLE)
                    / sqrt(CAST(CAST(n AS HUGEINT) * (n - 1) - txx
                        AS DOUBLE))
                    / sqrt(CAST(CAST(n AS HUGEINT) * (n - 1) - tyy
                        AS DOUBLE)), 6)
                END AS tau_b6
         FROM tot
         LEFT JOIN cd ON cd.leg = tot.leg
         JOIN tx ON tx.leg = tot.leg
         JOIN ty ON ty.leg = tot.leg
         ORDER BY tot.leg""",
    "q_a26_spearman" ->
      s"""WITH d AS (SELECT doc_id, text, CAST(n_chars AS BIGINT) AS nc
              FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL
                AND n_chars IS NOT NULL),
          base AS (SELECT 'len_tokens' AS leg, nc AS x,
                CAST(len($duckToks) AS BIGINT) AS y
              FROM d
             UNION ALL
                   SELECT 'len_hash', nc,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 14)) AS BIGINT) % 1000000
              FROM d),
          pairs AS (SELECT leg, x, y, CAST(COUNT(*) AS BIGINT) AS c
              FROM base GROUP BY 1, 2, 3),
          xg AS (SELECT leg, x,
                2 * COALESCE(SUM(t) OVER (PARTITION BY leg ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) + t + 1 AS rx
              FROM (SELECT leg, x, SUM(c) AS t FROM pairs
                    GROUP BY 1, 2)),
          yg AS (SELECT leg, y,
                2 * COALESCE(SUM(t) OVER (PARTITION BY leg ORDER BY y
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) + t + 1 AS ry
              FROM (SELECT leg, y, SUM(c) AS t FROM pairs
                    GROUP BY 1, 2)),
          j AS (SELECT p.leg, c, rx, ry FROM pairs p
              JOIN xg ON xg.leg = p.leg AND xg.x = p.x
              JOIN yg ON yg.leg = p.leg AND yg.y = p.y),
          m AS (SELECT leg, SUM(c) AS n,
                SUM(CAST(c AS HUGEINT) * rx) AS sx,
                SUM(CAST(c AS HUGEINT) * ry) AS sy,
                SUM(CAST(c AS HUGEINT) * rx * rx) AS sxx,
                SUM(CAST(c AS HUGEINT) * ry * ry) AS syy,
                SUM(CAST(c AS HUGEINT) * rx * ry) AS sxy
              FROM j GROUP BY 1)
         SELECT leg, CAST(n AS BIGINT) AS n,
                CASE WHEN n < 2 OR n * sxx - sx * sx = 0
                       OR n * syy - sy * sy = 0 THEN NULL
                     ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                       / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 6)
                END AS rho6
         FROM m ORDER BY leg""",
    // q_qr25: flag presence replay, canonical unordered pairs, the
    // flagged-universe N (the operator's documented convention)
    "q_qr25_flag_lift" ->
      s"""WITH d AS (SELECT doc_id, text, n_chars, lang,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 14)) AS BIGINT) % 1000000000 AS h
              FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL
                AND n_chars IS NOT NULL AND lang IS NOT NULL),
          pres AS (SELECT DISTINCT doc_id, f FROM (
                SELECT doc_id, 'short_doc' AS f FROM d
                WHERE n_chars < 150
               UNION ALL
                SELECT doc_id, 'few_tokens' FROM d
                WHERE len($duckToks) < 30
               UNION ALL
                SELECT doc_id, 'lang_zh' FROM d WHERE lang = 'zh'
               UNION ALL
                SELECT doc_id, 'hash_flag' FROM d WHERE h % 2 = 0)),
          tot AS (SELECT COUNT(DISTINCT doc_id) AS nu FROM d),
          cnt AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n
              FROM pres GROUP BY 1),
          pairs AS (SELECT a.f AS fa, b.f AS fb,
                CAST(COUNT(*) AS BIGINT) AS nab
              FROM pres a JOIN pres b
                ON b.doc_id = a.doc_id AND a.f < b.f
              GROUP BY 1, 2)
         SELECT fa AS item_a, fb AS item_b, ca.n AS n_a, cb.n AS n_b,
                nab AS n_ab,
                CAST((1000000 * CAST(nab AS HUGEINT)) // nu
                  AS BIGINT) AS support_e6,
                CAST((1000000 * CAST(nab AS HUGEINT) * nu)
                  // (CAST(ca.n AS HUGEINT) * cb.n)
                  AS BIGINT) AS lift_e6
         FROM pairs
         JOIN cnt ca ON ca.f = fa
         JOIN cnt cb ON cb.f = fb
         CROSS JOIN tot
         ORDER BY item_a, item_b""",
    // q_qr32: the same range/hash constructions + the source strata;
    // the per-stratum MH cascade (ad/n, bc/n, E, V each floored once
    // at 1e6), the ½-continuity CMH in HUGEINT, χ²₁ verdict
    "q_qr32_mantel_haenszel" ->
      """WITH d AS (SELECT doc_id, lang, n_chars, source,
                doc_id % 100 AS u,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 14)) AS BIGINT) % 1000000000 AS h
              FROM documents
              WHERE doc_id IS NOT NULL AND lang IS NOT NULL
                AND n_chars IS NOT NULL AND source IS NOT NULL),
          base AS (SELECT 'planted_reversal' AS panel,
                CASE WHEN u < 50 THEN 's0' ELSE 's1' END AS st,
                CASE WHEN u < 10 OR (u >= 50 AND u < 90)
                  THEN 1 ELSE 0 END AS rv,
                CASE WHEN u < 8 OR (u >= 10 AND u < 38)
                    OR (u >= 50 AND u < 62) OR (u >= 90 AND u < 92)
                  THEN 1 ELSE 0 END AS cv
              FROM d
             UNION ALL SELECT 'zh_len_by_source', source,
                CASE WHEN lang = 'zh' THEN 1 ELSE 0 END,
                CASE WHEN n_chars >= 350 THEN 1 ELSE 0 END FROM d
             UNION ALL SELECT 'hash_null', CAST(h % 2 AS VARCHAR),
                (h // 2) % 2, (h // 4) % 2 FROM d),
          cells AS (SELECT panel, st,
                CAST(SUM(CASE WHEN rv = 1 AND cv = 1 THEN 1 ELSE 0
                  END) AS BIGINT) AS a,
                CAST(SUM(CASE WHEN rv = 1 AND cv = 0 THEN 1 ELSE 0
                  END) AS BIGINT) AS b,
                CAST(SUM(CASE WHEN rv = 0 AND cv = 1 THEN 1 ELSE 0
                  END) AS BIGINT) AS c,
                CAST(SUM(CASE WHEN rv = 0 AND cv = 0 THEN 1 ELSE 0
                  END) AS BIGINT) AS dd
              FROM base GROUP BY 1, 2),
          t AS (SELECT panel, a, a + b + c + dd AS n,
                (1000000 * CAST(a AS HUGEINT) * dd)
                  // (a + b + c + dd) AS ad,
                (1000000 * CAST(b AS HUGEINT) * c)
                  // (a + b + c + dd) AS bc,
                (1000000 * CAST(a + b AS HUGEINT) * (a + c))
                  // (a + b + c + dd) AS e,
                CASE WHEN a + b + c + dd < 2 THEN 0
                  ELSE (1000000 * CAST(a + b AS HUGEINT) * (c + dd)
                      * (a + c) * (b + dd))
                    // (CAST(a + b + c + dd AS HUGEINT)
                      * (a + b + c + dd) * (a + b + c + dd - 1))
                END AS v
              FROM cells),
          p AS (SELECT panel, CAST(COUNT(*) AS BIGINT) AS n_strata,
                CAST(SUM(n) AS BIGINT) AS n, SUM(ad) AS sad,
                SUM(bc) AS sbc, SUM(e) AS se, SUM(v) AS sv,
                SUM(a) AS sa
              FROM t GROUP BY 1),
          f AS (SELECT panel, n_strata, n,
                CASE WHEN sbc = 0 THEN NULL
                  ELSE CAST((1000000 * sad) // sbc AS BIGINT)
                END AS or_e6,
                1000000 * CAST(sa AS HUGEINT) - se AS oe, sv
              FROM p)
         SELECT panel, n_strata, n, or_e6,
                CASE WHEN sv = 0 THEN NULL
                  ELSE CAST((GREATEST(ABS(oe) - 500000, 0)
                      * GREATEST(ABS(oe) - 500000, 0)) // sv
                    AS BIGINT)
                END AS cmh_e6,
                CAST(CASE WHEN oe > 0 THEN 1 WHEN oe < 0 THEN -1
                  ELSE 0 END AS BIGINT) AS d_sign,
                CAST(CASE WHEN sv = 0 THEN 0
                  WHEN (GREATEST(ABS(oe) - 500000, 0)
                      * GREATEST(ABS(oe) - 500000, 0)) // sv
                    >= 3841459 THEN 1 ELSE 0 END AS BIGINT) AS sig
         FROM f ORDER BY panel""",
    // q_qr24: range + hash-bit replay; per-stratum and pooled
    // cross-product signs as exact integers, the strict verdict CASE
    "q_qr24_simpson" ->
      """WITH d AS (SELECT doc_id FROM documents
              WHERE doc_id IS NOT NULL),
          u AS (SELECT doc_id, doc_id % 100 AS u,
                CAST(concat('0x', substr(md5(
                  CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                  % 1000000000 AS h
              FROM d),
          base AS (SELECT 'planted' AS panel,
                CASE WHEN u < 50 THEN 's0' ELSE 's1' END AS st,
                CASE WHEN u < 10 OR (u >= 50 AND u < 90)
                     THEN 1 ELSE 0 END AS rv,
                CASE WHEN u < 8 OR (u >= 10 AND u < 38)
                       OR (u >= 50 AND u < 62)
                       OR (u >= 90 AND u < 92)
                     THEN 1 ELSE 0 END AS cv
              FROM u
             UNION ALL
                   SELECT 'hash_null', CAST(h % 2 AS VARCHAR),
                (h // 2) % 2, (h // 4) % 2
              FROM u),
          cells AS (SELECT panel, st,
                CAST(SUM(CASE WHEN rv = 1 AND cv = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n11,
                CAST(SUM(CASE WHEN rv = 1 AND cv = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n10,
                CAST(SUM(CASE WHEN rv = 0 AND cv = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n01,
                CAST(SUM(CASE WHEN rv = 0 AND cv = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n00
              FROM base GROUP BY 1, 2),
          signs AS (SELECT panel, st,
                CAST(SIGN(CAST(n11 AS HUGEINT) * n00
                  - CAST(n10 AS HUGEINT) * n01) AS BIGINT) AS s,
                n11, n10, n01, n00
              FROM cells),
          pp AS (SELECT panel, CAST(COUNT(*) AS BIGINT) AS n_strata,
                CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pos,
                CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_neg,
                SUM(n11) AS n11, SUM(n10) AS n10,
                SUM(n01) AS n01, SUM(n00) AS n00
              FROM signs GROUP BY 1)
         SELECT panel, n_strata, n_pos, n_neg,
                CAST(SIGN(CAST(n11 AS HUGEINT) * n00
                  - CAST(n10 AS HUGEINT) * n01) AS BIGINT)
                  AS pooled_sign,
                CAST(CASE WHEN (SIGN(CAST(n11 AS HUGEINT) * n00
                      - CAST(n10 AS HUGEINT) * n01) = 1
                      AND n_neg = n_strata)
                    OR (SIGN(CAST(n11 AS HUGEINT) * n00
                      - CAST(n10 AS HUGEINT) * n01) = -1
                      AND n_pos = n_strata)
                  THEN 1 ELSE 0 END AS BIGINT) AS reversal
         FROM pp ORDER BY panel""",
    // q_qr23: margin-cross replay — the FULL r×c grid (zero cells
    // carry mass), one // per cell, the df-indexed χ² table, and the
    // qr18 hash-bit convention for the A/A leg
    // q_d15: e3 quantize-once codes, per-dim cohort sums, the exact
    // integer cos² — dims via list_transform + struct unnest
    "q_d15_centroid_drift" ->
      s"""WITH e AS (SELECT vec_id, embedding, label FROM embeddings
              WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
                AND label IS NOT NULL),
          b AS (SELECT 'label_split' AS panel,
                CASE WHEN label = 0 THEN 'a'
                     WHEN label = 1 THEN 'b' END AS c,
                list_transform(embedding,
                  x -> CAST(x AS DOUBLE)) AS embedding
              FROM e
             UNION ALL
                   SELECT 'parity_aa',
                CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END,
                list_transform(embedding, x -> CAST(x AS DOUBLE))
              FROM e
             UNION ALL
                   SELECT 'planted_shift',
                CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END,
                CASE WHEN vec_id % 2 = 0
                  THEN list_transform(embedding,
                    x -> CAST(x AS DOUBLE))
                  ELSE list_transform(embedding,
                    x -> CAST(x AS DOUBLE) + 0.05) END
              FROM e),
          bb AS (SELECT * FROM b WHERE c IS NOT NULL),
          cnt AS (SELECT panel,
                CAST(SUM(CASE WHEN c = 'a' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a,
                CAST(SUM(CASE WHEN c = 'b' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_b
              FROM bb GROUP BY 1),
          comps AS (SELECT panel, c,
                UNNEST(list_transform(range(1, len(embedding) + 1),
                  i -> {'d': i, 'q': CAST(FLOOR(
                    embedding[i] * 1000 + 0.5) AS BIGINT)})) AS s
              FROM bb),
          dims AS (SELECT panel, s.d AS d,
                SUM(CASE WHEN c = 'a' THEN s.q ELSE 0 END) AS sa,
                SUM(CASE WHEN c = 'b' THEN s.q ELSE 0 END) AS sb,
                SUM(CAST(s.q AS HUGEINT) * s.q) AS t2d
              FROM comps GROUP BY 1, 2),
          p AS (SELECT panel,
                SUM(CAST(sa AS HUGEINT) * sb) AS dot,
                SUM(CAST(sa AS HUGEINT) * sa) AS na2,
                SUM(CAST(sb AS HUGEINT) * sb) AS nb2,
                SUM(t2d) AS t2
              FROM dims GROUP BY 1),
          g AS (SELECT dims.panel,
                SUM((CAST(n_a AS HUGEINT) * sb - CAST(n_b AS HUGEINT)
                    * sa)
                  * (CAST(n_a AS HUGEINT) * sb - CAST(n_b AS HUGEINT)
                    * sa)) AS gap2
              FROM dims JOIN cnt ON cnt.panel = dims.panel
              GROUP BY 1)
         SELECT cnt.panel, n_a, n_b,
                CAST(SIGN(dot) AS BIGINT) AS d_sign,
                CAST(CASE WHEN na2 = 0 OR nb2 = 0 THEN NULL
                  ELSE (1000000 * dot * dot) // (na2 * nb2)
                  END AS BIGINT) AS cos2_e6,
                CAST(CASE WHEN n_a = 0 OR n_b = 0 OR t2 = 0 THEN NULL
                  ELSE (1000000 * gap2)
                    // (CAST(n_a AS HUGEINT) * n_b * t2)
                  END AS BIGINT) AS drift_e6
         FROM cnt JOIN p ON p.panel = cnt.panel
         JOIN g ON g.panel = cnt.panel
         ORDER BY cnt.panel""",
    // q_a27: 64 salted md5 reassignments, the division-free
    // cross-multiplied exceed compare, add-one-in p
    "q_a27_perm_test" ->
      s"""WITH d AS (SELECT doc_id, n_chars, lang FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                AND lang IS NOT NULL),
          base AS (SELECT 'zh_len' AS panel,
                CASE WHEN lang = 'zh' THEN 'a' ELSE 'b' END AS c,
                CAST(n_chars AS BIGINT) AS v,
                CAST(doc_id AS VARCHAR) AS id
              FROM d
             UNION ALL
                   SELECT 'aa_null',
                CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END,
                n_chars, CAST(doc_id AS VARCHAR)
              FROM d
             UNION ALL
                   SELECT 'planted_shift',
                CASE WHEN CAST(concat('0x', substr(md5(
                    CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                    % 1000000000 % 2 = 0
                  THEN 'a' ELSE 'b' END,
                n_chars + CASE WHEN CAST(concat('0x', substr(md5(
                    CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                    % 1000000000 % 2 = 0
                  THEN 300 ELSE 0 END,
                CAST(doc_id AS VARCHAR)
              FROM d),
          obs AS (SELECT panel,
                SUM(CASE WHEN c = 'a' THEN v ELSE 0 END) AS oa,
                CAST(SUM(CASE WHEN c = 'a' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ona,
                SUM(CASE WHEN c = 'b' THEN v ELSE 0 END) AS ob,
                CAST(SUM(CASE WHEN c = 'b' THEN 1 ELSE 0 END)
                  AS BIGINT) AS onb
              FROM base GROUP BY 1),
          hs AS (SELECT id, s,
                CAST(concat('0x', substr(md5(id || '#' ||
                  CAST(s AS VARCHAR)), 1, 14)) AS BIGINT) AS h
              FROM (SELECT DISTINCT id FROM base)
              CROSS JOIN (SELECT unnest(range(0, 2)) AS s)),
          reps AS (SELECT panel, b,
                SUM(CASE WHEN bit = 0 THEN v ELSE 0 END) AS sa,
                SUM(CASE WHEN bit = 0 THEN 1 ELSE 0 END) AS na,
                SUM(CASE WHEN bit = 1 THEN v ELSE 0 END) AS sb,
                SUM(CASE WHEN bit = 1 THEN 1 ELSE 0 END) AS nb
              FROM (SELECT base.*, t.b,
                    (h >> CAST(t.b % 56 AS INT)) % 2 AS bit
                  FROM base
                  CROSS JOIN (SELECT unnest(range(0, 64)) AS b) t
                  JOIN hs ON hs.id = base.id AND hs.s = t.b // 56)
              GROUP BY 1, 2),
          ex AS (SELECT reps.panel,
                CASE WHEN na = 0 OR nb = 0 THEN 1
                  WHEN abs(CAST(sa AS HUGEINT) * nb
                      - CAST(sb AS HUGEINT) * na) * ona * onb
                    >= abs(CAST(oa AS HUGEINT) * onb
                      - CAST(ob AS HUGEINT) * ona) * na * nb
                  THEN 1 ELSE 0 END AS x
              FROM reps JOIN obs ON obs.panel = reps.panel)
         SELECT ex.panel, ona AS n_a, onb AS n_b,
                CAST(COUNT(*) AS BIGINT) AS b_reps,
                CAST(SUM(x) AS BIGINT) AS n_exceed,
                CAST((1000000 * (1 + SUM(x))) // 65 AS BIGINT) AS p_e6
         FROM ex JOIN obs ON obs.panel = ex.panel
         GROUP BY ex.panel, ona, onb
         ORDER BY ex.panel""",
    // q_t44: the words/sentences/syllables cascade replayed; the
    // vowel-run + vowel-less-token syllable rule token-for-token
    "q_t44_readability" ->
      s"""WITH d AS (SELECT lang, text FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL
                AND lang IS NOT NULL),
          m AS (SELECT lang,
                CAST(len($duckToks) AS BIGINT) AS w,
                GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))
                  AS s,
                CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                  + len(list_filter($duckToks,
                      t -> NOT regexp_matches(t, '[aeiouyAEIOUY]')))
                  AS BIGINT) AS syl
              FROM d),
          g AS (SELECT lang,
                CASE WHEN w = 0 THEN NULL
                  ELSE 206835000 - (1015000 * w) // s
                    - (84600000 * syl) // w END AS fre,
                CASE WHEN w = 0 THEN NULL
                  ELSE (390000 * w) // s + (11800000 * syl) // w
                    - 15590000 END AS fk
              FROM m)
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(COUNT(fre) AS BIGINT) AS n_graded,
                CAST(CASE WHEN COUNT(fre) = 0 THEN NULL
                  ELSE SUM(fre) // COUNT(fre) END AS BIGINT)
                  AS fre_mean_e6,
                CAST(CASE WHEN COUNT(fk) = 0 THEN NULL
                  ELSE SUM(fk) // COUNT(fk) END AS BIGINT)
                  AS fk_mean_e6
         FROM g GROUP BY lang ORDER BY lang""",
    // q_qr28: deterministic top-(k+1) order statistics + the table-ln
    // chain (its oracle-side sixth consumer)
    "q_qr28_hill" ->
      s"""WITH d AS (SELECT doc_id, n_chars,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 14)) AS BIGINT) % 1000000000 AS h
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
          base AS (SELECT 'doc_len' AS leg,
                CAST(n_chars AS BIGINT) AS v,
                CAST(doc_id AS VARCHAR) AS id FROM d
             UNION ALL SELECT 'pareto',
                1000000 // (h % 100000 + 1), CAST(doc_id AS VARCHAR)
              FROM d
             UNION ALL SELECT 'uniform', h % 1000 + 1,
                CAST(doc_id AS VARCHAR)
              FROM d),
          pos AS (SELECT * FROM base WHERE v > 0),
          rn AS (SELECT leg, v, ROW_NUMBER() OVER (PARTITION BY leg
                ORDER BY v DESC, id) AS rn
              FROM pos),
          xk1 AS (SELECT leg, v AS xv FROM rn WHERE rn = 31),
          terms AS (SELECT rn.leg, rn.v AS num, xv AS den
              FROM rn JOIN xk1 ON xk1.leg = rn.leg WHERE rn <= 30),
          kz AS (SELECT *, CAST(LENGTH(bin(num)) - LENGTH(bin(den))
                AS BIGINT) AS kz0 FROM terms),
          kk AS (SELECT *, CASE WHEN
                CAST(num AS HUGEINT)
                  * CAST(power(2, GREATEST(-kz0, 0)) AS HUGEINT)
                < CAST(den AS HUGEINT)
                  * CAST(power(2, GREATEST(kz0, 0)) AS HUGEINT)
                THEN kz0 - 1 ELSE kz0 END AS kke FROM kz),
          mm AS (SELECT *, (CAST(num AS HUGEINT)
                   * CAST(power(2, GREATEST(-kke, 0)) AS HUGEINT) * 256)
                // (CAST(den AS HUGEINT)
                   * CAST(power(2, GREATEST(kke, 0)) AS HUGEINT)) - 256
                AS mi FROM kk),
          ll AS (SELECT *, kke * ${graft.operators.Drift.Ln2E9}
                + (${graft.operators.Drift.MantissaLnE9
                      .mkString("[", ",", "]")})[CAST(mi AS INT) + 1]
                AS ln_e9 FROM mm),
          agg AS (SELECT leg, CAST(COUNT(*) AS BIGINT) AS n_tail,
                SUM(ln_e9) AS s, MAX(den) AS xk1
              FROM ll GROUP BY 1)
         SELECT leg, CAST(30 AS BIGINT) AS k, n_tail,
                CAST(xk1 AS BIGINT) AS x_k1,
                CAST(s // 30 AS BIGINT) AS alpha_inv_e9,
                CAST(CASE WHEN s // 30 <= 0 THEN NULL
                  ELSE 1000000000000000 // (s // 30) END AS BIGINT)
                  AS alpha_e6
         FROM agg ORDER BY leg""",
    // q_m14: closed-form square-wave replay — peak = a, clip/silence
    // all-or-none by construction; NULLS FIRST for the violation row
    "q_m14_audio_quality" ->
      s"""WITH d AS (SELECT doc_id FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          m AS (SELECT doc_id,
                CASE WHEN doc_id % 23 = 0 THEN 0 ELSE 1 END AS ok,
                64 + 2 * (doc_id % 19) AS n,
                LEAST(32767, 1024 * (doc_id % 33)) AS a
              FROM d)
         SELECT CAST(CASE WHEN ok = 1 THEN 8000 END AS BIGINT)
                  AS sample_rate,
                CAST(CASE WHEN ok = 1 THEN 1 END AS BIGINT)
                  AS channels,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(CASE WHEN ok = 1 THEN n END) AS BIGINT)
                  AS sum_frames,
                CAST(SUM(CASE WHEN ok = 1 THEN a END) AS BIGINT)
                  AS sum_peak,
                CAST(SUM(CASE WHEN ok = 1 THEN
                    CASE WHEN a >= 32512 THEN n ELSE 0 END END)
                  AS BIGINT) AS sum_clipped,
                CAST(SUM(CASE WHEN ok = 1 THEN
                    CASE WHEN a < 256 THEN n ELSE 0 END END)
                  AS BIGINT) AS sum_silent,
                CAST(COUNT(CASE WHEN ok = 1 AND a >= 32512 THEN 1 END)
                  AS BIGINT) AS n_clip_docs,
                CAST(COUNT(CASE WHEN ok = 1 AND a < 256 THEN 1 END)
                  AS BIGINT) AS n_silent_docs
         FROM m GROUP BY 1, 2
         ORDER BY 1 NULLS FIRST""",
    // q_m13: generator-formula replay (the q_m9 inversion gate) —
    // the same bitrate/samplerate literals the kernel's tables hold
    "q_m13_mp3_metadata" ->
      s"""WITH d AS (SELECT doc_id FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          m AS (SELECT doc_id,
                CASE WHEN doc_id % 13 = 0 OR doc_id % 11 = 0
                  THEN 0 ELSE 1 END AS ok,
                CASE WHEN doc_id % 3 <> 0 THEN 10 + doc_id % 23
                  ELSE 0 END AS id3,
                ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])
                  [CAST(doc_id % 14 + 1 AS INT)] AS kbps,
                ([44100,48000,32000])
                  [CAST(doc_id % 3 + 1 AS INT)] AS rate,
                CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 2 END AS ch
              FROM d)
         SELECT CASE WHEN ok = 1 THEN '1' END AS mpeg_version,
                CAST(CASE WHEN ok = 1 THEN 3 END AS BIGINT) AS layer,
                CAST(CASE WHEN ok = 1 THEN ch END AS BIGINT)
                  AS channels,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(CASE WHEN ok = 1 THEN id3 END) AS BIGINT)
                  AS sum_id3,
                CAST(SUM(CASE WHEN ok = 1 THEN kbps END) AS BIGINT)
                  AS sum_kbps,
                CAST(SUM(CASE WHEN ok = 1 THEN rate END) AS BIGINT)
                  AS sum_rate
         FROM m GROUP BY 1, 2, 3
         ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""",
    // q_v26: distinct-score grid walk — window cumulatives DESC, the
    // per-threshold term/f1 cascade, row_number argmax (f1 desc,
    // threshold desc — the operator's max-struct tie-break)
    "q_v26_avg_precision" ->
      s"""WITH d AS (SELECT doc_id, n_chars, lang FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                AND lang IS NOT NULL),
          base AS (SELECT 'zh_len' AS leg,
                CAST(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END
                  AS BIGINT) AS y,
                CAST(n_chars AS BIGINT) AS v
              FROM d
             UNION ALL
                   SELECT 'aa_null', CAST(doc_id % 2 AS BIGINT),
                n_chars
              FROM d),
          grid AS (SELECT leg, v, CAST(SUM(y) AS BIGINT) AS pos,
                CAST(COUNT(*) AS BIGINT) AS tot
              FROM base GROUP BY 1, 2),
          tt AS (SELECT leg, CAST(SUM(pos) AS BIGINT) AS np,
                CAST(SUM(tot - pos) AS BIGINT) AS nn
              FROM grid GROUP BY 1),
          cum AS (SELECT leg, v, pos,
                SUM(pos) OVER w AS tp, SUM(tot) OVER w AS n
              FROM grid
              WINDOW w AS (PARTITION BY leg ORDER BY v DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          terms AS (SELECT cum.leg, v,
                (1000000000 * CAST(pos AS HUGEINT) * tp) // n AS term,
                (2000000 * CAST(tp AS HUGEINT)) // (n + np) AS f1
              FROM cum JOIN tt ON tt.leg = cum.leg),
          st AS (SELECT leg, SUM(term) AS sterm FROM terms
              GROUP BY 1),
          best AS (SELECT leg, f1, v FROM (
                SELECT leg, f1, v, ROW_NUMBER() OVER (
                  PARTITION BY leg ORDER BY f1 DESC, v DESC) AS rn
                FROM terms) WHERE rn = 1)
         SELECT tt.leg, np AS n_pos, nn AS n_neg,
                CAST(CASE WHEN np = 0 THEN NULL
                  ELSE sterm // np END AS BIGINT) AS ap_e9,
                CAST(CASE WHEN np = 0 THEN NULL
                  ELSE best.v END AS BIGINT) AS best_thr,
                CAST(CASE WHEN np = 0 THEN NULL
                  ELSE best.f1 END AS BIGINT) AS best_f1_e6
         FROM tt JOIN st ON st.leg = tt.leg
         JOIN best ON best.leg = tt.leg
         ORDER BY tt.leg""",
    // q_qr27: ECDF step replay over the value grid, one quantization
    "q_qr27_cvm" ->
      s"""WITH d AS (SELECT doc_id, n_chars, lang FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                AND lang IS NOT NULL),
          base AS (SELECT 'zh_rest' AS leg,
                CASE WHEN lang = 'zh' THEN 'a' ELSE 'b' END AS c,
                CAST(n_chars AS BIGINT) AS v
              FROM d
             UNION ALL
                   SELECT 'aa_null',
                CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END,
                n_chars
              FROM d),
          grid AS (SELECT leg, v, CAST(COUNT(*) AS BIGINT) AS t,
                CAST(SUM(CASE WHEN c = 'a' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ta
              FROM base GROUP BY 1, 2),
          tot AS (SELECT leg, CAST(SUM(ta) AS BIGINT) AS na,
                CAST(SUM(t - ta) AS BIGINT) AS nb
              FROM grid GROUP BY 1),
          cum AS (SELECT grid.leg, v, t, na, nb,
                SUM(ta) OVER w AS ca, SUM(t - ta) OVER w AS cb
              FROM grid JOIN tot ON tot.leg = grid.leg
              WINDOW w AS (PARTITION BY grid.leg ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          s AS (SELECT leg, na, nb,
                SUM(CAST(t AS HUGEINT)
                  * (nb * ca - na * cb) * (nb * ca - na * cb))
                  AS term
              FROM cum GROUP BY 1, 2, 3),
          f AS (SELECT leg, na, nb,
                CASE WHEN na = 0 OR nb = 0 THEN NULL
                  ELSE (1000000 * term)
                    // (CAST(na + nb AS HUGEINT) * (na + nb) * na * nb)
                  END AS t6
              FROM s)
         SELECT leg, na AS n_a, nb AS n_b,
                CAST(t6 AS BIGINT) AS t_e6,
                CAST(CASE WHEN t6 IS NOT NULL AND t6 >= 461360
                  THEN 1 ELSE 0 END AS BIGINT) AS sig
         FROM f ORDER BY leg""",
    // q_v25: Fleiss replay — cell counts, the complete-item filter,
    // and the (a·d − c·b)/(b·(d − c)) rational, all HUGEINT
    "q_v25_fleiss_kappa" ->
      s"""WITH d AS (SELECT doc_id, n_chars FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
          base AS (
            SELECT 'length_raters' AS panel, doc_id AS i, r FROM d,
              LATERAL (SELECT unnest(ARRAY[
                CASE WHEN n_chars < 150 THEN 'short'
                     WHEN n_chars < 350 THEN 'mid' ELSE 'long' END,
                CASE WHEN n_chars < 160 THEN 'short'
                     WHEN n_chars < 360 THEN 'mid' ELSE 'long' END,
                CASE WHEN n_chars < 140 THEN 'short'
                     WHEN n_chars < 340 THEN 'mid' ELSE 'long' END])
                AS r)
           UNION ALL
            SELECT 'hash_raters', doc_id, r FROM d,
              LATERAL (SELECT unnest(ARRAY[
                CAST(CAST(concat('0x', substr(md5(
                  CAST(doc_id AS VARCHAR) || 'r1'), 1, 14)) AS BIGINT)
                  % 3 AS VARCHAR),
                CAST(CAST(concat('0x', substr(md5(
                  CAST(doc_id AS VARCHAR) || 'r2'), 1, 14)) AS BIGINT)
                  % 3 AS VARCHAR),
                CAST(CAST(concat('0x', substr(md5(
                  CAST(doc_id AS VARCHAR) || 'r3'), 1, 14)) AS BIGINT)
                  % 3 AS VARCHAR)]) AS r)),
          cells AS (SELECT panel, i, r,
                CAST(COUNT(*) AS BIGINT) AS nij
              FROM base GROUP BY 1, 2, 3),
          items AS (SELECT panel, i, SUM(nij) AS mi,
                SUM(nij * nij) AS s2i
              FROM cells GROUP BY 1, 2),
          ok AS (SELECT * FROM items WHERE mi = 3),
          pp AS (SELECT panel, CAST(COUNT(*) AS BIGINT) AS n_items,
                SUM(s2i) AS s2
              FROM ok GROUP BY 1),
          ts AS (SELECT cells.panel, cells.r, SUM(nij) AS t
              FROM cells JOIN ok ON ok.panel = cells.panel
                AND ok.i = cells.i
              GROUP BY 1, 2),
          tt AS (SELECT panel, CAST(COUNT(DISTINCT r) AS BIGINT)
                  AS k_cats,
                SUM(CAST(t AS HUGEINT) * t) AS t2
              FROM ts GROUP BY 1),
          x AS (SELECT pp.panel, n_items, k_cats,
                CAST(s2 - n_items * 3 AS HUGEINT) AS a,
                CAST(n_items AS HUGEINT) * 3 * 2 AS b,
                t2 AS c,
                CAST(n_items AS HUGEINT) * n_items * 9 AS dd
              FROM pp JOIN tt ON tt.panel = pp.panel)
         SELECT panel, n_items, CAST(3 AS BIGINT) AS m, k_cats,
                CAST((1000000 * a) // b AS BIGINT) AS pbar_e6,
                CAST((1000000 * c) // dd AS BIGINT) AS pe_e6,
                CAST(CASE WHEN dd = c THEN NULL
                  ELSE (1000000 * (a * dd - c * b)) // (b * (dd - c))
                  END AS BIGINT) AS kappa_e6
         FROM x ORDER BY panel""",
    // q_e32/q_e33: gap-filled centered daily series, day-keyed lag
    // equi-join, `//` toward zero live on the scatter leg's negative
    // autocorrelations
    "q_e32_acf" ->
      s"""WITH base AS (
            SELECT 'daily' AS leg, epoch_us(ts) AS us FROM events
            WHERE ts IS NOT NULL
           UNION ALL
            SELECT 'scatter',
              (CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)),
                1, 14)) AS BIGINT) % 200) * 86400000000
            FROM events WHERE event_id IS NOT NULL
           UNION ALL
            SELECT 'alternating',
              ((CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)),
                1, 14)) AS BIGINT) % 200) % 100) * 172800000000
            FROM events WHERE event_id IS NOT NULL),
          days AS (SELECT leg,
                (us - us % 86400000000) // 86400000000 AS x,
                CAST(COUNT(*) AS BIGINT) AS y
              FROM base GROUP BY 1, 2),
          span AS (SELECT leg, MIN(x) AS x0, MAX(x) AS x1
              FROM days GROUP BY 1),
          grid AS (SELECT leg, unnest(generate_series(x0, x1)) AS x
              FROM span),
          filled AS (SELECT grid.leg, grid.x, COALESCE(y, 0) AS y
              FROM grid LEFT JOIN days ON days.leg = grid.leg
                AND days.x = grid.x),
          st AS (SELECT leg, CAST(COUNT(*) AS BIGINT) AS n,
                SUM(y) AS s
              FROM filled GROUP BY 1),
          z AS (SELECT filled.leg, x, n * y - s AS z
              FROM filled JOIN st ON st.leg = filled.leg),
          dd AS (SELECT leg, SUM(CAST(z AS HUGEINT) * z) AS d
              FROM z GROUP BY 1),
          pr AS (SELECT a.leg, l.k AS lag,
                CAST(COUNT(*) AS BIGINT) AS n_pairs,
                SUM(CAST(a.z AS HUGEINT) * b.z) AS num
              FROM z a
              CROSS JOIN (SELECT unnest(range(1, 8)) AS k) l
              JOIN z b ON b.leg = a.leg AND b.x = a.x + l.k
              GROUP BY 1, 2)
         SELECT pr.leg, lag, n AS n_days, n_pairs,
                CAST(CASE WHEN d = 0 THEN NULL
                  ELSE (1000000 * num) // d END AS BIGINT) AS r_e6
         FROM pr JOIN dd ON dd.leg = pr.leg
         JOIN st ON st.leg = pr.leg
         ORDER BY pr.leg, lag""",
    "q_e33_ljung_box" ->
      s"""WITH base AS (
            SELECT 'daily' AS leg, epoch_us(ts) AS us FROM events
            WHERE ts IS NOT NULL
           UNION ALL
            SELECT 'scatter',
              (CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)),
                1, 14)) AS BIGINT) % 200) * 86400000000
            FROM events WHERE event_id IS NOT NULL
           UNION ALL
            SELECT 'alternating',
              ((CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)),
                1, 14)) AS BIGINT) % 200) % 100) * 172800000000
            FROM events WHERE event_id IS NOT NULL),
          days AS (SELECT leg,
                (us - us % 86400000000) // 86400000000 AS x,
                CAST(COUNT(*) AS BIGINT) AS y
              FROM base GROUP BY 1, 2),
          span AS (SELECT leg, MIN(x) AS x0, MAX(x) AS x1
              FROM days GROUP BY 1),
          grid AS (SELECT leg, unnest(generate_series(x0, x1)) AS x
              FROM span),
          filled AS (SELECT grid.leg, grid.x, COALESCE(y, 0) AS y
              FROM grid LEFT JOIN days ON days.leg = grid.leg
                AND days.x = grid.x),
          st AS (SELECT leg, CAST(COUNT(*) AS BIGINT) AS n,
                SUM(y) AS s
              FROM filled GROUP BY 1),
          z AS (SELECT filled.leg, x, n * y - s AS z
              FROM filled JOIN st ON st.leg = filled.leg),
          dd AS (SELECT leg, SUM(CAST(z AS HUGEINT) * z) AS d
              FROM z GROUP BY 1),
          pr AS (SELECT a.leg, l.k AS lag,
                SUM(CAST(a.z AS HUGEINT) * b.z) AS num
              FROM z a
              CROSS JOIN (SELECT unnest(range(1, 8)) AS k) l
              JOIN z b ON b.leg = a.leg AND b.x = a.x + l.k
              GROUP BY 1, 2),
          rr AS (SELECT pr.leg, lag, n,
                CASE WHEN d = 0 THEN NULL
                  ELSE (1000000 * num) // d END AS r
              FROM pr JOIN dd ON dd.leg = pr.leg
              JOIN st ON st.leg = pr.leg),
          terms AS (SELECT leg, n,
                CASE WHEN r IS NULL OR n <= 8 THEN NULL
                  ELSE (n * (n + 2) * CAST(r AS HUGEINT) * r)
                    // (1000000 * (n - lag)) END AS t
              FROM rr),
          agg AS (SELECT leg, MAX(n) AS n_days,
                CAST(COUNT(*) AS BIGINT) AS nl,
                SUM(CASE WHEN t IS NULL THEN 1 ELSE 0 END) AS nn,
                SUM(t) AS q
              FROM terms GROUP BY 1)
         SELECT leg, n_days, CAST(7 AS BIGINT) AS max_lag,
                CAST(CASE WHEN nn > 0 OR nl < 7 THEN NULL
                  ELSE q END AS BIGINT) AS q_e6,
                CAST(CASE WHEN nn > 0 OR nl < 7 THEN NULL
                  WHEN q >= 14067140 THEN 1 ELSE 0 END AS BIGINT)
                  AS sig
         FROM agg ORDER BY leg""",
    // q_v23: discordant-cell replay; `//` truncates toward zero on
    // both engines and b−c is negative on the threshold leg
    "q_v23_mcnemar" ->
      s"""WITH d AS (SELECT doc_id, n_chars FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
          u AS (SELECT *, CAST(concat('0x', substr(md5(
                  CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                  % 1000000000 AS h
              FROM d),
          base AS (SELECT 'threshold_shift' AS panel,
                CASE WHEN n_chars < 150 THEN 1 ELSE 0 END AS a,
                CASE WHEN n_chars < 200 THEN 1 ELSE 0 END AS b
              FROM u
             UNION ALL
                   SELECT 'hash_aa', CAST(h % 2 AS BIGINT),
                CAST((h // 2) % 2 AS BIGINT)
              FROM u),
          agg AS (SELECT panel, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
                CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
              FROM base GROUP BY 1),
          z AS (SELECT *, CASE WHEN b + c = 0 THEN NULL
                ELSE (1000000 * (b - c) * (b - c)) // (b + c)
                END AS z2
              FROM agg)
         SELECT panel, n, b, c, CAST(z2 AS BIGINT) AS z2_e6,
                CAST(SIGN(b - c) AS BIGINT) AS d_sign,
                CAST(CASE WHEN z2 IS NULL THEN 0
                  WHEN z2 >= 3841459 THEN 1 ELSE 0 END AS BIGINT)
                  AS sig
         FROM z ORDER BY panel""",
    // q_v24: complete-block Q replay — the operator's subject filter
    // (carries every treatment) AND its MAX dup-reduce are mirrored
    // even though this construction makes both no-ops
    "q_v24_cochran_q" ->
      s"""WITH d AS (SELECT doc_id, n_chars FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
          u AS (SELECT *, CAST(concat('0x', substr(md5(
                  CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                  % 1000000000 AS h
              FROM d),
          base AS (SELECT 'flag_mix' AS panel, doc_id AS s,
                'short' AS t,
                CAST(CASE WHEN n_chars < 150 THEN 1 ELSE 0 END
                  AS BIGINT) AS v
              FROM u
             UNION ALL SELECT 'flag_mix', doc_id, 'long',
                CASE WHEN n_chars >= 350 THEN 1 ELSE 0 END FROM u
             UNION ALL SELECT 'flag_mix', doc_id, 'hash', h % 2 FROM u
             UNION ALL SELECT 'hash_null', doc_id, 'b0', h % 2 FROM u
             UNION ALL SELECT 'hash_null', doc_id, 'b1',
                (h // 2) % 2 FROM u
             UNION ALL SELECT 'hash_null', doc_id, 'b2',
                (h // 4) % 2 FROM u),
          bb AS (SELECT panel, s, t, MAX(v) AS v
              FROM base GROUP BY 1, 2, 3),
          k AS (SELECT panel, COUNT(DISTINCT t) AS kk
              FROM bb GROUP BY 1),
          r AS (SELECT panel, s, COUNT(*) AS nt, SUM(v) AS rr
              FROM bb GROUP BY 1, 2),
          cb AS (SELECT r.panel, s, rr FROM r
              JOIN k ON k.panel = r.panel AND r.nt = k.kk),
          ragg AS (SELECT panel, CAST(COUNT(*) AS BIGINT) AS n,
                SUM(rr) AS ssum,
                SUM(CAST(rr AS HUGEINT) * rr) AS r2
              FROM cb GROUP BY 1),
          tagg AS (SELECT bb.panel, t, SUM(v) AS ts
              FROM bb JOIN cb ON cb.panel = bb.panel
                AND cb.s = bb.s
              GROUP BY 1, 2),
          t2 AS (SELECT panel, SUM(CAST(ts AS HUGEINT) * ts) AS tt
              FROM tagg GROUP BY 1),
          qq AS (SELECT ragg.panel, n, kk, tt, ssum, r2,
                CASE WHEN kk * ssum - r2 = 0 OR kk < 2 THEN NULL
                  ELSE (1000000 * (kk - 1)
                    * (kk * tt - CAST(ssum AS HUGEINT) * ssum))
                    // (kk * ssum - r2) END AS q
              FROM ragg
              JOIN t2 ON t2.panel = ragg.panel
              JOIN k ON k.panel = ragg.panel)
         SELECT panel, n, CAST(kk AS BIGINT) AS k,
                CAST(q AS BIGINT) AS q_e6,
                CAST(CASE WHEN q IS NULL THEN 0
                  WHEN kk - 1 > 8 THEN NULL
                  WHEN q >= ([3841459,5991465,7814728,9487729,
                    11070498,12591587,14067140,15507313])
                    [CAST(kk - 1 AS INT)]
                  THEN 1 ELSE 0 END AS BIGINT) AS sig
         FROM qq ORDER BY panel""",
    // q_qr31: the drift dashboard replay — each family's exact
    // statistic through its own established oracle chain (qr11's KS
    // grid, qr16's MW midranks, a16's MK pairs), the SAME PValue
    // table literals (exp/erfc are not bit-portable; the tables are),
    // the same sqrt+floor centi-bucket, qr30's step-up tail
    "q_qr31_drift_fdr" ->
      s"""WITH dd AS MATERIALIZED (SELECT doc_id,
                CAST(n_chars AS BIGINT) AS nc, source, lang
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                AND source IS NOT NULL AND lang IS NOT NULL),
          tbl AS (SELECT ${PValue.ksSqlList} AS kst,
                ${PValue.normSqlList} AS nmt),
          ksreal AS MATERIALIZED (
            WITH d AS MATERIALIZED (
                SELECT source AS g, nc AS v FROM dd),
            ${KsDrift.oracleSql}),
          ksplant AS MATERIALIZED (
            WITH d AS MATERIALIZED (
                SELECT source AS g, nc AS v FROM dd
               UNION ALL
                SELECT 'planted_shift', nc + 150 FROM dd
                WHERE doc_id % 4 = 0),
            ${KsDrift.oracleSql}),
          ksout AS (SELECT * FROM ksreal
             UNION ALL
                    SELECT * FROM ksplant WHERE g = 'planted_shift'),
          ksp AS (SELECT 'ks:' || g AS test,
                CASE WHEN n1 = 0 OR n2 = 0 THEN 1000000
                  WHEN CAST(floor(sqrt(CAST(
                      (10000 * CAST(ks_num AS HUGEINT) * ks_num)
                      // (CAST(n1 AS HUGEINT) * n2 * (n1 + n2))
                      AS DOUBLE))) AS INT) >= 350 THEN 0
                  ELSE kst[CAST(floor(sqrt(CAST(
                      (10000 * CAST(ks_num AS HUGEINT) * ks_num)
                      // (CAST(n1 AS HUGEINT) * n2 * (n1 + n2))
                      AS DOUBLE))) AS INT) + 1]
                END AS p
              FROM ksout CROSS JOIN tbl),
          mwz AS MATERIALIZED (
            WITH rowsx AS (SELECT lang AS cmp, 'cand' AS c, nc AS v
                    FROM dd WHERE lang <> 'en'
               UNION ALL
                    SELECT l.cmp, 'base', dd.nc FROM dd,
                      (SELECT DISTINCT lang AS cmp FROM dd
                       WHERE lang <> 'en') l
                    WHERE dd.lang = 'en'),
            grid AS (SELECT cmp, v, CAST(COUNT(*) AS BIGINT) AS t,
                  CAST(SUM(CASE WHEN c = 'cand' THEN 1 ELSE 0 END)
                    AS BIGINT) AS ta
                FROM rowsx GROUP BY 1, 2),
            cum AS (SELECT cmp, v, t, ta,
                  COALESCE(SUM(t) OVER (PARTITION BY cmp ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS below
                FROM grid),
            agg AS (SELECT cmp, SUM(ta) AS n_a, SUM(t - ta) AS n_b,
                  SUM(ta * (2 * below + t + 1)) AS r2,
                  SUM(t * t * t - t) AS tie
                FROM cum GROUP BY 1),
            z AS (SELECT cmp, n_a, n_b,
                  CAST(r2 AS HUGEINT) - CAST(n_a AS HUGEINT) * (n_a + 1)
                    - CAST(n_a AS HUGEINT) * n_b AS delta,
                  CAST(n_a + n_b AS HUGEINT) AS nn,
                  CAST(tie AS HUGEINT) AS tie
                FROM agg)
            SELECT cmp,
                  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                       WHEN nn * nn * nn - nn - tie = 0 THEN 0
                       ELSE 3 * delta * delta * nn * (nn - 1) * 1000000
                         // (CAST(n_a AS HUGEINT) * n_b
                            * (nn * nn * nn - nn - tie))
                  END AS z2
            FROM z),
          mwp AS (SELECT 'mw:' || cmp AS test,
                CASE WHEN z2 IS NULL THEN NULL
                  WHEN CAST(floor(sqrt(CAST(z2 // 100 AS DOUBLE)))
                    AS INT) >= 500 THEN 0
                  ELSE nmt[CAST(floor(sqrt(CAST(z2 // 100 AS DOUBLE)))
                    AS INT) + 1]
                END AS p
              FROM mwz CROSS JOIN tbl),
          mkstat AS MATERIALIZED (
            WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events
                 WHERE event_type IS NOT NULL AND ts IS NOT NULL),
            s AS (SELECT event_type,
                    (us - ((us % 86400000000 + 86400000000)
                      % 86400000000)) // 86400000000 AS x,
                    COUNT(*) AS y
                  FROM e GROUP BY 1, 2),
            p AS (SELECT a.event_type,
                    CASE WHEN b.y > a.y THEN 1
                         WHEN b.y < a.y THEN -1 ELSE 0 END AS sg
                  FROM s a JOIN s b
                    ON a.event_type = b.event_type AND a.x < b.x),
            sp AS (SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s_stat
                   FROM p GROUP BY event_type),
            tv AS (SELECT event_type, y, COUNT(*) AS t
                   FROM s GROUP BY event_type, y),
            ti AS (SELECT event_type,
                     CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                       AS tie_sum
                   FROM tv GROUP BY event_type),
            nd AS (SELECT event_type, COUNT(*) AS n_days
                   FROM s GROUP BY event_type)
            SELECT nd.event_type, COALESCE(sp.s_stat, 0) AS s_stat,
                  nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
                    - ti.tie_sum AS var18
            FROM nd JOIN ti ON nd.event_type = ti.event_type
            LEFT JOIN sp ON nd.event_type = sp.event_type),
          mkp AS (SELECT 'mk:' || event_type AS test,
                CASE WHEN CAST(floor(sqrt(CAST(z2 // 100 AS DOUBLE)))
                    AS INT) >= 500 THEN 0
                  ELSE nmt[CAST(floor(sqrt(CAST(z2 // 100 AS DOUBLE)))
                    AS INT) + 1]
                END AS p
              FROM (SELECT event_type,
                  CASE WHEN s_stat = 0 OR var18 = 0 THEN 0
                    ELSE (18000000 * CAST(ABS(s_stat) - 1 AS HUGEINT)
                      * (ABS(s_stat) - 1)) // var18
                  END AS z2
                FROM mkstat) CROSS JOIN tbl),
          allp AS (SELECT test, p FROM ksp
             UNION ALL SELECT test, p FROM mwp
             UNION ALL SELECT test, p FROM mkp),
          rk AS (SELECT 'drift' AS panel, test, p,
                ROW_NUMBER() OVER (ORDER BY p, test) AS k,
                COUNT(*) OVER () AS m
              FROM allp WHERE p IS NOT NULL),
          km AS (SELECT rk.*, MAX(CASE WHEN p * m <= k * 50000
                THEN k ELSE 0 END) OVER () AS kmax
              FROM rk)
         SELECT panel, test, CAST(p AS BIGINT) AS p_e6,
                CAST(k AS BIGINT) AS rank, CAST(m AS BIGINT) AS m,
                CAST(CASE WHEN k <= kmax THEN 1 ELSE 0 END AS BIGINT)
                  AS reject
         FROM km ORDER BY rank""",
    // q_qr30: the a27 replicate machinery × 20 static source panels,
    // then the division-free BH step-up compare p·m ≤ k·α
    "q_qr30_bh_fdr" ->
      s"""WITH d AS (SELECT doc_id, n_chars, source FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                AND source IS NOT NULL),
          srcs AS (SELECT 'src' || CAST(unnest(range(0, 20)) AS VARCHAR)
                AS panel),
          base AS (SELECT panel,
                CASE WHEN source = panel THEN 'a' ELSE 'b' END AS c,
                CAST(n_chars AS BIGINT) AS v,
                CAST(doc_id AS VARCHAR) AS id
              FROM d CROSS JOIN srcs),
          obs AS (SELECT panel,
                SUM(CASE WHEN c = 'a' THEN v ELSE 0 END) AS oa,
                CAST(SUM(CASE WHEN c = 'a' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ona,
                SUM(CASE WHEN c = 'b' THEN v ELSE 0 END) AS ob,
                CAST(SUM(CASE WHEN c = 'b' THEN 1 ELSE 0 END)
                  AS BIGINT) AS onb
              FROM base GROUP BY 1),
          hs AS (SELECT id, s,
                CAST(concat('0x', substr(md5(id || '#' ||
                  CAST(s AS VARCHAR)), 1, 14)) AS BIGINT) AS h
              FROM (SELECT DISTINCT id FROM base)
              CROSS JOIN (SELECT unnest(range(0, 10)) AS s)),
          reps AS (SELECT panel, b,
                SUM(CASE WHEN bit = 0 THEN v ELSE 0 END) AS sa,
                SUM(CASE WHEN bit = 0 THEN 1 ELSE 0 END) AS na,
                SUM(CASE WHEN bit = 1 THEN v ELSE 0 END) AS sb,
                SUM(CASE WHEN bit = 1 THEN 1 ELSE 0 END) AS nb
              FROM (SELECT base.*, t.b,
                    (h >> CAST(t.b % 56 AS INT)) % 2 AS bit
                  FROM base
                  CROSS JOIN (SELECT unnest(range(0, 512)) AS b) t
                  JOIN hs ON hs.id = base.id AND hs.s = t.b // 56)
              GROUP BY 1, 2),
          ex AS (SELECT reps.panel,
                CASE WHEN na = 0 OR nb = 0 THEN 1
                  WHEN abs(CAST(sa AS HUGEINT) * nb
                      - CAST(sb AS HUGEINT) * na) * ona * onb
                    >= abs(CAST(oa AS HUGEINT) * onb
                      - CAST(ob AS HUGEINT) * ona) * na * nb
                  THEN 1 ELSE 0 END AS x
              FROM reps JOIN obs ON obs.panel = reps.panel),
          pp AS (SELECT ex.panel,
                (1000000 * (1 + SUM(x))) // 513 AS p
              FROM ex GROUP BY 1),
          rk AS (SELECT 'sources' AS family, panel AS test, p,
                ROW_NUMBER() OVER (ORDER BY p, panel) AS k,
                COUNT(*) OVER () AS m
              FROM pp),
          km AS (SELECT rk.*, MAX(CASE WHEN p * m <= k * 50000
                THEN k ELSE 0 END) OVER () AS kmax
              FROM rk)
         SELECT family, test, CAST(p AS BIGINT) AS p_e6,
                CAST(k AS BIGINT) AS rank, CAST(m AS BIGINT) AS m,
                CAST(CASE WHEN k <= kmax THEN 1 ELSE 0 END AS BIGINT)
                  AS reject
         FROM km ORDER BY rank""",
    // q_qr29: the 2×k trend rational replayed over the band grid
    "q_qr29_ca_trend" ->
      s"""WITH d AS (SELECT doc_id, n_chars, lang FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                AND lang IS NOT NULL),
          u AS (SELECT *,
                CASE WHEN n_chars < 150 THEN 0
                     WHEN n_chars < 250 THEN 1
                     WHEN n_chars < 350 THEN 2 ELSE 3 END AS w,
                CAST(concat('0x', substr(md5(
                  CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                  % 1000000000 AS h
              FROM d),
          base AS (SELECT 'zh_trend' AS panel, w,
                CASE WHEN lang = 'zh' THEN 1 ELSE 0 END AS v
              FROM u
             UNION ALL
                   SELECT 'hash_null', w, CAST(h % 2 AS BIGINT)
              FROM u),
          cats AS (SELECT panel, w, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(v) AS BIGINT) AS r
              FROM base GROUP BY 1, 2),
          agg AS (SELECT panel,
                CAST(COUNT(DISTINCT w) AS BIGINT) AS k,
                SUM(n) AS nn, SUM(r) AS rr,
                SUM(w * n) AS sn, SUM(w * r) AS sr,
                SUM(w * w * n) AS s2n
              FROM cats GROUP BY 1),
          x AS (SELECT panel, k, nn, rr,
                CAST(nn AS HUGEINT) * sr - CAST(rr AS HUGEINT) * sn
                  AS num,
                CAST(nn AS HUGEINT) * s2n
                  - CAST(sn AS HUGEINT) * sn AS den
              FROM agg)
         SELECT panel, k, CAST(nn AS BIGINT) AS n,
                CAST(rr AS BIGINT) AS pos,
                CAST(CASE WHEN rr = 0 OR rr = nn OR den = 0 THEN NULL
                  ELSE (1000000 * nn * num * num)
                    // (rr * (nn - rr) * den) END AS BIGINT) AS z2_e6,
                CAST(SIGN(num) AS BIGINT) AS d_sign,
                CAST(CASE WHEN rr = 0 OR rr = nn OR den = 0 THEN 0
                  WHEN (1000000 * nn * num * num)
                    // (rr * (nn - rr) * den) >= 3841459
                  THEN 1 ELSE 0 END AS BIGINT) AS sig
         FROM x ORDER BY panel""",
    // q_qr26: the qr23 grids through the information lens — one
    // shared table-ln chain over the union of the mi / row-entropy /
    // col-entropy term families, then per-panel sums; `//` truncates
    // toward zero on both engines (the q_v7 note), which the
    // possibly-negative misum exercises on the hash_null panel
    "q_qr26_mutual_info" ->
      s"""WITH d AS (SELECT doc_id, lang, source, n_chars
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                AND lang IS NOT NULL AND source IS NOT NULL),
          u AS (SELECT *, CAST(concat('0x', substr(md5(
                  CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                  % 1000000000 AS h
              FROM d),
          base AS (SELECT 'zh_len' AS panel,
                CASE WHEN lang = 'zh' THEN 'zh' ELSE 'rest' END AS r,
                CAST(CASE WHEN n_chars >= 350 THEN 1 ELSE 0 END
                  AS VARCHAR) AS c
              FROM u
             UNION ALL
                   SELECT 'hash_null', CAST(h % 2 AS VARCHAR),
                CAST((h // 2) % 2 AS VARCHAR)
              FROM u
             UNION ALL
                   SELECT 'lang_source', lang, source FROM u),
          cells AS (SELECT panel, r, c, CAST(COUNT(*) AS BIGINT) AS n
              FROM base GROUP BY 1, 2, 3),
          rowm AS (SELECT panel, r, SUM(n) AS rn
              FROM cells GROUP BY 1, 2),
          colm AS (SELECT panel, c, SUM(n) AS cn
              FROM cells GROUP BY 1, 2),
          tot AS (SELECT panel, SUM(n) AS nn,
                COUNT(DISTINCT r) AS rr, COUNT(DISTINCT c) AS cc
              FROM cells GROUP BY 1),
          terms AS (
            SELECT cells.panel, 'mi' AS kind, n AS w,
                   nn * n AS num, rn * cn AS den
            FROM cells
            JOIN rowm ON rowm.panel = cells.panel AND rowm.r = cells.r
            JOIN colm ON colm.panel = cells.panel AND colm.c = cells.c
            JOIN tot ON tot.panel = cells.panel
           UNION ALL
            SELECT rowm.panel, 'hr', rn, nn, rn
            FROM rowm JOIN tot ON tot.panel = rowm.panel
           UNION ALL
            SELECT colm.panel, 'hc', cn, nn, cn
            FROM colm JOIN tot ON tot.panel = colm.panel),
          kz AS (SELECT *, CAST(LENGTH(bin(num)) - LENGTH(bin(den))
                AS BIGINT) AS kz0 FROM terms),
          kk AS (SELECT *, CASE WHEN
                CAST(num AS HUGEINT)
                  * CAST(power(2, GREATEST(-kz0, 0)) AS HUGEINT)
                < CAST(den AS HUGEINT)
                  * CAST(power(2, GREATEST(kz0, 0)) AS HUGEINT)
                THEN kz0 - 1 ELSE kz0 END AS kke FROM kz),
          mm AS (SELECT *, (CAST(num AS HUGEINT)
                   * CAST(power(2, GREATEST(-kke, 0)) AS HUGEINT) * 256)
                // (CAST(den AS HUGEINT)
                   * CAST(power(2, GREATEST(kke, 0)) AS HUGEINT)) - 256
                AS mi FROM kk),
          ll AS (SELECT *, kke * ${graft.operators.Drift.Ln2E9}
                + (${graft.operators.Drift.MantissaLnE9
                      .mkString("[", ",", "]")})[CAST(mi AS INT) + 1]
                AS ln_e9 FROM mm),
          sums AS (SELECT panel,
                SUM(CASE WHEN kind = 'mi'
                  THEN CAST(w AS HUGEINT) * ln_e9 END) AS misum,
                SUM(CASE WHEN kind = 'hr'
                  THEN CAST(w AS HUGEINT) * ln_e9 END) AS hrsum,
                SUM(CASE WHEN kind = 'hc'
                  THEN CAST(w AS HUGEINT) * ln_e9 END) AS hcsum
              FROM ll GROUP BY 1)
         SELECT t.panel, CAST(nn AS BIGINT) AS n,
                CAST(rr AS BIGINT) AS r, CAST(cc AS BIGINT) AS c,
                CAST(CASE WHEN rr < 2 OR cc < 2 THEN NULL
                  ELSE misum // nn END AS BIGINT) AS mi_e9,
                CAST(CASE WHEN rr < 2 OR cc < 2
                    OR LEAST(hrsum, hcsum) <= 0 THEN NULL
                  ELSE (1000000 * misum) // LEAST(hrsum, hcsum)
                  END AS BIGINT) AS nmi_e6
         FROM sums JOIN tot t ON t.panel = sums.panel
         ORDER BY t.panel""",
    "q_qr23_independence" ->
      s"""WITH d AS (SELECT doc_id, lang, source, n_chars
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                AND lang IS NOT NULL AND source IS NOT NULL),
          u AS (SELECT *, CAST(concat('0x', substr(md5(
                  CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
                  % 1000000000 AS h
              FROM d),
          base AS (SELECT 'zh_len' AS panel,
                CASE WHEN lang = 'zh' THEN 'zh' ELSE 'rest' END AS r,
                CAST(CASE WHEN n_chars >= 350 THEN 1 ELSE 0 END
                  AS VARCHAR) AS c
              FROM u
             UNION ALL
                   SELECT 'hash_null', CAST(h % 2 AS VARCHAR),
                CAST((h // 2) % 2 AS VARCHAR)
              FROM u
             UNION ALL
                   SELECT 'lang_source', lang, source FROM u),
          cells AS (SELECT panel, r, c, CAST(COUNT(*) AS BIGINT) AS n
              FROM base GROUP BY 1, 2, 3),
          rowm AS (SELECT panel, r, SUM(n) AS rn
              FROM cells GROUP BY 1, 2),
          colm AS (SELECT panel, c, SUM(n) AS cn
              FROM cells GROUP BY 1, 2),
          tot AS (SELECT panel, SUM(n) AS nn FROM cells GROUP BY 1),
          rc AS (SELECT panel, CAST(COUNT(*) AS BIGINT) AS r
              FROM rowm GROUP BY 1),
          cc AS (SELECT panel, CAST(COUNT(*) AS BIGINT) AS c
              FROM colm GROUP BY 1),
          grid AS (SELECT rowm.panel, rn, cn,
                COALESCE(cells.n, 0) AS n, nn
              FROM rowm
              JOIN colm ON colm.panel = rowm.panel
              LEFT JOIN cells ON cells.panel = rowm.panel
                AND cells.r = rowm.r AND cells.c = colm.c
              JOIN tot ON tot.panel = rowm.panel),
          terms AS (SELECT panel, nn,
                (1000000 * (CAST(nn AS HUGEINT) * n
                    - CAST(rn AS HUGEINT) * cn)
                  * (CAST(nn AS HUGEINT) * n
                    - CAST(rn AS HUGEINT) * cn))
                // (CAST(nn AS HUGEINT) * rn * cn) AS term
              FROM grid),
          pp AS (SELECT panel, MAX(nn) AS n, SUM(term) AS chi2
              FROM terms GROUP BY 1),
          fin AS (SELECT pp.panel, n, rc.r, cc.c,
                CASE WHEN rc.r < 2 OR cc.c < 2 THEN NULL
                     ELSE chi2 END AS chi2_e6
              FROM pp
              JOIN rc ON rc.panel = pp.panel
              JOIN cc ON cc.panel = pp.panel)
         SELECT panel, CAST(n AS BIGINT) AS n, r, c,
                CAST(chi2_e6 AS BIGINT) AS chi2_e6,
                CAST(CASE WHEN chi2_e6 IS NULL THEN NULL
                     ELSE chi2_e6 // (CAST(n AS HUGEINT)
                       * (LEAST(r, c) - 1)) END AS BIGINT) AS v2_e6,
                CAST(CASE WHEN chi2_e6 IS NULL THEN 0
                          WHEN (r - 1) * (c - 1) > 8 THEN NULL
                          WHEN chi2_e6 >= (${RankTest.Chi2Crit95E6ByDf
                            .mkString("[", ",", "]")})[CAST((r - 1)
                            * (c - 1) AS INT)] THEN 1
                          ELSE 0 END AS BIGINT) AS sig
         FROM fin ORDER BY panel""",
    // q_qr22: the jensenShannonExactOracleSql generator (both ln
    // chains embed the same 256-cell table; one // quantization)
    "q_qr22_jsd" -> {
      def cohort(where: String) =
        "SELECT LEAST(GREATEST(n_chars, 0) // 250, 7) AS bucket " +
          "FROM documents WHERE doc_id IS NOT NULL " +
          s"AND n_chars IS NOT NULL AND $where"
      val ref = cohort("doc_id % 2 = 0")
      val aa = Drift.jensenShannonExactOracleSql(ref,
        cohort("doc_id % 2 = 1"))
      val dr = Drift.jensenShannonExactOracleSql(ref,
        cohort("doc_id % 2 = 1 AND n_chars >= 400"))
      s"""SELECT 'aa_null' AS pair, * FROM $aa
          UNION ALL
          SELECT 'len_drift' AS pair, * FROM $dr
          ORDER BY pair, bucket"""
    },
    // q_qr21: the same doubled-midrank grid, k cohorts — per-cohort
    // R2, the three-floor cascade (term // nc, s // N(N+1), the
    // tie-corrected final // with GREATEST 0), and the df-indexed χ²
    // literal table shared with RankTest.Chi2Crit95E6ByDf
    "q_qr21_kruskal" ->
      s"""WITH d AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS v
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                AND lang IS NOT NULL),
          base AS (SELECT 'lang' AS panel, lang AS c, v FROM d
             UNION ALL
                   SELECT 'aa_null', CAST(doc_id % 3 AS VARCHAR), v
                   FROM d),
          cg AS (SELECT panel, c, v, CAST(COUNT(*) AS BIGINT) AS tc
              FROM base GROUP BY 1, 2, 3),
          vg AS (SELECT panel, v, SUM(tc) AS t FROM cg GROUP BY 1, 2),
          vgb AS (SELECT panel, v, t,
                COALESCE(SUM(t) OVER (PARTITION BY panel ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS below
              FROM vg),
          perc AS (SELECT cg.panel, cg.c, SUM(tc) AS nc,
                SUM(tc * (2 * below + t + 1)) AS r2
              FROM cg JOIN vgb
                ON vgb.panel = cg.panel AND vgb.v = cg.v
              GROUP BY 1, 2),
          terms AS (SELECT panel, nc,
                (3000000 * CAST(r2 AS HUGEINT) * r2) // nc AS term
              FROM perc),
          perg AS (SELECT panel, CAST(COUNT(*) AS BIGINT) AS k,
                SUM(nc) AS n, SUM(term) AS s
              FROM terms GROUP BY 1),
          ties AS (SELECT panel, SUM(t * t * t - t) AS tie
              FROM vg GROUP BY 1),
          h AS (SELECT perg.panel, k, n,
                (s // (CAST(n AS HUGEINT) * (n + 1)))
                  - 3000000 * (CAST(n AS HUGEINT) + 1) AS h0,
                CAST(n AS HUGEINT) * n * n - n - tie AS tiefree
              FROM perg JOIN ties ON ties.panel = perg.panel),
          hh AS (SELECT panel, k, n,
                CASE WHEN k < 2 THEN NULL
                     WHEN tiefree = 0 THEN 0
                     ELSE GREATEST((h0 * (CAST(n AS HUGEINT) * n * n
                       - n)) // tiefree, 0)
                END AS h_e6
              FROM h)
         SELECT panel, k, CAST(n AS BIGINT) AS n,
                CAST(h_e6 AS BIGINT) AS h_e6,
                CAST(CASE WHEN h_e6 IS NULL THEN 0
                          WHEN k - 1 > 8 THEN NULL
                          WHEN h_e6 >= (${RankTest.Chi2Crit95E6ByDf
                            .mkString("[", ",", "]")})[CAST(k - 1
                            AS INT)] THEN 1
                          ELSE 0 END AS BIGINT) AS sig
         FROM hh ORDER BY panel""",
    // q_qr16: doubled-midrank construction over the (cmp, value) grid
    // — below via the same 1-PRECEDING cumulative window the engine
    // uses, then the tie-corrected z² as one HUGEINT rational
    // 3·Δ²·N·(N−1)·1e6 // (n_a·n_b·(N³−N−T)); degenerate guards
    // replayed for parity
    "q_qr16_rank_drift" ->
      """WITH d AS (SELECT lang, CAST(n_chars AS BIGINT) AS v
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                AND lang IS NOT NULL),
          langs AS (SELECT DISTINCT lang AS cmp FROM d
                    WHERE lang <> 'en'),
          rowsx AS (SELECT lang AS cmp, 'cand' AS c, v FROM d
                    WHERE lang <> 'en'
             UNION ALL
                    SELECT l.cmp, 'base', d.v FROM d, langs l
                    WHERE d.lang = 'en'),
          grid AS (SELECT cmp, v, CAST(COUNT(*) AS BIGINT) AS t,
                CAST(SUM(CASE WHEN c = 'cand' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ta
              FROM rowsx GROUP BY 1, 2),
          cum AS (SELECT cmp, v, t, ta,
                COALESCE(SUM(t) OVER (PARTITION BY cmp ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS below
              FROM grid),
          agg AS (SELECT cmp, SUM(ta) AS n_a, SUM(t - ta) AS n_b,
                SUM(ta * (2 * below + t + 1)) AS r2,
                SUM(t * t * t - t) AS tie
              FROM cum GROUP BY 1),
          z AS (SELECT cmp, n_a, n_b,
                CAST(r2 AS HUGEINT)
                  - CAST(n_a AS HUGEINT) * (n_a + 1) AS u2,
                CAST(r2 AS HUGEINT) - CAST(n_a AS HUGEINT) * (n_a + 1)
                  - CAST(n_a AS HUGEINT) * n_b AS delta,
                CAST(n_a + n_b AS HUGEINT) AS nn,
                CAST(tie AS HUGEINT) AS tie
              FROM agg),
          zz AS (SELECT *,
                CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                     WHEN nn * nn * nn - nn - tie = 0 THEN 0
                     ELSE 3 * delta * delta * nn * (nn - 1) * 1000000
                       // (CAST(n_a AS HUGEINT) * n_b
                          * (nn * nn * nn - nn - tie))
                END AS z2
              FROM z)
         SELECT cmp, CAST(n_a AS BIGINT) AS n_a,
                CAST(n_b AS BIGINT) AS n_b,
                CAST(u2 AS BIGINT) AS u2_a,
                CAST(CASE WHEN delta > 0 THEN 1 WHEN delta < 0 THEN -1
                     ELSE 0 END AS BIGINT) AS d_sign,
                CAST(z2 AS BIGINT) AS z2_e6,
                CAST(CASE WHEN z2 >= 3841459 THEN 1 ELSE 0 END
                  AS BIGINT) AS sig
         FROM zz ORDER BY cmp""",
    // q_qr11: the grid form of the same exact-integer KS numerator —
    // source × distinct-value CROSS JOIN (oracle scale), two cumulative
    // windows, one double division (KsDrift.oracleSql)
    "q_qr11_ks_drift" ->
      s"""WITH d AS MATERIALIZED (
             SELECT source AS g, n_chars AS v FROM documents
             WHERE source IS NOT NULL AND n_chars IS NOT NULL),
          ${KsDrift.oracleSql.replace("SELECT c.g,", "SELECT c.g AS source,")}""",
    "q_qr10_divergent_tokens" ->
      s"""WITH $duckDivergenceTerms
         SELECT source, rank, token, kl_term_e9 FROM (
           SELECT source, token, kl_term_e9,
                  CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY kl_term_e9 DESC, token) AS INTEGER) AS rank
           FROM term)
         WHERE rank <= 3 ORDER BY source, rank""",
    // q_qr8: digit of the floored BIGINT's string form; shares in
    // positive integral division (`//` truncation == floor here)
    "q_qr8_benford" ->
      """WITH d AS (SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                      AS VARCHAR), 1, 1) AS digit
            FROM orders),
          g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit)
         SELECT digit, n,
                CAST(n * 1000000 // SUM(n) OVER () AS BIGINT) AS share_e6
         FROM g ORDER BY digit""",
    // q_qr7 (L72): q_t11's chain + two source lookups + the canonical
    // least/greatest source-pair rollup
    "q_qr7_contamination_matrix" ->
      s"""WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, greatest(len($duckToks) - 7, 0) + 1),
                     i -> array_to_string(($duckToks)[i:i+7], ' '))) AS sh
            FROM documents),
          ex AS (SELECT doc_id, unnest(sh) AS g FROM sh),
          rare AS (SELECT g FROM ex GROUP BY g
                   HAVING COUNT(*) BETWEEN 2 AND 5),
          pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM ex a JOIN ex b USING (g) JOIN rare USING (g)
                 WHERE a.doc_id < b.doc_id),
          ps AS (SELECT id_a, id_b, COUNT(*) AS n_shared FROM pr
                 GROUP BY id_a, id_b HAVING COUNT(*) >= 3),
          m AS (SELECT least(da.source, db.source) AS src_a,
                       greatest(da.source, db.source) AS src_b, n_shared
                FROM ps JOIN documents da ON ps.id_a = da.doc_id
                        JOIN documents db ON ps.id_b = db.doc_id)
         SELECT src_a, src_b, COUNT(*) AS n_pairs,
                CAST(SUM(n_shared) AS BIGINT) AS n_shared_total
         FROM m GROUP BY src_a, src_b ORDER BY src_a, src_b""",
    // q_t15: same rare-gram candidate generation as q_t11 (minShared=1),
    // then the longest common TOKEN run per pair via the diagonal-islands
    // trick: token matches (i, j) grouped by diagonal i-j; within a
    // diagonal, consecutive i values share i - row_number() — the island
    // — and the largest island size IS the LCS length in tokens (>= 8 by
    // candidacy, where the Spark side's shingle-chain formula is exact).
    "q_t15_max_shared_run" ->
      s"""WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, greatest(len($duckToks) - 7, 0) + 1),
                     i -> array_to_string(($duckToks)[i:i+7], ' '))) AS sh
            FROM documents),
          ex AS (SELECT doc_id, unnest(sh) AS g FROM sh),
          rare AS (SELECT g FROM ex GROUP BY g HAVING COUNT(*) BETWEEN 2 AND 5),
          prs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM ex a JOIN ex b USING (g) JOIN rare USING (g)
                  WHERE a.doc_id < b.doc_id),
          tok AS (SELECT doc_id, struct_extract(s, 'p') AS pos,
                         struct_extract(s, 'tk') AS tk
                  FROM (SELECT doc_id,
                               unnest(list_transform(
                                 range(1, len($duckToks) + 1),
                                 i -> {'p': i, 'tk': ($duckToks)[i]})) AS s
                        FROM documents)),
          m AS (SELECT p.id_a, p.id_b, ta.pos AS i, tb.pos AS j
                FROM prs p
                JOIN tok ta ON ta.doc_id = p.id_a
                JOIN tok tb ON tb.doc_id = p.id_b AND tb.tk = ta.tk),
          runs AS (SELECT id_a, id_b, i - j AS diag,
                          i - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, i - j
                                                 ORDER BY i) AS grp
                   FROM m)
          SELECT id_a, id_b, CAST(MAX(cnt) AS BIGINT) AS max_run
          FROM (SELECT id_a, id_b, diag, grp, COUNT(*) AS cnt
                FROM runs GROUP BY id_a, id_b, diag, grp)
          GROUP BY id_a, id_b ORDER BY id_a, id_b""",
    "q_d4_embedding_neardup" -> embeddingNearDupOracle,
    // the LSH scale path must reproduce the SAME exhaustive exact answer
    "q_d4x_embedding_neardup_lsh" -> embeddingNearDupOracle,
    "q_d7_semantic_prune" -> semanticPruneOracle,
    // q_d8: same tumbling windows as the engine (range is exclusive so
    // len+1; inclusive list slice [s:s+11] = 12 tokens, clamped tail),
    // keeper = first (doc_id, pos) per exact unit string (the engine
    // keys on sha2(unit) — identical absent a SHA-256 collision, which
    // would be a finding, not noise), docs rebuilt from survivors in
    // order; NULL agg (zero kept) and unit-less docs coalesce to ''
    // q_d11: the same corpus construction + the GENERATED chunk CTEs
    // (CdcChunk.oracleCtes — Horner window hash unrolled term-for-term
    // from the same W/B/M/D); SUMs cast from HUGEINT
    "q_d11_cdc_chunk_dedup" ->
      s"""WITH docs AS (
             SELECT doc_id AS id, text FROM documents
             WHERE text IS NOT NULL
             UNION ALL
             SELECT doc_id + 100000 AS id, 'EDITED:' || text
             FROM documents WHERE text IS NOT NULL),
          ${CdcChunk.oracleCtes},
          cnt AS (SELECT chunk_md5, COUNT(DISTINCT id) AS n_docs
                  FROM chunks GROUP BY chunk_md5)
         SELECT c.id AS doc_id, COUNT(*) AS n_chunks,
            CAST(SUM(CASE WHEN cnt.n_docs >= 2 THEN 1 ELSE 0 END)
              AS BIGINT) AS shared_chunks,
            CAST(SUM(CASE WHEN cnt.n_docs >= 2 THEN c.chunk_len
              ELSE 0 END) AS BIGINT) AS shared_chars
         FROM chunks c JOIN cnt USING (chunk_md5)
         WHERE c.id < 100000
         GROUP BY c.id ORDER BY doc_id""",
    // q_d12: the two-phase chunk-novelty replay over the same generated
    // Horner chunk CTEs as q_d11 — phase 1 admits by in-phase smallest-
    // owner novelty, its admitted digests become the history phase 2
    // probes; SEEN = in history OR smaller-id phase-2 owner (the
    // conservative family rule); admit = exact integer novel*1000 >=
    // 500*total over DISTINCT digests
    "q_d12_cdc_delta" ->
      s"""WITH docs AS (SELECT doc_id AS id, text FROM documents
             WHERE text IS NOT NULL),
          ${CdcChunk.oracleCtes},
          dd AS (SELECT DISTINCT id, chunk_md5 FROM chunks),
          d1 AS (SELECT * FROM dd WHERE id < 250),
          o1 AS (SELECT chunk_md5, MIN(id) AS own FROM d1
                 GROUP BY chunk_md5),
          s1 AS (SELECT d.id, COUNT(*) AS total,
                   SUM(CASE WHEN o1.own = d.id THEN 1 ELSE 0 END) AS novel
                 FROM d1 d JOIN o1 USING (chunk_md5) GROUP BY d.id),
          a1 AS (SELECT id FROM s1 WHERE novel * 1000 >= 500 * total),
          h1 AS (SELECT DISTINCT chunk_md5 FROM d1 JOIN a1 USING (id)),
          d2 AS (SELECT * FROM dd WHERE id >= 250),
          o2 AS (SELECT chunk_md5, MIN(id) AS own FROM d2
                 GROUP BY chunk_md5),
          s2 AS (SELECT d.id, COUNT(*) AS total,
                   SUM(CASE WHEN o2.own = d.id AND h1.chunk_md5 IS NULL
                       THEN 1 ELSE 0 END) AS novel
                 FROM d2 d JOIN o2 USING (chunk_md5)
                 LEFT JOIN h1 ON d.chunk_md5 = h1.chunk_md5
                 GROUP BY d.id),
          a2 AS (SELECT id FROM s2 WHERE novel * 1000 >= 500 * total)
         SELECT id AS doc_id FROM a1
         UNION ALL SELECT id AS doc_id FROM a2
         ORDER BY doc_id""",
    // q_d10: the coverage semantics replayed exhaustively — same
    // sliding 8-grams (inclusive list slice [i+1:i+8]), winner = corpus
    // -min (doc_id, pos) encoded as doc_id*1e6+pos (equivalent to the
    // engine's struct-min while pos < 1e6 — documents are far shorter),
    // covered = union of non-winner window spans, docs rebuilt from
    // uncovered tokens in order; fully-removed docs coalesce to ''
    "q_d10_exact_substr" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS tk FROM documents),
          g AS (SELECT doc_id, i AS pos,
                  array_to_string(tk[CAST(i + 1 AS INTEGER):CAST(i + 8 AS INTEGER)], ' ') AS gram
                FROM t, unnest(range(0, len(tk) - 7)) AS u(i)),
          w AS (SELECT gram, MIN(doc_id * 1000000 + pos) AS wkey
                FROM g GROUP BY gram HAVING COUNT(*) >= 2),
          cov AS (SELECT DISTINCT g.doc_id, g.pos + o.i AS tp
                  FROM g JOIN w USING (gram), unnest(range(0, 8)) AS o(i)
                  WHERE g.doc_id * 1000000 + g.pos <> w.wkey),
          tok AS (SELECT doc_id, i AS tp, tk[CAST(i + 1 AS INTEGER)] AS tok
                  FROM t, unnest(range(0, len(tk))) AS u(i)),
          kept AS (SELECT k.doc_id, k.tp, k.tok
                   FROM tok k LEFT JOIN cov c
                     ON k.doc_id = c.doc_id AND k.tp = c.tp
                   WHERE c.doc_id IS NULL),
          r AS (SELECT doc_id, COUNT(*) AS n_kept,
                  string_agg(tok, ' ' ORDER BY tp) AS text
                FROM kept GROUP BY doc_id)
         SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
                CAST(len(t.tk) - COALESCE(r.n_kept, 0) AS BIGINT)
                  AS n_removed,
                md5(COALESCE(r.text, '')) AS dedup_md5
         FROM t LEFT JOIN r USING (doc_id) ORDER BY doc_id""",
    "q_d8_paragraph_dedup" ->
      s"""WITH d AS (SELECT doc_id, $duckToks AS toks FROM documents),
          st AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 12)) AS s1
                 FROM d WHERE len(toks) > 0),
          u AS (SELECT doc_id, CAST((s1 - 1) // 12 AS INT) AS pos,
                  array_to_string(toks[s1:s1+11], ' ') AS unit FROM st),
          k AS (SELECT doc_id, pos, unit,
                  ROW_NUMBER() OVER (PARTITION BY unit
                    ORDER BY doc_id, pos) = 1 AS keep FROM u),
          r AS (SELECT doc_id, COUNT(*) AS n_units,
                  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_kept,
                  md5(COALESCE(string_agg(CASE WHEN keep THEN unit END,
                    ' ' ORDER BY pos), '')) AS dedup_md5
                FROM k GROUP BY doc_id)
         SELECT d0.doc_id, COALESCE(n_units, 0) AS n_units,
                COALESCE(n_kept, 0) AS n_kept,
                COALESCE(dedup_md5, md5('')) AS dedup_md5
         FROM documents d0 LEFT JOIN r USING (doc_id) ORDER BY doc_id""",
    // q_v8: the generator-shared unrolled Lloyd replay over the same
    // quantize-once integers (engine folds each float to DOUBLE before
    // scaling — trap (1) of the q_v7 note)
    "q_v8_kmeans" ->
      s"""WITH q AS (SELECT vec_id, i AS dim,
            CAST(FLOOR(CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE)
                 * 1000000 + 0.5) AS BIGINT) AS v
          FROM embeddings, unnest(range(0, len(embedding))) AS u(i)
          WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
         ${KMeansLloyd.oracleCtes(k = 8, rounds = 3)}""",
    // q_v19: the same generated k-means replay nested as a CTE, then
    // q_v21: the ⌈(n+1)(1−α)⌉ ceiling rank as ((n+1)·9e5 + 999999) //
    // 1e6, the rank-th smallest by the same row_number pick, NULL
    // past n (no finite-sample guarantee), exact coverage count
    // q_v22: the qr16 rank chain over pos/neg cohorts, then the one
    // extra integral division auc = 1e6·u2 // (2·n_pos·n_neg)
    "q_v22_auc" ->
      """WITH d AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS v
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                AND lang IS NOT NULL),
          rowsx AS (SELECT 'zh_len' AS leg,
                CASE WHEN lang = 'zh' THEN 'pos' ELSE 'neg' END AS c, v
              FROM d
             UNION ALL
                    SELECT 'aa_null',
                CASE WHEN doc_id % 2 = 1 THEN 'pos' ELSE 'neg' END, v
              FROM d),
          grid AS (SELECT leg, v, CAST(COUNT(*) AS BIGINT) AS t,
                CAST(SUM(CASE WHEN c = 'pos' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ta
              FROM rowsx GROUP BY 1, 2),
          cum AS (SELECT leg, v, t, ta,
                COALESCE(SUM(t) OVER (PARTITION BY leg ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS below
              FROM grid),
          agg AS (SELECT leg, SUM(ta) AS n_a, SUM(t - ta) AS n_b,
                SUM(ta * (2 * below + t + 1)) AS r2,
                SUM(t * t * t - t) AS tie
              FROM cum GROUP BY 1),
          z AS (SELECT leg, n_a, n_b,
                CAST(r2 AS HUGEINT)
                  - CAST(n_a AS HUGEINT) * (n_a + 1) AS u2,
                CAST(r2 AS HUGEINT) - CAST(n_a AS HUGEINT) * (n_a + 1)
                  - CAST(n_a AS HUGEINT) * n_b AS delta,
                CAST(n_a + n_b AS HUGEINT) AS nn,
                CAST(tie AS HUGEINT) AS tie
              FROM agg),
          zz AS (SELECT *,
                CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                     WHEN nn * nn * nn - nn - tie = 0 THEN 0
                     ELSE 3 * delta * delta * nn * (nn - 1) * 1000000
                       // (CAST(n_a AS HUGEINT) * n_b
                          * (nn * nn * nn - nn - tie))
                END AS z2
              FROM z)
         SELECT leg, CAST(n_a AS BIGINT) AS n_pos,
                CAST(n_b AS BIGINT) AS n_neg,
                CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                     ELSE (1000000 * u2)
                       // (2 * CAST(n_a AS HUGEINT) * n_b)
                END AS BIGINT) AS auc_e6,
                CAST(z2 AS BIGINT) AS z2_e6,
                CAST(CASE WHEN z2 >= 3841459 THEN 1 ELSE 0 END
                  AS BIGINT) AS sig
         FROM zz ORDER BY leg""",
    "q_v21_conformal_bound" ->
      """WITH d AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS s
              FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
                AND lang IS NOT NULL),
          cal AS (SELECT lang, s FROM d WHERE doc_id % 2 = 0),
          tst AS (SELECT lang, s FROM d WHERE doc_id % 2 = 1),
          cnt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_cal,
                ((CAST(COUNT(*) AS BIGINT) + 1) * 900000 + 999999)
                  // 1000000 AS rnk
              FROM cal GROUP BY lang),
          rk AS (SELECT lang, s,
                CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY s)
                  AS BIGINT) AS rn
              FROM cal),
          thr AS (SELECT c.lang, c.n_cal, c.rnk AS rank, rk.s AS qhat
                FROM cnt c LEFT JOIN rk
                  ON rk.lang = c.lang AND rk.rn = c.rnk)
         SELECT t.lang, t.n_cal, t.rank, t.qhat,
                CAST(COUNT(*) AS BIGINT) AS n_test,
                CASE WHEN t.qhat IS NULL THEN NULL
                  ELSE CAST(SUM(CASE WHEN x.s <= t.qhat THEN 1 ELSE 0
                    END) AS BIGINT) END AS n_covered,
                CASE WHEN t.qhat IS NULL THEN NULL
                  ELSE CAST(CAST(1000000 AS BIGINT)
                    * SUM(CASE WHEN x.s <= t.qhat THEN 1 ELSE 0 END)
                    // COUNT(*) AS BIGINT) END AS cov_e6
         FROM thr t JOIN tst x ON x.lang = t.lang
         GROUP BY t.lang, t.n_cal, t.rank, t.qhat
         ORDER BY t.lang""",
    // q_v20: global exact-tercile cuts by the div(p·(n−1), 1e6) rank
    // pick on both signals, CASE-threshold labels, confusion counts,
    // then κ = 10⁶·(N·D − C) // (N² − C) as one BIGINT rational —
    // the N² = C undefined guard replayed for parity; every literal
    // product CAST early (the INT32 trap)
    "q_v20_rater_kappa" ->
      """WITH d AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS nc,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
              FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL
                AND n_chars IS NOT NULL),
          nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
          rc AS (SELECT nc AS v,
                   ROW_NUMBER() OVER (ORDER BY nc) - 1 AS rn FROM d),
          rt AS (SELECT nt AS v,
                   ROW_NUMBER() OVER (ORDER BY nt) - 1 AS rn FROM d),
          cuts AS (SELECT
            (SELECT v FROM rc, nn
              WHERE rn = (CAST(333333 AS BIGINT) * (n - 1)) // 1000000)
              AS cc1,
            (SELECT v FROM rc, nn
              WHERE rn = (CAST(666667 AS BIGINT) * (n - 1)) // 1000000)
              AS cc2,
            (SELECT v FROM rt, nn
              WHERE rn = (CAST(333333 AS BIGINT) * (n - 1)) // 1000000)
              AS tc1,
            (SELECT v FROM rt, nn
              WHERE rn = (CAST(666667 AS BIGINT) * (n - 1)) // 1000000)
              AS tc2),
          lab AS (SELECT lang,
              CASE WHEN nc > cuts.cc2 THEN 't2'
                   WHEN nc > cuts.cc1 THEN 't1' ELSE 't0' END AS ra,
              CASE WHEN nt > cuts.tc2 THEN 't2'
                   WHEN nt > cuts.tc1 THEN 't1' ELSE 't0' END AS rb,
              't' || CAST(doc_id % 3 AS VARCHAR) AS rr
            FROM d, cuts WHERE lang IS NOT NULL),
          conf AS (SELECT 'len_vs_tok' AS pair, lang, ra AS a, rb AS b,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM lab GROUP BY 2, 3, 4
            UNION ALL
              SELECT 'random_vs_len', lang, rr, ra,
                CAST(COUNT(*) AS BIGINT)
              FROM lab GROUP BY 2, 3, 4),
          tot AS (SELECT pair, lang, SUM(n) AS nit,
                SUM(CASE WHEN a = b THEN n ELSE 0 END) AS dg
              FROM conf GROUP BY 1, 2),
          ma AS (SELECT pair, lang, a AS l, SUM(n) AS rm
                 FROM conf GROUP BY 1, 2, 3),
          mb AS (SELECT pair, lang, b AS l, SUM(n) AS cm
                 FROM conf GROUP BY 1, 2, 3),
          ch AS (SELECT ma.pair, ma.lang, SUM(ma.rm * mb.cm) AS c
                 FROM ma JOIN mb ON mb.pair = ma.pair
                   AND mb.lang = ma.lang AND mb.l = ma.l
                 GROUP BY 1, 2)
         SELECT t.pair, t.lang, CAST(t.nit AS BIGINT) AS n_items,
                CAST(t.dg AS BIGINT) AS n_agree,
                CAST(CAST(1000000 AS BIGINT) * t.dg // t.nit AS BIGINT)
                  AS po_e6,
                CAST(CAST(1000000 AS BIGINT) * COALESCE(ch.c, 0)
                  // (t.nit * t.nit) AS BIGINT) AS pe_e6,
                CAST(CASE WHEN t.nit * t.nit = COALESCE(ch.c, 0)
                     THEN NULL
                     ELSE CAST(1000000 AS BIGINT)
                       * (t.nit * t.dg - COALESCE(ch.c, 0))
                       // (t.nit * t.nit - COALESCE(ch.c, 0))
                END AS BIGINT) AS kappa_e6
         FROM tot t LEFT JOIN ch ON ch.pair = t.pair AND ch.lang = t.lang
         ORDER BY t.pair, t.lang""",
    // per-cluster exact p95 by the identical div(p·(n−1), 1e6) rank
    // pick and the value-based outlier count
    "q_v19_embedding_outliers" ->
      s"""WITH q AS (SELECT vec_id, i AS dim,
            CAST(FLOOR(CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE)
                 * 1000000 + 0.5) AS BIGINT) AS v
          FROM embeddings, unnest(range(0, len(embedding))) AS u(i)
          WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
         asg AS (WITH ${KMeansLloyd.oracleCtes(k = 8, rounds = 3)}),
         cnt AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vectors
                 FROM asg GROUP BY cluster),
         rk AS (SELECT cluster, dist_q,
                  ROW_NUMBER() OVER (PARTITION BY cluster
                    ORDER BY dist_q) - 1 AS rn
                FROM asg),
         thr AS (SELECT r.cluster,
                   MAX(CASE WHEN r.rn =
                     (950000 * (c.n_vectors - 1)) // 1000000
                     THEN r.dist_q END) AS p95_dist_q
                 FROM rk r JOIN cnt c USING (cluster)
                 GROUP BY r.cluster)
        SELECT a.cluster, c.n_vectors, t.p95_dist_q,
               CAST(COUNT(*) FILTER (WHERE a.dist_q > t.p95_dist_q)
                 AS BIGINT) AS n_outliers
        FROM asg a JOIN thr t USING (cluster) JOIN cnt c USING (cluster)
        GROUP BY a.cluster, c.n_vectors, t.p95_dist_q
        ORDER BY cluster""",
    // q_v7: same quantize-once integers; DuckDB lists are 1-indexed so
    // the 0-based dim reads embedding[i + 1]. Two portability traps both
    // caught by the gate: (1) DuckDB promotes FLOAT * INTEGER to FLOAT,
    // so the quantizing product must CAST to DOUBLE first (127 of 640
    // cells off by one ulp otherwise — the header's fold-in-DOUBLE rule
    // applied to a scalar product); (2) DuckDB's `//` TRUNCATES toward
    // zero on integers (-3 // 2 = -1), so the floor is built the same
    // way the engine builds it: subtract the POSITIVE remainder, then
    // divide the exact multiple (sums go negative here — the one
    // battery spot where the `//`-floors assumption would bite)
    "q_v7_class_centroids" ->
      """WITH x AS (SELECT label, i AS dim,
               CAST(FLOOR(CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE)
                    * 1000000 + 0.5) AS BIGINT) AS q
             FROM embeddings, unnest(range(0, len(embedding))) AS t(i)),
          g AS (SELECT label, dim, COUNT(*) AS n,
                  CAST(SUM(q) AS BIGINT) AS s
                FROM x GROUP BY label, dim)
         SELECT label, CAST(dim AS INTEGER) AS dim, n,
                (s - ((s % n + n) % n)) // n AS mean_e6
         FROM g ORDER BY label, dim""",
    // q_v17: the page replay (q_v1's rank CTE at k=20), pairwise
    // cosines in the same rounded-then-floored quantization, then the
    // unrolled greedy rounds GENERATED from the same (k=5, λ=7/10)
    "q_v17_mmr" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                     FROM embeddings WHERE vec_id < 5),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv
                FROM embeddings WHERE vec_id >= 5),
          s AS (SELECT query_id, neighbor_id,
                  ROUND(CASE WHEN sqrt(${duckNormSq("qv")}) = 0
                               OR sqrt(${duckNormSq("cv")}) = 0 THEN 0.0
                        ELSE $duckDot / (sqrt(${duckNormSq("qv")})
                                         * sqrt(${duckNormSq("cv")})) END,
                        6) AS sim
                FROM c CROSS JOIN q),
          top AS MATERIALIZED (
                SELECT query_id, neighbor_id, sim
                FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS rank FROM s)
                WHERE rank <= 20),
          cand AS MATERIALIZED (
                SELECT query_id, neighbor_id,
                       CAST(floor(sim * 1000000 + 0.5) AS BIGINT)
                         AS rel_e6
                FROM top),
          pr AS (SELECT a.query_id, a.neighbor_id AS ia,
                        b.neighbor_id AS ib
                 FROM top a JOIN top b
                   ON a.query_id = b.query_id
                  AND a.neighbor_id < b.neighbor_id),
          pv AS (SELECT pr.query_id, pr.ia, pr.ib,
                        ea.embedding AS av, eb.embedding AS bv
                 FROM pr JOIN embeddings ea ON ea.vec_id = pr.ia
                      JOIN embeddings eb ON eb.vec_id = pr.ib),
          ps AS (SELECT query_id, ia, ib,
                   CAST(floor(ROUND(CASE
                     WHEN sqrt(${duckNormSq("av")}) = 0
                       OR sqrt(${duckNormSq("bv")}) = 0 THEN 0.0
                     ELSE list_sum(list_transform(range(1, len(av) + 1),
                            i -> CAST(av[i] AS DOUBLE)
                                 * CAST(bv[i] AS DOUBLE)))
                          / (sqrt(${duckNormSq("av")})
                             * sqrt(${duckNormSq("bv")})) END, 6)
                     * 1000000 + 0.5) AS BIGINT) AS sim_e6
                 FROM pv),
          ss AS MATERIALIZED (
                SELECT query_id, ia, ib, sim_e6 FROM ps
                UNION ALL
                SELECT query_id, ib AS ia, ia AS ib, sim_e6 FROM ps),
          ${Mmr.oracleCtes(k = 5, lamE1 = 7)}""",
    // q_v16: the oracle RECOMPUTES the sign matrix from the seed —
    // md5('jl42-<d>') hex digit j, odd → −1 (nothing rides as
    // literals); list_sum is the same left fold as the codegen loops
    "q_v16_jl_distortion" ->
      """WITH e AS (SELECT vec_id AS id, embedding AS v
              FROM embeddings
              WHERE vec_id < 100 AND vec_id IS NOT NULL
                AND embedding IS NOT NULL),
          p AS MATERIALIZED (SELECT id, v,
                 list_transform(range(1, 17), j ->
                   list_sum(list_transform(range(1, 65), i ->
                     CAST(v[CAST(i AS INTEGER)] AS DOUBLE) *
                     (CASE WHEN strpos('13579bdf',
                        substr(md5('jl42-' || CAST(i - 1 AS VARCHAR)),
                               CAST(j AS INTEGER), 1)) > 0
                      THEN -1.0 ELSE 1.0 END)))) AS pv
               FROM e),
          d AS (SELECT a.id AS id_a, b.id AS id_b,
                  list_sum(list_transform(range(1, 65), i ->
                    (CAST(a.v[CAST(i AS INTEGER)] AS DOUBLE)
                     - CAST(b.v[CAST(i AS INTEGER)] AS DOUBLE))
                    * (CAST(a.v[CAST(i AS INTEGER)] AS DOUBLE)
                       - CAST(b.v[CAST(i AS INTEGER)] AS DOUBLE))))
                    AS fullsq,
                  list_sum(list_transform(range(1, 17), i ->
                    (a.pv[CAST(i AS INTEGER)] - b.pv[CAST(i AS INTEGER)])
                    * (a.pv[CAST(i AS INTEGER)]
                       - b.pv[CAST(i AS INTEGER)]))) AS projsq
                FROM p a JOIN p b ON a.id < b.id)
         SELECT id_a, id_b,
                ROUND(fullsq, 6) AS dist_full6,
                ROUND(projsq, 6) AS dist_proj6,
                CASE WHEN fullsq = 0 THEN NULL
                     ELSE CAST(floor((projsq / 16.0) / fullsq * 1000000.0
                                     + 0.5) AS BIGINT)
                END AS ratio_e6
         FROM d ORDER BY id_a, id_b""",
    "q_v1_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                     FROM embeddings WHERE vec_id < 5),
               c AS (SELECT vec_id AS neighbor_id, embedding AS cv
                     FROM embeddings WHERE vec_id >= 5),
               s AS (SELECT query_id, neighbor_id,
                       ROUND(CASE WHEN sqrt(${duckNormSq("qv")}) = 0
                                    OR sqrt(${duckNormSq("cv")}) = 0 THEN 0.0
                             ELSE $duckDot / (sqrt(${duckNormSq("qv")})
                                              * sqrt(${duckNormSq("cv")})) END,
                             6) AS sim
                     FROM c CROSS JOIN q)
          SELECT query_id, neighbor_id, sim,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
          FROM s QUALIFY rank <= 3 ORDER BY query_id, rank""",
    // q_v2/q_v4/q_v6 (r8): the oracle recomputes the EXACT top-3 per
    // query independently (same cross-join + rank as q_v1), reports each
    // query's 3rd-best similarity, and declares the recall floor met —
    // the engine side computes |ANN ∩ exact| for real, so any recall
    // regression flips recall_ok and fails this compare.
    "q_v2_ann_lsh" -> annRecallOracle,
    "q_v4_ann_ivf" -> annRecallOracle,
    "q_v6_ann_ivf_quantized" -> annRecallOracle,
    "q_v9_ann_ivfpq" -> annRecallOracle,
    "q_v12_ann_mips" -> mipsRecallOracle,
    // q_v10: generated per-block Lloyd replay of the PQ codebook fit —
    // same (m, sub, ksub, rounds) as the engine call, so the training
    // recurrence and its oracle cannot drift (VERDICT r9 #3)
    "q_v10_pq_codes" ->
      IvfPq.pqOracleSql(m = 8, sub = 8, ksub = 8, rounds = 2),
    // q_v11: the two-stage residual fit — coarse replay chains into the
    // per-block residual recurrences, all from the engine's parameters
    "q_v11_pq_residual_codes" ->
      IvfPq.residualOracleSql(nlist = 8, coarseRounds = 2, m = 8,
        sub = 8, ksub = 8, rounds = 2),
    // q_v15: GENERATED per truncation dim — each block slices qv/cv to
    // the prefix, replays the identical rounded-cosine rank-(sim DESC,
    // id) top-5, semi-joins the full ranking and LEFT-joins the query
    // list so zero overlap reports as 0
    "q_v15_matryoshka_audit" -> {
      val full =
        s"""fs AS MATERIALIZED (SELECT query_id, neighbor_id,
                  ROUND(CASE WHEN sqrt(${duckNormSq("qv")}) = 0
                               OR sqrt(${duckNormSq("cv")}) = 0 THEN 0.0
                        ELSE $duckDot / (sqrt(${duckNormSq("qv")})
                                         * sqrt(${duckNormSq("cv")})) END,
                        6) AS sim
                FROM c CROSS JOIN q),
          fr AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rn
                FROM fs) WHERE rn <= 5)"""
      val blocks = Seq(8, 16, 32).map { d =>
        s"""t${d}s AS MATERIALIZED (SELECT query_id, neighbor_id,
                  ROUND(CASE WHEN sqrt(${duckNormSq(s"qv[1:$d]")}) = 0
                               OR sqrt(${duckNormSq(s"cv[1:$d]")}) = 0
                        THEN 0.0
                        ELSE list_sum(list_transform(range(1, $d + 1),
                               i -> CAST(qv[i] AS DOUBLE)
                                    * CAST(cv[i] AS DOUBLE)))
                             / (sqrt(${duckNormSq(s"qv[1:$d]")})
                                * sqrt(${duckNormSq(s"cv[1:$d]")})) END,
                        6) AS sim
                FROM c CROSS JOIN q),
          t${d}r AS (SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rn
                FROM t${d}s) WHERE rn <= 5),
          t${d}o AS (SELECT r.query_id, COUNT(*) AS n_overlap
                FROM t${d}r r JOIN fr USING (query_id, neighbor_id)
                GROUP BY r.query_id),
          t${d}f AS (SELECT CAST($d AS INTEGER) AS trunc_dim,
                  q2.query_id,
                  CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap
                FROM (SELECT DISTINCT query_id FROM q) q2
                LEFT JOIN t${d}o o USING (query_id))"""
      }.mkString(",\n")
      val union = Seq(8, 16, 32).map(d => s"SELECT * FROM t${d}f")
        .mkString("\nUNION ALL ")
      s"""WITH q AS MATERIALIZED (SELECT vec_id AS query_id,
                  embedding AS qv
                FROM embeddings WHERE vec_id < 20),
          c AS MATERIALIZED (SELECT vec_id AS neighbor_id, embedding AS cv
                FROM embeddings WHERE vec_id >= 20),
          $full,
          $blocks
         SELECT trunc_dim, query_id, n_overlap FROM ($union)
         ORDER BY trunc_dim, query_id"""
    },
    // q_e22: generated from the engine's exact (eta, c, rounds,
    // budget) — per-source loss off the shared add-one ppl macro, the
    // one exp quantized in the identical expression, unrolled Hamilton
    // rounds in HUGEINT
    "q_e22_doremi_weights" -> Doremi.oracleSql(duckLmPerplexity,
      "d.source", etaE6 = 3000000L, smoothingE6 = 200000L, rounds = 4,
      budget = 1000000L),
    // q_d14: same quote construction (every 25th doc, id+100000), then
    // the exhaustive DIRECTED eval×corpus containment scan — bounded
    // probe side makes this |eval|×|corpus|, affordable at every SF;
    // identical integer decision compare, 6-dp rounded report
    "q_d14_eval_decontaminate" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          ev AS (SELECT doc_id + 100000 AS doc_id,
                   array_to_string(($duckToks)[1:15], ' ') AS text
                 FROM base WHERE doc_id % 25 = 0),
          shp AS (SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, greatest(len($duckToks) - 2, 0) + 1),
                     i -> array_to_string(($duckToks)[i:i+2], ' '))) AS sh
                 FROM ev),
          shi AS (SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, greatest(len($duckToks) - 2, 0) + 1),
                     i -> array_to_string(($duckToks)[i:i+2], ' '))) AS sh
                 FROM base),
          scored AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.sh, b.sh)) AS inter,
                   len(a.sh) AS na
                 FROM shp a CROSS JOIN shi b
                 WHERE len(a.sh) > 0)
         SELECT id_a, id_b,
                round(inter * 1.0 / na, 6) AS containment
         FROM scored
         WHERE inter * 1000000 >= 800000 * na
         ORDER BY id_a, id_b""",
    // q_v18: forward AND backward top-4 replayed exhaustively — same
    // rounded cosine (q_v1 contract) re-quantized once to integer e6,
    // exact BIGINT neighborhood sums, the single truncating division in
    // the identical 2·c6·kx·ky·10⁶ / (sx·ky + sy·kx) form, argmax per
    // query by (margin DESC, tgt ASC), the 1.04 gate. Backward stats
    // computed only for forward candidates, exactly like the engine.
    "q_v18_bitext_margin" ->
      s"""WITH srcq AS MATERIALIZED (SELECT vec_id AS src_id,
                  embedding AS qv
                FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 200),
          srcall AS MATERIALIZED (SELECT vec_id AS src_id,
                  embedding AS cv
                FROM embeddings WHERE vec_id % 2 = 0),
          tgt AS MATERIALIZED (SELECT vec_id AS tgt_id, embedding AS cv
                FROM embeddings WHERE vec_id % 2 = 1),
          fs AS (SELECT src_id, tgt_id,
                   ROUND(CASE WHEN sqrt(${duckNormSq("qv")}) = 0
                                OR sqrt(${duckNormSq("cv")}) = 0 THEN 0.0
                         ELSE $duckDot / (sqrt(${duckNormSq("qv")})
                                          * sqrt(${duckNormSq("cv")})) END,
                         6) AS sim
                 FROM srcq CROSS JOIN tgt),
          fwd AS (SELECT src_id, tgt_id,
                    CAST(ROUND(sim * 1000000, 0) AS BIGINT) AS c6
                  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
                          ORDER BY sim DESC, tgt_id) AS rk FROM fs)
                  WHERE rk <= 4),
          sstat AS (SELECT src_id, CAST(SUM(c6) AS BIGINT) AS sum_src,
                      CAST(COUNT(*) AS BIGINT) AS k_src
                    FROM fwd GROUP BY src_id),
          cand AS (SELECT DISTINCT tgt_id FROM fwd),
          bs AS (SELECT t.tgt_id, s.src_id,
                   ROUND(CASE WHEN sqrt(${duckNormSq("t.cv")}) = 0
                                OR sqrt(${duckNormSq("s.cv")}) = 0 THEN 0.0
                         ELSE list_sum(list_transform(
                                range(1, len(t.cv) + 1),
                                i -> CAST(t.cv[i] AS DOUBLE)
                                     * CAST(s.cv[i] AS DOUBLE)))
                              / (sqrt(${duckNormSq("t.cv")})
                                 * sqrt(${duckNormSq("s.cv")})) END,
                         6) AS sim
                 FROM (SELECT tgt.* FROM tgt
                       JOIN cand USING (tgt_id)) t CROSS JOIN srcall s),
          bwd AS (SELECT tgt_id,
                    CAST(ROUND(sim * 1000000, 0) AS BIGINT) AS c6
                  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY tgt_id
                          ORDER BY sim DESC, src_id) AS rk FROM bs)
                  WHERE rk <= 4),
          tstat AS (SELECT tgt_id, CAST(SUM(c6) AS BIGINT) AS sum_tgt,
                      CAST(COUNT(*) AS BIGINT) AS k_tgt
                    FROM bwd GROUP BY tgt_id),
          scored AS (SELECT f.src_id, f.tgt_id, f.c6 AS cos_e6,
                   2 * f.c6 * ss.k_src * ts.k_tgt * 1000000
                     // (ss.sum_src * ts.k_tgt + ts.sum_tgt * ss.k_src)
                     AS margin_e6
                 FROM fwd f
                 JOIN sstat ss USING (src_id)
                 JOIN tstat ts USING (tgt_id)
                 WHERE ss.sum_src * ts.k_tgt + ts.sum_tgt * ss.k_src > 0),
          best AS (SELECT src_id, tgt_id, cos_e6,
                     CAST(margin_e6 AS BIGINT) AS margin_e6
                   FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
                           ORDER BY margin_e6 DESC, tgt_id) AS rk
                         FROM scored)
                   WHERE rk = 1)
         SELECT src_id, tgt_id, cos_e6, margin_e6 FROM best
         WHERE margin_e6 >= 1040000
         ORDER BY src_id""",
    // q_v14: exhaustive replay — same rounded exact cosine, the two
    // threshold sides ranked (sim DESC, neighbor ASC) and rank-1 picked,
    // inner join so anchors missing either leg drop
    "q_v14_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                     FROM embeddings WHERE vec_id < 50),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv
                FROM embeddings),
          s AS (SELECT query_id, neighbor_id,
                  ROUND(CASE WHEN sqrt(${duckNormSq("qv")}) = 0
                               OR sqrt(${duckNormSq("cv")}) = 0 THEN 0.0
                        ELSE $duckDot / (sqrt(${duckNormSq("qv")})
                                         * sqrt(${duckNormSq("cv")})) END,
                        6) AS sim
                FROM c CROSS JOIN q WHERE query_id <> neighbor_id),
          p AS (SELECT query_id, neighbor_id AS pos_id, sim AS pos_sim,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rn
                FROM s WHERE sim >= 0.45),
          n AS (SELECT query_id, neighbor_id AS neg_id, sim AS neg_sim,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rn
                FROM s WHERE sim < 0.45)
         SELECT p.query_id, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim
         FROM p JOIN n USING (query_id)
         WHERE p.rn = 1 AND n.rn = 1 ORDER BY query_id""",
    // q_v13: the full PCA replay GENERATED from the same rounds — exact
    // quantize/moment/scatter arithmetic, the identical 1e6 rescale and
    // per-round max-normalized matvec (every float op a pinned double
    // inside a half-up floor), then the integer projection
    "q_v13_pca_pc1" ->
      s"""WITH ${Pca.oracleCtes(rounds = 8)}
          SELECT vec_id, proj FROM proj ORDER BY vec_id""",
    "q_v3_norm_stats" ->
      s"""SELECT label,
            ROUND(AVG(sqrt(${duckNormSq("embedding")})), 4) AS avg_norm,
            COUNT(*) AS n
          FROM embeddings GROUP BY label ORDER BY label""",
    // q_m5: doubled corpus → every fingerprint has ≥2 copies; the
    // corpus also carries real duplicate texts, so n_copies > 2 exists
    "q_m5_blob_dedup" ->
      """SELECT md5(text) AS blob_md5, MIN(doc_id) AS keeper,
                COUNT(*) AS n_copies,
                CAST(MAX(octet_length(encode(text))) AS BIGINT) AS n_bytes
         FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
         GROUP BY md5(text) ORDER BY keeper""",
    // q_m8: the same blob construction (unhex || encode) and every
    // prefix rule replayed over the hex rendering — DuckDB hexes the
    // whole (small, synthetic) blob where Spark hexes only the
    // 12-byte binary prefix; the compared prefixes are identical
    "q_m8_magic_sniff" ->
      """WITH d AS (SELECT doc_id, text, doc_id % 8 AS v
              FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          b AS (SELECT doc_id,
                CASE v
                  WHEN 0 THEN unhex('89504E470D0A1A0A') || encode(text)
                  WHEN 1 THEN unhex('FFD8FFE000104A46') || encode(text)
                  WHEN 2 THEN unhex('474946383961') || encode(text)
                  WHEN 3 THEN unhex('524946460000000057415645')
                    || encode(text)
                  WHEN 4 THEN unhex('424D760200') || encode(text)
                  WHEN 5 THEN unhex('255044462D312E34') || encode(text)
                  WHEN 6 THEN unhex('504B03041400') || encode(text)
                  ELSE encode(text)
                END AS blob,
                CASE WHEN doc_id % 5 = 0 THEN 'image/png' ELSE
                  CASE v WHEN 0 THEN 'image/png'
                    WHEN 1 THEN 'image/jpeg' WHEN 2 THEN 'image/gif'
                    WHEN 3 THEN 'audio/wav' WHEN 4 THEN 'image/bmp'
                    WHEN 5 THEN 'application/pdf'
                    WHEN 6 THEN 'application/zip'
                    ELSE 'application/octet-stream' END
                END AS declared
              FROM d),
          s AS (SELECT declared,
                CASE WHEN blob IS NULL OR octet_length(blob) = 0
                       THEN NULL
                  WHEN substring(hex(blob), 1, 16)
                    = '89504E470D0A1A0A' THEN 'image/png'
                  WHEN substring(hex(blob), 1, 6) = 'FFD8FF'
                    THEN 'image/jpeg'
                  WHEN substring(hex(blob), 1, 12)
                    IN ('474946383761', '474946383961') THEN 'image/gif'
                  WHEN substring(hex(blob), 1, 8) = '52494646'
                    AND substring(hex(blob), 17, 8) = '57415645'
                    THEN 'audio/wav'
                  WHEN substring(hex(blob), 9, 8) = '66747970'
                    THEN 'video/mp4'
                  WHEN substring(hex(blob), 1, 4) = '424D'
                    THEN 'image/bmp'
                  WHEN substring(hex(blob), 1, 8) = '25504446'
                    THEN 'application/pdf'
                  WHEN substring(hex(blob), 1, 8) = '504B0304'
                    THEN 'application/zip'
                  WHEN substring(hex(blob), 1, 4) = '1F8B'
                    THEN 'application/gzip'
                  ELSE 'application/octet-stream' END AS sniffed
              FROM b)
         SELECT declared, sniffed, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(CASE WHEN declared <> sniffed THEN 1 ELSE 0 END
                  AS BIGINT) AS mismatch
         FROM s WHERE sniffed IS NOT NULL
         GROUP BY declared, sniffed ORDER BY declared, sniffed""",
    // q_m12: generator-formula replay — the SOF walk must invert the
    // variable-offset construction; the SOS-first decoy leg is NULL
    "q_m12_jpeg_dims" ->
      """WITH d AS (SELECT doc_id FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          x AS (SELECT doc_id,
                CASE WHEN doc_id % 9 = 0 THEN 0 ELSE 1 END AS parsed,
                16 + (doc_id % 101) * 7 AS w,
                16 + ((doc_id // 101) % 53) * 12 AS h
              FROM d),
          y AS (SELECT parsed,
                CASE WHEN parsed = 1 THEN w END AS w,
                CASE WHEN parsed = 1 THEN h END AS h
              FROM x)
         SELECT CAST(parsed AS BIGINT) AS parsed,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(w) AS BIGINT) AS sum_w,
                CAST(SUM(h) AS BIGINT) AS sum_h,
                CAST(COUNT(CASE WHEN w < 512 OR h < 512 THEN 1 END)
                  AS BIGINT) AS n_small
         FROM y GROUP BY parsed ORDER BY parsed""",
    // q_m11: generator-formula replay (the q_m9 inversion gate) —
    // Spark parses dims back out of the bytes; the oracle recomputes
    // them from doc_id arithmetic, so endianness, offsets and the
    // signed top-down read must all invert the construction
    "q_m11_dims_audit" ->
      """WITH d AS (SELECT doc_id FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          x AS (SELECT doc_id,
                CASE WHEN doc_id % 11 = 0 THEN 'other'
                     WHEN doc_id % 3 = 0 THEN 'png'
                     WHEN doc_id % 3 = 1 THEN 'gif'
                     ELSE 'bmp' END AS fmt,
                16 + (doc_id % 97) * 13 AS w,
                16 + ((doc_id // 97) % 89) * 11 AS h,
                CASE WHEN doc_id % 3 = 2 AND (doc_id // 3) % 4 = 0
                     THEN 1 ELSE 0 END AS td
              FROM d),
          y AS (SELECT fmt,
                CASE WHEN fmt = 'other' THEN NULL ELSE w END AS w,
                CASE WHEN fmt = 'other' THEN NULL ELSE h END AS h,
                CASE WHEN fmt = 'other' THEN NULL ELSE td END AS td
              FROM x)
         SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(w) AS BIGINT) AS sum_w,
                CAST(SUM(h) AS BIGINT) AS sum_h,
                CAST(COUNT(CASE WHEN w < 512 OR h < 512 THEN 1 END)
                  AS BIGINT) AS n_small,
                CAST(SUM(td) AS BIGINT) AS n_topdown
         FROM y GROUP BY fmt ORDER BY fmt""",
    // q_m10: formula replay — Spark must ROUTE (sniff), WALK (parse)
    // and JOIN to surface exactly the injected codec mislabels; the
    // oracle recomputes route membership and both codec columns
    // arithmetically
    "q_m10_codec_audit" ->
      """WITH d AS (SELECT doc_id FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL
                AND doc_id % 11 <> 0),
          c AS (SELECT doc_id,
                CASE (doc_id // 3) % 3 WHEN 0 THEN 'avc1'
                  WHEN 1 THEN 'mp4a' ELSE 'hev1' END AS actual
              FROM d),
          m AS (SELECT CASE WHEN doc_id % 7 = 0 THEN 'avc1'
                  ELSE actual END AS declared, actual
              FROM c)
         SELECT declared, actual, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(CASE WHEN declared <> actual THEN 1 ELSE 0 END
                  AS BIGINT) AS mismatch
         FROM m GROUP BY declared, actual ORDER BY declared, actual""",
    // q_m16: formula replay on the Ogg surface — codec/channels/rate
    // per doc_id, the Opus-vs-Vorbis granule-clock split (48 kHz net
    // of pre-skip vs stream rate), the 13th-doc truncation as the
    // all-NULL violation group; '//' = the engine's LONG truncation
    "q_m16_ogg_metadata" ->
      """WITH d AS (SELECT doc_id FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL
                AND doc_id % 11 <> 0),
          p AS (SELECT doc_id,
                CASE WHEN doc_id % 13 = 0 THEN NULL
                     WHEN doc_id % 2 = 0 THEN 'opus'
                     ELSE 'vorbis' END AS codec,
                CASE WHEN doc_id % 13 = 0 THEN NULL
                  ELSE 1 + (doc_id // 2) % 2 END AS channels,
                CASE WHEN doc_id % 13 = 0 THEN NULL
                  ELSE ([8000,16000,44100,48000])
                    [CAST((doc_id // 4) % 4 AS INT) + 1] END AS rate,
                312 + ((doc_id // 16) % 5) * 24 AS preskip,
                19200 * (1 + (doc_id // 80) % 7) AS g
              FROM d),
          m AS (SELECT codec, CAST(channels AS BIGINT) AS channels,
                CAST(rate AS BIGINT) AS sample_rate,
                CASE WHEN codec IS NULL THEN NULL
                     WHEN codec = 'opus'
                       THEN ((g - preskip) * 1000) // 48000
                     ELSE (g * 1000) // rate END AS dur_ms,
                CASE WHEN codec IS NULL THEN NULL ELSE 2 END
                  AS n_pages
              FROM p)
         SELECT codec, channels, sample_rate,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(dur_ms) AS BIGINT) AS sum_dur_ms,
                CAST(SUM(n_pages) AS BIGINT) AS sum_pages
         FROM m GROUP BY 1, 2, 3
         ORDER BY codec NULLS FIRST, channels NULLS FIRST,
                sample_rate NULLS FIRST""",
    // q_m15: the generator-formula replay on the EBML surface — the
    // oracle recomputes doc type/timescale/duration/tracks/codecs
    // arithmetically from doc_id; the 13th-doc truncation leg lands
    // as the all-NULL metadata group (Spark's violation contract);
    // duration_ms via integer '//' — equal to the engine's double
    // truncation because every timescale is a quarter of a µs
    "q_m15_webm_metadata" ->
      """WITH d AS (SELECT doc_id FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL
                AND doc_id % 11 <> 0),
          p AS (SELECT doc_id,
                CASE WHEN doc_id % 13 = 0 THEN NULL
                     WHEN doc_id % 2 = 0 THEN 'webm'
                     ELSE 'matroska' END AS doc_type,
                CASE WHEN doc_id % 13 = 0 THEN NULL
                  ELSE 500000 + (doc_id % 4) * 250000 END AS timescale,
                CASE WHEN doc_id % 13 = 0 THEN NULL
                  ELSE 2000 + (doc_id % 7) * 555 END AS dur,
                CASE WHEN doc_id % 13 = 0 THEN NULL
                  ELSE 1 + doc_id % 3 END AS n_tracks
              FROM d),
          c AS (SELECT *,
                CASE ((doc_id // 3) + 0) % 3 WHEN 0 THEN 'V_VP9'
                  WHEN 1 THEN 'A_OPUS' ELSE 'V_AV1' END AS c0,
                CASE ((doc_id // 3) + 1) % 3 WHEN 0 THEN 'V_VP9'
                  WHEN 1 THEN 'A_OPUS' ELSE 'V_AV1' END AS c1,
                CASE ((doc_id // 3) + 2) % 3 WHEN 0 THEN 'V_VP9'
                  WHEN 1 THEN 'A_OPUS' ELSE 'V_AV1' END AS c2
              FROM p),
          m AS (SELECT doc_type, CAST(n_tracks AS BIGINT) AS n_tracks,
                timescale,
                CASE WHEN n_tracks IS NULL THEN NULL
                     WHEN n_tracks = 1 THEN c0
                     WHEN n_tracks = 2 THEN concat(c0, ',', c1)
                     ELSE concat(c0, ',', c1, ',', c2) END AS codecs,
                CASE WHEN dur IS NULL THEN NULL
                  ELSE (CAST(dur AS HUGEINT) * timescale) // 1000000
                  END AS dur_ms
              FROM c)
         SELECT doc_type, n_tracks, codecs,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(dur_ms) AS BIGINT) AS sum_dur_ms,
                CAST(SUM(timescale) AS BIGINT) AS sum_ts
         FROM m GROUP BY 1, 2, 3
         ORDER BY doc_type NULLS FIRST, n_tracks NULLS FIRST,
                codecs NULLS FIRST""",
    // q_m9: the generator-formula replay — Spark PARSES the synthetic
    // MP4 bytes back to (brand, timescale, duration, n_tracks, codecs);
    // the oracle recomputes the same values arithmetically from doc_id,
    // so the box walk must invert the construction exactly. duration_ms
    // is 1000*duration//timescale — both engines truncate toward zero.
    "q_m9_mp4_metadata" ->
      """WITH p AS (SELECT doc_id,
              CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END
                AS major_brand,
              600 + (doc_id % 5) * 100 AS timescale,
              1000 + (doc_id * 37) % 9000 AS duration,
              1 + doc_id % 3 AS n_tracks
            FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          c AS (SELECT *,
              CASE (doc_id // 3 + 0) % 3 WHEN 0 THEN 'avc1'
                WHEN 1 THEN 'mp4a' ELSE 'hev1' END AS c0,
              CASE (doc_id // 3 + 1) % 3 WHEN 0 THEN 'avc1'
                WHEN 1 THEN 'mp4a' ELSE 'hev1' END AS c1,
              CASE (doc_id // 3 + 2) % 3 WHEN 0 THEN 'avc1'
                WHEN 1 THEN 'mp4a' ELSE 'hev1' END AS c2
            FROM p),
          m AS (SELECT major_brand, n_tracks,
              c0 || CASE WHEN n_tracks > 1 THEN ',' || c1 ELSE '' END
                 || CASE WHEN n_tracks > 2 THEN ',' || c2 ELSE '' END
                AS codecs,
              1000 * duration // timescale AS duration_ms, timescale
            FROM c)
         SELECT major_brand, n_tracks, codecs,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(duration_ms) AS BIGINT) AS sum_dur_ms,
                CAST(SUM(timescale) AS BIGINT) AS sum_ts
         FROM m GROUP BY major_brand, n_tracks, codecs
         ORDER BY major_brand, n_tracks, codecs""",
    // q_m7: sequential replay of the two-phase perceptual admit over the
    // same dHashes as q_m6's oracle — a1 = phase-1 docs with no
    // smaller-id Hamming-3 partner, a2 = phase-2 docs blocked by neither
    // an ADMITTED history doc nor a smaller-id phase-2 doc (admitted or
    // not — conservative family drop, the q_d6 formulation)
    "q_m7_perceptual_delta" ->
      """WITH l AS MATERIALIZED (SELECT doc_id, list_transform(range(0, 36), k ->
              CAST(COALESCE(list_sum(list_transform(
                  range((k * length(text)) // 36,
                        ((k + 1) * length(text)) // 36),
                  i -> ord(substr(text, CAST(i + 1 AS INTEGER), 1)))), 0)
                // greatest(((k + 1) * length(text)) // 36
                           - (k * length(text)) // 36, 1) AS BIGINT))
              AS lum
            FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          h AS MATERIALIZED (SELECT doc_id,
              CAST(list_sum(list_transform(range(0, 32), b ->
                CASE WHEN lum[CAST((b // 8) * 9 + (b % 8) + 1 AS INTEGER)]
                        < lum[CAST((b // 8) * 9 + (b % 8) + 2 AS INTEGER)]
                     THEN (CAST(1 AS BIGINT) << b) ELSE 0 END))
                AS BIGINT) AS ph
            FROM l),
          p AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM h a JOIN h b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.ph, b.ph)) <= 3),
          a1 AS (SELECT d.doc_id FROM h d WHERE d.doc_id < 250
            AND NOT EXISTS (SELECT 1 FROM p WHERE p.id_b = d.doc_id)),
          a2 AS (SELECT d.doc_id FROM h d WHERE d.doc_id >= 250
            AND NOT EXISTS (SELECT 1 FROM p JOIN a1 ON p.id_a = a1.doc_id
                            WHERE p.id_b = d.doc_id)
            AND NOT EXISTS (SELECT 1 FROM p
                            WHERE p.id_b = d.doc_id AND p.id_a >= 250))
         SELECT doc_id FROM a1 UNION ALL SELECT doc_id FROM a2
         ORDER BY doc_id""",
    // q_m6: exhaustive all-pairs replay of the banded engine result —
    // same stub luminance decode (slice floor-means of the UTF-8 code
    // points), same 4×9 dHash, true Hamming ≤ 3; COALESCE guards the
    // sub-grid-length blob edge (empty slice reads luminance 0, as the
    // engine's `when(end > start)` branch does)
    "q_m6_perceptual_neardup" ->
      """WITH l AS (SELECT doc_id, list_transform(range(0, 36), k ->
              CAST(COALESCE(list_sum(list_transform(
                  range((k * length(text)) // 36,
                        ((k + 1) * length(text)) // 36),
                  i -> ord(substr(text, CAST(i + 1 AS INTEGER), 1)))), 0)
                // greatest(((k + 1) * length(text)) // 36
                           - (k * length(text)) // 36, 1) AS BIGINT))
              AS lum
            FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL),
          h AS (SELECT doc_id,
              CAST(list_sum(list_transform(range(0, 32), b ->
                CASE WHEN lum[CAST((b // 8) * 9 + (b % 8) + 1 AS INTEGER)]
                        < lum[CAST((b // 8) * 9 + (b % 8) + 2 AS INTEGER)]
                     THEN (CAST(1 AS BIGINT) << b) ELSE 0 END))
                AS BIGINT) AS ph
            FROM l)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS hamming
         FROM h a JOIN h b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.ph, b.ph)) <= 3
         ORDER BY id_a, id_b""",
    "q_m1_multimodal_profile" ->
      """SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT md5(text)) AS distinct_blobs
         FROM documents GROUP BY source ORDER BY source""",
    "q_m2_decode_stub" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) % 1920 AS INTEGER) AS width,
           CAST((octet_length(encode(text)) * 7919) % 1080 AS INTEGER) AS height,
           CAST(octet_length(encode(text)) // 64 + 1 AS INTEGER) AS n_frames,
           md5(text) AS feat_checksum
         FROM documents WHERE doc_id < 50 ORDER BY doc_id""",
    "q_m3_resize_stub" ->
      // budget = 64*48/8 = 384 bytes; the corpus is pure ASCII (verified),
      // so byte truncation == char truncation and VARCHAR md5 matches the
      // Spark-side md5 over the truncated binary
      """SELECT doc_id, 64 AS width, 48 AS height,
           CAST(LEAST(octet_length(encode(text)), 384) AS BIGINT) AS out_bytes,
           md5(substring(text, 1,
             CAST(LEAST(octet_length(encode(text)), 384) AS INT))) AS out_md5
         FROM documents WHERE doc_id < 50 ORDER BY doc_id""",
    "q_m4_frame_sample" ->
      // chunk i = bytes [i*64, i*64+16) for i in 0..min(floor(n/64), 7);
      // ASCII corpus → byte slicing == char slicing (as q_m3)
      """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS nb
                    FROM documents WHERE doc_id < 50),
            i AS (SELECT doc_id, text,
                    unnest(range(0, least(nb // 64, 7) + 1)) AS ci FROM d)
         SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
                md5(substring(text, CAST(ci * 64 + 1 AS INTEGER), 16)) AS chunk_md5
         FROM i ORDER BY doc_id, chunk_idx""",
    "q_e1_sessionize" -> sessionizeOracle,
    // q_e23: the same (us, event_id)-ordered lead window, the same
    // null drops, the identical n·10⁶ // row_n floor
    "q_e23_event_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                epoch_us(ts) AS us
              FROM events
              WHERE user_id IS NOT NULL AND event_type IS NOT NULL
                AND event_id IS NOT NULL AND ts IS NOT NULL),
          p AS (SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY us, event_id) AS to_type
                FROM e),
          c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
                FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
          t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_n
                FROM c GROUP BY 1)
         SELECT c.from_type, c.to_type, c.n, t.row_n,
                CAST(c.n * 1000000 // t.row_n AS BIGINT) AS p_ppm
         FROM c JOIN t USING (from_type)
         ORDER BY from_type, to_type""",
    "q_e1x_sessionize_chunked" -> sessionizeOracle, // same semantics, chunked plan
    "q_e7_token_budget" ->
      // same "budget:" domain-separated md5 order; keep iff the tokens
      // BEFORE the row are under budget (cum − n < 2000)
      s"""WITH d AS (SELECT source, doc_id, len($duckToks) AS n
            FROM documents),
          o AS (SELECT source, doc_id, n,
                  SUM(n) OVER (PARTITION BY source
                    ORDER BY md5('budget:' || CAST(doc_id AS VARCHAR)), doc_id
                    ROWS UNBOUNDED PRECEDING) AS cum
                FROM d)
         SELECT source, COUNT(*) AS n_kept,
                CAST(SUM(n) AS BIGINT) AS kept_tokens,
                CAST(SUM(doc_id) AS BIGINT) AS kept_sum
         FROM o WHERE cum - n < 2000 GROUP BY source ORDER BY source""",
    "q_e8_stratified_split" ->
      // rank by the "strat:" md5; cumulative keep counts are exact
      // integer·2⁻¹⁶ math on both engines: bits 52428 = floor(0.8·65536),
      // 58982 = floor(0.9·65536) (the engine derives the same constants)
      """WITH r AS (SELECT source, doc_id,
                  ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id)
                    AS rk,
                  COUNT(*) OVER (PARTITION BY source) AS n
                FROM documents),
          a AS (SELECT source, doc_id,
                  CASE WHEN rk <= FLOOR(n * 52428 / 65536.0) THEN 'train'
                       WHEN rk <= FLOOR(n * 58982 / 65536.0) THEN 'val'
                       ELSE 'test' END AS split
                FROM r)
         SELECT source, split, COUNT(*) AS n,
                CAST(SUM(doc_id) AS BIGINT) AS member_sum
         FROM a GROUP BY source, split ORDER BY source, split""",
    // q_e9: retrains the identical hashed-n-gram pair of models —
    // bucket = md5 first 16 bits mod 1024 (CAST('0x'||hex AS INT) ≡
    // Spark conv(..,16,10)); the per-bucket log ratio replays the
    // engine's exact association ((ln(ct+1) − ln(nt+m)) − ln(cr+1)) +
    // ln(nr+m) inside one half-up floor to 1e-4 nats; doc totals are
    // BIGINT sums of those integers. Target ⊆ raw here, so every doc
    // bucket is in cr and the left join is total.
    "q_e9_dsir_select" ->
      s"""WITH $duckDsir
         SELECT doc_id, n_feats, score_e4 FROM dsir
         ORDER BY score_e4 DESC, doc_id LIMIT 50""",
    // q_e10: DSIR's resampling step — the Gumbel key replays the
    // engine's md5-derived 52-bit dyadic uniform ((h + 0.5) / 2^52,
    // exact in double on both engines) and the same association
    // (score/1e4 − ln(−ln(u))) inside one half-up floor to 1e-4
    "q_e10_gumbel_sample" ->
      s"""WITH $duckDsir,
          g AS (SELECT doc_id, CAST(FLOOR((score_e4 / 10000.0 -
                  ln(-ln((CAST(concat('0x', substr(md5('gum:r7:' ||
                    CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 0.5) /
                    4503599627370496.0))) * 10000.0 + 0.5) AS BIGINT)
                  AS gumbel_key_e4
                FROM dsir)
         SELECT doc_id, gumbel_key_e4 FROM g
         ORDER BY gumbel_key_e4 DESC, doc_id LIMIT 50""",
    // q_e21: the waterfill replay — capped sources are a PREFIX of the
    // (cap, source) order (the statistic P_i + c_i·(n−i) is
    // nondecreasing in i), level and remainder as floor division/mod
    "q_e21_unimax" ->
      s"""WITH tc AS (SELECT source,
                CAST(SUM(len($duckToks)) AS BIGINT) AS avail
              FROM documents WHERE source IS NOT NULL
              GROUP BY source HAVING SUM(len($duckToks)) > 0),
          g AS (SELECT source, avail, avail * 2 AS cap FROM tc),
          r AS (SELECT source, avail, cap,
                  ROW_NUMBER() OVER (ORDER BY cap, source) AS i,
                  CAST(SUM(cap) OVER (ORDER BY cap, source) AS BIGINT)
                    AS p
                FROM g),
          t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                       CAST(SUM(avail) AS BIGINT) AS tot FROM g),
          s1 AS (SELECT r.*, t.nn, tot * 39 // 20 AS budget FROM r, t),
          s2 AS (SELECT s1.*,
                   (p + cap * (nn - i) <= budget) AS capped FROM s1),
          pool AS (SELECT
                CAST(COALESCE(SUM(cap) FILTER (WHERE capped), 0)
                     AS BIGINT) AS pk,
                CAST(COUNT(*) FILTER (WHERE capped) AS BIGINT) AS k
              FROM s2),
          f AS (SELECT s2.source, s2.avail, s2.cap,
                  CASE WHEN pool.k = s2.nn THEN s2.cap
                       WHEN s2.capped THEN s2.cap
                       ELSE LEAST(s2.cap,
                         (s2.budget - pool.pk) // (s2.nn - pool.k) +
                         CASE WHEN (s2.i - pool.k) <=
                              (s2.budget - pool.pk) % (s2.nn - pool.k)
                              THEN 1 ELSE 0 END)
                  END AS alloc
                FROM s2, pool)
         SELECT source, avail, cap, CAST(alloc AS BIGINT) AS alloc,
                CAST(alloc * 1000000 // avail AS BIGINT) AS epochs_e6
         FROM f ORDER BY source""",
    // q_e20: the ^0.75 weight inside the identical half-up floor, the
    // cumulative as one ordered SUM OVER (DuckDB replays the global
    // order the engine builds by partition-offset), md5 draws via the
    // established '0x'||hex ≡ conv(…,16,10) equivalence
    "q_e20_negative_sampling" ->
      s"""WITH tf AS (SELECT t AS token, COUNT(*) AS cnt
              FROM (SELECT unnest($duckToks) AS t FROM documents
                    WHERE text IS NOT NULL) x
              GROUP BY 1),
          wv AS (SELECT token,
                   CAST(floor(pow(CAST(cnt AS DOUBLE), 0.75) * 10000
                              + 0.5) AS BIGINT) AS w
                 FROM tf),
          cum AS (SELECT token, w,
                    CAST(SUM(w) OVER (ORDER BY token) AS BIGINT) AS c
                  FROM wv),
          tot AS (SELECT CAST(SUM(w) AS BIGINT) AS t FROM wv),
          dr AS (SELECT d.doc_id AS anchor, CAST(r.j AS INTEGER) AS j,
                   CAST(concat('0x', substr(md5('neg:42:'
                     || CAST(d.doc_id AS VARCHAR) || ':'
                     || CAST(r.j AS VARCHAR)), 1, 13)) AS BIGINT)
                     % tot.t AS u
                 FROM (SELECT DISTINCT doc_id FROM documents
                       WHERE doc_id < 200 AND doc_id IS NOT NULL) d,
                      tot, unnest(range(1, 6)) AS r(j))
         SELECT anchor, j, cum.token AS neg_token, u
         FROM dr JOIN cum ON dr.u BETWEEN cum.c - cum.w AND cum.c - 1
         ORDER BY anchor, j""",
    // q_e19: the unrolled-MM replay is GENERATED from the same
    // (rounds, lambda) by BradleyTerry.oracleCtes — engine and oracle
    // cannot drift on the round count or smoothing
    "q_e19_bradley_terry" ->
      s"""WITH c AS MATERIALIZED (
                SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                       event_type, COUNT(*) AS n
                FROM events
                WHERE event_type IS NOT NULL AND ts IS NOT NULL
                  AND user_id IS NOT NULL
                GROUP BY 1, 2, 3),
          cmp AS MATERIALIZED (
                SELECT CASE WHEN x.n > y.n THEN x.event_type
                            ELSE y.event_type END AS winner,
                       CASE WHEN x.n > y.n THEN y.event_type
                            ELSE x.event_type END AS loser
                FROM c x JOIN c y
                  ON x.user_id = y.user_id AND x.d = y.d
                 AND x.event_type < y.event_type
                WHERE x.n <> y.n),
          ${BradleyTerry.oracleCtes(rounds = 10, lambda = 1L)}""",
    // q_e18: the engine computes positions in closed form; the oracle
    // is the DEFINITION — rank under the (virtual time, source, r)
    // sort, virtual time exact-integered by the lcm-6 trick
    "q_e18_interleave" ->
      """WITH d AS (SELECT doc_id, source,
              (CAST(substr(source, 4) AS BIGINT) % 3) + 1 AS w
            FROM documents
            WHERE source IS NOT NULL AND doc_id IS NOT NULL),
          rk AS (SELECT doc_id, source, w,
                  ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
                    AS r
                 FROM d)
         SELECT doc_id, source, CAST(r AS BIGINT) AS r,
                CAST(ROW_NUMBER() OVER
                  (ORDER BY (r + 1) * (6 // w), source, r) - 1 AS BIGINT)
                  AS pos
         FROM rk ORDER BY pos""",
    // q_e17: q_e10's key replay with n_chars·10 weights, ranked per
    // source (CAST to BIGINT — Spark's floor() is integral, DuckDB's is
    // DOUBLE)
    "q_e17_gumbel_per_group" ->
      """WITH g AS (SELECT source, doc_id,
                CAST(FLOOR((n_chars * 10 / 10000.0 -
                  ln(-ln((CAST(concat('0x', substr(md5('gum:42:' ||
                    CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 0.5) /
                    4503599627370496.0))) * 10000.0 + 0.5) AS BIGINT)
                  AS gumbel_key_e4
              FROM documents),
          r AS (SELECT source, doc_id, gumbel_key_e4,
                  ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY gumbel_key_e4 DESC, doc_id) AS rank
                FROM g)
         SELECT source, rank, doc_id, gumbel_key_e4 FROM r
         WHERE rank <= 3 ORDER BY source, rank""",
    // q_e11: replays the exact-integer Hamilton allocation — weights
    // floor(sqrt(n)·1e6 + 0.5) (IEEE sqrt is correctly rounded on both
    // engines), base = (B·w) // Σw, leftover seats by remainder DESC
    // then group, quota LEAST-capped at n, rows chosen in the same
    // 'cap:' md5 order as q_e6
    "q_e11_temperature_mix" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents
              WHERE doc_id IS NOT NULL AND lang IS NOT NULL GROUP BY lang),
          w AS (SELECT lang, n,
                  CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1000000 + 0.5)
                    AS BIGINT) AS w
                FROM c),
          t AS (SELECT CAST(SUM(w) AS BIGINT) AS s FROM w),
          a AS (SELECT lang, n, (200 * w) // s AS base, (200 * w) % s AS rem
                FROM w, t),
          l AS (SELECT 200 - CAST(SUM(base) AS BIGINT) AS lft FROM a),
          r AS (SELECT lang, n, base, rem,
                  ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rr
                FROM a),
          k AS (SELECT lang,
                  LEAST(CAST(n AS BIGINT),
                    base + CASE WHEN rr <= (SELECT lft FROM l)
                                THEN 1 ELSE 0 END) AS quota
                FROM r),
          ranked AS (SELECT lang, doc_id,
                  ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)),
                      doc_id) AS rk
                FROM documents WHERE doc_id IS NOT NULL),
          sel AS (SELECT ranked.lang, doc_id
                  FROM ranked JOIN k ON ranked.lang = k.lang
                  WHERE rk <= k.quota)
         SELECT lang, COUNT(*) AS n_kept,
                CAST(SUM(doc_id) AS BIGINT) AS kept_sum
         FROM sel GROUP BY lang ORDER BY lang""",
    // q_e12: step-wise CTE chain replaying the funnel rounds — each
    // stage's min-qualifying-time join is token-identical; the HAVING
    // mirrors the engine's "no row for an unreached step"
    "q_e12_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type
              FROM events WHERE user_id IS NOT NULL),
          s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
                 WHERE event_type = 'view' GROUP BY user_id),
          s2 AS (SELECT e.user_id, s1.t1, MIN(e.t) AS t2
                 FROM e JOIN s1 ON e.user_id = s1.user_id
                 WHERE e.event_type = 'click' AND e.t > s1.t1
                   AND e.t <= s1.t1 + 172800000000
                 GROUP BY e.user_id, s1.t1),
          s3 AS (SELECT e.user_id, MIN(e.t) AS t3
                 FROM e JOIN s2 ON e.user_id = s2.user_id
                 WHERE e.event_type = 'purchase' AND e.t > s2.t2
                   AND e.t <= s2.t1 + 172800000000
                 GROUP BY e.user_id),
          u AS (SELECT 1 AS step_idx, 'view' AS step, COUNT(*) AS n,
                  CAST(CAST(SUM(user_id) AS DECIMAL(38,0)) AS VARCHAR)
                    AS entity_sum
                FROM s1 HAVING COUNT(*) > 0
            UNION ALL
                SELECT 2, 'click', COUNT(*),
                  CAST(CAST(SUM(user_id) AS DECIMAL(38,0)) AS VARCHAR)
                FROM s2 HAVING COUNT(*) > 0
            UNION ALL
                SELECT 3, 'purchase', COUNT(*),
                  CAST(CAST(SUM(user_id) AS DECIMAL(38,0)) AS VARCHAR)
                FROM s3 HAVING COUNT(*) > 0)
         SELECT step_idx, step, n, entity_sum FROM u ORDER BY step_idx""",
    // q_e25: the q_e23 matrix CTEs feeding the GENERATED unrolled
    // power-iteration replay (Transitions.stationaryOracleSql) — same
    // rounds, same Hamilton form, HUGEINT intermediates
    "q_e25_stationary_mix" -> Transitions.stationaryOracleSql(
      """WITH e AS (SELECT user_id, event_id, event_type,
                epoch_us(ts) AS us
              FROM events
              WHERE user_id IS NOT NULL AND event_type IS NOT NULL
                AND event_id IS NOT NULL AND ts IS NOT NULL),
          pr AS (SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY us, event_id) AS to_type
                FROM e),
          c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
                FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2),
          tt AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_n
                 FROM c GROUP BY 1),
          m AS (SELECT c.from_type, c.to_type,
                  CAST(c.n * 1000000 // t.row_n AS BIGINT) AS p_ppm
                FROM c JOIN tt t USING (from_type))""",
      rounds = 6),
    // q_e24: q_e12's step-wise chain carrying t1 through, the same
    // entry-anchored differences, the identical div(p·(n−1), 1e6)
    // rank pick per step
    "q_e24_funnel_ttc" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type
              FROM events WHERE user_id IS NOT NULL),
          s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
                 WHERE event_type = 'view' GROUP BY user_id),
          s2 AS (SELECT e.user_id, s1.t1, MIN(e.t) AS t2
                 FROM e JOIN s1 ON e.user_id = s1.user_id
                 WHERE e.event_type = 'click' AND e.t > s1.t1
                   AND e.t <= s1.t1 + 172800000000
                 GROUP BY e.user_id, s1.t1),
          s3 AS (SELECT e.user_id, s2.t1, MIN(e.t) AS t3
                 FROM e JOIN s2 ON e.user_id = s2.user_id
                 WHERE e.event_type = 'purchase' AND e.t > s2.t2
                   AND e.t <= s2.t1 + 172800000000
                 GROUP BY e.user_id, s2.t1),
          ttc AS (SELECT 'click' AS step, t2 - t1 AS v FROM s2
              UNION ALL
                  SELECT 'purchase' AS step, t3 - t1 FROM s3),
          cnt AS (SELECT step, CAST(COUNT(*) AS BIGINT) AS n
                  FROM ttc GROUP BY 1),
          rk AS (SELECT step, v, ROW_NUMBER() OVER (PARTITION BY step
                   ORDER BY v) - 1 AS rn
                 FROM ttc),
          q AS (SELECT r.step, p.p_e6,
                  MAX(CASE WHEN r.rn = (p.p_e6 * (c.n - 1)) // 1000000
                    THEN r.v END) AS ttc_us
                FROM rk r JOIN cnt c USING (step),
                     (SELECT UNNEST([500000, 900000]) AS p_e6) p
                GROUP BY r.step, p.p_e6)
         SELECT q.step, c.n, CAST(q.p_e6 AS BIGINT) AS p_e6,
                CAST(q.ttc_us AS BIGINT) AS ttc_us
         FROM q JOIN cnt c USING (step)
         ORDER BY step, p_e6""",
    // q_e29: the lag-shifted equi-join over the daily grid + the
    // q_a13 moment/round tail, NULL on n<2 or zero variance
    // q_e31: durations replay + the hypergeometric e/v cascade with
    // per-event-time floors, two suffix-sum risk windows, the strict
    // degenerate CASEs
    "q_e31_logrank" ->
      """WITH pu AS (SELECT user_id,
                MIN(epoch_us(ts) // 86400000000) AS f,
                MAX(epoch_us(ts) // 86400000000) AS l
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL
                AND event_type = 'purchase'
              GROUP BY user_id),
          hz AS (SELECT MAX(l) AS maxd FROM pu),
          dur AS (SELECT user_id, f, l - f AS t,
                CASE WHEN l < maxd - 6 THEN 1 ELSE 0 END AS ev
              FROM pu CROSS JOIN hz),
          base AS (SELECT 'aa_null' AS panel,
                CASE WHEN CAST(concat('0x', substr(md5(
                    CAST(user_id AS VARCHAR)), 1, 14)) AS BIGINT)
                    % 2 = 0
                  THEN 1 ELSE 0 END AS isa,
                t, ev
              FROM dur
             UNION ALL
                   SELECT 'entry_cohort',
                CASE WHEN f < mind + 10 THEN 1 ELSE 0 END, t, ev
              FROM dur
              CROSS JOIN (SELECT MIN(f) AS mind FROM dur)),
          cells AS (SELECT panel, t,
                CAST(SUM(CASE WHEN isa = 1 THEN ev ELSE 0 END)
                  AS BIGINT) AS da,
                CAST(SUM(CASE WHEN isa = 0 THEN ev ELSE 0 END)
                  AS BIGINT) AS db,
                CAST(SUM(isa) AS BIGINT) AS ta,
                CAST(SUM(1 - isa) AS BIGINT) AS tb
              FROM base GROUP BY 1, 2),
          risk AS (SELECT *,
                CAST(SUM(ta) OVER (PARTITION BY panel ORDER BY t
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS BIGINT) AS na,
                CAST(SUM(tb) OVER (PARTITION BY panel ORDER BY t
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS BIGINT) AS nb
              FROM cells),
          ev2 AS (SELECT panel, da, na, nb,
                CASE WHEN da + db > 0
                  THEN (1000000 * CAST(da + db AS HUGEINT) * na)
                    // (na + nb)
                  ELSE 0 END AS e,
                CASE WHEN da + db > 0 AND na + nb > 1
                  THEN (1000000 * CAST(da + db AS HUGEINT) * na * nb
                      * (na + nb - da - db))
                    // (CAST(na + nb AS HUGEINT) * (na + nb)
                      * (na + nb - 1))
                  ELSE 0 END AS v
              FROM risk),
          pp AS (SELECT panel, MAX(na) AS n_a, MAX(nb) AS n_b,
                SUM(da) AS o_a, SUM(e) AS se, SUM(v) AS sv
              FROM ev2 GROUP BY 1),
          fin AS (SELECT panel, n_a, n_b, o_a, se,
                CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                     WHEN sv = 0 THEN NULL
                     ELSE ((1000000 * CAST(o_a AS HUGEINT) - se)
                       * (1000000 * CAST(o_a AS HUGEINT) - se)) // sv
                END AS z2,
                CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                     ELSE SIGN(1000000 * CAST(o_a AS HUGEINT) - se)
                END AS ds
              FROM pp)
         SELECT panel, CAST(n_a AS BIGINT) AS n_a,
                CAST(n_b AS BIGINT) AS n_b,
                CAST(o_a AS BIGINT) AS o_a,
                CAST(se AS BIGINT) AS e_a_e6,
                CAST(z2 AS BIGINT) AS z2_e6,
                CAST(ds AS BIGINT) AS d_sign,
                CAST(CASE WHEN z2 >= 3841459 THEN 1 ELSE 0 END
                  AS BIGINT) AS sig
         FROM fin ORDER BY panel""",
    // q_e30: the kaplanMeierOracleSql generator (risk-set suffix sum,
    // the embedded mantissa table, the emptied-set NULL gate) over the
    // replayed durations protocol
    "q_e30_churn_survival" -> (Survival.kaplanMeierOracleSql(
      """SELECT l - f AS t,
            CASE WHEN l < maxd - 6 THEN 1 ELSE 0 END AS ev
         FROM (SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS f,
                 MAX(epoch_us(ts) // 86400000000) AS l
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_type = 'purchase'
               GROUP BY user_id)
         CROSS JOIN (SELECT MAX(epoch_us(ts) // 86400000000) AS maxd
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_type = 'purchase')""") +
      " ORDER BY t"),
    "q_e29_lead_lag" ->
      """WITH e AS (SELECT event_type AS g, epoch_us(ts) AS us
              FROM events
              WHERE event_type IS NOT NULL AND ts IS NOT NULL),
          daily AS (SELECT g, us // 86400000000 AS x,
                CAST(COUNT(*) AS BIGINT) AS y
              FROM e GROUP BY 1, 2),
          lags AS (SELECT UNNEST(range(-3, 4)) AS lag),
          j AS (SELECT a.g AS type_a, b.g AS type_b, l.lag,
                a.y AS ya, b.y AS yb
              FROM daily a, lags l
              JOIN daily b ON b.x = a.x + l.lag
              WHERE a.g <> b.g),
          m AS (SELECT type_a, type_b, lag,
                CAST(COUNT(*) AS BIGINT) AS n,
                SUM(ya) AS sa, SUM(yb) AS sb,
                SUM(ya * ya) AS saa, SUM(yb * yb) AS sbb,
                SUM(ya * yb) AS sab
              FROM j GROUP BY 1, 2, 3)
         SELECT type_a, type_b, CAST(lag AS BIGINT) AS lag,
                n AS n_days,
                CASE WHEN n < 2 OR n * saa - sa * sa = 0
                       OR n * sbb - sb * sb = 0 THEN NULL
                  ELSE ROUND(CAST(n * sab - sa * sb AS DOUBLE) /
                    sqrt(CAST(n * saa - sa * sa AS DOUBLE)) /
                    sqrt(CAST(n * sbb - sb * sb AS DOUBLE)), 6)
                END AS corr6
         FROM m ORDER BY type_a, type_b, lag""",
    // q_e28: phase medians, residuals and both Hampel rank selects
    // replayed — every median the (n+1)//2 lower pick by row_number
    // (tie order irrelevant: the VALUE at the rank is invariant)
    "q_e28_seasonal_anomaly" ->
      """WITH e AS (SELECT event_type AS g, epoch_us(ts) AS us
              FROM events
              WHERE event_type IS NOT NULL AND ts IS NOT NULL),
          daily AS (SELECT g, us // 86400000000 AS x,
                CAST(COUNT(*) AS BIGINT) AS y
              FROM e GROUP BY 1, 2),
          dd AS (SELECT g, x, y, x % 7 AS dow FROM daily),
          pr AS (SELECT g, dow, y,
                ROW_NUMBER() OVER (PARTITION BY g, dow ORDER BY y)
                  AS rn,
                COUNT(*) OVER (PARTITION BY g, dow) AS n
              FROM dd),
          prof AS (SELECT g, dow, y AS med_dow FROM pr
                   WHERE rn = (n + 1) // 2),
          res AS (SELECT dd.g, dd.x, dd.y, dd.dow, prof.med_dow,
                dd.y - prof.med_dow AS resid
              FROM dd JOIN prof
                ON prof.g = dd.g AND prof.dow = dd.dow),
          mr AS (SELECT g, resid AS v,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY resid)
                  AS rn,
                COUNT(*) OVER (PARTITION BY g) AS n
              FROM res),
          medr AS (SELECT g, v AS med_r FROM mr
                   WHERE rn = (n + 1) // 2),
          ad AS (SELECT r.g, m.med_r, ABS(r.resid - m.med_r) AS av,
                ROW_NUMBER() OVER (PARTITION BY r.g
                  ORDER BY ABS(r.resid - m.med_r)) AS rn,
                COUNT(*) OVER (PARTITION BY r.g) AS n
              FROM res r JOIN medr m ON m.g = r.g),
          madr AS (SELECT g, med_r, av AS mad_r FROM ad
                   WHERE rn = (n + 1) // 2)
         SELECT r.g AS event_type, CAST(r.x AS BIGINT) AS x,
                CAST(r.y AS BIGINT) AS y, CAST(r.dow AS BIGINT) AS dow,
                CAST(r.med_dow AS BIGINT) AS med_dow,
                CAST(r.resid AS BIGINT) AS resid,
                CAST(CASE WHEN ABS(r.resid - s.med_r) * 1000
                     > 3000 * s.mad_r THEN 1 ELSE 0 END AS INTEGER)
                  AS anom
         FROM res r JOIN madr s ON s.g = r.g
         ORDER BY event_type, x""",
    // q_e27: the identical event-anchored RANGE frame ([t, t+W) as
    // RANGE 0..W−1 FOLLOWING), per-user max, min-anchor tie-break
    "q_e27_burst_detection" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          c AS (SELECT user_id, t,
                COUNT(*) OVER (PARTITION BY user_id ORDER BY t
                  RANGE BETWEEN CURRENT ROW AND 86399999999 FOLLOWING)
                  AS c
              FROM e),
          p AS (SELECT user_id, MAX(c) AS peak FROM c GROUP BY user_id)
         SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                CAST(p.peak AS BIGINT) AS peak_burst,
                CAST(MIN(CASE WHEN c.c = p.peak THEN c.t END)
                  AS BIGINT) AS peak_start_us,
                CAST(CASE WHEN p.peak >= 8 THEN 1 ELSE 0 END
                  AS BIGINT) AS flagged
         FROM c JOIN p USING (user_id)
         GROUP BY c.user_id, p.peak
         ORDER BY c.user_id""",
    // q_e26: q_e12's step chain + the exact lower-median activity
    // split + the pooled two-proportion z² as one HUGEINT rational
    // (x1n2−x2n1)²·N·1e6 // (n1n2·X·(N−X)); the A/A parity leg rides
    // the same machinery; NULL z² (empty cohort) classes sig = 0 on
    // both engines
    "q_e26_funnel_significance" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type
              FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          s1 AS (SELECT user_id, MIN(t) AS t1 FROM e
                 WHERE event_type = 'view' GROUP BY user_id),
          s2 AS (SELECT e.user_id, s1.t1, MIN(e.t) AS t2
                 FROM e JOIN s1 USING (user_id)
                 WHERE e.event_type = 'click' AND e.t > s1.t1
                   AND e.t <= s1.t1 + 172800000000
                 GROUP BY e.user_id, s1.t1),
          s3 AS (SELECT e.user_id, MIN(e.t) AS t3
                 FROM e JOIN s2 USING (user_id)
                 WHERE e.event_type = 'purchase' AND e.t > s2.t2
                   AND e.t <= s2.t1 + 172800000000
                 GROUP BY e.user_id),
          cnt AS (SELECT user_id, COUNT(*) AS n_ev FROM e
                  GROUP BY user_id),
          rk AS (SELECT n_ev,
                   ROW_NUMBER() OVER (ORDER BY n_ev, user_id) - 1 AS rn
                 FROM cnt),
          nu AS (SELECT COUNT(*) AS n FROM cnt),
          med AS (SELECT rk.n_ev AS m FROM rk, nu
                  WHERE rk.rn = (nu.n - 1) // 2),
          coh AS (SELECT c.user_id,
                    CASE WHEN c.n_ev > med.m THEN 'hi' ELSE 'lo' END
                      AS act,
                    CASE WHEN c.user_id % 2 = 0 THEN 'even' ELSE 'odd'
                      END AS par
                  FROM cnt c, med),
          st AS (SELECT user_id, 1 AS step_idx, 'view' AS step FROM s1
             UNION ALL SELECT user_id, 2, 'click' FROM s2
             UNION ALL SELECT user_id, 3, 'purchase' FROM s3),
          counts AS (
            SELECT 'activity' AS split, step_idx, step,
                SUM(CASE WHEN coh.act = 'hi' THEN 1 ELSE 0 END) AS na,
                SUM(CASE WHEN coh.act = 'lo' THEN 1 ELSE 0 END) AS nb
            FROM st JOIN coh USING (user_id) GROUP BY 2, 3
            UNION ALL
            SELECT 'parity_aa', step_idx, step,
                SUM(CASE WHEN coh.par = 'even' THEN 1 ELSE 0 END),
                SUM(CASE WHEN coh.par = 'odd' THEN 1 ELSE 0 END)
            FROM st JOIN coh USING (user_id) GROUP BY 2, 3),
          z AS (SELECT f.split, f.step_idx AS from_idx,
                  f.step AS step_from, tt.step AS step_to,
                  f.na AS n1, tt.na AS x1, f.nb AS n2, tt.nb AS x2,
                  CAST(tt.na AS HUGEINT) * f.nb
                    - CAST(tt.nb AS HUGEINT) * f.na AS num,
                  CAST(tt.na + tt.nb AS HUGEINT) AS xx,
                  CAST(f.na + f.nb AS HUGEINT) AS nn
                FROM counts f JOIN counts tt
                  ON tt.split = f.split
                 AND tt.step_idx = f.step_idx + 1),
          zz AS (SELECT *,
                  CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                       WHEN xx = 0 OR xx = nn THEN 0
                       ELSE num * num * nn * 1000000
                         // (CAST(n1 AS HUGEINT) * n2 * xx * (nn - xx))
                  END AS z2
                 FROM z)
         SELECT split, CAST(from_idx AS BIGINT) AS from_idx, step_from,
                step_to,
                CAST(n1 AS BIGINT) AS entrants_a,
                CAST(x1 AS BIGINT) AS conv_a,
                CAST(n2 AS BIGINT) AS entrants_b,
                CAST(x2 AS BIGINT) AS conv_b,
                CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1
                     ELSE 0 END AS BIGINT) AS d_sign,
                CAST(z2 AS BIGINT) AS z2_e6,
                CAST(CASE WHEN z2 >= 3841459 THEN 1 ELSE 0 END
                  AS BIGINT) AS sig
         FROM zz ORDER BY split, from_idx""",
    // q_e13: distinct (user, day) activity, min-day cohorts, exact
    // integer day buckets (// ≡ Spark DIV on nonnegative micros)
    "q_e13_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
                epoch_us(ts) // 86400000000 AS b
              FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          c AS (SELECT user_id, MIN(b) AS c0 FROM a GROUP BY user_id)
         SELECT c.c0 AS cohort_bucket, a.b - c.c0 AS offset_buckets,
                COUNT(*) AS n,
                CAST(CAST(SUM(a.user_id) AS DECIMAL(38,0)) AS VARCHAR)
                  AS entity_sum
         FROM a JOIN c ON a.user_id = c.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // q_e14: per-bucket last value by (t, event_id) rank, grid from
    // each user's span, IGNORE NULLS carry-forward over the same
    // running frame; gap_filled rides bucket PRESENCE, not value
    // nullness (the engine's marker-column semantics)
    "q_e14_locf_resample" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value, event_id
              FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          r AS (SELECT user_id, t // 21600000000 AS b, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id, t // 21600000000
                                     ORDER BY t DESC, event_id DESC) AS rn
                FROM e),
          lv AS (SELECT user_id, b, value, FALSE AS gap
                 FROM r WHERE rn = 1),
          span AS (SELECT user_id, MIN(t // 21600000000) AS b0,
                     MAX(t // 21600000000) AS b1
                   FROM e GROUP BY user_id),
          grid AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS b
                   FROM span),
          j AS (SELECT g.user_id, g.b, lv.value AS lvv, lv.gap
                FROM grid g LEFT JOIN lv
                  ON g.user_id = lv.user_id AND g.b = lv.b)
         SELECT user_id, b AS bucket,
                last_value(lvv IGNORE NULLS) OVER (PARTITION BY user_id
                  ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS value,
                COALESCE(gap, TRUE) AS gap_filled
         FROM j ORDER BY user_id, bucket""",
    "q_e2_hash_split" ->
      // boundaries = first 4 md5 hex chars vs floor(cum_frac * 65536) in
      // hex: 0.8 → 'cccc', 0.9 → 'e666' (same constants the engine derives)
      """WITH s AS (SELECT doc_id,
              CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
                     THEN 'train'
                   WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                     THEN 'val'
                   ELSE 'test' END AS split
            FROM documents)
         SELECT split, COUNT(*) AS n, MIN(doc_id) AS min_id,
                MAX(doc_id) AS max_id
         FROM s GROUP BY split ORDER BY split""",
    // q_e15 (L64): exhaustive replay of the leakage-safe split — the
    // same recursive-reachability clusters as q_d5 (exact pair set at
    // threshold 0.8), singletons coalesce to their own id, then q_e2's
    // md5 hex boundaries applied to the CLUSTER id
    "q_e15_safe_split" ->
      s"""$clusterCtes,
          cl AS (SELECT s AS id, least(s, MIN(d)) AS cluster
                 FROM r GROUP BY s),
          a AS (SELECT d.doc_id, COALESCE(cl.cluster, d.doc_id) AS cluster
                FROM documents d LEFT JOIN cl ON cl.id = d.doc_id)
         SELECT doc_id, cluster,
                CASE WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 4) < 'cccc'
                       THEN 'train'
                     WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 4) < 'e666'
                       THEN 'val'
                     ELSE 'test' END AS split
         FROM a ORDER BY doc_id""",
    "q_e3_seq_pack" ->
      s"""WITH d AS (SELECT source, doc_id, len($duckToks) AS n FROM documents),
             p AS (SELECT source, n,
                     CAST(FLOOR((SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n) / 512.0)
                          AS BIGINT) AS pack_id
                   FROM d)
          SELECT source, pack_id, COUNT(*) AS n_docs,
                 CAST(SUM(n) AS BIGINT) AS pack_tokens
          FROM p GROUP BY source, pack_id ORDER BY source, pack_id""",
    "q_e4_source_mixture" ->
      // rate 1.0 keeps everything (no hex bound can drop 'ffff'); 0.25 →
      // floor(0.25*65536) = 16384 = '4000'
      """WITH k AS (SELECT source, doc_id FROM documents
            WHERE CASE WHEN source IN ('src0','src1','src2','src3','src4',
                         'src5','src6','src7','src8','src9') THEN TRUE
                       ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
                  END)
         SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS min_id
         FROM k GROUP BY source ORDER BY source""",
    "q_t12_chunking" ->
      // toks[s : s+63] is INCLUSIVE list slicing (64 tokens), clamped at
      // the tail like Spark's slice; (s-1)//48 = the 0-based chunk index;
      // starts stop at len-64+48 (same rule as the engine: no start once
      // a window has reached the end — the final window is the only tail)
      s"""WITH d AS (SELECT doc_id, $duckToks AS toks
            FROM documents WHERE doc_id < 50),
          st AS (SELECT doc_id, toks,
                   unnest(range(1, greatest(len(toks) - 64 + 48, 1) + 1, 48)) AS s
                 FROM d WHERE len(toks) > 0),
          c AS (SELECT doc_id, CAST((s - 1) // 48 AS INT) AS chunk_idx,
                  toks[s:s+63] AS ch FROM st)
         SELECT doc_id, chunk_idx, CAST(len(ch) AS INT) AS n_toks,
                md5(array_to_string(ch, ' ')) AS chunk_md5
         FROM c ORDER BY doc_id, chunk_idx""",
    // q_t16: the oracle retrains the identical add-one bigram model and
    // replays the same quantization — counts are exact integers, the one
    // float step per position is ln((c1+V)/(c2+1)) inside a half-up
    // floor to 1e-4 nats, and per-doc totals/perplexity derive from
    // those identical BIGINTs (division order matches the Spark side:
    // nll::DOUBLE / 1e4 / n)
    "q_t16_lm_perplexity" ->
      s"""WITH $duckLmPerplexity
          SELECT doc_id, n_bigrams, nll_e4, ppl_milli FROM ppl
          ORDER BY doc_id""",
    // q_t31: same augmented fixture, same RE2-safe digit-run pattern,
    // the Luhn fold replayed digit-for-digit (ascii/substr from the
    // right, double-every-second with the −9 fold, mod 10)
    // q_t38: the q_t27 bigram pattern, unigram marginals over BOTH
    // slots, the single ln inside the identical half-up floor
    "q_t38_pmi" ->
      s"""WITH tk AS (SELECT $duckToks AS tk FROM documents
              WHERE text IS NOT NULL),
          bg AS (SELECT tk[CAST(i AS INTEGER)] AS w1,
                        tk[CAST(i + 1 AS INTEGER)] AS w2
                 FROM tk, unnest(range(1, len(tk))) AS t(i)),
          pair AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab
                   FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 5),
          uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w
                  FROM (SELECT w1 AS w FROM bg
                        UNION ALL SELECT w2 FROM bg) u
                  GROUP BY w),
          tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM bg)
         SELECT p.w1, p.w2, p.n_ab,
                CAST(floor(ln(CAST(p.n_ab * tot.n_tot AS DOUBLE)
                              / CAST(a.n_w * b.n_w AS DOUBLE))
                           * 1000000.0 + 0.5) AS BIGINT) AS pmi_e6
         FROM pair p
         JOIN uni a ON a.w = p.w1
         JOIN uni b ON b.w = p.w2, tot
         ORDER BY pmi_e6 DESC, p.w1, p.w2 LIMIT 30""",
    // q_t41: the per-position substring-equality definition replayed
    // per pattern — O(len × patterns), exactly the asymmetry the
    // automaton exists to beat, affordable at gate scale
    "q_t41_blocklist_scan" -> {
      val lits = BlocklistPatterns.mkString("['", "', '", "']")
      s"""WITH hits AS (
            SELECT doc_id, p,
              len(list_filter(range(1, length(text) - length(p) + 2),
                i -> substr(text, CAST(i AS INTEGER), length(p)) = p))
                AS cnt
            FROM documents, unnest($lits) AS t(p)
            WHERE doc_id IS NOT NULL AND text IS NOT NULL)
          SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_hits,
                 CAST(COUNT(*) FILTER (WHERE cnt > 0) AS BIGINT)
                   AS n_patterns
          FROM hits GROUP BY doc_id ORDER BY doc_id"""
    },
    // q_t39: the synthetic crawl page rebuilt literal-for-literal from
    // the same template, then the same rule chain — head/script/style
    // strip ('g' flag: Spark replaces all by default), the same
    // closing-tag split (string_split_regex keeps the trailing
    // fragment, matching Spark's limit=-1), per-block tag strip /
    // anchor-text extraction / stopword filter, the identical
    // integer-compare classification ladder, ORDER BY pos reassembly
    "q_t39_html_extract" ->
      """WITH pages AS (
          SELECT doc_id,
            '<html><head><title>Doc ' || doc_id ||
            '</title><style>body{margin:0}</style><script>var t=1;</script></head><body>'
            || '<nav><a href="/">Home</a> <a href="/news">News</a> <a href="/about">About</a> <a href="/contact">Contact</a> <a href="/archive">Archive</a> <a href="/subscribe">Subscribe</a></nav>'
            || '<div><a href="/subscribe">Subscribe</a> <a href="/signin">Sign in</a></div>'
            || array_to_string(list_transform(
                 range(0, CAST((len(string_split(text, ' ')) + 11) // 12
                          AS INTEGER)),
                 i -> '<p>' || array_to_string(string_split(text, ' ')
                        [CAST(i*12+1 AS INTEGER):CAST(i*12+12 AS INTEGER)],
                        ' ') || '</p>'), '')
            || '<div>Share: <a href="/t">Tweet</a> <a href="/f">Share</a> <a href="/l">Like</a> <a href="/fo">Follow</a> <a href="/p">Pin</a></div>'
            || '<footer>Copyright 2026 Example Corp <a href="/terms">Terms</a> <a href="/privacy">Privacy</a></footer></body></html>'
            AS html
          FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        cleaned AS (SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(html,
            '<head>.*?</head>', ' ', 'g'),
            '<script[^>]*>.*?</script>', ' ', 'g'),
            '<style[^>]*>.*?</style>', ' ', 'g') AS c
          FROM pages),
        arrs AS (SELECT doc_id,
            string_split_regex(c, '</(?:p|div|li|nav|footer|h1|h2|h3)>')
              AS arr
          FROM cleaned),
        blocks AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
            arr[CAST(i AS INTEGER)] AS block
          FROM arrs, unnest(range(1, len(arr) + 1)) AS t(i)),
        measured AS (SELECT doc_id, pos,
          trim(regexp_replace(regexp_replace(block,
            '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS btxt,
          length(array_to_string(regexp_extract_all(block,
            '<a [^>]*>([^<]*)</a>', 1), '')) AS link_chars
          FROM blocks),
        m2 AS (SELECT doc_id, pos, btxt, length(btxt) AS text_chars,
          link_chars, len(string_split(btxt, ' ')) AS n_words,
          len(list_filter(string_split(btxt, ' '),
            w -> list_contains(
              ['a','an','and','in','is','of','the','to'], w))) AS n_stop
          FROM measured),
        cls AS (SELECT doc_id, pos, btxt, text_chars,
          CASE WHEN text_chars < 25 THEN 'short'
               WHEN link_chars * 2 >= text_chars THEN 'link'
               WHEN n_stop * 20 < n_words AND text_chars < 200
                 THEN 'low_stop'
               ELSE 'content' END AS cls
          FROM m2),
        agg AS (SELECT doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_blocks,
          CAST(COUNT(*) FILTER (WHERE cls='short') AS BIGINT) AS n_short,
          CAST(COUNT(*) FILTER (WHERE cls='link') AS BIGINT) AS n_link,
          CAST(COUNT(*) FILTER (WHERE cls='low_stop') AS BIGINT)
            AS n_low_stop,
          CAST(COUNT(*) FILTER (WHERE cls='content') AS BIGINT)
            AS n_content,
          CAST(COALESCE(SUM(text_chars) FILTER (WHERE cls='content'), 0)
            AS BIGINT) AS content_chars,
          COALESCE(string_agg(btxt, chr(10) ORDER BY pos)
            FILTER (WHERE cls='content'), '') AS text
          FROM cls GROUP BY doc_id)
        SELECT doc_id, n_blocks, n_short, n_link, n_low_stop, n_content,
               content_chars, md5(text) AS extract_md5
        FROM agg ORDER BY doc_id""",
    // q_t37: same tokenizer, the frequency-of-frequencies counts and
    // two exact floor divisions
    "q_t37_good_turing" ->
      s"""WITH tk AS (SELECT source, unnest($duckToks) AS tok
              FROM documents
              WHERE text IS NOT NULL AND source IS NOT NULL),
          tf AS (SELECT source, tok, COUNT(*) AS n
                 FROM tk GROUP BY 1, 2),
          g AS (SELECT source,
                  CAST(SUM(n) AS BIGINT) AS n_tokens,
                  CAST(COUNT(*) AS BIGINT) AS v_types,
                  CAST(COUNT(*) FILTER (WHERE n = 1) AS BIGINT) AS n1,
                  CAST(COUNT(*) FILTER (WHERE n = 2) AS BIGINT) AS n2
                FROM tf GROUP BY source)
         SELECT source, n_tokens, v_types, n1, n2,
                CAST(n1 * 1000000 // n_tokens AS BIGINT) AS p_unseen_e6,
                CAST(n1 * 1000000 // v_types AS BIGINT) AS hapax_share_e6
         FROM g ORDER BY source""",
    // q_t36: char grams via correlated lateral unnests (order × start
    // position), whitespace stripped with the 'g' flag (DuckDB
    // replaces first-only by default; Spark replaces all), the same
    // exact Fβ floor division
    "q_t36_chrf" ->
      s"""WITH base AS (SELECT source, doc_id,
                regexp_replace(text, '\\s+', '', 'g') AS rs,
                regexp_replace(array_to_string(
                  list_filter($duckToks, (x, i) -> i % 4 != 0), ' '),
                  '\\s+', '', 'g') AS cs
              FROM documents
              WHERE text IS NOT NULL AND source IS NOT NULL
                AND doc_id IS NOT NULL AND doc_id < 1000),
          g AS (
            SELECT source, doc_id, CAST(o.n AS INTEGER) AS n,
                   substr(cs, CAST(p.i AS INTEGER), CAST(o.n AS INTEGER))
                     AS gram, 'c' AS side
            FROM base, unnest(range(1, 5)) o(n),
                 unnest(range(1, greatest(length(cs) - o.n + 1, 0) + 1))
                   p(i)
            UNION ALL
            SELECT source, doc_id, CAST(o.n AS INTEGER) AS n,
                   substr(rs, CAST(p.i AS INTEGER), CAST(o.n AS INTEGER))
                     AS gram, 'r' AS side
            FROM base, unnest(range(1, 5)) o(n),
                 unnest(range(1, greatest(length(rs) - o.n + 1, 0) + 1))
                   p(i)),
          pc AS (SELECT source, doc_id, n, gram,
                   COUNT(*) FILTER (WHERE side = 'c') AS c,
                   COUNT(*) FILTER (WHERE side = 'r') AS r
                 FROM g GROUP BY 1, 2, 3, 4),
          s AS (SELECT source AS grp, n,
                  CAST(SUM(LEAST(c, r)) AS BIGINT) AS m,
                  CAST(SUM(c) AS BIGINT) AS ct,
                  CAST(SUM(r) AS BIGINT) AS rt
                FROM pc GROUP BY 1, 2)
         SELECT grp, n, m, ct, rt,
                CASE WHEN ct + rt = 0 THEN NULL
                     ELSE 5 * m * 1000000 // (4 * rt + ct)
                END AS f2_e6
         FROM s ORDER BY grp, n""",
    // q_t35: the q_t34 gram CTEs, pooled per (source, n); P/R/F1 are
    // pure integer floor divisions (micro F1 = 2m/(ct+rt))
    "q_t35_rouge" ->
      s"""WITH base AS (SELECT source, doc_id, $duckToks AS rt,
                list_filter($duckToks, (x, i) -> i % 4 != 0) AS ct
              FROM documents
              WHERE text IS NOT NULL AND source IS NOT NULL
                AND doc_id IS NOT NULL),
          g AS (
            SELECT source, doc_id, 1 AS n, unnest(ct) AS gram, 'c' AS side
            FROM base
            UNION ALL
            SELECT source, doc_id, 2 AS n,
                   ct[CAST(i AS INTEGER)] || ' ' ||
                   ct[CAST(i + 1 AS INTEGER)] AS gram, 'c' AS side
            FROM base, unnest(range(1, len(ct))) AS t(i)
            UNION ALL
            SELECT source, doc_id, 1 AS n, unnest(rt) AS gram, 'r' AS side
            FROM base
            UNION ALL
            SELECT source, doc_id, 2 AS n,
                   rt[CAST(i AS INTEGER)] || ' ' ||
                   rt[CAST(i + 1 AS INTEGER)] AS gram, 'r' AS side
            FROM base, unnest(range(1, len(rt))) AS t(i)),
          pc AS (SELECT source, doc_id, n, gram,
                   COUNT(*) FILTER (WHERE side = 'c') AS c,
                   COUNT(*) FILTER (WHERE side = 'r') AS r
                 FROM g GROUP BY 1, 2, 3, 4),
          s AS (SELECT source AS grp, n,
                  CAST(SUM(LEAST(c, r)) AS BIGINT) AS m,
                  CAST(SUM(c) AS BIGINT) AS ct,
                  CAST(SUM(r) AS BIGINT) AS rt
                FROM pc GROUP BY 1, 2)
         SELECT grp, n, m, ct, rt,
                CASE WHEN ct = 0 THEN NULL
                     ELSE m * 1000000 // ct END AS p_e6,
                CASE WHEN rt = 0 THEN NULL
                     ELSE m * 1000000 // rt END AS r_e6,
                CASE WHEN ct + rt = 0 THEN NULL
                     ELSE 2 * m * 1000000 // (ct + rt) END AS f1_e6
         FROM s ORDER BY grp, n""",
    // q_t34: same tokenizer, candidate rebuilt with DuckDB's 1-BASED
    // indexed list_filter (engine uses 0-based i+1), bigrams via the
    // q_t27 list-index pattern, the exp/ln surface replayed inside the
    // identical floor
    "q_t34_bleu" ->
      s"""WITH base AS (SELECT source, doc_id, $duckToks AS rt,
                list_filter($duckToks, (x, i) -> i % 4 != 0) AS ct
              FROM documents
              WHERE text IS NOT NULL AND source IS NOT NULL
                AND doc_id IS NOT NULL),
          g AS (
            SELECT source, doc_id, 1 AS n, unnest(ct) AS gram, 'c' AS side
            FROM base
            UNION ALL
            SELECT source, doc_id, 2 AS n,
                   ct[CAST(i AS INTEGER)] || ' ' ||
                   ct[CAST(i + 1 AS INTEGER)] AS gram, 'c' AS side
            FROM base, unnest(range(1, len(ct))) AS t(i)
            UNION ALL
            SELECT source, doc_id, 1 AS n, unnest(rt) AS gram, 'r' AS side
            FROM base
            UNION ALL
            SELECT source, doc_id, 2 AS n,
                   rt[CAST(i AS INTEGER)] || ' ' ||
                   rt[CAST(i + 1 AS INTEGER)] AS gram, 'r' AS side
            FROM base, unnest(range(1, len(rt))) AS t(i)),
          pc AS (SELECT source, doc_id, n, gram,
                   COUNT(*) FILTER (WHERE side = 'c') AS c,
                   COUNT(*) FILTER (WHERE side = 'r') AS r
                 FROM g GROUP BY 1, 2, 3, 4),
          s AS (SELECT source AS grp,
                  CAST(COALESCE(SUM(c) FILTER (WHERE n = 1), 0)
                       AS BIGINT) AS c_len,
                  CAST(COALESCE(SUM(r) FILTER (WHERE n = 1), 0)
                       AS BIGINT) AS r_len,
                  CAST(COALESCE(SUM(LEAST(c, r)) FILTER (WHERE n = 1), 0)
                       AS BIGINT) AS match1,
                  CAST(COALESCE(SUM(c) FILTER (WHERE n = 1), 0)
                       AS BIGINT) AS total1,
                  CAST(COALESCE(SUM(LEAST(c, r)) FILTER (WHERE n = 2), 0)
                       AS BIGINT) AS match2,
                  CAST(COALESCE(SUM(c) FILTER (WHERE n = 2), 0)
                       AS BIGINT) AS total2
                FROM pc GROUP BY source)
         SELECT grp, c_len, r_len, match1, total1, match2, total2,
                CASE WHEN total1 = 0 OR total2 = 0
                       OR match1 = 0 OR match2 = 0 THEN 0
                     ELSE CAST(floor(exp(
                            LEAST(0.0, 1.0 - CAST(r_len AS DOUBLE)
                                             / CAST(c_len AS DOUBLE))
                            + 0.5 * (ln(CAST(match1 AS DOUBLE)
                                        / CAST(total1 AS DOUBLE))
                                   + ln(CAST(match2 AS DOUBLE)
                                        / CAST(total2 AS DOUBLE))))
                            * 1000000.0 + 0.5) AS BIGINT)
                END AS bleu_e6
         FROM s ORDER BY grp""",
    // q_t33: same tokenizer CTE, same window tie-break, the lns inside
    // the identical half-up floor, exact BIGINT moments, one round(…, 6)
    "q_t33_zipf_slope" ->
      s"""WITH tk AS (SELECT source, unnest($duckToks) AS tok
              FROM documents
              WHERE source IS NOT NULL AND text IS NOT NULL),
          tf AS (SELECT source, tok, COUNT(*) AS n
                 FROM tk GROUP BY 1, 2),
          rk AS (SELECT source, tok, n,
                   ROW_NUMBER() OVER (PARTITION BY source
                     ORDER BY n DESC, tok) AS r
                 FROM tf),
          q AS (SELECT source,
                  CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000 + 0.5)
                       AS BIGINT) AS x,
                  CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000 + 0.5)
                       AS BIGINT) AS y
                FROM rk WHERE r <= 100),
          m AS (SELECT source, COUNT(*) AS m,
                  CAST(SUM(x) AS BIGINT) AS sx,
                  CAST(SUM(y) AS BIGINT) AS sy,
                  CAST(SUM(x * y) AS BIGINT) AS sxy,
                  CAST(SUM(x * x) AS BIGINT) AS sxx
                FROM q GROUP BY source)
         SELECT source, m AS n_ranks,
                CASE WHEN m * sxx - sx * sx = 0 THEN NULL
                     ELSE round(CAST(m * sxy - sx * sy AS DOUBLE) /
                                CAST(m * sxx - sx * sx AS DOUBLE), 6)
                END AS slope6
         FROM m ORDER BY source""",
    // q_t32: suffixes built via chr() so the oracle file stays pure
    // ASCII — chr(233)=U+00E9 precomposed, chr(769)=U+0301 combining;
    // DuckDB's nfc_normalize implements the same UAX #15 the engine's
    // graft_nfc (JDK Normalizer) does, md5 hashes the UTF-8 bytes in
    // both engines
    "q_t32_nfc_dedup" ->
      """WITH d AS (SELECT source, text FROM documents
              WHERE text IS NOT NULL AND source IS NOT NULL),
          v AS (SELECT source, text || ' caf' || chr(233) AS t FROM d
                UNION ALL
                SELECT source, text || ' cafe' || chr(769) AS t FROM d),
          f AS (SELECT source AS grp, md5(t) AS raw_fp,
                       md5(nfc_normalize(t)) AS nfc_fp
                FROM v)
         SELECT grp, COUNT(*) AS n_rows,
                COUNT(DISTINCT raw_fp) AS raw_distinct,
                COUNT(DISTINCT nfc_fp) AS nfc_distinct,
                COUNT(DISTINCT raw_fp) - COUNT(DISTINCT nfc_fp) AS merged
         FROM f GROUP BY grp ORDER BY grp""",
    "q_t31_luhn_audit" ->
      """WITH d AS (SELECT doc_id, COALESCE(text, '')
              || CASE WHEN doc_id % 3 = 0
                 THEN ' card 4111111111111111 ok' ELSE '' END
              || CASE WHEN doc_id % 4 = 0
                 THEN ' typo 4111111111111112 bad' ELSE '' END
              || CASE WHEN doc_id % 5 = 0
                 THEN ' amex 378282246310005 fine' ELSE '' END AS text
            FROM documents WHERE doc_id < 200),
          c AS (SELECT doc_id,
                  unnest(regexp_extract_all(text, '[0-9]{13,19}')) AS s
                FROM d),
          v AS (SELECT doc_id,
                  CASE WHEN CAST(list_sum(list_transform(
                      range(1, length(s) + 1), i ->
                      CASE WHEN i % 2 = 0 THEN
                        CASE WHEN 2 * (ascii(substr(s,
                              CAST(length(s) - i + 1 AS INTEGER), 1)) - 48) > 9
                             THEN 2 * (ascii(substr(s,
                                  CAST(length(s) - i + 1 AS INTEGER), 1)) - 48)
                                  - 9
                             ELSE 2 * (ascii(substr(s,
                                  CAST(length(s) - i + 1 AS INTEGER), 1)) - 48)
                        END
                      ELSE ascii(substr(s,
                             CAST(length(s) - i + 1 AS INTEGER), 1)) - 48
                      END)) AS BIGINT) % 10 = 0
                  THEN 1 ELSE 0 END AS ok
                FROM c),
          a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_digit_runs,
                       CAST(SUM(ok) AS BIGINT) AS n_valid_cards
                FROM v GROUP BY doc_id)
         SELECT d.doc_id,
                COALESCE(a.n_digit_runs, 0) AS n_digit_runs,
                COALESCE(a.n_valid_cards, 0) AS n_valid_cards
         FROM d LEFT JOIN a USING (doc_id) ORDER BY doc_id""",
    // q_t40: retrains the identical trigram-KN chain — trigram types,
    // (w1,w2) contexts, the (w2,w3) CONTINUATION table and its w2
    // totals, the L93 bigram-type continuation unigram — and scores
    // with the same nested CASE fallthrough and fixed fp order
    "q_t40_kn3_perplexity" ->
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
          tgAll AS (SELECT doc_id,
                         struct_extract(s, 'w1') AS w1,
                         struct_extract(s, 'w2') AS w2,
                         struct_extract(s, 'w3') AS w3
                  FROM (SELECT doc_id,
                               unnest(list_transform(range(1, len(tk) - 1),
                                 i -> {'w1': tk[i], 'w2': tk[i+1],
                                       'w3': tk[i+2]})) AS s
                        FROM toks WHERE len(tk) >= 3)),
          tgRef AS (SELECT * FROM tgAll WHERE doc_id % 2 = 0),
          c3t AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c3
                  FROM tgRef GROUP BY w1, w2, w3),
          ctx3 AS (SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c12,
                          CAST(COUNT(*) AS BIGINT) AS n1p12
                   FROM c3t GROUP BY w1, w2),
          ck23 AS (SELECT w2, w3, CAST(COUNT(*) AS BIGINT) AS ck
                   FROM c3t GROUP BY w2, w3),
          ctx2 AS (SELECT w2, CAST(SUM(ck) AS BIGINT) AS cks,
                          CAST(COUNT(*) AS BIGINT) AS n1p2
                   FROM ck23 GROUP BY w2),
          bgRef AS (SELECT doc_id,
                         struct_extract(s, 'w1') AS w1,
                         struct_extract(s, 'w2') AS w2
                  FROM (SELECT doc_id,
                               unnest(list_transform(range(1, len(tk)),
                                 i -> {'w1': tk[i], 'w2': tk[i+1]})) AS s
                        FROM toks
                        WHERE len(tk) >= 2 AND doc_id % 2 = 0)),
          c2t AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
                  FROM bgRef GROUP BY w1, w2),
          cont AS (SELECT w2 AS w3, CAST(COUNT(*) AS BIGINT) AS n1c
                   FROM c2t GROUP BY w2),
          st AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c2t) AS t,
                        (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT)
                         FROM (SELECT unnest(tk) AS tok FROM toks
                               WHERE doc_id % 2 = 0)) AS v),
          sc AS (SELECT g.doc_id,
                   CAST(floor(ln(
                     CASE WHEN ctx3.c12 IS NULL THEN
                       CASE WHEN ctx2.cks IS NULL
                         THEN (COALESCE(cont.n1c, 0) + 1.0)
                              / (st.t + st.v)
                         ELSE (GREATEST(COALESCE(ck23.ck, 0)
                                 - CAST(0.75 AS DOUBLE), 0.0)
                               + CAST(0.75 AS DOUBLE) * ctx2.n1p2 *
                                 ((COALESCE(cont.n1c, 0) + 1.0)
                                  / (st.t + st.v))) / ctx2.cks
                       END
                     ELSE (GREATEST(COALESCE(c3t.c3, 0)
                             - CAST(0.75 AS DOUBLE), 0.0)
                           + CAST(0.75 AS DOUBLE) * ctx3.n1p12 *
                             (CASE WHEN ctx2.cks IS NULL
                               THEN (COALESCE(cont.n1c, 0) + 1.0)
                                    / (st.t + st.v)
                               ELSE (GREATEST(COALESCE(ck23.ck, 0)
                                       - CAST(0.75 AS DOUBLE), 0.0)
                                     + CAST(0.75 AS DOUBLE) * ctx2.n1p2 *
                                       ((COALESCE(cont.n1c, 0) + 1.0)
                                        / (st.t + st.v))) / ctx2.cks
                             END)) / ctx3.c12
                     END) * -10000.0 + 0.5) AS BIGINT) AS nll
                 FROM tgAll g
                 LEFT JOIN c3t ON g.w1 = c3t.w1 AND g.w2 = c3t.w2
                               AND g.w3 = c3t.w3
                 LEFT JOIN ctx3 ON g.w1 = ctx3.w1 AND g.w2 = ctx3.w2
                 LEFT JOIN ck23 ON g.w2 = ck23.w2 AND g.w3 = ck23.w3
                 LEFT JOIN ctx2 ON g.w2 = ctx2.w2
                 LEFT JOIN cont ON g.w3 = cont.w3
                 CROSS JOIN st),
          agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
                         CAST(SUM(nll) AS BIGINT) AS nll_e4
                  FROM sc GROUP BY doc_id)
         SELECT d.doc_id,
                COALESCE(agg.n_trigrams, 0) AS n_trigrams,
                COALESCE(agg.nll_e4, 0) AS nll_e4,
                CASE WHEN agg.n_trigrams > 0 THEN
                  CAST(floor(exp(agg.nll_e4::DOUBLE / 10000.0
                    / agg.n_trigrams) * 1000.0 + 0.5) AS BIGINT)
                END AS ppl_milli
         FROM documents d LEFT JOIN agg USING (doc_id)
         ORDER BY doc_id""",
    // q_t30: retrains the identical interpolated-KN model from the
    // even-doc_id half — all model quantities exact integers off the
    // (w1, w2) type table; the per-position float pipeline is the same
    // fixed operation order as the engine (0.75 cast to DOUBLE — a bare
    // DuckDB decimal literal would compute in DECIMAL, not IEEE), one
    // half-up 1e-4 floor per position, BIGINT downstream
    "q_t30_kn_perplexity" ->
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
          bgAll AS (SELECT doc_id,
                         struct_extract(s, 'w1') AS w1,
                         struct_extract(s, 'w2') AS w2
                  FROM (SELECT doc_id,
                               unnest(list_transform(range(1, len(tk)),
                                 i -> {'w1': tk[i], 'w2': tk[i+1]})) AS s
                        FROM toks WHERE len(tk) >= 2)),
          bgRef AS (SELECT * FROM bgAll WHERE doc_id % 2 = 0),
          c2t AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
                  FROM bgRef GROUP BY w1, w2),
          ctx AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
                         CAST(COUNT(*) AS BIGINT) AS n1p
                  FROM c2t GROUP BY w1),
          cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1c
                   FROM c2t GROUP BY w2),
          st AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c2t) AS t,
                        (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT)
                         FROM (SELECT unnest(tk) AS tok FROM toks
                               WHERE doc_id % 2 = 0)) AS v),
          sc AS (SELECT b.doc_id,
                   CAST(floor(ln(CASE WHEN ctx.c1 IS NULL
                       THEN (COALESCE(cont.n1c, 0) + 1.0) / (st.t + st.v)
                       ELSE (GREATEST(COALESCE(c2t.c2, 0)
                               - CAST(0.75 AS DOUBLE), 0.0)
                             + CAST(0.75 AS DOUBLE) * ctx.n1p *
                               ((COALESCE(cont.n1c, 0) + 1.0)
                                / (st.t + st.v))) / ctx.c1
                       END) * -10000.0 + 0.5) AS BIGINT) AS nll
                 FROM bgAll b
                 LEFT JOIN c2t ON b.w1 = c2t.w1 AND b.w2 = c2t.w2
                 LEFT JOIN ctx ON b.w1 = ctx.w1
                 LEFT JOIN cont ON b.w2 = cont.w2
                 CROSS JOIN st),
          agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                         CAST(SUM(nll) AS BIGINT) AS nll_e4
                  FROM sc GROUP BY doc_id)
         SELECT d.doc_id,
                COALESCE(agg.n_bigrams, 0) AS n_bigrams,
                COALESCE(agg.nll_e4, 0) AS nll_e4,
                CASE WHEN agg.n_bigrams > 0 THEN
                  CAST(floor(exp(agg.nll_e4::DOUBLE / 10000.0
                    / agg.n_bigrams) * 1000.0 + 0.5) AS BIGINT)
                END AS ppl_milli
         FROM documents d LEFT JOIN agg USING (doc_id)
         ORDER BY doc_id""",
    // q_t17: terciles of the SAME per-doc integer perplexity; boundary
    // values are exact rank floor(p*(n-1)) picks over the scoreable docs
    // (matching MedianImpute.exactQuantiles), labeling is a plain
    // comparison — all-integer inputs, so no float boundary mass at all
    "q_t17_ccnet_buckets" ->
      s"""WITH $duckLmPerplexity,
          pr AS (SELECT CAST(ppl_milli AS DOUBLE) AS x,
                        ROW_NUMBER() OVER (ORDER BY ppl_milli) - 1 AS rk,
                        COUNT(*) OVER () AS n
                 FROM ppl WHERE ppl_milli IS NOT NULL),
          b AS (SELECT
                  MAX(CASE WHEN rk = CAST(FLOOR((1.0/3) * (n - 1)) AS BIGINT)
                      THEN x END) AS b1,
                  MAX(CASE WHEN rk = CAST(FLOOR((2.0/3) * (n - 1)) AS BIGINT)
                      THEN x END) AS b2
                FROM pr)
          SELECT p.doc_id, p.ppl_milli,
                 CASE WHEN p.ppl_milli IS NULL THEN 'unscored'
                      WHEN p.ppl_milli <= b.b1 THEN 'head'
                      WHEN p.ppl_milli <= b.b2 THEN 'middle'
                      ELSE 'tail' END AS bucket
          FROM ppl p CROSS JOIN b ORDER BY doc_id""",
    "q_t14_char_entropy" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
          ch AS (SELECT doc_id, ROUND(entropy(c), 6) AS char_entropy
                 FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
                       FROM d)
                 GROUP BY doc_id)
         SELECT d.doc_id, COALESCE(ch.char_entropy, 0.0) AS char_entropy
         FROM d LEFT JOIN ch USING (doc_id) ORDER BY doc_id""",
    "q_t13_bpe_tokens" ->
      // same 1000-merge table, replayed as boundary-safe REPLACEs over
      // the "(c) (c) …" wrapped word form (see Bpe scaladoc for why one
      // global pass per rank-ordered pair is exact BPE) — STAGED into
      // 100-merge CTEs (Bpe.oracleCtes) to stay under DuckDB's 128-deep
      // expression-nesting cap; empty docs keep a 0 via the LEFT JOIN
      {
        val (ctes, last) = Bpe.oracleCtes("w2", "word", Bpe.Merges1k)
        s"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
          w AS (SELECT doc_id,
                  unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
                FROM d),
          w2 AS (SELECT doc_id, word FROM w WHERE word <> ''),
          $ctes,
          cnt AS (SELECT doc_id,
                    CAST(SUM(len(string_split(t, ' '))) AS BIGINT) AS n
                  FROM $last GROUP BY doc_id)
         SELECT d.doc_id, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS bpe_tokens
         FROM d LEFT JOIN cnt USING (doc_id) ORDER BY doc_id"""
      },
    // q_t27: positional pair extraction via range() (1-indexed lists),
    // same count-desc/token tie-break rank
    "q_t27_lm_export" ->
      s"""WITH tk AS (SELECT $duckToks AS tk FROM documents),
          bg AS (SELECT tk[CAST(i AS INTEGER)] AS ctx,
                   tk[CAST(i + 1 AS INTEGER)] AS nxt
                 FROM tk, unnest(range(1, len(tk))) AS t(i)),
          c AS (SELECT ctx, nxt, COUNT(*) AS n FROM bg GROUP BY ctx, nxt),
          r AS (SELECT ctx, nxt, n,
                  ROW_NUMBER() OVER (PARTITION BY ctx
                    ORDER BY n DESC, nxt) AS rank
                FROM c)
         SELECT ctx, rank, nxt, n FROM r WHERE rank <= 3
         ORDER BY ctx, rank""",
    // q_t26 (L74): the same fixed rule chain replayed —
    // strpos/substr/list_sort/list_filter are the DuckDB twins of
    // instr/substr/sort_array/filter
    "q_t26_url_canonical" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
          u AS (SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0 THEN
                    'HTTPS://Example' || (doc_id % 20) || '.COM/p/' ||
                    (doc_id % 50) || '?utm_source=x&b=2&a=1#frag'
                  ELSE
                    'https://example' || (doc_id % 20) || '.com/p/' ||
                    (doc_id % 50) || '?a=1&b=2' END AS raw
                FROM d),
          n1 AS (SELECT doc_id, regexp_replace(raw, '#.*$', '') AS nf
                 FROM u),
          n2 AS (SELECT doc_id,
                   CASE WHEN strpos(nf, '?') = 0 THEN nf
                        ELSE substr(nf, 1, strpos(nf, '?') - 1) END AS base,
                   CASE WHEN strpos(nf, '?') = 0 THEN ''
                        ELSE substr(nf, strpos(nf, '?') + 1) END AS q
                 FROM n1),
          n3 AS (SELECT doc_id,
                   lower(regexp_extract(base,
                     '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1)) ||
                     substr(base, length(regexp_extract(base,
                       '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1)) + 1)
                     AS cb,
                   list_sort(list_filter(string_split(q, '&'),
                     p -> NOT regexp_matches(p, '^(utm_|fbclid=)')
                          AND p <> '')) AS ps
                 FROM n2),
          urls AS (SELECT doc_id,
                     cb || CASE WHEN len(ps) > 0
                           THEN '?' || array_to_string(ps, '&')
                           ELSE '' END AS url
                   FROM n3)
         SELECT url, COUNT(*) AS n, MIN(doc_id) AS keeper
         FROM urls GROUP BY url ORDER BY url""",
    // q_t25 (L73): rank replay (same DESC-count, token tie-break),
    // positional re-index via range() (lists are 1-indexed), OOV -1,
    // ordered list() rebuild — empty docs md5 the empty string
    "q_t25_vocab_encode" ->
      s"""WITH tk AS (SELECT unnest($duckToks) AS token FROM documents),
          cnt AS (SELECT token, COUNT(*) AS n FROM tk GROUP BY token
                  HAVING COUNT(*) >= 2),
          v AS (SELECT token,
                  ROW_NUMBER() OVER (ORDER BY n DESC, token) - 1 AS id
                FROM cnt),
          d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
          p AS (SELECT doc_id, i AS pos,
                  ($duckToks)[CAST(i + 1 AS INTEGER)] AS token
                FROM d, unnest(range(0, len($duckToks))) AS t(i)),
          e AS (SELECT p.doc_id, p.pos, COALESCE(v.id, -1) AS tid
                FROM p LEFT JOIN v USING (token)),
          enc AS (SELECT doc_id,
                    array_to_string(
                      list(CAST(tid AS VARCHAR) ORDER BY pos), ' ') AS s,
                    COUNT(*) AS n_toks,
                    SUM(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS n_oov
                  FROM e GROUP BY doc_id)
         SELECT d.doc_id,
                CAST(COALESCE(enc.n_toks, 0) AS INTEGER) AS n_tokens,
                CAST(COALESCE(enc.n_oov, 0) AS INTEGER) AS n_oov,
                md5(COALESCE(enc.s, '')) AS ids_md5
         FROM d LEFT JOIN enc USING (doc_id) ORDER BY doc_id""",
    // q_t24 (L70): same tf/f/A replay; the DISTINCT subquery (not
    // COUNT(DISTINCT)) keeps a null class counted like Spark's groupBy
    "q_t24_cluster_terms" ->
      s"""WITH tk AS (SELECT source AS cls, unnest($duckToks) AS term
                      FROM documents),
          tf AS (SELECT cls, term, COUNT(*) AS tf FROM tk
                 GROUP BY cls, term),
          ft AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS f FROM tf
                 GROUP BY term),
          st AS (SELECT CAST(SUM(tf) AS DOUBLE) /
                   (SELECT COUNT(*) FROM (SELECT DISTINCT cls FROM tf))
                   AS a
                 FROM tf),
          sc AS (SELECT cls, term, tf,
                   tf * CAST(FLOOR(ln(1 + (SELECT a FROM st) / f) * 10000
                     + 0.5) AS BIGINT) AS score_e4
                 FROM tf JOIN ft USING (term)),
          r AS (SELECT cls, term, tf, score_e4,
                  ROW_NUMBER() OVER (PARTITION BY cls
                    ORDER BY score_e4 DESC, term) AS rank
                FROM sc)
         SELECT cls AS source, term, tf, score_e4, rank FROM r
         WHERE rank <= 5 ORDER BY source, rank""",
    // q_j10 (L69): exhaustive quadratic ground truth — affordable at
    // the gate scale; the engine side is the blocked linear-ish path
    "q_j10_fuzzy_match" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
         FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
         WHERE levenshtein(a.c_name, b.c_name) <= 1
         ORDER BY id_a, id_b""",
    // q_a2x/q_a2y: the oracle recomputes the exact counts and expects
    // the engine's sketch to have declared itself inside the bound
    "q_a2x_approx_distinct" ->
      """SELECT COUNT(DISTINCT o_custkey) AS exact_u, 1 AS err_ok
         FROM orders""",
    "q_a2y_approx_distinct_grouped" ->
      """SELECT o_orderpriority,
                COUNT(DISTINCT o_custkey) AS exact_u, 1 AS err_ok
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // q_j11: exhaustive cross join over the normalized key space
    // q_j13: the unrolled-EM replay is GENERATED from the same
    // (fields=3, rounds=8) by RecordLinkage.oracleCtes; custkeys are
    // positive so % matches the engine's pmod
    "q_j13_record_linkage" ->
      s"""WITH c AS (SELECT c_custkey AS k, c_nationkey AS nat,
                c_custkey % 5 AS blk, c_mktsegment AS seg,
                CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal,
                substr(c_name, length(c_name), 1) AS lc
              FROM customer
              WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL
                AND c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
                AND c_name IS NOT NULL),
          pr AS MATERIALIZED (SELECT
                CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS g1,
                CASE WHEN a.bal = b.bal THEN 1 ELSE 0 END AS g2,
                CASE WHEN a.lc = b.lc THEN 1 ELSE 0 END AS g3
              FROM c a JOIN c b
                ON a.nat = b.nat AND a.blk = b.blk AND a.k < b.k),
          ${RecordLinkage.oracleCtes(fields = 3, rounds = 8)}""",
    "q_j11_fuzzy_link" ->
      """SELECT c.c_custkey AS left_id, s.s_suppkey AS right_id,
                CAST(levenshtein(
                  regexp_replace(c.c_name, '^Customer#', 'E#'),
                  regexp_replace(s.s_name, '^Supplier#', 'E#'))
                  AS INTEGER) AS dist
         FROM customer c, supplier s
         WHERE levenshtein(
                 regexp_replace(c.c_name, '^Customer#', 'E#'),
                 regexp_replace(s.s_name, '^Supplier#', 'E#')) <= 1
         ORDER BY left_id, right_id""",
    // q_e16 (L68): per-event window-index expansion replayed with
    // range(). DuckDB `//` TRUNCATES toward zero on integers (the q_v7
    // oracle trap), while the engine's TimeWindows.hopping floors via
    // pmod — so both floors are built truncation-safely by subtracting
    // the POSITIVE remainder before dividing the exact multiple
    // (pre-epoch timestamps would otherwise drift one window).
    "q_e16_hopping_window" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS t, value
            FROM events WHERE ts IS NOT NULL),
          f AS (SELECT event_type, value,
                  (t - ((t % 900000000 + 900000000) % 900000000))
                    // 900000000 AS hi,
                  ((t - 1800000000) -
                   (((t - 1800000000) % 900000000 + 900000000)
                    % 900000000)) // 900000000 AS lo
                FROM e),
          x AS (SELECT event_type, value,
                  unnest(range(lo + 1, hi + 1)) AS k
                FROM f)
         SELECT event_type, k * 900000000 AS window_start_us,
                COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_v
         FROM x GROUP BY event_type, k
         ORDER BY event_type, window_start_us""",
    // q_t23: q_t13's staged REPLACE chain, aggregated per language with
    // the whitespace-token denominator and an integral ppm ratio
    "q_t23_fertility" ->
      {
        val (ctes, last) = Bpe.oracleCtes("w2", "word", Bpe.Merges1k)
        s"""WITH d AS (SELECT doc_id, lang, text FROM documents
                       WHERE doc_id < 50),
          w AS (SELECT doc_id,
                  unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
                FROM d),
          w2 AS (SELECT doc_id, word FROM w WHERE word <> ''),
          $ctes,
          cnt AS (SELECT doc_id,
                    CAST(SUM(len(string_split(t, ' '))) AS BIGINT) AS n
                  FROM $last GROUP BY doc_id),
          ws AS (SELECT doc_id, len($duckToks) AS nws FROM d),
          g AS (SELECT d.lang,
                  CAST(SUM(ws.nws) AS BIGINT) AS ws_tokens,
                  CAST(SUM(COALESCE(cnt.n, 0)) AS BIGINT) AS bpe_tokens
                FROM d JOIN ws USING (doc_id) LEFT JOIN cnt USING (doc_id)
                GROUP BY d.lang)
         SELECT lang, ws_tokens, bpe_tokens,
                CAST(CASE WHEN ws_tokens = 0 THEN 0
                     ELSE bpe_tokens * 1000000 // ws_tokens END AS BIGINT)
                  AS fertility_e6
         FROM g ORDER BY lang"""
      },
    "q_e5_shuffle_shard" ->
      // shard = range-bucket of the first 16 hash bits: ('0x'||hex)::INT
      // here, conv(hex,16,10) engine-side — same integer, same floor
      """WITH s AS (SELECT doc_id,
              md5('42:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
          b AS (SELECT doc_id, h,
              CAST(FLOOR(('0x' || substr(h, 1, 4))::INT * 8 / 65536.0)
                   AS INT) AS shard FROM s),
          r AS (SELECT shard, doc_id,
              ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rk
            FROM b)
         SELECT shard, COUNT(*) AS n,
                CAST(SUM(doc_id * rk) AS BIGINT) AS perm_sum
         FROM r GROUP BY shard ORDER BY shard""",
    "q_e6_source_cap" ->
      // 'cap:' domain prefix — decorrelates the cap's ranking hash from
      // hexBucket's split/sample hash (same constant the engine uses)
      """WITH r AS (SELECT source, doc_id,
              ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM documents)
         SELECT source, COUNT(*) AS n_kept,
                CAST(SUM(doc_id) AS BIGINT) AS kept_sum,
                MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         FROM r WHERE rk <= 15 GROUP BY source ORDER BY source""",
    "q_v5_quantize_int8" ->
      """WITH v AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
          s AS (SELECT vec_id, v,
              list_max(list_transform(v, x -> abs(x))) / 127 AS scale FROM v),
          q AS (SELECT vec_id, v, scale,
              CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
                   ELSE list_transform(v,
                     x -> CAST(floor(x / scale + 0.5) AS INTEGER))
              END AS qv
            FROM s)
         SELECT vec_id, round(scale, 6) AS scale6,
                CAST(list_sum(list_transform(qv, q -> abs(q))) AS BIGINT) AS q_l1,
                round(list_sum(list_transform(range(1, len(v) + 1),
                    i -> pow(v[i] - qv[i] * scale, 2))) / len(v), 9) AS mse
         FROM q ORDER BY vec_id""",
    "q_t8_repetition" ->
      s"""WITH t AS (SELECT doc_id, unnest($duckToks) AS w FROM documents),
             c AS (SELECT doc_id, w, COUNT(*) AS c FROM t GROUP BY 1, 2)
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
                 COUNT(*) AS n_unique,
                 round(MAX(c) * 1.0 / SUM(c), 6) AS top_word_ratio,
                 round(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) * 1.0 / SUM(c),
                       6) AS dup_word_ratio
          FROM c GROUP BY doc_id ORDER BY doc_id""",
    "q_t7_pii_scrub" -> {
      val em = graft.functions.TextAnalysis.EmailPattern
      val url = graft.functions.TextAnalysis.UrlPattern
      s"""WITH w AS (SELECT doc_id,
              text || CASE WHEN doc_id % 3 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                        ELSE '' END
                   || CASE WHEN doc_id % 5 = 0
                        THEN ' see https://example.com/d/' || CAST(doc_id AS VARCHAR) || ' next'
                        ELSE '' END AS t
            FROM documents)
          SELECT doc_id,
                 CAST(len(regexp_extract_all(
                   regexp_replace(t, '$url', '<URL>', 'g'), '$em'))
                   AS INTEGER) AS n_emails,
                 CAST(len(regexp_extract_all(t, '$url')) AS INTEGER) AS n_urls,
                 md5(regexp_replace(regexp_replace(t, '$url', '<URL>', 'g'),
                     '$em', '<EMAIL>', 'g')) AS scrubbed_md5,
                 CAST(length(t) -
                      length(regexp_replace(regexp_replace(t, '$url', '<URL>', 'g'),
                             '$em', '<EMAIL>', 'g')) AS INTEGER) AS chars_removed
          FROM w ORDER BY doc_id"""
    },
    "q_t9_decontaminate" -> duckDecontaminate,
    // q_qr3: replays the same derived snapshots and the same md5
    // fingerprint compare; FULL OUTER + CASE mirrors the engine's
    // status derivation token-for-token
    "q_qr3_corpus_diff" ->
      // '' sentinel for null content mirrors the engine's empty-binary
      // coalesce: equal-md5 compare ≡ equal-bytes compare, and presence
      // rides the join, not the fingerprint's nullness
      """WITH oldS AS (SELECT doc_id, COALESCE(md5(text), '') AS f
              FROM documents WHERE doc_id % 7 <> 0),
          newS AS (SELECT doc_id,
                COALESCE(md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2'
                         ELSE text END), '') AS f
              FROM documents WHERE doc_id % 5 <> 0),
          j AS (SELECT COALESCE(oldS.doc_id, newS.doc_id) AS doc_id,
                  CASE WHEN oldS.f IS NULL THEN 'added'
                       WHEN newS.f IS NULL THEN 'removed'
                       WHEN oldS.f = newS.f THEN 'unchanged'
                       ELSE 'changed' END AS status
                FROM oldS FULL OUTER JOIN newS ON oldS.doc_id = newS.doc_id)
         SELECT status, COUNT(*) AS n,
                CAST(CAST(SUM(doc_id) AS DECIMAL(38,0)) AS VARCHAR) AS id_sum
         FROM j GROUP BY status ORDER BY status""",
    // q_g1: 5 unrolled PR steps — the recurrence is all BIGINT floor
    // division, so the replay is digit-exact, no quantization caveat
    "q_g1_pagerank" -> pagerankOracle,
    // q_g3 (graph family): the unrolled peel chain is GENERATED from
    // the same (k, rounds) by KCore.oracleCtes — engine and oracle
    // cannot drift on the round count
    "q_g3_kcore" ->
      s"""WITH b AS MATERIALIZED (SELECT DISTINCT event_type,
                epoch_us(ts) // 60000000 AS m, user_id
            FROM events
            WHERE event_type IS NOT NULL AND ts IS NOT NULL
              AND user_id IS NOT NULL),
          e0 AS MATERIALIZED (SELECT DISTINCT
                  least(x.user_id, y.user_id) AS a,
                  greatest(x.user_id, y.user_id) AS b
                FROM b x JOIN b y
                  ON x.event_type = y.event_type AND x.m = y.m
                 AND x.user_id < y.user_id),
          ${KCore.oracleCtes(k = 2, rounds = 8)}""",
    // q_g5 (graph family): the unrolled plurality-update chain is
    // GENERATED from the same rounds by LabelProp.oracleCtes
    "q_g5_label_prop" ->
      s"""WITH b AS MATERIALIZED (SELECT DISTINCT event_type,
                epoch_us(ts) // 60000000 AS m, user_id
            FROM events
            WHERE event_type IS NOT NULL AND ts IS NOT NULL
              AND user_id IS NOT NULL),
          e0 AS MATERIALIZED (SELECT DISTINCT
                  least(x.user_id, y.user_id) AS a,
                  greatest(x.user_id, y.user_id) AS b
                FROM b x JOIN b y
                  ON x.event_type = y.event_type AND x.m = y.m
                 AND x.user_id < y.user_id),
          ${LabelProp.oracleCtes(rounds = 4)}""",
    // q_g4: same co-activity edges + a13's moment replay on degrees
    // q_g6 (graph family): the wedge replay — same co-activity edges,
    // degree weights quantized inside the identical half-up floor, the
    // non-adjacency via NOT EXISTS, the same total ORDER BY + LIMIT
    "q_g6_link_predict" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT event_type,
                epoch_us(ts) // 300000000 AS m, user_id
            FROM events
            WHERE event_type IS NOT NULL AND ts IS NOT NULL
              AND user_id IS NOT NULL),
          e0 AS MATERIALIZED (SELECT DISTINCT
                  least(x.user_id, y.user_id) AS a,
                  greatest(x.user_id, y.user_id) AS b
                FROM b x JOIN b y
                  ON x.event_type = y.event_type AND x.m = y.m
                 AND x.user_id < y.user_id),
          adj AS MATERIALIZED (SELECT a AS z, b AS u FROM e0
                UNION ALL SELECT b AS z, a AS u FROM e0),
          deg AS (SELECT z,
                    CAST(floor(1000000.0 / ln(CAST(COUNT(*) AS DOUBLE))
                               + 0.5) AS BIGINT) AS w_e6
                  FROM adj GROUP BY z HAVING COUNT(*) > 1),
          w AS (SELECT p.u AS a, q.u AS b, p.z
                FROM adj p JOIN adj q ON p.z = q.z AND p.u < q.u),
          nw AS (SELECT w.a, w.b, w.z FROM w
                 WHERE NOT EXISTS (SELECT 1 FROM e0
                                   WHERE e0.a = w.a AND e0.b = w.b)),
          sc AS (SELECT nw.a, nw.b, COUNT(*) AS cn,
                   CAST(SUM(deg.w_e6) AS BIGINT) AS aa_e6
                 FROM nw JOIN deg ON nw.z = deg.z
                 GROUP BY nw.a, nw.b)
         SELECT a, b, cn, aa_e6 FROM sc
         ORDER BY aa_e6 DESC, cn DESC, a, b LIMIT 100""",
    "q_g4_assortativity" ->
      """WITH b AS (SELECT DISTINCT event_type,
                epoch_us(ts) // 60000000 AS m, user_id
            FROM events
            WHERE event_type IS NOT NULL AND ts IS NOT NULL
              AND user_id IS NOT NULL),
          e0 AS (SELECT DISTINCT least(x.user_id, y.user_id) AS a,
                    greatest(x.user_id, y.user_id) AS b
                 FROM b x JOIN b y
                   ON x.event_type = y.event_type AND x.m = y.m
                  AND x.user_id < y.user_id),
          deg AS (SELECT v, COUNT(*) AS d
                  FROM (SELECT a AS v FROM e0
                        UNION ALL SELECT b AS v FROM e0)
                  GROUP BY v),
          k AS (SELECT da.d AS dx, db.d AS dy
                FROM e0 JOIN deg da ON e0.a = da.v
                        JOIN deg db ON e0.b = db.v),
          s AS (SELECT dx AS x, dy AS y FROM k
                UNION ALL SELECT dy, dx FROM k),
          m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                  SUM(x * x) AS sxx, SUM(y * y) AS syy,
                  SUM(x * y) AS sxy
                FROM s)
         SELECT CAST(n // 2 AS BIGINT) AS n_edges,
                ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
                      sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) /
                      sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 6)
                  AS assortativity6
         FROM m""",
    // q_g2 (L67): exhaustive canonical-order 3-way join over the same
    // co-activity edges; gcc in integral arithmetic on both engines
    "q_g2_triangles" ->
      """WITH b AS (SELECT DISTINCT event_type,
                epoch_us(ts) // 60000000 AS m, user_id
            FROM events
            WHERE event_type IS NOT NULL AND ts IS NOT NULL
              AND user_id IS NOT NULL),
          e0 AS (SELECT DISTINCT least(x.user_id, y.user_id) AS a,
                    greatest(x.user_id, y.user_id) AS b
                 FROM b x JOIN b y
                   ON x.event_type = y.event_type AND x.m = y.m
                  AND x.user_id < y.user_id),
          deg AS (SELECT v, COUNT(*) AS d
                  FROM (SELECT a AS v FROM e0
                        UNION ALL SELECT b AS v FROM e0)
                  GROUP BY v),
          tri AS (SELECT COUNT(*) AS t FROM e0 e1
                  JOIN e0 e2 ON e2.a = e1.b
                  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b),
          wdg AS (SELECT CAST(COALESCE(SUM(d * (d - 1) // 2), 0)
                    AS BIGINT) AS w
                  FROM deg)
         SELECT (SELECT COUNT(*) FROM deg) AS n_vertices,
                (SELECT COUNT(*) FROM e0) AS n_edges,
                (SELECT w FROM wdg) AS n_wedges,
                (SELECT t FROM tri) AS n_triangles,
                CAST(CASE WHEN (SELECT w FROM wdg) = 0 THEN 0
                     ELSE 3 * (SELECT t FROM tri) * 1000000
                          // (SELECT w FROM wdg) END AS BIGINT) AS gcc_e6""",
    // q_j8: replays the SCD2 outcome classes over the same FULL OUTER
    // join — ride-through (absent-or-equal, null-safe), closed, and
    // opened versions as three UNION ALL branches
    "q_j8_scd2" ->
      s"""WITH $duckScd2Hist
         SELECT doc_id, md5(v) AS v_md5, valid_from_us, valid_to_us,
                is_current
         FROM h ORDER BY doc_id, valid_from_us""",
    // q_j9: the same replayed history, then the interval-containment
    // LEFT join picking each fact's valid version (or nulls)
    "q_j9_scd2_lookup" ->
      s"""WITH $duckScd2Hist,
          facts AS (SELECT doc_id,
                      unnest([500::BIGINT, 1500::BIGINT]) AS t_us
                    FROM documents)
         SELECT f.doc_id, f.t_us, md5(h.v) AS v_md5, h.valid_from_us
         FROM facts f LEFT JOIN h
           ON f.doc_id = h.doc_id AND f.t_us >= h.valid_from_us
              AND (h.valid_to_us IS NULL OR f.t_us < h.valid_to_us)
         ORDER BY f.doc_id, f.t_us""",
    // q_t22: replays the BM25 pipeline — tf over query-term hits only,
    // df from the tf table, corpus stats, and the per-term contribution
    // inside the same half-up 1e-6 floor with token-identical operation
    // order ((k1+1) written as (1.2 + 1.0) so both engines fold the
    // same IEEE sum, never a pre-folded 2.2 literal)
    "q_t22_bm25" ->
      s"""WITH d AS (SELECT doc_id, $duckToks AS tk, len($duckToks) AS dl
              FROM documents WHERE doc_id IS NOT NULL),
          stats AS (SELECT COUNT(*) AS n, SUM(dl) AS total FROM d),
          m AS (SELECT doc_id, dl,
                  unnest(list_filter(tk,
                    t -> t IN ('dup', 'spark', 'vector'))) AS t
                FROM d),
          tf AS (SELECT doc_id, dl, t, COUNT(*) AS tf FROM m
                 GROUP BY doc_id, dl, t),
          dft AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
          c AS (SELECT tf.doc_id,
                  CAST(FLOOR(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                    ((tf * (1.2 + 1.0)) /
                     (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (total / n))))
                    * 1000000 + 0.5) AS BIGINT) AS c_e6
                FROM tf JOIN dft USING (t) CROSS JOIN stats),
          s AS (SELECT doc_id, CAST(SUM(c_e6) AS BIGINT) AS score_e6
                FROM c GROUP BY doc_id)
         SELECT doc_id, score_e6 FROM s
         ORDER BY score_e6 DESC, doc_id LIMIT 20""",
    // q_t29: replays BOTH rankings end-to-end — the q_t22 BM25 page
    // (identical CTEs and fp operation order) and the q_v1-style exact
    // cosine page for query vec_id 0 — then the fused floor(1e6/(60+r))
    // sum and the deterministic (score desc, id) page order
    "q_t29_hybrid_rrf" ->
      s"""WITH d AS (SELECT doc_id, $duckToks AS tk, len($duckToks) AS dl
              FROM documents WHERE doc_id IS NOT NULL),
          stats AS (SELECT COUNT(*) AS n, SUM(dl) AS total FROM d),
          m AS (SELECT doc_id, dl,
                  unnest(list_filter(tk,
                    t -> t IN ('dup', 'spark', 'vector'))) AS t
                FROM d),
          tf AS (SELECT doc_id, dl, t, COUNT(*) AS tf FROM m
                 GROUP BY doc_id, dl, t),
          dft AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
          c AS (SELECT tf.doc_id,
                  CAST(FLOOR(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                    ((tf * (1.2 + 1.0)) /
                     (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (total / n))))
                    * 1000000 + 0.5) AS BIGINT) AS c_e6
                FROM tf JOIN dft USING (t) CROSS JOIN stats),
          sc AS (SELECT doc_id, CAST(SUM(c_e6) AS BIGINT) AS score_e6
                 FROM c GROUP BY doc_id),
          lex AS (SELECT doc_id,
                    ROW_NUMBER() OVER (ORDER BY score_e6 DESC, doc_id)
                      AS rank_a
                  FROM sc ORDER BY score_e6 DESC, doc_id LIMIT 20),
          qv0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
          cvs AS (SELECT vec_id AS doc_id, embedding AS cv
                  FROM embeddings WHERE vec_id >= 1),
          ds AS (SELECT doc_id,
                   ROUND(CASE WHEN sqrt(${duckNormSq("qv")}) = 0
                                OR sqrt(${duckNormSq("cv")}) = 0 THEN 0.0
                         ELSE $duckDot / (sqrt(${duckNormSq("qv")})
                                          * sqrt(${duckNormSq("cv")})) END,
                         6) AS sim
                 FROM cvs CROSS JOIN qv0),
          den AS (SELECT doc_id,
                    ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS rank_b
                  FROM ds ORDER BY sim DESC, doc_id LIMIT 20),
          f AS (SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id,
                  COALESCE(l.rank_a, 0) AS rank_a,
                  COALESCE(r.rank_b, 0) AS rank_b
                FROM lex l FULL OUTER JOIN den r ON l.doc_id = r.doc_id),
          g AS (SELECT doc_id, rank_a, rank_b,
                  CAST((CASE WHEN rank_a = 0 THEN 0
                        ELSE FLOOR(1000000.0 / (60 + rank_a)) END) +
                       (CASE WHEN rank_b = 0 THEN 0
                        ELSE FLOOR(1000000.0 / (60 + rank_b)) END)
                    AS BIGINT) AS rrf_e6
                FROM f)
         SELECT doc_id, rank_a, rank_b, rrf_e6,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf_e6 DESC, doc_id)
             AS INTEGER) AS rank
         FROM g ORDER BY rank""",
    // q_qr3x: replays q_qr3's status derivation, then re-scores the
    // changed ids with the same exact integer Jaccard compare over
    // literal trigram lists (the engine rides 64-bit hashes — the
    // battery-wide collision-freedom assumption)
    "q_qr3x_fuzzy_diff" ->
      s"""WITH oldS AS (SELECT doc_id, text FROM documents
              WHERE doc_id % 7 <> 0),
          newS AS (SELECT doc_id,
                CASE WHEN doc_id % 11 = 0
                     THEN 'rewritten placeholder document number ' || doc_id
                     WHEN doc_id % 3 = 0 THEN text || ' v2'
                     ELSE text END AS text
              FROM documents WHERE doc_id % 5 <> 0),
          fo AS (SELECT doc_id, COALESCE(md5(text), '') AS f FROM oldS),
          fn AS (SELECT doc_id, COALESCE(md5(text), '') AS f FROM newS),
          j AS (SELECT COALESCE(fo.doc_id, fn.doc_id) AS doc_id,
                  CASE WHEN fo.f IS NULL THEN 'added'
                       WHEN fn.f IS NULL THEN 'removed'
                       WHEN fo.f = fn.f THEN 'unchanged'
                       ELSE 'changed' END AS status
                FROM fo FULL OUTER JOIN fn ON fo.doc_id = fn.doc_id),
          ch AS (SELECT doc_id FROM j WHERE status = 'changed'),
          sho AS (SELECT o.doc_id, COALESCE($duckSh3, []) AS sh
                  FROM oldS o JOIN ch USING (doc_id)),
          shn AS (SELECT n.doc_id, COALESCE($duckSh3, []) AS sh
                  FROM newS n JOIN ch USING (doc_id)),
          sc AS (SELECT sho.doc_id,
                   CASE WHEN len(list_distinct(list_concat(sho.sh, shn.sh)))
                          = 0 THEN 'rewritten'
                        WHEN len(list_intersect(sho.sh, shn.sh)) * 1000000
                          >= 800000 *
                             len(list_distinct(list_concat(sho.sh, shn.sh)))
                          THEN 'edited'
                        ELSE 'rewritten' END AS status
                 FROM sho JOIN shn USING (doc_id)),
          f AS (SELECT doc_id, status FROM j WHERE status <> 'changed'
                UNION ALL SELECT doc_id, status FROM sc)
         SELECT status, COUNT(*) AS n,
                CAST(CAST(SUM(doc_id) AS DECIMAL(38,0)) AS VARCHAR) AS id_sum
         FROM f GROUP BY status ORDER BY status""",
    // q_qr5: exhaustive removed × added exact Jaccard (all-pairs is fine
    // at the gate: ~105 removals × ~72 additions; the Spark side must
    // NOT do this — it bands)
    "q_qr5_rekeyed" ->
      s"""WITH oldS AS (SELECT doc_id, text FROM documents),
          newS AS (SELECT CASE WHEN doc_id % 7 = 0 THEN doc_id + 1000000
                     ELSE doc_id END AS doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                     ELSE text END AS text
              FROM documents WHERE doc_id % 7 = 0 OR doc_id % 13 <> 0),
          rem AS (SELECT doc_id, $duckSh3 AS sh FROM oldS
                  WHERE doc_id NOT IN (SELECT doc_id FROM newS)),
          ad AS (SELECT doc_id, $duckSh3 AS sh FROM newS
                 WHERE doc_id NOT IN (SELECT doc_id FROM oldS)),
          p AS (SELECT r.doc_id AS old_id, a.doc_id AS new_id,
                  round(len(list_intersect(r.sh, a.sh)) * 1.0 /
                        nullif(len(list_distinct(list_concat(r.sh, a.sh))),
                               0), 6) AS jaccard
                FROM rem r CROSS JOIN ad a)
         SELECT old_id, new_id, jaccard FROM p
         WHERE jaccard >= 0.8 ORDER BY old_id, new_id""",
    // q_qr4: replays the smoothed shares and the single ln inside the
    // same half-up floor — the one float surface is token-identical
    "q_qr4_drift" ->
      """WITH r AS (SELECT lang AS bucket, COUNT(*) AS n_ref
              FROM documents WHERE doc_id % 2 = 0 AND lang IS NOT NULL
              GROUP BY lang),
          c AS (SELECT lang AS bucket, COUNT(*) AS n_cur
              FROM documents
              WHERE doc_id % 2 = 1 AND n_chars >= 400 AND lang IS NOT NULL
              GROUP BY lang),
          j AS (SELECT COALESCE(r.bucket, c.bucket) AS bucket,
                  COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
                FROM r FULL OUTER JOIN c ON r.bucket = c.bucket),
          t AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc,
                  COUNT(*) AS b FROM j)
         SELECT bucket, CAST(n_ref AS BIGINT) AS n_ref,
                CAST(n_cur AS BIGINT) AS n_cur,
                CAST(FLOOR(((n_ref + 0.5) / (tr + 0.5 * b) -
                    (n_cur + 0.5) / (tc + 0.5 * b)) *
                  ln(((n_ref + 0.5) / (tr + 0.5 * b)) /
                    ((n_cur + 0.5) / (tc + 0.5 * b))) * 1000000 + 0.5)
                  AS BIGINT) AS psi_e6
         FROM j, t ORDER BY bucket""",
    // q_t21: the sketch screen is exact end-to-end (Count-Min never
    // underestimates; overestimates die in the exact confirm), so the
    // oracle is the plain GROUP BY HAVING over every 3-gram OCCURRENCE
    "q_t21_heavy_phrases" ->
      s"""WITH tk AS (SELECT $duckToks AS t FROM documents),
          g AS (SELECT unnest(list_transform(
                  range(1, greatest(len(t) - 2, 0) + 1),
                  i -> array_to_string(t[i:i+2], ' '))) AS phrase
                FROM tk)
         SELECT phrase, COUNT(*) AS n FROM g
         GROUP BY phrase HAVING COUNT(*) >= 6 ORDER BY phrase""",
    // q_t19: the bloom screen is exact end-to-end (false positives are
    // confirmed away, false negatives impossible), so the oracle is q_t9's
    "q_t19_bloom_decontaminate" -> duckDecontaminate,
    // q_p3/q_p4 (L65): suppression is a window count; the audit table is
    // the grouped aggregate itself — both exactly expressible
    // q_qr6 (L66): same half-open integer binning, `//` integral div
    "q_qr6_length_histogram" ->
      """WITH b AS (SELECT source,
                CASE WHEN n_chars < 100 THEN -1
                     WHEN n_chars >= 500 THEN 8
                     ELSE CAST((n_chars - 100) * 8 // 400 AS INTEGER)
                  END AS bin,
                n_chars AS v
            FROM documents WHERE n_chars IS NOT NULL)
         SELECT source, bin, COUNT(*) AS n, MIN(v) AS min_v, MAX(v) AS max_v
         FROM b GROUP BY source, bin ORDER BY source, bin""",
    "q_p3_k_anonymity" ->
      """SELECT c_custkey, c_nationkey, c_mktsegment FROM (
           SELECT c_custkey, c_nationkey, c_mktsegment,
                  COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n
           FROM customer)
         WHERE n >= 12 ORDER BY c_custkey""",
    "q_p4_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
                COUNT(DISTINCT c_acctbal) AS n_sensitive,
                CASE WHEN COUNT(*) >= 12 THEN 1 ELSE 0 END AS k_ok,
                CASE WHEN COUNT(DISTINCT c_acctbal) >= 10 THEN 1 ELSE 0
                  END AS l_ok
         FROM customer GROUP BY c_nationkey, c_mktsegment
         ORDER BY c_nationkey, c_mktsegment""",
    // q_p6: the release replayed bit-for-bit — same '|'-joined null-
    // sentinel group key, same md5 52-bit dyadic uniforms ((h+0.5)/2^52,
    // the q_e10 form), same inverse-CDF geometric floor with
    // ln α written as -(ε/Δ) = -1.0 exactly; eps CAST to DOUBLE (a bare
    // DuckDB 1.0 is DECIMAL)
    "q_p6_dp_counts" ->
      """WITH g AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
                COALESCE(CAST(lang AS VARCHAR), ' ') || '|' ||
                COALESCE(CAST(source AS VARCHAR), ' ') AS gk
              FROM documents GROUP BY lang, source),
          u AS (SELECT lang, source, n,
                 (CAST(concat('0x', substr(md5('dpl:1:r11:' || gk), 1, 13))
                    AS BIGINT) + 0.5) / 4503599627370496.0 AS u1,
                 (CAST(concat('0x', substr(md5('dpl:2:r11:' || gk), 1, 13))
                    AS BIGINT) + 0.5) / 4503599627370496.0 AS u2
                FROM g)
         SELECT lang, source,
                CAST(n + CAST(FLOOR(ln(u1) / -1.0) AS BIGINT)
                       - CAST(FLOOR(ln(u2) / -1.0) AS BIGINT)
                  AS BIGINT) AS noisy_n,
                CAST(1.0 AS DOUBLE) AS eps, CAST(1 AS INTEGER) AS sensitivity
         FROM u ORDER BY lang, source""",
    "q_qr2_corpus_card" ->
      s"""WITH d AS (SELECT source, lang,
              len($duckToks) AS nt,
              $duckQuality2 AS q,
              md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents),
          f AS (SELECT fp FROM d GROUP BY fp HAVING COUNT(*) > 1)
         SELECT source, COUNT(*) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS total_tokens,
                CAST(ROUND(SUM(q), 2) AS DOUBLE) AS sum_quality,
                COUNT(*) FILTER (WHERE lang = 'en') AS n_en,
                COUNT(*) FILTER (WHERE fp IN (SELECT fp FROM f)) AS n_dup
         FROM d GROUP BY source ORDER BY source""",
    "q_lp_training_prep" -> {
      val em = graft.functions.TextAnalysis.EmailPattern
      val url = graft.functions.TextAnalysis.UrlPattern
      val quality = duckQuality2
      s"""WITH scrub AS (
            SELECT doc_id, source,
                   regexp_replace(regexp_replace(text, '$url', '<URL>', 'g'),
                                  '$em', '<EMAIL>', 'g') AS text
            FROM documents),
          keep1 AS (
            SELECT MIN(doc_id) AS doc_id FROM scrub
            GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')),
          e AS (SELECT s.doc_id, s.source, s.text
                FROM scrub s JOIN keep1 USING (doc_id)),
          sh AS (SELECT doc_id, list_distinct(list_transform(
                   range(1, greatest(len($duckToks) - 2, 0) + 1),
                   i -> array_to_string(($duckToks)[i:i+2], ' '))) AS sh
                 FROM e),
          losers AS (
            SELECT DISTINCT b.doc_id AS doc_id
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                  nullif(len(list_distinct(list_concat(a.sh, b.sh))), 0), 6)
                  >= 0.8),
          kept AS (SELECT * FROM e
                   WHERE doc_id NOT IN (SELECT doc_id FROM losers)
                     AND $quality > 0.7),
          cap AS (SELECT doc_id, source, text FROM (
                   SELECT kept.*, ROW_NUMBER() OVER (PARTITION BY source
                     ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
                   FROM kept) WHERE rk <= 15),
          sp AS (SELECT doc_id, source,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
                          THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                          THEN 'val'
                        ELSE 'test' END AS split,
                   len($duckToks) AS n_toks
                 FROM cap),
          pk AS (SELECT source, split, n_toks,
                   CAST(FLOOR((SUM(n_toks) OVER (PARTITION BY source, split
                         ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_toks)
                        / 512.0) AS BIGINT) AS pack_id
                 FROM sp)
          SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
                 COUNT(DISTINCT source || '#' || CAST(pack_id AS VARCHAR)) AS n_packs
          FROM pk GROUP BY split ORDER BY split"""
    }
    ,
    // q_t45: the metric replayed token-for-token — the SAME e9
    // discount literals, the ideal reordering window, the
    // unjudged-vs-miss conventions, the three per-query floors; the
    // bm25_dup leg re-runs the q_t22 BM25 CTEs verbatim
    "q_t45_ndcg" ->
      s"""WITH tbl AS (SELECT ${RankEval.discountSqlList} AS disc),
          dd AS (SELECT doc_id,
                CAST(doc_id % 20 AS VARCHAR) AS qid,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 2)) AS BIGINT) % 4 AS rel,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                  3, 14)) AS BIGINT) AS rkey
              FROM documents WHERE doc_id IS NOT NULL),
          perf AS (SELECT 'perfect_ranker' AS panel, qid,
                CAST(ROW_NUMBER() OVER (PARTITION BY qid
                  ORDER BY rel DESC, doc_id) AS BIGINT) AS rank, rel
              FROM dd),
          hsh AS (SELECT 'hash_ranker' AS panel, qid,
                CAST(ROW_NUMBER() OVER (PARTITION BY qid
                  ORDER BY rkey DESC, doc_id) AS BIGINT) AS rank, rel
              FROM dd),
          d AS (SELECT doc_id, $duckToks AS tk, len($duckToks) AS dl
              FROM documents WHERE doc_id IS NOT NULL),
          stats AS (SELECT COUNT(*) AS n, SUM(dl) AS total FROM d),
          m AS (SELECT doc_id, dl,
                  unnest(list_filter(tk,
                    t -> t IN ('dup', 'spark', 'vector'))) AS t
                FROM d),
          tf AS (SELECT doc_id, dl, t, COUNT(*) AS tf FROM m
                 GROUP BY doc_id, dl, t),
          dft AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
          c AS (SELECT tf.doc_id,
                  CAST(FLOOR(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                    ((tf * (1.2 + 1.0)) /
                     (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (total / n))))
                    * 1000000 + 0.5) AS BIGINT) AS c_e6
                FROM tf JOIN dft USING (t) CROSS JOIN stats),
          sc AS (SELECT doc_id, CAST(SUM(c_e6) AS BIGINT) AS score_e6
                 FROM c GROUP BY doc_id),
          bm AS (SELECT 'bm25_dup' AS panel, 'q0' AS qid,
                CAST(ROW_NUMBER() OVER (ORDER BY score_e6 DESC, doc_id)
                  AS BIGINT) AS rank,
                LEAST(3, (length(text) -
                  length(replace(text, 'dup', ''))) // 3) AS rel
              FROM sc JOIN documents USING (doc_id)
              ORDER BY score_e6 DESC, doc_id LIMIT 20),
          base AS (SELECT * FROM perf UNION ALL SELECT * FROM hsh
             UNION ALL SELECT * FROM bm),
          rnk AS (SELECT panel, qid, rank, rel,
                CAST(ROW_NUMBER() OVER (PARTITION BY panel, qid
                  ORDER BY rel DESC, rank) AS BIGINT) AS irank
              FROM base),
          perq AS (SELECT panel, qid,
                CAST(SUM(CASE WHEN rank <= 10
                  THEN rel * disc[CAST(rank AS INT)] ELSE 0 END)
                  AS BIGINT) AS dcg,
                CAST(SUM(CASE WHEN irank <= 10
                  THEN rel * disc[CAST(irank AS INT)] ELSE 0 END)
                  AS BIGINT) AS idcg,
                MIN(CASE WHEN rel > 0 AND rank <= 10 THEN rank END)
                  AS rr
              FROM rnk CROSS JOIN tbl GROUP BY 1, 2),
          scq AS (SELECT panel,
                CASE WHEN idcg = 0 THEN NULL
                  ELSE (1000000 * CAST(dcg AS HUGEINT)) // idcg
                END AS ndcg,
                COALESCE(1000000 // rr, 0) AS rr
              FROM perq)
         SELECT panel, COUNT(*) AS n_q,
                CAST(COUNT(ndcg) AS BIGINT) AS n_judged,
                CASE WHEN COUNT(ndcg) = 0 THEN NULL
                  ELSE CAST(SUM(ndcg) // COUNT(ndcg) AS BIGINT)
                END AS ndcg_ppm,
                CAST(SUM(rr) // COUNT(*) AS BIGINT) AS mrr_e6
         FROM scq GROUP BY panel ORDER BY panel"""
    ,
    // q_m17: the generator formulas replayed (the m16 convention) —
    // the walk inverts the construction exactly, so the oracle needs
    // only the parameter arithmetic; the 13-route (non-11) is the
    // NULL-metadata violation group, 11-multiples never sniff in
    "q_m17_flac_metadata" ->
      """WITH d AS (SELECT doc_id FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL
                AND doc_id % 11 <> 0),
          r AS (SELECT doc_id,
                CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                  WHEN 2 THEN 44100 ELSE 48000 END AS rate,
                1 + (doc_id // 4) % 2 AS ch,
                CASE (doc_id // 8) % 2 WHEN 0 THEN 16 ELSE 24 END
                  AS bps,
                96000 * (1 + (doc_id // 16) % 7) AS samples,
                2 + (doc_id // 112) % 3 AS nb
              FROM d),
          ok AS (SELECT CAST(ch AS BIGINT) AS channels,
                CAST(bps AS BIGINT) AS bits_per_sample,
                CAST(rate AS BIGINT) AS sample_rate,
                COUNT(*) AS n_docs,
                CAST(SUM(samples * 1000 // rate) AS BIGINT)
                  AS sum_dur_ms,
                CAST(SUM(nb) AS BIGINT) AS sum_blocks
              FROM r WHERE doc_id % 13 <> 0 GROUP BY 1, 2, 3),
          viol AS (SELECT CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                CAST(NULL AS BIGINT), COUNT(*), CAST(NULL AS BIGINT),
                CAST(NULL AS BIGINT)
              FROM r WHERE doc_id % 13 = 0 HAVING COUNT(*) > 0)
         SELECT * FROM (SELECT * FROM ok UNION ALL SELECT * FROM viol)
         ORDER BY channels NULLS FIRST, bits_per_sample NULLS FIRST,
                  sample_rate NULLS FIRST"""
    // Every battery entry is oracled (r9): the last holdout, q_a2x,
    // now carries the q_a2y exact-count + error-bound-verdict pair; the
    // ANN entries (q_v2/v4/v6) gate through annRecallOracle's exact
    // recall reports.
  )

  /** Oracles that depend on state a query run establishes — today the
    * q_t20 classifier-scoring oracle, whose weight table is the vector
    * the query's deterministic training fit. Evaluated by Verify AFTER
    * all queries ran; empty for any query that didn't run (the driver
    * then records its rows-only fallback, never a wrong oracle). */
  def dynamicOracles: Map[String, String] = t20Oracle ++
    learnedT28.map(ms =>
      "q_t28_bpe_learn" -> BpeLearn.oracleSql(ms)).toMap

  private def t20Oracle: Map[String, String] = trainedT20 match {
    case None => Map.empty
    case Some(m) =>
      // only nonzero weights ride the VALUES CTE; zero-weight buckets
      // contribute 0 to the dot product on both sides (LEFT JOIN +
      // COALESCE 0), so omitting them is exact
      val nz = m.weightsE6.iterator.zipWithIndex
        .filter(_._1 != 0L)
        .map { case (w, b) => s"($b,$w)" }.mkString(",")
      if (nz.isEmpty) Map.empty
      else Map("q_t20_quality_classifier" ->
        // replays QualityClassifier.score end-to-end: the m=2048 hashed
        // uni+bigram featurization (portable md5-16-bit convention, the
        // duckDsir chain's hash), per-(doc,bucket) counts, the weight
        // join, and the EXACT round-half-up logit_e6 =
        // floorDiv(2·num + n, 2·n) + bias with the floor built from a
        // nonnegative mod — token-identical to the engine's decimal
        // pmod identity. Featureless documents score the bias alone.
        s"""WITH tk AS (SELECT doc_id, $duckToks AS tk FROM documents),
            uni AS (SELECT doc_id, unnest(tk) AS f FROM tk),
            big AS (SELECT doc_id,
                      unnest(list_transform(range(1, len(tk)),
                        i -> tk[i] || ' ' || tk[i+1])) AS f
                    FROM tk WHERE len(tk) >= 2),
            feats AS (SELECT doc_id,
                        CAST(concat('0x', substr(md5(f), 1, 4)) AS INT)
                          % ${m.m} AS b
                      FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
            xs AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS x
                   FROM feats GROUP BY doc_id, b),
            w(b, w_e6) AS (VALUES $nz),
            sc AS (SELECT doc_id, CAST(SUM(x) AS BIGINT) AS n_feats,
                     CAST(SUM(COALESCE(w_e6, 0) * x) AS BIGINT) AS num
                   FROM xs LEFT JOIN w USING (b) GROUP BY doc_id),
            lg AS (SELECT doc_id, n_feats,
                     CAST((2*num + n_feats -
                        ((((2*num + n_feats) % (2*n_feats)) + 2*n_feats)
                          % (2*n_feats))) // (2*n_feats) AS BIGINT)
                       + ${m.biasE6} AS logit_e6
                   FROM sc)
           SELECT d.doc_id, COALESCE(n_feats, 0) AS n_feats,
                  CAST(COALESCE(logit_e6, ${m.biasE6}) AS BIGINT) AS logit_e6
           FROM documents d LEFT JOIN lg USING (doc_id)
           ORDER BY d.doc_id""")
  }
}
