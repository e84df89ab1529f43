package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** BM25 ranked retrieval over a document corpus (Robertson/Spärck Jones
  * probabilistic weighting — the default scoring function of Lucene,
  * Elasticsearch and every web-scale retrieval stack): score each document
  * against a literal bag of query terms and return the top-k.
  *
  * Scoring (k1/b are the classic free parameters):
  *   idf(t)  = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)   (never < 0)
  *   tfp(t,d)= tf · (k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
  *   score   = Σ_t idf·tfp, each term's contribution quantized ONCE to
  *             integer 1e-6 units with a half-up floor (the L43/L55
  *             discipline) so per-document totals are exact BIGINT sums
  *             and cross-engine comparison is exact up to the 1-ulp
  *             libm-ln caveat documented on Drift.
  *
  * Scale shape: the query's terms are a LITERAL handful, so matching
  * tokens are filtered INSIDE the per-row token array (a codegen'd
  * lambda — the explode only ever emits query-term hits, not the
  * corpus's token stream), then one groupBy (doc, term) builds tf, a
  * ≤|terms|-row df aggregate broadcasts back, and corpus stats (N,
  * total length) ride a 1-row broadcast join (the Drift shape). No
  * inverted index is materialized and nothing scales with vocabulary —
  * at 100 TB the cost is two tokenizing scans (one aggregates the
  * corpus length stats, one matches query terms; persisting per-doc
  * token arrays to save the second would cost more than it saves) plus
  * a shuffle of only the matching (doc, term) pairs. Documents
  * containing no query term score 0 and are absent by construction
  * (standard retrieval semantics). */
object Bm25 {

  /** Per-document integer-quantized BM25 score: (id, score_e6), one row
    * per document containing ≥ 1 query term. `terms` must be distinct
    * non-empty literals. */
  def score(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(terms.distinct.size == terms.size,
      s"query terms must be distinct, got $terms")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val d = df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("__id"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("__id"), col("__tk"), size(col("__tk")).as("__dl"))
    val stats = d.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__tot"))
    // outer + null filter, not plain explode (the q_t6 lesson):
    // InferFiltersFromGenerate would re-evaluate the tokenize+match
    // lambda in a pushed size()>0 filter below the generate
    val tf = d
      .select(col("__id"), col("__dl"),
        explode_outer(filter(col("__tk"), t => t.isInCollection(terms)))
          .as("__t"))
      .filter(col("__t").isNotNull)
      .groupBy(col("__id"), col("__dl"), col("__t"))
      .agg(count(lit(1)).as("__tf"))
    val dft = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val avgdl = col("__tot") / col("__n") // long/long → double, both engines
    val idf = log((col("__n") - col("__df") + lit(0.5)) /
      (col("__df") + lit(0.5)) + lit(1.0))
    val tfp = (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("__dl") / avgdl))
    tf.join(broadcast(dft), Seq("__t"))
      .crossJoin(broadcast(stats))
      .select(col("__id"),
        floor(idf * tfp * lit(1000000.0) + lit(0.5)).cast("long")
          .as("__c_e6"))
      .groupBy(col("__id"))
      .agg(sum(col("__c_e6")).as("score_e6"))
      .select(col("__id").as(idCol), col("score_e6"))
  }

  /** The top-k page: highest score first, ties to the smaller id
    * (deterministic). Plans as TakeOrdered — no global sort. */
  def topK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    score(df, idCol, textCol, terms, k1, b)
      .orderBy(col("score_e6").desc, col(idCol).asc)
      .limit(k)
  }
}
