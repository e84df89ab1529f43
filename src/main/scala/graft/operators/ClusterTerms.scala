package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Class-discriminative term extraction — c-TF-IDF (Grootendorst's
  * BERTopic formulation): label WHAT each cluster/source/topic is about
  * by ranking terms that are frequent INSIDE the class but rare across
  * the corpus. The "describe your clusters" step that follows L31/L44
  * clustering or any per-source audit: `src14 ≈ {invoice, payment,
  * net-30}` is what a human reads, not component ids.
  *
  * Score: tf_{t,c} · ln(1 + A / f_t), with tf the term's frequency in
  * the class (all of a class's documents treated as ONE concatenated
  * document — that is the "c" in c-TF-IDF), f_t the term's corpus-wide
  * frequency and A the average class token mass. Following the L43/L55
  * quantization discipline the ln factor is floored once to integer
  * 1e-4 (`idf_e4`) and the score is the exact BIGINT product tf·idf_e4
  * — the single float op sits inside a half-up floor (the documented
  * ~1-ulp libm caveat), everything after is integer-exact on any
  * engine.
  *
  * Scale shape: one token explode (outer + null filter) → one
  * map-side-combinable (class, term) count; the term-frequency table
  * joins in per TERM (key-partitioned; AQE broadcasts it when the
  * vocabulary is small); the class-mass average is a 1-row broadcast
  * (the Drift shape). Top-k per class is `row_number ≤ k` — Spark
  * rewrites it to WindowGroupLimit, so each map task keeps k rows per
  * class before the exchange (the L34 caps discipline). Nothing scales
  * with document count after the first aggregate. */
object ClusterTerms {

  /** Top-`k` terms per class: (classCol, term, tf, score_e4, rank) with
    * rank 1..k by (score desc, term asc) — the term tie-break keeps the
    * cut deterministic. Null class keys form a class of their own
    * (grouping semantics, same as the engine's other group-bys). */
  def topTerms(df: DataFrame, classCol: String, textCol: String,
      k: Int = 10): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val toks = df.select(col(classCol).as("cls"),
        explode_outer(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term").isNotNull)
    val tf = toks.groupBy(col("cls"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val ft = tf.groupBy(col("term")).agg(sum(col("tf")).as("f"))
    // A = total token mass / class count — one 1-row broadcast frame;
    // the double division is a single IEEE op, identical everywhere
    val aStats = tf.groupBy(col("cls")).agg(sum(col("tf")).as("cn"))
      .agg((sum(col("cn")).cast("double") /
        count(lit(1)).cast("double")).as("__a"))
    val scored = tf.join(ft, "term").crossJoin(aStats)
      .select(col("cls"), col("term"), col("tf"),
        (col("tf") * floor(log(lit(1.0) + col("__a") / col("f").cast("double"))
          * lit(10000.0) + lit(0.5)).cast("long")).as("score_e4"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("cls"))
        .orderBy(col("score_e4").desc, col("term"))))
      .filter(col("rank") <= k)
      .withColumnRenamed("cls", classCol)
  }
}
