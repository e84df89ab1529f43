package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus ROUGE-N (Lin 2004) — the recall side of the eval family:
  * where BLEU asks "how much of the candidate is in the reference",
  * ROUGE asks "how much of the reference did the candidate cover" —
  * the summarization/coverage staple. Micro-averaged corpus form:
  * pooled clipped matches over pooled totals, per n ∈ {1, 2}.
  *
  * FULLY exact — unlike BLEU's exp/ln surface, every ROUGE number here
  * is integer arithmetic: P = m/c and R = m/r quantize by floor
  * division, and the micro F1 collapses algebraically to
  * `2m/(c + r)` (2PR/(P+R) with P = m/c, R = m/r), one more exact
  * floor division — no float anywhere, the gate compares every digit.
  *
  * Scale shape: shares [[Bleu.perPairGramCounts]]' single tagged
  * explode + (id, n, gram) partial agg, then one (group, n) agg — the
  * same one-pass no-join plan. */
object Rouge {

  /** `(grp, n, m, ct, rt, p_e6, r_e6, f1_e6)` per group and gram order:
    * clipped matches, candidate/reference totals, and the exact
    * quantized precision/recall/F1 (NULL where the denominator is 0). */
  def rougeN(pairs: DataFrame, groupCol: String, idCol: String,
      candToks: Column, refToks: Column): DataFrame =
    Bleu.perPairGramCounts(pairs, groupCol, idCol, candToks, refToks)
      .groupBy(col("grp"), col("n"))
      .agg(sum(least(col("c"), col("r"))).as("m"),
        sum(col("c")).as("ct"), sum(col("r")).as("rt"))
      .select(col("grp"), col("n"), col("m"), col("ct"), col("rt"),
        when(col("ct") === 0, lit(null).cast("long"))
          .otherwise(expr("m * 1000000L DIV ct")).as("p_e6"),
        when(col("rt") === 0, lit(null).cast("long"))
          .otherwise(expr("m * 1000000L DIV rt")).as("r_e6"),
        when(col("ct") + col("rt") === 0, lit(null).cast("long"))
          .otherwise(expr("2L * m * 1000000L DIV (ct + rt)")).as("f1_e6"))
}
