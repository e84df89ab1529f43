package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** chrF — character n-gram F-score (Popović 2015, WMT) — the
  * tokenization-free member of the eval trio (L107 BLEU, L109 ROUGE):
  * robust to morphology and tokenizer drift because it never
  * tokenizes; the standard chrF2 weighs recall twice (β = 2).
  * Whitespace is removed before gram extraction (the reference
  * definition), orders n = 1..`maxN`.
  *
  * FULLY exact, the ROUGE trick extended to β: with P = m/c and
  * R = m/r, `Fβ = (1+β²)PR / (β²P + R) = (1+β²)·m / (β²·r + c)` —
  * one floor division per order, no float anywhere. Orders with no
  * grams on either side are absent (short-text degeneracy — consumers
  * average over PRESENT orders, both engines identically).
  *
  * Scale shape: same one-pass contract as BLEU/ROUGE — both sides'
  * grams for ALL orders ride a single side/order-tagged explode
  * (per-DOC-row array builders, the q_t27 tier), per-pair clipping in
  * one (id, n, gram) partial agg, corpus pooling in one (group, n)
  * agg; zero joins. */
object ChrF {

  /** `(grp, n, m, ct, rt, f2_e6)` per group and char-gram order —
    * clipped matches, candidate/reference totals, and the exact
    * quantized chrF-β score (β defaults to 2). */
  def chrF(pairs: DataFrame, groupCol: String, idCol: String,
      candText: Column, refText: Column, maxN: Int = 4,
      beta: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN $maxN outside [1, 8]")
    require(beta >= 1 && beta <= 10, s"beta $beta outside [1, 10]")
    // assign-before-explode (the dHash/q_m6 lesson, bench-caught here
    // too): the stripped string must be a MATERIALIZED column before
    // the gram lambdas touch it — an expression subtree inside an
    // interpreted HOF lambda re-executes per ELEMENT, so embedding the
    // regexp_replace re-stripped the whole document once per gram
    // position (measured 23.6 s → 1.1 s on the identical input)
    def tagged(side: String, n: Int, stripped: Column): Column = {
      // when-guard, not greatest(…, 0): Spark's sequence(1, 0) yields
      // the DESCENDING [1, 0], not empty — a string shorter than n
      // would emit two bogus partial grams (spec-caught)
      val positions = when(length(stripped) >= n,
        sequence(lit(1), length(stripped) - (n - 1)))
        .otherwise(array().cast("array<int>"))
      transform(positions,
        i => struct(lit(side).as("side"), lit(n).as("n"),
          stripped.substr(i, lit(n)).as("g")))
    }
    val prepared = pairs
      .filter(col(groupCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol).as("grp"), col(idCol).as("id"),
        regexp_replace(candText, "\\s+", "").as("__c"),
        regexp_replace(refText, "\\s+", "").as("__r"))
    val arms = (1 to maxN).flatMap(n =>
      Seq(tagged("c", n, col("__c")), tagged("r", n, col("__r"))))
    val perPair = prepared
      .select(col("grp"), col("id"), explode(concat(arms: _*)).as("t"))
      .groupBy(col("grp"), col("id"), col("t.n").as("n"),
        col("t.g").as("g"))
      .agg(count(when(col("t.side") === "c", 1)).as("c"),
        count(when(col("t.side") === "r", 1)).as("r"))
    val b2 = beta.toLong * beta
    perPair.groupBy(col("grp"), col("n"))
      .agg(sum(least(col("c"), col("r"))).as("m"),
        sum(col("c")).as("ct"), sum(col("r")).as("rt"))
      .select(col("grp"), col("n"), col("m"), col("ct"), col("rt"),
        when(col("ct") + col("rt") === 0, lit(null).cast("long"))
          .otherwise(expr(
            s"(1 + $b2) * m * 1000000L DIV ($b2 * rt + ct)"))
          .as(s"f${beta}_e6"))
  }
}
