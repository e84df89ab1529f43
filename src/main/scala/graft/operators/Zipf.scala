package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zipf rank-frequency slope — the vocabulary-health number on a corpus
  * data card (Zipf 1949; natural language sits near slope −1 in
  * log-log rank-frequency space): per source, OLS of ln(freq) on
  * ln(rank) over the top `topRanks` token ranks. Deviations flag
  * degenerate sources — boilerplate/templating pushes the head flat
  * (slope → 0 among duplicated tokens), ID/hash-dump content pushes it
  * steep-then-cliff — the cheap screen BEFORE the per-document L12/L48
  * quality rules.
  *
  * Float discipline: each ln is quantized ONCE to integer 1e-6 (the
  * L43/a13 rule), all OLS moments are exact BIGINT sums of those
  * integers, and the single final division rounds to 6 dp — the oracle
  * replays the identical expression tree. Ranks tie-break by token so
  * the rank↔frequency pairing is total.
  *
  * Scale shape: token counting is one map-side-combinable (source,
  * token) aggregation; ranking is a per-source top-k window that Spark
  * rewrites to WindowGroupLimit (partial per-partition top-k before the
  * shuffle — the q_t27 pattern), so the sort is over ≤ topRanks
  * survivors per partition per source, never the vocabulary; moments
  * are a second tiny aggregation over ≤ topRanks rows per source. */
object Zipf {

  /** `(groupCol, n_ranks, slope6)` per group; `slope6` is NULL when
    * fewer than 2 ranks exist (degenerate OLS). */
  def slopeByGroup(docs: DataFrame, textCol: String, groupCol: String,
      tokens: Column => Column, topRanks: Int = 100): DataFrame = {
    require(topRanks >= 2, s"need >= 2 ranks for a slope, got $topRanks")
    Reserved.guard(Seq(groupCol),
      Seq("tok", "n", "r", "x", "y", "m", "sx", "sy", "sxy", "sxx",
        "n_ranks", "slope6"), "Zipf")
    val tf = docs
      .filter(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(groupCol), col("tok"))
      .agg(count(lit(1)).as("n"))
    val ranked = tf
      .withColumn("r", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("n").desc, col("tok"))))
      .filter(col("r") <= topRanks)
    val q = ranked.select(col(groupCol),
      floor(log(col("r").cast("double")) * lit(1000000) + lit(0.5))
        .cast("long").as("x"),
      floor(log(col("n").cast("double")) * lit(1000000) + lit(0.5))
        .cast("long").as("y"))
    val m = q.groupBy(col(groupCol)).agg(
      count(lit(1)).as("m"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val denom = col("m") * col("sxx") - col("sx") * col("sx")
    m.select(col(groupCol), col("m").as("n_ranks"),
      when(denom === 0, lit(null).cast("double"))
        .otherwise(round(
          (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
            denom.cast("double"), 6)).as("slope6"))
  }
}
