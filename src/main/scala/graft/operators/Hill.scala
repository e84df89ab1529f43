package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hill tail-index estimator (r15, L179; Hill 1975, Ann. Stat. 3 —
  * "how heavy is this distribution's tail"): the TAIL companion of
  * L106's Zipf slope — Zipf fits the whole rank-frequency line, Hill
  * estimates the tail exponent α from only the k largest order
  * statistics, which is what decides whether a 100 TB shuffle has a
  * hot-key problem (α ≤ 1: infinite mean — cap or salt; α ∈ (1,2):
  * infinite variance — expect stragglers). Over doc length it is the
  * "are there pathological giants" screen quantified.
  *
  *   1/α̂ = (1/k)·Σ_{i=1..k} ln(x_(i) / x_(k+1))
  * over the k+1 largest sample values (rows, not distinct values —
  * ties are real observations; order is (value DESC, id ASC), the
  * deterministic total order every top-k in this battery uses).
  * Through the L151 fixed-point table ln (SIXTH consumer):
  *   alpha_inv_e9 = div(Σ lnE9(x_(i), x_(k+1)), k)     — exact
  *   alpha_e6     = div(10¹⁵, alpha_inv_e9)            — the
  * reciprocal as ONE more truncating division; all top-(k+1) values
  * equal ⇒ Σ = 0 ⇒ alpha NULL (a flat top has no tail exponent).
  * Non-positive values drop (ln's domain; zero-length docs are not
  * tail evidence). Groups with < k+1 surviving rows emit NO row
  * (estimating a tail from the whole sample is bias wearing a
  * number). Table-ln floor: each term under-reads < ln(257/256), so
  * alpha_inv under-reads ≤ 3.9·10⁶ e9-units and α̂ over-reads
  * correspondingly — stated (the JSD stance).
  *
  * Capacity: x must fit a LONG for the bin() probe — any battery
  * value column qualifies.
  *
  * Scale shape: the top-(k+1) filter is a row_number over
  * (value DESC, id) that InferWindowGroupLimit pushes down as a
  * PARTIAL WindowGroupLimit (the L124/L135 pin class — each map task
  * ships ≤ k+1 rows per group); everything after is a (k+1)-row grid
  * per group. */
object Hill {

  /** Per-group Hill estimate from the top k+1 order statistics:
    * (groupCol, k, n_tail, x_k1, alpha_inv_e9, alpha_e6). */
  def tailIndex(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int = 100): DataFrame = {
    require(k >= 2 && k <= 10000, s"k $k outside [2, 10000]")
    Reserved.guard(Seq(groupCol),
      Seq("__v", "__id", "__rn", "__xk1", "__lnnum", "__lnden",
        "__lnk0", "__lnk", "__lnmi", "__lnln", "__s", "__n",
        "k", "n_tail", "x_k1", "alpha_inv_e9", "alpha_e6"),
      "Hill")
    val base = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("long").as("__v"),
        col(idCol).cast("string").as("__id"))
      .filter(col("__v") > 0L)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__v").desc, col("__id"))
    val top = base.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k + 1)
    val xk1 = top.filter(col("__rn") === k + 1)
      .select(col(groupCol), col("__v").as("__xk1"))
    val terms = Drift.withTableLn(
      top.filter(col("__rn") <= k).join(xk1, Seq(groupCol))
        .withColumn("__lnnum", col("__v"))
        .withColumn("__lnden", col("__xk1")),
      "__ln")
    // a group reaching here has ≥ k+1 rows (the xk1 inner join is the
    // filter): groups too small for a tail estimate emit NO row
    terms.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tail"), sum(col("__lnln")).as("__s"),
        max(col("__xk1")).as("x_k1"))
      .withColumn("k", lit(k.toLong))
      .withColumn("alpha_inv_e9",
        call_function("div", col("__s"), lit(k.toLong)))
      .withColumn("alpha_e6",
        when(col("alpha_inv_e9").isNull
            || col("alpha_inv_e9") <= 0L, lit(null).cast("long"))
          .otherwise(call_function("div", lit(1000000000000000L),
            col("alpha_inv_e9"))))
      .select(col(groupCol), col("k"), col("n_tail"), col("x_k1"),
        col("alpha_inv_e9"), col("alpha_e6"))
  }
}
