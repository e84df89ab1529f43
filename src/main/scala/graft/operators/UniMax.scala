package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax training-mixture allocation (Chung et al. 2023,
  * arXiv:2304.09151) — the budget-to-sources step of pretraining data
  * curation: split a total token budget N across sources as UNIFORMLY
  * as possible subject to a per-source repeat cap (alloc_s ≤
  * epochs·avail_s), instead of proportional sampling that lets head
  * sources dominate. The optimum is waterfilling: alloc_s =
  * min(cap_s, L) with the level L set so Σ alloc = min(N, Σ cap).
  *
  * Exact integer solution, closed-form over the sorted cap table:
  * source i (caps ascending, prefix sums P) is CAPPED iff
  * `P_i + c_i·(n−i) ≤ N`; with K capped sources holding P_K tokens,
  * `L = (N − P_K) DIV (n−K)` and the remainder ρ = (N − P_K) mod (n−K)
  * goes +1 to the ρ smallest-cap uncapped sources (total order by
  * (cap, source) — deterministic). Every step is integer floor
  * arithmetic; budget ≥ Σ cap degenerates to alloc = cap (leftover
  * budget reported by the Σ-invariant, spec-pinned).
  *
  * Scale shape: ONE corpus-scale map-side-combinable token-count
  * aggregation to the per-source grid; the waterfill runs as window +
  * 1-row-stat arithmetic over that SOURCE-cardinality frame — the
  * bounded-grid class (a training mix has tens to thousands of
  * sources, never corpus-scale), so the single-task window is over
  * grid rows by construction. */
object UniMax {

  /** `(groupCol, avail, cap, alloc, epochs_e6)` — the waterfilled
    * allocation for budget `N = total·budgetNum DIV budgetDen` (the
    * budget derives from the SAME scan both engines see, so the oracle
    * replays it) under `alloc ≤ maxEpochs·avail`. */
  def allocate(corpus: DataFrame, groupCol: String, tokenCount: Column,
      budgetNum: Long, budgetDen: Long, maxEpochs: Int): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0, "budget ratio must be positive")
    require(maxEpochs >= 1 && maxEpochs <= 1000,
      s"maxEpochs $maxEpochs outside [1, 1000]")
    Reserved.guard(Seq(groupCol),
      Seq("avail", "cap", "alloc", "epochs_e6", "i", "p", "nn", "tot",
        "budget", "capped", "pk", "k", "n2", "b2", "unc_rank"), "UniMax")
    val grid = corpus
      .filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(sum(tokenCount).as("avail"))
      .filter(col("avail") > 0)
      .withColumn("cap", col("avail") * maxEpochs)
    val w = Window.orderBy(col("cap"), col(groupCol))
    val ranked = grid
      .withColumn("i", row_number().over(w))
      .withColumn("p", sum(col("cap")).over(w))
    // N derives from TOTAL AVAILABLE tokens (Σ avail), not Σ cap
    val totals = ranked.agg(count(lit(1)).as("nn"),
      sum(col("avail")).as("tot"))
    val st = ranked.crossJoin(broadcast(totals))
      .withColumn("budget", expr(s"tot * ${budgetNum}L DIV ${budgetDen}L"))
      .withColumn("capped",
        col("p") + col("cap") * (col("nn") - col("i")) <= col("budget"))
    val pool = st.agg(
      sum(when(col("capped"), col("cap")).otherwise(0L)).as("pk"),
      sum(when(col("capped"), 1L).otherwise(0L)).as("k"),
      first(col("nn")).as("n2"), first(col("budget")).as("b2"))
    val out = st.crossJoin(broadcast(pool))
      .withColumn("unc_rank",
        when(col("capped"), lit(null).cast("long"))
          .otherwise(col("i") - col("k"))) // uncapped keep cap order
      .withColumn("alloc",
        when(col("k") === col("n2"), col("cap")) // budget ≥ Σ cap
          .otherwise(when(col("capped"), col("cap"))
            .otherwise(least(col("cap"),
              expr("(b2 - pk) DIV (n2 - k)") +
                when(col("unc_rank") <= expr("(b2 - pk) % (n2 - k)"), 1L)
                  .otherwise(0L)))))
    out.select(col(groupCol), col("avail"), col("cap"), col("alloc"),
      expr("alloc * 1000000L DIV avail").as("epochs_e6"))
  }
}
