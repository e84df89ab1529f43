package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact mass-weighted quantiles (r14, L156) — "the length of the
  * document that contains the median CHARACTER": quantiles of a value
  * weighted by a mass column, the corpus-report statistic that
  * differs wildly from the plain per-doc quantile whenever mass is
  * skewed (a handful of huge documents carry most of the tokens — the
  * p50 doc is short, the p50 TOKEN lives in a long one). Plain
  * quantiles are the w ≡ 1 special case (spec-pinned against the
  * established exact-quantile operator).
  *
  * Definition (lower weighted quantile, exact): for target q (ppm)
  * and total mass W, the answer is the SMALLEST value whose
  * cumulative mass reaches the ceiling threshold
  * `t = div(W·q + 999999, 10⁶)` — ceil(q·W) in pure integers, so
  * q = 10⁶ gives the max and the conventions replay identically in
  * the oracle (W·q computed in DECIMAL(38,0) — a LONG product wraps
  * past W ≈ 9.2·10¹², which a corpus-wide character mass crosses;
  * r14 self-review). Rows with null/≤0 masses drop (they cannot carry
  * quantile mass); a group with no positive mass emits no rows;
  * per-group W itself must fit a LONG (≤ 9.2·10¹⁸, documented).
  *
  * Scale shape — the q_qr16/q_qr20 distinct-value-grid discipline:
  * corpus collapses map-side to (group, value, mass) grid cells, ONE
  * cumulative window per group runs over the DISTINCT-VALUE grid
  * (bounded by the value domain, never by row count — no hot group
  * ever sorts its raw rows), the |qs|-fold expansion happens on grid
  * rows via a literal array explode, and the winner per (group, q)
  * is a MIN aggregation, not another window. */
object WeightedQuantiles {

  /** (groupCol, q_ppm, w_total, value) per group × requested
    * quantile. `qsPpm` values must lie in (0, 10⁶]. */
  def quantiles(df: DataFrame, groupCol: String, valueCol: String,
      massCol: Column, qsPpm: Seq[Long]): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q > 0L && q <= 1000000L),
      s"quantiles $qsPpm outside (0, 1e6]")
    require(qsPpm.distinct.size == qsPpm.size, s"duplicate quantiles in $qsPpm")
    Reserved.guard(Seq(groupCol),
      Seq("q_ppm", "w_total", "value"), "WeightedQuantiles")
    val grid = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull
        && massCol.isNotNull && massCol > 0L)
      .groupBy(col(groupCol), col(valueCol).as("value"))
      .agg(sum(massCol).as("__w"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("value").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val tot = grid.groupBy(col(groupCol).as("__tg"))
      .agg(sum(col("__w")).as("__wt"))
    val cum = grid
      .withColumn("__cw", sum(col("__w")).over(w))
      .join(tot, col(groupCol) === col("__tg"))
      .withColumn("q_ppm",
        explode(array(qsPpm.sorted.map(lit): _*)))
    // W·q in DECIMAL before the multiply (r14 self-review): two LONGs
    // would silently wrap past W ≈ 9.2·10¹² — a 100 TB char-mass
    // total crosses that
    val d38 = "decimal(38,0)"
    val threshold = call_function("div",
      col("__wt").cast(d38) * col("q_ppm").cast(d38)
        + lit(999999L).cast(d38), lit(1000000L).cast(d38))
    cum.filter(col("__cw") >= threshold)
      .groupBy(col(groupCol), col("q_ppm"))
      .agg(max(col("__wt")).as("w_total"), min(col("value")).as("value"))
      .select(col(groupCol), col("q_ppm"), col("w_total"), col("value"))
  }

  /** DuckDB replay of [[quantiles]] — `srcSql` yields (g, value,
    * mass); same grid, window, ceiling and min-winner. */
  def quantilesOracleSql(srcSql: String, qsPpm: Seq[Long],
      gAlias: String = "g"): String = {
    val qs = qsPpm.sorted.mkString("[", ",", "]")
    s"""(WITH src AS ($srcSql),
          grid AS (SELECT g, value, CAST(SUM(mass) AS BIGINT) AS w
              FROM src
              WHERE g IS NOT NULL AND value IS NOT NULL
                AND mass IS NOT NULL AND mass > 0
              GROUP BY g, value),
          c AS (SELECT g, value, SUM(w) OVER (PARTITION BY g
                ORDER BY value ASC ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cw,
                SUM(w) OVER (PARTITION BY g) AS wt
              FROM grid),
          x AS (SELECT g, value, cw, wt, UNNEST($qs) AS q_ppm FROM c)
         SELECT g AS $gAlias, q_ppm, CAST(MAX(wt) AS BIGINT) AS w_total,
                MIN(value) AS value
         FROM x
         WHERE cw >= (CAST(wt AS HUGEINT) * q_ppm + 999999) // 1000000
         GROUP BY g, q_ppm)"""
  }
}
