package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Concentration (Gini / Lorenz) of contribution mass (r14, L155;
  * Gini 1912, the discrete mean-difference form) — "how concentrated
  * is the corpus across sources/domains/documents", the curation
  * report that decides whether a mixture is one crawl wearing twenty
  * hostnames: Gini 0 = perfectly even contribution, → 1 = one unit
  * owns everything. The distributional sibling of [[Diversity]]
  * (entropy asks "how many effective categories", Gini asks "how
  * unequal are their masses").
  *
  * Integer-exact (quantize-once): with per-unit masses x₍ᵢ₎ sorted
  * ascending (rank i = 1..n) and S = Σx, the discrete Gini is
  *   G = (2·Σ i·x₍ᵢ₎ − (n+1)·S) / (n·S)
  * — ONE quantization `gini_e6 = div(10⁶·(2Σix − (n+1)S), n·S)` in
  * DECIMAL(38,0). Zero-mass units count as units (they stretch the
  * Lorenz curve — dropping them would understate concentration);
  * S = 0 or a single unit emits NULL (no inequality is defined).
  *
  * Scale shape — the q_qr16 distinct-value-grid trick, NOT a per-unit
  * rank window: a doc-granularity Gini has corpus-many units, and a
  * per-unit row_number would sort one hot group's whole unit set in a
  * single window task (the L79 failure class). Instead the rank sum
  * collapses over ties: for mass value v with multiplicity c and C
  * units strictly below, Σ ranks·v = v·(2cC + c² + c)/2 — so
  *   2·Σ i·x₍ᵢ₎ = Σ_v v·(2cC + c² + c)
  * needs only the per-(group, VALUE) counts and ONE cumulative window
  * over the distinct-value grid (bounded by the value domain, never
  * by unit count). Pipeline: per-unit mass aggregation (hash agg,
  * map-side combinable) → value-grid counts → 1-PRECEDING cumulative
  * window → grid aggregation. Tie order is free by construction.
  * Capacity (re-derived, r14 self-review — the FINAL quantization
  * binds, not the per-cell term): 10⁶·n·S < 10³⁸ needs
  * n_units·total_mass ≤ 10³¹ per group — e.g. 10¹² units averaging
  * 10¹⁹ mass, or 10¹⁵ units of 10¹⁶; orders past any corpus,
  * documented not guarded. */
object Concentration {

  /** Per-group Gini over per-unit masses: (groupCol, n_units, total,
    * gini_e6). `massCol` is summed per (group, unit) — pass `lit(1L)`
    * to weigh by row count. Null groups/units drop; null masses count
    * as 0. */
  def gini(df: DataFrame, groupCol: String, unitCol: String,
      massCol: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    Reserved.guard(Seq(groupCol),
      Seq("n_units", "total", "gini_e6"), "Concentration")
    val masses = df
      .filter(col(groupCol).isNotNull && col(unitCol).isNotNull)
      .groupBy(col(groupCol), col(unitCol))
      .agg(sum(coalesce(massCol, lit(0L))).as("__x"))
    val grid = masses.groupBy(col(groupCol), col("__x"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__x").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val withC = grid.withColumn("__cb",
      coalesce(sum(col("__c")).over(w), lit(0L)))
    val c = col("__c").cast(d38)
    val cb = col("__cb").cast(d38)
    val v = col("__x").cast(d38)
    val agg = withC.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n_units"),
        sum(col("__x").cast(d38) * c).as("__s"),
        sum(v * (lit(2L).cast(d38) * c * cb + c * c + c)).as("__twoix"))
    val n = col("n_units").cast(d38)
    agg.select(col(groupCol), col("n_units"),
      col("__s").cast("long").as("total"),
      when(col("n_units") < 2L || col("__s") <= 0L,
        lit(null).cast("long"))
        .otherwise(call_function("div",
          (col("__twoix") - (n + lit(1L).cast(d38)) * col("__s"))
            * lit(1000000L).cast(d38),
          n * col("__s"))).as("gini_e6"))
  }

  /** DuckDB replay of [[gini]] — `srcSql` yields (g, unit, mass);
    * generator-beside-operator (the L151 convention), same
    * tie-collapsed rank-sum identity. */
  def giniOracleSql(srcSql: String, gAlias: String = "g"): String =
    s"""(WITH src AS ($srcSql),
          m AS (SELECT g, unit,
                CAST(SUM(COALESCE(mass, 0)) AS BIGINT) AS x
              FROM src WHERE g IS NOT NULL AND unit IS NOT NULL
              GROUP BY g, unit),
          grid AS (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c
              FROM m GROUP BY g, x),
          cum AS (SELECT g, x, c,
                COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY x ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cb
              FROM grid),
          a AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_units,
                CAST(SUM(x * c) AS BIGINT) AS total,
                SUM(CAST(x AS HUGEINT)
                  * (2 * CAST(c AS HUGEINT) * cb + c * c + c)) AS twoix
              FROM cum GROUP BY g)
         SELECT g AS $gAlias, n_units, total,
                CAST(CASE WHEN n_units < 2 OR total <= 0 THEN NULL
                  ELSE (twoix
                      - (CAST(n_units AS HUGEINT) + 1) * total)
                    * 1000000 // (CAST(n_units AS HUGEINT) * total)
                END AS BIGINT) AS gini_e6
         FROM a)"""
}
