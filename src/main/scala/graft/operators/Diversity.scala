package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Category-mix diversity panel (r14, L154) — per-group Shannon
  * entropy and Pielou evenness of a categorical column (the
  * language-mix / source-mix balance question a corpus audit asks
  * next to the drift panel), computed EXACTLY with the L151 integer
  * log table so the oracle replays it bit for bit — the second
  * consumer of [[Drift.MantissaLnE9]], demonstrating the table as a
  * reusable primitive rather than a one-query trick.
  *
  * Identity used: H = ln N − (Σ nᵢ·ln nᵢ)/N over category counts nᵢ
  * (all logs of INTEGERS — so the range reduction specializes: for
  * n ≥ 1, 2^(bitlen−1) ≤ n < 2^bitlen means k = bitlen(n)−1 needs NO
  * correction step and the mantissa cell is
  * `div(256·n, 2^k) − 256` directly). `lnIntE9(n) = k·ln2_e9 +
  * T[cell]`, the quantizations are `div(Σ nᵢ·lnIntE9(nᵢ), N)` and the
  * evenness `div(10⁶·entropy_e9, lnIntE9(K))` (NULL at K = 1, where
  * evenness is undefined and entropy is exactly 0).
  *
  * Defined approximation, documented: the mantissa floor under-reads
  * each ln by < ln(1+1/256) ≈ 3.9·10⁻³ nats, so entropy_e9 sits
  * within ±3.9·10⁻³ nats of true Shannon entropy (spec-measured) and
  * can read slightly NEGATIVE for a near-degenerate mix whose true
  * entropy is below the table's resolution — deterministic,
  * engine-identical, and stated rather than clamped (a clamp would
  * hide exactly the near-zero reads the statistic is for).
  *
  * Capacity: Σ nᵢ·lnIntE9(nᵢ) stays < 10³⁸ for any corpus < 10²⁵
  * rows (DECIMAL(38,0) sum); nᵢ itself must fit a LONG. Scale: one
  * map-side-combinable (group, category) count, one grid aggregation
  * per group. */
object Diversity {

  /** Table ln of a positive INTEGER column at e9 (see object doc). */
  private[graft] def lnIntE9(n: Column): Column = {
    val d38 = "decimal(38,0)"
    val k = (length(bin(n)) - 1).cast("long")
    val cell = call_function("div",
      n.cast(d38) * lit(256L).cast(d38),
      pow(lit(2.0), k.cast("double")).cast(d38)) - 256L
    k * Drift.Ln2E9 +
      element_at(typedlit(Drift.MantissaLnE9), cell.cast("int") + 1)
  }

  /** Per-group panel: (groupCol, n_rows, n_cats, entropy_e9,
    * evenness_ppm). Null groups/categories drop. */
  def entropyExact(df: DataFrame, groupCol: String,
      catCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Reserved.guard(Seq(groupCol),
      Seq("n_rows", "n_cats", "entropy_e9", "evenness_ppm"),
      "Diversity")
    val counts = df
      .filter(col(groupCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("__ni"))
    val agg = counts.groupBy(col(groupCol))
      .agg(sum(col("__ni")).as("n_rows"),
        count(lit(1)).as("n_cats"),
        sum(col("__ni").cast(d38) * lnIntE9(col("__ni")).cast(d38))
          .as("__s"))
    val entropy = lnIntE9(col("n_rows")) -
      call_function("div", col("__s"), col("n_rows").cast(d38))
    agg.withColumn("entropy_e9", entropy)
      .select(col(groupCol), col("n_rows"), col("n_cats"),
        col("entropy_e9"),
        when(col("n_cats") === 1L, lit(null).cast("long"))
          .otherwise(call_function("div",
            col("entropy_e9").cast(d38) * lit(1000000L).cast(d38),
            lnIntE9(col("n_cats")).cast(d38))).as("evenness_ppm"))
  }

  /** DuckDB replay of [[entropyExact]] — `srcSql` yields (g, cat);
    * embeds the SAME table (generator-beside-operator, the L151
    * convention). */
  def entropyExactOracleSql(srcSql: String,
      gAlias: String = "g"): String = {
    val table = Drift.MantissaLnE9.mkString("[", ",", "]")
    def lnInt(n: String): String =
      s"(CAST(LENGTH(bin($n)) AS BIGINT) - 1) * ${Drift.Ln2E9}" +
        s" + ($table)[CAST((CAST($n AS HUGEINT) * 256)" +
        s" // CAST(power(2, LENGTH(bin($n)) - 1) AS HUGEINT)" +
        s" - 256 AS INT) + 1]"
    s"""(WITH src AS ($srcSql),
          c AS (SELECT g, cat, CAST(COUNT(*) AS BIGINT) AS ni
              FROM src WHERE g IS NOT NULL AND cat IS NOT NULL
              GROUP BY g, cat),
          l AS (SELECT g, ni, ${lnInt("ni")} AS ln_i FROM c),
          t AS (SELECT g, CAST(SUM(ni) AS BIGINT) AS n_rows,
                CAST(COUNT(*) AS BIGINT) AS n_cats,
                SUM(CAST(ni AS HUGEINT) * ln_i) AS s
              FROM l GROUP BY g),
          e AS (SELECT g, n_rows, n_cats,
                ${lnInt("n_rows")}
                  - CAST(s // CAST(n_rows AS HUGEINT) AS BIGINT)
                  AS entropy_e9
              FROM t)
         SELECT g AS $gAlias, n_rows, n_cats, entropy_e9,
                CAST(CASE WHEN n_cats = 1 THEN NULL
                  ELSE (CAST(entropy_e9 AS HUGEINT) * 1000000)
                    // (${lnInt("n_cats")})
                END AS BIGINT) AS evenness_ppm
         FROM e)"""
  }
}
