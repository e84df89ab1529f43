package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benford first-digit goodness-of-fit (r14, L153) — the significance
  * upgrade of the q_qr8 panel row: q_qr8 EMITS the first-digit
  * distribution, this one scores it against Benford's law (Newcomb
  * 1881, Benford 1938: P(d) = log₁₀(1 + 1/d)) with Pearson's χ² on
  * 8 degrees of freedom — the standard synthetic-data / fabricated-
  * numbers smell test, as a verdict instead of an eyeball.
  *
  * Integer-exact in the L151 constant discipline: the nine expected
  * shares are STRICTMATH-generated constants at e6 ([[DigitPE6]] for
  * the χ² arithmetic) and e9 ([[DigitPE9]] for inverse-CDF sampling,
  * where nothing squares) — the same literal integers on both
  * engines, no runtime log anywhere. Each digit's χ² term is ONE
  * quantization `term_e6 = div((o_d·10⁶ − N·p_e6)², N·p_e6)` in
  * DECIMAL(38,0). The scale choice is load-bearing (r14 self-review):
  * the term SQUARES the e-scaled diff, so e9 shares would overflow
  * 10³⁸ at N ≈ 10⁷ — e6 keeps the squared term < 10³⁸ up to
  * N < 10¹³ rows per leg (documented bound; shard-and-sum beyond).
  * `chi2_e6` is the exact sum of the nine quantized terms
  * (quantize-per-term, stated — the nine divisions do not share a
  * denominator). The verdict compares
  * against the χ²₈ upper-5% point as the integer constant
  * [[Chi2Crit95E6]] (15.507313, Pearson table) — the q_e26
  * integer-vs-constant convention.
  *
  * Semantics: values must be POSITIVE (Benford is a law of positive
  * magnitudes); nulls and non-positives drop, callers floor/cast
  * upstream so the two engines agree on the integer whose decimal
  * rendering supplies the digit (DuckDB CAST(double AS BIGINT)
  * ROUNDS, Spark truncates — the established cross-engine trap,
  * sidestepped by contract). Digits missing from a leg still
  * contribute their expected mass ((0 − Np)²/Np), via the 9-row
  * spine.
  *
  * Scale: one map-side-combinable digit count per leg, a 9-row spine
  * join, a legs-row total broadcast — grid work after one scan. */
object Benford {

  /** `round(10⁹ · log₁₀(1 + 1/d))` for d = 1..9 — StrictMath so the
    * constants are platform-pinned; consumed as literals by BOTH
    * engines (the [[Drift.MantissaLnE9]] discipline). Used for
    * inverse-CDF SAMPLING (q_qr18's null leg), where nothing squares. */
  val DigitPE9: Seq[Long] = (1 to 9).map(d =>
    Math.round(StrictMath.log1p(1.0 / d) / StrictMath.log(10.0) * 1e9))

  /** The e6 rendering of the same shares — the χ² arithmetic scale
    * (see the object doc for why e9 would overflow the squared term). */
  val DigitPE6: Seq[Long] = (1 to 9).map(d =>
    Math.round(StrictMath.log1p(1.0 / d) / StrictMath.log(10.0) * 1e6))

  /** χ²₈ upper 5% point, 15.507313, at e6. */
  val Chi2Crit95E6: Long = 15507313L

  /** Per-leg verdict: (leg, n, chi2_e6, reject_95). `valueCol` must
    * already be a positive integral column (see object doc). */
  def chiSquare(df: DataFrame, legCol: String, valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val spark = df.sparkSession
    val digits = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0L
        && col(legCol).isNotNull)
      .select(col(legCol).as("leg"),
        substring(col(valueCol).cast("long").cast("string"), 1, 1)
          .cast("long").as("digit"))
      .groupBy(col("leg"), col("digit")).agg(count(lit(1)).as("n_d"))
    val spine = digits.select(col("leg")).distinct()
      .crossJoin(broadcast(
        spark.range(1, 10).select(col("id").as("digit"))))
    val full = spine.join(digits, Seq("leg", "digit"), "left")
      .select(col("leg"), col("digit"),
        coalesce(col("n_d"), lit(0L)).as("n_d"))
    val tot = full.groupBy(col("leg")).agg(sum(col("n_d")).as("n"))
    val p = element_at(typedlit(DigitPE6), col("digit").cast("int"))
      .cast(d38)
    val diff = col("n_d").cast(d38) * lit(1000000L).cast(d38) -
      col("n").cast(d38) * p
    val term = call_function("div", diff * diff,
      col("n").cast(d38) * p)
    full.join(tot, Seq("leg"))
      .select(col("leg"), col("n"), term.as("__t"))
      .groupBy(col("leg"), col("n"))
      .agg(sum(col("__t")).as("chi2_e6"))
      .select(col("leg"), col("n"), col("chi2_e6"),
        (col("chi2_e6") > Chi2Crit95E6).cast("long").as("reject_95"))
  }

  /** DuckDB replay of [[chiSquare]] — `srcSql` must yield (leg,
    * value) with value already positive-integral-ready; embeds the
    * SAME [[DigitPE9]] constants (generator-beside-operator, the
    * L151 convention). */
  def chiSquareOracleSql(srcSql: String): String = {
    val table = DigitPE6.mkString("[", ",", "]")
    s"""(WITH v AS ($srcSql),
          d AS (SELECT leg,
                CAST(substring(CAST(value AS VARCHAR), 1, 1) AS BIGINT)
                  AS digit
              FROM v
              WHERE value IS NOT NULL AND value > 0
                AND leg IS NOT NULL),
          o AS (SELECT leg, digit, CAST(COUNT(*) AS BIGINT) AS n_d
              FROM d GROUP BY leg, digit),
          sp AS (SELECT l.leg, g.digit
              FROM (SELECT DISTINCT leg FROM o) l
              CROSS JOIN (SELECT UNNEST(range(1, 10)) AS digit) g),
          f AS (SELECT sp.leg, sp.digit, COALESCE(o.n_d, 0) AS n_d
              FROM sp LEFT JOIN o
                ON o.leg = sp.leg AND o.digit = sp.digit),
          t AS (SELECT leg, CAST(SUM(n_d) AS BIGINT) AS n
              FROM f GROUP BY leg),
          term AS (SELECT f.leg, t.n,
                (CAST(f.n_d AS HUGEINT) * 1000000
                   - CAST(t.n AS HUGEINT)
                     * ($table)[CAST(f.digit AS INT)])
                * (CAST(f.n_d AS HUGEINT) * 1000000
                   - CAST(t.n AS HUGEINT)
                     * ($table)[CAST(f.digit AS INT)])
                // (CAST(t.n AS HUGEINT)
                    * ($table)[CAST(f.digit AS INT)])
                  AS te
              FROM f JOIN t ON t.leg = f.leg),
          s AS (SELECT leg, n, CAST(SUM(te) AS BIGINT) AS chi2_e6
              FROM term GROUP BY leg, n)
         SELECT leg, n, chi2_e6,
                CAST(CASE WHEN chi2_e6 > ${Chi2Crit95E6} THEN 1 ELSE 0
                  END AS BIGINT) AS reject_95
         FROM s)"""
  }
}
