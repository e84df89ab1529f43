package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chapman capture–recapture estimator (r16, L191; Chapman 1951,
  * Univ. Calif. Publ. Stat. 1; Seber 1982 §3.1.1 — the
  * COVERAGE-ESTIMATION layer a dedup pipeline lacks: after a near-dup
  * pass, "how many duplicate pairs are still out there" is a
  * population-size question, and two detectors with independent
  * misses answer it exactly the way two wildlife surveys do. With
  * catch sizes n_A, n_B and overlap m,
  *   N̂ = (n_A+1)(n_B+1)/(m+1) − 1
  * (Chapman's bias-corrected form of Lincoln–Petersen — finite for
  * m = 0 where LP divides by zero), with
  *   Var(N̂) = (n_A+1)(n_B+1)(n_A−m)(n_B−m) / ((m+1)²(m+2)).
  *
  * Exact-integer contract: both emissions are single truncating
  * divisions of exact integer products —
  *   nhat_e6 = ⌊10⁶(n_A+1)(n_B+1)/(m+1)⌋ − 10⁶
  *   var_e6  = ⌊10⁶(n_A+1)(n_B+1)(n_A−m)(n_B−m)/((m+1)²(m+2))⌋
  * in DECIMAL(38,0) via [[Exact.dfloor]] (capacity
  * n_A·n_B·n_A·n_B·10⁶ ⇒ catches to ~10⁷ pairs each; beyond that
  * drop the 10⁶ scale — stated). The quotients themselves must fit
  * the LONG output columns: N̂ ≤ 9.2·10¹² (an m = 0 overlap with
  * ≳3·10⁶-pair catches crosses it and emits NULL rather than a
  * wrapped number — SQL `div` would have wrapped silently; r17
  * sweep).
  *
  * Assumption stated honestly (Seber §3.2): the estimator is
  * unbiased only under INDEPENDENT catches — two real detectors
  * that share an easy-pair bias (MinHash and SimHash both catch
  * near-identical docs first) correlate positively and N̂
  * under-reads; it is a lower-bound audit in that regime, which is
  * still the useful direction ("at least this many remain").
  *
  * Scale shape: two distinct()s and one equi-join on the key columns
  * (hash-partitioned, catch-sized — catches are pair LISTS, orders
  * of magnitude smaller than the corpus), three 1-row aggregates
  * crossJoined (the documented 1-row broadcast class). */
object CaptureRecapture {

  /** Chapman estimate over two catch frames sharing `keyCols`:
    * one row (n_a, n_b, n_both, nhat_e6, var_e6). */
  def chapman(catchA: DataFrame, catchB: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be nonempty")
    Reserved.guard(Seq.empty,
      Seq("n_a", "n_b", "n_both", "nhat_e6", "var_e6"),
      "CaptureRecapture")
    val d38 = "decimal(38,0)"
    val a = catchA.select(keyCols.map(col): _*)
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _)).distinct()
    val b = catchB.select(keyCols.map(col): _*)
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _)).distinct()
    val na = a.agg(count(lit(1)).as("n_a"))
    val nb = b.agg(count(lit(1)).as("n_b"))
    val nm = a.join(b, keyCols).agg(count(lit(1)).as("n_both"))
    val a1 = (col("n_a") + 1L).cast(d38)
    val b1 = (col("n_b") + 1L).cast(d38)
    val m1 = (col("n_both") + 1L).cast(d38)
    // exact decimal floors (r17 sweep, the JT div-to-LONG class): at
    // m = 0 the N̂ quotient is 10⁶(n_A+1)(n_B+1), past Long once
    // n_A·n_B ≳ 9.2·10¹² — inside the stated ~10⁷-catch envelope,
    // where SQL `div` would wrap silently. With dfloor the emission
    // is exact wherever nhat_e6 itself is representable (N̂ ≤
    // 9.2·10¹² — beyond that the LONG output column is the honest
    // bound, stated in the object doc)
    na.crossJoin(nb).crossJoin(nm)
      .select(col("n_a"), col("n_b"), col("n_both"),
        (Exact.dfloor(lit(1000000L).cast(d38) * a1 * b1, m1)
          .cast("long") - 1000000L).as("nhat_e6"),
        Exact.dfloor(
          lit(1000000L).cast(d38) * a1 * b1 *
            (col("n_a") - col("n_both")).cast(d38) *
            (col("n_b") - col("n_both")).cast(d38),
          m1 * m1 * (col("n_both") + 2L).cast(d38))
          .cast("long").as("var_e6"))
  }
}
