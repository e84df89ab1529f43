package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier churn survival over an event stream (Kaplan & Meier
  * 1958, JASA 53 — the product-limit estimator, THE retention curve
  * under right-censoring): "what fraction of users survive past
  * tenure t", where users still active near the stream's end must be
  * CENSORED, not counted as churned — the bias [[Retention]]'s plain
  * cohort counts cannot remove is exactly what the risk-set
  * construction removes.
  *
  * Churn protocol (deterministic, engine-portable): per user,
  * tenure = last_day − first_day; the churn is OBSERVED (event = 1)
  * iff the user's last activity precedes the stream's final `gapDays`
  * days (no activity in the closing window ⇒ really gone), else the
  * user is censored at their tenure (event = 0). The estimator
  * Ŝ(t) = Π_{u ≤ t} (n_u − d_u)/n_u is a PRODUCT of exact LONG
  * rationals — so the engine-portable form is the LOG-survival
  *   lnS_e9(t) = Σ_{u ≤ t, d_u > 0} lnE9(n_u − d_u, n_u)
  * through the L151 fixed-point table ([[Drift.withTableLn]] — its
  * FOURTH consumer): every term is an integer both engines replay
  * exactly; d_u = 0 steps hit mantissa cell 0 and contribute an EXACT
  * 0. Nonpositive and nonincreasing by construction. When a step
  * empties the risk set (n_u = d_u, Ŝ hits 0), log-survival has no
  * finite value: that step and every later one emit NULL — the honest
  * boundary, pinned, never a sentinel. Table under-read bound: each
  * step floors by < ln(257/256) ≈ 3.9e-3 nats (the L159 statement);
  * steps compose additively, so the curve reads at most
  * 3.9e-3·#event-steps below the float estimator — grid-sized, stated.
  *
  * Scale shape: ONE map-side-combinable per-user (first, last) agg
  * collapses the corpus to the user grid; the tenure grid is an agg of
  * THAT; risk sets are one per-grid suffix-sum window and the curve
  * one prefix-sum window — both bounded by the day span, never by
  * users; the ln is narrow integer math on grid rows. */
object Survival {

  /** Per-user (first_day, tenure, event) durations from an
    * epoch-micros activity stream: tenure in days, event = 1 iff churn
    * observed under the `gapDays` closing-window protocol; first_day
    * carried for entry-cohort splits (the [[logRank]] consumers).
    * Null users/timestamps drop. */
  def durations(df: DataFrame, userCol: String, usCol: Column,
      gapDays: Int): DataFrame = {
    require(gapDays >= 1, s"gapDays $gapDays must be >= 1")
    Reserved.guard(Seq(userCol), Seq("__day", "__first", "__last",
      "__maxd", "tenure", "event", "first_day"), "Survival")
    val dayUs = 86400000000L
    val us = usCol.cast("long")
    val days = df.filter(col(userCol).isNotNull && us.isNotNull)
      .select(col(userCol), (us - pmod(us, lit(dayUs))).as("__d0"))
      .select(col(userCol), expr("__d0 DIV 86400000000").as("__day"))
    val perUser = days.groupBy(col(userCol))
      .agg(min(col("__day")).as("__first"), max(col("__day")).as("__last"))
    val horizon = perUser.agg(max(col("__last")).as("__maxd"))
    perUser.crossJoin(broadcast(horizon))
      .select(col(userCol), col("__first").as("first_day"),
        (col("__last") - col("__first")).as("tenure"),
        (col("__last") < col("__maxd") - (gapDays - 1).toLong)
          .cast("long").as("event"))
  }

  /** The product-limit curve from a (durCol, eventCol) frame: one row
    * per distinct tenure with (t, n_risk, d, c, ln_s_e9) — d churn
    * events, c censorings, lnS cumulative THROUGH t. */
  def kaplanMeier(df: DataFrame, durCol: String,
      eventCol: String): DataFrame = {
    Reserved.guard(Seq(durCol, eventCol), Seq("t", "n_risk", "d", "c",
      "__tot", "__zero", "__lnnum", "__lnden", "__lnln", "__step"),
      "Survival")
    val grid = df
      .filter(col(durCol).isNotNull && col(eventCol).isNotNull)
      .select(col(durCol).cast("long").as("t"),
        col(eventCol).cast("long").as("event"))
      .groupBy(col("t"))
      .agg(sum(col("event")).as("d"),
        sum(lit(1L) - col("event")).as("c"),
        count(lit(1)).as("__tot"))
    val suffix = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withRisk = grid.withColumn("n_risk", sum(col("__tot")).over(suffix))
    // guard the ln against an emptied risk set BEFORE the table lookup
    // (mantissa index −256 would be out of the table's domain)
    val guarded = withRisk
      .withColumn("__lnnum", greatest(col("n_risk") - col("d"), lit(1L)))
      .withColumn("__lnden", col("n_risk"))
    val withLn = Drift.withTableLn(guarded, "__ln")
      .withColumn("__step",
        when(col("n_risk") === col("d"), lit(null).cast("long"))
          .otherwise(col("__lnln")))
    val prefix = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withLn
      .withColumn("__zero", max((col("n_risk") === col("d")).cast("int"))
        .over(prefix))
      .withColumn("ln_s_e9",
        when(col("__zero") === 1, lit(null).cast("long"))
          .otherwise(sum(col("__step")).over(prefix)))
      .select(col("t"), col("n_risk"), col("d"), col("c"), col("ln_s_e9"))
  }

  /** Two-sample log-rank test (Mantel 1966, Cancer Chemother. Rep. 50;
    * Peto & Peto 1972 JRSS A) — "do these two cohorts CHURN
    * differently", the hypothesis test over two [[kaplanMeier]]
    * curves: at each event time the hypergeometric expectation
    * e_A(t) = d_t·n_{A,t}/n_t and variance
    * v(t) = d_t·(n_A/n_t)·(1 − n_A/n_t)·(n_t − d_t)/(n_t − 1), and
    *   z² = (O_A − E_A)² / V  ~  χ²₁ under H₀.
    *
    * Quantization contract (the L157 cascade stance): per event time
    *   e_e6 = div(10⁶·d·n_A, n),
    *   v_e6 = div(10⁶·d·n_A·(n − n_A)·(n − d), n·n·(n − 1))
    * (n = 1 ⇒ v term 0 — the lone-survivor tail), then
    *   z2_e6 = div(oe², ΣV) with oe = 10⁶·O_A − Σe_e6
    * — exactly 10⁶·z² by units (oe² carries 10¹², ΣV carries 10⁶).
    * d_sign = sign(oe): +1 ⇒ cohort A churns MORE than expected.
    * The e-floor sits on cohort A's SIDE, so swapping the labels
    * agrees only to ~1e-6 per event time (the exact statistic is
    * label-symmetric; the quantized one is spec-pinned to within
    * that bound) — pick the label order once and keep it.
    * Degenerate conventions: either cohort empty ⇒ NULL (nothing to
    * compare); ΣV = 0 with both cohorts present (no shared event
    * time) ⇒ z² NULL, sig 0. Verdict vs [[Funnel.Chi2Crit95E6]].
    * Capacity: 10⁶·d·n_A·(n−n_A)·(n−d) ≤ 10⁶·N⁴ ⇒ N ≤ ~4·10⁷ users
    * per panel (the L157 bound).
    *
    * Scale shape: ONE (panel, t) aggregation with BOTH cohorts'
    * d/tot as conditional sums (two cohorts ⇒ inline pivot, no dense
    * group×time cross join); risk sets are two per-panel suffix-sum
    * windows over the time grid; the test is one grid aggregation. */
  def logRank(df: DataFrame, panelCol: String, groupCol: String,
      durCol: String, eventCol: String, groupA: String,
      groupB: String): DataFrame = {
    require(groupA != groupB, "cohort labels must differ")
    Reserved.guard(Seq(panelCol),
      Seq("__g", "__t", "__ev", "__da", "__db", "__ta", "__tb",
        "__na", "__nb", "__e", "__v", "n_a", "n_b", "o_a", "e_a_e6",
        "z2_e6", "d_sign", "sig"),
      "Survival")
    val d38 = "decimal(38,0)"
    val base = df
      .filter(col(panelCol).isNotNull && col(groupCol).isNotNull &&
        col(durCol).isNotNull && col(eventCol).isNotNull)
      .select(col(panelCol), col(groupCol).cast("string").as("__g"),
        col(durCol).cast("long").as("__t"),
        col(eventCol).cast("long").as("__ev"))
      .filter(col("__g").isin(groupA, groupB))
    val cells = base.groupBy(col(panelCol), col("__t"))
      .agg(sum(when(col("__g") === groupA, col("__ev"))
          .otherwise(0L)).as("__da"),
        sum(when(col("__g") === groupB, col("__ev"))
          .otherwise(0L)).as("__db"),
        sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("__ta"),
        sum(when(col("__g") === groupB, 1L).otherwise(0L)).as("__tb"))
    val suffix = Window.partitionBy(col(panelCol)).orderBy(col("__t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risk = cells
      .withColumn("__na", sum(col("__ta")).over(suffix))
      .withColumn("__nb", sum(col("__tb")).over(suffix))
    val d = col("__da") + col("__db")
    val n = col("__na") + col("__nb")
    val e = call_function("div",
      lit(1000000L).cast(d38) * d.cast(d38) * col("__na").cast(d38),
      n.cast(d38))
    val v = when(n <= 1L, lit(0L).cast(d38))
      .otherwise(call_function("div",
        lit(1000000L).cast(d38) * d.cast(d38) * col("__na").cast(d38)
          * col("__nb").cast(d38) * (n - d).cast(d38),
        n.cast(d38) * n.cast(d38) * (n - lit(1L)).cast(d38)))
    val perPanel = risk
      .withColumn("__e", when(d > 0L, e).otherwise(lit(0L).cast(d38)))
      .withColumn("__v", when(d > 0L, v).otherwise(lit(0L).cast(d38)))
      .groupBy(col(panelCol))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(col("__da")).as("o_a"),
        sum(col("__e")).as("__se"), sum(col("__v")).as("__sv"))
    val oe = lit(1000000L).cast(d38) * col("o_a").cast(d38) -
      col("__se")
    perPanel
      .withColumn("e_a_e6", col("__se").cast("long"))
      .withColumn("z2_e6",
        when(col("n_a") === 0L || col("n_b") === 0L,
          lit(null).cast("long"))
          .when(col("__sv") === lit(0L).cast(d38),
            lit(null).cast("long"))
          .otherwise(call_function("div", oe * oe, col("__sv"))
            .cast("long")))
      .withColumn("d_sign",
        when(col("n_a") === 0L || col("n_b") === 0L,
          lit(null).cast("long"))
          .otherwise(signum(oe).cast("long")))
      .withColumn("sig",
        (col("z2_e6").isNotNull && col("z2_e6") >= Funnel.Chi2Crit95E6)
          .cast("long"))
      .select(col(panelCol), col("n_a"), col("n_b"), col("o_a"),
        col("e_a_e6"), col("z2_e6"), col("d_sign"), col("sig"))
  }

  /** The DuckDB replay of [[kaplanMeier]] — generated WITH-chain over
    * `durSql` (a SELECT yielding `t`, `ev` rows), embedding the same
    * [[Drift.MantissaLnE9]] literals, `bin()` range reduction, the
    * risk-set suffix sum, the emptied-risk-set NULL gate and the
    * prefix accumulation. Kept beside the operator so curve and
    * replay cannot drift apart. */
  def kaplanMeierOracleSql(durSql: String): String = {
    val table = Drift.MantissaLnE9.mkString("[", ",", "]")
    s"""(WITH dur AS ($durSql),
          grid AS (SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
                CAST(SUM(1 - ev) AS BIGINT) AS c,
                CAST(COUNT(*) AS BIGINT) AS tot
              FROM dur GROUP BY t),
          rk AS (SELECT *, CAST(SUM(tot) OVER (ORDER BY t
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS n_risk
              FROM grid),
          g2 AS (SELECT *, GREATEST(n_risk - d, 1) AS num,
                n_risk AS den FROM rk),
          k0 AS (SELECT *, CAST(LENGTH(bin(num)) - LENGTH(bin(den))
                AS BIGINT) AS kz FROM g2),
          kk AS (SELECT *, CASE WHEN
                CAST(num AS HUGEINT)
                  * CAST(power(2, GREATEST(-kz, 0)) AS HUGEINT)
                < CAST(den AS HUGEINT)
                  * CAST(power(2, GREATEST(kz, 0)) AS HUGEINT)
                THEN kz - 1 ELSE kz END AS k FROM k0),
          m AS (SELECT *,
                (CAST(num AS HUGEINT)
                   * CAST(power(2, GREATEST(-k, 0)) AS HUGEINT) * 256)
                // (CAST(den AS HUGEINT)
                   * CAST(power(2, GREATEST(k, 0)) AS HUGEINT)) - 256
                AS mi FROM kk),
          l AS (SELECT *, k * ${Drift.Ln2E9}
                + ($table)[CAST(mi AS INT) + 1] AS lnv FROM m),
          st AS (SELECT *,
                CASE WHEN n_risk = d THEN NULL ELSE lnv END AS step,
                MAX(CASE WHEN n_risk = d THEN 1 ELSE 0 END)
                  OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS zero
              FROM l)
         SELECT t, n_risk, d, c,
                CAST(CASE WHEN zero = 1 THEN NULL
                     ELSE SUM(step) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                END AS BIGINT) AS ln_s_e9
         FROM st)"""
  }
}
