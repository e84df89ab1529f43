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

  /** Per-user (tenure, event) durations from an epoch-micros activity
    * stream: tenure in days, event = 1 iff churn observed under the
    * `gapDays` closing-window protocol. Null users/timestamps drop. */
  def durations(df: DataFrame, userCol: String, usCol: Column,
      gapDays: Int): DataFrame = {
    require(gapDays >= 1, s"gapDays $gapDays must be >= 1")
    Reserved.guard(Seq(userCol), Seq("__day", "__first", "__last",
      "__maxd", "tenure", "event"), "Survival")
    val dayUs = 86400000000L
    val us = usCol.cast("long")
    val days = df.filter(col(userCol).isNotNull && us.isNotNull)
      .select(col(userCol), (us - pmod(us, lit(dayUs))).as("__d0"))
      .select(col(userCol), expr("__d0 DIV 86400000000").as("__day"))
    val perUser = days.groupBy(col(userCol))
      .agg(min(col("__day")).as("__first"), max(col("__day")).as("__last"))
    val horizon = perUser.agg(max(col("__last")).as("__maxd"))
    perUser.crossJoin(broadcast(horizon))
      .select(col(userCol),
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
