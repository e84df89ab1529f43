package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Autocorrelation function + Ljung–Box whiteness test over the daily
  * event-volume series (r15, L174; Box & Jenkins 1970 §2.1; Ljung &
  * Box 1978, Biometrika 65 — "is this stream's day-to-day volume
  * serially dependent at all"): the WHOLE-SERIES complement of the
  * trend panel — OLS/Theil–Sen ask for a direction, Mann–Kendall for
  * monotonicity, the weekday profile (L143) for one known rhythm;
  * the ACF sees ANY linear dependence structure lag by lag, and
  * Ljung–Box turns the first L lags into one portmanteau verdict.
  * An ingestion stream whose residuals fail whiteness has structure
  * left that volume anomaly screens (L100/L143) should model.
  *
  * Unlike the trend family's sparse series, the ACF needs the
  * REGULAR grid: zero-count days are REAL observations of 0 here
  * (a lag is a distance in days, not in observed rows), so the
  * series is gap-filled over [min_day, max_day] per group before
  * anything else — the L59 LOCF lesson, zero-fill flavor.
  *
  * Integer-exact construction (quantize-once for r, a DOCUMENTED
  * two-step cascade for Q): with n grid days, S = Σy, the centered
  * values are scaled by n — z_t = n·y_t − S (exact LONG) — so
  *   r_k = Σ_t z_t·z_{t+k} / Σ_t z_t²
  * is an exact rational (the n² factors cancel), quantized ONCE:
  *   r_e6 = div(10⁶·Σ z_t z_{t+k}, Σ z²)
  * (negative numerators exercise toward-zero truncation on both
  * engines). Ljung–Box is then built from the ALREADY-quantized r:
  *   q_e6 = Σ_{k=1..L} div(n·(n+2)·r_e6_k², 10⁶·(n−k))
  * — quantizing once from the raw moments would need
  * 10⁶·n(n+2)·(Σzz)² ≈ 10⁴⁰ and overflow DECIMAL(38,0) on real
  * series; the cascade's extra error is < L·10⁻⁶·n(n+2)/(n−L) ≈
  * a few e-4 against χ² thresholds of 3.8+, stated here and pinned
  * in spec. Verdict vs [[RankTest.Chi2Crit95E6ByDf]] at df = L
  * (no fitted parameters); any missing/degenerate lag, n ≤ L+1, or
  * zero variance ⇒ NULL verdict with whatever is defined emitted.
  *
  * Capacity: |z| = |n·y − S| ≤ n·y_max — with the documented
  * 10⁵-day span ceiling and ≤ 10⁹ rows/day that is ≤ 10¹⁴ (LONG);
  * z·z ≤ 10²⁸ summed in DECIMAL(38,0); n(n+2)·r_e6² ≤ 10²² likewise.
  *
  * Scale shape: ONE map-side (group, day) count collapses the
  * corpus; the gap-fill grid, centering broadcast, lag self-join
  * (day-keyed equi-join, the L147 shape) and the L-row Ljung–Box
  * fold are all DAY-SPAN-sized — nothing corpus-shaped moves past
  * the first aggregate. */
object Acf {

  private val DayUs = 86400000000L

  /** Gap-fill span ceiling (~274 years of days): spans beyond this
    * are corrupt timestamps, not series — the guard raises rather
    * than materializing the grid (r15 self-review). */
  private[graft] val MaxSpanDays = 100000L
  private val d38 = "decimal(38,0)"

  /** Gap-filled centered daily series: (groupCol, x, __z) plus the
    * per-group (n, __d) stats frame — shared by both statistics.
    * Expects the epoch-micros already staged as `__us`. */
  private def centered(df: DataFrame, groupCol: String)
      : (DataFrame, DataFrame) = {
    val daily = df.filter(col(groupCol).isNotNull && col("__us").isNotNull)
      .select(col(groupCol), expr(s"(__us - (__us % ${DayUs}L)) DIV ${DayUs}L")
        .as("x"))
      .groupBy(col(groupCol), col("x"))
      .agg(count(lit(1)).as("y"))
    val span = daily.groupBy(col(groupCol))
      .agg(min(col("x")).as("__x0"), max(col("x")).as("__x1"))
      // span guard (r15 self-review): one corrupted timestamp (a
      // year-9999 row) would otherwise make the gap-fill sequence a
      // multi-million-cell array per group — fail loudly at the
      // GROUP row, not with an executor OOM mid-shuffle
      .withColumn("__x1", when(col("__x1") - col("__x0") > MaxSpanDays,
        raise_error(concat(lit(s"Acf: day span exceeds $MaxSpanDays ("),
          (col("__x1") - col("__x0")).cast("string"),
          lit(") — clean the timestamp column or pre-filter"))))
        .otherwise(col("__x1")))
    val grid = span.select(col(groupCol),
      explode(sequence(col("__x0"), col("__x1"))).as("x"))
    val filled = grid.join(daily, Seq(groupCol, "x"), "left")
      .withColumn("y", coalesce(col("y"), lit(0L)))
    val st = filled.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("__s"))
    val z = filled.join(st, Seq(groupCol))
      .withColumn("__z", col("n") * col("y") - col("__s"))
      .select(col(groupCol), col("x"), col("__z"))
    val dsum = z.groupBy(col(groupCol))
      .agg(sum(col("__z").cast(d38) * col("__z").cast(d38)).as("__d"))
      .join(st, Seq(groupCol))
    (z, dsum)
  }

  private def withUs(df: DataFrame, usCol: Column): DataFrame =
    df.withColumn("__us", usCol.cast("long"))

  /** Per-lag autocorrelation grid: (groupCol, lag, n_days, n_pairs,
    * r_e6) for lags 1..maxLag; r_e6 NULL on zero variance. */
  def dailyVolumeAcf(df: DataFrame, groupCol: String, usCol: Column,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 8,
      s"maxLag $maxLag outside [1, 8] (the χ² table ceiling)")
    Reserved.guard(Seq(groupCol),
      Seq("x", "y", "n", "lag", "__us", "__x0", "__x1", "__s", "__z",
        "__zb", "__xb", "__gb", "__d", "__num", "n_days", "n_pairs",
        "r_e6"),
      "Acf")
    val (z, dsum) = centered(withUs(df, usCol), groupCol)
    // renamed-key self-join (the q_v20 ambiguous-attribute lesson)
    val b = z.select(col(groupCol).as("__gb"), col("x").as("__xb"),
      col("__z").as("__zb"))
    val pairs = z
      .withColumn("lag", explode(sequence(lit(1L), lit(maxLag.toLong))))
      .join(b, col("__gb") === col(groupCol)
        && col("__xb") === col("x") + col("lag"))
    val num = pairs.groupBy(col(groupCol), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__z").cast(d38) * col("__zb").cast(d38)).as("__num"))
    num.join(dsum, Seq(groupCol))
      .select(col(groupCol), col("lag"), col("n").as("n_days"),
        col("n_pairs"),
        when(col("__d") === lit(0L).cast(d38), lit(null).cast("long"))
          .otherwise(call_function("div",
            lit(1000000L).cast(d38) * col("__num"), col("__d"))
            .cast("long")).as("r_e6"))
  }

  /** Ljung–Box portmanteau panel: (groupCol, n_days, max_lag, q_e6,
    * sig) — q from the quantized ACF (the documented cascade); NULL
    * verdict when the series is too short, any lag degenerate, or
    * the variance is zero. */
  def dailyVolumeLjungBox(df: DataFrame, groupCol: String, usCol: Column,
      maxLag: Int = 7): DataFrame = {
    val acf = dailyVolumeAcf(df, groupCol, usCol, maxLag)
    val terms = acf.withColumn("__t",
      when(col("r_e6").isNull || col("n_days") <= lit(maxLag.toLong) + 1L,
        lit(null).cast("long"))
        .otherwise(call_function("div",
          col("n_days").cast(d38) * (col("n_days") + 2L).cast(d38)
            * col("r_e6").cast(d38) * col("r_e6").cast(d38),
          lit(1000000L).cast(d38)
            * (col("n_days") - col("lag")).cast(d38)).cast("long")))
    terms.groupBy(col(groupCol))
      .agg(max(col("n_days")).as("n_days"),
        count(lit(1)).as("__nlags"),
        sum(when(col("__t").isNull, 1L).otherwise(0L)).as("__nnull"),
        sum(col("__t")).as("__q"))
      .withColumn("max_lag", lit(maxLag.toLong))
      .withColumn("q_e6",
        when(col("__nnull") > 0L || col("__nlags") < lit(maxLag.toLong),
          lit(null).cast("long"))
          .otherwise(col("__q")))
      .withColumn("sig",
        when(col("q_e6").isNull, lit(null).cast("long"))
          .otherwise((col("q_e6") >=
            element_at(typedlit(RankTest.Chi2Crit95E6ByDf), maxLag))
            .cast("long")))
      .select(col(groupCol), col("n_days"), col("max_lag"),
        col("q_e6"), col("sig"))
  }
}
