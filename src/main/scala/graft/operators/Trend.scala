package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Volume-trend detection — per group, the OLS slope of the daily
  * record count over the day index: the ingestion-health monitor next
  * to [[Drift]] (is this source ramping, steady, or silently dying?).
  * The reference's volumetry queries count records per window
  * (`README.md:211-218`'s verification surface); this is the TREND of
  * that count, the number an on-call reads before the count hits zero.
  *
  * Exactness (the q_a13 moment discipline): the series is (x = day
  * index, y = that day's count) — integers by construction, no
  * quantization step at all; the five moments (m, Σx, Σy, Σx², Σxy)
  * are exact integral sums widened to DECIMAL(38,0); slope and
  * intercept derive from those identical integers with the SAME op
  * sequence on both engines (one cast-to-double per term, round 6 dp):
  *   slope = (m·Σxy − Σx·Σy) / (m·Σx² − Σx·Σx)
  *   icept = (Σy − slope_unrounded·Σx) / m
  * Day index is a truncation-safe pmod floor of epoch-micros (the
  * q_v7/q_e16 rule — pre-epoch timestamps must not drift a day).
  * Declared semantics: days with ZERO records are absent from the
  * series (a grid-fill would need the observation horizon, a caller
  * fact); groups with a single day emit null slope/intercept (den 0).
  *
  * Scale shape: two map-side-combinable aggregates — corpus → (group,
  * day) counts → per-group moments; nothing after the first aggregate
  * is larger than groups × days, and the output is grid-sized. */
object Trend {

  private val DayUs = 86400000000L

  /** (group, n_days, total, slope6, icept6) from an epoch-MICROS
    * column; null timestamps and null groups drop. */
  def dailyVolumeSlope(df: DataFrame, groupCol: String,
      usCol: Column): DataFrame = {
    val us = usCol.cast("long")
    val daily = df
      .filter(col(groupCol).isNotNull && us.isNotNull)
      // integer DIV, never float division: the exact-multiple dividend
      // sits near 2^51 where a double round-trip is an accident waiting
      .select(col(groupCol), (us - pmod(us, lit(DayUs))).as("__d0"))
      .select(col(groupCol), expr(s"__d0 DIV ${DayUs}L").as("x"))
      .groupBy(col(groupCol), col("x"))
      .agg(count(lit(1)).as("y"))
    val m = daily.groupBy(col(groupCol))
      .agg(count(lit(1)).as("m"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
    def d(c: Column): Column = c.cast("double")
    val slope = d(col("m") * col("sxy") - col("sx") * col("sy")) /
      d(col("m") * col("sxx") - col("sx") * col("sx"))
    // m = 1 ⟺ zero denominator (one observed day): no trend, null out
    val one = col("m") === 1
    m.select(col(groupCol), col("m").as("n_days"),
      col("sy").cast("long").as("total"),
      when(one, lit(null).cast("double"))
        .otherwise(round(slope, 6)).as("slope6"),
      when(one, lit(null).cast("double"))
        .otherwise(round((d(col("sy")) - slope * d(col("sx"))) /
          d(col("m")), 6)).as("icept6"))
  }
}
