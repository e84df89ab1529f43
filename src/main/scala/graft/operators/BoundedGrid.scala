package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Guard-before-collect for the bounded-grid driver operators (VERDICT
  * r12 #2, class fix).
  *
  * The driver-side grid operators (Transitions.stationary,
  * Doremi.weights, BradleyTerry.fit, Isotonic.calibrate,
  * RecordLinkage.fit) all follow one shape: aggregate a corpus down to
  * a small grid, `collect()` it, run bounded exact math on the driver.
  * Each carried a size `require` — but AFTER the collect, so a
  * pathological cardinality (e.g. a per-user "domain" column fed to
  * `Doremi.weights`) pressured driver memory before the guard could
  * fail loudly.
  *
  * [[collectBounded]] fixes the class: `limit(max + 1)` bounds what the
  * driver materializes to max+1 rows in the SAME single job (no
  * separate count probe — a `limit(n).count` pre-pass would run the
  * aggregation twice and still not bound the collect), then the length
  * check turns row max+1 into a loud error. Within bounds the result is
  * exactly `df.collect()`: limit can drop/reorder rows only when the
  * input exceeds it, and every caller is row-order-insensitive (each
  * sorts or maps the grid after collecting).
  */
object BoundedGrid {

  /** Collect `df`, failing loudly if it holds more than `max` rows,
    * while never materializing more than `max + 1` rows on the driver.
    * `what` names the grid and `hint` tells the caller how to shrink
    * it — both go into the error verbatim. */
  def collectBounded(df: DataFrame, max: Int, what: String,
      hint: String): Array[Row] = {
    require(max >= 0, s"max must be non-negative, got $max")
    val rows = df.limit(max + 1).collect()
    require(rows.length <= max,
      s"$what exceeds $max rows — $hint")
    rows
  }
}
