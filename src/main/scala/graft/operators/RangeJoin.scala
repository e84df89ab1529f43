package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join — match each left POINT to the right
  * INTERVALS `[lo, hi]` of the same key that contain it: assigning events
  * to sessions, readings to maintenance windows, examples to curriculum
  * phases. Spark plans a raw `ON point BETWEEN lo AND hi` as a nested-
  * loop per key group (no equi-predicate beyond the key) — at corpus
  * scale the classic fix is BUCKETIZATION: explode each interval into the
  * fixed-width buckets it covers, compute each point's single bucket, and
  * equi-join on (key, bucket) with an exact BETWEEN confirm. The join is
  * then a plain hash join; the only cost knob is the interval-to-bucket
  * expansion factor, ≈ avg_interval/bucketWidth + 1, so pick
  * `bucketWidth` near the typical interval length (a point lands in
  * exactly ONE bucket, so no dedup step is needed — each qualifying
  * (point, interval) pair is produced exactly once).
  */
object RangeJoin {

  /** Inner-join matches: left columns + right's non-key columns for every
    * (point ∈ [lo, hi]) pair. Point and bound columns must be LONGs in
    * the same unit (epoch micros, token index, …); intervals with
    * `hi < lo` or null bounds are dropped; null points never match.
    * Right's non-key column names must not collide with left's. */
  def pointInInterval(left: DataFrame, right: DataFrame, keys: Seq[String],
      point: String, lo: String, hi: String, bucketWidth: Long): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val collisions = left.columns.toSet.intersect(rightPayload.toSet)
    require(collisions.isEmpty,
      s"right columns collide with left: ${collisions.mkString(",")}")
    // __b is the internal bucket column on BOTH sides (ADVICE r4)
    require(!(left.columns ++ right.columns).contains("__b"),
      "input columns use the reserved name __b")

    // exact floor division, negative-safe: c - pmod(c, w) is an exact
    // multiple of w, and `div` (IntegralDivide) divides it in LONG — the
    // formula is exact for the FULL long range, so raw nanosecond
    // timestamps (~1.7e18, above double's 2^53 exact window) bucket
    // correctly too. A naive floor(c/w) divides in double first and can
    // land one bucket off at boundaries.
    def bucketOf(c: org.apache.spark.sql.Column) =
      call_function("div", c - pmod(c, lit(bucketWidth)), lit(bucketWidth))

    val r2 = right
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn("__b",
        explode(sequence(bucketOf(col(lo)), bucketOf(col(hi)))))
    val l2 = left.filter(col(point).isNotNull)
      .withColumn("__b", bucketOf(col(point)))
    l2.join(r2, keys :+ "__b")
      .filter(col(point).between(col(lo), col(hi)))
      .drop("__b")
  }

  /** Interval×interval OVERLAP join — match each left interval
    * `[leftLo, leftHi]` to the right intervals `[rightLo, rightHi]` of
    * the same key that intersect it (inclusive bounds:
    * `leftLo <= rightHi && rightLo <= leftHi`): span conflation,
    * sessions vs maintenance/incident windows, curriculum-phase overlap.
    *
    * Same bucketization as [[pointInInterval]], on BOTH sides — the join
    * is a plain hash join on (key, bucket) with an exact confirm. A pair
    * whose intervals span several common buckets would match repeatedly;
    * the CANONICAL-BUCKET rule dedups without a distinct: the overlap's
    * first instant `max(leftLo, rightLo)` lies inside both intervals, so
    * both sides cover its bucket, and the pair is kept ONLY in that
    * bucket — exactly-once by construction, no shuffle beyond the join.
    *
    * Both sides' non-key columns ride through; names must not collide.
    * Null bounds and inverted (`hi < lo`) intervals drop on either side.
    * Expansion factor ≈ avg_interval/bucketWidth + 1 per side — pick
    * `bucketWidth` near the typical interval length. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftLo: String, leftHi: String, rightLo: String, rightHi: String,
      bucketWidth: Long): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val collisions = left.columns.toSet.intersect(rightPayload.toSet)
    require(collisions.isEmpty,
      s"right columns collide with left: ${collisions.mkString(",")}")
    require(!(left.columns ++ right.columns).contains("__b"),
      "input columns use the reserved name __b")

    // same exact-long bucket formula as rangeJoin's (see comment there)
    def bucketOf(c: org.apache.spark.sql.Column) =
      call_function("div", c - pmod(c, lit(bucketWidth)), lit(bucketWidth))
    def valid(lo: String, hi: String) =
      col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi)

    val l2 = left.filter(valid(leftLo, leftHi))
      .withColumn("__b",
        explode(sequence(bucketOf(col(leftLo)), bucketOf(col(leftHi)))))
    val r2 = right.filter(valid(rightLo, rightHi))
      .withColumn("__b",
        explode(sequence(bucketOf(col(rightLo)), bucketOf(col(rightHi)))))
    l2.join(r2, keys :+ "__b")
      .filter(col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi))
      .filter(col("__b") === bucketOf(greatest(col(leftLo), col(rightLo))))
      .drop("__b")
  }
}
