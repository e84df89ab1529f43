package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, the payload of the
  * LATEST right row with the same key and `rightTs <= leftTs`. The
  * enrichment join of feature-store / training-data assembly: a training
  * example may only see state that existed at its own timestamp, and an
  * as-of join is how that "no future leakage" rule becomes a plan.
  *
  * Spark has no ASOF JOIN operator; the naive formulations both fail at
  * scale — an inequality theta-join explodes to a range scan per row, and
  * "join then row_number per left row" shuffles the full O(L×matches)
  * pair set. This is the UNION+WINDOW idiom instead: tag both sides,
  * union them, sort each key's timeline once, and let a running
  * `last(payload, ignoreNulls)` carry the newest right payload forward to
  * every left row. ONE hash shuffle on the key, a per-key sort, zero pair
  * blowup — the same shape Flink's temporal join and kdb's aj compile to.
  *
  * Determinism: right rows sharing (key, ts) are ordered by `tieBreak`
  * and the LARGEST wins; a right row at exactly `leftTs` is visible
  * (<= semantics, right-before-left at equal timestamps). Null
  * timestamps on either side are dropped (a row outside time cannot be
  * placed on the timeline). Left rows with no prior right row keep null
  * payload columns.
  *
  * Scale: the window is a streaming frame (running last, no buffering);
  * a single hot key serializes its own partition — pre-split with [[Skew]]
  * if a key profile demands it, same hazard as sessionization. */
object AsOf {

  /** Left rows enriched with the latest prior-or-equal right payload.
    * Payload = every right column except `keys` and `rightTs`; payload
    * names must not collide with left's columns. `tieBreak` must be a
    * right payload column. */
  def joinPriorOrEqual(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tieBreak: String): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val payloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTs).toSeq
    require(payloadCols.contains(tieBreak),
      s"tieBreak $tieBreak must be a right payload column")
    val collisions = left.columns.toSet.intersect(payloadCols.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left: ${collisions.mkString(",")}")
    // The union's internal columns are __-reserved; an input column with
    // one of these names would silently duplicate-collide in the tagged
    // union (ADVICE r4 — the payload-vs-left check above was guarded, this
    // wasn't).
    val reserved = Set("__ts", "__side", "__tb", "__p", "__l", "__match")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(clash.isEmpty,
      s"input columns use reserved names: ${clash.mkString(",")}")

    val pStruct = struct(payloadCols.map(col): _*)
    val pType = right.select(pStruct).schema.head.dataType
    val lStruct = struct(left.columns.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val tbType = right.schema(tieBreak).dataType

    // identical select order on both sides → positional union is safe
    val l2 = left.filter(col(leftTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(tbType).as("__tb"),
        lit(null).cast(pType).as("__p"), lStruct.as("__l")): _*)
    val r2 = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        col(tieBreak).as("__tb"),
        pStruct.as("__p"), lit(null).cast(lType).as("__l")): _*)

    // right (side 0) sorts before left (side 1) at equal __ts — that is
    // the "<=" in prior-OR-EQUAL; __tb makes equal-ts right rows
    // deterministic (running last keeps the largest)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionAll(r2)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
        payloadCols.map(c => col("__match").getField(c).as(c)): _*)
  }
}
