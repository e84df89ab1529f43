package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Slowly-changing-dimension type-2 history maintenance — the
  * warehouse-standard "MERGE with history" (Kimball SCD2, Delta/Iceberg
  * MERGE INTO): a versioned table keeps every value a key ever held as
  * a [valid_from, valid_to) interval, and applying a change batch
  * closes the superseded version and opens the new one, atomically per
  * key. The temporal complement to the reference's idempotent append
  * (S6/J3): append-only FACTS, versioned DIMENSIONS.
  *
  * History schema: key, value columns, `valid_from_us`, `valid_to_us`
  * (null = still open), `is_current`.
  *
  * Scale shape: ONE full-outer join between the history's current slice
  * (the `is_current` filter pushes to the scan — closed versions are
  * never read) and the change batch, keyed on the dimension key; each
  * joined row then emits its 0/1/2 output rows from a single
  * `explode(CASE … array(struct))` projection — no second pass, no
  * re-execution of the join per outcome class, and the untouched closed
  * history unions through unscanned-by-the-join. At 100 TB the cost is
  * the current-slice scan + one key shuffle of current ∪ changes.
  *
  * Preconditions (the MERGE contract): ≤ 1 current row per key in the
  * history, keys unique within a change batch, `is_current` non-null
  * (a null would drop the row from BOTH the current slice and the
  * pass-through — [[init]] and [[merge]] only ever write true/false),
  * and `atUs` at or after every open `valid_from_us` (batches apply in
  * time order). Violations fan out through the join exactly as
  * CorpusDiff's duplicate-id caveat. */
object Scd2 {

  /** Bootstrap a history from an initial snapshot: every row open from
    * `atUs`. Null keys are dropped (a dimension row needs a key). */
  def init(snapshot: DataFrame, keyCol: String, valueCols: Seq[String],
      atUs: Long): DataFrame = {
    require(valueCols.nonEmpty, "SCD2 needs at least one value column")
    snapshot.filter(col(keyCol).isNotNull)
      .select(col(keyCol) +: valueCols.map(col) :+
        lit(atUs).as("valid_from_us") :+
        lit(null).cast("long").as("valid_to_us") :+
        lit(true).as("is_current"): _*)
  }

  /** Apply one change batch at `atUs`:
    *   - key only in the history → its current row rides through open;
    *   - key only in `changes` → a new open version;
    *   - in both with EQUAL values (null-safe struct compare) → the
    *     current row rides through untouched (idempotent re-delivery of
    *     an unchanged dimension row is a no-op);
    *   - in both with different values → the current row closes at
    *     `atUs` and a new open version starts there.
    * Closed history rows pass through untouched. Returns the full new
    * history. */
  def merge(history: DataFrame, changes: DataFrame, keyCol: String,
      valueCols: Seq[String], atUs: Long): DataFrame = {
    require(valueCols.nonEmpty, "SCD2 needs at least one value column")
    val past = history.filter(!col("is_current"))
    val cur = history.filter(col("is_current"))
      .select(col(keyCol).as("__k") +:
        valueCols.map(c => col(c).as(s"__c_$c")) :+
        col("valid_from_us").as("__from") :+
        lit(true).as("__has_c"): _*)
    val ch = changes.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("__k") +:
        valueCols.map(c => col(c).as(s"__n_$c")) :+
        lit(true).as("__has_n"): _*)
    def rowS(vals: String => Column, from: Column, to: Column,
        current: Column): Column =
      struct(col("__k").as(keyCol) +:
        valueCols.map(c => vals(c).as(c)) :+
        from.as("valid_from_us") :+ to.as("valid_to_us") :+
        current.as("is_current"): _*)
    val curVals = struct(valueCols.map(c => col(s"__c_$c")): _*)
    val newVals = struct(valueCols.map(c => col(s"__n_$c")): _*)
    val hasC = coalesce(col("__has_c"), lit(false))
    val hasN = coalesce(col("__has_n"), lit(false))
    val openTo = lit(null).cast("long")
    val curRow = rowS(c => col(s"__c_$c"), col("__from"), openTo, lit(true))
    val freshRow = rowS(c => col(s"__n_$c"), lit(atUs), openTo, lit(true))
    val closedRow =
      rowS(c => col(s"__c_$c"), col("__from"), lit(atUs), lit(false))
    val emitted = cur.join(ch, Seq("__k"), "full_outer")
      .select(explode(
        when(!hasC, array(freshRow))                     // brand-new key
          .when(!hasN || curVals <=> newVals,
            array(curRow))                               // absent or equal
          .otherwise(array(closedRow, freshRow)))        // superseded
        .as("__r"))
      .select(col("__r.*"))
    past.select(emitted.columns.map(col): _*).unionAll(emitted)
  }

  /** Temporal lookup into the history: enrich each fact row with the
    * dimension version that was valid AT the fact's own time — the
    * point of keeping SCD2 history at all ("price as of the order
    * date"). A fact matches the version with `valid_from_us ≤ t` and
    * `t < valid_to_us` (open versions match every t ≥ from); under the
    * merge contract the intervals per key are disjoint, so each fact
    * matches AT MOST one version. Facts dated before their key's first
    * version (or keyed to no version at all) survive with null version
    * columns — a LEFT join, so enrichment never drops facts.
    *
    * Scale shape: ONE equi-join on the dimension key with the interval
    * predicate as the join residual (never a broadcast-nested-loop —
    * the equi component keys the shuffle); versions-per-key is small by
    * nature, so the residual scans a handful of rows per fact. Output:
    * every fact column, then the version's value columns and
    * `valid_from_us` (the version identifier). */
  def lookup(history: DataFrame, facts: DataFrame, keyCol: String,
      tsUs: Column, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "SCD2 needs at least one value column")
    val h = history.select(col(keyCol).as("__hk") +:
      valueCols.map(c => col(c).as(s"__v_$c")) :+
      col("valid_from_us").as("__vfrom") :+
      col("valid_to_us").as("__vto"): _*)
    val f = facts.withColumn("__ft", tsUs.cast(LongType))
    f.join(h,
        f(keyCol) === h("__hk") && col("__ft") >= col("__vfrom") &&
          (col("__vto").isNull || col("__ft") < col("__vto")),
        "left")
      .select(facts.columns.map(col) ++
        valueCols.map(c => col(s"__v_$c").as(c)) :+
        col("__vfrom").as("valid_from_us"): _*)
  }
}
