package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC changelog compaction + apply — the Debezium/Kafka-connect "apply
  * the change stream to the snapshot" step (materialized-view refresh,
  * warehouse mirror catch-up): a changelog carries many versioned
  * operations per key (`I`nsert / `U`pdate / `D`elete, each stamped
  * with a monotone sequence number), and applying it means keeping only
  * each key's LATEST operation, then merging latest-wins into the base
  * snapshot — upserting I/U images and dropping D keys.
  *
  * The compaction complement to [[Scd2]]: SCD2's MERGE contract
  * requires keys UNIQUE within a change batch (it versions history);
  * CdcApply's whole point is the multi-version-per-key batch — a key
  * inserted, updated twice and deleted inside one batch compacts to the
  * delete before the base ever sees it. Kafka log compaction computes
  * exactly this retain-latest-per-key set.
  *
  * Compaction is ONE map-side-combinable aggregate: `max(struct(seq,
  * op, values…))` per key — partial maxes combine on the map side, so
  * the shuffle carries one candidate row per key per input partition,
  * never the changelog. NO window function (the L79 hot-group lesson: a
  * row_number over a hot key serializes into one task; a struct-max
  * stays parallel). Apply is one full-outer join on the key — at 100 TB
  * the base is bucketed by key (L52), making the join shuffle-free on
  * the big side, and the compacted changelog (≤ one row per changed
  * key) is the small side.
  *
  * Preconditions: sequence numbers unique per key (ties fall through to
  * the struct's lexicographic op/value comparison — still total and
  * deterministic, but no longer "latest by time"); null keys, null
  * sequence numbers and null OPS are dropped from the changelog
  * (ADVICE r11: a null latest op would make `op =!= deleteOp` NULL and
  * silently delete the key — a malformed row must not masquerade as a
  * tombstone), null base keys from the base (a keyless row can't
  * participate in a keyed merge). */
object CdcApply {

  /** Latest operation per key: `(keyCol, __last struct(seq, op,
    * values…))`, one row per distinct changelog key. */
  def compact(changelog: DataFrame, keyCol: String, seqCol: String,
      opCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "CDC compaction needs value columns")
    // a value column named seq/op would duplicate a struct field; the
    // output names are fixed contract (Reserved guard, ADVICE class)
    Reserved.guard(valueCols :+ keyCol,
      Seq("seq", "op", "__last", "last_seq", "last_op"), "CdcApply")
    val st = struct(
      col(seqCol).cast("long").as("seq") +: col(opCol).as("op") +:
        valueCols.map(col): _*)
    changelog
      .filter(col(keyCol).isNotNull && col(seqCol).isNotNull &&
        col(opCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(max(st).as("__last"))
  }

  /** Apply the compacted changelog to `base`, latest-wins:
    *   - key only in base → the base row rides through
    *     (`last_seq`/`last_op` null);
    *   - latest op = `deleteOp` → the key is dropped;
    *   - any other latest op → the change image wins (an update to an
    *     absent key upserts — the Debezium snapshot-gap convention).
    * Output: key, value columns, `last_seq`, `last_op`. */
  def apply(base: DataFrame, changelog: DataFrame, keyCol: String,
      seqCol: String, opCol: String, valueCols: Seq[String],
      deleteOp: String = "D"): DataFrame = {
    val c = compact(changelog, keyCol, seqCol, opCol, valueCols)
    val b = base.filter(col(keyCol).isNotNull)
      .select(col(keyCol) +: valueCols.map(col): _*)
    b.join(c, Seq(keyCol), "full_outer")
      .filter(col("__last").isNull || col("__last.op") =!= deleteOp)
      .select(col(keyCol) +:
        valueCols.map(v =>
          when(col("__last").isNotNull, col(s"__last.$v"))
            .otherwise(col(v)).as(v)) :+
        col("__last.seq").as("last_seq") :+
        col("__last.op").as("last_op"): _*)
  }
}
