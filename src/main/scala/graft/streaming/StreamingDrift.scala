package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.operators.Drift

/** Streaming twin of the table-exact drift panel
  * ([[graft.operators.Drift.categoricalExact]] L151 /
  * [[graft.operators.Drift.jensenShannonExact]] L159) — the
  * train/serving-skew monitor run CONTINUOUSLY: the reference
  * histogram is FROZEN at train time (exactly as the batch operators
  * assume), the current side is a live per-bucket count, and a bucket
  * count is a commutative monoid — so, like the manifest twin,
  * "stream ≡ batch whatever the micro-batch split and arrival order"
  * is an algebraic identity, not a watermark argument; no disorder
  * handling, no state growth beyond one Long per OBSERVED bucket
  * (state cardinality = the bucketing scheme's, set by the caller's
  * frozen binning — never corpus-shaped).
  *
  * Scoring rides the JVM mirrors [[Drift.tablePsiJvm]] /
  * [[Drift.tableJsdJvm]] (the Manifest.rowHashJvm convention),
  * spec-pinned bit-for-bit against the batch column expressions, so
  * the live monitor and the batch audit CANNOT read different drift
  * from the same counts. */
object StreamingDrift {

  /** One stream row: the pre-bucketed observation (the caller applies
    * the frozen binning exactly as the batch side would). */
  final case class Rec(bucket: Long)

  /** A bucket's live count. */
  final case class BucketCount(bucket: Long, n_cur: Long)

  /** Continuously maintained per-bucket counts of the CURRENT stream —
    * Update-mode: each trigger re-emits changed buckets; latest row
    * per bucket (max n_cur — counts only grow) is the live histogram. */
  def counts(recs: Dataset[Rec])
      (implicit spark: SparkSession): Dataset[BucketCount] = {
    import spark.implicits._
    recs
      .groupByKey(_.bucket)
      .mapGroupsWithState[Long, BucketCount](GroupStateTimeout.NoTimeout) {
        (b: Long, rows: Iterator[Rec], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          BucketCount(b, n)
      }
  }

  /** Score a live histogram snapshot against the frozen reference:
    * (bucket, n_ref, n_cur, psi_e9) through the spec-pinned JVM
    * mirror — identical to [[Drift.categoricalExact]] on the same
    * counts. */
  def scorePsi(ref: Map[Long, Long],
      cur: Map[Long, Long]): Seq[(Long, Long, Long, Long)] =
    Drift.tablePsiJvm(ref, cur)

  /** Same snapshot scoring for the bounded symmetric member —
    * identical to [[Drift.jensenShannonExact]] on the same counts. */
  def scoreJsd(ref: Map[Long, Long],
      cur: Map[Long, Long]): Seq[(Long, Long, Long, Long)] =
    Drift.tableJsdJvm(ref, cur)

  /** The twin's required output mode. */
  val RequiredOutputMode: OutputMode = OutputMode.Update()
}
