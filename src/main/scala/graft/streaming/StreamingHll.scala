package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.operators.Hll

/** Streaming twin of the HyperLogLog register sketch
  * ([[graft.operators.Hll]], L168) — the r15 sketch family's
  * governance twin, the [[StreamingManifest]] pattern verbatim: the
  * register array is a commutative, idempotent MAX monoid, so a
  * continuously maintained sketch is the streaming aggregation with
  * no caveats — no watermark, no disorder handling, re-delivered
  * rows are absorbed by idempotence (max(x, x) = x), and "stream ≡
  * batch regardless of split and order" is an algebraic identity,
  * spec-pinned on shuffled multi-batch runs and through
  * [[Hll.merge]].
  *
  * State per group is EXACTLY the 256 register bytes (an
  * Array[Long] here for symmetry with the batch column; 6-bit cells
  * in a packed production layout) — constant-size by construction,
  * never corpus-shaped. Each trigger folds the batch's keys in
  * through [[Hll.registerJvm]], the spec-pinned JVM mirror of the
  * batch (j, ρ) expressions, so the twins cannot drift.
  *
  * Output is Update-mode: each trigger re-emits changed groups; the
  * latest row per group IS the sketch table, equal to
  * [[Hll.sketch]] of everything ingested, and [[Hll.estimate]]
  * applies to it unchanged (estimate parity is pinned in spec). */
object StreamingHll {

  /** One stream row: group plus the key (pre-rendered to string —
    * the batch side's cast convention). */
  final case class Rec(group: String, key: String)

  /** A group's live sketch — the batch [[Hll.sketch]] row shape. */
  final case class Sketch(group: String, hll: Seq[Long])

  /** Continuously maintained per-group register sketch. A group that
    * has only ever seen NULL keys is NEVER populated — no state, no
    * emission — mirroring the batch side, where [[Hll.sketch]]'s
    * null-key filter drops such groups before the aggregation (r16
    * fix: the previous mapGroups form emitted an all-zero sketch row
    * there, a crack in the stream ≡ batch identity). */
  def sketch(recs: Dataset[Rec])
      (implicit spark: SparkSession): Dataset[Sketch] = {
    import spark.implicits._
    recs
      .groupByKey(_.group)
      .flatMapGroupsWithState[Array[Long], Sketch](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[Rec],
            state: GroupState[Array[Long]]) =>
          val regs = state.getOption.getOrElse(Array.fill(Hll.M)(0L))
          var live = state.exists
          rows.foreach { r =>
            if (r.key != null) {
              live = true
              val (j, rho) = Hll.registerJvm(r.key)
              if (rho > regs(j)) regs(j) = rho
            }
          }
          if (!live) Iterator.empty
          else {
            state.update(regs)
            Iterator.single(Sketch(g, regs.toSeq))
          }
      }
  }

  /** One-liner for specs/consumers: the twin's required output mode. */
  val RequiredOutputMode: OutputMode = OutputMode.Update()
}
