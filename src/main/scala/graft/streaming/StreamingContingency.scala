package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.operators.Contingency

/** Streaming twin of the Mantel–Haenszel panel
  * ([[graft.operators.Contingency.mantelHaenszel]], L192) — the
  * confounder-adjusted association monitor run CONTINUOUSLY: a
  * stratum's 2×2 cell counts are a commutative monoid, so like the
  * drift and HLL twins, "stream ≡ batch whatever the micro-batch
  * split and arrival order" is an algebraic identity — no watermark,
  * no disorder handling; state is EXACTLY four Longs per observed
  * (panel, stratum), cardinality set by the stratification (never
  * corpus-shaped).
  *
  * Scoring rides [[Contingency.mantelHaenszelJvm]] (the
  * Manifest.rowHashJvm convention), spec-pinned against the batch
  * operator on the same counts — the live monitor and the batch
  * audit CANNOT read a different adjusted association from the same
  * cells. Non-binary rows are dropped in the fold, mirroring the
  * batch hygiene filter. */
object StreamingContingency {

  /** One stream row: (panel, stratum, row flag, col flag). */
  final case class Rec(panel: String, stratum: String, r: Long, c: Long)

  /** A stratum's live 2×2 cells. */
  final case class Cells(panel: String, stratum: String,
      n11: Long, n10: Long, n01: Long, n00: Long)

  /** Continuously maintained per-(panel, stratum) cells — Update
    * mode: each trigger re-emits changed strata; the latest row per
    * key (cells only grow) is the live table. A stratum that has
    * only ever received NON-BINARY rows is NEVER populated — no
    * state, no emission — mirroring the batch side, where
    * [[Contingency.mantelHaenszel]]'s hygiene filter drops such rows
    * BEFORE the groupBy so the stratum never exists there (r17
    * ADVICE fix, the StreamingHll all-NULL-key class: the previous
    * mapGroups form emitted an all-zero Cells row, skewing a
    * snapshot's stratum set and n_strata vs batch). */
  def cells(recs: Dataset[Rec])
      (implicit spark: SparkSession): Dataset[Cells] = {
    import spark.implicits._
    recs
      .groupByKey(r => (r.panel, r.stratum))
      .flatMapGroupsWithState[Array[Long], Cells](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (k: (String, String), rows: Iterator[Rec],
            state: GroupState[Array[Long]]) =>
          val s = state.getOption.getOrElse(Array.fill(4)(0L))
          var live = state.exists
          rows.foreach { r =>
            // batch hygiene: only binary flags count
            if ((r.r == 0L || r.r == 1L) && (r.c == 0L || r.c == 1L)) {
              live = true
              val idx = (if (r.r == 1L) 0 else 2) + (if (r.c == 1L) 0 else 1)
              s(idx) += 1L
            }
          }
          if (!live) Iterator.empty
          else {
            state.update(s)
            Iterator.single(Cells(k._1, k._2, s(0), s(1), s(2), s(3)))
          }
      }
  }

  /** Score a live snapshot of one panel's strata against the batch
    * cascade: (or_e6, cmh_e6, d_sign, sig) — identical to
    * [[Contingency.mantelHaenszel]] on the same cells (spec-pinned). */
  def score(cells: Seq[Cells])
      : (Option[Long], Option[Long], Long, Long) =
    Contingency.mantelHaenszelJvm(
      cells.map(c => (c.n11, c.n10, c.n01, c.n00)))

  /** The twin's required output mode. */
  val RequiredOutputMode: OutputMode = OutputMode.Update()
}
