package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.operators.QuantileSketch

/** Streaming twin of the mergeable quantile sketch
  * ([[graft.operators.QuantileSketch]], L135) — a continuously
  * maintained per-group bottom-k-by-hash sample over a live stream
  * (the established twin discipline: StreamingTransitions,
  * StreamingBlocklist).
  *
  * The sketch is an order-free MONOID: bottom-k of a union depends
  * only on the SET of rows seen, never on arrival order or micro-batch
  * boundaries — so unlike the adjacency/window twins this one needs NO
  * watermark and NO disorder handling at all, and "stream ≡ batch
  * regardless of split and order" is an algebraic identity the spec
  * pins on shuffled multi-batch runs. State per group is the ≤k-pair
  * sample itself (bounded by construction, never by history); each
  * trigger folds the batch's rows in with the SAME k-smallest-of-union
  * the batch `merge` uses, hashing through
  * [[QuantileSketch.rowHashJvm]] — the spec-pinned JVM mirror of the
  * batch expression, so the twins cannot drift.
  *
  * Output is Update-mode: each trigger re-emits the groups whose
  * sample changed; the LATEST row per group IS the sketch table, and
  * feeding it to [[QuantileSketch.estimateQuantiles]] gives the same
  * estimates the batch path produces (spec-pinned). */
object StreamingQuantileSketch {

  final case class Rec(group: String, value: Long, id: Long)
  final case class Sketch(group: String, hs: Seq[Long], vs: Seq[Long])

  /** Continuously maintained per-group sample; `k` as in
    * [[QuantileSketch.sketch]]. */
  def sketch(recs: Dataset[Rec], k: Int)
      (implicit spark: SparkSession): Dataset[Sketch] = {
    import spark.implicits._
    require(k >= 1 && k <= QuantileSketch.MaxK,
      s"k $k outside [1, ${QuantileSketch.MaxK}]")
    recs
      .groupByKey(_.group)
      .mapGroupsWithState[List[(Long, Long)], Sketch](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[Rec],
            state: GroupState[List[(Long, Long)]]) =>
          val prior = state.getOption.getOrElse(Nil)
          val merged = (prior ++ rows.map(r =>
              (QuantileSketch.rowHashJvm(r.value, r.id), r.value)))
            .distinct.sorted.take(k)
          state.update(merged)
          Sketch(g, merged.map(_._1), merged.map(_._2))
      }
  }

  /** One-liner for specs/consumers: the twin's required output mode. */
  val RequiredOutputMode: OutputMode = OutputMode.Update()
}
