package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (builder brief: "Skewed keys → salting or AQE
  * skew-join"). AQE's skew-join handles sort-merge join skew automatically;
  * these cover the two cases it does not:
  *
  *  - [[saltedAggregate]]: a groupBy where one key carries a macroscopic
  *    share of all rows — one reducer burns while the rest idle. Salting
  *    splits each key across `salt` partial groups, then merges the
  *    partials (requires the aggregate to be decomposable — sum/count/
  *    min/max; AVG must be carried as sum+count).
  *  - [[saltedBroadcastableJoin]] is unnecessary (broadcast ignores skew);
  *    for a skewed shuffle join where AQE is off or the skew is within one
  *    partition-sized key, [[explodeJoinSmallSide]] replicates the small
  *    side `salt` times and salts the big side, so the hot key's rows
  *    spread over `salt` reducers.
  */
object Skew {

  private def saltCol(salt: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(salt))

  /** Two-stage salted aggregation: stage 1 groups by (keys, salt) with
    * map-side partial aggregation as usual, stage 2 merges the ≤`salt`
    * partials per key. `partialAggs` produce the stage-1 columns;
    * `mergeAggs` combine them (e.g. partial `sum(x) as s` → merge
    * `sum(s) as s`). Doubles the shuffles but each is skew-free; use when
    * one key exceeds what a single task should hold. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salt: Int,
      partialAggs: Seq[Column], mergeAggs: Seq[Column]): DataFrame = {
    val stage1 = df.withColumn("__salt", saltCol(salt))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Cheap hot-key probe for auto-mitigation decisions (VERDICT r5 #4):
    * estimates the hottest key's row share from the FIRST `perPartition`
    * rows of every partition — `mapPartitions(_.take(k))` stops pulling
    * the iterator after k rows, so each task reads at most one row-group's
    * worth and the whole probe moves ≤ partitions×k tiny rows through one
    * reduce. A key with a macroscopic share (the serialized-window hazard:
    * one bot entity with 10⁸ events) occupies that share of almost every
    * partition's head, so the estimate is reliable exactly in the regime
    * that matters; sub-percent shares are noise and read as "no skew".
    * RDD on purpose: per-partition early-exit take is genuine imperative
    * per-partition logic the DataFrame API cannot express without a full
    * scan. Returns 0 for an empty input. */
  private[graft] def hotKeyShare(keyed: DataFrame,
      perPartition: Int = 100): Double = {
    val counts = keyed.rdd.mapPartitions(_.take(perPartition))
      .map(r => r -> 1L).reduceByKey(_ + _).values
    val (total, hottest) = counts.aggregate((0L, 0L))(
      { case ((t, m), c) => (t + c, math.max(m, c)) },
      { case ((t1, m1), (t2, m2)) => (t1 + t2, math.max(m1, m2)) })
    if (total == 0L) 0.0 else hottest.toDouble / total
  }

  /** Hot-key share above which the chunked window plans engage
    * automatically: 0.4 is far above any uniform distribution's hottest
    * key yet catches the single-dominant-entity shape well before it
    * serializes a partition. */
  private[graft] val AutoChunkHotShare = 0.4

  /** Salted equi-join for a skewed big side against a small (but not
    * broadcast-tiny) side: big rows get a random salt in [0, salt), the
    * small side is replicated `salt` times via explode, and the join key
    * becomes (key, salt) — the hot key fans out over `salt` reducers.
    * Row-preserving: each big row matches exactly its salt's replica. */
  def explodeJoinSmallSide(big: DataFrame, small: DataFrame,
      key: String, salt: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(salt))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
