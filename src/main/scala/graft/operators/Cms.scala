package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — the bounded-memory frequency summary (Cormode &
  * Muthukrishnan 2005, "An improved data stream summary: the count-min
  * sketch and its applications", J. Algorithms 55): d hash rows × w
  * counters; every occurrence increments one counter per row; a key's
  * estimate is the MIN over its d counters — never an underestimate,
  * over by more than εN (ε = e/w) with probability ≤ e^−d.
  *
  * Where [[HeavyHitters]] is the exact path (a full keys-with-count
  * aggregation — state linear in DISTINCT keys), the sketch is the
  * fixed-memory path a 100 TB stream actually affords: the state is a
  * d·w integer GRID regardless of key cardinality, built by ONE
  * map-side-combinable (row, cell) aggregation, and MERGEABLE by plain
  * cellwise addition (the sketch is linear in the data — spec-pinned),
  * so per-shard sketches combine without a keyed shuffle.
  *
  * Determinism contract (the L47/L94 hash discipline): row r's hash of
  * key k is the md5 52-bit integer of "cms:r:k" mod w — no RNG, no
  * seed state, identical on any engine/partitioning — so the whole
  * sketch and every estimate replay bit-for-bit in SQL and the usual
  * hash gate applies to an APPROXIMATE operator. Estimates join the
  * grid-sized sketch by broadcast; a missing cell reads 0. */
object Cms {

  /** md5-derived row-r cell of a key (the L47 dyadic construction's
    * integer form). */
  private def cell(r: Column, key: Column, w: Int): Column =
    pmod(conv(substring(md5(concat(lit("cms:"), r.cast("string"),
        lit(":"), key).cast("binary")), 1, 13), 16, 10).cast("long"),
      lit(w.toLong))

  /** The sketch grid (r, c, n) over an occurrence relation — ≤ d·w
    * rows, one aggregation. Null keys drop (hygiene contract). */
  def sketch(occurrences: DataFrame, keyCol: String, d: Int = 4,
      w: Int = 1024): DataFrame = {
    require(d >= 1 && d <= 8, s"d $d outside [1, 8]")
    require(w >= 2 && w <= (1 << 20), s"w $w outside [2, 2^20]")
    occurrences
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("__k"))
      .select(col("__k"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("r"), cell(col("r"), col("__k"), w).as("c"))
      .groupBy(col("r"), col("c"))
      .agg(count(lit(1)).as("n"))
  }

  /** (key, est) point estimates for `probes(keyCol)` against a sketch
    * built with the same (d, w): est = min over the d counters, 0 for
    * a never-seen cell. The sketch is grid-sized — broadcast join.
    * (d, w) must MATCH the sketch's build parameters — a mismatch
    * reads wrong cells silently (the cell derivation is pure, so there
    * is nothing in the grid to detect it with); callers that persist
    * sketches should persist the parameters beside them. */
  def estimate(sk: DataFrame, probes: DataFrame, keyCol: String,
      d: Int = 4, w: Int = 1024): DataFrame = {
    require(d >= 1 && d <= 8, s"d $d outside [1, 8]")
    probes
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as(keyCol))
      .distinct()
      .select(col(keyCol), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col(keyCol), col("r"),
        cell(col("r"), col(keyCol), w).as("c"))
      .join(broadcast(sk), Seq("r", "c"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}
