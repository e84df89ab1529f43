package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog register sketch — Flajolet, Fusy, Gandouet & Meunier
  * 2007 (AofA, "HyperLogLog: the analysis of a near-optimal
  * cardinality estimation algorithm"), with Whang et al. 1990's linear
  * counting as the standard small-range correction.
  *
  * Why it exists beside [[Kmv]] (r15, L168): KMV's k-minimum-values
  * sketch is k·8 bytes for ~1/√k relative error — 64 values buy ~12%.
  * HLL's m registers are one SMALL integer each (here a 256-cell
  * BIGINT array for engine portability; 6 bits/cell in a packed
  * production layout) for 1.04/√m ≈ 6.5% at m = 256 — the
  * memory/error trade is an order of magnitude better, at the price
  * of a DEFINED estimator approximation instead of KMV's exact
  * rational estimator. Both are max/min-monoid mergeable; the merge
  * is register-wise MAX, an algebraic identity with sketch-of-union
  * (max is commutative, associative, idempotent), so generation
  * folds over persisted sketch tables never rescan the base corpus —
  * the [[IncrementalAgg]] economics, third family.
  *
  * Determinism/exactness: the hash is the house 56-bit md5 idiom
  * ([[Kmv.keyHash]], shared verbatim with the oracle). Register index
  * j = h div 2^48 (top 8 bits), word w = h mod 2^48, and
  * ρ(w) = 49 − bitlen(w) (the leading-zero count of the 48-bit word
  * plus 1; w = 0 ⇒ ρ = 49), with bitlen evaluated as `length(bin(w))`
  * on BOTH engines — every register value is an exact integer both
  * engines replay. The raw estimator E = α_m·m²/Σ_j 2^(−M_j) is
  * evaluated over the common denominator 2^49:
  *   D = Σ_j 2^(49−M_j)  (≤ 256·2^49 < 2^63 — a LONG, empty registers
  *                        contribute 2^49 each)
  *   raw = div(AlphaE6·m²·2^49, 10⁶·D)  — ONE truncating division.
  * Small-range correction (the standard E ≤ 5m/2 rule, Flajolet §4):
  * when any register is empty and raw ≤ 640, linear counting
  * m·ln(m/V) is used instead, through the L151 fixed-point table
  * logarithm ([[Drift.withTableLn]] — its FOURTH consumer):
  *   lc = div(m·lnE9(m, V), 10⁹)
  * so the corrected path is ALSO an integer both engines replay
  * token-for-token (the table ln under-reads by < ln(257/256) per
  * call ⇒ lc under-reads by ≤ 1 count — stated, not clamped). No
  * large-range correction exists on purpose: it matters near 2^56/30
  * ≈ 2.4·10¹⁵ distinct keys, far beyond the 56-bit collision class
  * every sketch in this battery already documents.
  *
  * α_m for m = 256: AlphaE6 = round(10⁶·0.7213/(1 + 1.079/256)) —
  * the Flajolet §4 constant, embedded as the SAME integer literal in
  * the generated oracle.
  *
  * Scale shape: ONE map-side-combinable (group, j) MAX collapses the
  * corpus to ≤ 256 rows per group BEFORE any exchange (no distinct
  * needed — max is idempotent over duplicate keys, unlike KMV's
  * pre-exchange dedup); the array assembly and the estimator are
  * grid-sized arithmetic. Merge unions grid×256 tables; nothing
  * corpus-sized moves past the first partial aggregate. */
object Hll {

  /** Register count m (index bits b = 8 of the 56-bit hash). */
  val M = 256

  /** ρ word width: the 48 hash bits below the register index. */
  val WBits = 48

  /** ρ(0) = WBits + 1 — the all-zeros word. */
  val RhoMax = 49L

  /** Flajolet α_256 at 1e-6: 10⁶·0.7213/(1 + 1.079/256), one IEEE
    * double division (deterministic), rounded once. */
  val AlphaE6: Long = Math.round(1e6 * 0.7213 / (1 + 1.079 / M))

  /** 2^48 — the register-index divisor. */
  val W: Long = 281474976710656L

  /** AlphaE6·m²·2^49 — the raw-estimator numerator (≈ 2.65·10²⁵,
    * a DECIMAL(38,0) literal on both engines). */
  val RawNum: BigInt = BigInt(AlphaE6) * M * M * (BigInt(1) << (WBits + 1))

  private val d38 = "decimal(38,0)"

  /** Per-group 256-register sketch: (groupCols…, hll) where hll is a
    * 256-element BIGINT array, cell j = max ρ over keys hashing to
    * register j, 0 = never hit. Null keys drop (no identity to
    * count); groups with no non-null keys emit no row. */
  def sketch(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    Reserved.guard(groupCols,
      Seq("hll", "__h", "__j", "__w", "__rho", "__m"), "Hll")
    val base = df
      .filter(col(keyCol).isNotNull)
      .select(groupCols.map(col) :+ Kmv.keyHash(col(keyCol)).as("__h"): _*)
      .withColumn("__j", call_function("div", col("__h"), lit(W)).cast("int"))
      .withColumn("__w", col("__h") % lit(W))
      .withColumn("__rho",
        when(col("__w") === 0L, lit(RhoMax))
          .otherwise(lit(RhoMax) - length(bin(col("__w"))).cast("long")))
    val regs = base
      .groupBy(groupCols.map(col) :+ col("__j"): _*)
      .agg(max(col("__rho")).as("__rho"))
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("__j"), col("__rho"))))
        .as("__m"))
      .withColumn("hll", transform(sequence(lit(0), lit(M - 1)),
        i => coalesce(element_at(col("__m"), i), lit(0L))))
      .drop("__m")
  }

  /** Register-wise MAX merge of any number of sketch rows per group —
    * merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B) exactly (max monoid;
    * spec-pinned beside Kmv's and Manifest's merge ≡ direct pins). */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    sketches
      .groupBy(groupCols.map(col): _*)
      .agg(aggregate(collect_list(col("hll")),
        typedlit(Seq.fill(M)(0L)),
        (acc, x) => zip_with(acc, x, (a, b) => greatest(a, b))).as("hll"))
  }

  /** Estimator columns over a sketch table: (groupCols…, v_zero, est).
    * v_zero = empty-register count; est = the corrected cardinality
    * estimate (linear counting below the 5m/2 lip when v_zero > 0,
    * raw HLL otherwise — both exact integer cascades, see object
    * doc). */
  def estimate(sketchTable: DataFrame): DataFrame = {
    val groupCols = sketchTable.columns.filterNot(_ == "hll").toSeq
    val vz = size(filter(col("hll"), x => x === 0L)).cast("long")
    val dsum = aggregate(col("hll"), lit(0L),
      (acc, x) => acc + pow(lit(2.0), lit(RhoMax) - x).cast("long"))
    val withLn = Drift.withTableLn(
      sketchTable
        .withColumn("__vz", vz)
        .withColumn("__d", dsum)
        .withColumn("__lcnum", lit(M.toLong))
        // v_zero = 0 rows never read the ln; the greatest() keeps the
        // range reduction's positive-operand contract on that path
        .withColumn("__lcden", greatest(col("__vz"), lit(1L))),
      "__lc")
    val raw = call_function("div", lit(RawNum.toString).cast(d38),
      lit(1000000L).cast(d38) * col("__d").cast(d38)).cast("long")
    val lc = call_function("div",
      lit(M.toLong) * col("__lcln"), lit(1000000000L))
    withLn
      .withColumn("__raw", raw)
      .withColumn("est",
        when(col("__vz") > 0L && col("__raw") <= lit(5L * M / 2), lc)
          .otherwise(col("__raw")))
      .select(groupCols.map(col) :+ col("__vz").as("v_zero")
        :+ col("est"): _*)
  }

  /** Plain-Scala register replay for specs (the rowHashJvm
    * convention): the md5 → (j, ρ) math on one key, mirrored
    * bit-for-bit with [[sketch]]'s column expressions. */
  private[graft] def registerJvm(key: String): (Int, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(14)
    val h = java.lang.Long.parseLong(hex, 16)
    val j = (h / W).toInt
    val w = h % W
    val rho = if (w == 0L) RhoMax else RhoMax - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (j, rho)
  }
}
