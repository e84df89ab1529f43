package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Minimal Bloom filter over 64-bit hashes, built from first principles
  * (Bloom 1970; Kirsch & Mitzenmacher 2006 double hashing) for the
  * decontamination screen: a set-membership sketch whose size depends
  * only on the expected item count and false-positive rate — never on
  * the data scanned with it — so a multi-million-shingle eval corpus
  * compresses to a constant few-hundred-KB broadcast.
  *
  * Probe scheme: both inserted and probed values are already 64-bit
  * xxhash64 shingle hashes; they are remixed through the SplitMix64
  * finalizer (public constant from Steele et al. 2014, also Vigna's
  * splitmix64.c) into two independent streams, and bit i is
  * `h1 + i*h2 mod m` — the standard k-from-2 construction, whose FPR
  * matches k independent hashes. False negatives are impossible by
  * construction (every set bit stays set); the spec measures FPR
  * against the (1-e^{-kn/m})^k theory curve.
  *
  * Mutable add() is used only during the build fold (per-partition
  * local filters OR-merged associatively); after [[LongBloom.build]]
  * returns, the filter is treated as immutable and shared read-only. */
final class LongBloom(val words: Array[Long], val k: Int)
    extends Serializable {
  require(words.nonEmpty && k >= 1, "empty bloom")
  private val mBits: Long = words.length.toLong * 64L

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def add(h: Long): Unit = {
    val h1 = mix(h)
    val h2 = mix(h ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Math.floorMod(h1 + i.toLong * h2, mBits)
      words((bit >>> 6).toInt) |= (1L << (bit & 63L))
      i += 1
    }
  }

  def contains(h: Long): Boolean = {
    val h1 = mix(h)
    val h2 = mix(h ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Math.floorMod(h1 + i.toLong * h2, mBits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise-OR merge (associative, commutative) — both filters must share
    * sizing, which [[LongBloom.build]] guarantees by construction. */
  def merge(other: LongBloom): LongBloom = {
    require(other.words.length == words.length && other.k == k,
      "bloom sizing mismatch")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def sizeBytes: Long = words.length.toLong * 8L
}

object LongBloom {

  /** Optimal sizing for `nItems` at false-positive rate `fpp`:
    * m = -n ln p / (ln 2)², k = (m/n) ln 2 — clamped to at least one
    * 64-bit word / one probe. */
  def empty(nItems: Long, fpp: Double): LongBloom = {
    require(nItems > 0, s"nItems $nItems must be > 0")
    require(fpp > 0 && fpp < 1, s"fpp $fpp must be in (0,1)")
    val ln2 = math.log(2.0)
    val mBits = math.max(64L,
      math.ceil(-nItems * math.log(fpp) / (ln2 * ln2)).toLong)
    val nWords = ((mBits + 63) / 64).toInt
    val k = math.max(1, math.round(mBits.toDouble / nItems * ln2).toInt)
    new LongBloom(new Array[Long](nWords), k)
  }

  /** Distributed build over a LONG column: per-partition local filters,
    * OR-merged up a tree — driver receives one filter per tree level, not
    * the data. `nItems` sizes the filter (an upper bound is fine: the
    * realized FPR only drops); callers usually know it from a count on a
    * relation they already have. */
  def build(df: DataFrame, c: String, nItems: Long, fpp: Double): LongBloom = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(c).cast("long")).as[Long].rdd
      .treeAggregate(empty(nItems, fpp))(
        (b, h) => { b.add(h); b }, (a, b) => a.merge(b))
  }
}
