package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the data-layout key behind
  * multi-column file pruning: sorting a table by `zValue(a, b)` makes
  * every file's (min, max) footprint a small rectangle in BOTH
  * dimensions, so a scan with predicates on either column (or both)
  * prunes most files by parquet min/max stats alone — where a
  * single-column sort gives pruning on that column only and leaves the
  * second dimension's footprint full-width in every file. The layout
  * move that makes "co-clustered by (customer, part)" possible without
  * bucketing both.
  *
  * `zValue` interleaves the LOW 32 BITS of each input (declared
  * domain: nonnegative ints — keys, bucket numbers, quantized values;
  * inputs are masked, never rejected) into one BIGINT via the
  * branch-free magic-mask spread (5 shift-mask steps per side, pure
  * bitwise integer ops — codegen'd by Spark, replayed operator-for-
  * operator in DuckDB by the oracle). Bit i of `a` lands at 2i, bit i
  * of `b` at 2i+1: equal-length prefixes ⇒ nested quadrants. */
object ZOrder {

  private val Masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** The low 32 bits of `c` spread to even bit positions of a long. */
  def spread(c: Column): Column =
    Masks.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
      case (acc, (sh, mask)) =>
        acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(mask))
    }

  /** Morton code of (a, b): a's bits at even positions, b's at odd. */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
}
