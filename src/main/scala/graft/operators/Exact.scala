package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.pmod

/** Exact integer division helpers — the class fix for a recurring
  * silent-wrap pattern: SQL `div` CASTS ITS RESULT TO LONG, so any
  * cascade quotient past ~9.2·10¹⁸ wraps without warning (the r16
  * Jonckheere–Terpstra lesson — the sf0.1 gate read the variance
  * 3.3× low, off by exactly 2·2⁶³, while both small-SF gates stayed
  * green). Operators whose quotients can exceed Long range within
  * their documented capacity must divide here instead. */
object Exact {

  /** ⌊a/b⌋ kept in DECIMAL: (a − pmod(a, b))/b is an exact integer,
    * so the decimal divide introduces no rounding. For the
    * non-negative operands every caller feeds it, floor ==
    * truncation — bit-identical to the DuckDB oracle's `//` on
    * HUGEINT. Capacity: the quotient must fit the integer digits of
    * DECIMAL(38,6), i.e. < 10³² (vs `div`'s silent 9.2·10¹⁸ wrap). */
  def dfloor(a: Column, b: Column): Column = (a - pmod(a, b)) / b
}
