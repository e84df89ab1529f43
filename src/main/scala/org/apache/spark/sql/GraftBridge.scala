package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made `classic.ExpressionUtils`
  * private[sql]; libraries shipping native Catalyst expressions (this is
  * the standard pattern — frameless, deequ, etc. do the same) expose the
  * two conversions from inside the package. Bytecode-wise these are the
  * public static methods of ExpressionUtils — no reflection, no
  * implementation copying. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
