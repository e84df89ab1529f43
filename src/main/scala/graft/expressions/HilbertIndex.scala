package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst Hilbert index (xy2d) of a `(bigint, bigint)` grid
  * point — the codegen remedy for q_x15's interpreter stall (VERDICT
  * r10 #2). The original per-level column chain is semantically right
  * and keeps the expression TREE linear, but whole-stage codegen fuses
  * all 24 projections into ONE generated method: measured 21,187
  * bytecode bytes on the q_x15 plan — past HotSpot's 8,000-byte
  * HugeMethodLimit, so the JVM never JITs it and the chain runs in the
  * bytecode interpreter at ~5.7 µs/row (HilbertProbe; Z-order's small
  * method does the identical input in 0.08 s vs 3.87 s). This
  * expression emits the SAME quadrant walk as an O(bits) Java loop —
  * a few hundred bytecode bytes, JIT-compiled, still inside
  * whole-stage codegen.
  *
  * Semantics are bit-identical to [[graft.functions.Hilbert
  * .withHilbertChain]] (the per-level walk: quadrant q = (3·rx) xor
  * ry; when ry = 0 swap x/y, reflecting through n−1 when rx = 1) and
  * to the generated DuckDB oracle — pinned three ways in HilbertSpec.
  * Declared domain 0 ≤ x, y < 2^bits, enforced by callers (Layout's
  * negative-key guard); bits ≤ 24 keeps d < 2^48 in BIGINT. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    val n1 = (1L << bits) - 1L
    var d = 0L
    var level = bits - 1
    while (level >= 0) {
      val s = 1L << level
      val rx = (x & s) != 0L
      val ry = (y & s) != 0L
      d += s * s * (if (rx && !ry) 3L else if (rx) 2L
        else if (ry) 1L else 0L)
      if (!ry) {
        val nx = if (rx) n1 - y else y
        val ny = if (rx) n1 - x else x
        x = nx; y = ny
      }
      level -= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      val n1 = (1L << bits) - 1L
      s"""
         |long $x = $a;
         |long $y = $b;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0L; $s >>= 1) {
         |  final boolean $rx = ($x & $s) != 0L;
         |  final boolean $ry = ($y & $s) != 0L;
         |  $d += $s * $s * ($rx ? (!$ry ? 3L : 2L) : ($ry ? 1L : 0L));
         |  if (!$ry) {
         |    final long $t = $rx ? ${n1}L - $y : $y;
         |    $y = $rx ? ${n1}L - $x : $x;
         |    $x = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
