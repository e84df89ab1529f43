package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Johnson–Lindenstrauss Rademacher projection: `array<float>`
  * of `dims` → `array<double>` of `signs.length` target dims, where
  * `y_j = Σ_d x_d · signs(j)(d)` accumulates left-to-right in DOUBLE
  * (the [[DotProduct]] fold contract — bitwise equal to DuckDB's
  * `list_sum(list_transform(...))` replay). The ±1 sign matrix is a
  * plan-time constant referenced from generated code (the Hilbert
  * lesson: a loop over a referenced array, never a 4096-term unrolled
  * expression tree — that form JIT-fails and runs interpreted).
  * Null array → null; elements expected non-null. */
case class JlProject(child: Expression, signs: Array[Array[Byte]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_jl_project"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Any](signs.length)
    var j = 0
    while (j < signs.length) {
      val row = signs(j)
      val n = math.min(arr.numElements(), row.length)
      var acc = 0.0
      var d = 0
      while (d < n) {
        acc += arr.getFloat(d).toDouble * row(d).toDouble
        d += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.addReferenceObj("signs", signs, "byte[][]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |Object[] $out = new Object[$s.length];
         |for (int $j = 0; $j < $s.length; $j++) {
         |  final byte[] row = $s[$j];
         |  final int $n = java.lang.Math.min($v.numElements(), row.length);
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += (double) $v.getFloat($d) * (double) row[$d];
         |  }
         |  $out[$j] = java.lang.Double.valueOf($acc);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): JlProject = copy(child = newChild)
}

/** Native squared-L2 distance over two `array<float>` or two
  * `array<double>` columns — left-to-right accumulation in DOUBLE, the
  * same fold contract as [[DotProduct]], so the DuckDB
  * `list_sum(list_transform(range…, i -> (a[i]-b[i])*(a[i]-b[i])))`
  * replay is bitwise identical. */
case class L2DistSq(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemOk(dt: DataType) = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && left.dataType == right.dataType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two same-typed array<float|double> args, " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  // lazy: children are unresolved at construction time
  private lazy val isFloat =
    left.dataType == ArrayType(FloatType, containsNull = false) ||
      left.dataType == ArrayType(FloatType, containsNull = true)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d =
        if (isFloat) x.getFloat(i).toDouble - y.getFloat(i).toDouble
        else x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val get = if (isFloat) "getFloat" else "getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = (double) $a.$get($i) - (double) $b.$get($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistSq =
    copy(left = newLeft, right = newRight)
}
