package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

import graft.functions.LongBloom

/** Membership probe against a pre-built [[LongBloom]] — the screening
  * predicate of the bloom-screened decontamination path. The filter
  * itself is NOT a child expression: it rides the plan as a reference
  * object (`ctx.addReferenceObj`), so codegen emits a direct
  * `bloom.contains(h)` call on the generated-class field — no
  * per-row (de)serialization, no literal-sized plan strings — and the
  * task closure carries the filter bits exactly once. May return true
  * for absent values (by `fpp`), never false for present ones; callers
  * exact-confirm survivors. */
case class BloomMightContain(child: Expression, bloom: LongBloom)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint argument, got ${other.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(h: Any): Any =
    bloom.contains(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[LongBloom].getName)
    defineCodeGen(ctx, ev, h => s"$ref.contains($h)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}
