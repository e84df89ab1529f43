package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min screening predicate — `estimate(h) >= min` against a
  * pre-built [[CountMinSketch]] (Cormode & Muthukrishnan 2005), the
  * frequency analog of [[BloomMightContain]]: the sketch rides the plan
  * as a reference object (`ctx.addReferenceObj`), so codegen emits a
  * direct field call with no per-row (de)serialization and the task
  * closure carries the sketch exactly once. Count-Min never
  * UNDERestimates, so a key whose true count clears `min` always passes
  * the screen — false positives only, which callers exact-confirm. */
case class CmsAtLeast(child: Expression, cms: CountMinSketch, min: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint argument, got ${other.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_cms_at_least"

  override def nullSafeEval(h: Any): Any =
    cms.estimateCount(h.asInstanceOf[Long]) >= min

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms,
      classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev,
      h => s"$ref.estimateCount(java.lang.Long.valueOf($h)) >= ${min}L")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CmsAtLeast = copy(child = newChild)
}
