package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization
  * (UAX #15) — the canonical-composition pass that belongs in front of
  * every exact-dedup fingerprint: "café" arrives from the web both
  * precomposed (U+00E9) and decomposed (e + U+0301), byte-different but
  * canonically identical, so un-normalized md5 dedup silently keeps
  * both. Delegates to `java.text.Normalizer` (the JDK's ICU-derived
  * implementation of the Unicode normalization algorithm — the same
  * spec DuckDB's `nfc_normalize` implements, which is what makes the
  * oracle comparison meaningful).
  *
  * Codegen tier: a single static call per row inside whole-stage
  * codegen (no UDF serialization boundary, no interpreted fallback).
  * Fast path: `Normalizer.isNormalized` is a quick-check scan
  * (ASCII and most already-NFC text short-circuits without allocating
  * a new string) — the overwhelmingly common case in a web corpus.
  * Null propagates null. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** NFC-normalize one UTF8String; returns the INPUT object when already
    * normalized (quick-check fast path, zero allocation). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
