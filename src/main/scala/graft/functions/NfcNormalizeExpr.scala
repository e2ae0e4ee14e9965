package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition) of a string column — the normalization pass a text-dedup
  * pipeline runs BEFORE fingerprinting, because canonically-equivalent
  * byte sequences ("é" composed U+00E9 vs decomposed e + U+0301) are the
  * same text to every reader but different bytes to md5: without NFC,
  * exact dedup silently misses duplicates whose sources emitted different
  * (equally valid) encodings of the same characters.
  *
  * Eval and codegen share ONE kernel ([[NfcNormalizeExpr.normalize]] — the
  * engine-wide no-drift rule); the kernel takes the JDK
  * `java.text.Normalizer` NFC path only after a cheap `isNormalized`
  * check, so the overwhelmingly-common already-NFC (e.g. pure-ASCII) case
  * does no allocation beyond the check. Semantics are the Unicode
  * standard's — DuckDB's independent `nfc_normalize` implementation is
  * the oracle twin (q113).
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalizeExpr.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalizeExpr {

  /** The shared scalar kernel (eval AND generated code call this). */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point — resolves through the session registry. */
  def nfc_normalize(c: Column): Column =
    org.apache.spark.sql.functions.call_function("nfc_normalize", c)
}
