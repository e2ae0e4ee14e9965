package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: base-131 polynomial rolling hash of a string
  * over Z/2^64 (Java wrap-around semantics, full 64-bit output) — the
  * content-fingerprinting primitive for dedup keys.
  *
  * Why an Expression and not a UDF: `doGenCode` splices the loop straight
  * into WholeStageCodegen — no boxing, no SerDe, no codegen fence — so a
  * fingerprint pass over a 100 TB text column stays in the same generated
  * loop as the scan (SURVEY §7.4 names this the only justified custom-code
  * tier beyond composed built-ins).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = $acc * 131L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {

  /** Reference implementation (the Expression's eval and codegen are both
    * pinned to this): h = Σ b_i · 131^(n−1−i) over Z/2^64.
    */
  def hashBytes(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = acc * 131L + (bytes(i) & 0xffL)
      i += 1
    }
    acc
  }

  /** Column-API entry point — resolves through the session registry
    * (installed by [[graft.GraftExtensions]]), same path SQL takes.
    */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.functions.call_function("rolling_hash", c)
}
