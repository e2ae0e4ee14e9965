package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 61-bit polynomial rolling hash of a string
  * (base 131, mod 2^61−1) — the content-defined-chunking / fingerprinting
  * primitive used for dedup keys.
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
         |  $acc = java.lang.Math.floorMod($acc * 131L + ($bytes[$i] & 0xffL), ${RollingHash.Mod}L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  /** 2^61 − 1 (Mersenne prime). */
  val Mod: Long = 2305843009213693951L

  def hashBytes(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = java.lang.Math.floorMod(acc * 131L + (bytes(i) & 0xffL), Mod)
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
