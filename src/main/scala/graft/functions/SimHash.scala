package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 60-bit SimHash of a document's token
  * multiset, computed in ONE pass inside the scan.
  *
  * Replaces the composed pipeline `explode(tokens) → groupBy(id).agg(60 ×
  * sum(when(bit set, 1, −1)))` — which shuffles one row per TOKEN and a
  * 60-column vote vector per document. At 100 TB the token explode is the
  * dominant shuffle of the whole dedup battery; with this expression only
  * `(id, simhash)` — 16 bytes/doc — ever leaves the scan stage.
  *
  * The signature is BIT-IDENTICAL to the composed form (DedupSpec pins
  * parity; the q29 oracle's machine-generated SQL twin is unchanged):
  *  - tokens: canonical form (lowercase, collapse `\s+`) split on single
  *    spaces keeping empties — [[WordShinglesExpr.tokens]], the same
  *    tokenization the shingle/minhash paths use;
  *  - per-token hash: first 15 md5 hex digits as a 60-bit value, the
  *    portable `('0x' || substr(md5(tok), 1, 15))::BIGINT` both engines
  *    compute;
  *  - bit i of the signature = (Σ_tokens ±1 votes for bit i) > 0.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sim_hash requires STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashExpr.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)

  override def prettyName: String = "sim_hash"
}

object SimHashExpr {

  private val md5 = ThreadLocal.withInitial(() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 15 md5 hex digits of the token as a 60-bit long — the portable
    * hash both engines derive (`Dedup.portableHash`'s 64-bit sibling).
    */
  def tokenHash60(token: String): Long = {
    val d = md5.get()
    d.reset()
    val b = d.digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // 15 hex digits = bytes 0..6 (14 digits) + high nibble of byte 7
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (b(k) & 0xffL); k += 1 }
    (v << 4) | ((b(7) & 0xf0L) >>> 4)
  }

  /** One-pass 60-bit SimHash over the token multiset (see class doc). */
  def simhash(text: UTF8String): Long = {
    val toks = WordShinglesExpr.tokens(text)
    val votes = new Array[Int](60)
    var t = 0
    while (t < toks.length) {
      val h = tokenHash60(toks(t))
      var i = 0
      while (i < 60) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 60) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Column-API entry point (session registry, installed by
    * [[graft.GraftExtensions]]).
    */
  def sim_hash(text: Column): Column =
    org.apache.spark.sql.functions.call_function("sim_hash", text)
}
