package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the k-wide MinHash signature of a document's
  * w-shingle set, computed in ONE pass inside the scan.
  *
  * Replaces `wordShingles (explode + distinct) → groupBy(id).agg(k ×
  * min(portableHash))` — which shuffles one (id, shingle) row per shingle
  * TWICE (the distinct, then the group-by). Min over a multiset equals min
  * over the set, so no dedup is needed at all, and only (id, s0..s{k−1}) —
  * k longs per document — ever leaves the scan stage. At 100 TB the
  * shingle shuffle is the dominant cost of the MinHash pipeline.
  *
  * The hash is BIT-IDENTICAL to [[graft.ops.Dedup.portableHash]] with salt
  * `mh<i>` (first 8 md5 hex digits of salt+shingle as an unsigned 32-bit
  * value) and tokenization/shingling is [[WordShinglesExpr]] — so the
  * existing DuckDB oracle twins (q25/q26) are unchanged. Documents with
  * fewer than w tokens yield NULL (the composed pipeline simply has no
  * rows for them — filter `isNotNull` to reproduce that).
  */
case class MinHashSigExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true // short docs → null signature

  private lazy val k: Int = second.eval().asInstanceOf[Number].intValue()
  private lazy val w: Int = third.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    def intOk(e: Expression) = e.foldable && (e.dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _                                             => false
    }) && e.eval() != null && e.eval().asInstanceOf[Number].intValue() >= 1
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${first.dataType.catalogString}")
    else if (!intOk(second) || !intOk(third))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires foldable non-null integral k >= 1 and w >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(text: Any, kAny: Any, wAny: Any): Any =
    MinHashSigExpr.signature(text.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, _, _) => {
      val sig = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $sig =
         |  graft.functions.MinHashSigExpr.signature($text, $k, $w);
         |if ($sig == null) { ${ev.isNull} = true; } else { ${ev.value} = $sig; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinHashSigExpr =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "minhash_sig"
}

object MinHashSigExpr {

  private val md5 = ThreadLocal.withInitial(() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** `Dedup.portableHash(shingle, "mh<i>")` twin: unsigned 32-bit value of
    * the first 8 md5 hex digits of salt+shingle.
    */
  def portableHash32(salt: String, shingle: String): Long = {
    val d = md5.get()
    d.reset()
    d.update(salt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val b = d.digest(shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** One-pass k-wide signature over the w-shingle multiset (min is
    * duplicate-insensitive, so the composed pipeline's `.distinct()` is
    * unnecessary here); null when the document has no shingles.
    */
  def signature(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = WordShinglesExpr.tokens(text)
    val n = toks.length - w + 1
    if (n <= 0) return null
    val salts = Array.tabulate(k)(i => s"mh$i")
    val mins = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < n) {
      sb.setLength(0)
      var t = 0
      while (t < w) {
        if (t > 0) sb.append(' ')
        sb.append(toks(j + t))
        t += 1
      }
      val shingle = sb.toString
      var i = 0
      while (i < k) {
        val h = portableHash32(salts(i), shingle)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins.map(m => m: Any))
  }

  /** Column-API entry point (session registry, installed by
    * [[graft.GraftExtensions]]).
    */
  def minhash_sig(text: Column, k: Column, w: Column): Column =
    org.apache.spark.sql.functions.call_function("minhash_sig", text, k, w)
}
