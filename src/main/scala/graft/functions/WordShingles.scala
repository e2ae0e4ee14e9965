package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all word w-shingles of a text, canonicalized
  * (lowercase, whitespace runs collapsed to one space) — one fused pass
  * replacing the `lower → regexp_replace → split → transform(sequence,
  * slice, concat_ws)` chain, whose higher-order `transform` is
  * `CodegenFallback` (interpreted, ~ms per document; the shingle pass is
  * the front of every dedup pipeline, so at 100 TB it must stay inside the
  * scan's generated loop).
  *
  * Output is PINNED to the composed-built-ins semantics (the DuckDB oracle
  * twins replicate it): tokens are the canonical string split on single
  * spaces KEEPING empty tokens — so a leading/trailing whitespace run
  * yields an empty first/last token, exactly like
  * `split(lower(regexp_replace(text, "\\s+", " ")), " ", -1)`. Documents
  * with fewer than w tokens yield an empty array. Shingles are NOT
  * deduplicated here (`.distinct()` after the explode, as before).
  */
case class WordShinglesExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val w: Int = right.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${left.dataType.catalogString}")
    else if (!right.foldable || !(right.dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _                                             => false
    }) || right.eval() == null) // typed NULL literal is foldable — avoid NPE
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable non-null integral width")
    else if (right.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName width must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(text: Any, width: Any): Any =
    WordShinglesExpr.shingles(text.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"${ev.value} = graft.functions.WordShinglesExpr.shingles($text, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShinglesExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "word_shingles"
}

/** Native sibling of [[WordShinglesExpr]] for NON-OVERLAPPING spans: all
  * `ceil(nTokens / w)` consecutive `w`-token chunks of the canonical form
  * (the last may be short). One fused pass replacing the
  * `transform(sequence, slice, array_join)` chain, whose higher-order
  * functions are interpreted per row — this is [[graft.ops.Dedup.spanDedup]]'s
  * hot front, so at 100 TB it must stay inside the scan's generated loop
  * exactly like the shingle pass. Tokenization is byte-for-byte
  * [[WordShinglesExpr.tokens]], so the two primitives can never disagree
  * about canonicalization.
  */
case class WordChunksExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val w: Int = right.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${left.dataType.catalogString}")
    else if (!right.foldable || !(right.dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _                                             => false
    }) || right.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable non-null integral width")
    else if (right.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName width must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(text: Any, width: Any): Any =
    WordChunksExpr.chunks(text.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"${ev.value} = graft.functions.WordChunksExpr.chunks($text, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordChunksExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "word_chunks"
}

object WordChunksExpr {

  /** All non-overlapping w-chunks (space-joined) — called from both eval
    * and generated code.
    */
  def chunks(text: UTF8String, w: Int): ArrayData = {
    val toks = WordShinglesExpr.tokens(text)
    val n = (toks.length + w - 1) / w
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < n) {
      sb.setLength(0)
      var k = j * w
      val end = math.min(k + w, toks.length)
      while (k < end) {
        if (k > j * w) sb.append(' ')
        sb.append(toks(k))
        k += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point (session registry, installed by
    * [[graft.GraftExtensions]]).
    */
  def word_chunks(text: Column, w: Column): Column =
    org.apache.spark.sql.functions.call_function("word_chunks", text, w)
}

object WordShinglesExpr {

  // Java-regex \s (what Spark's regexp_replace("\\s+") matches): space,
  // tab, LF, VT, FF, CR. NOT Character.isWhitespace (which adds unicode
  // separators) — the canonical form must match the composed built-ins.
  @inline private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Tokens of the canonical form, split on single spaces keeping empties
    * (see class doc). Exposed for the spec's parity check.
    */
  def tokens(text: UTF8String): Array[String] = {
    // UTF8String.toLowerCase matches Spark's lower(); work on its chars
    val s = text.toLowerCase.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    if (n == 0) return Array("")
    if (isSpace(s.charAt(0))) out += "" // leading run -> empty first token
    while (i < n) {
      while (i < n && isSpace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isSpace(s.charAt(i))) i += 1
        out += s.substring(start, i)
      } else out += "" // trailing run -> empty last token
    }
    out.toArray
  }

  /** All w-shingles (space-joined token windows) as ArrayData — called from
    * both eval and generated code.
    */
  def shingles(text: UTF8String, w: Int): ArrayData = {
    val toks = tokens(text)
    val n = toks.length - w + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < n) {
      sb.setLength(0)
      var k = 0
      while (k < w) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point (session registry, installed by
    * [[graft.GraftExtensions]]).
    */
  def word_shingles(text: Column, w: Column): Column =
    org.apache.spark.sql.functions.call_function("word_shingles", text, w)
}
