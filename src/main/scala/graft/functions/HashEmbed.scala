package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native feature-hashing text embedder (Weinberger et al., ICML 2009
  * "Feature Hashing for Large Scale Multitask Learning"): one scan-local
  * pass turns a document into a `dim`-wide SIGNED TOKEN-COUNT vector —
  * bucket = first 8 md5 hex digits of the token mod `dim`, sign = parity
  * of the 9th hex digit, `v[bucket] += sign`.
  *
  * Deliberately integer-exact: per-bucket sums of ±1 are order-free, so
  * the vector is reproducible under any partitioning AND replayable
  * verbatim by a DuckDB oracle (the q99 gate) — unlike float featurizers
  * whose accumulation order leaks into the bits. Downstream similarity
  * casts to double (exact for these magnitudes) and rides the existing
  * vector kernels ([[VectorKernel]], `knnJoinLsh`): the engine's
  * text → embedding → ANN loop with no model artifact to ship.
  *
  * Tokenization is the engine-wide canonical form ([[WordShinglesExpr
  * .tokens]]): lowercase, `\s+` collapsed, split on single spaces keeping
  * empties — identical to the q22/q77 oracles. NULL text → NULL vector.
  * Both eval and codegen call [[HashEmbedExpr.embed]] (the no-drift rule).
  */
case class HashEmbedExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val dim: Int = right.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${left.dataType.catalogString}")
    else if (!right.foldable || right.eval() == null ||
      !(right.dataType match {
        case IntegerType | LongType | ShortType | ByteType => true
        case _                                             => false
      }))
      TypeCheckResult.TypeCheckFailure(s"$prettyName dim must be a foldable integer")
    else if (right.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName dim must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(text: Any, d: Any): Any =
    HashEmbedExpr.embed(text.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, d) =>
      s"${ev.value} = graft.functions.HashEmbedExpr.embed($t, (int) $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashEmbedExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hash_embed"
}

object HashEmbedExpr {

  private val md5 = ThreadLocal.withInitial(() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Signed hashed bag-of-words counts (see class doc). Bucket/sign are
    * hex-prefix reads of the token's md5, so the DuckDB twin
    * `('0x' || substr(md5(tok), 1, 8))::BIGINT % dim` /
    * `('0x' || substr(md5(tok), 9, 1))::INT % 2` replays them exactly.
    */
  def embed(text: UTF8String, dim: Int): ArrayData = {
    val counts = new Array[Int](dim)
    val toks = WordShinglesExpr.tokens(text)
    val d = md5.get()
    var i = 0
    while (i < toks.length) {
      d.reset()
      val b = d.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex digits = bytes 0..3 as an unsigned 32-bit value
      var v = 0L
      var k = 0
      while (k < 4) { v = (v << 8) | (b(k) & 0xffL); k += 1 }
      val bucket = (v % dim).toInt
      // 9th hex digit = high nibble of byte 4; sign from its parity
      val sign = if ((((b(4) & 0xf0) >>> 4) & 1) == 0) 1 else -1
      counts(bucket) += sign
      i += 1
    }
    new GenericArrayData(counts.map(x => x: Any))
  }

  /** Column-API entry point (session registry, installed by
    * [[graft.GraftExtensions]]).
    */
  def hash_embed(text: Column, dim: Column): Column =
    org.apache.spark.sql.functions.call_function("hash_embed", text, dim)
}
