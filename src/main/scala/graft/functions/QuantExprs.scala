package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Scalar quantization kernels for embedding columns — the 4× memory /
  * bandwidth lever for a 100 TB vector store: a 768-dim float32 embedding
  * (3 KiB) becomes 768 uint8 codes (+ two corners), and ANN candidate
  * generation (LSH bands, IVF cells) runs on the codes' reconstruction
  * unchanged. Per-vector min/max scaling:
  *
  *   q_i = floor((x_i − mn)·255 / (mx − mn) + 0.5)   (0 when mx = mn)
  *
  * with every step in DOUBLE (float inputs are widened exactly), and
  * `floor(v + 0.5)` for half-up rounding — unambiguous and bit-identical
  * in any IEEE-754 engine, where native `round()` rounding modes differ
  * (Spark HALF_UP vs banker's variants). The DuckDB oracle twin replays
  * the same formula via `list_transform`, so quantized codes and
  * reconstruction errors hash-compare exactly.
  *
  * Both the interpreted `eval` and the generated code call these static
  * kernels (the [[VectorKernel]] no-drift rule).
  */
object QuantKernel {

  // Fail fast on null elements: getFloat/getDouble would silently read 0.0
  // on UnsafeArrayData but NPE on GenericArrayData, letting interpreted
  // eval and codegen drift. Both paths call this one kernel, so a planted
  // null is a loud error in either engine, never a silent 0-quantization.
  @inline private def get(a: ArrayData, isFloat: Boolean, i: Int): Double = {
    if (a.isNullAt(i))
      throw new IllegalArgumentException(
        s"quantize_i8/quant_err_i8: null element at index $i (vectors must be dense)")
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
  }

  @inline private def corners(a: ArrayData, isFloat: Boolean): (Double, Double) = {
    val n = a.numElements()
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val x = get(a, isFloat, i)
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    (mn, mx)
  }

  /** Per-vector min/max uint8 codes (as ints — the narrow on-disk layout
    * is the writer's concern; comparing engines wants plain integers).
    */
  def quantize(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val (mn, mx) = corners(a, isFloat)
    val range = mx - mn
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (range == 0) 0
        else math.floor((get(a, isFloat, i) - mn) * 255.0 / range + 0.5).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused max |x_i − dequant(q_i)| over the vector — the reconstruction
    * error bound check without materializing the dequantized array. The
    * worst case is half a quantization step: (mx − mn)/255/2.
    */
  def maxErr(a: ArrayData, isFloat: Boolean): Double = {
    val n = a.numElements()
    val (mn, mx) = corners(a, isFloat)
    val range = mx - mn
    if (range == 0 || n == 0) return 0.0
    var worst = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, isFloat, i)
      val q = math.floor((x - mn) * 255.0 / range + 0.5)
      val deq = mn + q * range / 255.0
      val err = math.abs(x - deq)
      if (err > worst) worst = err
      i += 1
    }
    worst
  }

  /** Fused cosine between a float/double query vector and a QUANTIZED
    * corpus vector (uint8 codes + corners), dequantizing inline in the
    * scoring loop — the corpus side of an ANN scan reads 1 byte/element
    * instead of 4 and never materializes the reconstructed array.
    * Dequant per element: x̂_i = mn + q_i·(mx − mn)/255 (left-to-right,
    * all-double — the DuckDB twin replays it via `list_transform`).
    * Same zero-norm → −1 guard as [[VectorKernel.cosine]].
    */
  def cosineQ(q: ArrayData, qIsFloat: Boolean, codes: ArrayData,
      mn: Double, mx: Double): Double = {
    val n = q.numElements()
    require(n == codes.numElements(),
      s"cosine_q8 dimension mismatch: ${q.numElements()} vs ${codes.numElements()}")
    val range = mx - mn
    var d = 0.0
    var nq = 0.0
    var nx = 0.0
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i))
        throw new IllegalArgumentException(
          s"cosine_q8: null code at index $i (codes must be dense)")
      val x = get(q, qIsFloat, i)
      val y = mn + codes.getInt(i) * range / 255.0
      d += x * y; nq += x * x; nx += y * y
      i += 1
    }
    val denom = math.sqrt(nq) * math.sqrt(nx)
    if (denom > 0) d / denom else -1.0
  }
}

/** Type plumbing shared by the unary quantization expressions. */
trait QuantUnaryExpression extends UnaryExpression {

  protected def vecIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // containsNull=true is accepted (parquet list elements read as nullable
  // even when dense); an ACTUAL null element fails fast inside the shared
  // kernel — see [[QuantKernel.get]].
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT|DOUBLE> argument, got ${other.catalogString}")
  }
}

/** `quantize_i8(vec)` — per-vector min/max scalar quantization to uint8
  * codes (see [[QuantKernel.quantize]]).
  */
case class QuantizeI8(child: Expression) extends QuantUnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(vec: Any): Any =
    QuantKernel.quantize(vec.asInstanceOf[ArrayData], vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = graft.functions.QuantKernel.quantize($vec, $vecIsFloat);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeI8 =
    copy(child = newChild)

  override def prettyName: String = "quantize_i8"
}

/** `quant_err_i8(vec)` — fused max reconstruction error of the uint8
  * round-trip (see [[QuantKernel.maxErr]]).
  */
case class QuantErrI8(child: Expression) extends QuantUnaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(vec: Any): Any =
    QuantKernel.maxErr(vec.asInstanceOf[ArrayData], vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec =>
      s"${ev.value} = graft.functions.QuantKernel.maxErr($vec, $vecIsFloat);")

  override protected def withNewChildInternal(newChild: Expression): QuantErrI8 =
    copy(child = newChild)

  override def prettyName: String = "quant_err_i8"
}

/** `cosine_q8(q_vec, codes, mn, mx)` — fused cosine against a quantized
  * vector, dequantizing inline (see [[QuantKernel.cosineQ]]). This is what
  * makes int8 quantization a scan-bandwidth lever: the ANN candidate scan
  * reads the 4×-smaller code column and scores it directly.
  */
case class CosineQ8(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = DoubleType

  private def qIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    val qOk = first.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    val cOk = second.dataType match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    }
    if (!qOk || !cOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT|DOUBLE>, ARRAY<INT>, DOUBLE, DOUBLE), got " +
          children.map(_.dataType.catalogString).mkString("(", ", ", ")"))
    else if (third.dataType != DoubleType || fourth.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName corners (mn, mx) must be DOUBLE")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(q: Any, codes: Any, mn: Any, mx: Any): Any =
    QuantKernel.cosineQ(
      q.asInstanceOf[ArrayData], qIsFloat, codes.asInstanceOf[ArrayData],
      mn.asInstanceOf[Double], mx.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, mn, mx) =>
      s"${ev.value} = graft.functions.QuantKernel.cosineQ($q, $qIsFloat, $c, $mn, $mx);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): CosineQ8 =
    copy(first = f, second = s, third = t, fourth = q)

  override def prettyName: String = "cosine_q8"
}

/** Column-API entry points (registry-resolved, same path SQL takes). */
object QuantExprs {
  import org.apache.spark.sql.functions.call_function

  def quantize_i8(vec: Column): Column = call_function("quantize_i8", vec)

  def quant_err_i8(vec: Column): Column = call_function("quant_err_i8", vec)

  def cosine_q8(q: Column, codes: Column, mn: Column, mx: Column): Column =
    call_function("cosine_q8", q, codes, mn, mx)
}
