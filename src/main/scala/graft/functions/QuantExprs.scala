package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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

  @inline private def get(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

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
}

/** Type plumbing shared by the unary quantization expressions. */
trait QuantUnaryExpression extends UnaryExpression {

  protected def vecIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

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

/** Column-API entry points (registry-resolved, same path SQL takes). */
object QuantExprs {
  import org.apache.spark.sql.functions.call_function

  def quantize_i8(vec: Column): Column = call_function("quantize_i8", vec)

  def quant_err_i8(vec: Column): Column = call_function("quant_err_i8", vec)
}
