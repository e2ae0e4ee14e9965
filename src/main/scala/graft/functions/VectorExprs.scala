package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared scalar kernels for the vector expressions. Both the interpreted
  * `eval` path and the generated (janino) code call THESE methods, so the two
  * paths cannot drift — the same trick `RollingHash.hashBytes` uses, minus
  * the inlined loop (a static call from generated code stays inside
  * whole-stage codegen; only boxing/virtual-iterator shapes break it).
  *
  * All folds are strict left-to-right double accumulation, matching the
  * DuckDB oracle twins (`list_sum(list_transform(generate_series ...))`)
  * bit-for-bit — same guarantee the previous `aggregate(zip_with(...))`
  * implementation gave, at ~100× less per-row cost (the higher-order
  * functions are `CodegenFallback`: interpreted, allocating a lambda frame
  * per element; VERDICT r3 measured ~1.8 ms per 64-dim cosine on that path).
  */
object VectorKernel {

  // Null elements fail LOUDLY (the sameDim rule): an unchecked read of a
  // null slot returns 0.0, which would silently score/assign a malformed
  // vector — the HOF folds these kernels replaced at least poisoned the
  // result to NULL. Embedding columns are null-free by contract; a null
  // element is upstream corruption, and an error names it.
  @inline private def get(a: ArrayData, isFloat: Boolean, i: Int): Double = {
    if (a.isNullAt(i))
      throw new IllegalArgumentException(s"null vector element at index $i")
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
  }

  // Mismatched dimensions fail LOUDLY: the HOF fold these kernels replaced
  // returned NULL (zip_with pads, null poisons the sum) and silently
  // dropped the row; a truncated partial dot would instead rank a
  // malformed vector into top-k results. An error per bad row is the only
  // honest behavior at corpus scale.
  @inline private def sameDim(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"vector dimension mismatch: ${a.numElements()} vs ${b.numElements()}")
    n
  }

  /** Σ aᵢ·bᵢ, left-to-right. */
  def dot(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Double = {
    val n = sameDim(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, aF, i) * get(b, bF, i); i += 1 }
    acc
  }

  /** Fused cosine: one pass accumulates dot, ‖a‖², ‖b‖². Each accumulator
    * sees the same element order as three separate folds, so the result is
    * bit-identical to dot/(√dot(a,a)·√dot(b,b)) composed from [[dot]].
    * Zero-norm guard: −1.0 (rank last) instead of NaN — Spark sorts NaN
    * above every double, so an unguarded 0/0 would win every top-k.
    */
  def cosine(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Double = {
    val n = sameDim(a, b)
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, aF, i)
      val y = get(b, bF, i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0) d / denom else -1.0
  }

  /** Pseudo-random hyperplane coefficient in [−1, 1] for (plane, element),
    * derived from a splitmix64-style mix — deterministic on every executor
    * with no coefficient matrix to ship, and cheap enough (4 multiplies)
    * to fold straight into the projection loop.
    */
  def coef(seed: Long, p: Int, i: Int): Double = {
    var z = seed + p * 0x9E3779B97F4A7C15L + i * 0xC2B2AE3D27D4EB4FL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }

  /** Sign-bit sketch: bit p of the result is 1 iff the projection of the
    * vector onto pseudo-random hyperplane p is ≥ 0.
    */
  def sketch(a: ArrayData, aF: Boolean, nPlanes: Int, seed: Long): Long = {
    val n = a.numElements()
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      var i = 0
      while (i < n) { proj += get(a, aF, i) * coef(seed, p, i); i += 1 }
      if (proj >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Σ (aᵢ−bᵢ)², left-to-right — squared L2, the SemDeDup metric. Same
    * element order and all-double arithmetic as the
    * `aggregate(zip_with(...))` fold it replaces, so results are
    * bit-identical to the DuckDB twin's generate_series fold.
    */
  def dist2(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Double = {
    val n = sameDim(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = get(a, aF, i) - get(b, bF, i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Argmin-squared-L2 cell id against a codebook: lowest [[dist2]] wins,
    * ties to the LOWEST cell id — the exact `array_min(struct(d, c))`
    * rule of the per-literal-centroid k-means assignment it replaces.
    * Same single-reference-object codebook shape as [[nearestCell]].
    */
  def nearestCellL2(
      vec: ArrayData, vF: Boolean,
      cells: Array[Int], cents: Array[ArrayData]): Int = {
    // init-from-first + Double.compare, as in [[nearestCell]]: a NaN
    // distance (NaN element in legitimate float data) loses the argmin
    // to any finite one, and an all-NaN row ties to the lowest cell —
    // the legacy array_min(struct) ordering. The plain `<` form returned
    // Int.MaxValue (a nonexistent cell) for all-NaN: silent routing loss.
    var bestD = dist2(vec, vF, cents(0), false)
    var bestCell = cells(0)
    var j = 1
    while (j < cells.length) {
      val d = dist2(vec, vF, cents(j), false)
      val c = java.lang.Double.compare(d, bestD)
      if (c < 0 || (c == 0 && cells(j) < bestCell)) {
        bestD = d; bestCell = cells(j)
      }
      j += 1
    }
    bestCell
  }

  /** Argmax-cosine cell id against a codebook: highest [[cosine]] wins,
    * ties to the LOWEST cell id — the exact `max_by(cell, struct(d,
    * -cell))` rule of the pre-r10 IVF assignment. Each comparison calls
    * the same fused [[cosine]] kernel the per-literal-centroid plan
    * called, so scores are bit-identical; the codebook rides in as plain
    * JVM arrays (ONE reference object in generated code), so cost is
    * k fused loops per row regardless of how large k·dim gets.
    */
  def nearestCell(
      vec: ArrayData, vF: Boolean,
      cells: Array[Int], cents: Array[ArrayData]): Int = {
    // init from cell 0 and compare via Double.compare (NaN > everything,
    // NaN == NaN — Spark's struct ordering), so the result is ALWAYS a
    // real codebook cell and matches the legacy max_by rule even on
    // degenerate scores. (Cosine can't actually produce NaN — the
    // zero-norm guard returns −1 — but the kernel shouldn't rely on it.)
    var bestD = cosine(vec, vF, cents(0), true)
    var bestCell = cells(0)
    var j = 1
    while (j < cells.length) {
      val d = cosine(vec, vF, cents(j), true)
      val c = java.lang.Double.compare(d, bestD)
      if (c > 0 || (c == 0 && cells(j) < bestCell)) {
        bestD = d; bestCell = cells(j)
      }
      j += 1
    }
    bestCell
  }
}

/** Type plumbing shared by the binary vector expressions: both inputs must
  * be `array<float>` or `array<double>` (mixed is fine — IVF compares a
  * float corpus against float-cast centroids, but the check is per-child).
  * Array elements are assumed non-null (embedding columns); a null ARRAY
  * yields null via the standard null-safe path.
  */
trait VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT|DOUBLE> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
}

/** `dot_f(a, b)` — native codegen'd left-to-right dot product. */
case class DotF(left: Expression, right: Expression) extends VectorBinaryExpression {

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dot(
      a.asInstanceOf[ArrayData], elemIsFloat(left),
      b.asInstanceOf[ArrayData], elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernel.dot(" +
        s"$a, ${elemIsFloat(left)}, $b, ${elemIsFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f"
}

/** `cosine_f(a, b)` — fused single-pass cosine with the zero-norm → −1
  * guard (see [[VectorKernel.cosine]]).
  */
case class CosineF(left: Expression, right: Expression) extends VectorBinaryExpression {

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.cosine(
      a.asInstanceOf[ArrayData], elemIsFloat(left),
      b.asInstanceOf[ArrayData], elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernel.cosine(" +
        s"$a, ${elemIsFloat(left)}, $b, ${elemIsFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineF =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_f"
}

/** `dist2_f(a, b)` — native codegen'd left-to-right squared L2 distance. */
case class Dist2F(left: Expression, right: Expression) extends VectorBinaryExpression {

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dist2(
      a.asInstanceOf[ArrayData], elemIsFloat(left),
      b.asInstanceOf[ArrayData], elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernel.dist2(" +
        s"$a, ${elemIsFloat(left)}, $b, ${elemIsFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2F =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dist2_f"
}

/** `hyperplane_sketch(vec, nPlanes, seed)` — LSH sign-bit sketch. `nPlanes`
  * and `seed` must be foldable (they parameterize the plane family, fixed
  * per query); they are baked into the generated code as constants, so the
  * per-row work is exactly one fused projection loop.
  */
case class HyperplaneSketchExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType

  private lazy val nPlanes: Int = second.eval().asInstanceOf[Number].intValue()
  private lazy val seed: Long = third.eval().asInstanceOf[Number].longValue()
  private def vecIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    // eval() != null: a typed NULL literal is foldable with an integral
    // dataType — without the check this would NPE during analysis instead
    // of producing the intended AnalysisException
    def intOk(e: Expression) = e.foldable && (e.dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _                                             => false
    }) && e.eval() != null
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT|DOUBLE> as first argument, got " +
          first.dataType.catalogString)
    else if (!intOk(second) || !intOk(third))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires foldable non-null integral nPlanes and seed")
    else if (second.eval().asInstanceOf[Number].intValue() < 1 ||
             second.eval().asInstanceOf[Number].intValue() > 63)
      TypeCheckResult.TypeCheckFailure(s"$prettyName nPlanes must be in [1, 63]")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(vec: Any, np: Any, sd: Any): Any =
    VectorKernel.sketch(vec.asInstanceOf[ArrayData], vecIsFloat, nPlanes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, _, _) =>
      s"${ev.value} = graft.functions.VectorKernel.sketch(" +
        s"$vec, $vecIsFloat, $nPlanes, ${seed}L);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HyperplaneSketchExpr =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "hyperplane_sketch"
}

/** `nearest_cell(vec, cells, centroids)` — map-side codebook assignment:
  * the cell id (from `cells`) whose centroid has the highest cosine to
  * `vec`, ties to the lowest cell. `cells` (array<int>) and `centroids`
  * (array<array<float>>, parallel to `cells`) must be FOLDABLE — they are
  * the codebook, fixed per query, evaluated ONCE into JVM arrays and
  * attached to the generated code as a single reference object. This is
  * what keeps an arbitrary k·dim codebook out of the expression tree: the
  * pre-r10 per-literal-centroid plan built k·dim `lit()` nodes and risked
  * codegen hugeMethodLimit fallback at realistic (k=256, dim=768)
  * codebooks (ADVICE r10); here plan size is O(1) in the codebook.
  */
case class NearestCellExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = IntegerType

  private def vecIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val cells: Array[Int] =
    second.eval().asInstanceOf[ArrayData].toIntArray()

  @transient private lazy val cents: Array[ArrayData] = {
    val ad = third.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).copy())
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    val typesOk =
      second.foldable && second.dataType == ArrayType(IntegerType, false) &&
        third.foldable && (third.dataType match {
          case ArrayType(ArrayType(FloatType, _), _) => true
          case _                                     => false
        })
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT|DOUBLE> as first argument, got " +
          first.dataType.catalogString)
    else if (!typesOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires foldable ARRAY<INT> cells and " +
          "ARRAY<ARRAY<FLOAT>> centroids")
    else {
      // Evaluate the foldable codebook ONCE per check — Catalyst may call
      // this more than once per analysis, and a composed foldable codebook
      // expression is not free to re-evaluate.
      val cellsV = second.eval().asInstanceOf[ArrayData]
      val centsV = third.eval().asInstanceOf[ArrayData]
      if (cellsV == null || centsV == null)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName cells and centroids must be non-null")
      else if (cellsV.numElements() == 0 ||
               cellsV.numElements() != centsV.numElements())
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName cells and centroids must be non-empty and the same length")
      else if ((0 until centsV.numElements()).exists(centsV.isNullAt))
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName centroids must not contain null rows")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override protected def nullSafeEval(vec: Any, cs: Any, ct: Any): Any =
    VectorKernel.nearestCell(vec.asInstanceOf[ArrayData], vecIsFloat, cells, cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
    val centsRef = ctx.addReferenceObj("cents", cents,
      "org.apache.spark.sql.catalyst.util.ArrayData[]")
    nullSafeCodeGen(ctx, ev, (vec, _, _) =>
      s"${ev.value} = graft.functions.VectorKernel.nearestCell(" +
        s"$vec, $vecIsFloat, $cellsRef, $centsRef);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCellExpr =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "nearest_cell"
}

/** `nearest_cell_l2(vec, cells, centroids)` — [[NearestCellExpr]]'s
  * squared-L2 argmin sibling (k-means assignment): the cell id whose
  * centroid has the LOWEST [[VectorKernel.dist2]] to `vec`, ties to the
  * lowest cell. `centroids` is ARRAY<ARRAY<DOUBLE>> (k-means centroids
  * are running means — double by construction); same foldable
  * single-literal codebook contract as the cosine form.
  */
case class NearestCellL2Expr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = IntegerType

  private def vecIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val cells: Array[Int] =
    second.eval().asInstanceOf[ArrayData].toIntArray()

  @transient private lazy val cents: Array[ArrayData] = {
    val ad = third.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).copy())
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    val typesOk =
      second.foldable && second.dataType == ArrayType(IntegerType, false) &&
        third.foldable && (third.dataType match {
          case ArrayType(ArrayType(DoubleType, _), _) => true
          case _                                      => false
        })
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT|DOUBLE> as first argument, got " +
          first.dataType.catalogString)
    else if (!typesOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires foldable ARRAY<INT> cells and " +
          "ARRAY<ARRAY<DOUBLE>> centroids")
    else {
      // Single evaluation of the foldable codebook (see NearestCellExpr).
      val cellsV = second.eval().asInstanceOf[ArrayData]
      val centsV = third.eval().asInstanceOf[ArrayData]
      if (cellsV == null || centsV == null)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName cells and centroids must be non-null")
      else if (cellsV.numElements() == 0 ||
               cellsV.numElements() != centsV.numElements())
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName cells and centroids must be non-empty and the same length")
      else if ((0 until centsV.numElements()).exists(centsV.isNullAt))
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName centroids must not contain null rows")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override protected def nullSafeEval(vec: Any, cs: Any, ct: Any): Any =
    VectorKernel.nearestCellL2(vec.asInstanceOf[ArrayData], vecIsFloat, cells, cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
    val centsRef = ctx.addReferenceObj("cents", cents,
      "org.apache.spark.sql.catalyst.util.ArrayData[]")
    nullSafeCodeGen(ctx, ev, (vec, _, _) =>
      s"${ev.value} = graft.functions.VectorKernel.nearestCellL2(" +
        s"$vec, $vecIsFloat, $cellsRef, $centsRef);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCellL2Expr =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "nearest_cell_l2"
}

/** Column-API entry points — resolve through the session registry
  * (installed by [[graft.GraftExtensions]]), same path SQL takes.
  */
object VectorExprs {
  import org.apache.spark.sql.functions.call_function

  def dot_f(a: Column, b: Column): Column = call_function("dot_f", a, b)

  def cosine_f(a: Column, b: Column): Column = call_function("cosine_f", a, b)

  def hyperplane_sketch(vec: Column, nPlanes: Column, seed: Column): Column =
    call_function("hyperplane_sketch", vec, nPlanes, seed)

  def nearest_cell(vec: Column, cells: Column, centroids: Column): Column =
    call_function("nearest_cell", vec, cells, centroids)

  def dist2_f(a: Column, b: Column): Column = call_function("dist2_f", a, b)

  def nearest_cell_l2(vec: Column, cells: Column, centroids: Column): Column =
    call_function("nearest_cell_l2", vec, cells, centroids)
}
