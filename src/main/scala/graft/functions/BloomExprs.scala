package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built [[BloomFilter]]: `left` is
  * the string to test, `right` a FOLDABLE binary literal holding the
  * serialized filter (the `BloomFilter.writeTo` wire format — exactly what
  * `df.stat.bloomFilter(...)` produces after [[BloomExprs.serialize]]).
  *
  * Purpose: a scan-local semi-join guard. The engine already enables
  * Spark's runtime bloom-filter injection (`GraftSession`:
  * `runtime.bloomFilter.enabled`), but that only fires when the planner's
  * creation-side heuristics approve; this expression makes the bloom an
  * EXPLICIT, persistable plan element — build it once over the small side
  * (e.g. a benchmark test set's shingles), then prefilter the 100 TB side
  * inside its scan, before any exchange. False positives survive the
  * prefilter and are eliminated by the exact join that follows; false
  * negatives don't exist, so composed results stay exact (TrainingSpec
  * pins equivalence; q89 gates it against the uncapped exact oracle).
  *
  * Hash contract: Spark's `bloom_filter_agg` inserts STRING values as their
  * UTF-8 bytes (`BinaryUpdater` → `putBinary`), and `mightContainBinary`
  * probes the same bytes — the pairing `DataFrameStatFunctions.bloomFilter`
  * + this expression is therefore sound by construction; BloomSpec pins it
  * against a real aggregate-built filter.
  *
  * Both eval and codegen call the one deserialized filter held in a lazy
  * reference (the [[VectorKernel]] no-drift rule); the generated call is a
  * plain virtual invoke on a referenced object, so the probe stays inside
  * whole-stage codegen.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires STRING value, got ${left.dataType.catalogString}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires a foldable BINARY serialized filter")
    else TypeCheckResult.TypeCheckSuccess

  /** Deserialized once per expression instance (per task after serialization),
    * not per row. A NULL filter literal means "no filter" → probe is NULL.
    */
  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null)
    if (bytes == null) null
    else BloomFilter.readFrom(bytes.asInstanceOf[Array[Byte]])
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    if (bloom == null) return null
    val v = left.eval(input)
    if (v == null) null
    else bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (bloom == null) {
      ExprCode.forNullValue(BooleanType)
    } else {
      val bf = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, (c, _) =>
        s"${ev.value} = $bf.mightContainBinary($c.getBytes());")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain"
}

object BloomExprs {

  /** `BloomFilter.writeTo` as bytes — the literal payload for
    * [[BloomMightContain]].
    */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  /** Column-API probe: `bloom_might_contain(value, lit(serialized))`. */
  def bloom_might_contain(value: Column, serialized: Array[Byte]): Column =
    org.apache.spark.sql.functions.call_function(
      "bloom_might_contain", value, org.apache.spark.sql.functions.lit(serialized))
}
