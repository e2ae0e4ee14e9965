package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native frequency probe against a pre-built [[CountMinSketch]]: `left`
  * is the string to estimate, `right` a FOLDABLE binary literal holding
  * the serialized sketch (what `df.stat.countMinSketch(...)` produces
  * after [[CmsExprs.serialize]]).
  *
  * The companion of [[BloomMightContain]] for COUNTS: a CMS built in one
  * distributed pass over a 100 TB token/key stream answers "how often
  * does x occur" from kilobytes of state, with the one-sided guarantee
  * estimate ≥ true count (never under), and estimate ≤ true + ε·N with
  * probability ≥ confidence. The q100 gate carries the bound as
  * in-query flags (the q51 HLL pattern); CmsSpec pins the structural
  * no-underestimate side exactly.
  *
  * Hash contract: Spark's `count_min_sketch` aggregate inserts STRING
  * values as UTF-8 bytes (`addBinary`), and `estimateCount` on the same
  * bytes probes the same cells — pinned in CmsSpec through a real
  * aggregate-built sketch. Eval and codegen both call the one
  * deserialized sketch (no-drift rule).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires STRING value, got ${left.dataType.catalogString}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "cms_estimate requires a foldable BINARY serialized sketch")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val cms: CountMinSketch = {
    val bytes = right.eval(null)
    if (bytes == null) null
    else CountMinSketch.readFrom(bytes.asInstanceOf[Array[Byte]])
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    if (cms == null) return null
    val v = left.eval(input)
    if (v == null) null
    else cms.estimateCount(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (cms == null) {
      ExprCode.forNullValue(LongType)
    } else {
      val sk = ctx.addReferenceObj("cmSketch", cms, classOf[CountMinSketch].getName)
      nullSafeCodeGen(ctx, ev, (c, _) =>
        s"${ev.value} = $sk.estimateCount($c.getBytes());")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cms_estimate"
}

/** [[CmsEstimate]]'s PER-ROW sibling: the sketch payload is a data
  * COLUMN, not a foldable literal — the shape a per-key sketch table's
  * serving read needs (each row carries its own key's CMS). Deserializes
  * per evaluation, the kll probe rule: correct for the O(keys)-row
  * frames sketch reads produce, not for per-corpus-row maps (those
  * should pre-heapify driver-side — the [[CmsEstimate]] referenceObj
  * pattern).
  */
case class CmsEstimateRow(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate_row"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING value, got ${left.dataType.catalogString}")
    else if (right.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY serialized sketch column")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(value: Any, sketch: Any): Any =
    CmsExprs.estimate(
      sketch.asInstanceOf[Array[Byte]], value.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, s) => s"graft.functions.CmsExprs.estimate($s, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateRow =
    copy(left = newLeft, right = newRight)
}

object CmsExprs {

  /** `CountMinSketch.writeTo` as bytes — the literal payload for
    * [[CmsEstimate]].
    */
  def serialize(cms: CountMinSketch): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }

  /** Per-call deserialize + probe (the [[CmsEstimateRow]] kernel): same
    * UTF-8-bytes hash contract as the foldable probe.
    */
  def estimate(serialized: Array[Byte], value: UTF8String): Long =
    CountMinSketch.readFrom(serialized).estimateCount(value.getBytes)

  /** Column-API probe: `cms_estimate(value, lit(serialized))`. */
  def cms_estimate(value: Column, serialized: Array[Byte]): Column =
    org.apache.spark.sql.functions.call_function(
      "cms_estimate", value, org.apache.spark.sql.functions.lit(serialized))

  /** Column-API per-row probe: `cms_estimate_row(value, sketchCol)`. */
  def cms_estimate_row(value: Column, sketch: Column): Column =
    org.apache.spark.sql.functions.call_function("cms_estimate_row", value, sketch)
}
