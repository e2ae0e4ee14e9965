package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all DISTINCT strings obtainable from the
  * input by deleting at most `maxDeletes` characters (the input itself
  * included) — the symmetric-delete (SymSpell) indexing kernel behind the
  * posting-table fuzzy search (SURVEY §4.2's "precomputed token→docId
  * posting table").
  *
  * Guarantee used by the search: if `levenshtein(a, b) <= d` then
  * `deletions(a, d) ∩ deletions(b, d) ≠ ∅` — an optimal edit script aligns
  * a common subsequence reachable from BOTH strings by deleting the
  * substituted/deleted (resp. substituted/inserted) characters, of which
  * there are at most d on each side. So an equi-join on the variant column
  * yields a candidate SUPERSET of every fuzzy match, and the exact
  * (thresholded) levenshtein only runs on join survivors — O(candidates),
  * not O(corpus), per query (the fix for the reference-scale full-scan
  * `multi_match` with fuzziness, `/root/reference/src/api.py:210-221`).
  *
  * Variant counts are small (1 + L + L·(L−1)/2 for d=2), and this is an
  * OFFLINE index-build expression — but it still follows the repo rule:
  * eval and codegen share one kernel, no interpreted HOFs in a scan.
  */
case class DeletionVariantsExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val d: Int = right.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${left.dataType.catalogString}")
    else if (!right.foldable || !(right.dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _                                             => false
    }) || right.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable non-null integral max-deletes")
    else if (right.eval().asInstanceOf[Number].intValue() < 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName max-deletes must be >= 0")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(s: Any, maxDel: Any): Any =
    DeletionVariantsExpr.variantsArray(s.asInstanceOf[UTF8String], d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, _) =>
      s"${ev.value} = graft.functions.DeletionVariantsExpr.variantsArray($s, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DeletionVariantsExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "deletion_variants"
}

object DeletionVariantsExpr {

  /** Distinct ≤d-deletion variants (original first, then breadth-first by
    * deletion count) — the single kernel shared by eval, codegen, and the
    * driver-side query-term expansion in [[graft.search.Posting]].
    */
  def variantsOf(s: String, d: Int): Seq[String] = {
    val seen = new java.util.LinkedHashSet[String]()
    seen.add(s)
    var frontier: Seq[String] = Seq(s)
    var k = 0
    while (k < d && frontier.nonEmpty) {
      val next = scala.collection.mutable.ArrayBuffer.empty[String]
      frontier.foreach { v =>
        var i = 0
        while (i < v.length) {
          val w = new java.lang.StringBuilder(v.length - 1)
            .append(v, 0, i).append(v, i + 1, v.length).toString
          if (seen.add(w)) next += w
          i += 1
        }
      }
      frontier = next.toSeq
      k += 1
    }
    import scala.jdk.CollectionConverters._
    seen.iterator().asScala.toSeq
  }

  /** ArrayData form — called from both eval and generated code. */
  def variantsArray(s: UTF8String, d: Int): ArrayData =
    new GenericArrayData(
      variantsOf(s.toString, d).map(v => UTF8String.fromString(v): Any).toArray)

  /** Column-API entry point (session registry, installed by
    * [[graft.GraftExtensions]]).
    */
  def deletion_variants(s: Column, maxDeletes: Column): Column =
    org.apache.spark.sql.functions.call_function("deletion_variants", s, maxDeletes)
}
