package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable-sketch aggregates the built-in surface lacks, as native
  * Catalyst [[TypedImperativeAggregate]]s (the same execution class as
  * Spark's own `hll_sketch_agg`): partial sketches build map-side per
  * partition, only O(sketch) bytes cross the exchange, and the final
  * merge folds partials — the mergeability property that makes a
  * distinct/quantile summary computable over 100 TB with a shuffle
  * measured in kilobytes.
  *
  * Two sketches, chosen for what HLL cannot answer:
  *
  *  - [[KllAgg]] (`kll_agg`): KLL quantile sketch (Karnin-Lang-Liberty,
  *    FOCS 2016) over doubles — rank/quantile queries with a
  *    normalized-rank-error guarantee in O(k·log(n/k)) space. The
  *    length/score DISTRIBUTION of a corpus (p50/p99 doc length, score
  *    cutoffs for quality filtering) where HLL only counts.
  *  - [[ThetaAgg]] (`theta_agg`): theta sketch (the KMV generalization,
  *    Dasgupta et al. 2016) — a uniform hash sample of the distinct set
  *    that supports SET OPERATIONS: intersections and differences
  *    (cross-source vocabulary overlap, contamination estimates between
  *    corpus snapshots) where HLL unions only.
  *
  * Determinism contract (what the gates may hash): a theta compact
  * sketch is the SET of the k smallest retained hashes — a pure function
  * of the distinct input set, invariant to row order, partitioning, and
  * replay (re-unioning an absorbed sketch is a no-op), so theta
  * estimates are hash-stable. KLL compaction flips unseeded random bits
  * once n exceeds k, so only its ERROR CONTRACT is stable: gates emit
  * exact oracle-matched quantiles plus boolean within-rank-tolerance
  * certificates, never raw KLL estimates (`getNormalizedRankError` bounds
  * rank error at ~1.65% for the default k=200, 99.7% confidence).
  *
  * Reference scope: the reference stack delegates analytics to
  * Elasticsearch (/root/reference/src/elasticsearch_ingest.py), whose
  * `cardinality` aggregation is HLL-sketch-backed in general; these are
  * that capability class, generalized to quantiles and set algebra.
  */
object SketchAggs {

  /** KLL payload → the inclusive quantile at normalized rank `q`.
    * Serving-side probe: heapifies per call — intended for the tiny
    * frames sketch reads produce, not per-corpus-row maps. An EMPTY
    * sketch (what `kll_agg` yields for an empty or all-null group) has
    * no quantiles: NaN, not an exception — one empty group must not
    * kill a grouped serving query.
    */
  def kllQuantile(bytes: Array[Byte], q: Double): Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) Double.NaN
    else sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
  }

  /** KLL payload → the normalized rank of `v` (inclusive); NaN on the
    * empty sketch (see [[kllQuantile]]).
    */
  def kllRank(bytes: Array[Byte], v: Double): Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) Double.NaN
    else sk.getRank(v, QuantileSearchCriteria.INCLUSIVE)
  }

  /** An empty KLL sketch's serialized form at accuracy `k` — the
    * placeholder payload guard rows carry (valid to heapify; n = 0).
    */
  def kllEmpty(k: Int): Array[Byte] =
    KllDoublesSketch.newHeapInstance(k).toByteArray

  /** KLL payload → the stream length the sketch absorbed (exact). */
  def kllN(bytes: Array[Byte]): Long =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getN

  /** KLL payload → a-priori normalized rank error (one-sided, 99.7%). */
  def kllRankError(bytes: Array[Byte]): Double =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getNormalizedRankError(false)

  /** Merge two serialized KLL sketches (driver-side union for streaming
    * state). NOT idempotent — KLL merge adds weight, so streaming sinks
    * must replay-guard on batch id (see the scaladoc determinism
    * contract; contrast [[thetaUnion]]).
    */
  def kllMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val s = KllDoublesSketch.heapify(Memory.wrap(a))
    s.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    s.toByteArray
  }

  def thetaEstimate(bytes: Array[Byte]): Double =
    Sketches.heapifySketch(Memory.wrap(bytes)).getEstimate

  /** Driver-side estimate of a serialized HLL sketch, rounded like
    * Spark's own `hll_sketch_estimate` — the q226 cross-sink equality
    * certificate reads maintained rows directly rather than re-joining
    * through a query.
    */
  def hllEstimate(bytes: Array[Byte]): Long =
    math.round(org.apache.datasketches.hll.HllSketch
      .heapify(Memory.wrap(bytes)).getEstimate)

  /** An empty theta compact sketch at accuracy `lgK` — the guard-row
    * placeholder payload ([[kllEmpty]]'s theta sibling).
    */
  def thetaEmpty(lgK: Int): Array[Byte] =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      .getResult.toByteArray

  /** Union of two serialized theta sketches → ordered compact bytes.
    * Idempotent and commutative (set union over retained hashes), so
    * streaming replay cannot move the stored state.
    */
  def thetaUnion(a: Array[Byte], b: Array[Byte], lgK: Int = 12): Array[Byte] = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.heapifySketch(Memory.wrap(a)))
    u.union(Sketches.heapifySketch(Memory.wrap(b)))
    u.getResult.toByteArray
  }

  def thetaIntersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.heapifySketch(Memory.wrap(a)))
    i.intersect(Sketches.heapifySketch(Memory.wrap(b)))
    i.getResult.getEstimate
  }

  /** |A ∩ B| as (estimate, lower, upper) at `numStd` standard
    * deviations — the library's OWN confidence interval, which adapts to
    * the operands' actual thetas (a fixed a-priori RSE band misstates
    * intersection error, which scales with the union's sampling rate,
    * not the result's size). The decontam-screen certificates gate on
    * these.
    */
  def thetaIntersectBounds(
      a: Array[Byte], b: Array[Byte], numStd: Int = 3): (Double, Double, Double) = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.heapifySketch(Memory.wrap(a)))
    i.intersect(Sketches.heapifySketch(Memory.wrap(b)))
    val r = i.getResult
    (r.getEstimate, r.getLowerBound(numStd), r.getUpperBound(numStd))
  }

  /** |A| as (estimate, lower, upper) at `numStd` standard deviations. */
  def thetaBounds(bytes: Array[Byte], numStd: Int = 3): (Double, Double, Double) = {
    val s = Sketches.heapifySketch(Memory.wrap(bytes))
    (s.getEstimate, s.getLowerBound(numStd), s.getUpperBound(numStd))
  }

  /** |A \ B| as (estimate, lower, upper) at `numStd` standard deviations. */
  def thetaAnotBBounds(
      a: Array[Byte], b: Array[Byte], numStd: Int = 3): (Double, Double, Double) = {
    val op = SetOperation.builder().buildANotB()
    op.setA(Sketches.heapifySketch(Memory.wrap(a)))
    op.notB(Sketches.heapifySketch(Memory.wrap(b)))
    val r = op.getResult(true)
    (r.getEstimate, r.getLowerBound(numStd), r.getUpperBound(numStd))
  }

  /** |A \ B| estimate from two serialized theta sketches. */
  def thetaAnotBEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val op = SetOperation.builder().buildANotB()
    op.setA(Sketches.heapifySketch(Memory.wrap(a)))
    op.notB(Sketches.heapifySketch(Memory.wrap(b)))
    op.getResult(true).getEstimate
  }

  /** The aggregates' shared parameter rule: a foldable integral in
    * [lo, hi], evaluated once.
    */
  private[functions] def foldableIntInRange(e: Expression, lo: Int, hi: Int): Boolean =
    e.foldable && (e.dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _                                             => false
    }) && {
      val v = e.eval()
      v != null && {
        val i = v.asInstanceOf[Number].intValue(); i >= lo && i <= hi
      }
    }
}

/** `kll_agg(value, k)` — KLL quantile sketch of a numeric column as
  * binary. `k` must be a foldable integral (the accuracy/space knob;
  * 200 ≈ 1.65% rank error).
  */
case class KllAgg(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with BinaryLike[Expression] {

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_agg"

  override def checkInputDataTypes(): TypeCheckResult = {
    val kOk = SketchAggs.foldableIntInRange(right, 8, 65535)
    if (!left.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric value column, got ${left.dataType.catalogString}")
    else if (!kOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable integral k in [8, 65535]")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val toDouble: Any => Double = left.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType  => v => v.asInstanceOf[Float].toDouble
    case LongType   => v => v.asInstanceOf[Long].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case ShortType  => v => v.asInstanceOf[Short].toDouble
    case ByteType   => v => v.asInstanceOf[Byte].toDouble
    case _: DecimalType => v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = left.eval(input)
    if (v != null) buffer.update(toDouble(v))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllAgg =
    copy(left = newLeft, right = newRight)
}

/** `theta_agg(value, lgK)` — theta distinct-set sketch of a string or
  * integral column as ordered-compact binary. The update-side buffer is a
  * theta Union so partial-merge and final-merge share one code path.
  */
case class ThetaAgg(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with BinaryLike[Expression] {

  private lazy val lgK: Int = right.eval().asInstanceOf[Number].intValue()

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_agg"

  override def checkInputDataTypes(): TypeCheckResult = {
    val lgOk = SketchAggs.foldableIntInRange(right, 4, 26)
    val valueOk = left.dataType match {
      case StringType | LongType | IntegerType | BinaryType => true
      case _                                                => false
    }
    if (!valueOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, LONG, INT or BINARY values, got ${left.dataType.catalogString}")
    else if (!lgOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable integral lgK in [4, 26]")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def newUnion(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def createAggregationBuffer(): Union = newUnion()

  // DataSketches value semantics, inherited deliberately: null AND the
  // empty string/array are "no value" no-ops (Union.update returns
  // RejectedNullOrEmpty) — the sketch's distinct set is over NON-EMPTY
  // values, mirroring how the novelty/dedup operators treat empty
  // tokens. Exact-count oracles must filter '' so estimate and exact
  // measure the same set (the q212/q215/q217 gates do).
  override def update(buffer: Union, input: InternalRow): Union = {
    val v = left.eval(input)
    if (v != null) left.dataType match {
      case StringType  => buffer.update(v.asInstanceOf[UTF8String].toString)
      case LongType    => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case BinaryType  => buffer.update(v.asInstanceOf[Array[Byte]])
      case other       => throw new IllegalStateException(s"unreachable: $other")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  // ordered compact: the canonical form (sorted k-smallest hashes) whose
  // bytes are a pure function of the distinct input set
  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = newUnion()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaAgg =
    copy(left = newLeft, right = newRight)
}

/** `kll_merge_agg(sketch_bytes, k)` — fold a COLUMN OF SERIALIZED KLL
  * SKETCHES into one (the `hll_union_agg` analog): the rollup half of
  * the sketch algebra. Per-shard/per-day sketch tables re-aggregate to
  * coarser keys without touching raw data — the read side of "every
  * executor/day/site sketches independently at 100 TB". Merge adds
  * weight (each absorbed item counts once per constituent sketch), so
  * inputs must partition the data: rolling up overlapping sketches
  * double-counts by design, same as summing overlapping counts.
  *
  * Every input sketch's k must equal the `k` parameter: merging
  * heterogeneous-k sketches would silently degrade the result toward
  * the coarsest constituent's accuracy — the same misconfiguration
  * class the streaming sinks' paramMismatch guard refuses — so
  * `update` fails loudly on the first mismatched payload instead.
  */
case class KllMergeAgg(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with BinaryLike[Expression] {

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = {
    val kOk = SketchAggs.foldableIntInRange(right, 8, 65535)
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BINARY kll sketch payloads, got ${left.dataType.catalogString}")
    else if (!kOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable integral k in [8, 65535]")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = left.eval(input)
    if (v != null) {
      val in = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      if (in.getK != k)
        throw new IllegalArgumentException(
          s"$prettyName(k=$k) got a sketch built at k=${in.getK}: mixed-k rollups " +
            "silently blend accuracies; re-sketch the constituents at one k")
      buffer.merge(in)
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllMergeAgg =
    copy(left = newLeft, right = newRight)
}

/** `theta_union_agg(sketch_bytes, lgK)` — fold a column of serialized
  * theta sketches into one union compact. Unlike [[KllMergeAgg]] this IS
  * idempotent (set union over retained hashes): overlapping constituent
  * sketches roll up correctly, and re-unioning an absorbed sketch moves
  * nothing — the property the streaming replay contracts lean on.
  */
case class ThetaUnionAgg(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with BinaryLike[Expression] {

  private lazy val lgK: Int = right.eval().asInstanceOf[Number].intValue()

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = {
    val lgOk = SketchAggs.foldableIntInRange(right, 4, 26)
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BINARY theta sketch payloads, got ${left.dataType.catalogString}")
    else if (!lgOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable integral lgK in [4, 26]")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def newUnion(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def createAggregationBuffer(): Union = newUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = left.eval(input)
    if (v != null)
      buffer.union(Sketches.heapifySketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = newUnion()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaUnionAgg =
    copy(left = newLeft, right = newRight)
}

/** `cms_merge_agg(sketch_bytes)` — fold a column of serialized
  * [[org.apache.spark.util.sketch.CountMinSketch]] payloads into one by
  * cellwise addition (the exact-merge property: a CMS union answers
  * point queries within ε·N of the combined stream). UNARY: the buffer
  * ADOPTS the first input's (depth, width, seed) shape — re-creating it
  * from parameters would just restate what every payload already
  * carries — and any later constituent with a different shape fails
  * loudly (mixed-shape cells don't align; silently blending them is the
  * KllMergeAgg mixed-k class of corruption, and Spark's own
  * `mergeInPlace` refuses it too). Like [[KllMergeAgg]], merge ADDS:
  * inputs must partition the data — overlapping sketches double-count
  * by design. An empty group evaluates to NULL (no shape to adopt).
  */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.apache.spark.util.sketch.CountMinSketch]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  import org.apache.spark.util.sketch.CountMinSketch

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BINARY count-min sketch payloads, got " +
          child.dataType.catalogString)
    else TypeCheckResult.TypeCheckSuccess

  // null = "no constituent absorbed yet" — the shape comes from the data
  override def createAggregationBuffer(): CountMinSketch = null

  private def fold(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch =
    if (buffer == null) other
    else if (other == null) buffer
    else {
      require(buffer.depth == other.depth && buffer.width == other.width,
        s"$prettyName got sketches of different shapes " +
          s"(${buffer.depth}x${buffer.width} vs ${other.depth}x${other.width}): " +
          "mixed-parameter CMS cells don't align; re-sketch the " +
          "constituents at one (eps, confidence)")
      buffer.mergeInPlace(other) // also refuses a differing hash seed
      buffer
    }

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else fold(buffer, CountMinSketch.readFrom(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch =
    fold(buffer, other)

  override def eval(buffer: CountMinSketch): Any =
    if (buffer == null) null else graft.functions.CmsExprs.serialize(buffer)

  override def serialize(buffer: CountMinSketch): Array[Byte] =
    if (buffer == null) Array.emptyByteArray
    else graft.functions.CmsExprs.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null
    else CountMinSketch.readFrom(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}

/** Scalar serving probes over serialized sketch payloads. These heapify
  * per evaluation — correct for the one-row frames sketch reads produce;
  * a per-corpus-row probe should pre-heapify driver-side instead (the
  * [[CmsEstimate]] referenceObj pattern).
  */
case class KllQuantileExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"
  // implicit casts: `kll_quantile(sk, 0.5)` parses 0.5 as DECIMAL(1,1) in
  // SQL; coercing the rank to DOUBLE is the built-in-function convention
  override def inputTypes: Seq[DataType] = Seq(BinaryType, DoubleType)
  override protected def nullSafeEval(sketch: Any, q: Any): Any =
    SketchAggs.kllQuantile(sketch.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, q) => s"graft.functions.SketchAggs.kllQuantile($s, $q)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileExpr =
    copy(left = newLeft, right = newRight)
}

case class KllRankExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_rank"
  override def inputTypes: Seq[DataType] = Seq(BinaryType, DoubleType)
  override protected def nullSafeEval(sketch: Any, v: Any): Any =
    SketchAggs.kllRank(sketch.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, v) => s"graft.functions.SketchAggs.kllRank($s, $v)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRankExpr =
    copy(left = newLeft, right = newRight)
}

case class KllNExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "kll_n"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires BINARY")
    else TypeCheckResult.TypeCheckSuccess
  override protected def nullSafeEval(sketch: Any): Any =
    SketchAggs.kllN(sketch.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.SketchAggs.kllN($s)")
  override protected def withNewChildInternal(newChild: Expression): KllNExpr =
    copy(child = newChild)
}

case class ThetaEstimateExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires BINARY")
    else TypeCheckResult.TypeCheckSuccess
  override protected def nullSafeEval(sketch: Any): Any =
    SketchAggs.thetaEstimate(sketch.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.SketchAggs.thetaEstimate($s)")
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimateExpr =
    copy(child = newChild)
}

case class ThetaIntersectEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires (BINARY, BINARY)")
    else TypeCheckResult.TypeCheckSuccess
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SketchAggs.thetaIntersectEstimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SketchAggs.thetaIntersectEstimate($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimateExpr =
    copy(left = newLeft, right = newRight)
}

case class ThetaAnotBEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_anotb_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires (BINARY, BINARY)")
    else TypeCheckResult.TypeCheckSuccess
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SketchAggs.thetaAnotBEstimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SketchAggs.thetaAnotBEstimate($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaAnotBEstimateExpr =
    copy(left = newLeft, right = newRight)
}
