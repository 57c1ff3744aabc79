package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, DoubleType}

/**
 * KLL quantile-sketch aggregates over DataSketches' `KllDoublesSketch`
 * (Karnin–Lang–Liberty 2016) — the quantile twin of Spark's built-in
 * HLL sketch functions, which Spark does not ship for KLL. Both
 * aggregates are [[TypedImperativeAggregate]]s, the shape Spark's own
 * sketch aggregates use: the LIVE sketch object is the aggregation
 * buffer (one per group per partition), updated in place row by row and
 * serialized ONLY at partial-aggregate shuffle boundaries — never the
 * serialize-per-row tax a UDAF over a binary buffer would pay. At
 * 100 TB that is the map-side-combine story: each task folds its rows
 * into k-bounded sketches locally and ships one small byte blob per
 * (group, task), so the shuffle is group-cardinality-sized, not
 * data-sized.
 *
 * Merge is the sketch's own `merge` — commutative and associative by
 * construction — so partial aggregation order never changes the
 * retained-item SET while the sketch is in its exact regime (n <= k:
 * nothing has compacted, quantiles are exact). Past it, DataSketches'
 * published normalized rank error for the default k=200 is ~1.65%.
 */
object KllSketchExpressions {

  /** Fold a DOUBLE column into one serialized KLL sketch per group. */
  def kllAgg(value: Column, k: Int = KllDefaultK): Column =
    ColumnBridge.column(KllDoublesAgg(ColumnBridge.expression(value), k)
      .toAggregateExpression())

  /** Merge a column of serialized KLL sketches into one. */
  def kllMergeAgg(sketch: Column, k: Int = KllDefaultK): Column =
    ColumnBridge.column(KllDoublesMergeAgg(ColumnBridge.expression(sketch), k)
      .toAggregateExpression())

  /** Pairwise merge of two serialized sketches — the fold join's
   * combiner (NULL on either side yields the other side verbatim). */
  def kllMergePair(a: Column, b: Column): Column =
    ColumnBridge.column(
      KllMergePair(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** The INCLUSIVE-rank quantile of a serialized sketch: the smallest
   * retained item whose rank (fraction of items <= it) reaches `rank` —
   * in the exact regime, the exact order statistic. NULL for an empty
   * sketch. */
  def kllQuantile(sketch: Column, rank: Column): Column =
    ColumnBridge.column(
      KllQuantileOf(ColumnBridge.expression(sketch), ColumnBridge.expression(rank)))

  /** DataSketches' default k: ~1.65% normalized rank error. */
  val KllDefaultK: Int = 200

  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** One KLL sketch per group from raw double values. */
case class KllDoublesAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {
  require(k >= 8 && k <= 65535, "KLL k must be in [8, 65535]")

  // update() casts to Double, so a wrong-typed column must fail at
  // analysis (like the Freq/Theta siblings), not as an executor-side
  // ClassCastException deep in a running job
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName folds DOUBLE values, got ${child.dataType.simpleString} " +
        "— cast explicitly so the quantile space is deliberate")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketchExpressions.heapify(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"
  override def withNewMutableAggBufferOffset(offset: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KllDoublesAgg =
    copy(child = newChild)
}

/** One KLL sketch per group from ALREADY-SERIALIZED sketches — the
 * rebuild-equality and roll-up path (shard sketches → corpus sketch). */
case class KllDoublesMergeAgg(child: Expression, k: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {
  require(k >= 8 && k <= 65535, "KLL k must be in [8, 65535]")

  // update() heapifies a byte array — non-BINARY input must fail at
  // analysis, not as an executor-side ClassCastException
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName merges BINARY serialized sketches, got " +
        child.dataType.simpleString)
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllSketchExpressions.heapify(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketchExpressions.heapify(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"
  override def withNewMutableAggBufferOffset(offset: Int): KllDoublesMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllDoublesMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KllDoublesMergeAgg =
    copy(child = newChild)
}

/** Pairwise sketch merge — a scalar over two serialized sketches, used
 * where a maintained table's existing sketch meets a delta batch's (one
 * row per group: dashboard-scale, so [[CodegenFallback]] costs
 * nothing). NULL on a side passes the other side through. */
case class KllMergePair(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable && right.nullable
  override def prettyName: String = "kll_merge_pair"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two BINARY serialized sketches")
  }
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null) r
    else if (r == null) l
    else {
      val s = KllSketchExpressions.heapify(l.asInstanceOf[Array[Byte]])
      s.merge(KllSketchExpressions.heapify(r.asInstanceOf[Array[Byte]]))
      s.toByteArray
    }
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): KllMergePair =
    copy(left = newLeft, right = newRight)
}

/** INCLUSIVE-rank quantile of a serialized sketch (NULL when empty —
 * a quantile of nothing has no value, matching SQL's aggregate-of-
 * empty). Scalar over dashboard-scale rows; CodegenFallback. */
case class KllQuantileOf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (BINARY sketch, DOUBLE rank)")
  }
  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val r = right.eval(input)
    if (s == null || r == null) null
    else {
      val rank = r.asInstanceOf[Double]
      require(rank >= 0.0 && rank <= 1.0, s"rank must be in [0, 1], got $rank")
      val sk = KllSketchExpressions.heapify(s.asInstanceOf[Array[Byte]])
      if (sk.isEmpty) null
      else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
    }
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): KllQuantileOf =
    copy(left = newLeft, right = newRight)
}
