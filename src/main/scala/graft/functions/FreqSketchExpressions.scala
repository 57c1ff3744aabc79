package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Frequent-items (heavy-hitters) sketch aggregates over DataSketches'
 * `ItemsSketch` (Misra–Gries / space-saving family) — the third
 * maintained-dashboard sketch beside HLL (cardinality) and KLL
 * (quantiles): "the top URLs per domain", "the dominant source tags per
 * shard", bounded state per group no matter how many distinct items
 * flow through. Same execution shape as the siblings: a
 * [[TypedImperativeAggregate]] whose live buffer IS the sketch,
 * serialized only at partial-aggregate shuffle boundaries; map-side
 * combine ships one maxMapSize-bounded blob per (group, task).
 *
 * EXACT while no purge has happened (`getMaximumError == 0` — distinct
 * items per group stay under ~0.75·maxMapSize), which is the
 * oracle-pinned regime; past it every reported count carries the
 * sketch's deterministic ±error bounds and `NO_FALSE_NEGATIVES`
 * returns a superset of the true heavy hitters.
 */
object FreqSketchExpressions {

  /** Fold a STRING column into one serialized frequent-items sketch
   * per group. */
  def freqAgg(item: Column, maxMapSize: Int = FreqDefaultMapSize): Column =
    ColumnBridge.column(FreqItemsAgg(ColumnBridge.expression(item), maxMapSize)
      .toAggregateExpression())

  /** Merge a column of serialized sketches into one (shard roll-up). */
  def freqMergeAgg(sketch: Column, maxMapSize: Int = FreqDefaultMapSize): Column =
    ColumnBridge.column(FreqMergeAgg(ColumnBridge.expression(sketch), maxMapSize)
      .toAggregateExpression())

  /** Pairwise merge of two serialized sketches (the fold join's
   * combiner; NULL on a side passes the other through). */
  def freqMergePair(a: Column, b: Column): Column =
    ColumnBridge.column(
      FreqMergePair(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** The sketch's frequent items as `array<struct<item, est, lb, ub>>`
   * under NO_FALSE_NEGATIVES (a superset of the true heavy hitters;
   * in the exact regime, exactly the item multiset), ordered by
   * (est desc, item asc) — a deterministic total order. */
  def freqItems(sketch: Column): Column =
    ColumnBridge.column(FreqItemsOf(ColumnBridge.expression(sketch)))

  /** Default map size: 256 counters — exact up to ~192 distinct items
   * per group, ~N/128 count error past it. */
  val FreqDefaultMapSize: Int = 256

  private val serDe = new ArrayOfStringsSerDe

  private[functions] def newSketch(maxMapSize: Int): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  private[functions] def heapify(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serDe)

  private[functions] def toBytes(s: ItemsSketch[String]): Array[Byte] =
    s.toByteArray(serDe)
}

/** One frequent-items sketch per group from raw string items. */
case class FreqItemsAgg(child: Expression, maxMapSize: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {
  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    "maxMapSize must be a power of two >= 8")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName folds STRING items, got ${child.dataType.simpleString} " +
        "— cast explicitly so the item identity is deliberate")

  override def createAggregationBuffer(): ItemsSketch[String] =
    FreqSketchExpressions.newSketch(maxMapSize)

  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any =
    FreqSketchExpressions.toBytes(buffer)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    FreqSketchExpressions.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqSketchExpressions.heapify(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch_agg"
  override def withNewMutableAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)
}

/** One sketch per group from ALREADY-SERIALIZED sketches. */
case class FreqMergeAgg(child: Expression, maxMapSize: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {
  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    "maxMapSize must be a power of two >= 8")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName merges BINARY serialized sketches")

  override def createAggregationBuffer(): ItemsSketch[String] =
    FreqSketchExpressions.newSketch(maxMapSize)

  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.merge(
      FreqSketchExpressions.heapify(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any =
    FreqSketchExpressions.toBytes(buffer)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    FreqSketchExpressions.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqSketchExpressions.heapify(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_merge_agg"
  override def withNewMutableAggBufferOffset(offset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
}

/** Pairwise merge of two serialized sketches; NULL passes through. */
case class FreqMergePair(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable && right.nullable
  override def prettyName: String = "freq_merge_pair"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two BINARY serialized sketches")
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null) r
    else if (r == null) l
    else FreqSketchExpressions.toBytes(
      FreqSketchExpressions.heapify(l.asInstanceOf[Array[Byte]])
        .merge(FreqSketchExpressions.heapify(r.asInstanceOf[Array[Byte]])))
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): FreqMergePair =
    copy(left = newLeft, right = newRight)
}

/** The frequent items of one serialized sketch, NO_FALSE_NEGATIVES,
 * ordered (est desc, item asc). Dashboard-scale; CodegenFallback. */
case class FreqItemsOf(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "freq_items"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a BINARY serialized sketch")
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val rows = FreqSketchExpressions.heapify(v.asInstanceOf[Array[Byte]])
        .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
        .sortBy(r => (-r.getEstimate, r.getItem))
        .map { r =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(r.getItem), r.getEstimate,
            r.getLowerBound, r.getUpperBound))
        }
      new GenericArrayData(rows.asInstanceOf[Array[Any]])
    }
  }
  override protected def withNewChildInternal(newChild: Expression): FreqItemsOf =
    copy(child = newChild)
}
