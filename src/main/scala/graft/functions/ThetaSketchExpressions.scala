package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Theta-sketch aggregates and set-operation scalars over DataSketches'
 * theta family — the sketch whose SET ALGEBRA (union, intersection,
 * difference) HLL cannot do: two corpora each fold to one k-bounded
 * sketch in a single scan, and |A∩B|, |A\B|, |A∪B| read off the sketch
 * pair without ever joining the corpora. That is the 100 TB overlap
 * audit: contamination triage, crawl-snapshot churn, shard-membership
 * drift — each side scans once, the "join" is a byte-blob pair per
 * group.
 *
 * Same execution shape as [[KllSketchExpressions]]: a
 * [[TypedImperativeAggregate]] whose live buffer is the theta
 * [[Union]] (updated in place, serialized only at partial-aggregate
 * shuffle boundaries), scalars over dashboard-scale sketch rows as
 * CodegenFallback expressions. Estimates are EXACT while a sketch
 * retains fewer than its nominal k entries (no sampling has started) —
 * the regime the oracle gate pins; past it the published theta error
 * bounds govern (~1/sqrt(k) relative).
 */
object ThetaSketchExpressions {

  /** Fold raw values (string / integral / double) into one serialized
   * compact theta sketch per group. */
  def thetaAgg(value: Column, lgK: Int = ThetaDefaultLgK): Column =
    ColumnBridge.column(ThetaUnionAgg(ColumnBridge.expression(value), lgK)
      .toAggregateExpression())

  /** Merge a column of serialized theta sketches into one. */
  def thetaMergeAgg(sketch: Column, lgK: Int = ThetaDefaultLgK): Column =
    ColumnBridge.column(ThetaMergeAgg(ColumnBridge.expression(sketch), lgK)
      .toAggregateExpression())

  /** Distinct-count estimate of one serialized sketch. */
  def thetaEstimate(sketch: Column): Column =
    ColumnBridge.column(ThetaSetEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(sketch), "a"))

  /** |A ∩ B| estimate from two serialized sketches. */
  def thetaIntersectEstimate(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaSetEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b), "intersect"))

  /** |A \ B| estimate from two serialized sketches. */
  def thetaAnotBEstimate(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaSetEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b), "anotb"))

  /** |A ∪ B| estimate from two serialized sketches. */
  def thetaUnionEstimate(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaSetEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b), "union"))

  /** lg nominal entries: k = 4096, ~1.6% relative error past exact. */
  val ThetaDefaultLgK: Int = 12

  private[functions] def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  private[functions] def heapify(bytes: Array[Byte]): CompactSketch =
    Sketches.heapifyCompactSketch(Memory.wrap(bytes))
}

/** One theta sketch per group from raw values. Inputs hash by their OWN
 * type's DataSketches rule (string bytes vs long vs double), so both
 * sides of a set comparison must feed the SAME type — checked at
 * analysis, not coerced silently (a long 5 and a string "5" are
 * different set members). */
case class ThetaUnionAgg(child: Expression, lgK: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {
  require(lgK >= 4 && lgK <= 26, "theta lgK must be in [4, 26]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName folds string/int/long/double values, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Union =
    ThetaSketchExpressions.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => buffer.update(s.toString)
      case l: java.lang.Long => buffer.update(l.longValue)
      case i: java.lang.Integer => buffer.update(i.longValue)
      case d: java.lang.Double => buffer.update(d.doubleValue)
      case other => throw new IllegalStateException(
        s"unreachable input type ${other.getClass.getName} past the type check")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketchExpressions.newUnion(lgK)
    u.union(Memory.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"
  override def withNewMutableAggBufferOffset(offset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** One theta sketch per group from ALREADY-SERIALIZED sketches — the
 * roll-up path (per-shard sketches → corpus sketch). */
case class ThetaMergeAgg(child: Expression, lgK: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {
  require(lgK >= 4 && lgK <= 26, "theta lgK must be in [4, 26]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName merges BINARY serialized sketches")

  override def createAggregationBuffer(): Union =
    ThetaSketchExpressions.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketchExpressions.newUnion(lgK)
    u.union(Memory.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_merge_agg"
  override def withNewMutableAggBufferOffset(offset: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ThetaMergeAgg =
    copy(child = newChild)
}

/** Set-algebra estimate over one or two serialized theta sketches:
 * `op` ∈ a (left's own estimate), union, intersect, anotb. Scalar over
 * dashboard-scale sketch rows; CodegenFallback. NULL if either input
 * is NULL. */
case class ThetaSetEstimate(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  require(Seq("a", "union", "intersect", "anotb").contains(op),
    s"unknown theta set op '$op'")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = s"theta_${op}_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs BINARY serialized sketches")

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) null
    else if (op == "a") // never touches the right side
      ThetaSketchExpressions.heapify(l.asInstanceOf[Array[Byte]]).getEstimate
    else {
      val r = right.eval(input)
      if (r == null) null
      else {
        val a = ThetaSketchExpressions.heapify(l.asInstanceOf[Array[Byte]])
        val b = ThetaSketchExpressions.heapify(r.asInstanceOf[Array[Byte]])
        op match {
          case "union" =>
            // max lgK: the union must never be the party that starts
            // sampling — its nominal cap sits far above any input's, and
            // the buffer grows lazily so an exact pair stays exact
            val u = ThetaSketchExpressions.newUnion(26)
            u.union(a); u.union(b); u.getResult.getEstimate
          case "intersect" =>
            SetOperation.builder().buildIntersection()
              .intersect(a, b).getEstimate
          case "anotb" =>
            SetOperation.builder().buildANotB().aNotB(a, b).getEstimate
        }
      }
    }
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ThetaSetEstimate =
    copy(left = newLeft, right = newRight)
}
