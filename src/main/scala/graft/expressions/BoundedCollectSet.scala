package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, MapType}

/** Aggregation buffer: a distinct-value set that permanently trips an
  * overflow flag (and frees its memory) once it would exceed `maxSize`. */
final class BoundedSetBuffer {
  val set: mutable.HashSet[Any] = mutable.HashSet.empty
  var overflowed: Boolean = false
}

/** `collect_set` with a hard cardinality bound: the buffer never holds
  * more than `maxSize` distinct values, and a group that exceeds the
  * bound evaluates to NULL instead of an array — the overflow signal a
  * caller filters on (and can count, for recall accounting).
  *
  * Why not `collect_set` + `filter(size(ids) <= cap)`: the stock
  * aggregate materializes the FULL set per group before the filter ever
  * sees it, so one hot group (10M byte-identical documents landing in one
  * LSH band bucket) is an executor OOM. Here update/merge stop storing
  * the moment a group trips the cap — partial (map-side) buffers are
  * bounded too, and an overflowed partial poisons the merged group, so
  * the result is exact: a group returns its complete set iff its true
  * cardinality ≤ maxSize, else NULL. Never a silently truncated set.
  *
  * Serialization mirrors stock CollectSet's UnsafeProjection scheme with
  * the overflow flag as a leading boolean field.
  *
  * Element canonicalization: every value is stored as a COPIED
  * single-field UnsafeRow projection of itself, so set membership is
  * byte equality in one canonical representation. Inserting raw values
  * would be wrong for struct/array elements: update-path values arrive
  * as GenericInternalRow (identity equals) while deserialize-path values
  * arrive as UnsafeRow views — mixing them in one HashSet double-counts
  * equal values under sort-based fallback merges and could trip the cap
  * on a group whose true cardinality is within bounds.
  */
case class BoundedCollectSet(
    child: Expression,
    maxSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedSetBuffer] with UnaryLike[Expression] {

  require(maxSize > 0, "maxSize must be positive")

  override def prettyName: String = "bounded_collect_set"
  override def nullable: Boolean = true // NULL = overflowed group
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: MapType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName does not support map-typed input")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): BoundedSetBuffer = new BoundedSetBuffer

  private def trip(b: BoundedSetBuffer): Unit = {
    b.overflowed = true
    b.set.clear() // free the memory immediately — the group is decided
  }

  // canonical stored form: a copied 1-field UnsafeRow holding the value
  private lazy val elemProj = UnsafeProjection.create(Array[DataType](child.dataType))
  private lazy val elemHolder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
  private def toElem(v: Any): Any = {
    elemHolder.update(0, v)
    elemProj.apply(elemHolder).copy()
  }
  private def fromElem(e: Any): Any =
    e.asInstanceOf[UnsafeRow].get(0, child.dataType)

  override def update(b: BoundedSetBuffer, input: InternalRow): BoundedSetBuffer = {
    if (!b.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        b.set += toElem(v)
        if (b.set.size > maxSize) trip(b)
      }
    }
    b
  }

  override def merge(b: BoundedSetBuffer, other: BoundedSetBuffer): BoundedSetBuffer = {
    if (b.overflowed || other.overflowed) trip(b)
    else {
      b.set ++= other.set
      if (b.set.size > maxSize) trip(b)
    }
    b
  }

  override def eval(b: BoundedSetBuffer): Any =
    if (b.overflowed) null
    else new GenericArrayData(b.set.toArray.map(fromElem))

  private lazy val projection = UnsafeProjection.create(
    Array[DataType](BooleanType, ArrayType(child.dataType, containsNull = false)))
  private lazy val row = new UnsafeRow(2)

  override def serialize(b: BoundedSetBuffer): Array[Byte] =
    projection.apply(InternalRow(b.overflowed,
      new GenericArrayData(b.set.toArray.map(fromElem)))).getBytes

  override def deserialize(bytes: Array[Byte]): BoundedSetBuffer = {
    val b = createAggregationBuffer()
    row.pointTo(bytes, bytes.length)
    b.overflowed = row.getBoolean(0)
    if (!b.overflowed) {
      row.getArray(1).foreach(child.dataType,
        (_, v: Any) => b.set += toElem(v))
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectSet =
    copy(child = newChild)
}

object BoundedCollectSet {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}

  /** Column API: `bounded_collect_set(c, maxSize)` — array of distinct
    * values, or NULL if the group holds more than `maxSize` of them. */
  def boundedCollectSet(c: Column, maxSize: Int): Column =
    toColumn(BoundedCollectSet(toExpression(c), maxSize).toAggregateExpression())
}
