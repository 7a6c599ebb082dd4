package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Skew-safe capped `collect_list`: collects the group's values into an
 * array ONLY while the group stays at or under `maxN` values — a group
 * that exceeds the cap evaluates to NULL, with the buffer truncated at
 * `maxN` elements throughout. The primitive the dedup document-frequency
 * caps need ([[graft.dedup.Dedup.exactSubstringPairs]] and siblings):
 *
 *  - a plain `collect_list` partial-aggregates, but its buffer for a hot
 *    key grows with the key's occurrence count — the boilerplate gram
 *    shared by 30% of a 100 TB corpus accumulates millions of entries in
 *    one reducer before the df filter discards them;
 *  - a `Window.partitionBy(key)` count never partial-aggregates at all —
 *    every occurrence of the hot key colocates in one semantically
 *    unsplittable task (AQE's skew handling cannot split a window
 *    partition);
 *  - this aggregate keeps BOTH bounds: map-side partial aggregation
 *    collapses each map task's occurrences of a key into one
 *    `(count, ≤maxN items)` buffer, so the shuffle carries one bounded
 *    row per key per task and no buffer anywhere ever holds more than
 *    `maxN` elements — the hot key costs O(maxN) memory and O(tasks)
 *    merge work, never a straggler.
 *
 * Exactness: the buffer stops APPENDING at `maxN` but never stops
 * COUNTING, so "count ≤ maxN ⇒ the array is complete" holds under any
 * partial/merge regrouping, and "count > maxN ⇒ NULL" is decided from
 * the exact count. NULL input values are ignored (collect_list's
 * contract). Element order is unspecified (merge order is scheduling-
 * dependent) — consumers must not depend on it, same as collect_list
 * without a sort.
 */
case class CappedCollectList(
    child: Expression, maxN: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedCollectList.Buf]
  with UnaryLike[Expression] {

  require(maxN >= 1, s"maxN must be >= 1, got $maxN")

  override def prettyName: String = "capped_collect_list"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def createAggregationBuffer(): CappedCollectList.Buf =
    new CappedCollectList.Buf(0L, scala.collection.mutable.ArrayBuffer.empty)

  override def update(buf: CappedCollectList.Buf, input: InternalRow): CappedCollectList.Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1L
      // input-row memory is reused between rows: store a defensive copy
      if (buf.items.length < maxN) buf.items += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(buf: CappedCollectList.Buf, other: CappedCollectList.Buf): CappedCollectList.Buf = {
    buf.n += other.n
    if (buf.items.length < maxN) {
      val room = maxN - buf.items.length
      buf.items ++= (if (other.items.length <= room) other.items
                     else other.items.take(room))
    }
    buf
  }

  override def eval(buf: CappedCollectList.Buf): Any =
    if (buf.n == 0L || buf.n > maxN) null
    else new GenericArrayData(buf.items.toArray)

  @transient private lazy val bufProjection =
    UnsafeProjection.create(Array[DataType](dataType, LongType))

  override def serialize(buf: CappedCollectList.Buf): Array[Byte] =
    bufProjection(InternalRow(new GenericArrayData(buf.items.toArray), buf.n))
      .copy().getBytes

  override def deserialize(bytes: Array[Byte]): CappedCollectList.Buf = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val items = scala.collection.mutable.ArrayBuffer.empty[Any]
    items ++= row.getArray(0).toObjectArray(child.dataType)
    new CappedCollectList.Buf(row.getLong(1), items)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectList =
    copy(child = newChild)
}

object CappedCollectList {
  /** (exact value count, first ≤ maxN collected values). */
  final class Buf(var n: Long, val items: scala.collection.mutable.ArrayBuffer[Any])

  /** Column surface: `cappedCollectList(col("id"), 50)`. */
  def apply(c: Column, maxN: Int): Column =
    Shims.column(new CappedCollectList(Shims.expression(c), maxN)
      .toAggregateExpression())
}
