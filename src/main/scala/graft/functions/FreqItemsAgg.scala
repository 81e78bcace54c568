package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/**
 * Misra-Gries frequent-items sketch as a per-group aggregate — the
 * heavy-hitters capability Spark has no native aggregate for
 * (`df.stat.freqItems` is whole-DataFrame only, not `groupBy`-composable).
 *
 * State is a bounded map of `capacity` counters. Update is the classic MG
 * rule (hit: +1; room: insert; full: decrement ALL counters, dropping
 * zeros — amortized O(1) per row). Merge follows the mergeable-summaries
 * construction: sum counters, then subtract the (capacity+1)-th largest
 * value from every counter and drop the non-positive ones.
 *
 * Guarantee (any row order, any partitioning): for every item,
 * `sketchCount <= trueCount <= sketchCount + n/(capacity+1)` where n is the
 * group's total row count — so every item with frequency above
 * n/(capacity+1) is guaranteed present. Counter VALUES depend on merge
 * order (run-to-run nondeterministic within the error band), hence the
 * driver check for queries built on this is rows-only, with the bound
 * asserted against exact ground truth in OperatorSpec.
 *
 * 100 TB posture: fixed `capacity` counters per group regardless of group
 * size, map-side partial aggregation like any Spark aggregate — the answer
 * when exact per-group term counts (t05's shape) stop fitting anywhere.
 *
 * Returns the top `k` surviving counters as `array<struct<item,count>>`,
 * ordered by (count desc, item asc).
 */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1 && capacity >= k, s"need capacity >= k >= 1; got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_items_agg"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buffer: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      buffer.get(s) match {
        case Some(c) => buffer(s) = c + 1
        case None if buffer.size < capacity => buffer(s) = 1L
        case None =>
          // MG decrement-all: every counter pays 1, zeros vacate their slot
          val dead = mutable.ArrayBuffer.empty[String]
          buffer.foreach { case (key, c) =>
            if (c == 1L) dead += key else buffer(key) = c - 1
          }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(
      buffer: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) =>
      buffer(key) = buffer.getOrElse(key, 0L) + c
    }
    if (buffer.size > capacity) {
      // subtract the (capacity+1)-th largest counter from all, drop <= 0
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.foreach { case (key, c) =>
        if (c <= d) dead += key else buffer(key) = c - d
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val top = buffer.toSeq.sortBy { case (s, c) => (-c, s) }.take(k)
    new GenericArrayData(top.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }.toArray[Any])
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buffer.toSeq.map { case (s, c) => (s.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.size)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      m(new String(arr, StandardCharsets.UTF_8)) = bb.getLong()
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren(0))
}

object FreqItemsAgg {
  /** Column wrapper: top-k frequent items of `item` per group, capacity
    * counters of Misra-Gries state. */
  def apply(item: Column, k: Int, capacity: Int): Column =
    Bridge.column(
      FreqItemsAgg(Bridge.expression(item), k, capacity).toAggregateExpression())
}
