package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import scala.collection.mutable

/**
 * Bounded-heap top-k per group: keeps the k best `(score, id)` pairs by
 * `(score DESC, id ASC)` — a total order, so results are deterministic
 * under any partitioning or merge order.
 *
 * This is the scale-correct top-k shape for similarity search: per
 * PARTITION the aggregate keeps at most k pairs (map-side partial
 * aggregation), so only `k * partitions` rows per query reach the
 * exchange — versus `row_number() OVER (PARTITION BY query)`, which
 * shuffles the entire |queries| x |corpus| scored product to sort it.
 *
 * State is a min-heap on goodness (root = worst kept pair, O(log k)
 * insert/evict); eval returns `array<struct<n_id, score>>` best-first.
 *
 * The id is GENERIC: `n_id` keeps the id expression's own type (string doc
 * ids included) — ids ride through as internal Catalyst values, tie-broken
 * by the type's interpreted ordering, and partial states serialize each id
 * through a single-field UnsafeProjection. Nothing is cast, so no id is
 * ever silently nulled out.
 */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Any)]] {

  require(k >= 1, s"need k >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n_id", id.dataType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_agg"

  @transient private lazy val idOrd: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(id.dataType)

  // worst-first ordering: a pair is WORSE when its score is lower, or equal
  // with a larger id — so the queue's head is the eviction candidate
  private def worstFirst: Ordering[(Double, Any)] =
    Ordering.fromLessThan[(Double, Any)]((a, b) =>
      a._1 < b._1 || (a._1 == b._1 && idOrd.gt(a._2, b._2))).reverse

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Any)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def push(buf: mutable.PriorityQueue[(Double, Any)], s: Double, i: Any): Unit =
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      if (s > ws || (s == ws && idOrd.lt(i, wi))) { buf.dequeue(); buf.enqueue((s, i)) }
    }

  override def update(buffer: mutable.PriorityQueue[(Double, Any)],
      input: InternalRow): mutable.PriorityQueue[(Double, Any)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      // copy: non-primitive values (UTF8String, arrays) may point into a
      // reused row buffer that the next input overwrites
      push(buffer, s.asInstanceOf[Double], InternalRow.copyValue(i))
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[(Double, Any)],
      other: mutable.PriorityQueue[(Double, Any)]): mutable.PriorityQueue[(Double, Any)] = {
    other.foreach { case (s, i) => push(buffer, s, i) }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[(Double, Any)]): Any = {
    // worstFirst ranks worse pairs larger, so ascending = best-first
    val best = buffer.toArray.sorted(worstFirst)
    new GenericArrayData(best.map { case (s, i) => InternalRow(i, s) }.toArray[Any])
  }

  @transient private lazy val idProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Array(id.dataType))

  override def serialize(buffer: mutable.PriorityQueue[(Double, Any)]): Array[Byte] = {
    val entries = buffer.toArray.map { case (s, i) =>
      // the projection reuses one result buffer across calls — copy() or
      // every entry aliases the LAST id's bytes
      (s, idProj(InternalRow(i)).copy().getBytes)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(12 + _._2.length).sum)
    bb.putInt(entries.length)
    entries.foreach { case (s, b) =>
      bb.putDouble(s)
      bb.putInt(b.length)
      bb.put(b)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Any)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
    var i = 0
    while (i < n) {
      val s = bb.getDouble()
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      row.pointTo(b, len)
      buf.enqueue((s, InternalRow.copyValue(row.get(0, id.dataType))))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  /** `topk(score, id, k)` as a Column aggregate. */
  def topk(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAgg(Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression())
}
