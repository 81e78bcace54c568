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
 */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1, s"need k >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_agg"

  // worst-first ordering: a pair is WORSE when its score is lower, or equal
  // with a larger id — so the queue's head is the eviction candidate
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.fromLessThan[(Double, Long)]((a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)).reverse

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def push(buf: mutable.PriorityQueue[(Double, Long)], s: Double, i: Long): Unit =
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      if (s > ws || (s == ws && i < wi)) { buf.dequeue(); buf.enqueue((s, i)) }
    }

  override def update(buffer: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      push(buffer, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (s, i) => push(buffer, s, i) }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buffer.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(best.map { case (s, i) => InternalRow(i, s) }.toArray[Any])
  }

  override def serialize(buffer: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    buffer.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble(), bb.getLong())); i += 1 }
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
