package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * 64-bit SimHash as ONE custom aggregate: per group, every (termHash,
 * weight) row votes +weight on each set bit of the hash and -weight on each
 * clear bit; the final value sets bit j iff vote_j > 0.
 *
 * The declarative formulation needs a bank of 64 `sum(when(...))` columns —
 * 64 aggregate buffers per group and 64 branch expressions per row. This
 * `TypedImperativeAggregate` replaces that with a single fixed 512-byte
 * buffer (64 long counters) updated in a tight loop: constant state per
 * group, map-side partial merge like any Spark aggregate, no per-bit
 * expression overhead. Same preference order as VecDot: a native Catalyst
 * primitive over a wide expression bank over a UDF.
 */
case class SimHashAgg(
    termHash: Expression,
    weight: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(termHash, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val h = termHash.eval(input)
    val w = weight.eval(input)
    if (h != null && w != null) {
      val hv = h.asInstanceOf[Long]
      val wv = w.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        if (((hv >>> j) & 1L) == 1L) buffer(j) += wv else buffer(j) -= wv
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { buffer(j) += other(j); j += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (buffer(j) > 0L) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(termHash = newChildren(0), weight = newChildren(1))
}

object SimHashAgg {
  /** Column wrapper: 64-bit simhash of (termHash, weight) rows per group. */
  def apply(termHash: Column, weight: Column): Column =
    Bridge.column(
      SimHashAgg(Bridge.expression(termHash), Bridge.expression(weight))
        .toAggregateExpression())
}
