package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import scala.collection.mutable

/**
 * K-minimum-values (KMV / bottom-k) distinct-count sketch as a per-group
 * aggregate — the DETERMINISTIC alternative to `approx_count_distinct`:
 * HLL++ register states depend on Spark's internal xxhash seed and are not
 * replayable outside Spark, while a KMV state (the k smallest distinct
 * values of an explicit hash column) is a pure function of the input SET.
 * Insert/merge are commutative, associative and idempotent, so the result
 * is identical for any row order, partitioning, or merge tree — which is
 * what lets a DuckDB oracle reproduce the estimate bit-for-bit from the
 * same md5-prefix hash.
 *
 * Input contract: `child` is a non-negative LongType hash, uniform on
 * [0, 2^60) — produced by `conv(substring(md5(cast(x as string)),1,15),
 * 16,10)`, the cross-engine 60-bit md5 prefix this codebase already uses
 * for SimHash (see `api/Pipelines.scala` d03). Estimator: exact |S| while
 * |S| < k, else `floor((k-1) * 2^60 / h_k)` with `h_k` the k-th smallest
 * distinct hash — the classic KMV estimator (Bar-Yossef et al.), relative
 * error ~ 1/sqrt(k).
 *
 * 100 TB posture: fixed k longs of state per group, map-side partial
 * aggregation, one shuffle of k*8-byte payloads instead of values — the
 * same deployment shape as HLL with a ~2x larger payload at equal error.
 */
case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 16, s"need k >= 16 for a usable estimate; got k=$k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct_agg"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buffer: mutable.TreeSet[Long], h: Long): Unit = {
    if (buffer.size < k) { buffer += h }
    else if (h < buffer.max) { buffer += h; if (buffer.size > k) buffer -= buffer.max }
  }

  override def update(buffer: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buffer, _))
    buffer
  }

  override def eval(buffer: mutable.TreeSet[Long]): Any =
    if (buffer.size < k) buffer.size.toLong
    else math.floor((k - 1).toDouble * TwoPow60 / buffer.max.toDouble).toLong

  private val TwoPow60: Double = 1152921504606846976.0d // exact in an IEEE double

  override def serialize(buffer: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val s = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { s += bb.getLong(); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvDistinctAgg =
    copy(child = newChildren(0))
}

object KmvDistinctAgg {
  /** Column wrapper over a precomputed 60-bit hash column. */
  def apply(hash: Column, k: Int): Column =
    Bridge.column(
      KmvDistinctAgg(Bridge.expression(hash), k).toAggregateExpression())

  /** The cross-engine 60-bit md5-prefix hash of any column's string
    * rendering — `CAST(CONCAT('0x', substr(md5(CAST(x AS VARCHAR)),1,15))
    * AS BIGINT)` in DuckDB produces the identical value. */
  def hash60(c: Column): Column = {
    import org.apache.spark.sql.functions._
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
  }
}
