package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/**
 * Per-file deletion-vector bitmap as ONE merging aggregate — the
 * map-side-combining build behind [[graft.GwTable]]'s merge-on-read
 * DELETE/UPDATE paths.
 *
 * The naive build (`distinct().groupByKey(path).mapGroups`) pays two
 * exchanges — one for the distinct, one to gather a file's positions
 * onto the single task that folds its bitmap — and every deleted row
 * crosses both as a full Tungsten row carrying the ~100-byte file path
 * next to its 8-byte position; `mapGroups` structurally cannot
 * partial-aggregate. This aggregate restores the shape the engine's
 * other metadata builds already have ([[BloomBitsetAgg]], [[SimHashAgg]],
 * [[KmvDistinctAgg]], [[FreqItemsAgg]]): each input partition packs the
 * positions it holds into a LOCAL primitive buffer per file
 * (ObjectHashAggregate partial mode), and the one remaining exchange
 * carries one packed 8-bytes-per-position blob per (file x partition) —
 * no per-row framing, no repeated path strings, and the separate
 * distinct() exchange disappears because eval sorts-and-dedups anyway
 * (the union with a file's EXISTING deletion vector is where duplicate
 * positions come from).
 *
 * Eval returns `struct(bitmap BINARY, card BIGINT)`: the serialized
 * [[graft.log.RoaringBitmapArray]] (byte-identical to the pre-aggregate
 * build — both serialize the sorted distinct position array) and its
 * cardinality. The driver still collects only compressed bitmaps,
 * O(deleted rows / 8 bits) worst case, as documented on [[graft.Dv]].
 */
case class DvPositionsAgg(
    pos: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DvPositionsAgg.Buf] {

  override def children: Seq[Expression] = Seq(pos)
  override def nullable: Boolean = false
  override def dataType: DataType = DvPositionsAgg.Out
  override def prettyName: String = "dv_positions_agg"

  override def createAggregationBuffer(): DvPositionsAgg.Buf =
    new DvPositionsAgg.Buf(new Array[Long](8), 0)

  override def update(buf: DvPositionsAgg.Buf, input: InternalRow): DvPositionsAgg.Buf = {
    val v = pos.eval(input)
    if (v != null) buf.append(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: DvPositionsAgg.Buf, other: DvPositionsAgg.Buf): DvPositionsAgg.Buf = {
    buf.appendAll(other.arr, other.n)
    buf
  }

  override def eval(buf: DvPositionsAgg.Buf): Any = {
    val sorted = buf.sortedDistinct()
    new GenericInternalRow(Array[Any](
      graft.log.RoaringBitmapArray.serialize(sorted), sorted.length.toLong))
  }

  override def serialize(buf: DvPositionsAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DvPositionsAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Long](math.max(n, 8))
    var i = 0
    while (i < n) { arr(i) = bb.getLong; i += 1 }
    new DvPositionsAgg.Buf(arr, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DvPositionsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): DvPositionsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): DvPositionsAgg =
    copy(pos = newChildren(0))
}

object DvPositionsAgg {

  private[functions] val Out: StructType = StructType(Seq(
    StructField("bitmap", BinaryType, nullable = false),
    StructField("card", LongType, nullable = false)))

  /** Mutable aggregation state: a packed primitive position buffer
    * (doubling growth, sorted + deduped only at eval). */
  final class Buf(var arr: Array[Long], var n: Int) {
    def append(v: Long): Unit = {
      if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(n) = v
      n += 1
    }
    def appendAll(src: Array[Long], m: Int): Unit = {
      if (n + m > arr.length)
        arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, n + m))
      System.arraycopy(src, 0, arr, n, m)
      n += m
    }
    def sortedDistinct(): Array[Long] = {
      val a = java.util.Arrays.copyOf(arr, n)
      java.util.Arrays.sort(a)
      var out = 0
      var i = 0
      while (i < a.length) {
        if (out == 0 || a(out - 1) != a(i)) { a(out) = a(i); out += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(a, out)
    }
  }

  /** Column wrapper: `struct(bitmap, card)` — the serialized roaring
    * bitmap of the group's distinct `pos` values and its cardinality. */
  def apply(pos: Column): Column =
    Bridge.column(DvPositionsAgg(Bridge.expression(pos)).toAggregateExpression())
}
