package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/**
 * Per-file Bloom bitset as ONE OR-merging aggregate — the map-side-
 * combining build behind [[graft.log.Bloom.augment]].
 *
 * The naive build (`groupByKey(file).mapGroups`) ships EVERY ROW's
 * (path, hash) across the exchange to the one task that folds its file's
 * bitset — an O(total rows) shuffle on the CONVERT / initial-backfill
 * paths at 100 TB, moving tens of TB to produce KB-per-file of metadata,
 * and `mapGroups` structurally cannot partial-aggregate. This aggregate
 * restores the shape every other engine aggregate already has
 * ([[SimHashAgg]], [[KmvDistinctAgg]], [[FreqItemsAgg]]): each input
 * partition folds the rows it holds into a LOCAL bitset per file
 * (ObjectHashAggregate partial mode), and the exchange carries one
 * partially-built bitset per (file x partition) — bounded by filter
 * width, not row count.
 *
 * Sizing: partials can only OR-merge when every partial of a file agrees
 * on the bit width, and the width depends on the file's ROW COUNT —
 * which no partial knows (it sees only its slice). The driver does: the
 * engine's write paths harvest footer `numRecords` into the AddFile
 * stats, so `sizes` maps each file (scheme-insensitive [[graft.GwTable.uriKey]]
 * form) to its final width up front, and every partial allocates
 * identically on its first row. The first-row path lookup runs ONCE per
 * (file x partition) buffer, not per row. A file absent from `sizes`
 * (no harvested numRecords — a foreign writer's file on a CONVERT path)
 * yields NULL = no bloom for that file: pruning degrades conservatively,
 * exactly like a saturated filter.
 *
 * Eval applies [[graft.log.Bloom.worthPersisting]]: a filter past ~50%
 * occupancy has lost its pruning power and evaluates to NULL rather than
 * wasting sidecar bytes (identical policy to the pre-aggregate build, so
 * bitsets are byte-identical where they persist at all).
 */
case class BloomBitsetAgg(
    path: Expression,
    hash: Expression,
    sizes: Map[String, Int],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBitsetAgg.Buf] {

  override def children: Seq[Expression] = Seq(path, hash)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_bitset_agg"

  override def createAggregationBuffer(): BloomBitsetAgg.Buf =
    new BloomBitsetAgg.Buf(null)

  override def update(buf: BloomBitsetAgg.Buf, input: InternalRow): BloomBitsetAgg.Buf = {
    if (buf.bits == null) {
      // size on first row: all rows of a group share one file path, so the
      // (string-normalizing) lookup happens once per buffer, not per row
      val p = path.eval(input)
      buf.bits =
        if (p == null) BloomBitsetAgg.Dead
        else sizes.get(graft.GwTable.uriKeyScanned(p.toString)) match {
          case Some(mBits) => new Array[Byte](mBits / 8)
          case None => BloomBitsetAgg.Dead // no harvested row count: no bloom
        }
    }
    if (buf.bits.length > 0) {
      val h = hash.eval(input)
      if (h != null) graft.log.Bloom.set(buf.bits, h.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: BloomBitsetAgg.Buf, other: BloomBitsetAgg.Buf): BloomBitsetAgg.Buf = {
    if (buf.bits == null) buf.bits = other.bits
    else if (other.bits != null && other.bits.length > 0) {
      if (buf.bits.length != other.bits.length) buf.bits = BloomBitsetAgg.Dead
      else {
        var i = 0
        while (i < buf.bits.length) {
          buf.bits(i) = (buf.bits(i) | other.bits(i)).toByte
          i += 1
        }
      }
    } else if (other.bits != null) buf.bits = BloomBitsetAgg.Dead
    buf
  }

  override def eval(buf: BloomBitsetAgg.Buf): Any =
    if (buf.bits == null || buf.bits.length == 0) null
    else if (graft.log.Bloom.worthPersisting(buf.bits)) buf.bits
    else null

  // tag byte distinguishes the three buffer states: 0 = unsized (no rows
  // seen), 1 = dead (no width / width conflict), 2 = bits follow
  override def serialize(buf: BloomBitsetAgg.Buf): Array[Byte] =
    if (buf.bits == null) Array[Byte](0)
    else if (buf.bits.length == 0) Array[Byte](1)
    else {
      val out = new Array[Byte](1 + buf.bits.length)
      out(0) = 2
      System.arraycopy(buf.bits, 0, out, 1, buf.bits.length)
      out
    }

  override def deserialize(bytes: Array[Byte]): BloomBitsetAgg.Buf =
    bytes(0) match {
      case 0 => new BloomBitsetAgg.Buf(null)
      case 1 => new BloomBitsetAgg.Buf(BloomBitsetAgg.Dead)
      case _ =>
        val bits = new Array[Byte](bytes.length - 1)
        System.arraycopy(bytes, 1, bits, 0, bits.length)
        new BloomBitsetAgg.Buf(bits)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsetAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsetAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomBitsetAgg =
    copy(path = newChildren(0), hash = newChildren(1))
}

object BloomBitsetAgg {
  /** Mutable aggregation state: `bits` is null before the first row,
    * [[Dead]] (length 0) when the file has no usable width, else the
    * file-width bitset under construction. */
  final class Buf(var bits: Array[Byte])

  private[functions] val Dead: Array[Byte] = Array.emptyByteArray

  /** Column wrapper: the OR-merged Bloom bitset of `hash` values, sized by
    * `sizes(uriKey(path))` — null when unsized or saturated. */
  def apply(path: Column, hash: Column, sizes: Map[String, Int]): Column =
    Bridge.column(
      BloomBitsetAgg(Bridge.expression(path), Bridge.expression(hash), sizes)
        .toAggregateExpression())
}
