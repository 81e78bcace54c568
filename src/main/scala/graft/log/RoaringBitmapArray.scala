package graft.log

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Portable serialization of a 64-bit roaring bitmap ("RoaringBitmapArray")
 * — the deletion-vector bitmap encoding of the public Delta protocol
 * (PROTOCOL.md "Deletion Vector Format"), re-implemented from the published
 * format documents: the portable 64-bit framing is a little-endian magic
 * number, a little-endian count, then a DENSE array of 32-bit roaring
 * bitmaps (index i covers positions whose high 32 bits equal i), each in
 * the standard interoperable 32-bit layout of the RoaringFormatSpec.
 *
 * Only array and bitmap containers are written (cookie 12346,
 * SERIAL_COOKIE_NO_RUNCONTAINER); run containers are never emitted and are
 * rejected on read — a reader of OUR files never sees one, and external
 * spec-compliant readers accept both container families.
 *
 * Why bitmaps: a deletion vector's natural representation is "set of row
 * positions"; boxed long arrays cost ~8 B per deleted row wherever they are
 * held, while the bitmap costs at most 8 KiB per 64 Ki-row block (bitset
 * container) and 2 B per row below that (array container). The driver ships
 * only descriptors; tasks decode their own file's bitmap.
 */
object RoaringBitmapArray {

  /** Little-endian magic of the portable 64-bit format. */
  val Magic: Int = 1681511377
  private val NoRunCookie = 12346
  private val ArrayMaxCard = 4096

  /** Serialize sorted, distinct, non-negative positions. */
  def serialize(sorted: Array[Long]): Array[Byte] = {
    var i = 1
    while (i < sorted.length) {
      require(sorted(i) > sorted(i - 1), "positions must be sorted and distinct")
      i += 1
    }
    require(sorted.isEmpty || sorted(0) >= 0, "positions must be non-negative")
    val nBitmaps = if (sorted.isEmpty) 0L else (sorted(sorted.length - 1) >>> 32) + 1
    val bitmaps = new Array[Array[Byte]](nBitmaps.toInt)
    var idx = 0
    var bm = 0
    var total = 12 // magic + count
    while (bm < nBitmaps) {
      val start = idx
      while (idx < sorted.length && (sorted(idx) >>> 32) == bm.toLong) idx += 1
      bitmaps(bm) = serialize32(sorted, start, idx)
      total += bitmaps(bm).length
      bm += 1
    }
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(nBitmaps)
    bitmaps.foreach(buf.put)
    buf.array()
  }

  /** One 32-bit roaring bitmap over the LOW 32 bits of `all(from until)`. */
  private def serialize32(all: Array[Long], from: Int, until: Int): Array[Byte] = {
    // containers keyed by bits 16..31 of the low word
    val keys = Array.newBuilder[Int]
    val bounds = Array.newBuilder[Int] // container start indexes, + terminal
    var i = from
    while (i < until) {
      val key = ((all(i) >>> 16) & 0xffff).toInt
      keys += key
      bounds += i
      while (i < until && ((all(i) >>> 16) & 0xffff).toInt == key) i += 1
    }
    bounds += until
    val ks = keys.result()
    val bs = bounds.result()
    val n = ks.length
    val headerBytes = 4 + 4 + 4 * n + 4 * n // cookie, count, pairs, offsets
    var payload = 0
    var c = 0
    while (c < n) {
      val card = bs(c + 1) - bs(c)
      payload += (if (card <= ArrayMaxCard) 2 * card else 8192)
      c += 1
    }
    val buf = ByteBuffer.allocate(headerBytes + payload).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(NoRunCookie)
    buf.putInt(n)
    c = 0
    while (c < n) {
      buf.putShort(ks(c).toShort)
      buf.putShort((bs(c + 1) - bs(c) - 1).toShort)
      c += 1
    }
    var off = headerBytes
    c = 0
    while (c < n) {
      buf.putInt(off)
      val card = bs(c + 1) - bs(c)
      off += (if (card <= ArrayMaxCard) 2 * card else 8192)
      c += 1
    }
    c = 0
    while (c < n) {
      val card = bs(c + 1) - bs(c)
      if (card <= ArrayMaxCard) {
        var j = bs(c)
        while (j < bs(c + 1)) { buf.putShort((all(j) & 0xffff).toShort); j += 1 }
      } else {
        val words = new Array[Long](1024)
        var j = bs(c)
        while (j < bs(c + 1)) {
          val v = (all(j) & 0xffff).toInt
          words(v >>> 6) |= 1L << (v & 63)
          j += 1
        }
        var w = 0
        while (w < 1024) { buf.putLong(words(w)); w += 1 }
      }
      c += 1
    }
    buf.array()
  }

  /** Decode to sorted distinct positions. */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.remaining() >= 12, s"truncated deletion vector (${bytes.length} bytes)")
    val magic = buf.getInt()
    require(magic == Magic, s"bad deletion-vector magic $magic (expected $Magic)")
    val nBitmaps = buf.getLong()
    val out = Array.newBuilder[Long]
    var bm = 0L
    while (bm < nBitmaps) {
      val cookie = buf.getInt()
      require(cookie == NoRunCookie,
        s"unsupported roaring cookie $cookie — this engine writes only " +
          "array/bitmap containers (cookie 12346)")
      val n = buf.getInt()
      val keys = new Array[Int](n)
      val cards = new Array[Int](n)
      var c = 0
      while (c < n) {
        keys(c) = buf.getShort() & 0xffff
        cards(c) = (buf.getShort() & 0xffff) + 1
        c += 1
      }
      var skip = 0
      while (skip < n) { buf.getInt(); skip += 1 } // offsets: sequential parse
      c = 0
      while (c < n) {
        val base = (bm << 32) | (keys(c).toLong << 16)
        if (cards(c) <= ArrayMaxCard) {
          var j = 0
          while (j < cards(c)) { out += base | (buf.getShort() & 0xffff).toLong; j += 1 }
        } else {
          var w = 0
          while (w < 1024) {
            var word = buf.getLong()
            val wordBase = base | (w.toLong << 6)
            while (word != 0) {
              out += wordBase | java.lang.Long.numberOfTrailingZeros(word).toLong
              word &= word - 1
            }
            w += 1
          }
        }
        c += 1
      }
      bm += 1
    }
    out.result()
  }

  // ------------------------------------------------------------------- Z85
  // The inline-DV text encoding (4 bytes -> 5 chars, the Z85 alphabet).
  // Input is zero-padded to a 4-byte boundary; the descriptor's sizeInBytes
  // trims the padding on decode — the same convention Delta documents for
  // `pathOrInlineDv`.

  private val Z85Chars =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Dec: Array[Int] = {
    val a = Array.fill(128)(-1)
    var i = 0
    while (i < Z85Chars.length) { a(Z85Chars.charAt(i)) = i; i += 1 }
    a
  }

  def z85Encode(bytes: Array[Byte]): String = {
    val pad = (4 - bytes.length % 4) % 4
    val sb = new java.lang.StringBuilder((bytes.length + pad) / 4 * 5)
    var i = 0
    while (i < bytes.length + pad) {
      var v = 0L
      var j = 0
      while (j < 4) {
        val b = if (i + j < bytes.length) bytes(i + j) & 0xffL else 0L
        v = (v << 8) | b
        j += 1
      }
      var div = 85L * 85 * 85 * 85
      while (div > 0) {
        sb.append(Z85Chars.charAt(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  /** Decode `s` and trim to `outLen` bytes (the pre-padding length). */
  def z85Decode(s: String, outLen: Int): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input length ${s.length} not a multiple of 5")
    val full = new Array[Byte](s.length / 5 * 4)
    require(outLen <= full.length && outLen >= full.length - 3,
      s"declared size $outLen inconsistent with ${s.length} encoded chars")
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val ch = s.charAt(i + j)
        val d = if (ch < 128) Z85Dec(ch) else -1
        require(d >= 0, s"invalid Z85 character '$ch'")
        v = v * 85 + d
        j += 1
      }
      full(o) = (v >>> 24).toByte
      full(o + 1) = (v >>> 16).toByte
      full(o + 2) = (v >>> 8).toByte
      full(o + 3) = v.toByte
      i += 5
      o += 4
    }
    if (outLen == full.length) full else java.util.Arrays.copyOf(full, outLen)
  }
}
