package graft.log

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Log-level Bloom-filter file skipping — the point-lookup complement to
 * min/max stats. A scattered high-cardinality key (ids, URLs, hashes)
 * defeats range stats completely: every file's [min, max] spans the whole
 * domain, so `WHERE key = x` opens every file. An opt-in per-file Bloom
 * over the key column (`graft.bloom.columns = 'c1,c2'` table property)
 * answers "is x POSSIBLY in this file" from the LOG, before any file
 * opens — a miss prunes the file exactly like a stats miss, a maybe keeps
 * it (false positives only cost a read; pruning is always conservative).
 *
 * Encoding: per (file, column), `k = 4` probes into an `m`-bit array,
 * positions taken from disjoint 22-bit windows of `xxhash64` of the
 * value's CANONICAL STRING (the one hash both the executor build and the
 * driver-side literal probe compute identically — which is why bloom
 * columns are restricted to integral/string types: their cast-to-string
 * is unambiguous). `m` sizes by the file's row count (20 bits/row,
 * clamped to [2^14, 2^22]) — FP stays ~1e-4 for typical file sizes; a
 * multi-million-row file saturates toward keep-everything, degrading to
 * exactly the no-bloom behavior (parquet's own internal bloom filters
 * remain the rowgroup-level tool at that granularity). The bitset rides
 * the AddFile's stats JSON (`gwBloom`), so it survives checkpoints and
 * costs nothing to read paths that never probe it.
 *
 * Scale: the build is ONE extra columnar pass over the freshly written
 * files (only the bloom columns are read), grouped per file executor-side
 * — the driver receives one base64 string per (file, column), metadata
 * scale. Maintenance rewrites drop blooms (min/max still harvested);
 * re-appending through the engine rebuilds them.
 */
object Bloom {

  val ColumnsProp = "graft.bloom.columns"
  val Probes = 4
  val MinBits = 1 << 14
  val MaxBits = 1 << 22
  val BitsPerRow = 20L

  def columnsOf(config: Map[String, String]): Seq[String] =
    config.get(ColumnsProp).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  def bitsFor(rows: Long): Int = {
    var m = MinBits
    while (m < MaxBits && m < rows * BitsPerRow) m <<= 1
    m
  }

  /** The k probe positions of a value hash in an m-bit array: disjoint
    * 22-bit windows of the 64-bit hash, masked to m (a power of two). */
  def positions(h: Long, mBits: Int): Array[Int] = {
    val out = new Array[Int](Probes)
    var i = 0
    while (i < Probes) {
      out(i) = ((h >>> (i * 22)) & (mBits - 1)).toInt
      i += 1
    }
    out
  }

  def set(bits: Array[Byte], h: Long): Unit =
    positions(h, bits.length * 8).foreach { p =>
      bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte
    }

  def mightContain(bits: Array[Byte], h: Long): Boolean =
    positions(h, bits.length * 8).forall { p =>
      (bits(p >> 3) & (1 << (p & 7))) != 0
    }

  /** Driver-side probe hash of a constraint value's canonical string —
    * the same `xxhash64(cast(col as string))` the build computes. */
  def hashLiteral(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)), 42L)
      .eval(null).asInstanceOf[Long]

  /** A file's serialized bloom for `column` from its stats JSON, if any. */
  def ofFile(f: AddFile, column: String): Option[Array[Byte]] =
    f.stats.flatMap { s =>
      scala.util.Try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(s).path("gwBloom").path(column)
        if (node.isTextual)
          Some(java.util.Base64.getDecoder.decode(node.asText()))
        else None
      }.toOption.flatten
    }

  /** Build per-file blooms for the table's declared bloom columns over
    * freshly written `files` and fold them into each AddFile's stats.
    * One pass, grouped per file executor-side; column-mapped tables skip
    * (logical/physical name translation is not plumbed here). */
  def augment(spark: SparkSession, config: Map[String, String],
      schemaJson: Option[String], files: Seq[AddFile]): Seq[AddFile] = {
    val cols = columnsOf(config)
    if (cols.isEmpty || files.isEmpty) return files
    if (schemaJson.exists(_.contains(ColumnMapping.PhysicalNameKey))) return files
    val raw = spark.read.parquet(files.map(_.path): _*)
    val present = cols.filter(raw.columns.contains)
    if (present.isEmpty) return files
    val hashed: DataFrame = raw.select(
      col("_metadata.file_path").as("__enc") +:
        present.map(c => xxhash64(col(c).cast("string")).as(c)): _*)
    val perFile: Map[String, Seq[(String, String)]] = hashed
      .groupByKey(r => r.getString(0))(Encoders.STRING)
      .mapGroups { (enc, rows) =>
        val hs = present.map(_ => scala.collection.mutable.ArrayBuffer.empty[Long])
        var n = 0L
        rows.foreach { r =>
          n += 1
          var i = 0
          while (i < present.length) {
            if (!r.isNullAt(i + 1)) hs(i) += r.getLong(i + 1)
            i += 1
          }
        }
        val m = bitsFor(n)
        val encoded = present.zipWithIndex.map { case (c, i) =>
          val bits = new Array[Byte](m / 8)
          hs(i).foreach(h => set(bits, h))
          c -> java.util.Base64.getEncoder.encodeToString(bits)
        }
        (enc, encoded)
      }(Encoders.product[(String, Seq[(String, String)])])
      .collect().toMap
    // scanned paths come back URL-encoded and fully qualified; normalize
    // both sides onto the same key form the engine uses everywhere
    val byKey = perFile.map { case (enc, v) =>
      graft.GwTable.uriKeyScanned(enc) -> v
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    files.map { f =>
      byKey.get(graft.GwTable.uriKey(f.path)) match {
        case None => f
        case Some(blooms) =>
          val root = f.stats
            .flatMap(s => scala.util.Try(mapper.readTree(s)).toOption)
            .collect { case o: com.fasterxml.jackson.databind.node.ObjectNode => o }
            .getOrElse(mapper.createObjectNode())
          val bn = root.putObject("gwBloom")
          blooms.foreach { case (c, b64) => bn.put(c, b64) }
          f.copy(stats = Some(mapper.writeValueAsString(root)))
      }
    }
  }

  private def Encoders = org.apache.spark.sql.Encoders
}
