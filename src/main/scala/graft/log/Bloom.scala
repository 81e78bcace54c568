package graft.log

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Log-level Bloom-filter file skipping — the point-lookup complement to
 * min/max stats. A scattered high-cardinality key (ids, URLs, hashes)
 * defeats range stats completely: every file's [min, max] spans the whole
 * domain, so `WHERE key = x` opens every file. An opt-in per-file Bloom
 * over the key column (`graft.bloom.columns = 'c1,c2'` table property)
 * answers "is x POSSIBLY in this file" before any file opens — a miss
 * prunes the file exactly like a stats miss, a maybe keeps it (false
 * positives only cost a read; pruning is always conservative).
 *
 * Encoding: per (file, column), `k = 4` probes into an `m`-bit array,
 * positions by DOUBLE HASHING (`h1 + i*h2` over the two 32-bit halves of
 * `xxhash64` of the value's CANONICAL STRING — the one hash both the
 * executor build and the driver-side literal probe compute identically,
 * which is why bloom columns are restricted to integral/string types:
 * their cast-to-string is unambiguous). `h2` is forced odd so every probe
 * walks a full-period stride mod the power-of-two `m` — four genuinely
 * independent positions (a windowed scheme can only cut <= 64 bits into
 * overlapping windows). `m` sizes by the file's row count (20 bits/row,
 * clamped to [2^14, 2^22]) — FP stays ~1e-4 for typical file sizes.
 *
 * Storage: bitsets live in SIDECAR files under `<table>/_bloom/` (the
 * deletion-vector pattern — one sidecar per build task, each (file,
 * column) bitset at a recorded offset). The AddFile's stats JSON carries
 * only the tiny descriptor (`gwBloomRef`: path/offset/length/crc), so the
 * LOG grows O(1) per file no matter how large the filters are — at 100 TB
 * file counts, log-resident bitsets would add GBs to every checkpoint and
 * to the driver's replay footprint. Bitsets load LAZILY, only when a
 * point-lookup constraint actually probes the column, through a bounded
 * in-memory cache; a missing/corrupt sidecar degrades to "keep the file"
 * (CRC-verified — torn bytes must never fabricate a definite miss).
 * A filter whose fill ratio exceeds [[Bloom.MaxFill]] is NOT persisted at
 * all: past ~50% occupancy the FP rate (~fill^k) has lost its pruning
 * power, which is precisely the multi-million-row-file regime — paying
 * storage for a filter that keeps everything is the worst of both worlds
 * (parquet's own internal bloom filters remain the rowgroup-level tool at
 * that granularity).
 *
 * Scale: the build is ONE extra columnar pass over the freshly written
 * files (only the bloom columns are read), grouped per file executor-side;
 * sidecars are written by the build tasks themselves, so the driver only
 * ever sees descriptors — metadata scale. Vacuum owns `_bloom/`: sidecars
 * survive as long as any log version references them and are debris-swept
 * afterwards, the DV lifetime policy. Maintenance rewrites (compaction)
 * REBUILD the blooms over the rewritten files in the same operation, so
 * file-level point-lookup pruning survives OPTIMIZE.
 */
object Bloom {

  val ColumnsProp = "graft.bloom.columns"
  val Probes = 4
  val MinBits = 1 << 14
  val MaxBits = 1 << 22
  val BitsPerRow = 20L

  /** Fill ratio above which a built filter is discarded, not persisted:
    * FP ≈ fill^k is already ~6% at 0.5 and collapses toward 1 as the
    * clamp saturates — storing it would cost bytes to prune nothing. */
  val MaxFill = 0.5

  def columnsOf(config: Map[String, String]): Seq[String] =
    config.get(ColumnsProp).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** Canonical-string hashing is only deterministic for types whose
    * cast-to-string has one rendering on both build and probe sides —
    * integrals and strings. Enforced at `ALTER TABLE` time, but ALSO at
    * build time ([[augment]] filters by the actual schema): the property
    * can arrive via bootstrap props or a foreign-written configuration,
    * and a timestamp/double/decimal bloom would hash strings the probe's
    * canonical form never matches — a guaranteed miss that silently
    * prunes matching rows. */
  def hashableType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.StringType => true
    case _ => false
  }

  /** Persist-worthiness: past [[MaxFill]] occupancy the filter keeps
    * ~everything — storing it would pay bytes for no pruning. This is the
    * multi-million-row regime where the size clamp saturates: the cost is
    * highest exactly where the benefit is lowest, so saturated filters
    * are dropped instead of persisted. */
  def worthPersisting(bits: Array[Byte]): Boolean = {
    var pop = 0L
    bits.foreach(b => pop += java.lang.Integer.bitCount(b & 0xff))
    pop <= bits.length * 8L * MaxFill
  }

  def bitsFor(rows: Long): Int = {
    var m = MinBits
    while (m < MaxBits && m < rows * BitsPerRow) m <<= 1
    m
  }

  /** The k probe positions of a value hash in an m-bit array (m a power
    * of two): double hashing `h1 + i*h2` from the two 32-bit halves of
    * the 64-bit hash, `h2` forced odd (coprime to m → full-period
    * stride, all k positions independent). */
  def positions(h: Long, mBits: Int): Array[Int] = {
    val h1 = h.toInt
    val h2 = (h >>> 32).toInt | 1
    val out = new Array[Int](Probes)
    var i = 0
    while (i < Probes) {
      out(i) = (h1 + i * h2) & (mBits - 1)
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

  /** Sidecar descriptor of one (file, column) bitset, as recorded in the
    * stats JSON under `gwBloomRef.<column>`: absolute sidecar `p`ath,
    * byte `o`ffset, `l`ength, and the bitset's `c`rc32 (torn or stale
    * bytes must degrade to "no bloom", never to a fabricated miss). */
  final case class Ref(path: String, offset: Long, length: Int, crc: Long)

  private val mapperTL = new ThreadLocal[com.fasterxml.jackson.databind.ObjectMapper] {
    override def initialValue() = new com.fasterxml.jackson.databind.ObjectMapper()
  }

  /** The sidecar descriptor for `column` in a file's stats JSON, if any. */
  def refOf(f: AddFile, column: String): Option[Ref] =
    f.stats.filter(_.contains("gwBloomRef")).flatMap { s =>
      scala.util.Try {
        val node = mapperTL.get.readTree(s).path("gwBloomRef").path(column)
        if (node.isObject)
          Some(Ref(node.path("p").asText(), node.path("o").asLong(),
            node.path("l").asInt(), node.path("c").asLong()))
        else None
      }.toOption.flatten
    }

  /** Every sidecar path a file's stats reference — vacuum's ownership
    * walk (sidecars must outlive every log version whose adds point at
    * them, the DV lifetime policy). */
  def sidecarPaths(f: AddFile): Seq[String] =
    f.stats.filter(_.contains("gwBloomRef")).toSeq.flatMap { s =>
      scala.util.Try {
        val node = mapperTL.get.readTree(s).path("gwBloomRef")
        val it = node.fieldNames()
        val out = Seq.newBuilder[String]
        while (it.hasNext) {
          val p = node.path(it.next()).path("p")
          if (p.isTextual) out += p.asText()
        }
        out.result()
      }.getOrElse(Nil)
    }.distinct

  /** Rewrite a stats JSON's `gwBloomRef` sidecar paths through `mapping`
    * (deep clone: sidecars copy whole into the clone's `_bloom/`, offsets
    * unchanged, so only the path field moves — the DV remap pattern).
    * Stats without bloom refs pass through untouched. */
  def remapStats(stats: String, mapping: Map[String, String]): String =
    if (mapping.isEmpty || !stats.contains("gwBloomRef")) stats
    else scala.util.Try {
      val mapper = mapperTL.get
      mapper.readTree(stats) match {
        case root: com.fasterxml.jackson.databind.node.ObjectNode =>
          root.path("gwBloomRef") match {
            case refs: com.fasterxml.jackson.databind.node.ObjectNode =>
              val it = refs.fieldNames()
              while (it.hasNext) {
                refs.path(it.next()) match {
                  case r: com.fasterxml.jackson.databind.node.ObjectNode =>
                    mapping.get(r.path("p").asText()).foreach(r.put("p", _))
                  case _ => ()
                }
              }
            case _ => ()
          }
          mapper.writeValueAsString(root)
        case _ => stats
      }
    }.getOrElse(stats)

  // Bounded LRU over loaded bitsets, keyed by descriptor. A snapshot
  // probe touches each (file, column) once per query; repeated point
  // lookups on a warm table plan entirely from here. Access-ordered,
  // capped by total bitset bytes.
  private val CacheMaxBytes = 64L << 20
  private val cacheBytes = new java.util.concurrent.atomic.AtomicLong(0)
  private val cache =
    new java.util.LinkedHashMap[Ref, Array[Byte]](128, 0.75f, true)

  /** Insert under the byte budget: evict access-order-eldest entries until
    * the cache PLUS the incoming bitset fits (looping — a single-eviction
    * rule lets the cache settle one max-size bitset above budget). Caller
    * holds the cache lock. */
  private def putBounded(ref: Ref, b: Array[Byte]): Unit = {
    if (cache.containsKey(ref)) return
    val it = cache.entrySet().iterator()
    while (cacheBytes.get + b.length > CacheMaxBytes && it.hasNext) {
      val e = it.next()
      cacheBytes.addAndGet(-e.getValue.length.toLong)
      it.remove()
    }
    cache.put(ref, b)
    cacheBytes.addAndGet(b.length.toLong)
    ()
  }

  // PERMANENTLY failed loads (vacuumed sidecar under a stale snapshot,
  // deep clone whose source is gone, CRC damage) are remembered in a
  // bounded set so a dead ref costs ONE FS round trip per process, not
  // one per probe. Only failures that cannot heal enter here — a
  // TRANSIENT IO error (an object-store 503, a network blip) is retried
  // on the next probe instead of silently disabling the bloom's pruning
  // for the life of the driver.
  private val failedCap = 16384
  private val failed = java.util.Collections.newSetFromMap(
    new java.util.LinkedHashMap[Ref, java.lang.Boolean](128, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Ref, java.lang.Boolean]): Boolean =
        size() > failedCap
    })

  /** A file's bitset for `column`, lazily loaded from its sidecar.
    * Any failure — missing sidecar (vacuumed under a stale snapshot,
    * deep-cloned table whose source is gone), short read, CRC mismatch —
    * yields None: the probe keeps the file, pruning stays conservative. */
  def ofFile(f: AddFile, column: String): Option[Array[Byte]] =
    refOf(f, column).flatMap(load(_, hadoopConf()))

  // resolved on the CALLING thread: the active-session thread-local does
  // not reach fork-join pool workers, and losing it there would drop
  // object-store credentials from parallel prefetch loads
  private def hadoopConf(): org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Warm the bitset cache for the candidate files' probe columns in
    * PARALLEL. Planning a point lookup on a COLD driver would otherwise
    * load sidecars serially inside the per-file filter — one FS open per
    * candidate file, which on an object store at 100k-file counts turns
    * planning into minutes. The probes themselves stay per-file and
    * cache-hit after this; failures degrade per file as usual. */
  def prefetch(files: Seq[AddFile], columns: Seq[String]): Unit = {
    val refs = (for { f <- files; c <- columns; r <- refOf(f, c) } yield r).distinct
    val missing = refs.filter(r =>
      cache.synchronized(!cache.containsKey(r)) &&
        failed.synchronized(!failed.contains(r)))
    if (missing.nonEmpty) {
      import scala.jdk.CollectionConverters._
      val conf = hadoopConf()
      missing.asJava.parallelStream().forEach(r => { load(r, conf); () })
    }
  }

  private def load(ref: Ref,
      conf: org.apache.hadoop.conf.Configuration): Option[Array[Byte]] = {
    if (failed.synchronized(failed.contains(ref))) return None
    cache.synchronized(Option(cache.get(ref))) match {
      case some @ Some(_) => some
      case None =>
        // permanent = the bytes can never come back right (gone, short, or
        // CRC-damaged at the recorded offset); transient = this ATTEMPT
        // failed (connection reset, throttling 503) but the sidecar may be
        // healthy — retried next probe, never negative-cached
        var permanent = false
        val loaded =
          try {
            val p = new org.apache.hadoop.fs.Path(ref.path)
            val in = p.getFileSystem(conf).open(p)
            try {
              val buf = new Array[Byte](ref.length)
              in.readFully(ref.offset, buf)
              val crc = new java.util.zip.CRC32()
              crc.update(buf)
              if (crc.getValue == ref.crc) Some(buf)
              else { permanent = true; None } // stored bytes are wrong
            } finally in.close()
          } catch {
            case _: java.io.FileNotFoundException |
                 _: java.io.EOFException => // vacuumed / truncated sidecar
              permanent = true; None
            case scala.util.control.NonFatal(_) => None // transient: retry
          }
        loaded match {
          case Some(b) => cache.synchronized(putBounded(ref, b))
          case None if permanent => failed.synchronized { failed.add(ref); () }
          case None => ()
        }
        loaded
    }
  }

  /** Parquet write options enabling PARQUET-NATIVE per-rowgroup bloom
    * filters for the table's declared bloom columns — the rowgroup-
    * granularity complement to the log-level file blooms: the log bloom
    * answers "which FILES can contain x" before any file opens, and once
    * a multi-GB file IS opened (where the log bloom has saturated and
    * been dropped), parquet's own bloom lets the reader skip row groups.
    * Spark's vectorized reader consults these automatically for pushed
    * point predicates; adaptive sizing right-sizes the filter to the row
    * group's actual NDV. Maintenance rewrites (compaction) thread these
    * too, so rowgroup skipping SURVIVES the rewrite that drops the
    * engine-level blooms. Column-mapped tables skip (option keys are
    * physical names; translation not plumbed — same boundary as
    * [[augment]]). */
  def parquetWriteOptions(config: Map[String, String],
      schemaJson: Option[String],
      schema: org.apache.spark.sql.types.StructType): Map[String, String] = {
    if (schemaJson.exists(_.contains(ColumnMapping.PhysicalNameKey)))
      return Map.empty
    val cols = columnsOf(config).filter(schema.fieldNames.contains)
    if (cols.isEmpty) Map.empty
    else cols.map(c => s"parquet.bloom.filter.enabled#$c" -> "true").toMap +
      ("parquet.bloom.filter.adaptive.enabled" -> "true")
  }

  /** Build per-file blooms for the table's declared bloom columns over
    * freshly written `files`: one columnar pass, bitsets grouped per file
    * executor-side, each build task writing ONE sidecar under
    * `<tablePath>/_bloom/` and returning only descriptors to the driver
    * (metadata scale). Saturated filters (fill > [[MaxFill]]) are
    * dropped. Columns whose actual type is not canonically hashable are
    * skipped regardless of how the property entered the configuration.
    * Column-mapped tables skip (logical/physical name translation is not
    * plumbed here). */
  def augment(spark: SparkSession, config: Map[String, String],
      schemaJson: Option[String], tablePath: String,
      files: Seq[AddFile]): Seq[AddFile] = {
    val cols = columnsOf(config)
    if (cols.isEmpty || files.isEmpty) return files
    if (schemaJson.exists(_.contains(ColumnMapping.PhysicalNameKey))) return files
    val raw = spark.read.parquet(files.map(_.path): _*)
    val present = cols.filter(c => raw.schema.fields.exists(f =>
      f.name == c && hashableType(f.dataType)))
    if (present.isEmpty) return files
    val hashed: DataFrame = raw.select(
      col("_metadata.file_path").as("__enc") +:
        present.map(c => xxhash64(col(c).cast("string")).as(c)): _*)
    val sconf = new graft.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val sidecarDir = new org.apache.hadoop.fs.Path(tablePath, "_bloom").toString
    val runId = java.util.UUID.randomUUID().toString
    // per-file bit widths, driver-computed from the harvested footer
    // numRecords already in the stats JSON — partials can only OR-merge
    // when they agree on width, and only the driver knows each file's
    // total row count up front (see [[graft.functions.BloomBitsetAgg]])
    val sizes: Map[String, Int] = files.flatMap(f =>
      graft.Dv.numRecords(f).map(n =>
        graft.GwTable.uriKey(f.path) -> bitsFor(n))).toMap
    // per file: one OR-merging bitset aggregate per bloom column —
    // ObjectHashAggregate folds each input partition's rows into local
    // per-file bitsets (map-side combine), so the exchange carries one
    // partial bitset per (file x partition) instead of every row's
    // (path, hash); per TASK after the final merge: stream the surviving
    // bitsets into one sidecar, emitting (file, column, ref)
    val refs: Seq[(String, Seq[(String, Ref)])] = aggFrame(hashed, present, sizes)
      .map { r =>
        (r.getString(0), present.indices.toList.flatMap(i =>
          if (r.isNullAt(i + 1)) None
          else Some(present(i) -> r.getAs[Array[Byte]](i + 1))): Seq[(String, Array[Byte])])
      }(Encoders.product[(String, Seq[(String, Array[Byte])])])
      .mapPartitions { groups =>
        if (!groups.hasNext) Iterator.empty
        else {
          // attempt id in the name: a retried/speculated task writes its
          // own sidecar instead of colliding with a half-written one (the
          // loser's file becomes unreferenced debris, vacuum-swept)
          val tc = org.apache.spark.TaskContext.get()
          val out = new org.apache.hadoop.fs.Path(
            s"$sidecarDir/$runId-p${tc.partitionId()}-a${tc.taskAttemptId()}.bin")
          val fs = out.getFileSystem(sconf.value)
          val os = fs.create(out, false)
          val collected = Seq.newBuilder[(String, Seq[(String, Ref)])]
          var offset = 0L
          try {
            groups.foreach { case (enc, bitsets) =>
              val refs = bitsets.map { case (c, bits) =>
                val crc = new java.util.zip.CRC32()
                crc.update(bits)
                os.write(bits)
                val r = c -> Ref(out.toString, offset, bits.length, crc.getValue)
                offset += bits.length
                r
              }
              collected += ((enc, refs))
            }
          } finally os.close()
          if (offset == 0L) fs.delete(out, false) // all filters saturated
          collected.result().iterator
        }
      }(Encoders.product[(String, Seq[(String, Ref)])])
      .collect().toIndexedSeq
    // scanned paths come back URL-encoded and fully qualified; normalize
    // both sides onto the same key form the engine uses everywhere
    val byKey = refs.map { case (enc, v) =>
      graft.GwTable.uriKeyScanned(enc) -> v
    }.toMap
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    files.map { f =>
      byKey.get(graft.GwTable.uriKey(f.path)).filter(_.nonEmpty) match {
        case None => f
        case Some(colRefs) =>
          val root = f.stats
            .flatMap(s => scala.util.Try(mapper.readTree(s)).toOption)
            .collect { case o: com.fasterxml.jackson.databind.node.ObjectNode => o }
            .getOrElse(mapper.createObjectNode())
          val bn = root.putObject("gwBloomRef")
          colRefs.foreach { case (c, r) =>
            val o = bn.putObject(c)
            o.put("p", r.path); o.put("o", r.offset)
            o.put("l", r.length); o.put("c", r.crc)
          }
          f.copy(stats = Some(mapper.writeValueAsString(root)))
      }
    }
  }

  /** The build's aggregation frame: group by scanned file path, one
    * [[graft.functions.BloomBitsetAgg]] per bloom column. Split out so the
    * spec can pin the PHYSICAL shape — a partial ObjectHashAggregate below
    * the exchange (map-side combine) and a final one above it. */
  private[graft] def aggFrame(hashed: DataFrame, present: Seq[String],
      sizes: Map[String, Int]): DataFrame = {
    val aggs = present.map(c =>
      graft.functions.BloomBitsetAgg(col("__enc"), col(c), sizes).as(c))
    hashed.groupBy(col("__enc")).agg(aggs.head, aggs.tail: _*)
  }

  private def Encoders = org.apache.spark.sql.Encoders
}
