package graft

import graft.log.{AddFile, CommitInfo, GwLog, Metadata, RemoveFile, Snapshot}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * Query surface over an indexed table (SURVEY.md §3.3): log replay ->
 * `spark.read.schema(...).parquet(files)`. The replay is pure driver-side
 * metadata work; the scan itself is a standard Catalyst
 * `FileSourceScanExec` with vectorized parquet reading, so column pruning,
 * predicate pushdown and AQE all apply untouched. Time travel =
 * `VERSION AS OF` semantics of the reference's README.md:81-84.
 */
final class GwTable private (spark: SparkSession, tablePath: String) {
  private val gwLog = GwLog.forTable(spark.sparkContext.hadoopConfiguration, tablePath)

  def log: GwLog = gwLog

  def snapshot(versionAsOf: Option[Long] = None): Snapshot = gwLog.snapshot(versionAsOf)

  /** Latest version. */
  def toDF: DataFrame = asDF(None)

  def versionAsOf(version: Long): DataFrame = asDF(Some(version))

  /** Greatest version whose commit timestamp is <= `ts`. */
  def timestampAsOf(ts: Long): DataFrame =
    versionAsOf(gwLog.versionAtTimestamp(ts))

  /** Incremental consumption: everything a downstream pipeline still has
    * to process after having consumed up to `sinceVersion`, computed by
    * walking the log's per-version actions (metadata only, no data read):
    *
    *  - normal case: the union of `dataChange = true` AddFiles committed in
    *    `(sinceVersion, latest]`. A later compaction may have REMOVED such
    *    a file from the live set, but its bytes survive until `vacuum`'s
    *    retention passes, so the increment is still served from the
    *    original files (consume within the retention window);
    *  - a restatement in the range (any `metaData` action — appends never
    *    carry one) replaced the table: an "increment" is undefined, so the
    *    call FAILS like the streaming source does — an appending consumer
    *    must truncate and reload `toDF` instead of stacking the restated
    *    table on top of stale rows. */
  def changesSince(sinceVersion: Long): DataFrame = {
    val latest = gwLog.snapshot(None)
    // a watermark beyond the log means the log was rebuilt under the
    // consumer (e.g. an Overwrite re-index) — silence here would read as
    // "caught up" and the consumer would permanently miss the rebuilt table
    require(sinceVersion <= latest.version,
      s"changesSince($sinceVersion) is beyond the log's latest version " +
        s"${latest.version} at $tablePath — the table was rebuilt; " +
        "restart consumption from a full snapshot")
    val range = (sinceVersion + 1) to latest.version
    val actions = range.flatMap(v => gwLog.readVersion(v))
    if (actions.exists(_.isInstanceOf[Metadata]))
      throw new IllegalStateException(
        s"changesSince($sinceVersion) at $tablePath crosses a schema " +
          "restatement: the table was replaced, so no increment exists — " +
          "truncate the sink and reload from toDF")
    // last add per path wins (a path re-asserted twice is one file)
    val byPath = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
    actions.foreach {
      case a: AddFile if a.dataChange => byPath(a.path) = a
      case _ => ()
    }
    val added: Seq[AddFile] = byPath.values.toSeq
    if (added.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], latest.schema)
    else
      spark.read.schema(latest.schema).parquet(added.map(_.path): _*)
  }

  /**
   * Compaction (OPTIMIZE): rewrite the snapshot's small files into
   * ~`targetFileBytes` files under `<table>/_compacted/`, committed as
   * `dataChange = false` adds/removes — readers see fewer files, while
   * streaming tails and `changesSince` correctly emit nothing.
   *
   * This is OPT-IN maintenance and the one place the engine writes data:
   * the indexer itself never moves bytes (shallow clone), but CDA drops
   * thousands of small files per table over time and a 100 TB reader pays
   * per-file open costs forever without consolidation.
   *
   * `clusterBy` additionally range-partitions and sorts the rewrite on the
   * given columns (the OPTIMIZE ... ZORDER role): each output file covers
   * a disjoint range, so its harvested min/max become tight and the
   * stats-based file skipping (`GwPruningScan`) can drop whole files for
   * selective predicates on those columns. CDA tables are commit-time
   * ordered but query-time filtered on BUSINESS time/keys — one clustered
   * rewrite converts that mismatch into file-level locality.
   *
   * Returns the committed version, or -1 if there was nothing to compact.
   */
  def compact(targetFileBytes: Long = 128L * 1024 * 1024,
      clusterBy: Seq[String] = Nil): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val snap = gwLog.snapshot(None)
    val small = snap.files.filter(_.size < targetFileBytes)
    if (small.size < 2) return -1L
    clusterBy.foreach { c =>
      require(snap.schema.fieldNames.contains(c),
        s"clusterBy column '$c' is not in the table schema " +
          s"(${snap.schema.fieldNames.mkString(", ")})")
    }
    val now = System.currentTimeMillis()
    val outDir = new Path(tablePath, s"_compacted/${java.util.UUID.randomUUID()}")
    val nOut = math.max(1, math.ceil(
      small.map(_.size).sum.toDouble / targetFileBytes).toInt)
    val base = spark.read.schema(snap.schema).parquet(small.map(_.path): _*)
    val arranged =
      if (clusterBy.isEmpty) base.repartition(nOut)
      else base
        .repartitionByRange(nOut, clusterBy.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(clusterBy.map(org.apache.spark.sql.functions.col): _*)
    arranged
      .write.mode("overwrite").parquet(outDir.toString)
    val newFiles = graft.sources.SchemaProbe
      .harvestAddFiles(conf, outDir, dataChange = false)
    val removes = small.map(f => RemoveFile(f.path, f.size, now, dataChange = false))
    val info = CommitInfo(
      timestamp = now, operation = "OPTIMIZE", mode = "Compact",
      numFiles = newFiles.size, numOutputBytes = newFiles.map(_.size).sum,
      isBlindAppend = false, txnId = java.util.UUID.randomUUID().toString)
    gwLog.commit(newFiles ++ removes ++ Seq(info))
  }

  /**
   * Vacuum: physically delete engine-written data files whose REMOVAL from
   * the live set is older than `retentionMs` — retention is measured from
   * the remove tombstone's deletionTimestamp (like delta), NOT from the
   * file's mtime: an output written long ago but superseded only a minute
   * ago must survive the full window so time travel and in-flight
   * `changesSince` consumers can still read it. ONLY files under the
   * engine-owned namespaces — `<table>/_compacted/` (compaction rewrites)
   * and `<table>/_stream/` (GwSink batches) — are candidates: the original
   * CDA files are a read-only source tree the engine shallow-clones and
   * must never delete. Engine outputs never referenced by any commit
   * (crash debris, e.g. a sink batch written but not committed) are swept
   * by file mtime. Returns the number of files deleted.
   */
  def vacuum(retentionMs: Long = 7L * 24 * 3600 * 1000): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val ownedDirs = Seq("_compacted", "_stream").map(new Path(tablePath, _))
    val fs = ownedDirs.head.getFileSystem(conf)
    val presentDirs = ownedDirs.filter(fs.exists)
    if (presentDirs.isEmpty) return 0
    val live = gwLog.snapshot(None).files.map(_.path).toSet
    val cutoff = System.currentTimeMillis() - retentionMs
    val markers = Seq("/_compacted/", "/_stream/")
    def owned(p: String): Boolean = markers.exists(p.contains)
    // walk the log once: latest removal tombstone per engine-owned path (a
    // later re-add cancels it) + every owned path any commit ever referenced
    val removedAt = scala.collection.mutable.Map.empty[String, Long]
    val referenced = scala.collection.mutable.Set.empty[String]
    gwLog.listVersions().foreach { v =>
      gwLog.readVersion(v).foreach {
        case r: graft.log.RemoveFile if owned(r.path) =>
          removedAt(r.path) = r.deletionTimestamp
        case a: AddFile if owned(a.path) =>
          referenced += a.path
          removedAt -= a.path
        case _ => ()
      }
    }
    var deleted = 0
    removedAt.foreach { case (p, removedTs) =>
      if (!live.contains(p) && removedTs < cutoff) {
        val path = new Path(p)
        if (fs.exists(path) && fs.delete(path, false)) deleted += 1
      }
    }
    // crash debris: data files in owned namespaces that no commit
    // references. mtime cannot distinguish true debris from an IN-FLIGHT
    // write (a sink batch written but not yet committed), so the sweep
    // applies a minimum age floor regardless of how short `retentionMs`
    // is — an uncommitted write older than the floor is a real crash.
    val debrisCutoff = math.min(cutoff,
      System.currentTimeMillis() - GwTable.DebrisMinAgeMs)
    presentDirs.foreach { dir =>
      val it = fs.listFiles(dir, /* recursive = */ true)
      while (it.hasNext) {
        val st = it.next()
        val p = st.getPath.toString
        val n = st.getPath.getName
        val isData = !n.startsWith(".") && !n.startsWith("_") && n.endsWith(".parquet")
        if (st.isFile && isData && !referenced.contains(p) && !live.contains(p) &&
          st.getModificationTime < debrisCutoff) {
          if (fs.delete(st.getPath, false)) deleted += 1
        }
      }
    }
    deleted
  }

  /** Commit history as a DataFrame (version, timestamp, operation, ...). */
  def history: DataFrame = {
    import spark.implicits._
    gwLog.history().map { case (v, ci) =>
      val c = ci.getOrElse(CommitInfo(0L, "UNKNOWN", "", 0L, 0L, isBlindAppend = false, ""))
      (v, c.timestamp, c.operation, c.mode, c.numFiles, c.numOutputBytes, c.isBlindAppend)
    }.toDF("version", "timestamp", "operation", "mode", "numFiles", "numOutputBytes", "isBlindAppend")
  }

  /** Reads go through the `gwdelta` connector so they inherit stats-based
    * file skipping on top of Catalyst's pushdown/pruning; the connector
    * resolves the snapshot exactly once per read (empty file sets included —
    * covered by GwDeltaSourceSpec). */
  private def asDF(version: Option[Long]): DataFrame = {
    val reader = spark.read.format("gwdelta")
    version.foreach(v => reader.option("versionAsOf", v))
    reader.load(tablePath)
  }
}

object GwTable {
  def forPath(spark: SparkSession, tablePath: String): GwTable = new GwTable(spark, tablePath)

  /** Minimum age before an UNREFERENCED engine-owned file counts as crash
    * debris for `vacuum` — must exceed the longest plausible gap between a
    * sink's parquet write and its log commit (tombstoned files are exempt:
    * a tombstone proves the write completed and was superseded). */
  val DebrisMinAgeMs: Long = 15L * 60 * 1000
}
