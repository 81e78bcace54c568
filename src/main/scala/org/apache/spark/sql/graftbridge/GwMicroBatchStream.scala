package org.apache.spark.sql.graftbridge

import graft.log.{AddFile, GwLog, Metadata}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => OffsetV2, ReadLimit}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetTable}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * V2 streaming tail of a gwdelta table — what `spark.readStream.table("c.ns.t")`
 * resolves to on catalog tables (the V1 `GwDeltaStreamSource` serves the
 * path-based `format("gwdelta")` form; both share the same semantics):
 *
 *  - offsets are log versions (`LongOffset`, the same wire JSON as the V1
 *    source, so a checkpoint written by one form restarts under the other);
 *  - the first batch is the full live snapshot at the end version, then
 *    each batch reads exactly the `dataChange` files of `(start, end]` —
 *    a metadata diff, never a reprocess;
 *  - a schema restatement in a consumed range stops the stream (the table
 *    was REPLACED; an incremental append would corrupt the sink);
 *  - each batch's partitions come from a parquet V2 scan over just that
 *    batch's files, so vectorized reading and partition sizing behave
 *    exactly like a batch read of those files.
 */
class GwMicroBatchStream(
    spark: SparkSession,
    tablePath: String,
    streamSchema: StructType,
    readOptions: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {



  private val log = GwLog.forTable(spark.sparkContext.hadoopConfiguration, tablePath)

  /** Trigger.AvailableNow's pin: versions committed after the stream
    * started are left for the next run. */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(log.latestVersion().getOrElse(-1L))

  override def getDefaultReadLimit: ReadLimit =
    GwStreamAdmission.defaultLimit(k => Option(readOptions.get(k)))

  /** `startingVersion`: first version served, skipping the initial
    * snapshot (same contract as the V1 face; a checkpointed offset always
    * wins because Spark only asks for initialOffset on a fresh stream). */
  private val startingVersion: Option[Long] =
    Option(readOptions.get("startingVersion")).map { v =>
      val n = v.toLong
      require(n >= 0, s"startingVersion must be >= 0, got $n")
      n
    }

  /** -1 = nothing consumed: the next batch delivers the initial snapshot
    * (or starts at `startingVersion` when given). */
  override def initialOffset(): OffsetV2 =
    GwStreamOffset(startingVersion.map(_ - 1).getOrElse(-1L))

  override def latestOffset(): OffsetV2 =
    LongOffset(log.latestVersion().getOrElse(-1L))

  /** Rate-limited admission ([[GwStreamAdmission.nextOffset]]): the initial
    * snapshot is sliced by file index, tailing admits whole versions. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 =
    GwStreamAdmission.nextOffset(log, GwStreamOffset.of(start), limit,
      availableNowCap)

  override def reportLatestOffset(): OffsetV2 =
    LongOffset(log.latestVersion().getOrElse(-1L))

  override def deserializeOffset(json: String): OffsetV2 =
    GwStreamOffset.parse(json)

  override def commit(end: OffsetV2): Unit = ()

  override def stop(): Unit = ()

  private def filesFor(start: OffsetV2, end: OffsetV2): Seq[AddFile] =
    // deletion-vector re-assertions are skipped in incremental ranges (a
    // merge-on-read DELETE adds no NEW rows — same contract as
    // changesSince; without the guard the stream would re-emit the whole
    // re-asserted file); the initial snapshot serves DV'd files through
    // the MOR partitions below
    GwStreamAdmission.rangeFiles(log, tablePath,
      GwStreamOffset.of(start), GwStreamOffset.of(end))

  private def parquetScan(paths: Seq[String]): ParquetScan = {
    val options = new CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("path", tablePath))
    // PHYSICAL layout into the parquet reader (column mapping); the stream
    // reports logical names upward and rows are positional
    ParquetTable(s"gwdelta-stream:$tablePath", spark, options, paths,
      Some(graft.log.ColumnMapping.physicalSchema(streamSchema)),
      classOf[ParquetFileFormat])
      .newScanBuilder(options).build().asInstanceOf[ParquetScan]
  }

  override def planInputPartitions(start: OffsetV2, end: OffsetV2): Array[InputPartition] = {
    val files = filesFor(start, end)
    if (files.isEmpty) return Array.empty
    // only the INITIAL snapshot can contain DV'd files (incremental batches
    // skip DV re-assertions above): serve their LIVE rows through the same
    // per-file skipping partitions the batch MOR scan uses — a plain
    // parquet read would resurrect the deleted rows
    val (dvd, clean) = files.partition(_.dv.isDefined)
    val cleanParts: Array[InputPartition] =
      if (clean.isEmpty) Array.empty
      else parquetScan(clean.map(_.path)).toBatch.planInputPartitions()
    val dvParts: Array[InputPartition] =
      if (dvd.isEmpty) Array.empty
      else GwMorScan.groupDvPartitions(
        parquetScan(dvd.map(_.path)).toBatch.planInputPartitions(),
        dvd.map(f => graft.GwTable.uriKey(f.path) -> f.dv.get).toMap)
    cleanParts ++ dvParts
  }

  /** Partition readers only depend on the read schema and parquet options
    * (the file list rides inside each partition), so one factory serves
    * every batch. The MOR wrapper routes DV partitions (initial snapshot
    * only) through the position-skipping row reader and everything else —
    * columnar reads included — straight to the parquet factory. */
  override def createReaderFactory(): PartitionReaderFactory = {
    val parquet = parquetScan(Nil).toBatch.createReaderFactory()
    new GwMorReaderFactory(Some(parquet), parquet,
      new graft.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
  }
}

/** Scan wrapper that adds the streaming entry point to the pruning scan. */
class GwDeltaScan(
    inner: Scan,
    spark: SparkSession,
    tablePath: String,
    streamSchema: StructType,
    readOptions: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends Scan
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  /** The wrapped batch scan (plan observability in tests/gates). */
  def innerScan: Scan = inner

  // dynamic file pruning passes through to the wrapped batch scan (a
  // non-filtering inner scan reports no attributes, which disables the
  // planner's runtime-filter insertion entirely)
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    inner match {
      case f: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
        f.filterAttributes()
      case _ => Array.empty
    }
  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    inner match {
      case f: org.apache.spark.sql.connector.read.SupportsRuntimeFiltering =>
        f.filter(filters)
      case _ => ()
    }
  /** Forward the wrapped scan's statistics (parquet estimate or
    * log-exact GwScanStats) — a wrapper must not hide them or Spark
    * assumes "huge" and never broadcasts the table. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    inner match {
      case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
        s.estimateStatistics()
      case _ => new org.apache.spark.sql.connector.read.Statistics {
        override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.empty()
        override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
      }
    }
  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: org.apache.spark.sql.connector.read.Batch = inner.toBatch
  override def description(): String = inner.description()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    inner.columnarSupportMode()
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    inner.supportedCustomMetrics()
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GwMicroBatchStream(spark, tablePath, streamSchema, readOptions)

  // value equality over the inner scan (whose own equality covers the
  // file set) so Spark's exchange/scan reuse keeps working when the same
  // table is read twice in one plan
  override def equals(other: Any): Boolean = other match {
    case g: GwDeltaScan => g.innerScan == inner
    case _ => false
  }
  override def hashCode(): Int = inner.hashCode()
}
