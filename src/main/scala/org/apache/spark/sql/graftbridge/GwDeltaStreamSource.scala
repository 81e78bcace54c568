package org.apache.spark.sql.graftbridge

import graft.log.{AddFile, GwLog, Metadata}
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

/**
 * Streaming tail of a gwdelta transaction log:
 * `spark.readStream.format("gwdelta").load(tablePath)`.
 *
 * Offsets are log versions. Each micro-batch reads exactly the files
 * committed in `(startVersion, endVersion]` — a metadata diff, no
 * reprocessing — so the generated tables feed Structured Streaming
 * pipelines directly (the auto-ingest story the reference delegates to
 * platform tooling). The first batch (no start offset) is the full live
 * snapshot at the end version, matching delta's initial-snapshot
 * semantics.
 *
 * A schema restatement inside a consumed range stops the stream with an
 * explicit error (same contract as delta): the new fingerprint REPLACES
 * the table, so a consumer must restart from the restated snapshot.
 */
class GwDeltaStreamSource(
    sqlContext: SQLContext,
    tablePath: String,
    parameters: Map[String, String] = Map.empty) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val spark = sqlContext.sparkSession.asInstanceOf[ClassicSession]
  private val log = GwLog.forTable(spark.sparkContext.hadoopConfiguration, tablePath)
  private val streamSchema: StructType = log.snapshot(None).schema
  private val params =
    org.apache.spark.sql.catalyst.util.CaseInsensitiveMap(parameters)

  override def schema: StructType = streamSchema

  override def getOffset: Option[OffsetV1] =
    log.latestVersion().map(v => LongOffset(v))

  /** Trigger.AvailableNow's pin (versions after stream start wait for the
    * next run). */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(log.latestVersion().getOrElse(-1L))

  override def getDefaultReadLimit: ReadLimit =
    GwStreamAdmission.defaultLimit(params.get)

  /** Rate-limited admission, shared with the V2 face
    * ([[GwStreamAdmission.nextOffset]]): the initial snapshot is sliced by
    * file index, tailing admits whole versions. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 =
    GwStreamAdmission.nextOffset(log, GwStreamOffset.of(start), limit,
      availableNowCap)

  override def reportLatestOffset(): OffsetV2 =
    log.latestVersion().map(v => LongOffset(v): OffsetV2).orNull

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val s = start.map(o => GwStreamOffset.of(o)).getOrElse(GwStreamOffset(-1L))
    val e = GwStreamOffset.of(end)
    // restatement stop + DV re-assertion skip live in rangeFiles (same
    // contract as changesSince and the V2 stream)
    val files: Seq[AddFile] = GwStreamAdmission.rangeFiles(log, tablePath, s, e)
    // initial-snapshot slices read through a plain parquet relation with no
    // position reconciliation, so a slice holding deletion vectors must
    // fail loudly instead of serving deleted rows (the V2 catalog stream
    // reconciles them; compact() folds DVs away for this path)
    val dvd = files.count(_.dv.isDefined)
    if (dvd > 0)
      throw new IllegalStateException(
        s"gwdelta V1 stream at $tablePath: the initial snapshot has $dvd " +
          "file(s) carrying deletion vectors, which this path cannot " +
          "reconcile — run compact() on the table first, or stream " +
          "through the catalog (spark.readStream.table) instead")
    if (files.isEmpty) {
      // a version range can be metadata-only (e.g. a compaction commit's
      // dataChange=false rewrites); the empty relation must still carry
      // isStreaming=true for MicroBatchExecution's sanity check
      Dataset.ofRows(spark,
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(streamSchema),
          Seq.empty, isStreaming = true))
    } else {
      // the leaf must carry isStreaming=true for MicroBatchExecution
      val relation = DataSource(
        sparkSession = spark,
        className = "parquet",
        paths = files.map(_.path),
        userSpecifiedSchema = Some(streamSchema)).resolveRelation(checkFilesExist = false)
      Dataset.ofRows(spark, LogicalRelation(relation, isStreaming = true))
    }
  }

  override def stop(): Unit = ()
}
