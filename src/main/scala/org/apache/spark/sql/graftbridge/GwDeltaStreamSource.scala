package org.apache.spark.sql.graftbridge

import graft.log.{AddFile, GwLog, Metadata}
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
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
    tablePath: String) extends Source {

  private val spark = sqlContext.sparkSession.asInstanceOf[ClassicSession]
  private val log = GwLog.forTable(spark.sparkContext.hadoopConfiguration, tablePath)
  private val streamSchema: StructType = log.snapshot(None).schema

  override def schema: StructType = streamSchema

  override def getOffset: Option[OffsetV1] =
    log.latestVersion().map(v => LongOffset(v))

  private def versionOf(o: OffsetV1): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endV = versionOf(end)
    val files: Seq[AddFile] = start match {
      case None =>
        // initial batch: the live snapshot at endV. This V1 path reads
        // through a plain parquet relation with no position reconciliation,
        // so a snapshot holding deletion vectors must fail loudly instead
        // of serving deleted rows (the V2 catalog stream reconciles them;
        // compact() folds DVs away for this path)
        val snap = log.snapshot(Some(endV)).files
        val dvd = snap.count(_.dv.isDefined)
        if (dvd > 0)
          throw new IllegalStateException(
            s"gwdelta V1 stream at $tablePath: the initial snapshot has $dvd " +
              "file(s) carrying deletion vectors, which this path cannot " +
              "reconcile — run compact() on the table first, or stream " +
              "through the catalog (spark.readStream.table) instead")
        snap
      case Some(s) =>
        val startV = versionOf(s)
        val range = (startV + 1) to endV
        val actions = range.flatMap(v => log.readVersion(v))
        // ANY metaData action in the range is a restatement (appends never
        // carry one) — including a restart that captured the post-
        // restatement schema, or a restatement to an identical schema; the
        // table content was REPLACED, so an incremental append would
        // silently duplicate/corrupt the sink
        if (actions.exists(_.isInstanceOf[Metadata]))
          throw new IllegalStateException(
            s"gwdelta stream at $tablePath hit a schema restatement in versions " +
              s"(${startV}, $endV]: the table was replaced; restart the stream " +
              "from a fresh checkpoint to consume the restated snapshot")
        // skip DV re-assertions: a merge-on-read DELETE adds no new rows
        // (same contract as changesSince and the V2 stream)
        actions.collect { case a: AddFile if a.dataChange && a.dv.isEmpty => a }
    }
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
