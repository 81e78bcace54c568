package org.apache.spark.sql.graftbridge

import graft.log.{AddFile, GwLog, Metadata, RemoveFile}
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{LongType, StringType, StructType}

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
 *
 * With `option("readChangeFeed", "true")` the stream serves the row-level
 * CHANGE FEED instead: per version, insert-only commits emit their added
 * rows tagged `_change_type = 'insert'` and remove-only commits emit the
 * removed files' rows tagged `'delete'`, each with `_commit_version` —
 * pure file reads, so the micro-batch plan stays a valid streaming plan
 * (no joins/exceptAll). A commit carrying CHANGE-DATA files (DML on a
 * table with `graft.enableChangeDataFeed` — see [[graft.Cdc]]) serves
 * them directly, so rewrite and deletion-vector commits stream too. Only
 * on a NON-CDF table does such a commit stop the stream with guidance to
 * the batch API (`GwTable.rowChanges`), the same contract as Delta's CDF
 * without CDC files.
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
  private val cdf = params.get("readChangeFeed").exists(_.toBoolean)

  /** `startingVersion`: first log version the stream serves (skipping the
    * initial-snapshot read — the consumer declares it already holds state
    * up to N-1). Absent = initial snapshot (plain stream) / full history
    * (CDF). Applied only when nothing is consumed yet; a checkpointed
    * offset always wins. */
  private val startingVersion: Option[Long] = params.get("startingVersion")
    .map { v =>
      val n = v.toLong
      require(n >= 0, s"startingVersion must be >= 0, got $n")
      n
    }

  private def adjustStart(s: GwStreamOffset): GwStreamOffset =
    if (s.version >= 0) s
    else startingVersion.map(n => GwStreamOffset(n - 1)).getOrElse(s)

  override def schema: StructType =
    if (cdf) GwDeltaStreamSource.cdfSchema(streamSchema) else streamSchema

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
    if (cdf)
      // CDF admits whole versions (a commit is the change-feed unit; the
      // snapshot file-index slicing below is meaningless for a row diff)
      availableNowCap.orElse(log.latestVersion())
        .map(v => LongOffset(v): OffsetV2).orNull
    else GwStreamAdmission.nextOffset(log, adjustStart(GwStreamOffset.of(start)),
      limit, availableNowCap)

  override def reportLatestOffset(): OffsetV2 =
    log.latestVersion().map(v => LongOffset(v): OffsetV2).orNull

  /** Streaming-leaf relation over `paths` (isStreaming=true for
    * MicroBatchExecution), or an empty streaming LocalRelation. */
  /** Files are read under the PHYSICAL layout (column mapping); the
    * logical names surface through a projection — an unmapped table's
    * physicalSchema IS its logical schema, so the plain path is untouched. */
  private def streamingRelation(paths: Seq[String], sch: StructType): DataFrame = {
    val logical = graft.log.ColumnMapping.stripMeta(sch)
    if (paths.isEmpty)
      Dataset.ofRows(spark,
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(logical),
          Seq.empty, isStreaming = true))
    else {
      val phys = graft.log.ColumnMapping.physicalSchema(sch)
      val relation = DataSource(
        sparkSession = spark,
        className = "parquet",
        paths = paths,
        userSpecifiedSchema = Some(phys)).resolveRelation(checkFilesExist = false)
      val base = Dataset.ofRows(spark, LogicalRelation(relation, isStreaming = true))
      if (!graft.log.ColumnMapping.hasMapping(sch)) base
      else base.toDF(logical.fieldNames.toIndexedSeq: _*)
    }
  }

  /** Change-feed micro-batch for versions `(s, e]`: per-version tagged file
    * reads — see the class doc for the supported commit shapes. */
  private def cdfBatch(s: Long, e: Long): DataFrame = {
    var curMeta: Option[Metadata] =
      if (s < 0) None else log.snapshot(Some(s)).metadata
    val parts = ((s + 1) to e).flatMap { v =>
      val actions = log.readVersion(v)
      // property-only restatements (enabling CDF, constraints, clustering…)
      // keep row identity and pass through; a SCHEMA change stops the stream
      actions.collectFirst { case m: Metadata => m }.foreach { m =>
        val benign = v == 0 || curMeta.exists(c =>
          c.schemaString == m.schemaString &&
            c.partitionColumns == m.partitionColumns)
        if (!benign)
          throw new IllegalStateException(
            s"gwdelta CDF stream at $tablePath: version $v restates the " +
              "table's schema; row identity is undefined across schemas — " +
              "restart consumption from a full snapshot")
        curMeta = Some(m)
      }
      // a commit carrying CHANGE-DATA files (CDF-enabled DML) serves them
      // directly — the tagged rows are already materialized, so rewrite
      // and deletion-vector commits stream like any other
      val cdcs = actions.collect { case c: graft.log.CdcFile => c }
      if (cdcs.nonEmpty) {
        val withType = streamSchema.add(
          org.apache.spark.sql.types.StructField(graft.Cdc.ChangeTypeCol, StringType))
        Some(streamingRelation(cdcs.map(_.path), withType)
          .withColumn("_commit_version", lit(v)))
      } else {
      val adds = actions.collect { case a: AddFile if a.dataChange => a }
      val rms = actions.collect { case r: RemoveFile if r.dataChange => r.path }
      if (adds.exists(_.dv.isDefined))
        throw new IllegalStateException(
          s"gwdelta CDF stream at $tablePath: version $v asserts deletion " +
            "vectors; the position-level diff needs the batch API — " +
            "GwTable.rowChanges")
      if (adds.nonEmpty && rms.nonEmpty)
        throw new IllegalStateException(
          s"gwdelta CDF stream at $tablePath: version $v mixes added and " +
            "removed data files (a rewrite); the row-level diff needs the " +
            "batch API — GwTable.rowChanges")
      if (rms.nonEmpty) {
        // removed rows must be LIVE rows: a tombstoned file that carried a
        // deletion vector needs position reconciliation this path cannot do
        val prev = log.snapshot(Some(v - 1)).files.map(f => f.path -> f).toMap
        if (rms.exists(p => prev.get(p).exists(_.dv.isDefined)))
          throw new IllegalStateException(
            s"gwdelta CDF stream at $tablePath: version $v removes a file " +
              "carrying a deletion vector — use GwTable.rowChanges")
      }
      val tagged =
        if (adds.nonEmpty)
          Some(streamingRelation(adds.map(_.path), streamSchema)
            .withColumn("_change_type", lit("insert")))
        else if (rms.nonEmpty)
          Some(streamingRelation(rms, streamSchema)
            .withColumn("_change_type", lit("delete")))
        else None
      tagged.map(_.withColumn("_commit_version", lit(v)))
      }
    }
    parts.reduceOption(_ unionAll _)
      .getOrElse(streamingRelation(Nil, GwDeltaStreamSource.cdfSchema(streamSchema)))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val s = adjustStart(
      start.map(o => GwStreamOffset.of(o)).getOrElse(GwStreamOffset(-1L)))
    val e = GwStreamOffset.of(end)
    if (cdf) return cdfBatch(s.version, e.version)
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
    // a version range can be metadata-only (e.g. a compaction commit's
    // dataChange=false rewrites); the empty relation must still carry
    // isStreaming=true for MicroBatchExecution's sanity check
    streamingRelation(files.map(_.path), streamSchema)
  }

  override def stop(): Unit = ()
}

object GwDeltaStreamSource {
  /** Table schema + the change-feed metadata columns. */
  def cdfSchema(base: StructType): StructType =
    base.add("_change_type", StringType).add("_commit_version", LongType)
}
