package org.apache.spark.sql.graftbridge

import graft.log.Snapshot
import java.util.UUID
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, LogicalWriteInfoImpl, PhysicalWriteInfo, RowLevelOperation, SupportsDelta, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * SQL `UPDATE` / `MERGE INTO` / `DELETE` for gwdelta tables as a
 * DELTA-BASED row-level operation (`SupportsDelta`) — the merge-on-read
 * strategy, selected by `spark.graft.mergeOnRead = true`.
 *
 * Where the group-based operation ([[GwRowLevelOperation]]) rewrites every
 * file containing a matching row IN FULL, this one rewrites NOTHING it
 * doesn't have to: Spark's delta rewrite plans each touched row as a
 * (operation, row-id, replacement) triple, the writer turns the deleted /
 * pre-update row identities into per-file DELETION-VECTOR bitmaps and the
 * inserted / post-update rows into fresh parquet files, and one log commit
 * re-asserts the touched files with grown DVs alongside the new files.
 * Untouched rows of candidate files never move — write cost tracks the
 * MATCHED rows, which is what survives a broad-predicate UPDATE at 100 TB.
 *
 * Row identity is ([[GwRowId.FileCol]], [[GwRowId.PosCol]]) — the file's
 * logged path and the row's physical index, served by [[GwRowIdScan]] and
 * identical to the positions [[graft.Dv]] stores. UPDATEs are represented
 * as DELETE + INSERT ([[representUpdateAsDeleteAndInsert]]), the natural
 * shape when the "update in place" target is an immutable parquet file.
 */
class GwDeltaRowLevelOperation(
    spark: SparkSession,
    tablePath: String,
    snapshot: Snapshot,
    cmd: RowLevelOperation.Command) extends RowLevelOperation with SupportsDelta {

  /** The operation's one scan builder: its planned file list is the
    * candidate set whose entries the commit verifies against the live
    * snapshot (scan and write share this instance). */
  @volatile private var idScan: Option[GwDeltaScanBuilder] = None

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"gwdelta MergeOnRead $cmd"

  override def rowId(): Array[NamedReference] = Array(
    org.apache.spark.sql.connector.expressions.Expressions.column(GwRowId.FileCol),
    org.apache.spark.sql.connector.expressions.Expressions.column(GwRowId.PosCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val b = new GwDeltaScanBuilder(s"gwdelta-mor-$cmd", spark, options, snapshot)
    idScan = Some(b)
    b
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new GwDeltaWrite(
        spark, tablePath, cmd.toString, info,
        () => idScan.map(_.plannedFiles).getOrElse(throw new IllegalStateException(
          s"$cmd delta write committed before its scan was planned — " +
            "no candidate files; refusing to commit blind deletion vectors")),
        readSnap = snapshot)
    }
}

/** Candidate scan for the delta operation: pushed filters prune the
  * snapshot's file list via partition values + harvested stats but stay
  * residual (the row-id position counter forbids data-level skipping);
  * `build()` serves the pruned candidates through [[GwRowIdScan]]. */
class GwDeltaScanBuilder(
    tableName: String,
    spark: SparkSession,
    options: CaseInsensitiveStringMap,
    snapshot: Snapshot)
  extends SupportsPushDownCatalystFilters with SupportsPushDownRequiredColumns {

  private var candidates: Seq[graft.log.AddFile] = snapshot.files
  private var required: StructType = snapshot.schema

  /** Exact snapshot entries the scan planned (DV state included) — the
    * commit's concurrent-mutation check runs against these. */
  def plannedFiles: Seq[graft.log.AddFile] = candidates

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val constraints = GwStatsPruning.ranges(filters)
    if (constraints.nonEmpty) candidates = snapshot.filesForConstraints(constraints)
    filters // all residual: candidate selection only, Spark re-filters above
  }

  override def pushedFilters: Array[Predicate] = Array.empty

  override def pruneColumns(s: StructType): Unit = required = s

  override def build(): Scan =
    GwRowId.buildScan(tableName, spark, options, snapshot, candidates, required)
}

/**
 * The `WriteDelta` write: task writers fold DELETE row-ids into per-file
 * position bitmaps and stream INSERT rows through Spark's own V2 parquet
 * write under `<table>/_dml/<uuid>` (created lazily — a delete-only task
 * opens no file). The driver's commit merges each touched file's new
 * bitmaps with its existing deletion vector IN EXECUTORS
 * ([[graft.GwTable.commitDeltaDml]]) and lands one atomic merge-on-read
 * commit: grown-DV re-assertions + harvested insert files.
 */
class GwDeltaWrite(
    spark: SparkSession,
    tablePath: String,
    operation: String,
    info: LogicalWriteInfo,
    scannedFiles: () => Seq[graft.log.AddFile],
    readSnap: Snapshot) extends DeltaWrite {

  private val outDir = new Path(tablePath, s"_dml/${UUID.randomUUID()}")

  // row-id field slots by NAME — don't assume the projection's order
  private val idSchema = {
    val s = info.rowIdSchema()
    require(s.isPresent, s"delta write for $operation carries no rowIdSchema")
    s.get()
  }
  private val fileIdx = idSchema.fieldIndex(GwRowId.FileCol)
  private val posIdx = idSchema.fieldIndex(GwRowId.PosCol)

  // a delete-only delta write (DELETE command) carries an EMPTY row schema
  // — there are no insert rows, so no inner parquet write exists at all
  private val hasInserts = info.schema().nonEmpty

  private def innerWrite: org.apache.spark.sql.connector.write.Write = {
    val opts = new java.util.HashMap[String, String](info.options())
    opts.put("path", outDir.toString)
    val map = new CaseInsensitiveStringMap(opts)
    ParquetTable("gw-write-delta", spark, map, Seq(outDir.toString),
      Some(info.schema()), classOf[ParquetFileFormat])
      .newWriteBuilder(LogicalWriteInfoImpl(info.queryId(), info.schema(), map,
        info.rowIdSchema(), info.metadataSchema()))
      .build()
  }

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    private val inner = if (hasInserts) Some(innerWrite.toBatch) else None

    override def createBatchWriterFactory(pinfo: PhysicalWriteInfo): DeltaWriterFactory =
      new GwDeltaWriterFactory(
        inner.map(_.createBatchWriterFactory(pinfo)), fileIdx, posIdx)

    override def useCommitCoordinator(): Boolean =
      inner.forall(_.useCommitCoordinator())

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val msgs = messages.map(_.asInstanceOf[GwDeltaTaskCommit])
      val conf = spark.sparkContext.hadoopConfiguration
      val adds = inner match {
        case Some(b) =>
          b.commit(msgs.flatMap(_.inner))
          graft.sources.SchemaProbe.harvestPartitioned(
            conf, outDir, dataChange = true, Nil,
            statsCols = graft.streaming.GwSink.statsColumnFilter(
              readSnap.metadata.map(_.configuration).getOrElse(Map.empty),
              readSnap.schema))
        case None => Nil
      }
      val deletes = msgs.flatMap(_.dvs).groupBy(_._1).toSeq.map {
        case (path, chunks) => (path, chunks.map(_._2).toSeq)
      }
      graft.GwTable.forPath(spark, tablePath)
        .commitDeltaDml(operation, scannedFiles(), deletes, adds,
          readSnap = Some(readSnap))
      ()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      inner.foreach(_.abort(
        messages.collect { case m: GwDeltaTaskCommit => m.inner }.flatten))
      val fs = outDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(outDir)) { fs.delete(outDir, true); () }
    }
  }

  override def description(): String = s"gwdelta WriteDelta($operation) -> $outDir"
}

/** Task commit: the inner parquet writer's message (absent for delete-only
  * tasks) + this task's per-file (logged path, serialized position bitmap,
  * cardinality) — compressed bitmaps, never raw position arrays. */
case class GwDeltaTaskCommit(
    inner: Option[WriterCommitMessage],
    dvs: Array[(String, Array[Byte], Long)]) extends WriterCommitMessage

class GwDeltaWriterFactory(
    innerFactory: Option[DataWriterFactory],
    fileIdx: Int,
    posIdx: Int) extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private var inner: DataWriter[InternalRow] = null
      private val deletes = new java.util.HashMap[String, GwPosBuffer]()

      override def delete(meta: InternalRow, id: InternalRow): Unit = {
        val path = id.getUTF8String(fileIdx).toString
        var buf = deletes.get(path)
        if (buf == null) { buf = new GwPosBuffer; deletes.put(path, buf) }
        buf.add(id.getLong(posIdx))
      }

      override def insert(row: InternalRow): Unit = {
        if (inner == null) inner = innerFactory.getOrElse(
          throw new IllegalStateException(
            "delta write received an insert row under an empty write schema"))
          .createWriter(partitionId, taskId)
        inner.write(row)
      }

      // unreachable under representUpdateAsDeleteAndInsert; keep the
      // semantics anyway: an in-place update IS delete old + insert new
      override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
        delete(meta, id)
        insert(row)
      }

      override def write(row: InternalRow): Unit = insert(row)

      override def commit(): WriterCommitMessage = {
        val innerMsg = Option(inner).map(_.commit())
        val it = deletes.entrySet().iterator()
        val dvs = Array.newBuilder[(String, Array[Byte], Long)]
        while (it.hasNext) {
          val e = it.next()
          val pos = e.getValue.sortedDistinct()
          dvs += ((e.getKey, graft.log.RoaringBitmapArray.serialize(pos), pos.length.toLong))
        }
        GwDeltaTaskCommit(innerMsg, dvs.result())
      }

      override def abort(): Unit = if (inner != null) inner.abort()
      override def close(): Unit = if (inner != null) inner.close()
    }
}

/** Growable primitive long buffer (no boxing on the delete hot path). */
class GwPosBuffer {
  private var arr = new Array[Long](16)
  private var n = 0

  def add(v: Long): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
    arr(n) = v
    n += 1
  }

  /** Sorted, de-duplicated contents (MERGE shuffles can route the same
    * row-id to a task twice only via plan bugs, but dedup is cheap). */
  def sortedDistinct(): Array[Long] = {
    val a = java.util.Arrays.copyOf(arr, n)
    java.util.Arrays.sort(a)
    var w = 0
    var i = 0
    while (i < a.length) {
      if (w == 0 || a(w - 1) != a(i)) { a(w) = a(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(a, w)
  }
}
