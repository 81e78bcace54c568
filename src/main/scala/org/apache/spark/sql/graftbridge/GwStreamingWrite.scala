package org.apache.spark.sql.graftbridge

import graft.log.AddFile
import java.util.UUID
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/**
 * V2 streaming write for gwdelta tables — what `df.writeStream.toTable(
 * "gw.ns.t")` (and `writeStream.format("gwdelta")` through a catalog table)
 * plans. Each epoch's rows land as parquet under
 * `<table>/_stream/<writeId>/<epochId>/` via per-task [[GwEpochFileWriter]]s
 * (Spark's own parquet OutputWriter, executor work), and the epoch commit is
 * ONE atomic log append through the same path as the V1 sink
 * ([[graft.streaming.GwSink.commitHarvested]]): txnId =
 * `"<queryId>/<epochId>"`, so a crash-replayed epoch re-arrives with the
 * same id and is skipped — exactly-once into the log. Only files reported
 * by committed tasks enter the commit; stray output from failed/speculative
 * attempts stays uncommitted under `_stream/` where `vacuum`'s debris rule
 * owns it.
 */
class GwStreamingWrite(
    spark: SparkSession,
    tablePath: String,
    info: LogicalWriteInfo) extends StreamingWrite {

  private val writeId = UUID.randomUUID().toString
  private def epochBase = s"$tablePath/_stream/$writeId"

  override def createStreamingWriterFactory(pinfo: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(
      spark, job, Map.empty[String, String], info.schema())
    new GwEpochWriterFactory(epochBase, info.schema(), factory,
      new SerializableConfiguration(job.getConfiguration))
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val written = messages.collect { case GwFilesWritten(ps) => ps }.flatten.toSet
    val epochDir = new Path(s"$epochBase/$epochId")
    // the shared harvesting rule (stats, zero-row drop), restricted to the
    // files committed tasks actually reported
    val files: Seq[AddFile] =
      if (written.isEmpty) Nil
      else graft.sources.SchemaProbe.harvestAddFiles(conf, epochDir, dataChange = true)
        .filter(f => written.contains(f.path) ||
          written.contains(new Path(f.path).toUri.getPath))
    graft.streaming.GwSink.commitHarvested(conf, tablePath, info.schema(), files,
      Some(s"${info.queryId()}/$epochId"))
    ()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val epochDir = new Path(s"$epochBase/$epochId")
    val fs = epochDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(epochDir)) { fs.delete(epochDir, true); () }
  }

  override def toString: String = s"GwStreamingWrite[$tablePath]"
}

/** Paths written by one committed task (this connector's commit message). */
case class GwFilesWritten(paths: Seq[String]) extends WriterCommitMessage

class GwEpochWriterFactory(
    epochBase: String,
    schema: StructType,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new GwEpochFileWriter(s"$epochBase/$epochId", partitionId, taskId, schema, factory, conf)
}

/** One parquet file per (task, epoch), created lazily on the first row so
  * empty partitions write nothing. */
class GwEpochFileWriter(
    dir: String,
    partitionId: Int,
    taskId: Long,
    schema: StructType,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration) extends DataWriter[InternalRow] {

  private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = _
  private var filePath: String = _
  private var closed = false

  private def ensure(): org.apache.spark.sql.execution.datasources.OutputWriter = {
    if (writer == null) {
      val attempt = new TaskAttemptID(
        new TaskID(new JobID("gwstream", 0), TaskType.MAP, partitionId),
        (taskId & 0x7fffffff).toInt)
      val ctx = new TaskAttemptContextImpl(conf.value, attempt)
      filePath = f"$dir/part-$partitionId%05d-${UUID.randomUUID()}${factory.getFileExtension(ctx)}"
      writer = factory.newInstance(filePath, schema, ctx)
    }
    writer
  }

  override def write(row: InternalRow): Unit = ensure().write(row)

  private def closeWriter(): Unit =
    if (writer != null && !closed) { writer.close(); closed = true }

  override def commit(): WriterCommitMessage = {
    closeWriter()
    GwFilesWritten(Option(filePath).toSeq)
  }

  override def abort(): Unit = {
    closeWriter()
    if (filePath != null) {
      val p = new Path(filePath)
      val fs = p.getFileSystem(conf.value)
      if (fs.exists(p)) { fs.delete(p, false); () }
    }
  }

  override def close(): Unit = closeWriter()
}
