package graft.streaming

import graft.log.{Action, AddFile, CommitInfo, GwLog, Metadata, Protocol}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/**
 * Streaming append sink for the engine's transaction log: the `foreachBatch`
 * half of the pipeline — the gwdelta streaming SOURCE tails a table, this
 * writes one. Each micro-batch becomes exactly one commit (parquet files
 * under `<table>/_stream/<uuid>/` + `add` actions), so downstream consumers
 * — batch reads, time travel, `changesSince`, the streaming tail — see
 * atomic, per-batch versions. The first batch bootstraps the log
 * (protocol + metaData from the batch schema, CREATE TABLE).
 *
 * Usage: `df.writeStream.foreachBatch((b, _) => GwSink.append(b, path))` —
 * foreachBatch is Spark's idiomatic streaming-write escape hatch, and the
 * engine's commit is what provides the transactional boundary. At scale the
 * parquet write is the executors' work; the commit is one driver-side log
 * append, same as the indexer's.
 *
 * Exactly-once: pass the micro-batch id as `txnId`. A batch replayed after
 * a crash between sink write and stream checkpoint re-arrives with the SAME
 * id, and a replay can only re-deliver the LAST committed batch (earlier
 * ones are covered by the stream checkpoint), so comparing against the
 * latest commit's txnId is sufficient — the duplicate commit is skipped and
 * the original version returned. One readVersion of the log tail per batch,
 * no full log scan.
 */
object GwSink {

  /** Append one batch to the table at `tablePath`; returns the committed
    * version, or -1 if the batch was empty (no commit written). With
    * `txnId` set, a batch whose id equals the latest commit's txnId is
    * skipped (crash-replay idempotence) and its version returned. */
  def append(df: DataFrame, tablePath: String, txnId: Option[String] = None): Long = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    for (id <- txnId) {
      val log0 = GwLog.forTable(conf, tablePath)
      log0.listVersions().lastOption.foreach { latest =>
        val already = log0.readVersion(latest).exists {
          case ci: CommitInfo => ci.txnId == id
          case _ => false
        }
        if (already) return latest
      }
    }
    val outDir = new Path(tablePath, s"_stream/${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(outDir.toString)
    val fs = outDir.getFileSystem(conf)
    val files: Seq[AddFile] = fs.listStatus(outDir)
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith(".") && !n.startsWith("_") &&
          n.endsWith(".parquet") && st.getLen > 0
      }
      .flatMap { st =>
        val stats = graft.sources.SchemaProbe.readStats(conf, st.getPath.toString)
        // a zero-row batch still writes a footer-only part file — the same
        // empty-output filter the indexer applies (reference S4 semantics)
        val empty = stats.exists(_.contains("\"numRecords\":0"))
        if (empty) None
        else Some(AddFile(
          path = st.getPath.toString,
          size = st.getLen,
          modificationTime = st.getModificationTime,
          dataChange = true,
          stats = stats))
      }
      .toSeq
    if (files.isEmpty) { fs.delete(outDir, true); return -1L }
    val log = GwLog.forTable(conf, tablePath)
    val bootstrap = log.listVersions().isEmpty
    val now = System.currentTimeMillis()
    val head: Seq[Action] =
      if (bootstrap)
        Seq(Protocol(), Metadata(
          id = java.util.UUID.randomUUID().toString,
          schemaString = df.schema.json,
          createdTime = now))
      else Nil
    val info = CommitInfo(
      timestamp = now,
      operation = if (bootstrap) "CREATE TABLE" else "WRITE",
      mode = "Append",
      numFiles = files.size,
      numOutputBytes = files.map(_.size).sum,
      isBlindAppend = !bootstrap,
      txnId = txnId.getOrElse(java.util.UUID.randomUUID().toString))
    log.commit(head ++ files :+ info)
  }
}
