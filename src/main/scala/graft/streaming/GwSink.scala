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
 * id; only the last committed batch can be re-delivered, but OTHER writers
 * (a concurrent `compact()`/`vacuum()` maintenance commit) may have landed
 * after it — so the dedup check walks the log tail backwards over a bounded
 * window of recent commits rather than only the single latest one. The
 * window (64 versions) only needs to cover commits racing within one
 * micro-batch interval; the scan stays O(1) in table history.
 */
object GwSink {

  /** How many log-tail versions the txnId dedup check inspects. */
  private val DedupWindow = 64

  /** Append one batch to the table at `tablePath`; returns the committed
    * version, or -1 if the batch was empty (no commit written). With
    * `txnId` set, a batch whose id matches a recent commit's txnId is
    * skipped (crash-replay idempotence) and that version returned. */
  def append(df: DataFrame, tablePath: String, txnId: Option[String] = None): Long = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    for (id <- txnId) {
      val log0 = GwLog.forTable(conf, tablePath)
      val recent = log0.listVersions().takeRight(DedupWindow).reverse
      recent.foreach { v =>
        val already = log0.readVersion(v).exists {
          case ci: CommitInfo => ci.txnId == id
          case _ => false
        }
        if (already) return v
      }
    }
    val outDir = new Path(tablePath, s"_stream/${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(outDir.toString)
    val fs = outDir.getFileSystem(conf)
    val files: Seq[AddFile] =
      graft.sources.SchemaProbe.harvestAddFiles(conf, outDir, dataChange = true)
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
