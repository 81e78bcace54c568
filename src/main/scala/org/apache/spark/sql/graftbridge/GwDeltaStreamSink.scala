package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.streaming.Sink

/**
 * V1 streaming sink backing `writeStream.format("gwdelta").start(path)`:
 * the declarative face of [[graft.streaming.GwSink]] — one atomic log
 * commit per micro-batch, batchId as the commit txnId for crash-replay
 * idempotence.
 *
 * `addBatch`'s DataFrame carries the micro-batch's INCREMENTAL plan; like
 * Spark's own ForeachBatchSink, the already-computed result is pinned as an
 * RDD-backed batch plan before writing, so the parquet write does not
 * re-execute the source side of the plan.
 */
class GwDeltaStreamSink(tablePath: String) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val classic = data.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    val spark = classic.sparkSession.asInstanceOf[ClassicSession]
    val node = LogicalRDD.fromDataset(
      classic.queryExecution.toRdd, classic, isStreaming = false)
    val batchDf = Dataset.ofRows(spark, node)
    graft.streaming.GwSink.append(batchDf, tablePath, Some(s"batch-$batchId"))
    ()
  }

  override def toString: String = s"GwDeltaStreamSink[$tablePath]"
}
