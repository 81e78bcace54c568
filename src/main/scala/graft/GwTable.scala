package graft

import graft.log.{CommitInfo, GwLog, Snapshot}
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
  def timestampAsOf(ts: Long): DataFrame = {
    val candidates = gwLog.history().collect {
      case (v, Some(ci)) if ci.timestamp <= ts => v
    }
    require(candidates.nonEmpty, s"No version at or before timestamp $ts for $tablePath")
    versionAsOf(candidates.max)
  }

  /** Incremental consumption: rows of files that are live in the LATEST
    * snapshot but were not part of the snapshot at `sinceVersion` — i.e.
    * everything a downstream pipeline still has to process after having
    * consumed up to `sinceVersion`. After a restatement every current file
    * is new by definition (the table was replaced), which is exactly the
    * reprocess-all signal a consumer needs. Metadata-only diff: no data is
    * read to compute the file set. */
  def changesSince(sinceVersion: Long): DataFrame = {
    val latest = gwLog.snapshot(None)
    val before = gwLog.snapshot(Some(sinceVersion)).files.map(_.path).toSet
    val added = latest.files.filterNot(f => before.contains(f.path))
    if (added.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], latest.schema)
    else
      spark.read.schema(latest.schema).parquet(added.map(_.path): _*)
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
    * file skipping on top of Catalyst's pushdown/pruning. */
  private def asDF(version: Option[Long]): DataFrame = {
    val snap = gwLog.snapshot(version)
    if (snap.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], snap.schema)
    else {
      val reader = spark.read.format("gwdelta")
      version.foreach(v => reader.option("versionAsOf", v))
      reader.load(tablePath)
    }
  }
}

object GwTable {
  def forPath(spark: SparkSession, tablePath: String): GwTable = new GwTable(spark, tablePath)
}
