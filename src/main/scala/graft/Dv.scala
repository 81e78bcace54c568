package graft

import graft.log.{AddFile, Snapshot}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/**
 * Merge-on-read deletion-vector plumbing (see [[graft.log.DvDescriptor]]).
 *
 * A DV sidecar is one parquet file of `(dv_path: string, pos: long)` rows —
 * the deleted row POSITIONS per data file — written once per MOR commit
 * under `<table>/_dv/`. Readers reconcile by anti-joining (file, position)
 * pairs; positions come from `_metadata.row_index`, which Spark computes as
 * the PHYSICAL row index in the file (stable under row-group skipping), the
 * same identity Delta's deletion vectors use.
 *
 * Scale notes: a sidecar's size is proportional to the rows DELETED by that
 * commit, not the table; the V2 scan ships each file's positions with that
 * file's task only. Heavily-deleted files should be folded by `compact()`
 * (which reads live rows and drops the DV) — the library keeps
 * copy-on-write as the default for exactly this reason.
 */
object Dv {

  /** `_metadata.file_path` renders paths URL-ENCODED; the log stores raw
    * Hadoop strings. One mapping row per form, so joins hit either. */
  def pathMapping(spark: SparkSession, files: Seq[AddFile]): DataFrame = {
    import spark.implicits._
    files.flatMap { f =>
      val enc = new Path(f.path).toUri.toString
      Seq((f.path, f.path), (f.path, enc)).distinct
    }.toDF("dv_path", "enc_path")
  }

  private val sidecarSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("dv_path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("pos",
      org.apache.spark.sql.types.LongType)))

  /** All (dv_path, pos) rows that apply to `files`' CURRENT deletion
    * vectors: each file's positions are read from ITS OWN sidecar only, so
    * superseded sidecars (earlier DVs of the same file, still on disk for
    * time travel) contribute nothing. */
  def positionsDF(spark: SparkSession, files: Seq[AddFile]): DataFrame = {
    val dvd = files.filter(_.dv.isDefined)
    if (dvd.isEmpty)
      return spark.createDataFrame(java.util.Collections.emptyList[Row](), sidecarSchema)
    dvd.groupBy(_.dv.get.path).map { case (sidecar, group) =>
      val keep = group.map(_.path)
      spark.read.schema(sidecarSchema).parquet(sidecar)
        .filter(col("dv_path").isin(keep: _*))
    }.reduce(_ unionAll _)
  }

  /** Driver-side positions per data-file uriKey (V2 scan construction).
    * Memory = deleted rows of the SCANNED DV'd files. */
  def positionsByFile(spark: SparkSession, files: Seq[AddFile]): Map[String, Array[Long]] =
    positionsDF(spark, files).collect()
      .groupBy(r => GwTable.uriKey(r.getString(0)))
      .map { case (k, rows) => k -> rows.map(_.getLong(1)).sorted }

  /** LIVE rows of `files` under `schema`: raw parquet scan minus each DV'd
    * file's deleted positions (anti join on (encoded path, row_index)). The
    * anti join's build side is the deleted positions of the files READ —
    * bounded by the operation, broadcast under AQE at typical DV sizes. */
  def readLive(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      files: Seq[AddFile]): DataFrame = {
    if (files.isEmpty)
      return spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
    val raw = spark.read.schema(schema).parquet(files.map(_.path): _*)
    val dvd = files.filter(_.dv.isDefined)
    if (dvd.isEmpty) raw
    else {
      val del = positionsDF(spark, dvd)
        .join(broadcast(pathMapping(spark, dvd)), Seq("dv_path"))
        .select(col("enc_path"), col("pos"))
      raw.join(del,
        raw.col("_metadata.file_path") === del.col("enc_path") &&
          raw.col("_metadata.row_index") === del.col("pos"),
        "left_anti")
    }
  }

  /** Convenience: live rows of a snapshot. */
  def readLive(spark: SparkSession, snap: Snapshot): DataFrame =
    readLive(spark, snap.schema, snap.files)

  /** Persist one MOR commit's (dv_path, pos) rows as a single sidecar file
    * under `<table>/_dv/`; returns its path. */
  def writeSidecar(spark: SparkSession, tablePath: String, rows: DataFrame): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val stage = new Path(tablePath, s"_dv/stage-${java.util.UUID.randomUUID()}")
    rows.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val fs = stage.getFileSystem(conf)
    val part = fs.listStatus(stage).map(_.getPath)
      .find(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("."))
      .getOrElse(throw new IllegalStateException(s"no sidecar part file under $stage"))
    val target = new Path(tablePath, s"_dv/${java.util.UUID.randomUUID()}.parquet")
    fs.mkdirs(target.getParent)
    require(fs.rename(part, target), s"could not place DV sidecar at $target")
    fs.delete(stage, true)
    target.toString
  }

  /** Physical row count of a file from its harvested stats, if recorded —
    * lets a DV that covers every row upgrade to a plain remove. */
  def numRecords(f: AddFile): Option[Long] =
    f.stats.flatMap { s =>
      scala.util.Try {
        val n = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(s).path("numRecords")
        if (n.isNumber) Some(n.asLong) else None
      }.toOption.flatten
    }
}
