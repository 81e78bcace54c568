package org.apache.spark.sql.graftbridge

import graft.log.Snapshot
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{NumericType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * gwdelta Table that file-skips with the transaction log's harvested footer
 * stats: when Catalyst pushes filters, the snapshot's live-file list is
 * pruned against each file's min/max BEFORE the parquet scan is built, so
 * excluded files are never opened (on top of the row-group pruning the
 * delegated parquet scan already does from the same filters). At 100 TB
 * this turns a selective time-travel query from "open every live file"
 * into "open the files the predicate can touch".
 *
 * Lives in the `org.apache.spark.sql` namespace because the catalyst
 * filter-pushdown hook (`SupportsPushDownCatalystFilters`) that file
 * sources use is `private[sql]`.
 */
class GwDeltaTable(
    tableName: String,
    spark: SparkSession,
    options: CaseInsensitiveStringMap,
    snapshot: Snapshot) extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = snapshot.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def partitioning(): Array[Transform] = Array.empty

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new GwPruningScanBuilder(tableName, spark, opts, snapshot)
}

class GwPruningScanBuilder(
    tableName: String,
    spark: SparkSession,
    options: CaseInsensitiveStringMap,
    snapshot: Snapshot)
  extends SupportsPushDownCatalystFilters with SupportsPushDownRequiredColumns {

  private var inner: ParquetScanBuilder = _
  private var required: Option[StructType] = None

  /** The file paths the scan was actually planned over (test observability). */
  def plannedPaths: Seq[String] =
    if (inner == null) snapshot.filePaths else inner.fileIndex.inputFiles.toSeq

  private def makeInner(paths: Seq[String]): ParquetScanBuilder = {
    val b = ParquetTable(tableName, spark, options, paths, Some(snapshot.schema),
      classOf[ParquetFileFormat]).newScanBuilder(options)
    required.foreach(b.pruneColumns)
    b
  }

  private def ensureInner(): ParquetScanBuilder = {
    if (inner == null) inner = makeInner(snapshot.filePaths)
    inner
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    val constraints = GwStatsPruning.ranges(filters)
    val paths =
      if (constraints.isEmpty) snapshot.filePaths
      else snapshot.filesForRanges(constraints).map(_.path)
    inner = makeInner(paths)
    inner.pushFilters(filters)
  }

  override def pushedFilters: Array[Predicate] = ensureInner().pushedFilters

  override def pruneColumns(s: StructType): Unit = {
    required = Some(s)
    if (inner != null) inner.pruneColumns(s)
  }

  override def build(): Scan = ensureInner().build()
}

/** Conservative filter -> per-column numeric range extraction: only shapes
  * that IMPLY a bound on a direct column are used; everything else prunes
  * nothing (pruning may keep too much, never too little). */
object GwStatsPruning {

  def ranges(filters: Seq[Expression]): Seq[(String, Double, Double)] =
    filters.flatMap(rangeOf)

  private def num(l: Literal): Option[Double] = l.dataType match {
    case _: NumericType =>
      // NaN compares false against every stats bound, which would prune
      // files that DO contain NaN rows (Spark's NaN = NaN is true) — treat
      // it as "no constraint"
      Option(l.value).map(_.toString.toDouble).filterNot(_.isNaN)
    case _ => None
  }

  private def rangeOf(e: Expression): Seq[(String, Double, Double)] = e match {
    case And(l, r) => rangeOf(l) ++ rangeOf(r)
    case EqualTo(a: AttributeReference, l: Literal) => num(l).map(v => (a.name, v, v)).toSeq
    case EqualTo(l: Literal, a: AttributeReference) => num(l).map(v => (a.name, v, v)).toSeq
    case GreaterThan(a: AttributeReference, l: Literal) => num(l).map(v => (a.name, v, Double.MaxValue)).toSeq
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) => num(l).map(v => (a.name, v, Double.MaxValue)).toSeq
    case LessThan(a: AttributeReference, l: Literal) => num(l).map(v => (a.name, Double.MinValue, v)).toSeq
    case LessThanOrEqual(a: AttributeReference, l: Literal) => num(l).map(v => (a.name, Double.MinValue, v)).toSeq
    case GreaterThan(l: Literal, a: AttributeReference) => num(l).map(v => (a.name, Double.MinValue, v)).toSeq
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) => num(l).map(v => (a.name, Double.MinValue, v)).toSeq
    case LessThan(l: Literal, a: AttributeReference) => num(l).map(v => (a.name, v, Double.MaxValue)).toSeq
    case LessThanOrEqual(l: Literal, a: AttributeReference) => num(l).map(v => (a.name, v, Double.MaxValue)).toSeq
    case _ => Nil
  }
}
