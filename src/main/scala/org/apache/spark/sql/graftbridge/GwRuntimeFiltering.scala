package org.apache.spark.sql.graftbridge

import graft.log.{AddFile, Bound, ColRange, Snapshot}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._

/**
 * Dynamic FILE pruning (the v2 runtime-filtering face of the gwdelta
 * scan): when this table is the probe side of a join whose build side is
 * selective, Spark's `PartitionPruning` rule plants a
 * `DynamicPruningSubquery` on the join key and — because this scan
 * declares `filterAttributes` — delivers the build side's key set here at
 * EXECUTION time as an `In` filter. The keys prune the snapshot's live
 * files through the SAME footer-stats + bloom machinery static predicates
 * use ([[Snapshot.filesForConstraints]]'s per-member `anyOf` checks), and
 * the inner parquet scan is rebuilt over the survivors, so excluded files
 * are never opened.
 *
 * At 100 TB this is the difference between "join scans the whole fact
 * table" and "join opens only the files the dim side's surviving keys can
 * touch" — semi-join reduction without any manual orchestration: a plain
 * `fact.join(dim.filter(...), key)` gets it from the planner.
 *
 * The wrapper changes NOTHING until a runtime filter arrives: every Scan
 * face delegates to the currently-planned inner scan, and `toBatch`
 * resolves the delegate at call time, so it is correct whichever order
 * Spark materializes the batch and delivers the filters in.
 */
class GwRuntimeFilteringScan(
    private val initial: Scan,
    snapshot: Snapshot,
    private val initialCandidates: Seq[AddFile],
    rebuild: Seq[AddFile] => Scan)
  extends Scan with SupportsRuntimeFiltering with SupportsReportStatistics {

  @volatile private var current: Scan = initial
  @volatile private var planned: Seq[AddFile] = initialCandidates

  /** The wrapped batch scan as currently planned (test/gate observability). */
  def innerScan: Scan = current
  /** Files the scan will open after any runtime pruning (observability). */
  def plannedFiles: Seq[AddFile] = planned

  /** Runtime-filter targets: only columns that can actually PRUNE —
    * partition columns, harvested-stats columns (all eligible columns
    * when the table declares no stats control; the declared set when
    * `graft.stats.columns` / `graft.stats.numIndexedCols` restricts the
    * harvest), and bloom columns — intersected with the scan's
    * (column-pruned) atomic output. Declaring a column here makes Spark
    * plan AND execute a build-side key collection (a driver-collected
    * IN-set) against it, so a column whose filters can never drop a file
    * is pure per-query overhead. Whether a given filter actually prunes
    * is still decided per file by the harvested stats/blooms (absent
    * stats keep the file, never drop it). */
  override def filterAttributes(): Array[NamedReference] = {
    val conf = snapshot.metadata.map(_.configuration).getOrElse(Map.empty)
    val parts = snapshot.metadata.map(_.partitionColumns).getOrElse(Nil)
      .map(_.toLowerCase).toSet
    val blooms = conf.get(graft.log.Bloom.ColumnsProp).toSeq
      .flatMap(_.split(",")).map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
    // None = no stats control declared = every eligible column harvests
    val stats = graft.streaming.GwSink.statsColumnFilter(conf,
      if (snapshot.metadata.isDefined) snapshot.schema else current.readSchema())
    def prunable(name: String): Boolean = {
      val n = name.toLowerCase
      parts.contains(n) || blooms.contains(n) || stats.forall(_.contains(n))
    }
    current.readSchema().fields.collect {
      case f if GwRuntimeFilterTranslation.atomic(f.dataType) && prunable(f.name) =>
        Expressions.column(f.name)
    }
  }

  override def filter(filters: Array[Filter]): Unit = {
    val constraints =
      filters.toSeq.flatMap(GwRuntimeFilterTranslation.toRanges)
    if (constraints.nonEmpty) {
      val keptPaths =
        snapshot.filesForConstraints(constraints).map(_.path).toSet
      val pruned = planned.filter(f => keptPaths.contains(f.path))
      if (pruned.length < planned.length) {
        planned = pruned
        current = rebuild(pruned)
      }
    }
  }

  override def readSchema(): StructType = current.readSchema()
  override def description(): String =
    s"GwRuntimeFiltering(${current.description()})"
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    current.columnarSupportMode()
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    current.supportedCustomMetrics()
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    current match {
      case s: SupportsReportStatistics => s.estimateStatistics()
      case _ => new org.apache.spark.sql.connector.read.Statistics {
        override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.empty()
        override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
      }
    }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      current.toBatch.planInputPartitions()
    override def createReaderFactory(): PartitionReaderFactory =
      current.toBatch.createReaderFactory()
  }

  // value equality over IMMUTABLE identity only (initial scan + initial
  // candidate set): two scans of the same snapshot compare equal, so
  // Spark's exchange/scan reuse keeps working across self-joins — and
  // because a runtime filter arriving via `filter()` mutates state that
  // equality deliberately ignores, a scan stored in a hash-keyed reuse
  // structure BEFORE the filter lands can still be looked up after.
  // Runtime-pruned divergence is not lost: the enclosing BatchScanExec's
  // own equality covers `runtimeFilters`, so differently-filtered scan
  // NODES never unify.
  override def equals(other: Any): Boolean = other match {
    case g: GwRuntimeFilteringScan =>
      g.initial == initial &&
        g.initialCandidates.map(_.path) == initialCandidates.map(_.path)
    case _ => false
  }
  override def hashCode(): Int =
    31 * initial.hashCode() + initialCandidates.map(_.path).hashCode()
}

/** Peel observability/feature wrappers off a V2 scan down to the
  * parquet/MOR core — plan assertions (gates and tests) target the core
  * scan whatever faces the table carries. */
object GwScanPeel {
  @annotation.tailrec
  def peel(s: Scan): Scan = s match {
    case w: GwDeltaScan => peel(w.innerScan)
    case w: GwRuntimeFilteringScan => peel(w.innerScan)
    case w: GwLogicalNamesScan => peel(w.innerScan)
    case other => other
  }
}

/**
 * V1 runtime `Filter` -> stats-pruning constraint translation. Total
 * failure is SAFE (an untranslatable filter prunes nothing); values are
 * external Scala types. Dates and timestamps translate onto the SAME
 * encodings the static pruning path and the stats harvest use — epoch
 * days for dates, micros for timestamps (via Spark's own
 * `DateTimeUtils`, the exact inverse of how Catalyst externalized the
 * value) — because `fact JOIN dim ON date_key` is the single most common
 * dynamic-pruning shape in a star schema. Timestamp constraints carry
 * `minStatsVersion = 2` exactly like the static path: v1 stats stored
 * raw millis, and a micros bound against a millis stat would prune files
 * that match.
 */
object GwRuntimeFilterTranslation {

  import org.apache.spark.sql.catalyst.util.DateTimeUtils

  /** Above this many IN members, per-member range/bloom checks cost more
    * driver time than they save — fall back to the [min, max] envelope. */
  private val MaxInMembers = 10000

  def atomic(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | BooleanType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  def toRanges(f: Filter): Seq[ColRange] = f match {
    case And(l, r) => toRanges(l) ++ toRanges(r)
    case EqualTo(a, v) if flat(a) =>
      bound(v).map { case (b, sv) => ColRange(a, Some(b), Some(b), sv) }.toSeq
    case GreaterThan(a, v) if flat(a) =>
      bound(v).map { case (b, sv) => ColRange(a, Some(b), None, sv) }.toSeq
    case GreaterThanOrEqual(a, v) if flat(a) =>
      bound(v).map { case (b, sv) => ColRange(a, Some(b), None, sv) }.toSeq
    case LessThan(a, v) if flat(a) =>
      bound(v).map { case (b, sv) => ColRange(a, None, Some(b), sv) }.toSeq
    case LessThanOrEqual(a, v) if flat(a) =>
      bound(v).map { case (b, sv) => ColRange(a, None, Some(b), sv) }.toSeq
    case In(a, vs) if flat(a) && vs.nonEmpty =>
      val bs = vs.toSeq.map(bound)
      if (bs.exists(_.isEmpty)) Nil
      else {
        val members = bs.flatten
        val sorted = members.map(_._1)
          .sortWith((x, y) => Bound.cmp(x, y).exists(_ < 0))
        // mixed-kind member lists can't order soundly — no constraint
        if (!sorted.sliding(2).forall(p => p.size < 2 || Bound.cmp(p(0), p(1)).isDefined)) Nil
        else Seq(ColRange(a, sorted.headOption, sorted.lastOption,
          members.map(_._2).max,
          anyOf = if (members.length <= MaxInMembers) sorted else Nil))
      }
    case _ => Nil
  }

  private def flat(attr: String): Boolean =
    !attr.contains('.') && !attr.contains('`')

  /** External runtime value -> (typed bound, minimum stats-encoding
    * version a file must carry for the bound to be trusted). */
  private def bound(v: Any): Option[(Bound, Int)] = v match {
    case null => None
    case f: java.lang.Float if f.isNaN || f.isInfinite => None
    case d: java.lang.Double if d.isNaN || d.isInfinite => None
    case n @ (_: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
              _: java.lang.Long | _: java.lang.Float | _: java.lang.Double) =>
      Some((Bound.Num(BigDecimal(n.toString)), 0))
    case n: java.math.BigDecimal => Some((Bound.Num(BigDecimal(n)), 0))
    case n: BigDecimal => Some((Bound.Num(n), 0))
    case s: String => Some((Bound.Str(s), 0))
    // DateType externalizes as java.sql.Date or java.time.LocalDate —
    // stats store epoch DAYS (same as Catalyst's internal Int days)
    case d: java.sql.Date =>
      Some((Bound.Num(BigDecimal(DateTimeUtils.fromJavaDate(d).toLong)), 0))
    case d: java.time.LocalDate =>
      Some((Bound.Num(BigDecimal(DateTimeUtils.localDateToDays(d).toLong)), 0))
    // TimestampType externalizes as java.sql.Timestamp or Instant;
    // TimestampNTZ as LocalDateTime — stats store MICROS under gwStatsV 2
    case t: java.sql.Timestamp =>
      Some((Bound.Num(BigDecimal(DateTimeUtils.fromJavaTimestamp(t))), 2))
    case t: java.time.Instant =>
      Some((Bound.Num(BigDecimal(DateTimeUtils.instantToMicros(t))), 2))
    case t: java.time.LocalDateTime =>
      Some((Bound.Num(BigDecimal(DateTimeUtils.localDateTimeToMicros(t))), 2))
    case _ => None
  }
}
