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
    initial: Scan,
    snapshot: Snapshot,
    initialCandidates: Seq[AddFile],
    rebuild: Seq[AddFile] => Scan)
  extends Scan with SupportsRuntimeFiltering with SupportsReportStatistics {

  @volatile private var current: Scan = initial
  @volatile private var planned: Seq[AddFile] = initialCandidates

  /** The wrapped batch scan as currently planned (test/gate observability). */
  def innerScan: Scan = current
  /** Files the scan will open after any runtime pruning (observability). */
  def plannedFiles: Seq[AddFile] = planned

  /** Every top-level atomic column of the scan's (column-pruned) output
    * is a legal runtime-filter target — the planner resolves these
    * against the scan relation's output, so declaring a pruned-away
    * column would fail analysis. Whether a given filter actually prunes
    * is decided per file by the harvested stats/blooms (absent stats keep
    * the file, never drop it). */
  override def filterAttributes(): Array[NamedReference] =
    current.readSchema().fields.collect {
      case f if GwRuntimeFilterTranslation.atomic(f.dataType) =>
        Expressions.column(f.name)
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

  // value equality over the CURRENT state (inner scan + planned file
  // set): two unfiltered scans of the same snapshot compare equal, so
  // Spark's exchange/scan reuse keeps working across self-joins; scans
  // diverged by different runtime filters correctly compare unequal
  override def equals(other: Any): Boolean = other match {
    case g: GwRuntimeFilteringScan =>
      g.innerScan == current &&
        g.plannedFiles.map(_.path) == planned.map(_.path)
    case _ => false
  }
  override def hashCode(): Int = current.hashCode()
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
 * external Scala types, and only kinds with a sound `Bound` encoding
 * translate — timestamps/dates are deliberately skipped (their runtime
 * encodings don't match the harvested stat encodings version-for-version,
 * and a wrong guess would prune files that match).
 */
object GwRuntimeFilterTranslation {

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
      bound(v).map(b => ColRange(a, Some(b), Some(b))).toSeq
    case GreaterThan(a, v) if flat(a) =>
      bound(v).map(b => ColRange(a, Some(b), None)).toSeq
    case GreaterThanOrEqual(a, v) if flat(a) =>
      bound(v).map(b => ColRange(a, Some(b), None)).toSeq
    case LessThan(a, v) if flat(a) =>
      bound(v).map(b => ColRange(a, None, Some(b))).toSeq
    case LessThanOrEqual(a, v) if flat(a) =>
      bound(v).map(b => ColRange(a, None, Some(b))).toSeq
    case In(a, vs) if flat(a) && vs.nonEmpty =>
      val bs = vs.toSeq.map(bound)
      if (bs.exists(_.isEmpty)) Nil
      else {
        val members = bs.flatten
        val sorted = members.sortWith((x, y) => Bound.cmp(x, y).exists(_ < 0))
        // mixed-kind member lists can't order soundly — no constraint
        if (!sorted.sliding(2).forall(p => p.size < 2 || Bound.cmp(p(0), p(1)).isDefined)) Nil
        else Seq(ColRange(a, sorted.headOption, sorted.lastOption,
          anyOf = if (members.length <= MaxInMembers) sorted else Nil))
      }
    case _ => Nil
  }

  private def flat(attr: String): Boolean =
    !attr.contains('.') && !attr.contains('`')

  private def bound(v: Any): Option[Bound] = v match {
    case null => None
    case f: java.lang.Float if f.isNaN || f.isInfinite => None
    case d: java.lang.Double if d.isNaN || d.isInfinite => None
    case n @ (_: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
              _: java.lang.Long | _: java.lang.Float | _: java.lang.Double) =>
      Some(Bound.Num(BigDecimal(n.toString)))
    case n: java.math.BigDecimal => Some(Bound.Num(BigDecimal(n)))
    case n: BigDecimal => Some(Bound.Num(n))
    case s: String => Some(Bound.Str(s))
    case _ => None
  }
}
