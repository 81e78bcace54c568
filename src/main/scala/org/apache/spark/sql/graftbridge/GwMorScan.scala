package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types.StructType

/**
 * Merge-on-read V2 scan: serves a snapshot whose file set includes files
 * carrying deletion vectors ([[graft.log.DvDescriptor]]).
 *
 * Clean files flow through the inner parquet scan untouched. Each DV'd file
 * becomes ONE input partition holding all of its splits in offset order and
 * its own deleted positions (shipped with that task only); its reader wraps
 * the parquet row reader with a physical-position counter and a two-pointer
 * skip over the sorted positions. Two invariants make the counter correct:
 *
 *  - the DV-side parquet scan is built with NO pushed filters, so no row
 *    group is skipped and rows stream in physical order;
 *  - all splits of a file sit in one partition, offset-sorted, so the
 *    running count IS the file-absolute row index.
 *
 * Cost: DV'd files read row-based (no vectorized batches) and without
 * parquet pushdown until `compact()` folds their DVs away — the documented
 * merge-on-read trade. Spark re-evaluates every filter above the scan (the
 * parquet builder reports all data filters as residuals), so correctness
 * does not depend on pushdown.
 */
class GwMorScan(
    cleanScan: Option[Scan],
    dvScan: Scan,
    // uriKey(data-file path) -> sorted deleted positions
    positions: Map[String, Array[Long]]) extends Scan {

  override def readSchema(): StructType =
    cleanScan.map(_.readSchema()).getOrElse(dvScan.readSchema())
  override def description(): String =
    s"GwMorScan(dvFiles=${positions.size}, ${dvScan.description()})"

  /** Planned files across both sides (test/plan observability). */
  def inputFiles: Array[String] =
    (cleanScan.toSeq :+ dvScan).flatMap {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        p.fileIndex.inputFiles
      case _ => Nil
    }.toArray
  // mixed vectorized/row partitions are not expressible to BatchScanExec;
  // row-based everywhere while DVs exist
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    Scan.ColumnarSupportMode.UNSUPPORTED

  override def toBatch: Batch = new Batch {
    private lazy val cleanBatch = cleanScan.map(_.toBatch)
    private lazy val dvBatch = dvScan.toBatch

    override def planInputPartitions(): Array[InputPartition] = {
      val clean = cleanBatch.map(_.planInputPartitions()).getOrElse(Array.empty)
      // regroup the DV side: every split of one file -> one partition
      val byFile = dvBatch.planInputPartitions().flatMap {
        case fp: FilePartition => fp.files
        case other => throw new IllegalStateException(
          s"expected FilePartition from the parquet scan, got $other")
      }.groupBy(_.filePath.toPath.toString)
      val dv: Array[InputPartition] = byFile.toArray.zipWithIndex.map {
        case ((path, splits), i) =>
          val sorted = splits.sortBy(_.start)
          val deleted = positions.getOrElse(graft.GwTable.uriKey(path), Array.empty[Long])
          GwMorPartition(FilePartition(i, sorted), deleted): InputPartition
      }
      clean ++ dv
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new GwMorReaderFactory(
        cleanBatch.map(_.createReaderFactory()),
        dvBatch.createReaderFactory())
  }
}

/** One whole DV'd file (offset-sorted splits) + its deleted positions. */
case class GwMorPartition(inner: FilePartition, deleted: Array[Long])
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

class GwMorReaderFactory(
    cleanFactory: Option[PartitionReaderFactory],
    dvFactory: PartitionReaderFactory) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case m: GwMorPartition =>
        new GwDvSkippingReader(dvFactory.createReader(m.inner), m.deleted)
      case other =>
        cleanFactory
          .getOrElse(throw new IllegalStateException(
            s"no clean-side reader factory for $other"))
          .createReader(other)
    }

  override def supportColumnarReads(partition: InputPartition): Boolean = false
}

/** Row reader that drops the rows at `deleted` (sorted) physical positions;
  * `pos` counts every row the inner reader emits, which — see GwMorScan's
  * invariants — is the file-absolute row index. */
class GwDvSkippingReader(
    inner: PartitionReader[InternalRow],
    deleted: Array[Long]) extends PartitionReader[InternalRow] {
  private var pos = -1L
  private var di = 0

  override def next(): Boolean = {
    while (inner.next()) {
      pos += 1
      while (di < deleted.length && deleted(di) < pos) di += 1
      if (di >= deleted.length || deleted(di) != pos) return true
    }
    false
  }

  override def get(): InternalRow = inner.get()
  override def close(): Unit = inner.close()
}
