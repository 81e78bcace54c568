package graft.log

import java.util.concurrent.atomic.LongAdder

/**
 * Driver-side log-layer instrumentation (dev/profiling only — see
 * [[graft.ProfileQuery]]): wall-nanos and call counts for the operations
 * that make up a maintenance call's "driver gap" (time not covered by any
 * Spark job). Always-on LongAdders; the cost is a few nanoseconds per
 * event, invisible next to the filesystem work being measured.
 */
object LogMetrics {
  val snapshotReplayNanos = new LongAdder; val snapshotReplays = new LongAdder
  val snapshotCacheHits = new LongAdder
  val listNanos = new LongAdder; val lists = new LongAdder
  val readVersionNanos = new LongAdder; val readVersions = new LongAdder
  val checkpointWriteNanos = new LongAdder; val checkpointWrites = new LongAdder
  val checkpointReadNanos = new LongAdder; val checkpointReads = new LongAdder
  val harvestNanos = new LongAdder; val harvests = new LongAdder
  val checksumNanos = new LongAdder; val checksums = new LongAdder

  def timed[T](nanos: LongAdder, count: LongAdder)(body: => T): T = {
    val t0 = System.nanoTime()
    try body finally { nanos.add(System.nanoTime() - t0); count.add(1L) }
  }

  def reset(): Unit = Seq(snapshotReplayNanos, snapshotReplays,
    snapshotCacheHits, listNanos, lists, readVersionNanos, readVersions,
    checkpointWriteNanos, checkpointWrites, checkpointReadNanos,
    checkpointReads, harvestNanos, harvests, checksumNanos, checksums)
    .foreach(_.reset())

  def report(): String = {
    def s(n: LongAdder) = n.sum() / 1e9
    f"replay=${s(snapshotReplayNanos)}%.3fs/${snapshotReplays.sum()} " +
      f"(hits=${snapshotCacheHits.sum()}) list=${s(listNanos)}%.3fs/${lists.sum()} " +
      f"readV=${s(readVersionNanos)}%.3fs/${readVersions.sum()} " +
      f"cpW=${s(checkpointWriteNanos)}%.3fs/${checkpointWrites.sum()} " +
      f"cpR=${s(checkpointReadNanos)}%.3fs/${checkpointReads.sum()} " +
      f"harvest=${s(harvestNanos)}%.3fs/${harvests.sum()} " +
      f"crc=${s(checksumNanos)}%.3fs/${checksums.sum()}"
  }
}
