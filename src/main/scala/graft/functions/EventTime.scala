package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Type-adaptive event-time normalization for the events table's `ts`
 * column.
 *
 * The test fixture has shipped `ts` under two physical encodings: BIGINT
 * epoch-nanoseconds, and parquet `TIMESTAMP(MICROS, isAdjustedToUTC=false)`
 * — which Spark reads as `TIMESTAMP_NTZ`. Every event-time query funnels
 * through this one normalizer, so a future fixture regeneration degrades to
 * a single clear error (or just works) instead of N analysis failures.
 *
 * Canonical engine unit: **microseconds since epoch** — the precision of
 * Catalyst `TimestampType` and of DuckDB's `epoch_us`, which the oracles
 * use. For the NTZ encoding the wall-clock is interpreted as UTC (the
 * session must be UTC-pinned, asserted below), matching how DuckDB's
 * `epoch_us` treats a zoneless timestamp.
 */
object EventTime {

  /** SQL fragment computing micros-since-epoch from column `name` of
    * physical type `dt`. Exposed so call sites can compose it into larger
    * `expr(...)` strings (e.g. `"(<micros>) div 3600000000"`). */
  def microsSql(dt: DataType, name: String): String = dt match {
    case LongType         => s"($name div 1000)"                      // BIGINT epoch-nanos
    case TimestampNTZType => s"unix_micros(cast($name as timestamp))" // wall clock, session tz = UTC
    case TimestampType    => s"unix_micros($name)"
    case other => throw new IllegalArgumentException(
      s"event-time column `$name` has unsupported type $other " +
        "(expected BIGINT epoch-nanos, TIMESTAMP, or TIMESTAMP_NTZ)")
  }

  /** Micros-since-epoch Column for `df`'s `name` column (default `ts`),
    * adaptive to the column's physical type. */
  def micros(df: DataFrame, name: String = "ts"): Column = {
    val dt = df.schema(name).dataType
    requireUtcIfWallClock(df, dt, name)
    expr(microsSql(dt, name))
  }

  /** Render a micros-since-epoch value back into the physical type `dt` of
    * the source `ts` column — for synthesizing rows (e.g. a streaming flush
    * sentinel) that must match the source schema exactly. */
  def fromMicros(dt: DataType, us: Column): Column = dt match {
    case LongType         => (us * lit(1000L)).cast(LongType)
    case TimestampNTZType => timestamp_micros(us).cast(TimestampNTZType)
    case TimestampType    => timestamp_micros(us)
    case other => throw new IllegalArgumentException(
      s"unsupported event-time type $other")
  }

  /** Interpret a parquet-footer stat long for an event-time column as
    * micros: NANOS columns read as LongType and their stats stay raw nanos;
    * MICROS-timestamp stats are stored as raw micros (SchemaProbe.putStat). */
  def statToMicros(dt: DataType, statValue: Long): Long = dt match {
    case LongType => Math.floorDiv(statValue, 1000L)
    case _        => statValue
  }

  // The UTC assertion reads the LIVE conf on every call (no memo): the
  // check is plan-time — one conf lookup per query build, not per row —
  // and any caching scheme either keeps failing after the user fixes the
  // zone or keeps passing after a mid-life flip away from UTC, which is
  // exactly the misconfiguration the assertion exists to catch.
  private val UtcZones = Set("UTC", "Etc/UTC", "GMT", "Z")

  private def requireUtcIfWallClock(df: DataFrame, dt: DataType, name: String): Unit =
    if (dt == TimestampNTZType) {
      val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
      require(UtcZones.contains(tz),
        s"event-time column `$name` is TIMESTAMP_NTZ (zoneless wall-clock); interpreting " +
          s"it as an instant requires spark.sql.session.timeZone=UTC (found '$tz') so the " +
          "NTZ->instant cast matches the oracle's epoch_us semantics")
    }
}
