package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/**
 * Structured Streaming surface over the `events` table.
 *
 * The reference's "streaming" is checkpointed incremental batch (its README
 * points users at auto-loader/DLT on the generated tables for true streams —
 * reference README.md:39-43); here the same event data is processed as a real
 * Structured Streaming job: file source -> event-time transforms ->
 * watermarked windowed aggregation / arbitrary stateful processing -> sink.
 *
 * `Trigger.AvailableNow` drains the source and terminates, which makes each
 * stream's result deterministic and equal to its batch equivalent — that
 * equivalence IS the driver's DuckDB-oracle check. At scale the same code
 * runs unbounded: the watermark bounds state, `mapGroupsWithState` state is
 * per-key and store-backed, and the file source becomes kafka/auto-ingest
 * without touching the transform graph.
 */
object StreamOps {

  private var streamSeq = 0
  private def nextName(): String = synchronized { streamSeq += 1; s"graft_stream_$streamSeq" }

  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    // the file stream source wants a directory to watch; stage the table
    // file into one (hard-linked, zero copy) — in production this is the
    // landing directory / kafka topic
    val stage = java.nio.file.Files.createTempDirectory("graft-stream")
    val target = stage.resolve("events.parquet")
    try java.nio.file.Files.createLink(target, java.nio.file.Paths.get(s"$dir/events.parquet"))
    catch { case _: Exception =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"), target)
    }
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema).parquet(stage.toString)
  }

  // ---------------------------------------------------------------- st01
  /** Watermarked tumbling-window aggregation: events per (hour, type).
    * Complete-mode memory sink so drained results equal the batch answer. */
  def st01WindowedCounts(spark: SparkSession, dir: String): DataFrame = {
    val name = nextName()
    val q = eventStream(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))
      .select(
        (unix_timestamp(col("window.start")) / 3600).cast("long").as("hour_bucket"),
        col("event_type"), col("n"), col("value_c"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  // ---------------------------------------------------------------- st02
  /** Arbitrary stateful processing via mapGroupsWithState: per-user session
    * summary (event count, distinct types, value total) — the custom-state
    * shape (KeyValueGroupedDataset) that windowed aggs can't express.
    * RocksDB state store: the HDFS-backed default re-snapshots the whole
    * store per batch (measured 2x slower here; at real state sizes it OOMs —
    * RocksDB is the 100 TB posture). */
  def st02StatefulSessions(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    val name = nextName()
    val q = eventStream(spark, dir)
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("value_c"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[(Long, Set[String], Long)]) =>
          val prev = state.getOption.getOrElse((0L, Set.empty[String], 0L))
          val next = rows.foldLeft(prev) { case ((n, types, v), (_, t, vc)) =>
            (n + 1, types + t, v + vc)
          }
          state.update(next)
          (userId, next._1, next._2.size, next._3)
      }
      .toDF("user_id", "n_events", "n_types", "value_c")
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // update-mode memory sink appends each batch's updates; AvailableNow may
    // run several micro-batches, so keep only the final state per key
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    spark.table(name)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  // ---------------------------------------------------------------- st03
  /** Gap-based sessionization via flatMapGroupsWithState (Append mode):
    * events more than 30 min apart start a new session; emits one summary
    * row per user. The flatMap shape (0..n output rows per group) is what
    * mapGroups can't express. */
  def st03Sessionize(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    val gapUs = 30L * 60 * 1000000
    val name = nextName()
    val q = eventStream(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[List[Long]]) =>
          // accumulate timestamps; AvailableNow drains in one pass per key,
          // so emit the final summary when the group is seen
          val all = (state.getOption.getOrElse(Nil) ++ rows.map(_._2)).sorted
          state.update(all)
          val sessionLengths = all.foldLeft(List.empty[Long] -> Long.MinValue) {
            case ((lens, prev), ts) =>
              if (prev == Long.MinValue || ts - prev > gapUs) (1L :: lens, ts)
              else ((lens.head + 1) :: lens.tail, ts)
          }._1
          Iterator((userId, sessionLengths.size.toLong, sessionLengths.max,
            all.size.toLong))
      }
      .toDF("user_id", "n_sessions", "max_session_events", "n_events")
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // append-mode emits once per micro-batch a key appears in; keep the
    // final (largest n_events) row per user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    spark.table(name)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st01_stream_window" -> st01WindowedCounts _,
    "st02_stream_state" -> st02StatefulSessions _,
    "st03_sessionize" -> st03Sessionize _,
  )

  /** Batch equivalents: AvailableNow drains the source, so the streaming
    * results must equal these exactly. */
  val oracles: Map[String, String] = Map(
    "st01_stream_window" ->
      """SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
        | count(*) AS n, sum(CAST(round(value*100) AS BIGINT)) AS value_c
        |FROM events GROUP BY 1, 2""".stripMargin,
    "st02_stream_state" ->
      """SELECT user_id, count(*) AS n_events,
        | count(DISTINCT event_type) AS n_types,
        | sum(CAST(round(value*100) AS BIGINT)) AS value_c
        |FROM events GROUP BY 1""".stripMargin,
    "st03_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        | g AS (SELECT user_id, us,
        |   CASE WHEN us - lag(us) OVER w > 1800000000 OR lag(us) OVER w IS NULL
        |        THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        | s AS (SELECT user_id, us,
        |   sum(new_s) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        | per_session AS (SELECT user_id, sid, count(*) AS len FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, max(len) AS max_session_events,
        | sum(len) AS n_events
        |FROM per_session GROUP BY 1""".stripMargin,
  )
}
