package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.functions.EventTime

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
 * runs unbounded: the watermark bounds state, stateful-op state is per-key,
 * O(1)-sized and store-backed (RocksDB), expired by event-time timeout, and
 * the file source becomes kafka/auto-ingest without touching the transform
 * graph.
 */
object StreamOps {

  private var streamSeq = 0
  private def nextName(): String = synchronized { streamSeq += 1; s"graft_stream_$streamSeq" }

  /** Hard-link `src` into `stage` under each of `names` (copy fallback for
    * filesystems without link support) — zero-copy staging for the
    * drain-mode streams. One shared helper so mtime/ordering behavior
    * cannot drift between the staging sites. */
  private[graft] def stageLinks(src: java.nio.file.Path,
      stage: java.nio.file.Path, names: Seq[String]): Unit =
    names.foreach { n =>
      val target = stage.resolve(n)
      try { java.nio.file.Files.createLink(target, src); () }
      catch { case _: Exception => java.nio.file.Files.copy(src, target); () }
    }

  /** Sentinel event type used to push the watermark past the last real
    * window so Append-mode queries flush everything on a drain run. Filtered
    * out of every query's input before any aggregation. In an unbounded
    * production run no sentinel is needed — later events advance the
    * watermark naturally. */
  private val SentinelType = "__graft_flush__"

  private def eventStream(spark: SparkSession, dir: String): DataFrame =
    eventStream(spark, dir, withSentinel = false)

  /** Stage the events table into a watched directory (hard-linked, zero
    * copy — in production this is the landing directory / kafka topic).
    *
    * With `withSentinel`, also stage one far-future flush event: after the
    * data batch the watermark advances past every real window, and the
    * trailing no-data micro-batch (which AvailableNow runs before
    * terminating) finalizes and emits all remaining state. */
  private def eventStream(spark: SparkSession, dir: String, withSentinel: Boolean): DataFrame = {
    val stage = java.nio.file.Files.createTempDirectory("graft-stream")
    stageLinks(java.nio.file.Paths.get(s"$dir/events.parquet"), stage,
      Seq("events.parquet"))
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val tsType = batch.schema("ts").dataType
    if (withSentinel) {
      // max event time (micros) from the parquet footer (no data scan); fall
      // back to a full aggregate only if the footer carries no usable stats.
      // Footer encoding is type-dependent: raw nanos for BIGINT-nanos ts,
      // raw micros for TIMESTAMP(MICROS) — EventTime.statToMicros adapts.
      val maxUs = graft.sources.SchemaProbe
        .readStats(spark.sessionState.newHadoopConf(), s"$dir/events.parquet")
        .flatMap { json =>
          scala.util.Try {
            val n = new com.fasterxml.jackson.databind.ObjectMapper()
              .readTree(json).path("maxValues").path("ts")
            if (n.isNumber) Some(EventTime.statToMicros(tsType, n.asLong)) else None
          }.toOption.flatten
        }
        .getOrElse(batch.agg(max(EventTime.micros(batch))).head().getLong(0))
      val tmp = java.nio.file.Files.createTempDirectory("graft-sentinel")
      batch.limit(1)
        // the flush margin must exceed (longest window span + watermark
        // delay) across every sentinel query, else the final window's end
        // can sit beyond the drained watermark and Append never emits it
        // (st08's 4h windows with a 1h delay need > 5h; 26h also covers a
        // future daily window). Data-dependent: maxTs mod windowSpan decides
        // how much of the span the margin must bridge.
        .withColumn("ts",
          EventTime.fromMicros(tsType, lit(maxUs + 26L * 3600L * 1000000L)))
        .withColumn("event_type", lit(SentinelType))
        .withColumn("user_id", lit(-1L))
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, stage.resolve("zz_sentinel.parquet"))
      tmp.toFile.listFiles().foreach(_.delete()); tmp.toFile.delete()
    }
    spark.readStream.schema(batch.schema).parquet(stage.toString)
  }

  /** Derive the canonical `event_time` column (TimestampType, micro
    * precision) from `ts`, whatever the fixture's physical encoding —
    * BIGINT nanos or TIMESTAMP(_NTZ) micros (see EventTime). */
  private def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time", timestamp_micros(EventTime.micros(df)))

  /** Run `body` with the streaming state confs set, restoring the caller's
    * previous settings afterwards (these are session confs; mutating them
    * permanently would leak into unrelated queries).
    *
    *  - RocksDB state store: the HDFS-backed default re-snapshots the whole
    *    store per batch (measured 2x slower here; at real state sizes it
    *    OOMs — RocksDB is the 100 TB posture).
    *  - shuffle partitions = 8 for the stateful exchange: a stateful op
    *    instantiates one state store per shuffle partition per micro-batch,
    *    so partitions are sized to the state load (stream batches), not to
    *    the batch-query default — the standard streaming sizing rule. The
    *    partition count is baked into each query's (ephemeral) checkpoint,
    *    so scoping it per-drain is safe here; a production job would pick
    *    its own value once at first start. */
  private def withRocksDb[A](spark: SparkSession)(body: => A): A = {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val partKey = "spark.sql.shuffle.partitions"
    // Changelog checkpointing (r13): per batch, upload the CHANGELOG of
    // the store instead of a full RocksDB snapshot — the documented
    // at-scale posture for RocksDB state stores (snapshot cost becomes
    // periodic + amortized instead of per-batch per-partition).
    val clogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prevProv = spark.conf.getOption(provKey)
    val prevPart = spark.conf.getOption(partKey)
    val prevClog = spark.conf.getOption(clogKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(partKey, "8")
    spark.conf.set(clogKey, "true")
    try body
    finally {
      Seq((provKey, prevProv), (partKey, prevPart), (clogKey, prevClog))
        .foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
    }
  }

  // ---------------------------------------------------------------- st01
  /** Watermarked tumbling-window aggregation: events per (hour, type), in
    * production shape — Append mode, so each window is emitted exactly once
    * when the watermark finalizes it and its state is then dropped. State
    * and sink are O(open windows), not O(all windows ever), which is what
    * makes this run unbounded. The drain-time sentinel (see `eventStream`)
    * stands in for the later events that advance the watermark in a real
    * deployment. */
  def st01WindowedCounts(spark: SparkSession, dir: String): DataFrame = withRocksDb(spark) {
    val name = nextName()
    // Sentinel rows must NOT be filtered before the aggregation: Catalyst
    // pushes such a predicate below the watermark node into the parquet
    // scan, whose footer stats then prune the sentinel files entirely — so
    // the watermark never advances. They group into their own (window,
    // SentinelType) rows instead and are dropped from the OUTPUT below.
    val q = withEventTime(eventStream(spark, dir, withSentinel = true))
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
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    if (sys.env.contains("GRAFT_STREAM_DEBUG"))
      q.recentProgress.foreach(p => println(
        s"DEBUG batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")} " +
          s"sink=${p.sink.numOutputRows}"))
    spark.table(name).filter(!(col("event_type") <=> lit(SentinelType)))
  }

  // ---------------------------------------------------------------- st02
  /** Arbitrary stateful processing via mapGroupsWithState: per-user session
    * summary (event count, distinct types, value total) — the custom-state
    * shape (KeyValueGroupedDataset) that windowed aggs can't express.
    * State is O(distinct event types) per key. NoTimeout is deliberate:
    * this op computes LIFETIME per-user totals, so state lives as long as
    * the key does — the same posture as any update-mode aggregation keyed
    * on an unbounded id. A deployment that only needs recent activity
    * should key state eviction with EventTimeTimeout the way st03 does. */
  def st02StatefulSessions(spark: SparkSession, dir: String): DataFrame = withRocksDb(spark) {
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
          (userId, next._1, next._2.size.toLong, next._3)
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
    * events more than 30 min apart start a new session.
    *
    * State per user is a constant-size carry
    * `(lastUs, curLen, nSessions, maxLen, total)` — NOT the raw timestamps —
    * so state size is independent of events-per-user. Each invocation folds
    * the batch's rows (sorted within the batch; cross-batch order is what
    * the watermark guarantees in production) into the carry and emits the
    * running per-user summary; the event-time timeout fires once the
    * watermark passes `lastTs + gap`, emitting the final summary and
    * clearing the state, which bounds state lifetime for inactive users. */
  def st03Sessionize(spark: SparkSession, dir: String): DataFrame = withRocksDb(spark) {
    import spark.implicits._
    val gapUs = 30L * 60 * 1000000
    val name = nextName()
    // sentinels keep flowing to the stateful op (see st01 note on filter
    // pushdown vs the watermark); they carry user_id = -1 and their "user"
    // summary is dropped from the output below
    val src = withEventTime(eventStream(spark, dir, withSentinel = true))
      .withWatermark("event_time", "30 minutes")
    val q = src
      // keep the watermarked event_time column in the typed view: the
      // analyzer requires it present for EventTimeTimeout
      .select(col("user_id"), EventTime.micros(src).as("us"), col("event_time"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed lastTs+gap: the user's current session is
            // closed; emit the final summary and free the state
            val (_, _, ns, mx, tot) = state.get
            state.remove()
            Iterator((userId, ns, mx, tot))
          } else {
            val sorted = rows.map(_._2).toArray
            java.util.Arrays.sort(sorted)
            val st0 = state.getOption.getOrElse((Long.MinValue, 0L, 0L, 0L, 0L))
            val st1 = sorted.foldLeft(st0) {
              case ((last, cur, ns, mx, tot), ts) =>
                if (last == Long.MinValue || ts - last > gapUs)
                  (ts, 1L, ns + 1, math.max(mx, 1L), tot + 1)
                else
                  (ts, cur + 1, ns, math.max(mx, cur + 1), tot + 1)
            }
            state.update(st1)
            // expire once the watermark proves no event can extend the
            // current session (must stay above the current watermark)
            val timeoutMs = math.max(st1._1 / 1000 + gapUs / 1000 + 1,
              state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(timeoutMs)
            Iterator((userId, st1._3, st1._4, st1._5))
          }
      }
      .toDF("user_id", "n_sessions", "max_session_events", "n_events")
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // one summary row per (user, batch-seen) + one on timeout; keep the
    // final (largest n_events) row per user, and drop the sentinel "user"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    spark.table(name)
      .filter(!(col("user_id") <=> lit(-1L)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  // ---------------------------------------------------------------- st04
  /** Native `session_window` gap sessionization: one row per closed
    * session, emitted exactly once when the watermark passes the session's
    * end + gap (Append mode). This is the declarative sibling of st03 —
    * Catalyst manages merge/expiry state, so it's the first choice when
    * per-session aggregates are enough and custom carry state (st03) isn't
    * needed. Spark merges an event into a session iff it arrives strictly
    * inside lastEvent + gap; the oracle encodes the same boundary (a gap of
    * exactly 30min starts a new session). */
  def st04SessionWindow(spark: SparkSession, dir: String): DataFrame = withRocksDb(spark) {
    val name = nextName()
    val q = withEventTime(eventStream(spark, dir, withSentinel = true))
      .withWatermark("event_time", "30 minutes")
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))
      .select(col("user_id"),
        expr("unix_micros(session_window.start)").as("session_start_us"),
        col("n_events"), col("value_c"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the sentinel's own (never-finalized) session stays in state; its user
    // is filtered from the output either way
    spark.table(name).filter(!(col("user_id") <=> lit(-1L)))
  }

  // ---------------------------------------------------------------- st05
  /** Stream-stream interval join: each purchase joins the signups of the
    * same user that happened up to 24h BEFORE it. Both sides are
    * watermarked and the join condition bounds event-time distance, so
    * Spark expires join state once the watermark passes `signup + 24h` —
    * the state-bounded shape; an unconstrained stream-stream join would
    * keep every row forever. Inner join: every match is emitted exactly
    * once, so the drained result equals the batch join. */
  def st05StreamJoin(spark: SparkSession, dir: String): DataFrame = withRocksDb(spark) {
    val name = nextName()
    val src = withEventTime(eventStream(spark, dir))
    val purchases = src
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("event_time").as("p_time"))
      .withWatermark("p_time", "1 hour")
    val signups = src
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("s_id"),
        col("event_time").as("s_time"))
      .withWatermark("s_time", "1 hour")
    val q = purchases.join(signups,
      col("p_user") === col("s_user") &&
        col("p_time") >= col("s_time") &&
        col("p_time") <= col("s_time") + expr("INTERVAL 24 HOURS"))
      .select(col("p_id"), col("s_id"), col("p_user").as("user_id"),
        (expr("unix_micros(p_time)") - expr("unix_micros(s_time)")).as("wait_us"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  // ---------------------------------------------------------------- st09
  /** Watermarked stream-stream LEFT OUTER join: every signup emits — paired
    * with each purchase in its following 24 hours, or once with nulls if no
    * purchase arrives before the watermark closes the join window. Unlike
    * the inner join (st05), the null row can only be emitted when the
    * watermark PROVES no match can still arrive, so state eviction and
    * result completeness ride the same clock: buffered left rows older than
    * (watermark - 24h - delay) flush as unmatched and drop from the store.
    * The sentinel flows through BOTH side filters (then out of the result)
    * so the drain advances the watermark the way later traffic would in an
    * unbounded run. */
  def st09StreamOuterJoin(spark: SparkSession, dir: String): DataFrame = withRocksDb(spark) {
    val name = nextName()
    val src = withEventTime(eventStream(spark, dir, withSentinel = true))
    val signups = src
      .filter(col("event_type") === "signup" || col("event_type") === SentinelType)
      .select(col("user_id").as("s_user"), col("event_id").as("s_id"),
        col("event_time").as("s_time"))
      .withWatermark("s_time", "1 hour")
    val purchases = src
      .filter(col("event_type") === "purchase" || col("event_type") === SentinelType)
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("event_time").as("p_time"))
      .withWatermark("p_time", "1 hour")
    val q = signups.join(purchases,
      col("s_user") === col("p_user") &&
        col("p_time") >= col("s_time") &&
        col("p_time") <= col("s_time") + expr("INTERVAL 24 HOURS"),
      "leftOuter")
      .select(col("s_id"), col("s_user").as("user_id"), col("p_id"),
        when(col("p_id").isNull, 0L).otherwise(1L).as("matched"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).filter(col("user_id") =!= -1L)
  }

  // ---------------------------------------------------------------- st06
  /** Streaming exact dedup via `dropDuplicatesWithinWatermark`: the staged
    * source delivers every event TWICE (two links of the same file, one file
    * per micro-batch), modeling an at-least-once upstream (kafka replay,
    * file re-delivery); the dedup emits exactly one copy per event_id.
    * Unlike `dropDuplicates` — whose key state grows forever — dedup state
    * here holds only keys younger than the watermark delay and is evicted as
    * the watermark advances, so state is O(keys per delay window): the shape
    * that runs unbounded. A duplicate older than the watermark is dropped as
    * late data before the operator, which for dedup is the same outcome. */
  def st06StreamDedup(spark: SparkSession, dir: String): DataFrame = withRocksDb(spark) {
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft-stream-dup")
    stageLinks(src, stage, Seq("a_events.parquet", "b_events.parquet"))
    val schema = spark.read.parquet(src.toString).schema
    // parquet sink, not memory: the memory sink materializes the full O(N)
    // deduped stream on the driver, which both breaks at scale and makes
    // the bench time the driver copy instead of the operator — executors
    // write the sink files here, exactly like production
    val out = java.nio.file.Files.createTempDirectory("graft-st06-out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-st06-cp").toString
    val deduped = withEventTime(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString))
      .withWatermark("event_time", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("value_c"),
        EventTime.micros(deduped).as("us"))
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(out)
  }

  // ---------------------------------------------------------------- st07
  /** Stream-static broadcast join: each event is enriched with its user's
    * market segment from a STATIC dimension table. Stateless — no
    * watermark, no state store, rows emitted as they arrive; the static
    * side is re-executed per micro-batch and broadcast, so the unbounded
    * stream side never shuffles — the standard enrichment shape at any
    * scale. Note a plain parquet read pins its FILE LISTING at plan time
    * (only the listed files are re-read each batch); a dimension that
    * gains/loses files needs a catalog table or a restarted query. */
  def st07StreamStaticJoin(spark: SparkSession, dir: String): DataFrame = {
    val customers = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    // parquet sink for the same reason as st06: the enriched stream is
    // O(N) and must land on executors, not the driver
    val out = java.nio.file.Files.createTempDirectory("graft-st07-out").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-st07-cp").toString
    val q = eventStream(spark, dir)
      .join(broadcast(customers), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_mktsegment"),
        round(col("value") * 100).cast("long").as("value_c"))
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(out)
  }

  // ---------------------------------------------------------------- st08
  /** Sketch state in streaming aggregation: per (4h window, event type),
    * KMV (bottom-k) distinct users — the state-store entry per open window
    * is a fixed-size sketch instead of a distinct-user set, which is what
    * keeps windowed COUNT(DISTINCT) viable unbounded (exact distinct state
    * grows with cardinality; Append mode + watermark still bound the number
    * of open windows). KMV insert/merge is commutative, associative AND
    * idempotent over an explicit cross-engine md5-prefix hash, so the
    * drained result equals the batch aggregate EXACTLY (asserted in
    * StreamSpec) and the DuckDB oracle replays the estimate bit-for-bit —
    * unlike the prior HLL flavor, whose register state only Spark can
    * reproduce. k=64: estimator path exercised at sf0.01 cardinalities. */
  def st08StreamSketch(spark: SparkSession, dir: String): DataFrame = withRocksDb(spark) {
    import graft.functions.KmvDistinctAgg
    val name = nextName()
    val q = withEventTime(eventStream(spark, dir, withSentinel = true))
      .withColumn("__h", KmvDistinctAgg.hash60(col("user_id")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "4 hours"), col("event_type"))
      .agg(KmvDistinctAgg(col("__h"), 64).as("nd_users_kmv"),
        count(lit(1)).as("n"))
      .select(
        (unix_timestamp(col("window.start")) / 14400).cast("long").as("win_bucket"),
        col("event_type"), col("nd_users_kmv"), col("n"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).filter(!(col("event_type") <=> lit(SentinelType)))
  }

  // ---------------------------------------------------------------- st10
  /** Streaming UPSERT — the production pattern for maintaining a serving
    * table from a stream (Delta's streaming-upsert recipe): an Update-mode
    * per-user aggregation emits only the user rows each micro-batch
    * changed, and `foreachBatch` MERGEs them into a gwdelta table — one
    * atomic log commit per batch, matched users updated in place, new
    * users inserted. The staged source is split into two files
    * (`maxFilesPerTrigger = 1` → two micro-batches), so users spanning
    * both halves exercise the matched-update path; the in-gate history
    * assertion pins that a real MERGE commit happened. The final table
    * equals the one-shot batch aggregate whatever the batch order —
    * Update-mode state carries cumulative values, and MERGE is
    * last-writer-wins per key.
    *
    * 100 TB posture: per-batch work is one aggregation delta + one MERGE
    * whose match pass prunes to the files holding touched keys; the
    * serving table is never rewritten wholesale. */
  def st10StreamUpsert(spark: SparkSession, dir: String): DataFrame = withRocksDb(spark) {
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val stage = java.nio.file.Files.createTempDirectory("graft-st10-src").toString
    batch.repartition(2, col("event_id")).write.mode("overwrite").parquet(stage)
    val tbl = java.nio.file.Files.createTempDirectory("graft-st10-tbl")
      .resolve("user_aggs").toString
    val upsert: (DataFrame, Long) => Unit = (b: DataFrame, _: Long) => {
      if (!new java.io.File(s"$tbl/_delta_log").exists())
        b.write.format("gwdelta").mode("append").save(tbl)
      else {
        graft.GwTable.forPath(b.sparkSession, tbl).merge(b,
          col("t.user_id") === col("s.user_id"),
          whenMatchedSet = Map(
            "n_events" -> col("s.n_events"),
            "value_c" -> col("s.value_c")))
        ()
      }
    }
    val q = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-st10-cp").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(upsert)
      .start()
    q.awaitTermination()
    val hist = graft.GwTable.forPath(spark, tbl).history.collect()
    require(hist.length >= 2 && hist.exists(_.getString(2) == "MERGE"),
      s"expected a bootstrap + >=1 MERGE commit, got ${hist.map(_.getString(2)).toSeq}")
    spark.read.format("gwdelta").load(tbl)
  }

  /** st11: arbitrary state through Spark 4's `transformWithState` — the
    * StatefulProcessor successor to mapGroupsWithState (typed state
    * primitives, timers, TTL). A bounded per-user ListState carries the
    * global TOP-3 (value, event_id) pairs under a total order, so the
    * final state is ORDER-INDEPENDENT across batch boundaries and arrival
    * interleavings — which is what makes the gate oracle-exact. State per
    * user is exactly 3 tuples + one counter: O(1), the only shape that
    * survives an unbounded stream. Update-mode emissions carry a monotone
    * n_seen marker; the final per-user state wins below (same memory-sink
    * dedup as st02). */
  def st11TransformWithState(spark: SparkSession, dir: String): DataFrame = withRocksDb(spark) {
    import spark.implicits._
    val name = nextName()
    val q = eventStream(spark, dir)
      .filter(col("user_id") < 30)
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("value_c"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(
        new Top3Processor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
      .toDF("user_id", "n_seen", "rank", "value_c", "event_id")
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_seen").desc)
    spark.table(name)
      .withColumn("mx", max(col("n_seen")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .filter(col("n_seen") === col("mx"))
      .select("user_id", "rank", "value_c", "event_id")
  }

  /** st12: CDC REPLICATION — proof that the change feed is sufficient to
    * reconstruct a table: a `readChangeFeed` stream of a CDF-enabled
    * gwdelta source (bootstrap inserts, a second append, a copy-on-write
    * UPDATE's pre/post images, a partial DELETE, and a merge-on-read
    * DELETE whose deletion-vector commit was unstreamable before gw43)
    * drives a foreachBatch applier into an INDEPENDENT replica table.
    * Each micro-batch applies its versions in commit order with ONE
    * MERGE per version using the Delta-parity conditional branches:
    * postimages/inserts upsert, `_change_type = 'delete'` rows take WHEN
    * MATCHED THEN DELETE, and delete markers never insert (`WHEN NOT
    * MATCHED AND type <> 'delete'`). After the drain the replica must
    * equal the source exactly (in-gate require; the oracle pins the
    * reconstructed content). */
  def st12CdcReplicate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.upper
    val srcLoc = java.nio.file.Files.createTempDirectory("st12src")
      .resolve("db/nation").toString
    val repLoc = java.nio.file.Files.createTempDirectory("st12rep")
      .resolve("db/nation").toString
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    nation.filter(col("n_nationkey") < 12).coalesce(1)
      .write.format("gwdelta").mode("append").save(srcLoc) // v0
    val t = graft.GwTable.forPath(spark, srcLoc)
    require(t.updateProperties(Map("graft.enableChangeDataFeed" -> "true")) == 1L)
    nation.filter(col("n_nationkey") >= 12).coalesce(1)
      .write.format("gwdelta").mode("append").save(srcLoc) // v2
    require(t.update(col("n_nationkey") < 3,
      Map("n_name" -> upper(col("n_name")))) == 3L)
    require(t.delete(col("n_nationkey") === 7) == 4L)
    require(t.delete(col("n_nationkey") === 13, mergeOnRead = true) == 5L)
    val applier: (DataFrame, Long) => Unit = (b: DataFrame, _: Long) => {
      val versions = b.select("_commit_version").distinct()
        .collect().map(_.getLong(0)).sorted
      versions.foreach { v =>
        val vb = b.filter(col("_commit_version") === v)
          .filter(col("_change_type") =!= "update_preimage")
          .drop("_commit_version")
        if (!new java.io.File(s"$repLoc/_delta_log").exists())
          vb.filter(col("_change_type") =!= "delete").drop("_change_type")
            .write.format("gwdelta").mode("append").save(repLoc)
        else {
          graft.GwTable.forPath(b.sparkSession, repLoc).merge(vb,
            col("t.n_nationkey") === col("s.n_nationkey"),
            whenMatchedSet = Map(
              "n_name" -> col("s.n_name"),
              "n_regionkey" -> col("s.n_regionkey")),
            whenMatchedDeleteIf = Some(col("s._change_type") === "delete"),
            insertNotMatchedIf = Some(col("_change_type") =!= "delete"))
          ()
        }
      }
    }
    val q = spark.readStream.format("gwdelta")
      .option("readChangeFeed", "true").load(srcLoc)
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("st12cp").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(applier)
      .start()
    q.awaitTermination()
    val replica = spark.read.format("gwdelta").load(repLoc)
    val source = spark.read.format("gwdelta").load(srcLoc)
    require(replica.exceptAll(source).isEmpty && source.exceptAll(replica).isEmpty,
      "replica reconstructed from the change feed must equal the source")
    replica
  }

  /** st13: STREAMING index ingest — the online face of the persisted IVF
    * index (s14/s15): a stream of fresh embeddings drains into the index
    * table via `foreachBatch` + [[graft.api.Pipelines.appendToIvfIndex]]
    * with a stream-scoped txnId per micro-batch, so ingest is
    * EXACTLY-ONCE (pinned in-gate: re-applying the drained batch's txnId
    * commits nothing) and every vector assigns against the FROZEN stored
    * centroids. After the drain the index contents equal the one-shot
    * build, so the oracle is the full-corpus IVF replay over this gate's
    * query window. */
  def st13StreamIndexIngest(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.Pipelines
    val tmp = java.nio.file.Files.createTempDirectory("st13")
      .resolve("ivf").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    Pipelines.buildIvfIndex(e.filter(col("vec_id") % 5 =!= 0),
      col("vec_id"), col("embedding"), dim = 64, indexPath = tmp)
    val t = graft.GwTable.forPath(spark, tmp)
    val v0 = t.snapshot().version
    val stage = java.nio.file.Files.createTempDirectory("st13stage")
      .resolve("in").toString
    e.filter(col("vec_id") % 5 === 0).coalesce(1).write.parquet(stage)
    val streamId = java.util.UUID.randomUUID().toString
    @volatile var lastBatch = -1L
    val q = spark.readStream.schema(e.schema).parquet(stage)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        lastBatch = batchId
        Pipelines.appendToIvfIndex(batch, col("vec_id"), col("embedding"),
          tmp, txnId = Some(s"$streamId/$batchId")); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val vAfter = t.snapshot().version
    require(vAfter > v0 && lastBatch >= 0L, "the stream must commit")
    // exactly-once: replaying the drained batch's txn commits NOTHING
    Pipelines.appendToIvfIndex(e.filter(col("vec_id") % 5 === 0),
      col("vec_id"), col("embedding"), tmp,
      txnId = Some(s"$streamId/$lastBatch"))
    require(t.snapshot().version == vAfter,
      "a replayed (stream, batch) txn must not re-commit")
    Pipelines.ivfIndexTopK(
      e.filter(col("vec_id") >= 20 && col("vec_id") < 30),
      col("vec_id"), col("embedding"), tmp, k = 3, nProbe = 8)
  }

  /** st14: rate-limited backfill admission — the 100 TB onboarding shape:
    * tailing a table whose INITIAL snapshot is far larger than one
    * micro-batch's budget, `maxFilesPerTrigger` slices the snapshot into
    * bounded batches (by file index), AvailableNow drains them all, every
    * row lands exactly once (per-batch txn ids), and a restart from the
    * checkpoint admits nothing new. In-gate pins: >= 6 batches of <= 1
    * file each for a 6-file snapshot; the restart is a no-op commit-wise;
    * the drained output equals the table (the oracle). */
  def st14BackfillAdmission(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("st14")
    val loc = tmp.resolve("db/nation").toString
    val out = tmp.resolve("db/out").toString
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    for (i <- 0 until 6) // 6 commits, one single-row file each
      nation.filter(col("n_nationkey") === i).coalesce(1)
        .write.format("gwdelta").mode("append").save(loc)
    val streamId = java.util.UUID.randomUUID().toString
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val maxRows = new java.util.concurrent.atomic.AtomicLong(0)
    def drain(ckptSuffix: String): Unit = {
      val q = spark.readStream.format("gwdelta")
        .option("maxFilesPerTrigger", "1").load(loc)
        .writeStream
        .option("checkpointLocation", tmp.resolve(s"ckpt$ckptSuffix").toString)
        .foreachBatch { (b: DataFrame, id: Long) =>
          batches.incrementAndGet()
          maxRows.getAndUpdate(m => math.max(m, b.count()))
          GwSink.append(b, out, txnId = Some(s"$streamId/$ckptSuffix/$id")); ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain("a")
    val t = graft.GwTable.forPath(spark, out)
    val vDrained = t.snapshot().version
    require(batches.get() >= 6,
      s"a 6-file snapshot at maxFilesPerTrigger=1 must take >=6 batches, got ${batches.get()}")
    require(maxRows.get() <= 1,
      s"admission must bound every batch to one file's rows, got ${maxRows.get()}")
    // restart from the SAME checkpoint: nothing new to admit, no commit
    drain("a")
    require(t.snapshot().version == vDrained,
      "a checkpoint restart with no new data must not re-commit")
    t.toDF
  }

  // ---------------------------------------------------------------- st15
  /** Late-data dead-letter routing: Structured Streaming's watermark
    * DROPS late rows silently inside stateful operators — a production
    * ingest wants them CAPTURED instead, routed to a dead-letter table
    * for replay/repair while on-time rows flow to the main table.
    *
    * The high-water mark is NOT in-memory state: it is recovered per
    * batch as max(event time) over the MAIN table — an invariant, because
    * a late row is by definition below the mark and so can never raise
    * it, so the main table's maximum IS the mark. Recovery reads the
    * log's harvested footer stats ([[graft.log.Snapshot.statsMaxMicros]]),
    * one metadata read instead of a 100 TB aggregation, falling back to a
    * real max() scan only when some live file lacks stats. Stateless =
    * restart-safe: a resumed stream recomputes the same mark from the
    * same committed table, and per-(table, batch) txn ids make both
    * appends exactly-once — there is nothing in driver memory to lose.
    */
  def lateDataRoute(spark: SparkSession, srcPath: String, mainPath: String,
      dlqPath: String, tsCol: String, delayMicros: Long, streamId: String,
      ckptDir: String): Unit = {
    def highMicros(s: SparkSession): Option[Long] =
      scala.util.Try(graft.GwTable.forPath(s, mainPath).snapshot()).toOption
        .map { snap =>
          graft.log.Snapshot.statsMaxMicros(snap, tsCol).getOrElse {
            val m = s.read.format("gwdelta").load(mainPath)
            m.agg(max(EventTime.micros(m, tsCol))).head().getLong(0)
          }
        }
    val q = spark.readStream.format("gwdelta")
      .option("maxFilesPerTrigger", "1").load(srcPath)
      .writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        // replay guard, ORDER-CRITICAL: the main append goes LAST, so its
        // txn mark covering this batch proves the whole batch routed. A
        // crash between the two appends replays with main — and therefore
        // the recovered mark — unchanged (same split, late deduped by its
        // own txn); without this guard a crash AFTER the main append would
        // replay against a mark the batch itself raised, reclassifying its
        // own tail rows as late and duplicating them into the DLQ.
        val done = scala.util.Try(
          graft.GwTable.forPath(b.sparkSession, mainPath).snapshot())
          .toOption.flatMap(_.transactions.get(s"$streamId/main")).exists(_ >= id)
        if (!done) {
          val cut = highMicros(b.sparkSession).map(_ - delayMicros)
          val isLate = cut.map(c => EventTime.micros(b, tsCol) < lit(c))
            .getOrElse(lit(false))
          val late = b.filter(isLate)
          val ontime = b.filter(!isLate)
          if (!late.isEmpty)
            GwSink.append(late, dlqPath, txnId = Some(s"$streamId/late/$id"))
          if (!ontime.isEmpty)
            GwSink.append(ontime, mainPath, txnId = Some(s"$streamId/main/$id"))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** st15 gate: events land in 6 single-file commits whose event-time
    * order is deliberately SCRAMBLED (hour-bucket permutation 2,0,4,1,5,3),
    * so the later batches carry genuinely late data. One file per trigger
    * makes the batch sequence the commit sequence, so the whole admission
    * fold — per-batch mark recovery included — replays exactly in SQL with
    * the permutation as a literal. A checkpoint restart must route nothing
    * new (exactly-once on BOTH tables). */
  def st15LateDataDlq(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("st15")
    val src = tmp.resolve("db/src").toString
    val main = tmp.resolve("db/main").toString
    val dlq = tmp.resolve("db/dlq").toString
    val ev0 = spark.read.parquet(s"$dir/events.parquet")
    val ev = ev0
      .withColumn("__us", EventTime.micros(ev0, "ts"))
      .withColumn("__b", pmod(expr("__us div 3600000000"), lit(6L)))
      .drop("__us")
    Seq(2L, 0L, 4L, 1L, 5L, 3L).foreach { b =>
      ev.filter(col("__b") === b).drop("__b").coalesce(1)
        .write.format("gwdelta").mode("append").save(src)
    }
    val streamId = java.util.UUID.randomUUID().toString
    val ckpt = tmp.resolve("ckpt").toString
    lateDataRoute(spark, src, main, dlq, "ts",
      delayMicros = 3600000000L, streamId = streamId, ckptDir = ckpt)
    val mainT = graft.GwTable.forPath(spark, main)
    val dlqT = graft.GwTable.forPath(spark, dlq)
    require(!dlqT.toDF.isEmpty, "the scrambled fixture must produce late rows")
    val (vm, vd) = (mainT.snapshot().version, dlqT.snapshot().version)
    // restart: same checkpoint, no new source data -> no new commits
    lateDataRoute(spark, src, main, dlq, "ts",
      delayMicros = 3600000000L, streamId = streamId, ckptDir = ckpt)
    require(mainT.snapshot().version == vm && dlqT.snapshot().version == vd,
      "a checkpoint restart with no new data must not re-commit")
    def side(path: String, tag: String) = {
      val t = spark.read.format("gwdelta").load(path)
      t.select(col("user_id"), col("event_type"),
        EventTime.micros(t, "ts").as("ts_us"),
        round(col("value") * 100).cast("long").as("value_c"),
        lit(tag).as("side"))
    }
    side(main, "main").unionAll(side(dlq, "late"))
  }

  // ---------------------------------------------------------------- st16
  /**
   * STREAMING AS-OF JOIN — the streaming counterpart of the batch as-of
   * join (q17), which Spark has no native operator for: enrich each fact
   * row with the most recent dimension row at-or-before its event time,
   * per key (trades against the prevailing quote, events against the
   * user's profile version that was live at the time).
   *
   * Shape: both sides union into ONE keyed stream (side-tagged), so one
   * watermark governs completeness for both. Per key, a
   * flatMapGroupsWithState buffer holds pending facts and the dimension
   * versions; a fact emits ONLY once the watermark passes its event time
   * — at that point every dimension at-or-before it has either arrived
   * or is provably late — joined to the greatest (us, seq) dimension at
   * or before it, NULL when none exists. Ties break on the total order
   * (us, seq), so the answer is deterministic under any arrival order.
   *
   * State is watermark-bounded, the 100 TB requirement: pending facts
   * live only inside the delay window, and dimensions COMPACT to the
   * versions at-or-after the watermark plus the single latest older one
   * (any older version can never again be the as-of answer for a
   * still-admissible fact). Emission happens on normal invocations AND
   * on event-time timers, so quiet keys still flush as the watermark
   * advances.
   *
   * Input contract: (key, us, vc, seq, side) + a watermarked
   * `event_time`; side 0 = dimension, 1 = fact, anything else ignored
   * (flush sentinels ride through without touching state). Output:
   * (key, fact_us, fact_c, seq, dim_c nullable).
   */
  def streamingAsOfJoin(tagged: org.apache.spark.sql.Dataset[
      (Long, Long, Long, Long, Int, java.sql.Timestamp)]):
      org.apache.spark.sql.Dataset[(Long, Long, Long, Long, Option[Long])] = {
    import tagged.sparkSession.implicits._
    tagged
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        // state = (dimension versions, pending facts), each (us, vc, seq)
        (key: Long, rows: Iterator[(Long, Long, Long, Long, Int, java.sql.Timestamp)],
         state: GroupState[(Seq[(Long, Long, Long)], Seq[(Long, Long, Long)])]) =>
          val (dims0, facts0) = state.getOption.getOrElse((Nil, Nil))
          var dims = dims0
          var facts = facts0
          rows.foreach {
            case (_, us, vc, seq, 0, _) => dims = dims :+ ((us, vc, seq))
            case (_, us, vc, seq, 1, _) => facts = facts :+ ((us, vc, seq))
            case _ => () // sentinel / unknown side: watermark fuel only
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) = facts.partition(_._1 < wmUs)
          val out = ready.map { case (fus, fvc, fseq) =>
            val best = dims.filter(_._1 <= fus) match {
              case Nil => None
              case ds => Some(ds.maxBy(d => (d._1, d._3))._2)
            }
            (key, fus, fvc, fseq, best)
          }
          // compact: versions >= watermark stay; of the older ones only
          // the latest can still win for any future (>= watermark) fact
          val (fresh, old) = dims.partition(_._1 >= wmUs)
          val kept = fresh ++ (old match {
            case Nil => Nil
            case ds => Seq(ds.maxBy(d => (d._1, d._3)))
          })
          if (kept.isEmpty && pending.isEmpty) state.remove()
          else {
            state.update((kept, pending))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          }
          out.iterator
      }
  }

  /** st16 gate: the events table splits by `event_id % 3` into a
    * dimension stream (quotes) and a fact stream (trades), both keyed by
    * user; a far-future sentinel drains the watermark so every fact
    * flushes. Oracle = the batch as-of join (a correlated greatest-at-
    * or-before lookup with the identical (us, seq) tiebreak). */
  def st16StreamingAsofJoin(spark: SparkSession, dir: String): DataFrame = withRocksDb(spark) {
    import spark.implicits._
    val name = nextName()
    val src = withEventTime(eventStream(spark, dir, withSentinel = true))
      .withWatermark("event_time", "1 hour")
    // the watermarked event_time column rides in the typed view: the
    // analyzer requires it present for EventTimeTimeout (st03 note)
    val tagged = src
      .select(col("user_id"), EventTime.micros(src).as("us"),
        round(col("value") * 100).cast("long").as("vc"), col("event_id"),
        when(col("event_type") === SentinelType, lit(2))
          .when(col("event_id") % 3 === 0, lit(0)).otherwise(lit(1)).as("side"),
        col("event_time"))
      .as[(Long, Long, Long, Long, Int, java.sql.Timestamp)]
    val q = streamingAsOfJoin(tagged)
      .toDF("user_id", "fact_us", "fact_c", "event_id", "dim_c")
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }


  /** st17: streaming ingest into the PERSISTED IVF+PQ index — st13's
    * exactly-once contract through the IVFADC table: each micro-batch
    * assigns against the FROZEN stored centroids, quantizes against the
    * FROZEN stored codebooks, and lands as one transactional append with
    * a stream-scoped txnId (a replayed (stream, batch) commits nothing,
    * pinned in-gate by re-appending the drained batch). Search sees the
    * streamed vectors immediately; contents equal the one-shot build, so
    * the oracle is the full-corpus IVFADC replay. Codebook refresh is
    * [[graft.api.Pipelines.rebuildIvfPqIndex]]'s job (s22), never the
    * stream's. */
  def st17StreamPqIndexIngest(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.Pipelines
    val tmp = java.nio.file.Files.createTempDirectory("st17")
      .resolve("ivfpq").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    Pipelines.buildIvfPqIndex(e.filter(col("vec_id") % 5 =!= 0),
      col("vec_id"), col("embedding"), dim = 64, indexPath = tmp)
    val t = graft.GwTable.forPath(spark, tmp)
    val v0 = t.snapshot().version
    val stage = java.nio.file.Files.createTempDirectory("st17stage")
      .resolve("in").toString
    e.filter(col("vec_id") % 5 === 0).coalesce(1).write.parquet(stage)
    val streamId = java.util.UUID.randomUUID().toString
    @volatile var lastBatch = -1L
    val q = spark.readStream.schema(e.schema).parquet(stage)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        lastBatch = batchId
        Pipelines.appendToIvfPqIndex(batch, col("vec_id"), col("embedding"),
          tmp, txnId = Some(s"$streamId/$batchId")); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val vAfter = t.snapshot().version
    require(vAfter > v0 && lastBatch >= 0L, "the stream must commit")
    // exactly-once: replaying the drained batch's txn commits NOTHING
    Pipelines.appendToIvfPqIndex(e.filter(col("vec_id") % 5 === 0),
      col("vec_id"), col("embedding"), tmp,
      txnId = Some(s"$streamId/$lastBatch"))
    require(t.snapshot().version == vAfter,
      "a replayed (stream, batch) txn must not re-commit")
    Pipelines.ivfPqIndexTopK(
      e.filter(col("vec_id") >= 20 && col("vec_id") < 30),
      col("vec_id"), col("embedding"), tmp, k = 5, nProbe = 8,
      candidates = 20)
  }

  // ---------------------------------------------------------------- st20
  /** st20: streaming RECALL MONITOR — the continuous quality signal the
    * index-ingest faces (st13/st17) need in production: a drifting
    * approximate index degrades silently (appends succeed, counts
    * match), so each micro-batch, after its ingest lands, re-measures
    * the index against exact ground truth on a PINNED probe set and
    * appends one metric batch exactly-once
    * ([[graft.api.Pipelines.ivfRecallProbe]] — floor-milli recall,
    * engine-exact). Lifecycle pinned in-gate: two st14-deterministic
    * micro-batches each ingest + measure (batches 0, 1), a crash-retried
    * monitor txn returns the ORIGINAL rows and commits nothing, then the
    * s17 maintenance step (REINDEX onto the pinned 8-family) runs and
    * the next tick (batch 2) measures the rebuilt index. The oracle
    * replays every tick: per-batch contents-so-far, the frozen-centroid
    * probe path, brute-force truth over the same contents, and the
    * integer metric. The drift scenario itself (recall falling under
    * out-of-distribution ingest, recovering after retraining) is pinned
    * by the StreamSpec property test — retrained centroids are
    * data-dependent and not SQL-renderable, exactly the s17 split. */
  def st20StreamRecallMonitor(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.Pipelines
    val tmp = java.nio.file.Files.createTempDirectory("st20")
    val idx = tmp.resolve("ivf").toString
    val met = tmp.resolve("metrics").toString
    val src = tmp.resolve("src").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    Pipelines.buildIvfIndex(e.filter(col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), dim = 64, indexPath = idx)
    val probes = e.filter(col("vec_id") < 10)
    // the arriving batches: two single-file commits, admitted in order
    e.filter(col("vec_id") % 4 === 1).coalesce(1)
      .write.format("gwdelta").mode("append").save(src)
    e.filter(col("vec_id") % 4 === 3).coalesce(1)
      .write.format("gwdelta").mode("append").save(src)
    val streamId = java.util.UUID.randomUUID().toString
    @volatile var lastBatch = -1L
    val q = spark.readStream.format("gwdelta")
      .option("maxFilesPerTrigger", "1").load(src)
      .writeStream
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        lastBatch = batchId
        Pipelines.appendToIvfIndex(batch, col("vec_id"), col("embedding"),
          idx, txnId = Some(s"$streamId/ingest/$batchId"))
        Pipelines.ivfRecallProbe(probes, col("vec_id"), col("embedding"),
          idx, met, k = 3, nProbe = 2, batch = batchId,
          txnId = Some(s"$streamId/mon/$batchId")); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    require(lastBatch == 1L, s"expected two admitted micro-batches, got $lastBatch")
    val mt = graft.GwTable.forPath(spark, met)
    val vm = mt.snapshot().version
    // exactly-once: a crash-retried monitor batch returns the ORIGINAL
    // rows (the index has grown since — re-measuring would rewrite
    // history) and commits nothing
    val replay = Pipelines.ivfRecallProbe(probes, col("vec_id"),
      col("embedding"), idx, met, k = 3, nProbe = 2, batch = 1L,
      txnId = Some(s"$streamId/mon/1"))
    require(mt.snapshot().version == vm,
      "a replayed monitor txn must not re-commit")
    require(replay.count() == probes.count(),
      "the replay must return the original metric rows")
    // maintenance: REINDEX onto the pinned 8-family (s17), next tick
    // measures the rebuilt index
    Pipelines.rebuildIvfIndex(spark, idx, nCentroids = 8,
      centroids = Some(Pipelines.hyperplanes(8, 64)))
    Pipelines.ivfRecallProbe(probes, col("vec_id"), col("embedding"),
      idx, met, k = 3, nProbe = 2, batch = 2L,
      txnId = Some(s"$streamId/mon/2"))
    spark.read.format("gwdelta").load(met)
      .select(col("batch"), col("q_id"), col("truth_k"), col("hits"),
        col("recall_milli"))
  }

  // ---------------------------------------------------------------- st18
  /** Streaming incremental exact dedup — the streaming face of d20: a
    * document stream dedups each micro-batch against the PERSISTED
    * fingerprint index and appends its survivors' digests in the same
    * call ([[graft.api.Pipelines.incrementalExactDedup]]), so later
    * batches see earlier batches' survivors as "already seen". The two
    * staged batches arrive as two single-file gwdelta commits sliced by
    * `maxFilesPerTrigger=1` (st14's deterministic admission), per-batch
    * reports land in a report table under per-(stream, batch) txn ids,
    * and a checkpoint-restart drain proves the whole lifecycle
    * exactly-once: no new commit on the index OR the report table.
    * Result = the report table; same oracle semantics as d20. */
  def st18StreamIncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.Pipelines
    val tmp = java.nio.file.Files.createTempDirectory("st18")
    val idx = tmp.resolve("fpidx").toString
    val src = tmp.resolve("src").toString
    val rep = tmp.resolve("report").toString
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    Pipelines.buildFingerprintIndex(
      d.filter(col("doc_id") % 3 === 0), col("doc_id"), col("text"), idx)
    // the arriving batches: two single-file commits, admitted in order
    d.filter(col("doc_id") % 3 === 1).coalesce(1)
      .write.format("gwdelta").mode("append").save(src)
    d.filter(col("doc_id") % 3 === 2).coalesce(1)
      .write.format("gwdelta").mode("append").save(src)
    val streamId = java.util.UUID.randomUUID().toString
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    def drain(): Unit = {
      val q = spark.readStream.format("gwdelta")
        .option("maxFilesPerTrigger", "1").load(src)
        .writeStream
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batches.incrementAndGet()
          val report = Pipelines.incrementalExactDedup(
            batch, col("doc_id"), col("text"), idx,
            txnId = Some(s"$streamId/idx/$batchId"))
          GwSink.append(
            report.withColumn("batch", lit(batchId + 1))
              .withColumnRenamed("id", "doc_id")
              .select("batch", "doc_id", "fp", "dup_of_index",
                "dup_in_batch", "kept"),
            rep, txnId = Some(s"$streamId/rep/$batchId")); ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    require(batches.get() >= 2,
      s"two staged single-file commits must admit as >= 2 batches, got ${batches.get()}")
    val idxV = graft.GwTable.forPath(spark, idx).snapshot().version
    val repV = graft.GwTable.forPath(spark, rep).snapshot().version
    // checkpoint restart: nothing new to admit, NOTHING re-commits
    drain()
    require(graft.GwTable.forPath(spark, idx).snapshot().version == idxV,
      "a checkpoint restart must not re-commit to the index")
    require(graft.GwTable.forPath(spark, rep).snapshot().version == repV,
      "a checkpoint restart must not re-commit to the report table")
    graft.GwTable.forPath(spark, rep).toDF
  }

  // ---------------------------------------------------------------- st21
  /** st21: streaming incremental SEMANTIC dedup — st18's lifecycle
    * through the persisted embedding index (d25), completing the
    * streaming symmetry (d20→st18 exact, d22→st19 fuzzy, d25→this):
    * each admitted micro-batch dedups by EXACT COSINE over sign-LSH
    * candidates against the stored banded embeddings and appends its
    * survivors' rows in the same call; batch reports land txn-id'd in a
    * report table, and a checkpoint-restart drain proves the whole
    * lifecycle exactly-once on BOTH tables. Same oracle semantics as
    * d25. */
  def st21StreamSemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.Pipelines
    val tmp = java.nio.file.Files.createTempDirectory("st21")
    val idx = tmp.resolve("embidx").toString
    val src = tmp.resolve("src").toString
    val rep = tmp.resolve("report").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    Pipelines.buildEmbeddingIndex(
      e.filter(col("vec_id") % 3 === 0), col("vec_id"), col("embedding"),
      dim = 64, indexPath = idx)
    e.filter(col("vec_id") % 3 === 1).coalesce(1)
      .write.format("gwdelta").mode("append").save(src)
    e.filter(col("vec_id") % 3 === 2).coalesce(1)
      .write.format("gwdelta").mode("append").save(src)
    val streamId = java.util.UUID.randomUUID().toString
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    def drain(): Unit = {
      val q = spark.readStream.format("gwdelta")
        .option("maxFilesPerTrigger", "1").load(src)
        .writeStream
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batches.incrementAndGet()
          val report = Pipelines.incrementalSemanticDedup(
            batch, col("vec_id"), col("embedding"), idx,
            thresholdMicro = 300000L, txnId = Some(s"$streamId/idx/$batchId"))
          GwSink.append(
            report.withColumn("batch", lit(batchId + 1))
              .withColumnRenamed("id", "vec_id")
              .select("batch", "vec_id", "dup_of_index",
                "dup_in_batch", "kept"),
            rep, txnId = Some(s"$streamId/rep/$batchId")); ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    require(batches.get() >= 2,
      s"two staged single-file commits must admit as >= 2 batches, got ${batches.get()}")
    val idxV = graft.GwTable.forPath(spark, idx).snapshot().version
    val repV = graft.GwTable.forPath(spark, rep).snapshot().version
    // checkpoint restart: nothing new to admit, NOTHING re-commits
    drain()
    require(graft.GwTable.forPath(spark, idx).snapshot().version == idxV,
      "a checkpoint restart must not re-commit to the index")
    require(graft.GwTable.forPath(spark, rep).snapshot().version == repV,
      "a checkpoint restart must not re-commit to the report table")
    graft.GwTable.forPath(spark, rep).toDF
  }

  // ---------------------------------------------------------------- st19
  /** Streaming incremental FUZZY dedup — st18's lifecycle through the
    * persisted MinHash signature index (d22): each admitted micro-batch
    * dedups by ESTIMATED Jaccard against the stored signatures and
    * appends its survivors' signatures in the same call; batch reports
    * land txn-id'd in a report table, and a checkpoint-restart drain
    * proves the whole lifecycle exactly-once on BOTH tables. Same oracle
    * semantics as d22. */
  def st19StreamFuzzyDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.Pipelines
    val tmp = java.nio.file.Files.createTempDirectory("st19")
    val idx = tmp.resolve("mhidx").toString
    val src = tmp.resolve("src").toString
    val rep = tmp.resolve("report").toString
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    Pipelines.buildMinHashIndex(
      d.filter(col("doc_id") % 3 === 0), col("doc_id"), col("text"), idx)
    d.filter(col("doc_id") % 3 === 1).coalesce(1)
      .write.format("gwdelta").mode("append").save(src)
    d.filter(col("doc_id") % 3 === 2).coalesce(1)
      .write.format("gwdelta").mode("append").save(src)
    val streamId = java.util.UUID.randomUUID().toString
    def drain(): Unit = {
      val q = spark.readStream.format("gwdelta")
        .option("maxFilesPerTrigger", "1").load(src)
        .writeStream
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val report = Pipelines.incrementalFuzzyDedup(
            batch, col("doc_id"), col("text"), idx,
            thresholdPermille = 500, txnId = Some(s"$streamId/idx/$batchId"))
          GwSink.append(
            report.withColumn("batch", lit(batchId + 1))
              .withColumnRenamed("id", "doc_id")
              .select("batch", "doc_id", "dup_of_index", "dup_in_batch", "kept"),
            rep, txnId = Some(s"$streamId/rep/$batchId")); ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    val idxV = graft.GwTable.forPath(spark, idx).snapshot().version
    val repV = graft.GwTable.forPath(spark, rep).snapshot().version
    drain() // checkpoint restart: nothing admits, NOTHING re-commits
    require(graft.GwTable.forPath(spark, idx).snapshot().version == idxV,
      "a checkpoint restart must not re-commit to the signature index")
    require(graft.GwTable.forPath(spark, rep).snapshot().version == repV,
      "a checkpoint restart must not re-commit to the report table")
    graft.GwTable.forPath(spark, rep).toDF
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st01_stream_window" -> st01WindowedCounts _,
    "st02_stream_state" -> st02StatefulSessions _,
    "st03_sessionize" -> st03Sessionize _,
    "st04_session_window" -> st04SessionWindow _,
    "st05_stream_join" -> st05StreamJoin _,
    "st06_stream_dedup" -> st06StreamDedup _,
    "st07_stream_static" -> st07StreamStaticJoin _,
    "st08_stream_sketch" -> st08StreamSketch _,
    "st09_stream_outer_join" -> st09StreamOuterJoin _,
    "st10_stream_upsert" -> st10StreamUpsert _,
    "st11_transform_with_state" -> st11TransformWithState _,
    "st12_cdc_replicate" -> st12CdcReplicate _,
    "st13_stream_index" -> st13StreamIndexIngest _,
    "st14_backfill_admission" -> st14BackfillAdmission _,
    "st15_late_data_dlq" -> st15LateDataDlq _,
    "st16_streaming_asof_join" -> st16StreamingAsofJoin _,
    "st17_stream_pq_index" -> st17StreamPqIndexIngest _,
    "st18_stream_incr_dedup" -> st18StreamIncrementalDedup _,
    "st19_stream_fuzzy_dedup" -> st19StreamFuzzyDedup _,
    "st20_recall_monitor" -> st20StreamRecallMonitor _,
    "st21_stream_semantic_dedup" -> st21StreamSemanticDedup _,
  )

  /** st20's oracle: one metric block per monitor tick — tick b's index
    * contents are the build slice plus the admitted batches so far
    * (st14-deterministic order), the approximate side is the
    * centroid-literal IVF replay (16-family for ticks 0/1, the pinned
    * 8-family after the REINDEX for tick 2), the truth side brute-force
    * top-3 over the SAME contents, and the metric the identical integer
    * floor-milli recall. */
  private def st20OracleSql: String = {
    val ticks = Seq(
      (0L, "vec_id % 2 = 0 OR vec_id % 4 = 1", 16),
      (1L, "TRUE", 16),
      (2L, "TRUE", 8))
    ticks.map { case (b, corpusPred, nCents) =>
      val approx = graft.operators.Similarity.ivfOracleSql(
        "vec_id < 10", nCentroids = nCents, nProbe = 2,
        corpusPred = corpusPred)
      val cPred = corpusPred.replace("vec_id", "c.vec_id")
      val truth =
        s"""SELECT q_id, n_id FROM (
           | SELECT q.vec_id AS q_id, c.vec_id AS n_id,
           |  row_number() OVER (PARTITION BY q.vec_id
           |    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
           |      c.embedding::DOUBLE[]) DESC, c.vec_id) AS rnk
           | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           | WHERE q.vec_id < 10 AND ($cPred)
           |) WHERE rnk <= 3""".stripMargin
      s"""SELECT CAST($b AS BIGINT) AS batch, t.q_id,
         | CAST(count(*) AS BIGINT) AS truth_k,
         | CAST(sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         | CAST(sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END) * 1000
         |   // count(*) AS BIGINT) AS recall_milli
         |FROM ($truth) t
         |LEFT JOIN ($approx) a ON a.q_id = t.q_id AND a.n_id = t.n_id
         |GROUP BY t.q_id""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  /** Batch equivalents: AvailableNow drains the source, so the streaming
    * results must equal these exactly. */
  val oracles: Map[String, String] = Map(
    // st18 is the streaming face of d20 over the same batch partitioning
    // (st14-deterministic admission), so the batch oracle IS its oracle
    "st18_stream_incr_dedup" ->
      graft.operators.Dedup.oracles("d20_incremental_dedup"),
    // st19 is the streaming face of d22 over the same batch partitioning
    "st19_stream_fuzzy_dedup" ->
      graft.operators.Dedup.oracles("d22_incremental_fuzzy"),
    "st20_recall_monitor" -> st20OracleSql,
    // st21 is the streaming face of d25 over the same batch partitioning
    "st21_stream_semantic_dedup" ->
      graft.operators.Dedup.oracles("d25_incremental_semantic"),
    "st01_stream_window" ->
      """SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
        | count(*) AS n, CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events GROUP BY 1, 2""".stripMargin,
    "st02_stream_state" ->
      """SELECT user_id, count(*) AS n_events,
        | count(DISTINCT event_type) AS n_types,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
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
        | CAST(sum(len) AS BIGINT) AS n_events
        |FROM per_session GROUP BY 1""".stripMargin,
    "st05_stream_join" ->
      """SELECT p.event_id AS p_id, s.event_id AS s_id, p.user_id,
        | epoch_us(p.ts) - epoch_us(s.ts) AS wait_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        | ON p.user_id = s.user_id
        | AND epoch_us(p.ts) >= epoch_us(s.ts)
        | AND epoch_us(p.ts) <= epoch_us(s.ts) + 86400000000""".stripMargin,
    "st10_stream_upsert" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events GROUP BY 1""".stripMargin,
    // the bounded ListState converges to the exact global top-3 per user
    // under (value desc, event_id asc) whatever the batch interleaving
    "st11_transform_with_state" ->
      """SELECT user_id, rank, value_c, event_id FROM (
        | SELECT user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id
        |    ORDER BY value_c DESC, event_id) AS BIGINT) AS rank,
        |  value_c, event_id
        | FROM (SELECT user_id, CAST(round(value*100) AS BIGINT) AS value_c,
        |       event_id FROM events WHERE user_id < 30))
        |WHERE rank <= 3""".stripMargin,
    // the replica reconstructed purely from the change feed = the source's
    // final state: both appends, the uppercased update, minus the two
    // deleted keys (one copy-on-write, one deletion-vector)
    "st12_cdc_replicate" ->
      """SELECT n_nationkey,
        | CASE WHEN n_nationkey < 3 THEN upper(n_name) ELSE n_name END AS n_name,
        | n_regionkey
        |FROM nation WHERE n_nationkey NOT IN (7, 13)""".stripMargin,
    // st13: after the drain the index contents equal the one-shot build,
    // so the oracle is the full-corpus IVF replay (Similarity's seeded-
    // centroid-literal SQL) over this gate's query window.
    "st13_stream_index" ->
      graft.operators.Similarity.ivfOracleSql("vec_id >= 20 AND vec_id < 30"),
    // full-corpus IVFADC replay (build + streamed appends = the corpus)
    // with st17's own query window
    "st17_stream_pq_index" ->
      graft.operators.Similarity.ivfPqOracleSql(
        graft.api.Pipelines.hyperplanes(16, 64),
        graft.api.Pipelines.pqCodebooks(64, 8, 16),
        "vec_id >= 20 AND vec_id < 30", nProbe = 8, candidates = 20, k = 5),
    // admission slices the initial snapshot but must deliver it exactly
    "st14_backfill_admission" ->
      "SELECT * FROM nation WHERE n_nationkey < 6",
    // full admission replay: per-batch (= per hour-bucket, permutation
    // literal) high-water mark is the prefix max of prior batches' event
    // times; a row is late iff it trails the mark by over the delay
    "st15_late_data_dlq" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_us(ts) AS us,
        |  CAST(round(value * 100) AS BIGINT) AS value_c,
        |  (epoch_us(ts) // 3600000000) % 6 AS b
        | FROM events),
        |ord AS (SELECT * FROM (VALUES (0, 2), (1, 0), (2, 4), (3, 1), (4, 5), (5, 3)) AS t(j, b)),
        |bm AS (SELECT b, max(us) AS mx FROM e GROUP BY b),
        |pre AS (
        | SELECT o.b,
        |  max(bm.mx) OVER (ORDER BY o.j
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS h
        | FROM ord o LEFT JOIN bm ON bm.b = o.b)
        |SELECT e.user_id, e.event_type, e.us AS ts_us, e.value_c,
        | CASE WHEN pre.h IS NOT NULL AND e.us < pre.h - 3600000000
        |      THEN 'late' ELSE 'main' END AS side
        |FROM e JOIN pre ON e.b = pre.b""".stripMargin,
    // batch as-of replay: greatest (us, event_id) dimension at or before
    // each fact, per user — the identical tiebreak the state fold applies
    "st16_streaming_asof_join" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
        |  CAST(round(value * 100) AS BIGINT) AS vc, event_id FROM events),
        |d AS (SELECT * FROM e WHERE event_id % 3 = 0),
        |f AS (SELECT * FROM e WHERE event_id % 3 <> 0)
        |SELECT f.user_id, f.us AS fact_us, f.vc AS fact_c, f.event_id,
        | (SELECT d.vc FROM d
        |  WHERE d.user_id = f.user_id AND d.us <= f.us
        |  ORDER BY d.us DESC, d.event_id DESC LIMIT 1) AS dim_c
        |FROM f""".stripMargin,
    "st08_stream_sketch" ->
      // Bit-exact KMV replay: same 60-bit md5-prefix user hash, exact
      // distinct below k=64, else floor(63*2^60/h_64) — identical integer
      // and IEEE-double steps in both engines.
      """WITH e AS (
        |  SELECT epoch_us(ts) // 14400000000 AS win_bucket, event_type,
        |    CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM events),
        |r AS (
        |  SELECT win_bucket, event_type, hv,
        |    row_number() OVER (PARTITION BY win_bucket, event_type ORDER BY hv) AS rn
        |  FROM (SELECT DISTINCT win_bucket, event_type, hv FROM e)),
        |k AS (
        |  SELECT win_bucket, event_type,
        |    CASE WHEN max(rn) < 64 THEN max(rn)
        |         ELSE CAST(floor(63 * 1152921504606846976.0
        |                         / max(CASE WHEN rn = 64 THEN hv END)) AS BIGINT)
        |    END AS nd_users_kmv
        |  FROM r GROUP BY 1, 2),
        |n AS (
        |  SELECT epoch_us(ts) // 14400000000 AS win_bucket, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT k.win_bucket, k.event_type, nd_users_kmv, n
        |FROM k JOIN n USING (win_bucket, event_type)""".stripMargin,
    "st09_stream_outer_join" ->
      """SELECT s.event_id AS s_id, s.user_id, p.event_id AS p_id,
        | CAST(CASE WHEN p.event_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS matched
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        | ON s.user_id = p.user_id
        | AND epoch_us(p.ts) >= epoch_us(s.ts)
        | AND epoch_us(p.ts) <= epoch_us(s.ts) + 86400000000""".stripMargin,
    "st06_stream_dedup" ->
      """SELECT event_id, user_id, event_type,
        | CAST(round(value*100) AS BIGINT) AS value_c, epoch_us(ts) AS us
        |FROM events""".stripMargin,
    "st07_stream_static" ->
      """SELECT event_id, user_id, c_mktsegment,
        | CAST(round(value*100) AS BIGINT) AS value_c
        |FROM events JOIN customer ON user_id = c_custkey""".stripMargin,
    "st04_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
        |  CAST(round(value*100) AS BIGINT) AS vc FROM events),
        | g AS (SELECT user_id, us, vc,
        |   CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w >= 1800000000
        |        THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        | s AS (SELECT user_id, us, vc,
        |   sum(new_s) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, CAST(min(us) AS BIGINT) AS session_start_us,
        | count(*) AS n_events, CAST(sum(vc) AS BIGINT) AS value_c
        |FROM s GROUP BY user_id, sid""".stripMargin,
  )
}

/** Bounded top-3 processor for st11 (see
  * [[StreamOps.st11TransformWithState]]): ListState = the best 3
  * (value_c, event_id) pairs so far, ValueState = rows seen (the
  * Update-mode dedup marker). */
class Top3Processor extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Long, Long), (Long, Long, Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{ListState, TTLConfig, ValueState}

  @transient private var top: ListState[(Long, Long)] = _
  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    top = getHandle.getListState[(Long, Long)]("top3",
      org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
    seen = getHandle.getValueState[Long]("seen",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(userId: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues):
      Iterator[(Long, Long, Long, Long, Long)] = {
    val cur = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    if (top.exists()) cur ++= top.get()
    var n = if (seen.exists()) seen.get() else 0L
    rows.foreach { case (_, vc, eid) => cur += ((vc, eid)); n += 1 }
    val best = cur.sortBy { case (vc, eid) => (-vc, eid) }.take(3)
    top.put(best.toArray)
    seen.update(n)
    best.iterator.zipWithIndex.map { case ((vc, eid), i) =>
      (userId, n, (i + 1).toLong, vc, eid)
    }
  }
}
