package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.EventTime
import graft.operators.Relational
import graft.streaming.StreamOps

/**
 * Fixture schema-drift guard: the driver has regenerated the events table
 * with `ts` as BIGINT epoch-nanos in some rounds and parquet
 * TIMESTAMP(MICROS) (Spark: TIMESTAMP_NTZ) in others. Every event-time
 * query goes through graft.functions.EventTime; this suite synthesizes BOTH
 * encodings and asserts the whole event-time query surface is
 * encoding-invariant — so the next regeneration either just works or fails
 * HERE with one clear message, not as 13 scattered analysis errors.
 */
class EventTimeSpec extends SparkSpec {

  /** Irregularly spaced synthetic events (~15h span, all event types). */
  private def synth(): DataFrame = {
    import spark.implicits._
    val types = Seq("click", "view", "purchase", "signup", "error")
    (0 until 400).map { i =>
      val us = 1700000000000000L + i * 137L * 1000000L + (i % 7) * 911L
      (i.toLong, us, (i % 8).toLong, types(i % 5), (i % 100) / 7.0,
        s"""{"k": ${i % 50}}""")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
  }

  /** Write the synthetic table with `ts` built by `encode(us)` as a single
    * `events.parquet` FILE (the fixture layout the queries read). */
  private def writeVariant(encode: Column => Column): String = {
    val out = Files.createTempDirectory("graft-ts-variant")
    val tmp = Files.createTempDirectory("graft-ts-variant-stage")
    synth()
      .withColumn("ts", encode(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, out.resolve("events.parquet"))
    out.toString
  }

  private lazy val nanosDir = writeVariant(us => (us * 1000L).cast(LongType))
  private lazy val ntzDir =
    writeVariant(us => timestamp_micros(us).cast("timestamp_ntz"))

  test("both fixture encodings read back as the expected Spark types") {
    assert(spark.read.parquet(s"$nanosDir/events.parquet")
      .schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$ntzDir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
  }

  test("EventTime.micros is encoding-invariant") {
    def us(dir: String): Seq[Long] = {
      val e = spark.read.parquet(s"$dir/events.parquet")
      e.select(EventTime.micros(e)).collect().map(_.getLong(0)).sorted.toSeq
    }
    val a = us(nanosDir)
    assert(a == us(ntzDir) && a.nonEmpty)
  }

  test("EventTime.fromMicros round-trips through each physical encoding") {
    val v = 1700000001234567L
    val row = spark.range(1)
      .select(
        EventTime.fromMicros(LongType, lit(v)).as("nanos"),
        EventTime.fromMicros(TimestampNTZType, lit(v)).as("ntz"),
        EventTime.fromMicros(TimestampType, lit(v)).as("tz"))
    assert(row.schema("nanos").dataType == LongType)
    assert(row.schema("ntz").dataType == TimestampNTZType)
    assert(row.schema("tz").dataType == TimestampType)
    val back = row.select(
      expr(EventTime.microsSql(LongType, "nanos")),
      expr(EventTime.microsSql(TimestampNTZType, "ntz")),
      expr(EventTime.microsSql(TimestampType, "tz"))).head()
    assert((0 to 2).forall(back.getLong(_) == v))
  }

  test("footer stats normalize per encoding (nanos raw, micros raw)") {
    assert(EventTime.statToMicros(LongType, 1700000000000000123L)
      == 1700000000000000L)
    assert(EventTime.statToMicros(TimestampNTZType, 1700000000000000L)
      == 1700000000000000L)
  }

  test("an unsupported ts type fails with one clear message") {
    val bad = spark.range(1).select(lit("2024-01-01").as("ts"))
    val err = intercept[IllegalArgumentException](EventTime.micros(bad))
    assert(err.getMessage.contains("unsupported type"))
  }

  test("event-time batch queries are encoding-invariant") {
    val queries: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] =
      Seq(
        "q08" -> Relational.q08WindowRunning _,
        "q15" -> Relational.q15EventBuckets _,
        "q17" -> Relational.q17AsofJoin _,
        "q27" -> Relational.q27SlidingWindow _,
        "q31" -> Relational.q31GapFill _,
        "q32" -> Relational.q32IntervalWindow _)
    queries.foreach { case (name, fn) =>
      val a = fn(spark, nanosDir).collect().map(_.toSeq).sortBy(_.mkString("|"))
      val b = fn(spark, ntzDir).collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(a.nonEmpty, s"$name produced no rows")
      assert(a.sameElements(b),
        s"$name diverged across ts encodings: ${a.take(3).toSeq} vs ${b.take(3).toSeq}")
    }
  }

  test("streaming drain works on the BIGINT-nanos encoding (sentinel path)") {
    // the live fixture is NTZ, so this is the only coverage of the nanos
    // sentinel/footer-stat branch until the driver flips the encoding back
    val got = StreamOps.st01WindowedCounts(spark, nanosDir)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val e = spark.read.parquet(s"$nanosDir/events.parquet")
    val expected = e
      .withColumn("us", EventTime.micros(e))
      .withColumn("hour_bucket", expr("us div 3600000000"))
      .groupBy("hour_bucket", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))
      .select("hour_bucket", "event_type", "n", "value_c")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.sameElements(expected),
      s"stream drain on nanos encoding diverged from batch: " +
        s"${got.take(3).toSeq} vs ${expected.take(3).toSeq}")
  }

  test("UTC assertion tracks the LIVE session zone in both directions") {
    // no memo: a session first checked under a WRONG zone must not fail
    // forever after fixing it, and a session that passed under UTC must
    // not silently keep passing after flipping AWAY from UTC
    val s2 = spark.newSession()
    val ntz = s2.sql("SELECT timestamp_ntz'2020-01-01 00:00:00' AS ts")
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    val e = intercept[IllegalArgumentException](EventTime.micros(ntz))
    assert(e.getMessage.contains("UTC"))
    s2.conf.set("spark.sql.session.timeZone", "UTC")
    // would throw on a stale cached 'America/New_York' under a first-seen memo
    assert(ntz.select(EventTime.micros(ntz).as("us")).head().getLong(0) ==
      1577836800000000L)
    // ...and the reverse flip re-validates too (would silently pass under
    // a success-only memo)
    s2.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    val e2 = intercept[IllegalArgumentException](EventTime.micros(ntz))
    assert(e2.getMessage.contains("Asia/Tokyo"))
    s2.conf.set("spark.sql.session.timeZone", "UTC")
  }
}
