package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generated-column partition/stats filter derivation
  * ([[org.apache.spark.sql.graftbridge.GwGeneratedPruning]]): a range on
  * the SOURCE column prunes files through the generated column's
  * partition values / stats, with unit widening for zone wobble; results
  * stay exact. */
class GeneratedPruningSpec extends SparkSpec {

  private def planned(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan)
          .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
          .fileIndex.inputFiles.length
    }.head

  test("WHERE ts >= X prunes a day=CAST(ts AS DATE) partitioned table, no day filter") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    import spark.implicits._
    val ns = s"gp${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val loc = Files.createTempDirectory("genprune").resolve("t").toString
    spark.sql(s"CREATE TABLE gw.$ns.t (ts TIMESTAMP, v BIGINT, day DATE) " +
      s"USING gwdelta PARTITIONED BY (day) LOCATION '$loc'")
    // 10 days x 12 rows; day is omitted (NULL) and computed by the
    // generation wrap after the property lands — bootstrap first with
    // explicit correct values (property can only be set on an existing log)
    val rows = (0 until 120).map { i =>
      val micros = java.time.Instant.parse("2024-03-01T00:00:00Z")
        .plusSeconds((i / 12) * 86400L + (i % 12) * 3600L)
      (java.sql.Timestamp.from(micros), i.toLong)
    }
    rows.take(12).toDF("ts", "v")
      .withColumn("day", to_date(col("ts")))
      .writeTo(s"gw.$ns.t").append()
    val t = GwTable.forPath(spark, loc)
    t.updateProperties(Map(
      "graft.generated.day" -> "CAST(ts AS DATE)",
      // NO stats on ts: any pruning under a ts predicate can only come
      // from the derived day constraint (partition-dir pruning)
      "graft.stats.columns" -> "day"))
    rows.drop(12).toDF("ts", "v").withColumn("day", lit(null).cast("date"))
      .writeTo(s"gw.$ns.t").append()
    val total = t.snapshot().files.size
    assert(total >= 10, s"expected >= 10 day partitions, got $total")
    // generated values really landed per-partition
    assert(t.snapshot().files.forall(_.partitionValues.get("day").exists(_ != null)))
    val q = spark.table(s"gw.$ns.t")
      .filter(col("ts") >= lit("2024-03-08 00:00:00").cast("timestamp"))
    val got = q.select("v").as[Long].collect().sorted.toSeq
    val expected = rows.filter(_._1.getTime >=
      java.sql.Timestamp.valueOf("2024-03-08 00:00:00").getTime)
      .map(_._2).sorted
    assert(got == expected, "derived pruning must not change results")
    val p = planned(q)
    assert(p < total,
      s"ts predicate must prune day partitions via the derivation: $p of $total")
    // derived bound = day >= 2024-03-06 (filter day minus the 2-day
    // widening): exactly the files of the surviving partitions plan
    val surviving = t.snapshot().files.count(_.partitionValues.get("day")
      .exists(_ >= "2024-03-06"))
    assert(p <= surviving,
      s"planned files ($p) must be within the widened-day window ($surviving)")
    assert(surviving < total, "the widened window must still exclude early days")
  }

  test("year(ts) derivation prunes via stats; unsupported expressions derive nothing") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    import spark.implicits._
    val ns = s"gp${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val loc = Files.createTempDirectory("genprune-yr").resolve("t").toString
    spark.sql(s"CREATE TABLE gw.$ns.t (ts TIMESTAMP, v BIGINT, yr INT) " +
      s"USING gwdelta LOCATION '$loc'")
    val rows = (0 until 60).map { i =>
      val micros = java.time.Instant.parse("2018-06-15T00:00:00Z")
        .plusSeconds((i / 10) * 365L * 86400L)
      (java.sql.Timestamp.from(micros), i.toLong)
    }
    // bootstrap, then restrict stats to yr ONLY before the real data —
    // any pruning under a ts predicate can then come only from the
    // derived yr constraint, never from ts stats
    rows.take(1).toDF("ts", "v").withColumn("yr", year(col("ts")))
      .writeTo(s"gw.$ns.t").append()
    val t = GwTable.forPath(spark, loc)
    t.updateProperties(Map(
      "graft.generated.yr" -> "year(ts)",
      "graft.stats.columns" -> "yr"))
    rows.drop(1).toDF("ts", "v").withColumn("yr", year(col("ts")))
      .repartitionByRange(6, col("ts")).sortWithinPartitions("ts")
      .writeTo(s"gw.$ns.t").append()
    // strip the bootstrap file's pre-declaration ts stats too (gw70)
    assert(t.computeStats(allFiles = true) == t.snapshot().files.size)
    val total = t.snapshot().files.size
    val q = spark.table(s"gw.$ns.t")
      .filter(col("ts") >= lit("2022-01-01 00:00:00").cast("timestamp"))
    val got = q.select("v").as[Long].collect().sorted.toSeq
    val expected = rows.filter(_._1.getTime >=
      java.sql.Timestamp.valueOf("2022-01-01 00:00:00").getTime)
      .map(_._2).sorted
    assert(got == expected)
    assert(planned(q) < total,
      s"year derivation must stats-prune: ${planned(q)} of $total")
    // a non-monotone / multi-source expression derives nothing (files all
    // plan) but stays correct
    t.updateProperties(Map("graft.generated.yr" -> "year(ts) + 0 * v"))
    val q2 = spark.table(s"gw.$ns.t")
      .filter(col("ts") >= lit("2022-01-01 00:00:00").cast("timestamp"))
    assert(planned(q2) == total, "multi-source expressions must not derive")
    assert(q2.select("v").as[Long].collect().sorted.toSeq == expected)
  }

  test("declaring a generation expression that existing rows violate is rejected") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    import spark.implicits._
    val ns = s"gp${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val loc = Files.createTempDirectory("genprune-bad").resolve("t").toString
    spark.sql(s"CREATE TABLE gw.$ns.t (ts TIMESTAMP, v BIGINT, day DATE) " +
      s"USING gwdelta LOCATION '$loc'")
    // day is WRONG for the expression about to be declared (off by one)
    (0 until 5).map { i =>
      (java.sql.Timestamp.valueOf(s"2024-03-0${i + 1} 10:00:00"), i.toLong)
    }.toDF("ts", "v")
      .withColumn("day", date_add(to_date(col("ts")), 1))
      .writeTo(s"gw.$ns.t").append()
    val t = GwTable.forPath(spark, loc)
    val e = intercept[IllegalArgumentException] {
      t.updateProperties(Map("graft.generated.day" -> "CAST(ts AS DATE)"))
    }
    assert(e.getMessage.contains("violate the generation invariant"))
    // the ALTER must not have landed: no derivation, full scans stay exact
    assert(!t.snapshot().metadata.exists(
      _.configuration.contains("graft.generated.day")))
    val q = spark.table(s"gw.$ns.t")
      .filter(col("ts") >= lit("2024-03-03 00:00:00").cast("timestamp"))
    assert(q.select("v").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))
  }

  test("month-trunc derivation widens by a whole month: reader/writer zone split keeps matching files") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    import spark.implicits._
    val ns = s"gp${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val loc = Files.createTempDirectory("genprune-mo").resolve("t").toString
    spark.sql(s"CREATE TABLE gw.$ns.t (ts TIMESTAMP, v BIGINT, mo DATE) " +
      s"USING gwdelta PARTITIONED BY (mo) LOCATION '$loc'")
    // one row per month Jan..Aug 2024, written under UTC; the May row sits
    // just before the June boundary — the row a +14h reader zone shifts
    // across the month line
    val rows = Seq(
      "2024-01-15 12:00:00", "2024-02-15 12:00:00", "2024-03-15 12:00:00",
      "2024-04-15 12:00:00", "2024-05-31 23:00:00", "2024-06-15 12:00:00",
      "2024-07-15 12:00:00", "2024-08-15 12:00:00").zipWithIndex
      .map { case (s, i) => (java.sql.Timestamp.valueOf(s), i.toLong) }
    rows.toDF("ts", "v")
      .withColumn("mo", trunc(to_date(col("ts")), "month"))
      .writeTo(s"gw.$ns.t").append()
    val t = GwTable.forPath(spark, loc)
    t.updateProperties(Map(
      "graft.generated.mo" -> "trunc(CAST(ts AS DATE), 'month')",
      "graft.stats.columns" -> "mo"))
    val total = t.snapshot().files.size
    assert(total >= 8)
    val prevZone = spark.conf.get("spark.sql.session.timeZone")
    try {
      // reader 14h ahead of the (UTC) writer: local 2024-06-01 12:00 is
      // 2024-05-31 22:00 UTC, so the May-31 23:00 UTC row MATCHES — a
      // flat 2-day margin would derive mo >= 2024-05-30 and prune the
      // May partition (mo = 2024-05-01) that holds it
      spark.conf.set("spark.sql.session.timeZone", "Etc/GMT-14")
      val q = spark.table(s"gw.$ns.t")
        .filter(col("ts") >= lit("2024-06-01 12:00:00").cast("timestamp"))
      val got = q.select("v").as[Long].collect().sorted.toSeq
      assert(got == Seq(4L, 5L, 6L, 7L),
        s"zone-split read must keep the boundary row: $got")
      val p = planned(q)
      assert(p < total, s"month derivation must still prune: $p of $total")
      // widened bound = 2024-06-01 minus (31 + 2) days = 2024-04-29:
      // April and earlier prune, May survives for the boundary row
      val surviving = t.snapshot().files.count(_.partitionValues.get("mo")
        .exists(_ >= "2024-04-29"))
      assert(p <= surviving, s"planned $p must be within the widened window $surviving")
    } finally spark.conf.set("spark.sql.session.timeZone", prevZone)
  }

  test("BETWEEN derives both sides: two one-sided ranges fold into one window") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    import spark.implicits._
    val ns = s"gp${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val loc = Files.createTempDirectory("genprune-btw").resolve("t").toString
    spark.sql(s"CREATE TABLE gw.$ns.t (ts TIMESTAMP, v BIGINT, day DATE) " +
      s"USING gwdelta PARTITIONED BY (day) LOCATION '$loc'")
    val rows = (0 until 20).map { i =>
      val micros = java.time.Instant.parse("2024-03-01T06:00:00Z")
        .plusSeconds(i * 86400L)
      (java.sql.Timestamp.from(micros), i.toLong)
    }
    rows.toDF("ts", "v").withColumn("day", to_date(col("ts")))
      .writeTo(s"gw.$ns.t").append()
    val t = GwTable.forPath(spark, loc)
    t.updateProperties(Map(
      "graft.generated.day" -> "CAST(ts AS DATE)",
      "graft.stats.columns" -> "day"))
    val total = t.snapshot().files.size
    assert(total >= 20)
    val q = spark.table(s"gw.$ns.t").filter(
      col("ts").between(
        lit("2024-03-09 00:00:00").cast("timestamp"),
        lit("2024-03-12 00:00:00").cast("timestamp")))
    assert(q.select("v").as[Long].collect().sorted.toSeq == Seq(8L, 9L, 10L))
    val p = planned(q)
    // both sides derived: [03-09 - 2d, 03-12 + 2d] = [03-07, 03-14] keeps
    // at most 8 of the 20 day partitions
    val surviving = t.snapshot().files.count(_.partitionValues.get("day")
      .exists(d => d >= "2024-03-07" && d <= "2024-03-14"))
    assert(p <= surviving,
      s"BETWEEN must prune BOTH sides: planned $p, two-sided window $surviving of $total")
    assert(surviving <= 8)
  }
}
