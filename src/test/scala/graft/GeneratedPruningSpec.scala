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
}
