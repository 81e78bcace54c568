package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import graft.log.ColumnMapping

/** Column mapping ([[graft.log.ColumnMapping]]): RENAME/DROP COLUMN as
  * metadata-only commits — physical-name reads, logical-name surface,
  * pruning through the mapping, mapped writes, drop-readd tombstones, and
  * the documented restrictions. */
class MappingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshTable(): (String, GwTable) = {
    val dir = Files.createTempDirectory("map").resolve("nation").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
    src.filter(col("n_nationkey") < 12).coalesce(1)
      .write.format("gwdelta").mode("append").save(dir)
    src.filter(col("n_nationkey") >= 12).coalesce(1)
      .write.format("gwdelta").mode("append").save(dir)
    (dir, GwTable.forPath(spark, dir))
  }

  test("rename is metadata-only: same files, new name, old values; time travel keeps the old name") {
    val (_, t) = freshTable()
    val preVersion = t.snapshot().version
    val files = t.snapshot().files.map(_.path).toSet
    assert(t.renameColumn("n_name", "nation_name") > 0)
    assert(t.snapshot().files.map(_.path).toSet == files, "no data file may move")
    val df = t.toDF
    assert(df.columns.toSeq == Seq("n_nationkey", "nation_name", "n_regionkey"))
    val vals = df.select("n_nationkey", "nation_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val orig = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    assert(vals == orig, "renamed column must serve the same bytes")
    // pre-rename version still reads under the old name
    assert(t.versionAsOf(preVersion).columns.contains("n_name"))
  }

  test("writes after a rename land PHYSICAL names; reads stay logical") {
    val (dir, t) = freshTable()
    assert(t.renameColumn("n_name", "nation_name") > 0)
    val before = t.snapshot().files.map(_.path).toSet
    val extra = t.toDF.filter(col("n_nationkey") < 3)
    graft.streaming.GwSink.append(extra, dir)
    val newFile = t.snapshot().files.map(_.path).filterNot(before).head
    // the new file carries the ORIGINAL on-file name (mapping contract)
    val raw = spark.read.parquet(newFile)
    assert(raw.columns.contains("n_name") && !raw.columns.contains("nation_name"),
      s"new file must use the physical name, got ${raw.columns.toSeq}")
    assert(t.toDF.count() == 28)
    assert(t.toDF.filter(col("nation_name").isNotNull).count() == 28)
  }

  test("filter pushdown + stats pruning work through the mapping") {
    val (_, t) = freshTable()
    assert(t.renameColumn("n_nationkey", "nation_key") > 0)
    val df = t.toDF.filter(col("nation_key") >= 12)
    assert(df.count() == 13)
    val plan = df.queryExecution.executedPlan.toString
    // the parquet scan carries the pushed filter in the PHYSICAL name
    assert(plan.contains("PushedFilters") && plan.contains("n_nationkey"),
      s"pushdown lost through the mapping:\n$plan")
    def plannedFiles(d: org.apache.spark.sql.DataFrame): Int =
      d.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          ScanPeel.peel(b.scan).asInstanceOf[
            org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.head
    assert(t.snapshot().files.size == 2)
    // stats pruning through the mapping: only file B (keys >= 12) planned
    assert(plannedFiles(t.toDF.filter(col("nation_key") >= 12)) == 1,
      "footer stats must prune the lower file through the renamed column")
  }

  test("API DML on a renamed column: delete classifies, rewrites physically") {
    val (_, t) = freshTable()
    assert(t.renameColumn("n_name", "nation_name") > 0)
    assert(t.delete(col("n_nationkey") < 5) > 0)
    assert(t.toDF.count() == 20)
    // rewritten file still answers under the logical name
    assert(t.toDF.filter(col("nation_name").isNotNull).count() == 20)
  }

  test("drop column is metadata-only; re-added name never resurrects old bytes") {
    val (_, t) = freshTable()
    val preVersion = t.snapshot().version
    assert(t.dropColumn("n_regionkey") > 0)
    assert(t.toDF.columns.toSeq == Seq("n_nationkey", "n_name"))
    // time travel still reads the dropped bytes
    assert(t.versionAsOf(preVersion)
      .filter(col("n_regionkey").isNotNull).count() == 25)
    // re-add the same logical name: values must be NULL, not the old bytes
    assert(t.addColumns(org.apache.spark.sql.types.StructField("n_regionkey",
      org.apache.spark.sql.types.LongType)) > 0)
    assert(t.toDF.filter(col("n_regionkey").isNull).count() == 25,
      "re-added column must be fresh, not the dropped bytes")
  }

  test("restrictions: partition columns, property references, SQL row-level DML, streaming") {
    val dir = Files.createTempDirectory("map").resolve("p").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
    src.write.format("gwdelta").mode("append")
      .partitionBy("n_regionkey").save(dir)
    val t = GwTable.forPath(spark, dir)
    val e1 = intercept[IllegalArgumentException](t.renameColumn("n_regionkey", "rk"))
    assert(e1.getMessage.contains("partition column"))
    // a CHECK constraint referencing the column blocks the rename
    t.updateProperties(Map("graft.constraints.pos" -> "n_nationkey >= 0"))
    val e2 = intercept[IllegalArgumentException](t.renameColumn("n_nationkey", "k"))
    assert(e2.getMessage.contains("references"))
    t.updateProperties(Map.empty, unset = Seq("graft.constraints.pos"))
    assert(t.renameColumn("n_nationkey", "k") > 0)
    // SQL row-level ops are rejected on mapped tables (typed message)
    val mappedSnap = t.snapshot()
    assert(graft.log.ColumnMapping.hasMapping(mappedSnap.schema))
  }

  test("streaming a mapped table drains logical names equal to the batch read") {
    val (dir, t) = freshTable()
    assert(t.renameColumn("n_name", "nation_name") > 0)
    graft.streaming.GwSink.append(t.toDF.filter(col("n_nationkey") < 3), dir)
    val name = s"map_stream_${System.nanoTime()}"
    val q = spark.readStream.format("gwdelta").load(dir)
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table(name)
    assert(streamed.columns.toSeq == Seq("n_nationkey", "nation_name", "n_regionkey"))
    assert(streamed.count() == t.toDF.count())
    assert(streamed.filter(col("nation_name").isNull).count() == 0,
      "renamed column must carry the bytes through the stream")
  }

  test("rename to a taken name / unknown column / invalid name all fail") {
    val (_, t) = freshTable()
    intercept[IllegalArgumentException](t.renameColumn("n_name", "n_regionkey"))
    intercept[IllegalArgumentException](t.renameColumn("nope", "x"))
    intercept[IllegalArgumentException](t.renameColumn("n_name", "bad name"))
    intercept[IllegalArgumentException](t.dropColumn("nope"))
  }

  test("type widening: metadata-only, composes with rename, guards hold") {
    import org.apache.spark.sql.types._
    val (_, t) = freshTable()
    val files = t.snapshot().files.map(_.path).toSet
    // rename first: the widen must ride the SAME physical pin
    assert(t.renameColumn("n_nationkey", "nk") > 0)
    assert(t.widenColumn("nk", LongType) > 0)
    val snap = t.snapshot()
    assert(snap.files.map(_.path).toSet == files, "no data file may move")
    val f = snap.schema("nk")
    assert(f.dataType == LongType)
    assert(f.metadata.contains(ColumnMapping.PhysicalNameKey),
      "the physical pin must survive the widen")
    assert(f.metadata.getString("gwTypeChanges").contains("integer->long"))
    // old int32 bytes read back as longs under the mapped name
    val keys = t.toDF.select("nk").collect().map(_.getLong(0)).sorted
    assert(keys.length == 25 && keys.head == 0L && keys.last == 24L)
    // repeated widening appends to the audit trail
    assert(t.widenColumn("nk", DecimalType(25, 2)) > 0)
    assert(t.snapshot().schema("nk").metadata.getString("gwTypeChanges")
      .matches(".*integer->long@v\\d+;long->decimal\\(25,2\\)@v\\d+.*"))
    assert(t.toDF.select("nk").collect()
      .map(_.getDecimal(0).longValueExact()).sorted.toSeq == (0L to 24L))
    // guards: unknown column, non-widening, insufficient decimal digits
    intercept[IllegalArgumentException](t.widenColumn("nope", LongType))
    intercept[IllegalArgumentException](t.widenColumn("n_name", LongType))
    intercept[IllegalArgumentException](
      t.widenColumn("n_regionkey", DecimalType(9, 0)))
    // the widening matrix itself
    assert(GwTable.isWidening(IntegerType, LongType))
    assert(GwTable.isWidening(FloatType, DoubleType))
    assert(GwTable.isWidening(DateType, TimestampNTZType))
    assert(GwTable.isWidening(DecimalType(10, 2), DecimalType(14, 4)))
    assert(!GwTable.isWidening(DecimalType(10, 2), DecimalType(11, 4)))
    assert(!GwTable.isWidening(LongType, IntegerType))
    assert(!GwTable.isWidening(DoubleType, FloatType))
    assert(!GwTable.isWidening(IntegerType, StringType))
    assert(!GwTable.isWidening(IntegerType, IntegerType))
  }

  test("widening keeps pruning SOUND: encoding-changed stats and blooms stand down") {
    import org.apache.spark.sql.types._
    import graft.log.{Bound, ColRange}
    // date -> timestamp_ntz: pre-widening files harvested date stats as
    // epoch DAYS, but post-widening constraints arrive as MICROS — range
    // pruning on those stats would prune every file that actually matches
    val dir1 = Files.createTempDirectory("widen1").resolve("t").toString
    val days = spark.range(10).selectExpr(
      "id", "date_add(date'2020-01-01', cast(id as int)) as d")
    graft.streaming.GwSink.append(days.filter(col("id") < 5).coalesce(1), dir1)
    graft.streaming.GwSink.append(days.filter(col("id") >= 5).coalesce(1), dir1)
    val t1 = GwTable.forPath(spark, dir1)
    assert(t1.widenColumn("d", TimestampNTZType) > 0)
    // the raw probe shape GwStatsPruning emits for an NTZ literal
    val us = BigDecimal(java.time.LocalDate.of(2020, 1, 3).toEpochDay) *
      BigDecimal(86400L) * BigDecimal(1000000L)
    val kept = t1.snapshot().filesForRanges(Seq(
      ColRange("d", Some(Bound.Num(us)), Some(Bound.Num(us)), minStatsVersion = 2)))
    assert(kept.size == 2,
      "day-encoded stats must not serve micros probes — keep, never prune")
    // end-to-end: the equality read finds its row
    assert(spark.read.format("gwdelta").load(dir1)
      .where("d = TIMESTAMP_NTZ'2020-01-03 00:00:00'").count() == 1)

    // integral -> double: blooms hashed canonical '4'; a double probe
    // hashes '4.0' — a guaranteed miss that would silently drop the file.
    // After widening, bloom pruning stands down for the column; RANGE
    // stats stay live (numeric bounds compare exactly)
    val dir2 = Files.createTempDirectory("widen2").resolve("t").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey").cast("int").as("nk"), col("n_name"))
    Seq(0, 1).foreach { m =>
      graft.streaming.GwSink.append(src.filter(col("nk") % 2 === m).coalesce(1),
        dir2, bootstrapProps = Map(graft.log.Bloom.ColumnsProp -> "nk"))
    }
    val t2 = GwTable.forPath(spark, dir2)
    // pre-widening the bloom prunes the odd file for an integral probe
    assert(t2.snapshot().filesForRanges(Seq(ColRange("nk",
      Some(Bound.Num(BigDecimal(4))), Some(Bound.Num(BigDecimal(4)))))).size == 1)
    assert(t2.widenColumn("nk", DoubleType) > 0)
    // a double-rendered probe ('4.0') must still KEEP the matching file
    val keptD = t2.snapshot().filesForRanges(Seq(ColRange("nk",
      Some(Bound.Num(BigDecimal("4.0"))), Some(Bound.Num(BigDecimal("4.0"))))))
    assert(keptD.size == 2,
      "post-widening probes must not consult pre-widening blooms — both " +
        "files kept (ranges overlap 4), neither silently bloom-pruned")
    assert(spark.read.format("gwdelta").load(dir2)
      .where("nk = 4.0").count() == 1)
  }
}
