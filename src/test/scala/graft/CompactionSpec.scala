package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** OPTIMIZE semantics: fewer files, identical rows, no phantom changes for
  * incremental consumers (dataChange=false adds/removes). */
class CompactionSpec extends AnyFunSuite {
  private val spark = SparkSpec.session
  private val sf = "/root/testdata/sf0.001"

  test("compact consolidates files without changing rows or leaking changes") {
    // stage a table whose single commit has 3 small files
    val tmp = Files.createTempDirectory("compact-spec")
    val folder = tmp.resolve("data/t/100/1700000000000")
    Files.createDirectories(folder)
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    for ((lo, hi, i) <- Seq((0, 8, 0), (9, 16, 1), (17, 24, 2))) {
      val part = Files.createTempDirectory(s"compact-part-$i")
      nation.filter(col("n_nationkey").between(lo, hi)).coalesce(1)
        .write.mode("overwrite").parquet(part.toString)
      val f = part.toFile.listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(f.toPath, folder.resolve(s"part-$i.parquet"))
    }
    Files.writeString(tmp.resolve("manifest.json"),
      s"""{"t": {"lastSuccessfulWriteTimestamp": "9999999999999",
         |"totalProcessedRecordsCount": 25,
         |"dataFilesPath": "${tmp.toAbsolutePath}/data/t/",
         |"schemaHistory": {"100": "1700000000000"}}}""".stripMargin)
    val db = tmp.resolve("db").toString
    Indexer.index(tmp.resolve("manifest.json").toString, db, SaveMode.Overwrite)(spark)

    val table = GwTable.forPath(spark, s"$db/t")
    val preVersion = table.log.latestVersion().get
    val before = table.toDF.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(table.snapshot().files.size == 3)

    // a streaming consumer is already caught up
    val cp = tmp.resolve("cp").toString
    val out = tmp.resolve("out").toString
    def drain(): Long = {
      val pre = if (Files.exists(Paths.get(out))) spark.read.parquet(out).count() else 0L
      val q = spark.readStream.format("gwdelta").load(s"$db/t")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", cp).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).count() - pre
    }
    assert(drain() == 25)

    val v = table.compact()
    assert(v == preVersion + 1)
    assert(table.snapshot().files.size == 1, "3 small files -> 1")
    assert(table.snapshot().files.head.stats.isDefined, "compacted file carries stats")
    val after = table.toDF.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(after.toSeq == before.toSeq, "rows unchanged by compaction")

    // incremental consumers see nothing new
    assert(table.changesSince(preVersion).count() == 0)
    assert(drain() == 0, "stream must not re-emit compacted rows")
    // history records the maintenance op
    val lastOp = table.history.orderBy(col("version").desc)
      .select("operation").head.getString(0)
    assert(lastOp == "OPTIMIZE")
    // nothing left to compact at this size
    assert(table.compact() == -1L)

    // vacuum: a later commit + second compaction round orphans the first
    // round's output; zero-retention vacuum deletes exactly the orphan
    val extra = tmp.resolve("data/t/100/1700000001000")
    Files.createDirectories(extra)
    val part = Files.createTempDirectory("compact-extra")
    nation.filter(col("n_nationkey") < 3).coalesce(1)
      .write.mode("overwrite").parquet(part.toString)
    val f2 = part.toFile.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(f2.toPath, extra.resolve("part-0.parquet"))
    Indexer.index(tmp.resolve("manifest.json").toString, db, SaveMode.Append)(spark)
    assert(table.snapshot().files.size == 2)
    val firstCompacted = table.snapshot().files
      .map(_.path).find(_.contains("_compacted")).get
    assert(table.compact() > 0)
    assert(table.snapshot().files.size == 1)
    assert(!table.snapshot().files.map(_.path).contains(firstCompacted))
    assert(table.vacuum(retentionMs = 0) == 1, "exactly the orphaned rewrite")
    assert(table.toDF.count() == 28, "rows intact after vacuum")
    assert(table.vacuum(retentionMs = 0) == 0, "live output survives vacuum")

    // lagging consumer: rows appended AFTER its position and then compacted
    // away must still be delivered (served from the original files, which
    // survive until vacuum retention passes)
    assert(table.changesSince(preVersion).count() == 3,
      "append swallowed by a later compaction")
  }

  test("clustered compaction makes selective scans plan fewer files") {
    // 3 commit files that INTERLEAVE the key space: every file spans almost
    // the whole o_orderkey range, so stats skipping can't drop any of them
    val tmp = Files.createTempDirectory("compact-cluster")
    val folder = tmp.resolve("data/t/100/1700000000000")
    Files.createDirectories(folder)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val nRows = orders.count()
    for (i <- 0 until 3) {
      val part = Files.createTempDirectory(s"cluster-part-$i")
      orders.filter(col("o_orderkey") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(part.toString)
      val f = part.toFile.listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(f.toPath, folder.resolve(s"part-$i.parquet"))
    }
    Files.writeString(tmp.resolve("manifest.json"),
      s"""{"t": {"lastSuccessfulWriteTimestamp": "9999999999999",
         |"totalProcessedRecordsCount": $nRows,
         |"dataFilesPath": "${tmp.toAbsolutePath}/data/t/",
         |"schemaHistory": {"100": "1700000000000"}}}""".stripMargin)
    val db = tmp.resolve("db").toString
    Indexer.index(tmp.resolve("manifest.json").toString, db, SaveMode.Overwrite)(spark)
    val table = GwTable.forPath(spark, s"$db/t")

    def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.head

    val maxKey = orders.agg(org.apache.spark.sql.functions.max(col("o_orderkey")))
      .head().getLong(0)
    val selective = () => table.toDF.filter(col("o_orderkey") < maxKey / 10)
    val selectiveRows = selective().count()
    assert(plannedFiles(selective()) == 3,
      "interleaved files must all survive pruning before clustering")

    // cluster the rewrite on the filter column into range-disjoint files
    // (target sized so every part qualifies as small and >= 2 files emerge)
    assert(table.compact(targetFileBytes = 24L * 1024,
      clusterBy = Seq("o_orderkey")) > 0)
    val filesAfter = table.snapshot().files.size
    assert(filesAfter > 1, "rewrite kept multiple files")
    val planned = plannedFiles(selective())
    assert(planned < filesAfter,
      s"clustered stats should prune: planned $planned of $filesAfter")
    // content is untouched
    assert(selective().count() == selectiveRows)
    assert(table.toDF.count() == nRows)
    // bad column fails fast
    val e = intercept[IllegalArgumentException] {
      table.compact(clusterBy = Seq("nope"))
    }
    assert(e.getMessage.contains("clusterBy"))
  }
}
