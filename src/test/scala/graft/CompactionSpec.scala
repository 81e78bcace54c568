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
    assert(GwTable.withRetentionCheckDisabled(spark)(
      table.vacuum(retentionMs = 0)) == 1, "exactly the orphaned rewrite")
    assert(table.toDF.count() == 28, "rows intact after vacuum")
    assert(GwTable.withRetentionCheckDisabled(spark)(
      table.vacuum(retentionMs = 0)) == 0, "live output survives vacuum")

    // lagging consumer: rows appended AFTER its position and then compacted
    // away must still be delivered (served from the original files, which
    // survive until vacuum retention passes)
    assert(table.changesSince(preVersion).count() == 3,
      "append swallowed by a later compaction")
  }

  test("zorder expressions: rank bucketing and bit interleaving") {
    import org.apache.spark.sql.graftbridge.Bridge
    import graft.functions.{BucketByBoundaries, InterleaveBits}
    val bounds: Array[AnyRef] =
      Array(java.lang.Double.valueOf(10.0), java.lang.Double.valueOf(20.0))
    def bucketOf(v: Double, scaleTo: Int = 3): Int = {
      val c = Bridge.column(BucketByBoundaries(
        Bridge.expression(lit(v).cast("double")), bounds, scaleTo))
      spark.range(1).select(c.as("b")).head().getInt(0)
    }
    assert(bucketOf(5.0) == 0)
    assert(bucketOf(10.0) == 1, "an exact boundary hit lands above it")
    assert(bucketOf(15.0) == 1)
    assert(bucketOf(25.0) == 2)
    // a low-cardinality column rescales onto the full bit range: 2
    // boundaries spread over [0, 256) as 0 / 127 / 255
    assert(bucketOf(5.0, 256) == 0)
    assert(bucketOf(15.0, 256) == 127)
    assert(bucketOf(25.0, 256) == 255)
    // interleave buckets 3 (011) and 5 (101) over 3 bits:
    // pos0=b0.0=1, pos1=b1.0=1, pos2=b0.1=1, pos3=b1.1=0, pos4=b0.2=0,
    // pos5=b1.2=1 -> 1+2+4+32 = 39
    val z = Bridge.column(InterleaveBits(Seq(
      Bridge.expression(lit(3)), Bridge.expression(lit(5))), 3))
    assert(spark.range(1).select(z.as("z")).head().getLong(0) == 39L)
  }

  test("multi-column clustering is Z-order: the SECOND column also prunes") {
    val tmp = Files.createTempDirectory("compact-zorder")
    val loc = tmp.resolve("t").toString
    // 16 small commits; a and b are independent grid coordinates, and every
    // commit file spans the FULL a range (b is the slowly-varying one)
    for (i <- 0 until 16) {
      spark.range(i * 2500L, (i + 1) * 2500L)
        .selectExpr("id % 500 AS a", "CAST(id DIV 500 AS BIGINT) AS b")
        .coalesce(1).write.format("gwdelta").mode("append").save(loc)
    }
    val table = GwTable.forPath(spark, loc)
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          ScanPeel.peel(b.scan).asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.head

    assert(table.compact(targetFileBytes = 24L * 1024,
      clusterBy = Seq("a", "b")) > 0)
    val filesAfter = table.snapshot().files.size
    assert(filesAfter >= 4, s"need a real tiling to test pruning: $filesAfter")
    val onA = plannedFiles(table.toDF.filter(col("a") < 60))
    val onB = plannedFiles(table.toDF.filter(col("b") < 10))
    // a lexicographic (a, b) sort leaves every file spanning b's full
    // range — pruning on b alone is the Z-order win
    assert(onA < filesAfter, s"a-filter planned $onA of $filesAfter")
    assert(onB < filesAfter, s"b-filter planned $onB of $filesAfter")
    // content untouched
    assert(table.toDF.count() == 40000)
    assert(table.toDF.agg(sum(col("a") + col("b") * 500)).head().getLong(0) ==
      (0L until 40000L).sum)
    assert(table.toDF.filter(col("b") < 10).count() == 5000)
  }

  test("SQL OPTIMIZE ZORDER BY gives the SECOND clustered column pruning") {
    // same grid fixture as the API-path test above, but driven end to end
    // through spark.sql: catalog table, INSERTs, conf-sized OPTIMIZE —
    // pinning the parser -> GwOptimizeCommand -> Morton-compact plumbing
    // against a regression to a lexicographic clustered sort (which would
    // leave every output file spanning b's full range).
    graft.operators.GwCore.ensureGwCatalog(spark)
    val ns = s"zns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val loc = Files.createTempDirectory("sql-zorder").resolve("t").toString
    spark.sql(s"CREATE TABLE gw.$ns.t (a BIGINT, b BIGINT) USING gwdelta " +
      s"LOCATION '$loc'")
    for (i <- 0 until 16) {
      spark.range(i * 2500L, (i + 1) * 2500L)
        .selectExpr("id % 500 AS a", "CAST(id DIV 500 AS BIGINT) AS b")
        .coalesce(1).createOrReplaceTempView("sql_zorder_src")
      spark.sql(s"INSERT INTO gw.$ns.t SELECT * FROM sql_zorder_src")
    }
    val sizeKey = "spark.graft.optimize.targetFileBytes"
    spark.conf.set(sizeKey, (24L * 1024).toString)
    try {
      val opt = spark.sql(s"OPTIMIZE gw.$ns.t ZORDER BY (a, b)").collect()
      assert(opt.length == 1 && opt.head.getLong(1) > 0, "OPTIMIZE must commit")
    } finally spark.conf.unset(sizeKey)
    val table = GwTable.forPath(spark, loc)
    val filesAfter = table.snapshot().files.size
    assert(filesAfter >= 4, s"conf-sized OPTIMIZE must tile: $filesAfter files")
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          ScanPeel.peel(b.scan).asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.head
    val onA = plannedFiles(spark.sql(s"SELECT * FROM gw.$ns.t WHERE a < 60"))
    val onB = plannedFiles(spark.sql(s"SELECT * FROM gw.$ns.t WHERE b < 10"))
    assert(onA < filesAfter, s"a-filter planned $onA of $filesAfter")
    assert(onB < filesAfter, s"b-filter planned $onB of $filesAfter")
    assert(spark.sql(s"SELECT count(*) FROM gw.$ns.t").head().getLong(0) == 40000L)
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
          ScanPeel.peel(b.scan).asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
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

  test("concurrentGroups: order kept, genuinely concurrent, errors unwrapped") {
    // order: results concatenate in ITEM order regardless of completion
    // order (slow first group must not reorder the commit's actions)
    val out = GwTable.concurrentGroups(Seq(30, 1, 10)) { ms =>
      Thread.sleep(ms.toLong); Seq(ms, ms * 100)
    }
    assert(out == Seq(30, 3000, 1, 100, 10, 1000), s"order broke: $out")
    // concurrency: two groups each await the OTHER's arrival — only a
    // pool actually running >= 2 groups at once can pass within the
    // timeout (a sequential fallback would deadlock until await fails)
    val latch = new java.util.concurrent.CountDownLatch(2)
    val met = GwTable.concurrentGroups(Seq(1, 2)) { i =>
      latch.countDown()
      Seq(latch.await(20, java.util.concurrent.TimeUnit.SECONDS))
    }
    assert(met == Seq(true, true), "groups never overlapped in flight")
    // failures rethrow the ORIGINAL exception (typed OCC/validation
    // messages must survive the executor boundary unwrapped)
    val boom = intercept[IllegalStateException] {
      GwTable.concurrentGroups(Seq(1, 2, 3)) { i =>
        if (i == 2) throw new IllegalStateException("typed group failure")
        Seq(i)
      }
    }
    assert(boom.getMessage == "typed group failure")
  }
}
