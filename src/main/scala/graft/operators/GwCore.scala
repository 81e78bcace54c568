package graft.operators

import graft.{GwTable, Indexer}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/**
 * The core engine (CDA discovery -> transaction-log generation -> time-travel
 * reads) exercised inside the driver's correctness gate: each query composes
 * a CDA layout from a testdata table, indexes it, and reads it back through
 * the generated log, so the DuckDB oracle over the ORIGINAL parquet validates
 * the whole index->commit->replay->scan path end-to-end.
 *
 * Layout composed (reference layout, SURVEY §1.1):
 *   <tmp>/data/<table>/<schemaId>/<commitTimestamp>/part-*.parquet
 */
object GwCore {

  private def layout(tmp: Path, table: String, commits: Seq[(String, Long, Seq[String])]): String = {
    // commits: (schemaId, commitTimestamp, source parquet files to copy)
    commits.foreach { case (schemaId, ts, files) =>
      val dir = tmp.resolve(s"data/$table/$schemaId/$ts")
      Files.createDirectories(dir)
      files.zipWithIndex.foreach { case (src, i) =>
        Files.copy(Paths.get(src), dir.resolve(s"part-$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val schemaHistory = commits.groupBy(_._1).map { case (sid, cs) =>
      s""""$sid": "${cs.map(_._2).min}""""
    }.mkString(", ")
    val manifest = tmp.resolve("manifest.json")
    Files.writeString(manifest,
      s"""{"$table": {"lastSuccessfulWriteTimestamp": "9999999999999",
         |"totalProcessedRecordsCount": 1,
         |"dataFilesPath": "${tmp.toAbsolutePath}/data/$table/",
         |"schemaHistory": {$schemaHistory}}}""".stripMargin)
    manifest.toAbsolutePath.toString
  }

  // ---------------------------------------------------------------- gw01
  /** Index one commit of `nation`, read latest through the generated log. */
  def gw01IndexRead(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw01")
    val manifest = layout(tmp, "nation",
      Seq(("100", 1700000000000L, Seq(s"$dir/nation.parquet"))))
    val db = tmp.resolve("db").toString
    Indexer.index(manifest, db, SaveMode.Overwrite)(spark)
    GwTable.forPath(spark, s"$db/nation").toDF
  }

  // ---------------------------------------------------------------- gw02
  /** Two append commits, then time-travel back to version 0: the replayed
    * snapshot must equal the single original table. */
  def gw02TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw02")
    val manifest = layout(tmp, "region", Seq(
      ("100", 1700000000000L, Seq(s"$dir/region.parquet")),
      ("100", 1700000001000L, Seq(s"$dir/region.parquet"))))
    val db = tmp.resolve("db").toString
    Indexer.index(manifest, db, SaveMode.Overwrite)(spark)
    GwTable.forPath(spark, s"$db/region").versionAsOf(0)
  }

  // ---------------------------------------------------------------- gw03
  /** Schema-evolution restatement: a second fingerprint REPLACES the table
    * (reference semantics, SURVEY §2.6.2) — latest snapshot = new fingerprint
    * content only, with the new schema. */
  def gw03Restatement(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw03")
    val manifest = layout(tmp, "t", Seq(
      ("100", 1700000000000L, Seq(s"$dir/nation.parquet")),
      ("200", 1700000001000L, Seq(s"$dir/region.parquet"))))
    val db = tmp.resolve("db").toString
    Indexer.index(manifest, db, SaveMode.Overwrite)(spark)
    GwTable.forPath(spark, s"$db/t").toDF
  }

  // ---------------------------------------------------------------- gw04
  /** Incremental append: index, add a commit, index again in Append mode —
    * checkpoints skip the already-processed folder; latest = union of both. */
  def gw04IncrementalAppend(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw04")
    val manifest = layout(tmp, "nation", Seq(
      ("100", 1700000000000L, Seq(s"$dir/nation.parquet"))))
    val db = tmp.resolve("db").toString
    Indexer.index(manifest, db, SaveMode.Append)(spark)
    // second CDA write arrives
    layout(tmp, "nation", Seq(
      ("100", 1700000000000L, Seq(s"$dir/nation.parquet")),
      ("100", 1700000002000L, Seq(s"$dir/nation.parquet"))))
    Indexer.index(manifest, db, SaveMode.Append)(spark)
    GwTable.forPath(spark, s"$db/nation").toDF
  }

  // ---------------------------------------------------------------- gw05
  /** The DSv2 connector surface: `format("gwdelta")` with time travel via
    * SQL-style options; scan delegated to the parquet V2 table (pushdown
    * verified in GwDeltaSourceSpec). */
  def gw05DataSourceV2(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw05")
    val manifest = layout(tmp, "nation", Seq(
      ("100", 1700000000000L, Seq(s"$dir/nation.parquet")),
      ("100", 1700000001000L, Seq(s"$dir/nation.parquet"))))
    val db = tmp.resolve("db").toString
    Indexer.index(manifest, db, SaveMode.Overwrite)(spark)
    spark.read.format("gwdelta").option("versionAsOf", 0).load(s"$db/nation")
  }

  // ---------------------------------------------------------------- gw06
  /** Incremental consumption via `changesSince`: after a second commit, a
    * consumer that already processed v0 reads ONLY the newly added files —
    * the metadata-level file diff, no reprocessing of old data. */
  def gw06ChangesSince(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw06")
    val manifest = layout(tmp, "region", Seq(
      ("100", 1700000000000L, Seq(s"$dir/region.parquet")),
      ("100", 1700000001000L, Seq(s"$dir/region.parquet"))))
    val db = tmp.resolve("db").toString
    Indexer.index(manifest, db, SaveMode.Overwrite)(spark)
    GwTable.forPath(spark, s"$db/region").changesSince(0L)
  }

  // ---------------------------------------------------------------- gw07
  /** Streaming tail of the generated log: `readStream.format("gwdelta")`
    * drained with AvailableNow — the initial batch is the live snapshot, so
    * a two-commit table yields both commits' rows through the streaming
    * path (same result the batch read gives, which is what the oracle
    * checks). */
  def gw07StreamTail(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw07")
    val manifest = layout(tmp, "region", Seq(
      ("100", 1700000000000L, Seq(s"$dir/region.parquet")),
      ("100", 1700000001000L, Seq(s"$dir/region.parquet"))))
    val db = tmp.resolve("db").toString
    Indexer.index(manifest, db, SaveMode.Overwrite)(spark)
    val name = s"gw07_drain_${System.nanoTime()}"
    val q = spark.readStream.format("gwdelta").load(s"$db/region")
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  // ---------------------------------------------------------------- gw08
  /** Compaction in-gate: consolidate a two-commit table's files via
    * OPTIMIZE and read the result — rows must equal the uncompacted oracle
    * exactly (the rewrite is content-neutral by contract). */
  def gw08Compaction(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw08")
    val manifest = layout(tmp, "region", Seq(
      ("100", 1700000000000L, Seq(s"$dir/region.parquet")),
      ("100", 1700000001000L, Seq(s"$dir/region.parquet"))))
    val db = tmp.resolve("db").toString
    Indexer.index(manifest, db, SaveMode.Overwrite)(spark)
    val table = graft.GwTable.forPath(spark, s"$db/region")
    require(table.compact() > 0, "expected a compaction commit")
    require(table.snapshot().files.size == 1, "2 files -> 1")
    table.toDF
  }

  // ---------------------------------------------------------------- gw09
  /** Full storage-maintenance lifecycle in-gate: compact, take another CDA
    * append, compact again (orphaning the first rewrite), zero-retention
    * vacuum (must delete exactly that orphan — CDA source files are never
    * vacuum candidates: shallow-clone semantics, the originals belong to
    * the producer), then read. Content must equal the three raw commits. */
  def gw09Vacuum(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw09")
    val manifest = layout(tmp, "region", Seq(
      ("100", 1700000000000L, Seq(s"$dir/region.parquet")),
      ("100", 1700000001000L, Seq(s"$dir/region.parquet"))))
    val db = tmp.resolve("db").toString
    Indexer.index(manifest, db, SaveMode.Append)(spark)
    val table = GwTable.forPath(spark, s"$db/region")
    require(table.compact() > 0, "first compaction commits")
    layout(tmp, "region", Seq(
      ("100", 1700000000000L, Seq(s"$dir/region.parquet")),
      ("100", 1700000001000L, Seq(s"$dir/region.parquet")),
      ("100", 1700000002000L, Seq(s"$dir/region.parquet"))))
    Indexer.index(manifest, db, SaveMode.Append)(spark)
    require(table.compact() > 0, "second compaction supersedes the first")
    require(GwTable.withRetentionCheckDisabled(spark)(
      table.vacuum(retentionMs = 0)) == 1, "exactly the orphaned rewrite")
    table.toDF
  }

  // ---------------------------------------------------------------- gw10
  /** Streaming WRITE path: a file stream drained through
    * `foreachBatch -> GwSink.append`, one log commit per micro-batch
    * (two staged copies, one file per trigger -> CREATE TABLE bootstrap
    * then a WRITE append), read back through the generated log. Closes the
    * loop with gw07: the engine both tails and feeds its own table format
    * from Structured Streaming. */
  def gw10StreamSink(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw10")
    val tablePath = tmp.resolve("db/region_sunk").toString
    val src = Paths.get(s"$dir/region.parquet")
    val stage = Files.createTempDirectory("gw10-stage")
    graft.streaming.StreamOps.stageLinks(src, stage, Seq("a.parquet", "b.parquet"))
    val schema = spark.read.parquet(src.toString).schema
    // stream identity in the txnId (see GwSink scaladoc): batch ids alone
    // would collide with a different stream's commits on the same table
    val streamId = java.util.UUID.randomUUID().toString
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.streaming.GwSink.append(batch, tablePath, Some(s"$streamId/$batchId")); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val table = GwTable.forPath(spark, tablePath)
    require(table.snapshot().version >= 1L, "one commit per micro-batch")
    table.toDF
  }

  // ---------------------------------------------------------------- gw11
  /** The declarative face of gw10: `writeStream.format("gwdelta")` — the
    * connector's V1 sink bootstraps the log on the first commit (the sink
    * target starts with no log at all) and appends one version per
    * micro-batch with batchId-keyed idempotence. Source and sink are now
    * the same `format("gwdelta")` surface. */
  def gw11StreamSinkFormat(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw11")
    val tablePath = tmp.resolve("db/region_sunk").toString
    val src = Paths.get(s"$dir/region.parquet")
    val stage = Files.createTempDirectory("gw11-stage")
    graft.streaming.StreamOps.stageLinks(src, stage, Seq("a.parquet", "b.parquet"))
    val schema = spark.read.parquet(src.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .writeStream
      .format("gwdelta")
      .option("checkpointLocation", tmp.resolve("cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(tablePath)
    q.awaitTermination()
    val table = GwTable.forPath(spark, tablePath)
    require(table.snapshot().version >= 1L, "one commit per micro-batch")
    table.toDF
  }

  /** Register the `gw` catalog in this session if absent (resolved lazily
    * from conf, cached per session; the warehouse only holds pointer
    * files, so one shared temp dir serves every gate invocation). Sets
    * the warehouse too when only the catalog key is present, so a
    * half-configured session can't fail catalog init. */
  private[graft] def ensureGwCatalog(spark: SparkSession): Unit = {
    if (!spark.conf.getOption("spark.sql.catalog.gw").contains(
        classOf[graft.sources.GwCatalog].getName))
      spark.conf.set("spark.sql.catalog.gw", classOf[graft.sources.GwCatalog].getName)
    if (spark.conf.getOption("spark.sql.catalog.gw.warehouse").isEmpty)
      spark.conf.set("spark.sql.catalog.gw.warehouse",
        Files.createTempDirectory("gw-warehouse").toString)
  }

  // ---------------------------------------------------------------- gw12
  /** The reference's showcase SQL surface (reference README.md:74-84) end
    * to end: register the catalog, CREATE TABLE ... USING gwdelta LOCATION,
    * then time-travel with native `VERSION AS OF` SQL. The result is v0 of
    * a two-commit table — one copy of nation — read entirely through
    * Spark's catalog + time-travel resolution (no options, no temp views). */
  def gw12SqlCatalog(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw12")
    val manifest = layout(tmp, "nation", Seq(
      ("100", 1700000000000L, Seq(s"$dir/nation.parquet")),
      ("100", 1700000001000L, Seq(s"$dir/nation.parquet"))))
    val db = tmp.resolve("db").toString
    Indexer.index(manifest, db, SaveMode.Overwrite)(spark)
    ensureGwCatalog(spark)
    // unique namespace per invocation: the gate and bench re-run queries
    // inside one session, and CREATE TABLE is (correctly) create-once
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$db/nation'")
    spark.sql(s"SELECT * FROM gw.$ns.nation VERSION AS OF 0")
  }

  // ---------------------------------------------------------------- gw13
  /** SQL DML surface: CREATE TABLE with declared columns (no log yet),
    * INSERT INTO bootstrapping the log, a second append, then INSERT
    * OVERWRITE truncating to one copy atomically — all through the
    * catalog, no API calls. Final content = exactly one copy of region
    * (the oracle), with the append history still time-travelable. */
  def gw13SqlInsert(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw13")
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.read.parquet(s"$dir/region.parquet").createOrReplaceTempView("gw13_region_src")
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    // INT like the source parquet: INSERT's store assignment would silently
    // widen into a declared BIGINT and dtype-drift the oracle compare
    spark.sql(s"CREATE TABLE gw.$ns.region (r_regionkey INT, r_name STRING) " +
      s"USING gwdelta LOCATION '${tmp.resolve("db/region").toString}'")
    spark.sql(s"INSERT INTO gw.$ns.region SELECT r_regionkey, r_name FROM gw13_region_src")
    spark.sql(s"INSERT INTO gw.$ns.region SELECT r_regionkey, r_name FROM gw13_region_src")
    require(spark.sql(s"SELECT * FROM gw.$ns.region").count() == 2 *
      spark.table("gw13_region_src").count(), "two appends before the overwrite")
    spark.sql(s"INSERT OVERWRITE gw.$ns.region SELECT r_regionkey, r_name FROM gw13_region_src")
    spark.sql(s"SELECT * FROM gw.$ns.region")
  }

  // ---------------------------------------------------------------- gw14
  /** Clustered compaction in-gate: two region commits rewritten with
    * compact(clusterBy = r_regionkey) — the rewrite is content-neutral
    * (oracle = both commits), range-sorted so harvested stats become
    * file-level partition bounds, and a selective read must plan fewer
    * files than the snapshot holds. */
  def gw14ClusteredCompact(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw14")
    val manifest = layout(tmp, "region", Seq(
      ("100", 1700000000000L, Seq(s"$dir/region.parquet")),
      ("100", 1700000001000L, Seq(s"$dir/region.parquet"))))
    val db = tmp.resolve("db").toString
    Indexer.index(manifest, db, SaveMode.Overwrite)(spark)
    val table = GwTable.forPath(spark, s"$db/region")
    // tiny target so the rewrite still yields >= 2 range-disjoint files
    require(table.compact(targetFileBytes = 2048, clusterBy = Seq("r_regionkey")) > 0,
      "expected a clustered compaction commit")
    val files = table.snapshot().files.size
    require(files >= 2, s"expected >= 2 clustered files, got $files")
    val planned = table.toDF.filter(org.apache.spark.sql.functions.col("r_regionkey") === 0)
      .queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan).asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.head
    require(planned < files, s"clustered stats must prune: planned $planned of $files")
    table.toDF
  }

  // ---------------------------------------------------------------- gw15
  /** SQL row-level DELETE end to end: four INSERTs with known disjoint
    * o_orderkey ranges, then `DELETE FROM ... WHERE o_orderkey < 5600`
    * through the catalog — the first range's file fully matches (tombstoned
    * metadata-only, no bytes move), the second partially (copy-on-write
    * rewrite under `_dml/`), and the upper two ranges must survive
    * untouched (their files stats-pruned out of the delete's scan). The
    * removed rows stay time-travelable: the pre-delete version still counts
    * every row. Result = the table after DELETE (timestamps formatted — the
    * source is parquet timestamp[ms], which pandas would otherwise compare
    * at mismatched precision). */
  def gw15SqlDelete(spark: SparkSession, dir: String): DataFrame = {
    val (name, loc) = rangedOrdersTable(spark, dir, "gw15")
    val table = GwTable.forPath(spark, loc)
    val before = table.snapshot().files.map(_.path)
    val preDeleteVersion = table.snapshot().version
    val preCount = spark.table(name).count()
    spark.sql(s"DELETE FROM $name WHERE o_orderkey < 5600")
    val after = table.snapshot()
    val live = after.files.map(_.path).toSet
    // the file-level classification is only observable when the fixture got
    // its full 4-file shape (keys reach 15000, i.e. sf >= 0.01); at smaller
    // SFs the DELETE is still row-correct, there is just one file to touch
    if (before.size == 4) {
      require(after.files.exists(_.path.contains("/_dml/")),
        "expected a copy-on-write rewrite file for the partially-matching range")
      require(before.count(p => !live.contains(p)) >= 2,
        "expected the fully- and partially-matching files tombstoned")
      require(before.count(live.contains) >= 2,
        "expected the upper ranges' files to survive untouched")
    }
    require(spark.sql(
      s"SELECT * FROM $name VERSION AS OF $preDeleteVersion").count() == preCount,
      "pre-delete version must still serve every row (time travel)")
    spark.sql(s"SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
      "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate_s, " +
      s"o_orderpriority FROM $name")
  }

  /** Shared gw15-17 fixture: a gwdelta `orders` table committed as four
    * files with known disjoint o_orderkey ranges (so DML file
    * classification is observable), registered in the catalog under a
    * fresh namespace. Returns (qualified SQL name, table path). */
  private def rangedOrdersTable(spark: SparkSession, dir: String,
      tag: String): (String, String) = {
    val tmp = Files.createTempDirectory(tag)
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView(s"${tag}_orders_src")
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val loc = tmp.resolve("db/orders").toString
    spark.sql(s"CREATE TABLE gw.$ns.orders (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate TIMESTAMP, " +
      s"o_orderpriority STRING) USING gwdelta LOCATION '$loc'")
    Seq(0 -> 3750, 3750 -> 7500, 7500 -> 11250, 11250 -> 15000).foreach { case (lo, hi) =>
      spark.sql(s"INSERT INTO gw.$ns.orders SELECT * FROM ${tag}_orders_src " +
        s"WHERE o_orderkey >= $lo AND o_orderkey < $hi")
    }
    (s"gw.$ns.orders", loc)
  }

  // ---------------------------------------------------------------- gw16
  /** Row-level UPDATE end to end: reprice every order below the cutoff
    * (assignments see the PRE-update row; `* 2` is an exact IEEE doubling,
    * so the oracle compares bit-identical doubles). Files above the cutoff
    * must survive untouched — only the matching ranges rewrite. */
  def gw16ApiUpdate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val (name, loc) = rangedOrdersTable(spark, dir, "gw16")
    val table = GwTable.forPath(spark, loc)
    val before = table.snapshot().files.map(_.path)
    require(table.update(col("o_orderkey") < 5600, Map(
      "o_totalprice" -> (col("o_totalprice") * 2),
      "o_orderpriority" -> lit("REPRICED"))) > 0, "expected an UPDATE commit")
    val live = table.snapshot().files.map(_.path).toSet
    // file-survival only observable with the full 4-file fixture (sf >= 0.01)
    if (before.size == 4) {
      require(before.count(live.contains) >= 2,
        "files above the cutoff must survive untouched")
      require(live.exists(_.contains("/_dml/")), "expected rewritten files")
    }
    spark.sql(s"SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
      "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate_s, " +
      s"o_orderpriority FROM $name")
  }

  // ---------------------------------------------------------------- gw17
  /** MERGE (upsert) end to end: source = a repriced upper slice — matched
    * target rows take the source price (`* 3`, exact in IEEE), source rows
    * beyond the target's range are appended, and the target file wholly
    * below the source's key range must survive byte-identical. */
  def gw17ApiMerge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (name, loc) = rangedOrdersTable(spark, dir, "gw17")
    val table = GwTable.forPath(spark, loc)
    // full fixture shape (4 range files; keys reach 15000) exists at
    // sf >= 0.01; below that the merge is a row-correct no-op upsert and
    // the file-level assertions have nothing to observe
    val full = table.snapshot().files.size == 4
    // shrink the target to the two lower ranges so the merge both updates
    // (5600..7500) and inserts (7500..9000)
    val deleted = table.delete(col("o_orderkey") >= 7500)
    if (full) require(deleted > 0)
    val before = table.snapshot().files.map(_.path)
    val src = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") >= 5600 && col("o_orderkey") < 9000)
      .withColumn("o_totalprice", col("o_totalprice") * 3)
    val merged = table.merge(src, col("t.o_orderkey") === col("s.o_orderkey"),
      whenMatchedSet = Map("o_totalprice" -> col("s.o_totalprice")))
    if (full) {
      require(merged > 0, "expected a MERGE commit")
      val live = table.snapshot().files.map(_.path).toSet
      require(live.contains(before.head),
        "the file below the source's key range must survive untouched")
      require(!live.contains(before(1)), "the overlapping file must be rewritten")
    }
    spark.sql(s"SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
      "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate_s, " +
      s"o_orderpriority FROM $name")
  }

  // ---------------------------------------------------------------- gw18
  /** Schema evolution end to end: a declared-schema table, one INSERT, then
    * `ALTER TABLE ... ADD COLUMNS (r_flag STRING)` — a metadata-only commit
    * (asserted: zero files rewritten) — then a second INSERT carrying the
    * new column. The read must null-fill the pre-evolution file and serve
    * the new column from the post-evolution file; the pre-ALTER version
    * still time-travels with the narrow schema. */
  def gw18SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw18")
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.read.parquet(s"$dir/region.parquet").createOrReplaceTempView("gw18_region_src")
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val loc = tmp.resolve("db/region").toString
    spark.sql(s"CREATE TABLE gw.$ns.region (r_regionkey INT, r_name STRING) " +
      s"USING gwdelta LOCATION '$loc'")
    spark.sql(s"INSERT INTO gw.$ns.region SELECT r_regionkey, r_name FROM gw18_region_src")
    val table = GwTable.forPath(spark, loc)
    val preAlter = table.snapshot().version
    val filesBefore = table.snapshot().files.map(_.path).toSet
    spark.sql(s"ALTER TABLE gw.$ns.region ADD COLUMNS (r_flag STRING)")
    require(table.snapshot().files.map(_.path).toSet == filesBefore,
      "ADD COLUMNS must be metadata-only: no files rewritten")
    require(spark.sql(s"SELECT * FROM gw.$ns.region VERSION AS OF $preAlter")
      .columns.sameElements(Array("r_regionkey", "r_name")),
      "pre-ALTER version must keep the narrow schema")
    spark.sql(s"INSERT INTO gw.$ns.region " +
      "SELECT r_regionkey + 100, r_name, 'NEW' FROM gw18_region_src")
    spark.sql(s"SELECT r_regionkey, r_name, r_flag FROM gw.$ns.region")
  }

  // ---------------------------------------------------------------- gw19
  /** Row-level change feed end to end: a DELETE (partial copy-on-write,
    * so the rewrite's surviving rows must cancel out of the diff) then an
    * INSERT, consumed as `rowChanges(v0)` — exactly the deleted rows
    * surface as 'delete' at the first commit and the appended rows as
    * 'insert' at the second. `change_seq` = commit offset from v0, making
    * the oracle version-number-independent. */
  def gw19RowChanges(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (name, loc) = rangedOrdersTable(spark, dir, "gw19")
    val table = GwTable.forPath(spark, loc)
    val v0 = table.snapshot().version
    spark.sql(s"DELETE FROM $name WHERE o_orderkey < 2000")
    spark.sql(s"INSERT INTO $name SELECT o_orderkey + 100000, o_custkey, " +
      "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority " +
      "FROM gw19_orders_src WHERE o_orderkey < 500")
    table.rowChanges(v0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        org.apache.spark.sql.functions.date_format(
          col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_orderdate_s"),
        col("o_orderpriority"),
        (col("_commit_version") - v0).as("change_seq"),
        col("_change_type"))
  }

  // ---------------------------------------------------------------- gw20
  /** SQL `UPDATE` end to end (SupportsRowLevelOperations, group-based
    * copy-on-write): same repricing as gw16 but through the parser — the
    * condition is pushed to the operation's scan for stats-based group
    * selection, so the two files above the cutoff survive untouched, and
    * the replacement commits atomically through the engine's log. */
  def gw20SqlUpdate(spark: SparkSession, dir: String): DataFrame = {
    val (name, loc) = rangedOrdersTable(spark, dir, "gw20")
    val table = GwTable.forPath(spark, loc)
    val before = table.snapshot().files.map(_.path)
    spark.sql(s"UPDATE $name SET o_totalprice = o_totalprice * 2, " +
      "o_orderpriority = 'REPRICED' WHERE o_orderkey < 5600")
    val live = table.snapshot().files.map(_.path).toSet
    // file-survival only observable with the full 4-file fixture (sf >= 0.01)
    if (before.size == 4) {
      require(before.count(live.contains) >= 2,
        "files above the cutoff must survive untouched (stats-pruned groups)")
      require(live.exists(_.contains("/_dml/")), "expected rewritten files")
    }
    spark.sql(s"SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
      "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate_s, " +
      s"o_orderpriority FROM $name")
  }

  // ---------------------------------------------------------------- gw21
  /** SQL `MERGE INTO` end to end: gw17's upsert through the parser —
    * matched target rows take the source's tripled price, source rows
    * beyond the target's range insert by position (`INSERT *`), one
    * atomic ReplaceData commit. */
  def gw21SqlMerge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (name, loc) = rangedOrdersTable(spark, dir, "gw21")
    val table = GwTable.forPath(spark, loc)
    val full = table.snapshot().files.size == 4
    val deleted = table.delete(col("o_orderkey") >= 7500)
    if (full) require(deleted > 0)
    spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") >= 5600 && col("o_orderkey") < 9000)
      .withColumn("o_totalprice", col("o_totalprice") * 3)
      .createOrReplaceTempView("gw21_src")
    spark.sql(s"""MERGE INTO $name t USING gw21_src s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
      WHEN NOT MATCHED THEN INSERT *""")
    spark.sql(s"SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
      "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate_s, " +
      s"o_orderpriority FROM $name")
  }

  // ---------------------------------------------------------------- gw22
  /** CTAS / RTAS through the catalog: `CREATE TABLE ... USING gwdelta AS
    * SELECT` materializes the query into a fresh log-backed table (create +
    * first-commit bootstrap), and `REPLACE TABLE ... AS SELECT` swaps both
    * schema and content. Final table = the replaced (projected) content,
    * which is what the oracle checks. */
  def gw22SqlCtas(spark: SparkSession, dir: String): DataFrame = {
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.read.parquet(s"$dir/region.parquet").createOrReplaceTempView("gw22_region_src")
    spark.sql(s"CREATE TABLE gw.$ns.region USING gwdelta AS SELECT * FROM gw22_region_src")
    require(spark.table(s"gw.$ns.region").columns.length == 2, "CTAS must carry the query schema")
    require(spark.table(s"gw.$ns.region").count() ==
      spark.table("gw22_region_src").count(), "CTAS must materialize the query")
    spark.sql(s"REPLACE TABLE gw.$ns.region USING gwdelta " +
      "AS SELECT r_regionkey, upper(r_name) AS r_name_u FROM gw22_region_src")
    spark.sql(s"SELECT r_regionkey, r_name_u FROM gw.$ns.region")
  }

  // ---------------------------------------------------------------- gw23
  /** `writeStream.toTable` end to end (V2 STREAMING_WRITE): a declared-
    * schema catalog table receives a two-micro-batch stream — each epoch is
    * one atomic log commit with `"<queryId>/<epochId>"` txnIds (crash
    * replay skips), the first epoch bootstrapping the log. Result = both
    * staged copies of region through the catalog read. */
  def gw23StreamToTable(spark: SparkSession, dir: String): DataFrame = {
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw23")
    val loc = tmp.resolve("db/region").toString
    spark.sql(s"CREATE TABLE gw.$ns.region (r_regionkey INT, r_name STRING) " +
      s"USING gwdelta LOCATION '$loc'")
    val stage = Files.createTempDirectory("gw23-stage")
    graft.streaming.StreamOps.stageLinks(
      Paths.get(s"$dir/region.parquet"), stage,
      Seq("a_region.parquet", "b_region.parquet"))
    val schema = spark.read.parquet(s"$dir/region.parquet").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("gw23-cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(s"gw.$ns.region")
    q.awaitTermination()
    val t = GwTable.forPath(spark, loc)
    require(t.snapshot().version >= 1,
      "expected one commit per micro-batch (two epochs)")
    spark.sql(s"SELECT * FROM gw.$ns.region")
  }

  // ---------------------------------------------------------------- gw24
  /** Partitioned gwdelta table end to end: PARTITIONED BY CTAS lays the
    * data out hive-style (one directory per n_regionkey), the commit logs
    * `metaData.partitionColumns` + per-file `add.partitionValues`, a plain
    * INSERT INTO re-derives the layout from the log, and a partition
    * predicate plans ONLY that partition's files — asserted against the
    * log's own partitionValues (partition pruning runs before stats
    * pruning in the scan; at 100 TB this is what keeps a one-partition
    * query from listing the other partitions at all). */
  def gw24PartitionedTable(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.read.parquet(s"$dir/nation.parquet").createOrReplaceTempView("gw24_nation_src")
    val tmp = Files.createTempDirectory("gw24")
    val loc = tmp.resolve("db/nation").toString
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta " +
      s"PARTITIONED BY (n_regionkey) LOCATION '$loc' " +
      "AS SELECT n_nationkey, n_name, n_regionkey FROM gw24_nation_src")
    val table = GwTable.forPath(spark, loc)
    val snap0 = table.snapshot()
    require(snap0.metadata.exists(_.partitionColumns == Seq("n_regionkey")),
      "CTAS must log PARTITIONED BY into metaData.partitionColumns")
    val regions = snap0.files.flatMap(_.partitionValues.get("n_regionkey")).distinct
    require(regions.size == 5, s"expected 5 region partitions, got $regions")
    // second commit: INSERT INTO with NO explicit partitioning — the sink
    // re-derives the layout from the log, keeping the table partitioned
    spark.sql(s"INSERT INTO gw.$ns.nation " +
      "SELECT n_nationkey + 100, n_name, n_regionkey FROM gw24_nation_src")
    val snap1 = table.snapshot()
    require(snap1.files.forall(_.partitionValues.contains("n_regionkey")),
      "INSERT INTO must keep every file partition-addressed")
    // a partition predicate must plan exactly that partition's files
    val planned = spark.table(s"gw.$ns.nation")
      .filter(col("n_regionkey") === 2)
      .queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan)
            .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.head
    val expected = snap1.files.count(_.partitionValues.get("n_regionkey").contains("2"))
    require(planned == expected && planned < snap1.files.size,
      s"partition pruning must plan only region 2's files: planned=$planned " +
        s"expected=$expected of ${snap1.files.size}")
    spark.sql(s"SELECT n_nationkey, n_name, n_regionkey FROM gw.$ns.nation " +
      "WHERE n_regionkey = 2")
  }

  // ---------------------------------------------------------------- gw25
  /** Merge-on-read DELETE end to end (deletion vectors): a broad predicate
    * (every third customer — matches in every file) deletes WITHOUT moving
    * a byte: the commit re-asserts each touched file with a deletion-vector
    * sidecar of row positions; the catalog read reconciles positions at
    * scan time (GwMorScan), time travel still serves the pre-delete rows,
    * and compaction folds the DVs back into clean files with identical
    * content. The returned DataFrame is the PRE-compaction read, so the
    * oracle compare exercises the DV-reconciling scan itself. */
  def gw25DeletionVectors(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (name, loc) = rangedOrdersTable(spark, dir, "gw25")
    val table = GwTable.forPath(spark, loc)
    val before = table.snapshot()
    val preCount = spark.table(name).count()
    require(table.delete(col("o_custkey") % 3 === 0, mergeOnRead = true) > 0,
      "expected a merge-on-read DELETE commit")
    val snap = table.snapshot()
    require(snap.files.map(_.path).toSet == before.files.map(_.path).toSet,
      "merge-on-read must not rewrite or remove data files")
    require(snap.files.exists(_.dv.isDefined), "expected deletion vectors")
    require(spark.sql(s"SELECT * FROM $name VERSION AS OF ${before.version}")
      .count() == preCount,
      "pre-delete version must still serve every row (time travel)")
    // the DV-reconciling catalog read — returned for the oracle compare
    val morRead = spark.sql(s"SELECT o_orderkey, o_custkey, o_orderstatus, " +
      "o_totalprice, date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate_s, " +
      s"o_orderpriority FROM $name")
    val morCount = morRead.count()
    // compaction folds the DVs away: clean files, same content. compact()
    // needs >= 2 live files to have work — only guaranteed when the
    // fixture got its full multi-file shape (sf >= 0.01)
    if (snap.files.size >= 2) {
      require(table.compact(targetFileBytes = 1L << 30) > 0,
        "expected a folding compaction commit")
      val folded = table.snapshot()
      require(folded.files.forall(_.dv.isEmpty),
        "compaction must fold deletion vectors away")
      require(spark.read.format("gwdelta").load(loc).count() == morCount,
        "folded content must equal the DV-reconciled content")
    }
    morRead
  }

  // ---------------------------------------------------------------- gw26
  /** SQL maintenance surface end to end (GwSqlParser via
    * spark.sql.extensions): `DESCRIBE HISTORY` lists every commit,
    * `OPTIMIZE ... ZORDER BY` compacts the two insert files into one
    * clustered rewrite, the post-OPTIMIZE history gains the OPTIMIZE
    * commit, and `VACUUM ... RETAIN 0 HOURS` reclaims the superseded
    * originals — all through spark.sql, no API calls. */
  def gw26SqlMaintenance(spark: SparkSession, dir: String): DataFrame = {
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw26")
    val loc = tmp.resolve("db/region").toString
    spark.read.parquet(s"$dir/region.parquet").createOrReplaceTempView("gw26_region_src")
    spark.sql(s"CREATE TABLE gw.$ns.region (r_regionkey INT, r_name STRING) " +
      s"USING gwdelta LOCATION '$loc'")
    spark.sql(s"INSERT INTO gw.$ns.region SELECT * FROM gw26_region_src")
    spark.sql(s"INSERT INTO gw.$ns.region SELECT * FROM gw26_region_src")
    val history0 = spark.sql(s"DESCRIBE HISTORY gw.$ns.region").collect()
    require(history0.length == 2, s"expected 2 commits, got ${history0.length}")
    require(history0.map(_.getString(2)).count(_ == "WRITE") >= 1,
      "history must carry the insert commits")
    val table = GwTable.forPath(spark, loc)
    require(table.snapshot().files.size == 2, "fixture wants two insert files")
    val opt = spark.sql(s"OPTIMIZE gw.$ns.region ZORDER BY (r_regionkey)").collect()
    require(opt.length == 1 && opt.head.getLong(1) > 0, "OPTIMIZE must commit")
    require(table.snapshot().files.forall(_.path.contains("/_compacted/")),
      "OPTIMIZE must swap in the compacted rewrite")
    val history1 = spark.sql(s"DESCRIBE HISTORY gw.$ns.region").collect()
    require(history1.exists(_.getString(2) == "OPTIMIZE"),
      "history must gain the OPTIMIZE commit")
    // deliberate short retention: the guard must be explicitly disabled
    // (Delta's retentionDurationCheck contract), asserted as part of the
    // maintenance-surface gate
    val guard =
      try { spark.sql(s"VACUUM gw.$ns.region RETAIN 0 HOURS").collect(); None }
      catch { case e: Exception => Some(e) }
    require(guard.exists(_.getMessage.contains("retentionCheck")),
      s"short-retention vacuum must be guarded, got: $guard")
    val vac = GwTable.withRetentionCheckDisabled(spark)(
      spark.sql(s"VACUUM gw.$ns.region RETAIN 0 HOURS").collect())
    require(vac.length == 1 && vac.head.getInt(1) >= 2,
      s"VACUUM must reclaim the superseded insert files, got ${vac.head.getInt(1)}")
    spark.sql(s"SELECT r_regionkey, r_name FROM gw.$ns.region")
  }

  private def withMergeOnRead[A](spark: SparkSession)(body: => A): A = {
    spark.conf.set("spark.graft.mergeOnRead", "true")
    try body finally spark.conf.unset("spark.graft.mergeOnRead")
  }

  // ---------------------------------------------------------------- gw27
  /** SQL `UPDATE` under merge-on-read (`SupportsDelta`, delta-based
    * row-level operation): gw20's repricing, but NO group rewrite — the
    * pre-update rows of the two matching files leave via deletion-vector
    * bitmaps and only the 5600 updated rows land as fresh files. Every
    * original file must still be LIVE after the update (re-asserted with a
    * grown DV or untouched), which is the 100 TB posture: write cost
    * tracks the MATCHED rows, not the groups they live in. */
  def gw27MorSqlUpdate(spark: SparkSession, dir: String): DataFrame = {
    val (name, loc) = rangedOrdersTable(spark, dir, "gw27")
    val table = GwTable.forPath(spark, loc)
    val before = table.snapshot().files.map(_.path)
    withMergeOnRead(spark) {
      spark.sql(s"UPDATE $name SET o_totalprice = o_totalprice * 2, " +
        "o_orderpriority = 'REPRICED' WHERE o_orderkey < 5600")
    }
    val after = table.snapshot().files
    val live = after.map(_.path).toSet
    // no group rewrite: live files are originals (DV'd or untouched) plus
    // fresh _dml files holding ONLY the updated rows
    require(after.forall(f => before.contains(f.path) || f.path.contains("/_dml/")),
      "merge-on-read UPDATE must not rewrite groups")
    require(after.exists(f => f.dv.isEmpty && f.path.contains("/_dml/")),
      "updated rows must land in fresh _dml files")
    // partial-match detail only observable with the full 4-file fixture
    // (sf0.001 holds keys 0..1499 — every row matches, and a DV covering
    // a whole file upgrades to a metadata-only remove)
    if (before.size == 4) {
      require(before.count(live.contains) >= before.size - 1,
        "only the fully-matched file may upgrade to a plain remove")
      require(after.exists(_.dv.isDefined),
        "the partially-matched file must stay live with a deletion vector")
    }
    spark.sql(s"SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
      "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate_s, " +
      s"o_orderpriority FROM $name")
  }

  // ---------------------------------------------------------------- gw28
  /** SQL `MERGE INTO` under merge-on-read: gw21's upsert through the
    * delta operation — matched rows' pre-images leave via DVs, updated
    * copies + unmatched inserts append, originals stay live. */
  def gw28MorSqlMerge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (name, loc) = rangedOrdersTable(spark, dir, "gw28")
    val table = GwTable.forPath(spark, loc)
    val full = table.snapshot().files.size == 4
    val deleted = table.delete(col("o_orderkey") >= 7500)
    if (full) require(deleted > 0)
    val before = table.snapshot().files.map(_.path)
    spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") >= 5600 && col("o_orderkey") < 9000)
      .withColumn("o_totalprice", col("o_totalprice") * 3)
      .createOrReplaceTempView("gw28_src")
    withMergeOnRead(spark) {
      spark.sql(s"""MERGE INTO $name t USING gw28_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
        WHEN NOT MATCHED THEN INSERT *""")
    }
    val live = table.snapshot().files.map(_.path).toSet
    require(before.forall(live.contains),
      "merge-on-read MERGE must never replace an original file")
    spark.sql(s"SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
      "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate_s, " +
      s"o_orderpriority FROM $name")
  }

  // ---------------------------------------------------------------- gw29
  /** `RESTORE TABLE ... TO VERSION AS OF n` end to end: insert, DELETE
    * half, restore to the pre-delete version with one metadata-scale
    * commit — the file set must equal the target's exactly, the deleted
    * state stays time-travelable one version back, and the final content
    * is the original table (the oracle). */
  def gw29Restore(spark: SparkSession, dir: String): DataFrame = {
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw29")
    val loc = tmp.resolve("db/nation").toString
    spark.read.parquet(s"$dir/nation.parquet").createOrReplaceTempView("gw29_nation_src")
    spark.sql(s"CREATE TABLE gw.$ns.nation (n_nationkey INT, n_name STRING, " +
      s"n_regionkey INT) USING gwdelta LOCATION '$loc'")
    spark.sql(s"INSERT INTO gw.$ns.nation SELECT * FROM gw29_nation_src")
    val table = GwTable.forPath(spark, loc)
    val v0 = table.snapshot().version
    val filesV0 = table.snapshot().files.toSet
    spark.sql(s"DELETE FROM gw.$ns.nation WHERE n_nationkey % 2 = 0")
    require(spark.table(s"gw.$ns.nation")
      .filter(org.apache.spark.sql.functions.col("n_nationkey") % 2 === 0).count() == 0)
    val res = spark.sql(s"RESTORE TABLE gw.$ns.nation TO VERSION AS OF $v0").collect()
    require(res.length == 1 && res.head.getLong(1) == v0, "RESTORE must report the target")
    require(table.snapshot().files.toSet == filesV0,
      "restored file set must equal the target version's exactly")
    require(spark.sql(s"SELECT * FROM gw.$ns.nation VERSION AS OF ${res.head.getLong(0) - 1}")
      .count() < spark.table(s"gw.$ns.nation").count(),
      "pre-restore (deleted) state must stay time-travelable")
    spark.sql(s"SELECT n_nationkey, n_name, n_regionkey FROM gw.$ns.nation")
  }

  // ---------------------------------------------------------------- gw30
  /** `CREATE TABLE ... SHALLOW CLONE` end to end: two insert commits,
    * clone (zero copy — the clone's log re-asserts the source's
    * absolute-path files), then DELETE on the CLONE — the source must be
    * unaffected and the clone serves the delete; final read = the clone
    * (one region copy), oracle-checked. */
  def gw30ShallowClone(spark: SparkSession, dir: String): DataFrame = {
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw30")
    val loc = tmp.resolve("db/region").toString
    spark.read.parquet(s"$dir/region.parquet").createOrReplaceTempView("gw30_region_src")
    spark.sql(s"CREATE TABLE gw.$ns.region (r_regionkey INT, r_name STRING) " +
      s"USING gwdelta LOCATION '$loc'")
    spark.sql(s"INSERT INTO gw.$ns.region SELECT * FROM gw30_region_src")
    spark.sql(s"INSERT INTO gw.$ns.region SELECT * FROM gw30_region_src")
    val res = spark.sql(s"CREATE TABLE gw.$ns.copy SHALLOW CLONE gw.$ns.region")
      .collect()
    require(res.length == 1 && res.head.getLong(0) == 0L, "clone bootstraps at v0")
    val srcRows = spark.table(s"gw.$ns.region").count()
    // the clone evolves independently: drop one copy's worth of rows
    spark.sql(s"DELETE FROM gw.$ns.copy WHERE r_regionkey >= 0")
    spark.sql(s"INSERT INTO gw.$ns.copy SELECT * FROM gw30_region_src")
    require(spark.table(s"gw.$ns.region").count() == srcRows,
      "source must be unaffected by DML on the clone")
    spark.sql(s"SELECT r_regionkey, r_name FROM gw.$ns.copy")
  }

  // ---------------------------------------------------------------- gw31
  /** Multi-column OPTIMIZE is true Z-ORDER (bit-interleaved rank buckets,
    * [[graft.functions.ZOrder]]): eight interleaving insert slices of
    * orders — each spanning the FULL o_custkey and o_orderdate ranges —
    * are rewritten into a clustered tiling where BOTH columns get tight
    * per-file stats, so a selective filter on EITHER column plans fewer
    * files than the rewrite produced. A lexicographic (custkey, date)
    * sort could only ever prune the leading column. Content unchanged,
    * oracle-checked. */
  def gw31ZorderCompact(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw31")
    val loc = tmp.resolve("db/orders").toString
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    for (i <- 0 until 8)
      orders.filter(col("o_orderkey") % 8 === i).coalesce(1)
        .write.format("gwdelta").mode("append").save(loc)
    val table = GwTable.forPath(spark, loc)
    // target = 2x the largest slice: every input qualifies as small and the
    // rewrite tiles into ~4 files at ANY scale factor
    val target = table.snapshot().files.map(_.size).max * 2
    require(table.compact(targetFileBytes = target,
      clusterBy = Seq("o_custkey", "o_orderdate")) > 0, "OPTIMIZE must commit")
    val nFiles = table.snapshot().files.size
    def planned(df: DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan).asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.head
    val read = spark.read.format("gwdelta").load(loc)
    // the tiling only emerges with enough rows for several output files
    if (nFiles >= 4) {
      val maxCust = orders.agg(org.apache.spark.sql.functions.max("o_custkey"))
        .head().getLong(0)
      require(planned(read.filter(col("o_custkey") < maxCust / 8)) < nFiles,
        "z-order must give the FIRST clustered column pruning")
      // a cutoff one-eighth into the date range: a lexicographic
      // (custkey, date) rewrite leaves every file spanning the full date
      // range, so only the z-curve tiling can skip files here
      val mm = orders.agg(
        org.apache.spark.sql.functions.min("o_orderdate"),
        org.apache.spark.sql.functions.max("o_orderdate")).head()
      val lo = mm.getAs[java.time.LocalDateTime](0)
      val cutoff = lo.plus(
        java.time.Duration.between(lo, mm.getAs[java.time.LocalDateTime](1))
          .dividedBy(8))
      require(planned(read.filter(
          col("o_orderdate") < org.apache.spark.sql.functions.lit(cutoff))) < nFiles,
        "z-order must give the SECOND clustered column pruning")
    }
    read.selectExpr("o_orderkey", "o_custkey",
      "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate_s")
  }

  // ---------------------------------------------------------------- gw32
  /** Streaming change-feed read (`readChangeFeed`): two appends then a
    * full-table DELETE (stats-classified metadata-only drop — a
    * remove-only commit), consumed as a CDF stream — each insert commit's
    * rows arrive tagged 'insert' and the delete commit re-emits every
    * removed row tagged 'delete', with the commit version alongside. The
    * drained feed equals the batch `rowChanges` answer by construction
    * (asserted in GwDeltaSourceSpec); here the oracle replays the
    * known content per commit. */
  def gw32CdfStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw32")
    val loc = tmp.resolve("db/region").toString
    val region = spark.read.parquet(s"$dir/region.parquet")
    region.write.format("gwdelta").mode("append").save(loc) // v0 bootstrap
    region.write.format("gwdelta").mode("append").save(loc) // v1 append
    val table = GwTable.forPath(spark, loc)
    require(table.delete(col("r_regionkey") >= 0) == 2L,
      "full-file delete must commit as version 2")
    val name = s"gw32_cdf_${System.nanoTime()}"
    val q = spark.readStream.format("gwdelta")
      .option("readChangeFeed", "true").load(loc)
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).select(col("r_regionkey"), col("r_name"),
      col("_commit_version").as("change_seq"), col("_change_type"))
  }

  // ---------------------------------------------------------------- gw33
  /** Write-path CHECK constraints (Delta `delta.constraints.*` parity,
    * stored under `graft.constraints.*`): `ALTER TABLE ... SET
    * TBLPROPERTIES` persists the constraint as a metadata-only commit
    * (validated at set time — a bad expression fails the ALTER), every
    * batch ingest is wrapped by the injected analysis rule so a violating
    * row fails the INSERT before any commit (the log never sees the bad
    * batch), `UNSET TBLPROPERTIES` lifts the rule again, and `SHOW
    * TBLPROPERTIES` reads the constraint back from the log metadata. */
  def gw33CheckConstraint(spark: SparkSession, dir: String): DataFrame = {
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw33")
    val loc = tmp.resolve("db/region").toString
    spark.read.parquet(s"$dir/region.parquet").createOrReplaceTempView("gw33_region_src")
    spark.sql(s"CREATE TABLE gw.$ns.region (r_regionkey INT, r_name STRING) " +
      s"USING gwdelta LOCATION '$loc'")
    spark.sql(s"INSERT INTO gw.$ns.region SELECT * FROM gw33_region_src")
    spark.sql(s"ALTER TABLE gw.$ns.region SET TBLPROPERTIES " +
      "('graft.constraints.nonneg' = 'r_regionkey >= 0')")
    // the constraint must be persisted log-side and readable back
    val shown = spark.sql(s"SHOW TBLPROPERTIES gw.$ns.region").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    require(shown.get("graft.constraints.nonneg").contains("r_regionkey >= 0"),
      s"constraint not visible in TBLPROPERTIES: $shown")
    // a bad expression must fail the ALTER itself, not a later INSERT
    val badAlter =
      try { spark.sql(s"ALTER TABLE gw.$ns.region SET TBLPROPERTIES " +
        "('graft.constraints.typo' = 'r_regionkeyy > 0')"); None }
      catch { case e: Exception => Some(e) }
    require(badAlter.exists(_.getMessage.contains("unknown column")),
      s"typo'd constraint must fail at set time, got: $badAlter")
    // the violating batch must fail BEFORE commit: no partial data lands
    val violation =
      try { spark.sql(s"INSERT INTO gw.$ns.region VALUES (-1, 'bad')"); None }
      catch { case e: Exception => Some(e) }
    require(violation.exists(e =>
      (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
        .contains("CHECK constraint nonneg")),
      s"violating insert must raise the named constraint, got: $violation")
    val table = GwTable.forPath(spark, loc)
    require(table.snapshot().files.size == 1,
      "failed insert must leave no committed files behind")
    // UNSET lifts enforcement; the same row now lands
    spark.sql(s"ALTER TABLE gw.$ns.region UNSET TBLPROPERTIES " +
      "('graft.constraints.nonneg')")
    spark.sql(s"INSERT INTO gw.$ns.region VALUES (-1, 'unchecked')")
    spark.sql(s"SELECT r_regionkey, r_name FROM gw.$ns.region")
  }

  // ---------------------------------------------------------------- gw34
  /** Idempotent batch writes (Delta txnAppId/txnVersion parity): a write
    * tagged `.option("txnAppId", app).option("txnVersion", n)` commits a
    * `txn` high-water action; re-running the same (app, n) — the
    * foreachBatch crash-replay, the re-run ETL job — is a silent no-op,
    * as is any n at or below the recorded mark (monotonic contract). A
    * higher version commits; a different appId is independent. The gate
    * pins the no-ops via commit-count equality and the final content via
    * the oracle. */
  def gw34IdempotentWrite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw34")
    val loc = tmp.resolve("db/region").toString
    val region = spark.read.parquet(s"$dir/region.parquet")
    def writeTagged(df: org.apache.spark.sql.DataFrame, app: String, v: Long): Unit =
      df.write.format("gwdelta").mode("append")
        .option("txnAppId", app).option("txnVersion", v.toString).save(loc)
    writeTagged(region, "etl", 1)
    val table = GwTable.forPath(spark, loc)
    val commits1 = table.history.count()
    writeTagged(region, "etl", 1) // crash replay: same (app, version)
    writeTagged(region, "etl", 0) // below the high-water mark
    require(table.history.count() == commits1,
      "replayed and below-mark writes must not commit")
    writeTagged(region.filter(col("r_regionkey") < 2), "etl", 2)
    writeTagged(region.filter(col("r_regionkey") === 4), "audit", 1)
    require(table.history.count() == commits1 + 2,
      "fresh versions and independent appIds must commit")
    // overwrite path honors the same contract: this replayed (etl, 2)
    // overwrite must NOT wipe the table
    region.limit(1).write.format("gwdelta").mode("overwrite")
      .option("txnAppId", "etl").option("txnVersion", "2").save(loc)
    require(table.history.count() == commits1 + 2,
      "replayed overwrite must be a no-op")
    spark.read.format("gwdelta").load(loc)
      .select("r_regionkey", "r_name")
  }

  /** gw35: optimistic concurrency control with Delta's typed conflict
    * taxonomy (`graft.log.Occ`). The reference's design center is a single
    * writer per table (Guidewire.scala:71-74), so concurrency is where this
    * engine goes beyond it: (1) WriteSerializable — a planned row-level
    * DELETE retries past a benign blind append and still commits; (2) a
    * double-delete race aborts with `ConcurrentDeleteDeleteException` and
    * commits NOTHING; (3) concurrent blind appends from racing threads all
    * land via version-conflict retry, no clobbers; (4) a metadata
    * restatement (schema evolution) mid-operation aborts the planned DML
    * with `MetadataChangedException`. */
  def gw35OccConflicts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw35")
    val loc = tmp.resolve("db/nation").toString
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    nation.filter(col("n_nationkey") < 12).coalesce(1)
      .write.format("gwdelta").mode("append").save(loc)
    nation.filter(col("n_nationkey") >= 12).coalesce(1)
      .write.format("gwdelta").mode("append").save(loc)
    val t = GwTable.forPath(spark, loc)
    // (1) benign race: plan against readSnap, let a blind append win the
    // next version, then land the planned removal of file B (keys >= 12)
    val readSnap = t.snapshot()
    val fileB = readSnap.files(1) // replay order: v0 add, then v1 add
    graft.streaming.GwSink.append(
      nation.filter(col("n_nationkey") < 3).coalesce(1), loc)
    require(t.replaceFiles("DELETE", Set(fileB.path), Nil,
      Seq(fileB), Some(readSnap)) > 0,
      "a planned DELETE must retry past a benign concurrent append")
    // (2) double delete: the same plan re-landed must abort, typed, and
    // leave no commit behind
    val vBefore = t.snapshot().version
    val dd = try {
      t.replaceFiles("DELETE", Set(fileB.path), Nil, Seq(fileB), Some(readSnap))
      false
    } catch { case _: graft.log.ConcurrentDeleteDeleteException => true }
    require(dd && t.snapshot().version == vBefore,
      "a double-delete race must abort without committing")
    // (3) racing blind appends: every writer retries to its own version
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val racers = (0 until 3).map { i =>
      new Thread(() => {
        try {
          graft.streaming.GwSink.append(
            nation.filter(col("n_nationkey") >= 12 && col("n_nationkey") % 3 === i)
              .coalesce(1), loc)
          ()
        } catch { case e: Throwable => errs.add(e); () }
      })
    }
    racers.foreach(_.start()); racers.foreach(_.join())
    require(errs.isEmpty,
      s"concurrent appends must all commit: ${Option(errs.peek())}")
    // (4) metadata restatement mid-operation aborts the planned DML
    val readSnap2 = t.snapshot()
    val fileA = readSnap2.files.head
    require(t.addColumns(org.apache.spark.sql.types.StructField("gw35_extra",
      org.apache.spark.sql.types.LongType, nullable = true)) > 0)
    val md = try {
      t.replaceFiles("DELETE", Set(fileA.path), Nil, Seq(fileA), Some(readSnap2))
      false
    } catch { case _: graft.log.MetadataChangedException => true }
    require(md, "a metadata race must abort with MetadataChangedException")
    spark.read.format("gwdelta").load(loc)
      .select("n_nationkey", "n_name")
  }

  /** gw36: generated columns (Delta `GENERATED ALWAYS AS (expr)` parity,
    * property form `graft.generated.<col> = <expr>`): an ingest that omits
    * the column (Spark by-name fill = NULL) gets it COMPUTED inside the
    * write's codegen projection; a provided value must EQUAL the
    * expression or the write fails BEFORE any commit; expression typos /
    * self-references fail the ALTER itself. */
  def gw36GeneratedColumns(spark: SparkSession, dir: String): DataFrame = {
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw36")
    val loc = tmp.resolve("db/orders").toString
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("gw36_src")
    spark.sql(s"CREATE TABLE gw.$ns.t (o_orderkey BIGINT, o_custkey BIGINT, " +
      s"ok2 BIGINT) USING gwdelta LOCATION '$loc'")
    // declared-schema tables bootstrap their log on the first INSERT, so
    // the property lands after a bootstrap slice (explicit correct values)
    spark.sql(s"INSERT INTO gw.$ns.t SELECT o_orderkey, o_custkey, " +
      "o_orderkey * 2 FROM gw36_src WHERE o_orderkey < 500")
    spark.sql(s"ALTER TABLE gw.$ns.t SET TBLPROPERTIES " +
      "('graft.generated.ok2' = 'o_orderkey * 2')")
    // a generation expression referencing itself fails the ALTER
    val selfRef =
      try { spark.sql(s"ALTER TABLE gw.$ns.t SET TBLPROPERTIES " +
        "('graft.generated.ok2' = 'ok2 + 1')"); None }
      catch { case e: Exception => Some(e) }
    require(selfRef.exists(_.getMessage.contains("unknown column")),
      s"self-referencing generation expression must fail at set time: $selfRef")
    // omitted column (NULL slot) -> computed in the ingest projection
    spark.sql(s"INSERT INTO gw.$ns.t SELECT o_orderkey, o_custkey, NULL " +
      "FROM gw36_src WHERE o_orderkey >= 500 AND o_orderkey < 1000")
    // provided-and-correct value -> accepted
    spark.sql(s"INSERT INTO gw.$ns.t SELECT o_orderkey, o_custkey, " +
      "o_orderkey * 2 FROM gw36_src WHERE o_orderkey >= 1000")
    // provided-but-wrong value -> the write fails, nothing commits
    val before = GwTable.forPath(spark, loc).snapshot().version
    val bad =
      try { spark.sql(s"INSERT INTO gw.$ns.t VALUES (9999L, 1L, 9998L)"); None }
      catch { case e: Exception => Some(e) }
    require(bad.exists(e =>
      (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
        .contains("generated column ok2")),
      s"mismatched generated value must fail the write, got: $bad")
    require(GwTable.forPath(spark, loc).snapshot().version == before,
      "failed generated-column write must leave no commit behind")
    spark.sql(s"SELECT o_orderkey, o_custkey, ok2 FROM gw.$ns.t")
  }

  /** gw37: identity columns (Delta `GENERATED ALWAYS AS IDENTITY` parity,
    * property form `graft.identity.<col> = '<start>,<step>'`): omitted
    * slots allocate unique values beyond the table's watermark (gaps
    * allowed — the per-partition id stride, Delta's own contract), the
    * watermark advances ATOMICALLY with the files from harvested footer
    * stats, explicit values are rejected (ALWAYS), and a raced allocation
    * aborts typed. Exact id values depend on partitioning, so the oracle
    * pins the CONTENT; the identity invariants (uniqueness, beyond-the-
    * watermark, atomic advance) are required in-gate. */
  def gw37IdentityColumns(spark: SparkSession, dir: String): DataFrame = {
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw37")
    val loc = tmp.resolve("db/orders").toString
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("gw37_src")
    spark.sql(s"CREATE TABLE gw.$ns.t (id BIGINT, o_orderkey BIGINT, " +
      s"o_custkey BIGINT) USING gwdelta LOCATION '$loc'")
    // pre-identity seed with an explicitly NULLABLE schema: the log
    // bootstraps from the first batch, and identity's NULL-slot convention
    // needs nullable columns (validated at SET time)
    val seedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("o_custkey",
        org.apache.spark.sql.types.LongType, nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(0L, -1L, -1L)),
      seedSchema).coalesce(1)
      .write.format("gwdelta").mode("append").save(loc)
    spark.sql(s"ALTER TABLE gw.$ns.t SET TBLPROPERTIES " +
      "('graft.identity.id' = '1,1')")
    val t = GwTable.forPath(spark, loc)
    def hw(): Long = t.snapshot().metadata.get
      .configuration("graft.identity.id.highWaterMark").toLong
    spark.sql(s"INSERT INTO gw.$ns.t SELECT NULL, o_orderkey, o_custkey " +
      "FROM gw37_src WHERE o_orderkey < 700")
    val idsA = spark.sql(s"SELECT id FROM gw.$ns.t WHERE o_orderkey >= 0")
      .collect().map(_.getLong(0))
    require(idsA.length == 700 && idsA.distinct.length == 700 && idsA.min > 0,
      "first allocation must be 700 unique ids above the start")
    require(hw() == idsA.max,
      s"watermark must advance atomically to the furthest id: ${hw()} vs ${idsA.max}")
    val hw1 = hw()
    spark.sql(s"INSERT INTO gw.$ns.t SELECT NULL, o_orderkey, o_custkey " +
      "FROM gw37_src WHERE o_orderkey >= 700")
    val idsAll = spark.sql(s"SELECT id FROM gw.$ns.t").collect().map(_.getLong(0))
    require(idsAll.distinct.length == idsAll.length,
      "allocations across commits must never collide")
    val idsB = idsAll.filterNot(i => i == 0L || idsA.contains(i))
    require(idsB.nonEmpty && idsB.min > hw1,
      "the second allocation must start beyond the first's watermark")
    require(hw() == idsAll.max, "watermark tracks the furthest id")
    // explicit values are rejected (GENERATED ALWAYS), nothing commits
    val before = t.snapshot().version
    val bad =
      try { spark.sql(s"INSERT INTO gw.$ns.t VALUES (42L, -2L, -2L)"); None }
      catch { case e: Exception => Some(e) }
    require(bad.exists(e =>
      (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
        .contains("identity column id is GENERATED ALWAYS")),
      s"explicit identity value must be rejected, got: $bad")
    require(t.snapshot().version == before,
      "rejected identity write must leave no commit behind")
    spark.sql(s"SELECT id IS NOT NULL AS id_assigned, o_orderkey, o_custkey " +
      s"FROM gw.$ns.t")
  }

  /** gw38: column mapping — `ALTER TABLE ... RENAME COLUMN / DROP COLUMN`
    * as METADATA-ONLY commits (Delta columnMapping `name` mode): no file
    * moves, reads serve the same bytes under the new name (old files keep
    * their physical names; post-rename writes land physical names), time
    * travel keeps the old-era schema. */
  def gw38ColumnMapping(spark: SparkSession, dir: String): DataFrame = {
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw38")
    val loc = tmp.resolve("db/nation").toString
    spark.read.parquet(s"$dir/nation.parquet").createOrReplaceTempView("gw38_src")
    spark.sql(s"CREATE TABLE gw.$ns.t (n_nationkey BIGINT, n_name STRING, " +
      s"n_regionkey BIGINT) USING gwdelta LOCATION '$loc'")
    spark.sql(s"INSERT INTO gw.$ns.t SELECT n_nationkey, n_name, n_regionkey " +
      "FROM gw38_src")
    val t = GwTable.forPath(spark, loc)
    val preVersion = t.snapshot().version
    val files = t.snapshot().files.map(_.path).toSet
    spark.sql(s"ALTER TABLE gw.$ns.t RENAME COLUMN n_name TO nation_name")
    require(t.snapshot().files.map(_.path).toSet == files,
      "RENAME COLUMN must not move a single data file")
    // post-rename ingest: lands the PHYSICAL layout, reads logical
    spark.sql(s"INSERT INTO gw.$ns.t SELECT n_nationkey, nation_name, " +
      s"n_regionkey FROM gw.$ns.t WHERE n_nationkey < 4")
    // pre-rename version still serves the OLD name via time travel
    require(spark.sql(s"SELECT n_name FROM gw.$ns.t VERSION AS OF $preVersion")
      .count() == 25, "time travel must keep the pre-rename schema")
    spark.sql(s"ALTER TABLE gw.$ns.t DROP COLUMN n_regionkey")
    require(t.snapshot().files.map(_.path).size == files.size + 1,
      "DROP COLUMN must not move a single data file")
    val cols = spark.table(s"gw.$ns.t").columns.toSeq
    require(cols == Seq("n_nationkey", "nation_name"),
      s"post-drop schema drifted: $cols")
    spark.sql(s"SELECT n_nationkey, nation_name FROM gw.$ns.t " +
      "WHERE n_nationkey >= 2")
  }

  /** gw39: mergeSchema appends (Delta auto schema evolution):
    * `.option("mergeSchema", "true")` lets a widening batch commit its NEW
    * nullable columns ATOMICALLY with its files (one commit: restated
    * metadata + adds); without the option the strict schema check holds;
    * overlapping columns may never change type; a batch MISSING table
    * columns is fine (its files null-fill on read). */
  def gw39MergeSchema(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, length}
    val tmp = Files.createTempDirectory("gw39")
    val loc = tmp.resolve("db/region").toString
    val region = spark.read.parquet(s"$dir/region.parquet")
      .select("r_regionkey", "r_name")
    region.write.format("gwdelta").mode("append").save(loc)
    val widened = region.withColumn("name_len", length(col("r_name")).cast("long"))
    // widening WITHOUT the option keeps the strict contract
    val strict =
      try { widened.write.format("gwdelta").mode("append").save(loc); None }
      catch { case e: Exception => Some(e) }
    require(strict.exists(_.getMessage.contains("does not match")),
      s"unsanctioned widening must fail, got: $strict")
    // with the option: files + restated schema in ONE commit
    val t = GwTable.forPath(spark, loc)
    val vBefore = t.snapshot().version
    widened.write.format("gwdelta").mode("append")
      .option("mergeSchema", "true").save(loc)
    require(t.snapshot().version == vBefore + 1,
      "the widening must be one atomic commit")
    require(t.snapshot().schema.fieldNames.toSeq ==
      Seq("r_regionkey", "r_name", "name_len"),
      s"schema not widened: ${t.snapshot().schema.fieldNames.toSeq}")
    // a type change is rejected even with the option
    val conflict =
      try { region.withColumn("name_len", col("r_name"))
        .write.format("gwdelta").mode("append")
        .option("mergeSchema", "true").save(loc); None }
      catch { case e: Exception => Some(e) }
    require(conflict.exists(_.getMessage.contains("cannot change column")),
      s"type conflict must fail, got: $conflict")
    // a batch missing table columns null-fills on read
    region.filter(col("r_regionkey") < 2).select("r_regionkey")
      .write.format("gwdelta").mode("append")
      .option("mergeSchema", "true").save(loc)
    spark.read.format("gwdelta").load(loc)
      .select("r_regionkey", "r_name", "name_len")
  }

  /** gw40: REORG TABLE ... APPLY (PURGE) — the mapping lifecycle's exit:
    * after renames/drops/MOR deletes, one physical rebase folds the DVs
    * away, rewrites renamed layouts, purges dropped bytes, and clears the
    * mapping — so SQL row-level DML (rejected on mapped tables) works
    * again. The gate drives the FULL lifecycle: rename -> drop -> MOR
    * delete -> REORG -> SQL UPDATE. */
  def gw40Reorg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw40")
    val loc = tmp.resolve("db/nation").toString
    spark.read.parquet(s"$dir/nation.parquet").createOrReplaceTempView("gw40_src")
    spark.sql(s"CREATE TABLE gw.$ns.t (n_nationkey BIGINT, n_name STRING, " +
      s"n_regionkey BIGINT) USING gwdelta LOCATION '$loc'")
    spark.sql(s"INSERT INTO gw.$ns.t SELECT * FROM gw40_src")
    spark.sql(s"ALTER TABLE gw.$ns.t RENAME COLUMN n_name TO nation_name")
    spark.sql(s"ALTER TABLE gw.$ns.t DROP COLUMN n_regionkey")
    val t = GwTable.forPath(spark, loc)
    require(t.delete(col("n_nationkey") < 3, mergeOnRead = true) > 0)
    require(t.snapshot().files.exists(_.dv.isDefined), "setup needs a DV")
    // mapped tables reject SQL row-level DML — the state REORG exits
    val rejected =
      try { spark.sql(s"UPDATE gw.$ns.t SET nation_name = 'X' " +
        "WHERE n_nationkey = 24"); false }
      catch { case e: Exception => e.getMessage.contains("column-mapped") ||
        Option(e.getCause).exists(_.getMessage.contains("column-mapped")) }
    require(rejected, "SQL UPDATE must be rejected while mapped")
    val oldFiles = t.snapshot().files.map(_.path).toSet
    val res = spark.sql(s"REORG TABLE gw.$ns.t APPLY (PURGE)").collect()
    require(res.length == 1 && res.head.getLong(1) > 0, s"REORG failed: ${res.toSeq}")
    val after = t.snapshot()
    require(!graft.log.ColumnMapping.hasMapping(after.schema),
      "REORG must clear the mapping pins")
    require(after.files.forall(_.dv.isEmpty), "REORG must fold DVs away")
    require(after.files.map(_.path).toSet.intersect(oldFiles).isEmpty,
      "REORG must rewrite every mapped-era file")
    require(!after.metadata.get.configuration.keys
      .exists(_.startsWith(GwTable.DroppedPhysicalPrefix)),
      "REORG must clear the dropped-name tombstones")
    // the lifecycle completes: SQL UPDATE works on the reorged table
    spark.sql(s"UPDATE gw.$ns.t SET nation_name = 'X' WHERE n_nationkey = 24")
    spark.sql(s"SELECT n_nationkey, nation_name FROM gw.$ns.t")
  }

  /** gw41: declared clustering (the liquid-clustering role): `CREATE
    * TABLE ... CLUSTER BY (a, b)` persists the clustering columns as table
    * metadata, and every `OPTIMIZE` WITHOUT an explicit ZORDER BY applies
    * them — users declare layout intent once instead of remembering the
    * right ZORDER clause in every maintenance window. In-gate: the
    * bare-OPTIMIZE rewrite must prune on BOTH declared columns (the gw31
    * Morton tiling through the property path). */
  def gw41ClusterBy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw41")
    val loc = tmp.resolve("db/orders").toString
    spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey").createOrReplaceTempView("gw41_src")
    spark.sql(s"CREATE TABLE gw.$ns.t (o_orderkey BIGINT, o_custkey BIGINT) " +
      s"USING gwdelta CLUSTER BY (o_orderkey, o_custkey) LOCATION '$loc'")
    for (i <- 0 until 8)
      spark.sql(s"INSERT INTO gw.$ns.t SELECT * FROM gw41_src " +
        s"WHERE o_orderkey % 8 = $i")
    val table = GwTable.forPath(spark, loc)
    require(table.snapshot().metadata.get.configuration
      .get(GwTable.ClusterByProp).contains("o_orderkey,o_custkey"),
      "CLUSTER BY must persist into the table metadata at bootstrap")
    val target = table.snapshot().files.map(_.size).max * 2
    spark.conf.set("spark.graft.optimize.targetFileBytes", target.toString)
    try { spark.sql(s"OPTIMIZE gw.$ns.t"); () } // NO zorder clause
    finally spark.conf.unset("spark.graft.optimize.targetFileBytes")
    val nFiles = table.snapshot().files.size
    def planned(df: DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan).asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.head
    val read = spark.read.format("gwdelta").load(loc)
    if (nFiles >= 4) {
      val mx = spark.sql(s"SELECT max(o_orderkey), max(o_custkey) FROM gw.$ns.t").head()
      require(planned(read.filter(col("o_orderkey") < mx.getLong(0) / 8)) < nFiles,
        "declared clustering must prune the FIRST column on a bare OPTIMIZE")
      require(planned(read.filter(col("o_custkey") < mx.getLong(1) / 8)) < nFiles,
        "declared clustering must prune the SECOND column on a bare OPTIMIZE")
    }
    spark.sql(s"SELECT o_orderkey, o_custkey FROM gw.$ns.t")
  }

  /** gw42: auto-compaction — with `graft.autoOptimize.autoCompact = true`,
    * an append that accumulates `spark.graft.autoCompact.minNumFiles`
    * small files triggers an inline OPTIMIZE at the ingest site (the
    * small-file problem self-heals; no maintenance window needed).
    * Best-effort: concurrent conflicts skip silently. */
  def gw42AutoCompact(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw42")
    val loc = tmp.resolve("db/nation").toString
    val nation = spark.read.parquet(s"$dir/nation.parquet")
      .select("n_nationkey", "n_name")
    nation.filter(col("n_nationkey") === 0).coalesce(1)
      .write.format("gwdelta").mode("append").save(loc)
    val t = GwTable.forPath(spark, loc)
    t.updateProperties(Map("graft.autoOptimize.autoCompact" -> "true"))
    spark.conf.set("spark.graft.autoCompact.minNumFiles", "4")
    try {
      for (i <- 1 to 5)
        nation.filter(col("n_nationkey") === i).coalesce(1)
          .write.format("gwdelta").mode("append").save(loc)
    } finally spark.conf.unset("spark.graft.autoCompact.minNumFiles")
    val hist = t.history.collect().map(_.getString(2))
    require(hist.contains("OPTIMIZE"),
      s"auto-compact must have triggered an OPTIMIZE commit, got ${hist.toSeq}")
    require(t.snapshot().files.size < 6,
      s"small files must have been folded, got ${t.snapshot().files.size}")
    spark.read.format("gwdelta").load(loc)
  }

  // ---------------------------------------------------------------- gw43
  /** CHANGE DATA FEED with change-data files (Delta
    * `delta.enableChangeDataFeed` parity, stored as
    * `graft.enableChangeDataFeed`): DML commits on a CDF-enabled table
    * persist their row-level changes under `_change_data/` ([[graft.Cdc]])
    * referenced by `cdc` log actions — so the change feed no longer needs
    * a derived diff. Exercised end to end: a copy-on-write UPDATE surfaces
    * TRUE `update_preimage`/`update_postimage` pairs (not delete+insert), a
    * partial DELETE its exact rows, and a merge-on-read DELETE (a
    * deletion-vector commit) streams — all three previously stopped
    * `readChangeFeed` with stop-and-use-the-batch-API guidance. In-gate:
    * the streamed feed past the property commit must equal
    * `rowChanges(1)` exactly (both faces read the same cdc files), and the
    * property-only metadata commit (enabling CDF) must NOT stop the
    * stream. */
  def gw43ChangeDataFeed(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, upper}
    val tmp = Files.createTempDirectory("gw43")
    val loc = tmp.resolve("db/region").toString
    val region = spark.read.parquet(s"$dir/region.parquet")
    region.write.format("gwdelta").mode("append").save(loc) // v0 bootstrap
    val t = GwTable.forPath(spark, loc)
    require(t.updateProperties(Map("graft.enableChangeDataFeed" -> "true")) == 1L,
      "CDF property must commit as version 1")
    require(t.update(col("r_regionkey") < 2,
      Map("r_name" -> upper(col("r_name")))) == 2L,
      "copy-on-write UPDATE must commit as version 2")
    require(t.delete(col("r_regionkey") === 3) == 3L,
      "partial DELETE must commit as version 3")
    require(t.delete(col("r_regionkey") === 4, mergeOnRead = true) == 4L,
      "merge-on-read DELETE must commit as version 4")
    // batch reader: serves the commits' cdc files directly (no diff pass)
    val batch = t.rowChanges(1)
      .select(col("r_regionkey"), col("r_name"),
        col("_change_type"), col("_commit_version"))
    // streaming CDF drains across property + rewrite + DV commits
    val name = s"gw43_cdf_${System.nanoTime()}"
    val q = spark.readStream.format("gwdelta")
      .option("readChangeFeed", "true").load(loc)
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table(name).select(col("r_regionkey"), col("r_name"),
      col("_change_type"), col("_commit_version"))
    val tail = streamed.filter(col("_commit_version") >= 2)
    require(tail.exceptAll(batch).isEmpty && batch.exceptAll(tail).isEmpty,
      "streamed change feed past the CDF property commit must equal " +
        "GwTable.rowChanges — both faces read the same change-data files")
    streamed.select(col("r_regionkey"), col("r_name"),
      col("_change_type").as("change_type"),
      col("_commit_version").as("change_seq"))
  }

  // ---------------------------------------------------------------- gw44
  /** In-commit timestamps (Delta `delta.enableInCommitTimestamps` parity
    * as `graft.enableInCommitTimestamps`): once enabled, every commit's
    * CommitInfo carries `inCommitTimestamp = max(now, previous + 1)` — a
    * STRICTLY MONOTONIC commit clock immune to wall-clock skew between
    * writers — and `TIMESTAMP AS OF` + DESCRIBE HISTORY resolve on it.
    * In-gate: the enabling commit stamps itself, pre-enable commits stay
    * unstamped (logs byte-stable), rapid same-millisecond commits still
    * get strictly increasing stamps, and timestamp time travel lands on
    * exact version boundaries of the ICT clock. */
  def gw44InCommitTimestamps(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("gw44")
    val loc = tmp.resolve("db/region").toString
    val region = spark.read.parquet(s"$dir/region.parquet")
    region.write.format("gwdelta").mode("append").save(loc) // v0 pre-ICT
    val t = GwTable.forPath(spark, loc)
    require(t.updateProperties(
      Map("graft.enableInCommitTimestamps" -> "true")) == 1L)
    region.write.format("gwdelta").mode("append").save(loc) // v2
    region.write.format("gwdelta").mode("append").save(loc) // v3
    def ci(v: Long): graft.log.CommitInfo =
      t.log.readVersion(v).collectFirst { case c: graft.log.CommitInfo => c }
        .getOrElse(throw new IllegalStateException(s"no CommitInfo at v$v"))
    require(ci(0).inCommitTimestamp.isEmpty,
      "pre-enable commits must stay unstamped (byte-stable logs)")
    val icts = (1L to 3L).map(v => ci(v).inCommitTimestamp.getOrElse(
      throw new IllegalStateException(s"v$v missing inCommitTimestamp")))
    require(icts.sliding(2).forall(p => p(1) > p(0)),
      s"in-commit timestamps must be strictly monotonic, got $icts")
    // TIMESTAMP AS OF resolves on the ICT clock at exact boundaries
    require(t.log.versionAtTimestamp(icts(1)) == 2L &&
      t.log.versionAtTimestamp(icts(2) - 1) == 2L &&
      t.log.versionAtTimestamp(icts(2)) == 3L,
      "timestamp time travel must resolve on the in-commit clock")
    require(t.timestampAsOf(icts(1)).count() == 2 * region.count(),
      "TIMESTAMP AS OF v2's stamp must serve exactly two appends")
    t.toDF
  }

  // ---------------------------------------------------------------- gw45
  /** Metadata retention (Delta `logRetentionDuration` +
    * `enableExpiredLogCleanup` parity): 25 single-row commits roll two
    * parquet checkpoints (interval 10), then `cleanupMetadata(0)` deletes
    * every version JSON below the newest checkpoint plus the superseded
    * checkpoint — the `_delta_log` listing shrinks from 25 entries to the
    * retention tail, which is what keeps metadata listable at thousands
    * of commits a day. In-gate: the live snapshot and every surviving
    * version replay IDENTICALLY after cleanup (content oracle-exact),
    * history shows only surviving versions, and time travel into the
    * cleaned range fails with the explicit version-not-found error, never
    * a fabricated partial replay. */
  def gw45LogRetention(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw45")
    val loc = tmp.resolve("db/nation").toString
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    for (i <- 0 until 25)
      nation.filter(col("n_nationkey") === i).coalesce(1)
        .write.format("gwdelta").mode("append").save(loc)
    val t = GwTable.forPath(spark, loc)
    require(t.log.listVersions().size == 25 &&
      t.log.listCheckpoints() == Seq(10L, 20L),
      "expected 25 commits with checkpoints at 10 and 20")
    val before = t.toDF.collect().map(_.toSeq).toSet
    val removed = t.cleanupMetadata(retentionMs = 0L)
    require(removed == 41,
      s"20 version JSONs + their 20 crcs + 1 old checkpoint, got $removed")
    require(t.log.listVersions() == (20L to 24L),
      s"only the checkpoint tail survives, got ${t.log.listVersions()}")
    // surviving versions replay exactly; the snapshot is unchanged
    require(t.toDF.collect().map(_.toSeq).toSet == before,
      "cleanup must not change the live snapshot")
    require(t.versionAsOf(22).count() == 23,
      "a surviving pre-head version must still time-travel")
    // the cleaned range fails loudly, never a fabricated replay
    val e = try { t.versionAsOf(5).count(); None }
      catch { case ex: Exception => Some(ex) }
    require(e.exists(_.getMessage.contains("not found")),
      s"time travel into the cleaned range must fail explicitly, got $e")
    require(t.history.count() == 5, "history lists surviving versions only")
    t.toDF
  }

  // ---------------------------------------------------------------- gw46
  /** Protocol table features (Delta reader/writer feature gating): plain
    * tables stay at protocol (1, 2) with byte-identical logs; the FIRST
    * commit that uses a feature (here: a deletion-vector delete) upgrades
    * to (3, 7) with explicit readerFeatures/writerFeatures IN THE SAME
    * COMMIT, so no reader can replay past the feature unaware; later
    * features accumulate (enabling CDF adds the changeDataFeed writer
    * feature); and a foreign table demanding features this engine does
    * not implement is REFUSED with the feature named — never misread or
    * corrupted (the spec's forward-compatibility contract). */
  def gw46TableFeatures(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw46")
    val loc = tmp.resolve("db/region").toString
    val region = spark.read.parquet(s"$dir/region.parquet")
    region.write.format("gwdelta").mode("append").save(loc) // v0 plain
    val t = GwTable.forPath(spark, loc)
    require(t.snapshot().protocol.contains(graft.log.Protocol(1, 2)),
      "a feature-free table must stay at plain protocol (1, 2)")
    require(t.delete(col("r_regionkey") === 1, mergeOnRead = true) == 1L)
    val p = t.snapshot().protocol.getOrElse(graft.log.Protocol())
    require(p.minReaderVersion == 3 && p.minWriterVersion == 7 &&
      p.readerFeatures.exists(_.contains("deletionVectors")) &&
      p.writerFeatures.exists(_.contains("deletionVectors")),
      s"first DV use must upgrade to table-features protocol, got $p")
    val v1 = t.log.readVersion(1L)
    require(v1.exists(_.isInstanceOf[graft.log.Protocol]) &&
      v1.exists { case a: graft.log.AddFile => a.dv.isDefined; case _ => false },
      "the upgrade must ride the SAME commit as the deletion vector")
    require(t.updateProperties(Map("graft.enableChangeDataFeed" -> "true")) == 2L)
    val p2 = t.snapshot().protocol.getOrElse(graft.log.Protocol())
    require(p2.writerFeatures.exists(f =>
      f.contains("changeDataFeed") && f.contains("deletionVectors")),
      s"features must accumulate across upgrades, got $p2")
    // a table owned by a future engine is refused, with the feature named
    val alienLoc = tmp.resolve("db/alien").toString
    val alien = graft.log.GwLog.forTable(
      spark.sparkContext.hadoopConfiguration, alienLoc)
    alien.commitAt(0L, Seq(
      graft.log.Protocol(3, 7, Some(Seq("futureMagic")), Some(Seq("futureMagic"))),
      graft.log.Metadata("alien", t.snapshot().schema.json),
      graft.log.CommitInfo(1L, "WRITE", "Overwrite", 0, 0,
        isBlindAppend = false, "a0")))
    val refused =
      try { spark.read.format("gwdelta").load(alienLoc).count(); None }
      catch { case e: Exception => Some(e) }
    require(refused.exists(_.getMessage.contains("futureMagic")),
      s"unsupported reader feature must refuse with the feature named, got $refused")
    t.toDF
  }

  // ---------------------------------------------------------------- gw47
  /** Append-only tables (Delta `delta.appendOnly` / the appendOnly writer
    * feature, stored as `graft.appendOnly`): the audit-log contract —
    * appends flow, but EVERY row-removal shape is refused typed before
    * any commit: DELETE (both strategies), UPDATE, TRUNCATE, INSERT
    * OVERWRITE, RESTORE. Maintenance compaction (dataChange=false) stays
    * legal per spec — rows never disappear, only bytes reorganize. The
    * property rides the protocol as the appendOnly writer feature, and
    * unsetting it restores full DML. */
  def gw47AppendOnly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val tmp = Files.createTempDirectory("gw47")
    val loc = tmp.resolve("db/region").toString
    val region = spark.read.parquet(s"$dir/region.parquet")
    region.write.format("gwdelta").mode("append").save(loc) // v0
    val t = GwTable.forPath(spark, loc)
    require(t.updateProperties(Map("graft.appendOnly" -> "true")) == 1L)
    require(t.snapshot().protocol.exists(
      _.writerFeatures.exists(_.contains("appendOnly"))),
      "the appendOnly property must ride the protocol as a writer feature")
    region.write.format("gwdelta").mode("append").save(loc) // appends still flow
    def refused(what: String)(body: => Any): Unit = {
      val e = try { body; None } catch { case ex: Exception => Some(ex) }
      require(e.exists(_.getMessage.contains("append-only")),
        s"$what must be refused on an append-only table, got $e")
    }
    refused("DELETE")(t.delete(col("r_regionkey") === 1))
    refused("MOR DELETE")(t.delete(col("r_regionkey") === 1, mergeOnRead = true))
    refused("UPDATE")(t.update(col("r_regionkey") === 1,
      Map("r_name" -> lit("X"))))
    refused("TRUNCATE")(t.truncate())
    refused("OVERWRITE")(
      region.write.format("gwdelta").mode("overwrite").save(loc))
    refused("RESTORE")(t.restore(0L))
    // nothing was removed by the refused operations
    require(t.toDF.count() == 2 * region.count(),
      "refused operations must leave the table untouched")
    // compaction (dataChange = false) reorganizes bytes, not rows — legal
    require(t.compact() > 0, "maintenance compaction stays legal")
    // unsetting the property restores DML
    require(t.updateProperties(Map.empty, unset = Seq("graft.appendOnly")) > 0)
    require(t.delete(col("r_regionkey") === 1) > 0)
    t.toDF
  }

  // ---------------------------------------------------------------- gw48
  /** `CREATE TABLE ... CLONE` (bare CLONE = DEEP, Delta's default): the
    * archival complement to gw30's shallow clone. Four insert commits, a
    * merge-on-read DELETE (so the cloned snapshot carries deletion-vector
    * state), then the deep clone — every clone file must live under the
    * clone's OWN tree, DV reconciliation included. The property that
    * separates deep from shallow is then proven destructively: the source
    * is truncated and force-vacuumed (its data files physically deleted),
    * and the clone must still serve the full pre-clone content. */
  def gw48DeepClone(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (name, loc) = rangedOrdersTable(spark, dir, "gw48")
    val table = GwTable.forPath(spark, loc)
    require(table.delete(col("o_custkey") % 3 === 0, mergeOnRead = true) > 0,
      "expected a merge-on-read DELETE commit")
    require(table.snapshot().files.exists(_.dv.isDefined),
      "expected deletion vectors on the cloned snapshot")
    val morCount = spark.table(name).count()
    val ns = name.split("\\.")(1)
    val res = spark.sql(s"CREATE TABLE gw.$ns.copy CLONE $name").collect()
    require(res.length == 1 && res.head.getLong(0) == 0L,
      "deep clone bootstraps at v0")
    val cloneLoc = res.head.getString(2)
    val cloneSnap = GwTable.forPath(spark, cloneLoc).snapshot()
    require(cloneSnap.files.forall(f =>
      GwTable.uriKey(f.path).startsWith(GwTable.uriKey(cloneLoc))),
      "every deep-clone data file must live under the clone's tree")
    require(cloneSnap.files.flatMap(_.dv).filter(_.isOnDisk).forall(d =>
      GwTable.uriKey(d.pathOrInlineDv).startsWith(GwTable.uriKey(cloneLoc))),
      "every deep-clone DV sidecar must live under the clone's tree")
    require(spark.table(s"gw.$ns.copy").count() == morCount,
      "clone content must equal the source snapshot")
    // destroy the source: truncate, then physically reclaim its files
    spark.sql(s"DELETE FROM $name")
    GwTable.withRetentionCheckDisabled(spark)(
      spark.sql(s"VACUUM $name RETAIN 0 HOURS").collect())
    require(spark.table(name).count() == 0L, "source is gone")
    // the deep clone owns its bytes: still serves the full snapshot
    spark.sql("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
      "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate_s, " +
      s"o_orderpriority FROM gw.$ns.copy")
  }

  // ---------------------------------------------------------------- gw49
  /** Type widening (Delta typeWidening feature): `ALTER TABLE ... ALTER
    * COLUMN ... TYPE BIGINT` is a METADATA-ONLY commit — no file rewrites
    * (pinned on the snapshot's file set) — after which the scan
    * up-converts the old files' int32 pages AND a value beyond int32
    * range inserts cleanly at the wide type. The feature rides the
    * protocol as reader+writer typeWidening (foreign readers must refuse
    * rather than misread narrow bytes), narrowing is refused typed, and
    * the pre-widen schema stays time-travelable. */
  def gw49TypeWidening(spark: SparkSession, dir: String): DataFrame = {
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw49")
    val loc = tmp.resolve("db/nation").toString
    spark.read.parquet(s"$dir/nation.parquet")
      .createOrReplaceTempView("gw49_nation_src")
    spark.sql(s"CREATE TABLE gw.$ns.nation (n_nationkey INT, n_name STRING, " +
      s"n_regionkey INT) USING gwdelta LOCATION '$loc'")
    spark.sql(s"INSERT INTO gw.$ns.nation SELECT * FROM gw49_nation_src")
    val t = GwTable.forPath(spark, loc)
    val preWiden = t.snapshot()
    spark.sql(s"ALTER TABLE gw.$ns.nation ALTER COLUMN n_nationkey TYPE BIGINT")
    val snap = t.snapshot()
    require(snap.files.map(f => (f.path, f.modificationTime)) ==
      preWiden.files.map(f => (f.path, f.modificationTime)),
      "widening must be metadata-only — no file rewrites")
    require(snap.schema("n_nationkey").dataType ==
      org.apache.spark.sql.types.LongType, "schema must restate at BIGINT")
    require(snap.protocol.exists(p =>
      p.readerFeatures.exists(_.contains("typeWidening")) &&
        p.writerFeatures.exists(_.contains("typeWidening"))),
      "typeWidening must ride the protocol on both faces")
    // a value int32 cannot hold lands cleanly at the wide type
    spark.sql(s"INSERT INTO gw.$ns.nation VALUES (3000000000, 'wide', 0)")
    // narrowing dies in Spark's own up-cast analysis before reaching us
    val narrow = try {
      spark.sql(s"ALTER TABLE gw.$ns.nation ALTER COLUMN n_regionkey TYPE SMALLINT")
      None
    } catch { case e: Exception => Some(e) }
    require(narrow.exists(_.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN")),
      s"narrowing must be refused, got $narrow")
    // a cast Spark's analyzer permits (int->string is an up-cast) but that
    // would misread the narrow file bytes dies in OUR widening guard
    val cross = try {
      spark.sql(s"ALTER TABLE gw.$ns.nation ALTER COLUMN n_regionkey TYPE STRING")
      None
    } catch { case e: Exception => Some(e) }
    require(cross.exists(e => (e.getMessage + Option(e.getCause)
      .map(_.getMessage).getOrElse("")).contains("widen")),
      s"cross-family retype must be refused by the widening guard, got $cross")
    // the pre-widen schema is still what that version's readers see
    require(spark.sql(s"SELECT * FROM gw.$ns.nation VERSION AS OF " +
      s"${preWiden.version}").schema("n_nationkey").dataType ==
      org.apache.spark.sql.types.IntegerType,
      "time travel must serve the pre-widen schema")
    spark.sql(s"SELECT n_nationkey, n_name, n_regionkey FROM gw.$ns.nation")
  }

  // ---------------------------------------------------------------- gw50
  /** Column DEFAULT values (Delta `allowColumnDefaults` writer feature):
    * defaults declared at CREATE fill omitted INSERT columns and the
    * explicit `DEFAULT` keyword — materialized by the ANALYZER (the
    * catalog declares SUPPORT_COLUMN_DEFAULT_VALUE), so files always
    * carry the column physically and no read path ever fills anything.
    * `ALTER COLUMN ... SET DEFAULT` is a metadata-only commit that
    * changes FUTURE inserts while every stored row is untouched; `DROP
    * DEFAULT` removes it (after which omitting a non-null column is
    * refused at analysis). The feature rides the protocol writer-side
    * only — readers see ordinary materialized values. */
  def gw50ColumnDefaults(spark: SparkSession, dir: String): DataFrame = {
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw50")
    val loc = tmp.resolve("db/t").toString
    spark.sql(s"CREATE TABLE gw.$ns.t (k INT, status STRING DEFAULT 'open', " +
      s"score DOUBLE DEFAULT 1.5) USING gwdelta LOCATION '$loc'")
    spark.sql(s"INSERT INTO gw.$ns.t (k) VALUES (1), (2)")
    spark.sql(s"INSERT INTO gw.$ns.t VALUES (3, 'closed', 0.0)")
    spark.sql(s"INSERT INTO gw.$ns.t (k, status) VALUES (4, DEFAULT)")
    val t = GwTable.forPath(spark, loc)
    val preAlter = t.snapshot()
    spark.sql(s"ALTER TABLE gw.$ns.t ALTER COLUMN status SET DEFAULT 'pending'")
    require(t.snapshot().files == preAlter.files,
      "SET DEFAULT must be metadata-only — stored rows untouched")
    spark.sql(s"INSERT INTO gw.$ns.t (k) VALUES (5)")
    require(t.snapshot().protocol.exists(
      _.writerFeatures.exists(_.contains("allowColumnDefaults"))),
      "defaults must ride the protocol as the writer feature")
    spark.sql(s"ALTER TABLE gw.$ns.t ALTER COLUMN status DROP DEFAULT")
    val refused = try {
      spark.sql(s"INSERT INTO gw.$ns.t (k) VALUES (6)"); false
    } catch { case _: Exception => true }
    require(refused,
      "omitting a defaultless non-null column must be refused at analysis")
    spark.sql(s"SELECT k, status, score FROM gw.$ns.t")
  }

  // ---------------------------------------------------------------- gw51
  /** `replaceWhere` predicate-scoped overwrite — the partition-window
    * reload: orders partitioned by status, the 'F' window reprocessed
    * (exact IEEE repricing) and overwritten in ONE atomic commit. The
    * untouched partitions' files must survive IDENTICALLY (never read,
    * never rewritten — the 100 TB point of the operation), every prior
    * 'F' file must be tombstoned, and a batch carrying rows OUTSIDE the
    * predicate is refused before anything commits. */
  def gw51ReplaceWhere(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw51")
    val loc = tmp.resolve("db/orders").toString
    val src = spark.read.parquet(s"$dir/orders.parquet")
    src.write.format("gwdelta").partitionBy("o_orderstatus")
      .mode("append").save(loc)
    val t = GwTable.forPath(spark, loc)
    val before = t.snapshot()
    // a batch with rows outside the window must die before any commit
    val bad = try {
      src.filter(col("o_orderstatus") === "O")
        .write.format("gwdelta").mode("overwrite")
        .option("replaceWhere", "o_orderstatus = 'F'").save(loc)
      None
    } catch { case e: Exception => Some(e) }
    require(bad.exists(e => (e.getMessage + Option(e.getCause)
      .map(_.getMessage).getOrElse("")).contains("replaceWhere")),
      s"out-of-window batch must be refused, got $bad")
    require(t.snapshot().version == before.version,
      "the refused write must not have committed anything")
    // the reload: reprice the F window, replace it atomically
    src.filter(col("o_orderstatus") === "F")
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .write.format("gwdelta").mode("overwrite")
      .option("replaceWhere", "o_orderstatus = 'F'").save(loc)
    val after = t.snapshot()
    require(after.version == before.version + 1, "one atomic commit")
    val untouched = before.files.filterNot(
      _.partitionValues.get("o_orderstatus").contains("F"))
    require(untouched.forall(after.files.contains),
      "files outside the window must survive byte-identically")
    require(!after.files.exists(f => before.files.contains(f) &&
      f.partitionValues.get("o_orderstatus").contains("F")),
      "every prior F-window file must be tombstoned")
    spark.read.format("gwdelta").load(loc)
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate_s",
        "o_orderpriority")
  }

  // ---------------------------------------------------------------- gw52
  /** Row tracking (Delta rowTracking): every committed file gets a
    * contiguous row-id range atomically with its commit (baseRowId +
    * high-water mark riding the same metadata action), ids surface as the
    * `__gw_row_id` metadata column (baseRowId + physical position), and —
    * the point of the feature — they are STABLE under merge-on-read DML:
    * a MOR delete grows a bitmap, never rewrites a file, so every
    * surviving row keeps its id. Ordered single-file appends make the
    * key→id mapping deterministic, so the gate is oracle-exact: copy 1 of
    * nation gets ids 0..24 in key order, copy 2 gets 25..49, and the MOR
    * delete of even keys must leave exactly the odd keys' original ids. */
  def gw52RowTracking(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw52")
    val loc = tmp.resolve("db/nation").toString
    val src = spark.read.parquet(s"$dir/nation.parquet")
      .orderBy("n_nationkey").coalesce(1)
    graft.streaming.GwSink.append(src, loc,
      bootstrapProps = Map("graft.enableRowTracking" -> "true"))
    graft.streaming.GwSink.append(src, loc)
    val t = GwTable.forPath(spark, loc)
    val snap = t.snapshot()
    require(snap.protocol.exists(
      _.writerFeatures.exists(_.contains("rowTracking"))),
      "row tracking must ride the protocol as the writer feature")
    require(snap.files.forall(_.baseRowId.isDefined),
      "every tracked add must carry a baseRowId")
    require(snap.metadata.exists(_.configuration
      .get("graft.rowTracking.highWaterMark").contains("49")),
      "high-water mark must advance atomically with the assigned files")
    val preIds = spark.read.format("gwdelta").load(loc)
      .select("n_nationkey", "__gw_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toSet
    require(preIds.size == 50 && preIds.map(_._2) == (0L until 50L).toSet,
      "ids must be a contiguous unique range across both appends")
    // merge-on-read delete: files never rewrite, surviving ids must hold
    require(t.delete(col("n_nationkey") % 2 === 0, mergeOnRead = true) > 0)
    val postIds = spark.read.format("gwdelta").load(loc)
      .select("n_nationkey", "__gw_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toSet
    require(postIds.subsetOf(preIds),
      "a merge-on-read delete must not move any surviving row's id")
    spark.read.format("gwdelta").load(loc)
      .selectExpr("n_nationkey", "n_name", "__gw_row_id AS row_id")
  }

  // ---------------------------------------------------------------- gw53
  /** `CONVERT TO GWDELTA parquet.`dir`` — in-place conversion of a plain
    * parquet directory (two files staged from the nation fixture) into a
    * transactional table: ONE bootstrap commit pointing at the files
    * where they lie (zero bytes move, pinned on modification times), with
    * footer stats harvested so the first filtered query already plans
    * file-skipping (pinned: a selective read opens one file). The
    * converted table is immediately fully transactional — DELETE, time
    * travel back to the conversion snapshot — and re-converting or
    * converting a hive-partitioned layout refuses typed. */
  def gw53Convert(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    graft.GraftExtensions.register(spark)
    val tmp = Files.createTempDirectory("gw53")
    val loc = tmp.resolve("plain").toString
    val src = spark.read.parquet(s"$dir/nation.parquet")
    // a plain two-file parquet dataset, as any Spark job would leave it
    src.filter(col("n_nationkey") < 12).coalesce(1)
      .write.mode("append").parquet(loc)
    src.filter(col("n_nationkey") >= 12).coalesce(1)
      .write.mode("append").parquet(loc)
    val preMtimes = new java.io.File(loc).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    val res = spark.sql(s"CONVERT TO GWDELTA parquet.`$loc`").collect()
    require(res.length == 1 && res.head.getLong(1) == 0L,
      "conversion is one bootstrap commit at v0")
    val postMtimes = new java.io.File(loc).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    require(preMtimes == postMtimes, "conversion must move zero bytes")
    val t = GwTable.forPath(spark, loc)
    require(t.snapshot().files.size == 2, "both files adopted")
    // harvested stats make the very first filtered query skip files
    val planned = spark.read.format("gwdelta").load(loc)
      .filter(col("n_nationkey") >= 20)
      .queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan).asInstanceOf[
              org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.head
    require(planned == 1, s"stats skipping must plan 1 file, got $planned")
    // instantly transactional: DML + time travel to the conversion snapshot
    require(t.delete(col("n_nationkey") >= 20) > 0)
    require(spark.read.format("gwdelta").option("versionAsOf", 0)
      .load(loc).count() == 25,
      "the conversion snapshot stays time-travelable")
    val again = try { spark.sql(s"CONVERT TO GWDELTA parquet.`$loc`"); None }
      catch { case e: Exception => Some(e) }
    require(again.exists(_.getMessage.contains("already a gwdelta table")),
      s"re-converting must refuse, got $again")
    spark.read.format("gwdelta").load(loc)
      .select("n_nationkey", "n_name", "n_regionkey")
  }

  // ---------------------------------------------------------------- gw54
  /** `VACUUM ... DRY RUN` (Delta parity): preview exactly what a vacuum
    * would reclaim without touching anything — the guard does not apply
    * (previewing an aggressive retention is the point). Pinned: the dry
    * run lists the OPTIMIZE-superseded files, every listed file still
    * exists afterwards, the real vacuum then deletes exactly that set,
    * and a second dry run is empty. */
  def gw54VacuumDryRun(spark: SparkSession, dir: String): DataFrame = {
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw54")
    val loc = tmp.resolve("db/region").toString
    spark.read.parquet(s"$dir/region.parquet")
      .createOrReplaceTempView("gw54_region_src")
    spark.sql(s"CREATE TABLE gw.$ns.region (r_regionkey INT, r_name STRING) " +
      s"USING gwdelta LOCATION '$loc'")
    spark.sql(s"INSERT INTO gw.$ns.region SELECT * FROM gw54_region_src")
    spark.sql(s"INSERT INTO gw.$ns.region SELECT * FROM gw54_region_src")
    spark.sql(s"OPTIMIZE gw.$ns.region").collect()
    val preview = spark.sql(s"VACUUM gw.$ns.region RETAIN 0 HOURS DRY RUN")
      .collect().map(_.getString(0))
    require(preview.length >= 2,
      s"dry run must list the superseded insert files, got ${preview.toSeq}")
    val conf = spark.sparkContext.hadoopConfiguration
    require(preview.forall(p => new org.apache.hadoop.fs.Path(p)
      .getFileSystem(conf).exists(new org.apache.hadoop.fs.Path(p))),
      "DRY RUN must not delete anything")
    val real = GwTable.withRetentionCheckDisabled(spark)(
      spark.sql(s"VACUUM gw.$ns.region RETAIN 0 HOURS").collect())
    require(real.head.getInt(1) == preview.length,
      s"the real vacuum must delete exactly the previewed set: " +
        s"${real.head.getInt(1)} vs ${preview.length}")
    require(spark.sql(s"VACUUM gw.$ns.region RETAIN 0 HOURS DRY RUN")
      .collect().isEmpty, "a second dry run must be empty")
    spark.sql(s"SELECT r_regionkey, r_name FROM gw.$ns.region")
  }

  // ---------------------------------------------------------------- gw55
  /** `RESTORE ... TO TIMESTAMP AS OF` (Delta parity): the restore target
    * resolves on the same clock as `TIMESTAMP AS OF` reads — greatest
    * version at or before the timestamp, taken here from DESCRIBE
    * HISTORY's own rendering of the pre-delete commit. The delete is
    * undone; the deleted era stays time-travelable. */
  def gw55RestoreTimestamp(spark: SparkSession, dir: String): DataFrame = {
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw55")
    val loc = tmp.resolve("db/nation").toString
    spark.read.parquet(s"$dir/nation.parquet")
      .createOrReplaceTempView("gw55_nation_src")
    spark.sql(s"CREATE TABLE gw.$ns.nation (n_nationkey INT, n_name STRING, " +
      s"n_regionkey INT) USING gwdelta LOCATION '$loc'")
    spark.sql(s"INSERT INTO gw.$ns.nation SELECT * FROM gw55_nation_src")
    val full = spark.table(s"gw.$ns.nation").count()
    // the delete must land on a LATER millisecond than the insert
    Thread.sleep(15)
    spark.sql(s"DELETE FROM gw.$ns.nation WHERE n_nationkey >= 10")
    require(spark.table(s"gw.$ns.nation").count() < full)
    // v0 = the bootstrap insert; its history timestamp (millis), rendered
    // and re-parsed through the same local clock, round-trips exactly
    val insertMs = spark.sql(s"DESCRIBE HISTORY gw.$ns.nation").collect()
      .filter(_.getLong(0) == 0L).map(_.getLong(1)).head
    val tsLit = new java.sql.Timestamp(insertMs).toString
    val res = spark.sql(s"RESTORE TABLE gw.$ns.nation " +
      s"TO TIMESTAMP AS OF '$tsLit'").collect()
    require(res.length == 1 && res.head.getLong(1) == 0L,
      s"timestamp must resolve to the insert version, got ${res.toSeq}")
    require(spark.table(s"gw.$ns.nation").count() == full,
      "the delete must be undone")
    spark.sql(s"SELECT n_nationkey, n_name, n_regionkey FROM gw.$ns.nation")
  }

  // ---------------------------------------------------------------- gw56
  /** Multi-part checkpoints (Delta `<v>.checkpoint.<part>.<N>.parquet`):
    * above `graft.checkpoint.partSize` actions the snapshot splits across
    * N part files — at 100 TB a checkpoint of millions of AddFiles cannot
    * be one parquet file. Pinned E2E: the interval checkpoint lands as a
    * complete part set (no single-file form), `_last_checkpoint` carries
    * `parts`, the checkpoint-resumed snapshot serves the full content,
    * and a TORN set (one part deleted — a crash mid-write) is treated as
    * ABSENT: reads fall back to JSON replay with identical results,
    * never a partial snapshot. */
  def gw56MultipartCheckpoint(spark: SparkSession, dir: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setInt("graft.checkpoint.partSize", 5)
    try {
      val tmp = Files.createTempDirectory("gw56")
      val loc = tmp.resolve("db/region").toString
      val region = spark.read.parquet(s"$dir/region.parquet").coalesce(1)
      for (_ <- 0 to 10) // v0..v10; v10 hits the checkpoint interval
        region.write.format("gwdelta").mode("append").save(loc)
      val log = graft.log.GwLog.forTable(hconf, loc)
      require(log.listCheckpoints() == Seq(10L),
        s"expected the v10 checkpoint, got ${log.listCheckpoints()}")
      // 2 metadata actions + 11 adds = 13 actions at partSize 5 -> 3 parts
      val fs = new org.apache.hadoop.fs.Path(loc).getFileSystem(hconf)
      val parts = (1 to 3).map(p => log.checkpointPartPathFor(10L, p, 3))
      require(parts.forall(fs.exists), "expected a complete 3-part set")
      require(!fs.exists(log.checkpointPathFor(10L)),
        "no single-file form for a multi-part checkpoint")
      val expect = 11L * region.count()
      require(spark.read.format("gwdelta").load(loc).count() == expect,
        "checkpoint-resumed snapshot must serve the full content")
      // torn set: reads must fall back to JSON replay, identical results
      fs.delete(parts(1), false)
      require(graft.log.GwLog.forTable(hconf, loc).listCheckpoints().isEmpty,
        "a torn part set must not count as a checkpoint")
      require(spark.read.format("gwdelta").load(loc).count() == expect,
        "JSON replay must serve identical content past the torn checkpoint")
      spark.read.format("gwdelta").load(loc)
        .select("r_regionkey", "r_name")
    } finally hconf.unset("graft.checkpoint.partSize")
  }

  // ---------------------------------------------------------------- gw57
  /** Bloom-filter file skipping: the point-lookup case min/max stats
    * cannot touch — orders written in four `o_orderkey % 4` slices, so
    * EVERY file's key range spans the whole domain and range stats prune
    * nothing, while the per-file bloom (graft.bloom.columns) answers
    * membership from the LOG. Pinned: each point lookup plans at most 2
    * of the 4 files (exactly 1 modulo the documented ~1e-4 FP rate), a
    * key that exists nowhere scans to zero rows, and the blooms survive
    * the log round trip (they ride the stats JSON). Pruning is
    * conservative by construction — the content compare is the proof. */
  def gw57BloomSkipping(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw57")
    val loc = tmp.resolve("db/orders").toString
    val src = spark.read.parquet(s"$dir/orders.parquet")
    (0 until 4).foreach { m =>
      graft.streaming.GwSink.append(
        src.filter(col("o_orderkey") % 4 === m).coalesce(1), loc,
        bootstrapProps = Map(graft.log.Bloom.ColumnsProp -> "o_orderkey"))
    }
    val t = GwTable.forPath(spark, loc)
    require(t.snapshot().files.forall(f =>
      graft.log.Bloom.ofFile(f, "o_orderkey").isDefined),
      "every committed file must carry the o_orderkey bloom")
    val keys = src.orderBy("o_orderkey").limit(3)
      .collect().map(_.getLong(0))
    def planned(k: Long): Int =
      spark.read.format("gwdelta").load(loc)
        .filter(col("o_orderkey") === k)
        .queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan).asInstanceOf[
                org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
              .fileIndex.inputFiles.length
        }.head
    keys.foreach(k => require(planned(k) <= 2,
      s"bloom must prune to <=2 of 4 files for key $k, planned ${planned(k)}"))
    // a key no file contains: every bloom misses, nothing is read
    require(spark.read.format("gwdelta").load(loc)
      .filter(col("o_orderkey") === -1L).count() == 0L)
    // IN-lists probe per member: three keys can touch at most three files
    val inPlanned = spark.read.format("gwdelta").load(loc)
      .filter(col("o_orderkey").isin(keys.map(Long.box): _*))
      .queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan).asInstanceOf[
              org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.head
    require(inPlanned <= 3,
      s"IN-list bloom must prune to <=3 of 4 files, planned $inPlanned")
    keys.map(k => spark.read.format("gwdelta").load(loc)
        .filter(col("o_orderkey") === k))
      .reduce(_ unionAll _)
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate_s",
        "o_orderpriority")
  }

  // ---------------------------------------------------------------- gw58
  /** Minor log compaction (Delta `<start>.<end>.compacted.json`): every
    * `graft.logCompaction.interval` commits (an ENGINE conf, like Delta's
    * own trigger) the last n commits fold into one reconciled segment, so
    * a snapshot's replay tail costs O(1) small-object reads instead of
    * one per commit — at 100 TB a busy table commits thousands of times
    * between checkpoints and the tail reads ARE the snapshot latency.
    * Pinned here: segments land at the trigger cadence; a checkpoint-free
    * replay of 12 commits reads THREE segments and ZERO commit JSONs
    * (lastReplayReads); a segment covering a DELETE replays its remove
    * tombstone identically (contents equal the uncompacted replay at
    * every probed version); a CORRUPTED segment falls back to the covered
    * version JSONs — originals stay the committed truth; and retention
    * cleanup deletes segments superseded by a newer checkpoint. */
  def gw58LogCompaction(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw58")
    val loc = tmp.resolve("db/nation").toString
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setInt("graft.logCompaction.interval", 4)
    try {
      for (i <- 0 to 10) // v0..v10: one single-file append per key
        nation.filter(col("n_nationkey") === i).coalesce(1)
          .write.format("gwdelta").mode("append").save(loc)
      val t = GwTable.forPath(spark, loc)
      val delVersion = t.delete(col("n_nationkey") === 5) // v11
      require(delVersion == 11L, s"delete must commit as v11, got $delVersion")
      require(t.log.listCompacted() == Seq((0L, 3L), (4L, 7L), (8L, 11L)),
        s"trigger cadence: ${t.log.listCompacted()}")
      val expectHead = t.toDF.collect().map(_.toSeq).toSet
      val hpath = new org.apache.hadoop.fs.Path(loc)
      val fs = hpath.getFileSystem(hconf)
      // checkpoints are an optimization, JSONs + segments the truth: drop
      // v10's checkpoint and the whole 12-commit tail replays as THREE
      // segment reads and ZERO commit JSONs — the delete's remove
      // tombstone riding segment (8,11) replays identically
      require(fs.delete(t.log.checkpointPathFor(10L), false),
        "checkpoint v10 must exist to delete")
      val bare = new graft.log.GwLog(hpath, hconf)
      val viaSegments = bare.snapshot()
      require(bare.lastReplayReads ==
        ((None, Seq.empty[Long], Seq((0L, 3L), (4L, 7L), (8L, 11L)))),
        s"segments must replace every commit read: ${bare.lastReplayReads}")
      require(spark.read.format("gwdelta").load(loc)
        .collect().map(_.toSeq).toSet == expectHead,
        "segment-only replay must serve the same table")
      // time travel BELOW the newest segment mixes segments + commit JSONs
      require(bare.snapshot(Some(9L)).files.size == 10 &&
        bare.lastReplayReads._2 == Seq(8L, 9L) &&
        bare.lastReplayReads._3 == Seq((0L, 3L), (4L, 7L)),
        s"partial tail: ${bare.lastReplayReads}")
      require(t.versionAsOf(9).collect().map(_.toSeq).toSet ==
        nation.filter(col("n_nationkey") <= 9).collect().map(_.toSeq).toSet,
        "time travel through segments must equal the uncompacted replay")
      // a torn/corrupt segment can never serve a wrong snapshot: readers
      // fall back to the covered version JSONs
      val seg = t.log.compactedPathFor(0L, 3L)
      val out = fs.create(seg, true)
      try out.write("not json".getBytes("UTF-8")) finally out.close()
      require(bare.snapshot().filePaths.toSet == viaSegments.filePaths.toSet,
        "corrupt segment must fall back to version JSONs")
      require(bare.lastReplayReads._2 == (0L to 3L) &&
        bare.lastReplayReads._3 == Seq((4L, 7L), (8L, 11L)),
        s"fallback reads: ${bare.lastReplayReads}")
      // retention: segments below the newest checkpoint are superseded
      // artifacts and age out with their covered JSONs
      bare.writeCheckpoint(10L)
      val ncleaned = t.cleanupMetadata(retentionMs = 0L)
      require(ncleaned > 0, s"cleanup must delete artifacts, got $ncleaned")
      require(t.log.listCompacted() == Seq((8L, 11L)),
        s"superseded segments must age out: ${t.log.listCompacted()}")
      require(t.toDF.collect().map(_.toSeq).toSet == expectHead,
        "cleanup must not change the live snapshot")
      t.toDF
    } finally hconf.unset("graft.logCompaction.interval")
  }

  // ---------------------------------------------------------------- gw59
  /** V2 checkpoints (Delta `checkpointPolicy=v2`, the `v2Checkpoint`
    * table feature): the checkpoint becomes a small UUID-named MANIFEST —
    * protocol/metadata/txns + a `checkpointMetadata` self-description +
    * `sidecar` refs — while the file actions land in parallel-readable
    * sidecar parquets under `_delta_log/_sidecars/`. At 100 TB this is
    * what lets a coordinator read table-level state without scanning
    * millions of file entries, and what an incremental checkpointer needs
    * to REUSE unchanged sidecars across checkpoints. Pinned: the policy
    * property upgrades the protocol in the SAME commit (reader+writer
    * feature); the v10 checkpoint is manifest+sidecars with no inline
    * adds; replay resumes from it after the covered JSONs age out; a
    * missing sidecar can never serve a partial snapshot (falls back to
    * JSON replay); a newer checkpoint supersedes the old manifest AND
    * strands its sidecars for reference-based GC. */
  def gw59V2Checkpoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw59")
    val loc = tmp.resolve("db/region").toString
    val region = spark.read.parquet(s"$dir/region.parquet")
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setInt("graft.checkpoint.partSize", 3)
    try {
      graft.streaming.GwSink.append(
        region.filter(col("r_regionkey") === 0).coalesce(1), loc,
        bootstrapProps = Map("graft.checkpointPolicy" -> "v2"))
      val t = GwTable.forPath(spark, loc)
      val p0 = t.snapshot().protocol.getOrElse(graft.log.Protocol())
      require(p0.readerFeatures.exists(_.contains("v2Checkpoint")) &&
        p0.writerFeatures.exists(_.contains("v2Checkpoint")),
        s"declaring the v2 policy must carry the feature upgrade, got $p0")
      for (i <- 1 to 10) // v1..v10; checkpoint fires at v10
        region.filter(col("r_regionkey") === i % 5).coalesce(1)
          .write.format("gwdelta").mode("append").save(loc)
      val cpFiles = t.log.checkpointFilesFor(10L)
      require(cpFiles.size == 1 &&
        cpFiles.head.getName.matches(raw"0*10\.checkpoint\.[0-9a-f-]{36}\.parquet"),
        s"v10 checkpoint must be one UUID manifest, got $cpFiles")
      val manifest = graft.log.Checkpoint.read(cpFiles.head, hconf)
      val refs = manifest.collect { case s: graft.log.SidecarFile => s }
      require(manifest.exists {
        case graft.log.CheckpointMetadata(10L) => true; case _ => false },
        "manifest must self-describe via checkpointMetadata")
      require(refs.size >= 4, s"11 adds at partSize 3 need >=4 sidecars, got ${refs.size}")
      require(!manifest.exists(_.isInstanceOf[graft.log.AddFile]),
        "file actions belong in sidecars, not the manifest")
      val fs = t.log.sidecarDir.getFileSystem(hconf)
      refs.foreach(r => require(
        fs.exists(new org.apache.hadoop.fs.Path(t.log.sidecarDir, r.path)),
        s"sidecar ${r.path} missing"))
      region.filter(col("r_regionkey") === 11 % 5).coalesce(1)
        .write.format("gwdelta").mode("append").save(loc) // v11
      val expectHead = t.toDF.collect().map(_.toSeq).toSet
      // a missing sidecar must never yield a partial snapshot
      val hidden = new org.apache.hadoop.fs.Path(t.log.sidecarDir, refs.head.path)
      val aside = new org.apache.hadoop.fs.Path(t.log.sidecarDir, "hidden.tmp")
      require(fs.rename(hidden, aside), "sidecar rename failed")
      val bare = new graft.log.GwLog(new org.apache.hadoop.fs.Path(loc), hconf)
      require(bare.snapshot().files.map(_.path).toSet ==
        t.snapshot().files.map(_.path).toSet,
        "missing sidecar must fall back to full JSON replay")
      require(bare.lastReplayReads._1.isEmpty,
        s"fallback must not claim the checkpoint: ${bare.lastReplayReads}")
      require(fs.rename(aside, hidden), "sidecar restore failed")
      // replay resumes from the v2 checkpoint once covered JSONs age out
      require(t.cleanupMetadata(retentionMs = 0L) > 0, "cleanup must act")
      val fresh = new graft.log.GwLog(new org.apache.hadoop.fs.Path(loc), hconf)
      require(fresh.snapshot().filePaths.toSet ==
        t.snapshot().filePaths.toSet, "post-cleanup replay must agree")
      require(fresh.lastReplayReads._1.contains(10L),
        s"replay must resume from the manifest: ${fresh.lastReplayReads}")
      require(spark.read.format("gwdelta").load(loc)
        .collect().map(_.toSeq).toSet == expectHead,
        "post-cleanup reads must resume from the v2 checkpoint")
      // a newer checkpoint supersedes the manifest; its sidecars become
      // unreferenced and reference-based GC reclaims them
      for (i <- 12 to 21) // v12..v21; checkpoint fires at v20
        region.filter(col("r_regionkey") === i % 5).coalesce(1)
          .write.format("gwdelta").mode("append").save(loc)
      require(t.log.checkpointFilesFor(20L).nonEmpty, "v20 checkpoint missing")
      val before = fs.listStatus(t.log.sidecarDir).length
      require(t.cleanupMetadata(retentionMs = 0L) > 0, "second cleanup must act")
      require(t.log.checkpointFilesFor(10L).isEmpty,
        "the superseded v10 manifest must age out")
      val after = fs.listStatus(t.log.sidecarDir).length
      require(after < before,
        s"unreferenced sidecars must be GC'd ($before -> $after)")
      t.toDF
    } finally hconf.unset("graft.checkpoint.partSize")
  }

  // ---------------------------------------------------------------- gw60
  /** Version checksums (Delta `<version>.crc`, OSS VersionChecksum): every
    * commit summarizes its post-state — tableSizeBytes / numFiles / DV
    * counts — in a one-line advisory file. Pinned here: a crc exists for
    * every commit and verifies against an independent replay; merge-on-read
    * DELETE surfaces its deletion vectors in the counts; a TAMPERED crc
    * fails verification loudly (the whole point — silent metadata
    * corruption is the one failure a result-equality gate can never see);
    * an unparseable crc reads as absent, never as a failure; a deleted crc
    * backfills from replay; metadata cleanup retires crcs with their
    * version JSONs. */
  def gw60VersionChecksum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (name, loc) = rangedOrdersTable(spark, dir, "gw60")
    val table = GwTable.forPath(spark, loc)
    val log = table.log
    val head = table.snapshot().version
    (0L to head).foreach { v =>
      val stored = log.verifyChecksum(v)
      require(stored.isDefined, s"commit $v must carry a verifiable crc")
      require(stored.get == graft.log.VersionChecksum.of(log.snapshot(Some(v))),
        s"verify must return the replay-equal checksum at $v")
    }
    require(log.readChecksum(head).get.numFiles ==
      table.snapshot().files.size.toLong, "head crc must count live files")
    // merge-on-read DELETE: the DVs land in the counts; the deleted-row
    // count is cross-checked against the INDEPENDENT before/after reads,
    // not the snapshot the crc was computed from
    val preCount = spark.table(name).count()
    require(table.delete(col("o_custkey") % 7 === 0, mergeOnRead = true) > 0,
      "expected a merge-on-read DELETE commit")
    val rowsDeleted = preCount - spark.table(name).count()
    require(rowsDeleted > 0, "the DELETE must hit rows")
    val afterDv = log.readChecksum(table.snapshot().version)
    require(afterDv.exists(_.numDeletionVectors > 0),
      s"crc must count deletion vectors, got $afterDv")
    require(afterDv.exists(_.numDeletedRecords == rowsDeleted),
      s"crc numDeletedRecords must equal the DELETE's row count $rowsDeleted, got $afterDv")
    // tampering: a crc that PARSES but disagrees with replay must throw
    val fs = log.checksumPathFor(head).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val target = log.checksumPathFor(head)
    val forged = afterDv.get.copy(numFiles = afterDv.get.numFiles + 99)
    fs.delete(target, false)
    val out = fs.create(target, true)
    try out.write((graft.log.VersionChecksum.toJson(forged) + "\n").getBytes("UTF-8"))
    finally out.close()
    val err = try { log.verifyChecksum(head); None }
      catch { case e: IllegalStateException => Some(e.getMessage) }
    require(err.exists(_.contains("checksum mismatch")),
      s"a forged crc must fail verification loudly, got $err")
    // damage: an UNPARSEABLE crc reads as absent (advisory, not load-bearing)
    val out2 = fs.create(target, true)
    try out2.write("not json at all".getBytes("UTF-8")) finally out2.close()
    require(log.readChecksum(head).isEmpty && log.verifyChecksum(head).isEmpty,
      "a damaged crc must read as absent")
    // backfill: delete + rewrite from replay, verification green again
    fs.delete(target, false)
    log.writeChecksum(head)
    require(log.verifyChecksum(head).isDefined, "backfilled crc must verify")
    // retention: crcs retire with their version JSONs
    log.writeCheckpoint(table.snapshot().version)
    require(log.cleanupExpiredLogs(retentionMs = 0L) > 0, "cleanup must act")
    require(log.readChecksum(0L).isEmpty,
      "crcs below the newest checkpoint must age out with their commits")
    spark.sql(s"SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
      "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate_s, " +
      s"o_orderpriority FROM $name")
  }

  // ---------------------------------------------------------------- gw61
  /** Domain metadata (Delta `domainMetadata` writer feature): named,
    * opaque per-table configuration domains in the log — the extension
    * point features like liquid clustering hang state on. Pinned: first
    * use upgrades the protocol (writer-only, same commit); latest-per-
    * domain wins; removal tombstones erase and never resurrect across a
    * checkpoint resume; time travel sees historical configurations;
    * clones carry domains; RESTORE reverts them (re-asserting removed
    * ones, tombstoning ones created since). */
  def gw61DomainMetadata(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw61")
    val loc = tmp.resolve("db/region").toString
    val region = spark.read.parquet(s"$dir/region.parquet")
    graft.streaming.GwSink.append(region.coalesce(1), loc)
    val t = GwTable.forPath(spark, loc)
    require(t.snapshot().protocol.forall(
      _.writerFeatures.forall(!_.contains("domainMetadata"))),
      "a fresh table must not declare the feature")
    val vSet = t.setDomainMetadata("graft.clustering", """{"cols":["r_regionkey"]}""")
    val p = t.snapshot().protocol.getOrElse(graft.log.Protocol())
    require(p.writerFeatures.exists(_.contains("domainMetadata")) &&
      p.readerFeatures.forall(!_.contains("domainMetadata")),
      s"first use must add the WRITER-only feature in the same commit, got $p")
    require(t.domainMetadata ==
      Map("graft.clustering" -> """{"cols":["r_regionkey"]}"""),
      s"domain must be live, got ${t.domainMetadata}")
    // latest wins; a second domain coexists
    t.setDomainMetadata("graft.clustering", """{"cols":["r_name"]}""")
    t.setDomainMetadata("graft.retention", """{"days":30}""")
    require(t.domainMetadata("graft.clustering") == """{"cols":["r_name"]}""",
      "latest configuration must win")
    // time travel sees the historical configuration
    require(t.snapshot(Some(vSet)).domains("graft.clustering") ==
      """{"cols":["r_regionkey"]}""", "time travel must see the old config")
    // clones carry domains
    val cloneLoc = tmp.resolve("db/clone").toString
    t.cloneTo(cloneLoc)
    require(GwTable.forPath(spark, cloneLoc).domainMetadata == t.domainMetadata,
      "a clone must carry the source's domains")
    // removal: tombstoned, loud on a second attempt
    val vPreRemove = t.snapshot().version
    t.removeDomainMetadata("graft.retention")
    require(t.domainMetadata.keySet == Set("graft.clustering"),
      "a removed domain must leave the snapshot")
    val dup = try { t.removeDomainMetadata("graft.retention"); None }
      catch { case e: IllegalArgumentException => Some(e.getMessage) }
    require(dup.exists(_.contains("no metadata domain")),
      s"removing an absent domain must fail loudly, got $dup")
    // RESTORE reverts domains: the removed domain comes back
    t.restore(vPreRemove)
    require(t.domainMetadata.keySet == Set("graft.clustering", "graft.retention"),
      s"RESTORE must re-assert the removed domain, got ${t.domainMetadata}")
    // checkpoint + cleanup: domains survive the resume, and a domain
    // removed before the checkpoint never resurrects (the checkpoint
    // stores the replayed LIVE set)
    t.removeDomainMetadata("graft.retention")
    t.log.writeCheckpoint(t.snapshot().version)
    require(t.cleanupMetadata(retentionMs = 0L) > 0, "cleanup must act")
    val fresh = new graft.log.GwLog(
      new org.apache.hadoop.fs.Path(loc), spark.sparkContext.hadoopConfiguration)
    require(fresh.snapshot().domains == Map(
      "graft.clustering" -> """{"cols":["r_name"]}"""),
      s"checkpoint resume must serve live domains only, got ${fresh.snapshot().domains}")
    t.toDF.select(col("r_regionkey"), col("r_name"))
  }

  // ---------------------------------------------------------------- gw62
  /** Incremental V2 checkpoints: sidecar membership is a stable hash of
    * the action's file path, and sidecar names are content-addressed
    * (type-3 UUID of the bucket's canonical bytes) — so a checkpoint
    * writes only the buckets that changed since the previous one. This is
    * THE v2-checkpoint payoff at 100 TB: a 10M-file table that churned
    * 100 files between checkpoints rewrites a handful of buckets, not a
    * multi-GB snapshot. Pinned: a metadata-only commit epoch
    * re-checkpoints with ZERO sidecar writes (ref-for-ref identical,
    * sidecar dir untouched); one data append rewrites exactly ONE bucket
    * (every other ref reused by name); replay resumes from the
    * incremental manifest and equals full JSON replay; reference-based
    * GC reclaims superseded bucket versions while keeping every sidecar
    * the live manifest still references. */
  def gw62IncrementalCheckpoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw62")
    val loc = tmp.resolve("db/region").toString
    val region = spark.read.parquet(s"$dir/region.parquet")
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setInt("graft.checkpoint.partSize", 3)
    try {
      graft.streaming.GwSink.append(
        region.filter(col("r_regionkey") === 0).coalesce(1), loc,
        bootstrapProps = Map("graft.checkpointPolicy" -> "v2"))
      val t = GwTable.forPath(spark, loc)
      for (i <- 1 to 10) // v1..v10; the v10 checkpoint covers 11 adds
        region.filter(col("r_regionkey") === i % 5).coalesce(1)
          .write.format("gwdelta").mode("append").save(loc)
      def refsOf(v: Long): Seq[graft.log.SidecarFile] =
        t.log.checkpointFilesFor(v)
          .flatMap(p => graft.log.Checkpoint.read(p, hconf))
          .collect { case s: graft.log.SidecarFile => s }
      val refs10 = refsOf(10L)
      require(refs10.size == 4, s"11 adds at partSize 3 -> 4 buckets, got ${refs10.size}")
      val fs = t.log.sidecarDir.getFileSystem(hconf)
      val dirAt10 = fs.listStatus(t.log.sidecarDir).map(_.getPath.getName).toSet
      // v11..v20 are metadata-only commits: the v20 checkpoint must reuse
      // every data sidecar — a metadata epoch re-checkpoints for free
      for (i <- 1 to 10) t.setDomainMetadata("graft.epoch", s"""{"n":$i}""")
      require(t.snapshot().version == 20L,
        s"expected v20 after ten domain commits, got ${t.snapshot().version}")
      val refs20 = refsOf(20L)
      require(refs20.map(_.path) == refs10.map(_.path),
        s"a metadata-only epoch must reuse every sidecar ref-for-ref:\n" +
          s"  v10=${refs10.map(_.path)}\n  v20=${refs20.map(_.path)}")
      require(fs.listStatus(t.log.sidecarDir).map(_.getPath.getName).toSet == dirAt10,
        "a fully-reused checkpoint must write no new sidecar files")
      // one data append: exactly one bucket's content changes
      region.filter(col("r_regionkey") === 2).coalesce(1)
        .write.format("gwdelta").mode("append").save(loc) // v21
      t.log.writeCheckpoint(21L)
      val refs21 = refsOf(21L)
      require(refs21.size == 4, s"12 adds at partSize 3 -> 4 buckets, got ${refs21.size}")
      val changed = refs20.map(_.path).zip(refs21.map(_.path)).count { case (a, b) => a != b }
      require(changed == 1,
        s"one new file must rewrite exactly one bucket, got $changed changed:\n" +
          s"  v20=${refs20.map(_.path)}\n  v21=${refs21.map(_.path)}")
      // replay equivalence: resume from the incremental manifest after the
      // covered JSONs age out, serving the same rows as full JSON replay
      val expect = t.toDF.collect().map(_.toSeq).toSet
      require(t.cleanupMetadata(retentionMs = 0L) > 0, "cleanup must act")
      val fresh = new graft.log.GwLog(new org.apache.hadoop.fs.Path(loc), hconf)
      require(fresh.snapshot().filePaths.toSet == t.snapshot().filePaths.toSet,
        "post-cleanup replay must agree with the live log")
      require(fresh.lastReplayReads._1.contains(21L),
        s"replay must resume from the v21 manifest: ${fresh.lastReplayReads}")
      require(spark.read.format("gwdelta").load(loc)
        .collect().map(_.toSeq).toSet == expect,
        "post-cleanup reads must match the pre-cleanup table")
      // GC keeps exactly the live manifest's sidecars: the superseded
      // version of the rewritten bucket is reclaimed, shared ones survive
      val liveNames = refs21.map(_.path).toSet
      val onDisk = fs.listStatus(t.log.sidecarDir).map(_.getPath.getName).toSet
      require(onDisk == liveNames,
        s"GC must keep exactly the referenced sidecars: disk=$onDisk live=$liveNames")
      t.toDF
    } finally hconf.unset("graft.checkpoint.partSize")
  }

  // ---------------------------------------------------------------- gw63
  /** `ALTER TABLE ... DROP FEATURE <f> [TRUNCATE HISTORY]` — the protocol
    * DOWNGRADE the auto-upgrade has no reverse for. Pinned: (1) dropping
    * deletionVectors refuses while LIVE files carry DVs, naming REORG as
    * the fix; (2) after REORG the drop still refuses WITHOUT TRUNCATE
    * HISTORY — retained history carries DV'd adds a downgraded reader
    * would misread; (3) WITH TRUNCATE HISTORY the head checkpoints, old
    * versions expire (time travel below dies), and the protocol sheds the
    * feature from BOTH lists; (4) a fresh reader replays the downgraded
    * table; (5) writer-only features (domainMetadata) drop with NO
    * truncation once live traces clear — old readers never ran the write
    * path; (6) unknown features refuse loudly rather than downgrade
    * blindly; (7) content is untouched end to end (the oracle). */
  def gw63DropFeature(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw63")
    val loc = tmp.resolve("db/nation").toString
    spark.read.parquet(s"$dir/nation.parquet").createOrReplaceTempView("gw63_src")
    spark.sql(s"CREATE TABLE gw.$ns.t (n_nationkey BIGINT, n_name STRING, " +
      s"n_regionkey BIGINT) USING gwdelta LOCATION '$loc'")
    spark.sql(s"INSERT INTO gw.$ns.t SELECT n_nationkey, n_name, n_regionkey FROM gw63_src")
    val t = GwTable.forPath(spark, loc)
    require(t.delete(col("n_nationkey") < 3, mergeOnRead = true) > 0)
    val p1 = t.snapshot().protocol.get
    require(p1.readerFeatures.exists(_.contains("deletionVectors")),
      s"setup needs the DV feature, got $p1")
    // (1) live DVs block the drop, guidance names REORG
    val liveRefuse = try {
      spark.sql(s"ALTER TABLE gw.$ns.t DROP FEATURE deletionVectors"); None
    } catch { case e: Exception => Some(rootMessage(e)) }
    require(liveRefuse.exists(m => m.contains("REORG") && m.contains("deletion")),
      s"live DVs must refuse with REORG guidance, got: $liveRefuse")
    spark.sql(s"REORG TABLE gw.$ns.t APPLY (PURGE)")
    require(t.snapshot().files.forall(_.dv.isEmpty), "REORG must fold DVs")
    // (2) history still carries DV'd adds: reader-feature drop demands
    // TRUNCATE HISTORY
    val histRefuse = try {
      spark.sql(s"ALTER TABLE gw.$ns.t DROP FEATURE deletionVectors"); None
    } catch { case e: Exception => Some(rootMessage(e)) }
    require(histRefuse.exists(_.contains("TRUNCATE HISTORY")),
      s"history traces must demand TRUNCATE HISTORY, got: $histRefuse")
    // (6) unknown feature: refuse, never downgrade blindly
    val unknownRefuse = try {
      spark.sql(s"ALTER TABLE gw.$ns.t DROP FEATURE shinyNewThing"); None
    } catch { case e: Exception => Some(rootMessage(e)) }
    require(unknownRefuse.exists(_.contains("not in")),
      s"unknown feature must refuse, got: $unknownRefuse")
    // (3) the real drop
    val res = spark.sql(
      s"ALTER TABLE gw.$ns.t DROP FEATURE deletionVectors TRUNCATE HISTORY")
      .collect()
    require(res.length == 1 && res.head.getString(1) == "deletionVectors",
      s"drop must report the feature, got ${res.toSeq}")
    val p2 = t.snapshot().protocol.get
    require(!p2.readerFeatures.exists(_.contains("deletionVectors")) &&
      !p2.writerFeatures.exists(_.contains("deletionVectors")),
      s"protocol must shed the feature from BOTH lists, got $p2")
    // truncation: version 1 (the MOR delete) is gone; time travel dies
    val ttDead = try { t.versionAsOf(1); false }
      catch { case _: Exception => true }
    require(ttDead, "time travel below the truncation checkpoint must fail")
    // (4) a fresh reader replays the downgraded table
    val hconf = spark.sparkContext.hadoopConfiguration
    val fresh = new graft.log.GwLog(new org.apache.hadoop.fs.Path(loc), hconf)
    require(fresh.snapshot().files.forall(_.dv.isEmpty) &&
      !fresh.snapshot().protocol.get.readerFeatures.exists(_.contains("deletionVectors")),
      "fresh replay must see the downgraded protocol")
    // (5) writer-only feature lifecycle: domains on, domains off, drop
    // WITHOUT truncation even though history carries the domain actions
    t.setDomainMetadata("gw63.domain", """{"k":1}""")
    val domRefuse = try {
      spark.sql(s"ALTER TABLE gw.$ns.t DROP FEATURE domainMetadata"); None
    } catch { case e: Exception => Some(rootMessage(e)) }
    require(domRefuse.exists(_.contains("remove them first")),
      s"live domains must refuse the drop, got: $domRefuse")
    t.removeDomainMetadata("gw63.domain")
    spark.sql(s"ALTER TABLE gw.$ns.t DROP FEATURE domainMetadata")
    val p3 = t.snapshot().protocol.get
    require(!p3.writerFeatures.exists(_.contains("domainMetadata")),
      s"writer-only drop must work without TRUNCATE HISTORY, got $p3")
    // (7) the data was never touched
    spark.sql(s"SELECT n_nationkey, n_name, n_regionkey FROM gw.$ns.t")
  }

  // ---------------------------------------------------------------- gw64
  /** MERGE WITH SCHEMA EVOLUTION (API form of Delta's
    * `withSchemaEvolution()`): source columns the target lacks append to
    * the schema IN THE SAME COMMIT as the merged rows. Pinned: (1) the
    * default contract first — extra source columns are IGNORED without
    * the flag (schema unchanged); (2) the evolving merge grows the schema
    * exactly once, updates matched rows (new column via explicit SET),
    * inserts unmatched rows by name, and null-fills the new column on
    * every untouched pre-evolution row at scan time; (3) evolution and
    * data land as ONE commit (history shows a single MERGE version);
    * (4) time travel below it serves the OLD schema. */
  def gw64MergeEvolution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat, length, lit}
    val tmp = Files.createTempDirectory("gw64")
    val loc = tmp.resolve("db/nation").toString
    val nation = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
    graft.streaming.GwSink.append(
      nation.filter(col("n_nationkey") <= 14).coalesce(1), loc)
    val t = GwTable.forPath(spark, loc)
    val vSeed = t.log.latestVersion().get
    val source = nation
      .filter(col("n_nationkey").between(10, 24))
      .withColumn("n_len", length(col("n_name")).cast("long"))
    // (1) without the flag the extra column is ignored by the by-name
    // contract — schema must NOT change
    require(t.merge(source.filter(col("n_nationkey") === 10),
      col("t.n_nationkey") === col("s.n_nationkey"),
      whenMatchedSet = Map("n_name" -> col("s.n_name")),
      insertNotMatched = false) > 0, "no-flag merge must commit")
    require(t.snapshot().schema.fieldNames.toSeq == Seq("n_nationkey", "n_name"),
      s"extra source columns must be ignored without the flag, got " +
        s"${t.snapshot().schema.fieldNames.toSeq}")
    // (2)+(3) the evolving merge: one commit, schema + rows together
    val vBefore = t.log.latestVersion().get
    val vMerge = t.merge(source,
      col("t.n_nationkey") === col("s.n_nationkey"),
      whenMatchedSet = Map(
        "n_name" -> concat(col("s.n_name"), lit("*")),
        "n_len" -> col("s.n_len")),
      insertNotMatched = true, schemaEvolution = true)
    require(vMerge == vBefore + 1,
      s"evolution and data must land as ONE commit: $vBefore -> $vMerge")
    val after = t.snapshot()
    require(after.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name", "n_len"),
      s"schema must grow by the source-only column, got " +
        s"${after.schema.fieldNames.toSeq}")
    require(after.schema.fields.find(_.name == "n_len").forall(_.nullable),
      "evolved column must be nullable")
    // (4) time travel below the evolution serves the OLD schema
    require(t.versionAsOf(vSeed).schema.fieldNames.toSeq ==
      Seq("n_nationkey", "n_name"),
      "pre-evolution versions must keep the old schema")
    // pre-evolution untouched rows (keys 0-9) null-fill the new column
    val nulls = t.toDF.filter(col("n_len").isNull)
      .select(col("n_nationkey")).collect().map(_.getLong(0)).toSet
    require(nulls == (0L to 9L).toSet, s"null-fill keys wrong: $nulls")
    t.toDF
  }

  // ---------------------------------------------------------------- gw65
  /** Optimized writes (Delta `autoOptimize.optimizeWrite` parity): output
    * file counts must track the DATA, not the incoming task layout — a
    * 16-task micro-batch into a 5-value partitioned table writes up to
    * one file per (task x value) without it, and a year of such batches
    * IS the small-file problem. Pinned: (1) the control table (no
    * property) fans out past the partition-value count; (2) with the
    * property, the same batch lands at most one file per partition value
    * (REBALANCE on partition columns); (3) unpartitioned, AQE's
    * size-based coalescing packs the tiny batch into a couple of files;
    * (4) content is byte-equal either way (the oracle). */
  def gw65OptimizeWrite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw65")
    val nation = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
    val batch = nation.repartition(16)
    val locA = tmp.resolve("db/control").toString
    graft.streaming.GwSink.append(batch, locA, partitionBy = Seq("n_regionkey"))
    val a = GwTable.forPath(spark, locA).snapshot().files.size
    require(a > 5, s"control must fan out past the 5 partition values, got $a")
    val locB = tmp.resolve("db/optimized").toString
    graft.streaming.GwSink.append(batch, locB, partitionBy = Seq("n_regionkey"),
      bootstrapProps = Map("graft.autoOptimize.optimizeWrite" -> "true"))
    val t = GwTable.forPath(spark, locB)
    val b = t.snapshot().files.size
    require(b <= 5, s"optimized write must land <= one file per value, got $b")
    val locC = tmp.resolve("db/flat").toString
    graft.streaming.GwSink.append(batch, locC,
      bootstrapProps = Map("graft.autoOptimize.optimizeWrite" -> "true"))
    val c = GwTable.forPath(spark, locC).snapshot().files.size
    require(c <= 2, s"AQE-coalesced flat write must pack the batch, got $c")
    t.toDF.select("n_nationkey", "n_name", "n_regionkey")
  }

  // ---------------------------------------------------------------- gw66
  /** `GENERATE symlink_format_manifest` — the Hive-symlink export
    * external engines (Presto/Trino/Athena) read Delta tables through.
    * Pinned: (1) one manifest per live partition tuple, Hive-layout
    * directories; (2) the files each manifest lists ARE that partition's
    * live files, absolute URIs; (3) reading every listed file back
    * reproduces the table exactly (the oracle); (4) regeneration is a
    * full swap — after a whole partition's rows are deleted, its stale
    * manifest DISAPPEARS rather than pointing external readers at
    * tombstoned files. */
  def gw66SymlinkManifest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw66")
    val loc = tmp.resolve("db/nation").toString
    val nation = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
    graft.streaming.GwSink.append(nation, loc, partitionBy = Seq("n_regionkey"))
    val t = GwTable.forPath(spark, loc)
    val res = spark.sql(s"GENERATE symlink_format_manifest FOR TABLE '$loc'").collect()
    require(res.length == 1 && res.head.getInt(1) == 5,
      s"5 partition values need 5 manifests, got ${res.toSeq}")
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(loc, "_symlink_format_manifest")
    val fs = root.getFileSystem(hconf)
    val snap = t.snapshot()
    (0L to 4L).foreach { r =>
      val mf = new org.apache.hadoop.fs.Path(root, s"n_regionkey=$r/manifest")
      require(fs.exists(mf), s"missing manifest for n_regionkey=$r")
      val listed = scala.io.Source.fromInputStream(fs.open(mf), "UTF-8")
        .getLines().toSet
      val expect = snap.files
        .filter(_.partitionValues.get("n_regionkey").contains(r.toString))
        .map(f => fs.makeQualified(new org.apache.hadoop.fs.Path(f.path))
          .toUri.toString).toSet
      require(listed == expect,
        s"manifest for r=$r lists $listed, snapshot has $expect")
    }
    // (3) external-reader equivalence: the union of listed files IS the table
    val allListed = (0L to 4L).flatMap { r =>
      val mf = new org.apache.hadoop.fs.Path(root, s"n_regionkey=$r/manifest")
      scala.io.Source.fromInputStream(fs.open(mf), "UTF-8").getLines()
    }
    val external = spark.read.parquet(allListed: _*)
      .select("n_nationkey", "n_name", "n_regionkey")
      .collect().map(_.toSeq).toSet
    // the engine stores partition columns IN the file bytes (partition
    // ADDRESSING lives in the log's partitionValues, under mangled
    // staging dir names) — so a symlink-manifest reader recovers the
    // complete row from the files alone, no Hive-path parsing needed
    require(external == nation.collect().map(_.toSeq).toSet,
      "reading the manifests' files must reproduce the table")
    // (4) full-partition delete, regenerate: the stale manifest must go
    require(t.delete(col("n_regionkey") === 4L) > 0)
    require(t.generateSymlinkManifest() == 4, "regenerate must write 4")
    require(!fs.exists(new org.apache.hadoop.fs.Path(root, "n_regionkey=4")),
      "a deleted partition's manifest must disappear on regenerate")
    t.toDF.select("n_nationkey", "n_name", "n_regionkey")
  }

  /** gw68: DYNAMIC partition overwrite (Spark's
    * `partitionOverwriteMode=dynamic` on INSERT OVERWRITE): only the
    * partitions the batch TOUCHES are replaced — at 100 TB, restating one
    * day of a date-partitioned table tombstones that day's files, not the
    * decade's. In-gate pins: dynamic overwrite of region 2 leaves every
    * other partition's FILES untouched (path-set equality) and tombstones
    * exactly region 2's; the conf off (static mode) replaces everything.
    * Oracle: the final contents after region 2's restatement. */
  def gw68DynamicOverwrite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.read.parquet(s"$dir/nation.parquet")
      .createOrReplaceTempView("gw68_nation_src")
    val tmp = Files.createTempDirectory("gw68")
    val loc = tmp.resolve("db/nation").toString
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta " +
      s"PARTITIONED BY (n_regionkey) LOCATION '$loc' " +
      "AS SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, " +
      "CAST(n_regionkey AS BIGINT) AS n_regionkey FROM gw68_nation_src")
    val table = GwTable.forPath(spark, loc)
    def filesByRegion(): Map[String, Set[String]] =
      table.snapshot().files
        .groupBy(_.partitionValues.getOrElse("n_regionkey", "?"))
        .map { case (k, v) => k -> v.map(_.path).toSet }
    val before = filesByRegion()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(s"INSERT OVERWRITE TABLE gw.$ns.nation " +
      "SELECT CAST(n_nationkey AS BIGINT), concat('DYN_', n_name), " +
      "CAST(n_regionkey AS BIGINT) FROM gw68_nation_src WHERE n_regionkey = 2")
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val after = filesByRegion()
    Seq("0", "1", "3", "4").foreach { r =>
      require(after(r) == before(r),
        s"dynamic overwrite must not touch partition $r's files")
    }
    require(after("2").nonEmpty && after("2").intersect(before("2")).isEmpty,
      "dynamic overwrite must replace exactly the touched partition's files")
    val mid = spark.table(s"gw.$ns.nation").collect()
    require(mid.count(_.getString(1).startsWith("DYN_")) ==
      mid.count(r => r.getLong(2) == 2L) && mid.length == 25,
      "region 2 restated, everything else intact")
    val vDyn = table.snapshot().version
    // static mode (conf off): INSERT OVERWRITE replaces the WHOLE table
    spark.sql(s"INSERT OVERWRITE TABLE gw.$ns.nation " +
      "SELECT CAST(n_nationkey AS BIGINT), n_name, " +
      "CAST(n_regionkey AS BIGINT) FROM gw68_nation_src WHERE n_regionkey = 0")
    require(spark.table(s"gw.$ns.nation").count() == 5,
      "static INSERT OVERWRITE must replace the whole table")
    // the oracle checks the post-dynamic state, via time travel
    table.versionAsOf(vDyn).select("n_nationkey", "n_name", "n_regionkey")
  }

  /** gw69: per-table STATS-COLUMN control (`graft.stats.columns` /
    * `graft.stats.numIndexedCols`, Delta `dataSkippingNumIndexedCols`
    * parity): on a wide table the log otherwise carries min/max/nullCount
    * JSON for EVERY column of EVERY file — at 100 TB width the stats
    * become their own metadata problem. Declared columns keep harvesting
    * (and pruning); undeclared columns get NO stats, and their filters
    * simply plan every file — conservative, never wrong. In-gate pins:
    * stats JSON carries only the declared column (+ numRecords), the
    * declared column still file-prunes, the undeclared one plans all
    * files, and the numIndexedCols spelling behaves identically. */
  def gw69StatsColumns(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw69")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"),
        col("o_orderpriority"))
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    def build(locName: String, props: Map[String, String]): graft.GwTable = {
      val loc = tmp.resolve(locName).toString
      graft.streaming.GwSink.append(o, loc, bootstrapProps = props)
      GwTable.forPath(spark, loc)
    }
    def pinStats(t: graft.GwTable): Unit =
      t.snapshot().files.foreach { f =>
        val s = f.stats.getOrElse(
          throw new IllegalStateException("missing stats"))
        require(s.contains("\"o_orderkey\"") && !s.contains("o_custkey") &&
          !s.contains("o_orderpriority"), s"stats filter leaked: $s")
        require(s.contains("numRecords"), "numRecords must survive filtering")
      }
    val t = build("db/orders", Map("graft.stats.columns" -> "o_orderkey"))
    pinStats(t)
    pinStats(build("db/orders2", Map("graft.stats.numIndexedCols" -> "1")))
    val total = t.snapshot().files.size
    require(total >= 3, s"expected >= 3 range files, got $total")
    def planned(df: DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan)
            .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.head
    require(planned(t.toDF.filter(col("o_orderkey") < 100)) < total,
      "the declared stats column must still file-prune")
    require(planned(t.toDF.filter(col("o_custkey") === 1L)) == total,
      "an undeclared column has no stats: every file plans (never wrong)")
    t.toDF.filter(col("o_custkey") % 10 === 0)
      .select("o_orderkey", "o_custkey", "o_orderpriority")
  }

  /** gw70: metadata-only STATS BACKFILL (`ANALYZE TABLE ... COMPUTE
    * DELTA STATISTICS`, Delta parity) — the missing half of gw69: files
    * committed BEFORE a stats declaration (or adopted via CONVERT /
    * index paths with stats off) keep their old stats forever, so
    * declaring skipping columns on an existing 100 TB table buys nothing
    * until every file is rewritten — unless stats can be re-harvested
    * from footers alone. In-gate pins: no pruning before the backfill
    * (with or without the declaration), the backfill refreshes every
    * live file WITHOUT any data rewrite (identical paths + sizes), the
    * selective filter then plans strictly fewer files, and a second
    * ANALYZE is a no-op (0 refreshed). */
  def gw70StatsBackfill(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw70")
    val loc = tmp.resolve("db/orders").toString
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"),
        col("o_orderpriority"))
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    // adopted with NO per-column stats (numIndexedCols = 0): the shape a
    // CONVERTed or reference-indexed (withStats off) table arrives in
    graft.streaming.GwSink.append(o, loc,
      bootstrapProps = Map("graft.stats.numIndexedCols" -> "0"))
    val t = GwTable.forPath(spark, loc)
    val total = t.snapshot().files.size
    require(total >= 3, s"expected >= 3 range files, got $total")
    def planned(df: DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan)
            .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.head
    require(planned(t.toDF.filter(col("o_orderkey") < 100)) == total,
      "no per-column stats yet: every file must plan")
    // declaring the columns is NOT enough — existing files keep old stats
    t.updateProperties(Map("graft.stats.columns" -> "o_orderkey"),
      unset = Seq("graft.stats.numIndexedCols"))
    require(planned(t.toDF.filter(col("o_orderkey") < 100)) == total,
      "declaration alone must not change pre-existing files' stats")
    val before = t.snapshot().files.map(f => (f.path, f.size)).sortBy(_._1)
    val res = spark.sql(s"ANALYZE TABLE '$loc' COMPUTE DELTA STATISTICS").head()
    require(res.getInt(1) == total,
      s"backfill must refresh all $total stat-less files, got ${res.getInt(1)}")
    val after = t.snapshot()
    require(after.files.map(f => (f.path, f.size)).sortBy(_._1) == before,
      "ANALYZE is metadata-only: identical file paths and sizes")
    after.files.foreach(f => require(
      f.stats.exists(s => s.contains("\"o_orderkey\"") && !s.contains("o_custkey")),
      s"backfilled stats must carry exactly the declared column: ${f.stats}"))
    require(planned(t.toDF.filter(col("o_orderkey") < 100)) < total,
      "backfilled stats must file-prune the selective filter")
    require(t.computeStats() == 0, "a second ANALYZE must be a no-op")
    t.toDF.filter(col("o_custkey") % 7 === 0)
      .select("o_orderkey", "o_custkey", "o_orderpriority")
  }

  /** gw72: CHECK constraints on the PATH-BASED write face — the catalog
    * analysis rule only sees DSv2 write plans, so without sink-side
    * enforcement a `df.write.format("gwdelta").save(path)` (or
    * GwSink.append / overwrite / replaceWhere) against a table carrying
    * `graft.constraints.*` silently bypasses its own declared
    * constraints; Delta enforces invariants on every write. In-gate
    * pins: a violating path append raises the typed CHECK error and
    * commits NOTHING (version unchanged), a violating replaceWhere and
    * overwrite raise too, valid batches land, SQL-standard NULL passes.
    * Oracle = the surviving content. */
  def gw72PathConstraints(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw72")
    val loc = tmp.resolve("db/nation").toString
    val src = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"),
        col("n_regionkey").cast("long").as("n_regionkey"))
    src.filter(col("n_regionkey") < 4).write.format("gwdelta").save(loc)
    val t = GwTable.forPath(spark, loc)
    t.updateProperties(Map(
      "graft.constraints.region_range" -> "n_regionkey >= 0 AND n_regionkey < 4"))
    val v0 = t.snapshot().version
    // violating path append: typed error, NOTHING commits
    val e = try {
      src.filter(col("n_regionkey") === 4)
        .write.format("gwdelta").mode("append").save(loc)
      null
    } catch { case ex: Throwable => ex }
    def messages(ex: Throwable): Seq[String] =
      Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).toSeq
    require(e != null && messages(e).exists(_.contains("region_range")),
      s"violating append must raise the named CHECK error, got $e")
    require(t.snapshot().version == v0,
      "a failed constraint append must commit nothing")
    // violating replaceWhere raises too
    val e2 = try {
      t.replaceWhere(src.filter(col("n_regionkey") === 4),
        col("n_regionkey") === 4)
      null
    } catch { case ex: Throwable => ex }
    require(e2 != null, "violating replaceWhere must raise")
    require(t.snapshot().version == v0, "failed replaceWhere commits nothing")
    // a valid batch (including a NULL row — SQL-standard CHECK passes
    // NULL) lands normally through the same face
    import spark.implicits._
    val valid = Seq((900L, "NULLREGION", Option.empty[Long]))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    valid.write.format("gwdelta").mode("append").save(loc)
    require(t.snapshot().version == v0 + 1, "valid append commits")
    t.toDF
  }

  /** gw73: GENERATED-column partition filter derivation (Delta parity:
    * "generated column partition filters") — the star-schema ingest
    * shape: a table partitioned by `mon = trunc(o_orderdate, 'month')`
    * is queried by a predicate on `o_orderdate` ONLY; the scan derives
    * the month-partition range from the declared generation expression
    * (widened one month + 2 days — unit shift + zone wobble) and prunes
    * partition directories
    * the predicate provably cannot touch. Stats are restricted to `mon`,
    * so the pruning pinned in-gate can only come from the derivation,
    * never from source-column stats. Oracle replays the filter in SQL. */
  def gw73GeneratedPartitionPruning(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, trunc}
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw73")
    val loc = tmp.resolve("db/orders").toString
    spark.sql(s"CREATE TABLE gw.$ns.t (o_orderkey BIGINT, o_orderdate DATE, " +
      s"mon DATE) USING gwdelta PARTITIONED BY (mon) LOCATION '$loc'")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"))
      .withColumn("mon", trunc(col("o_orderdate"), "month"))
    o.filter(col("o_orderdate") < "1997-01-01").writeTo(s"gw.$ns.t").append()
    val t = GwTable.forPath(spark, loc)
    t.updateProperties(Map(
      "graft.generated.mon" -> "trunc(o_orderdate, 'month')",
      "graft.stats.columns" -> "mon"))
    o.filter(col("o_orderdate") >= "1997-01-01").writeTo(s"gw.$ns.t").append()
    val total = t.snapshot().files.size
    require(total >= 12, s"expected >= 12 month partitions, got $total")
    val q = spark.table(s"gw.$ns.t")
      .filter(col("o_orderdate") >= org.apache.spark.sql.functions
        .lit("1999-06-15").cast("date"))
    q.collect() // materialize so the executed plan is final
    val planned = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan)
          .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
          .fileIndex.inputFiles.length
    }.head
    require(planned < total,
      s"the o_orderdate predicate must prune month partitions through the " +
        s"generated-column derivation: planned $planned of $total")
    // the widened derived bound: only partitions at/after 1999-05 can plan
    val surviving = t.snapshot().files.count(_.partitionValues.get("mon")
      .exists(_ >= "1999-05-01"))
    require(planned <= surviving,
      s"planned ($planned) must sit inside the derived month window ($surviving)")
    // dates travel as ISO strings: the driver compare is dtype-exact and
    // parquet date32 vs DuckDB date surface differently in pandas
    q.select(col("o_orderkey"),
      org.apache.spark.sql.functions.date_format(col("o_orderdate"), "yyyy-MM-dd")
        .as("o_orderdate"),
      org.apache.spark.sql.functions.date_format(col("mon"), "yyyy-MM-dd").as("mon"))
  }

  // ---------------------------------------------------------------- gw74
  /** gw74: `checkpointProtection` + `vacuumProtocolCheck` table features
    * (Delta 4.x parity) — the two protocol features guarding destructive
    * maintenance. In-gate pins: (1) a TRUNCATE HISTORY feature drop
    * writes the `checkpointProtection` writer feature AND the
    * `requireCheckpointProtectionBeforeVersion` marker (= downgrade
    * version + 1) in the SAME commit; (2) while the marker sits above
    * the newest checkpoint, metadata cleanup refuses to touch ANYTHING —
    * the boundary checkpoint a downgraded reader bootstraps from
    * survives a retention-0 sweep; (3) once checkpoints cover the
    * boundary (here: after the marker is unset), the same sweep proceeds
    * in one run; (4) enabling `vacuumProtocolCheck` via the generic
    * `graft.feature.* = supported` property upgrades the protocol on
    * BOTH lists, unknown feature names refuse the ALTER, this engine's
    * own vacuum passes its protocol check, and a vacuum against a
    * foreign table demanding an unimplemented writer feature REFUSES
    * instead of reaping files it cannot reason about. Content is
    * unchanged end to end (the MOR delete's rows are re-inserted). */
  def gw74ProtocolProtection(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    ensureGwCatalog(spark)
    val ns = s"ns${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    val tmp = Files.createTempDirectory("gw74")
    val loc = tmp.resolve("db/nation").toString
    spark.read.parquet(s"$dir/nation.parquet").createOrReplaceTempView("gw74_src")
    spark.sql(s"CREATE TABLE gw.$ns.t (n_nationkey BIGINT, n_name STRING, " +
      s"n_regionkey BIGINT) USING gwdelta LOCATION '$loc'")
    spark.sql(s"INSERT INTO gw.$ns.t SELECT n_nationkey, n_name, n_regionkey " +
      "FROM gw74_src")
    val t = GwTable.forPath(spark, loc)
    // DV feature into HISTORY, current state purged
    require(t.delete(col("n_nationkey") < 3, mergeOnRead = true) > 0)
    spark.sql(s"REORG TABLE gw.$ns.t APPLY (PURGE)")
    // (1) the truncating drop writes protection in the SAME commit
    val dropV = t.dropFeature("deletionVectors", truncateHistory = true)
    val snap1 = t.snapshot()
    val p1 = snap1.protocol.get
    require(p1.writerFeatures.exists(_.contains("checkpointProtection")),
      s"truncating drop must add checkpointProtection, got $p1")
    val marker = snap1.metadata.get.configuration
      .get("delta.requireCheckpointProtectionBeforeVersion").map(_.toLong)
    require(marker.contains(dropV + 1),
      s"marker must cover the downgrade commit: $marker vs ${dropV + 1}")
    // the marker blocks dropping checkpointProtection itself
    val protRefuse = try { t.dropFeature("checkpointProtection"); None }
      catch { case e: Exception => Some(rootMessage(e)) }
    require(protRefuse.exists(_.contains("requireCheckpointProtectionBeforeVersion")),
      s"marker must block the protection drop, got: $protRefuse")
    // (2) protection blocks PARTIAL cleanup: stale versions + an old
    // checkpoint below the newest one, marker raised beyond every
    // checkpoint — a retention-0 sweep must delete NOTHING
    spark.sql(s"INSERT INTO gw.$ns.t SELECT n_nationkey, n_name, n_regionkey " +
      "FROM gw74_src WHERE n_nationkey < 3") // restore the deleted rows
    t.log.latestVersion().foreach(t.log.writeCheckpoint)
    t.updateProperties(Map(
      "delta.requireCheckpointProtectionBeforeVersion" -> "999999"))
    t.log.latestVersion().foreach(t.log.writeCheckpoint)
    val cpsBefore = t.log.listCheckpoints()
    require(cpsBefore.size >= 2, s"need stacked checkpoints, got $cpsBefore")
    require(t.cleanupMetadata(retentionMs = 0L) == 0,
      "cleanup below the protection boundary must delete NOTHING")
    require(t.log.listCheckpoints() == cpsBefore,
      "the protected checkpoint must survive a retention-0 sweep")
    // (3) boundary cleared -> the same sweep proceeds in one run
    t.updateProperties(Map.empty,
      unset = Seq("delta.requireCheckpointProtectionBeforeVersion"))
    t.log.latestVersion().foreach(t.log.writeCheckpoint)
    require(t.cleanupMetadata(retentionMs = 0L) > 0,
      "an unprotected retention-0 sweep must reclaim the stale versions")
    require(t.log.listCheckpoints().size == 1,
      "one-run cleanup keeps only the covering checkpoint")
    // (4) vacuumProtocolCheck lifecycle
    t.updateProperties(Map("graft.feature.vacuumProtocolCheck" -> "supported"))
    val p2 = t.snapshot().protocol.get
    require(p2.readerFeatures.exists(_.contains("vacuumProtocolCheck")) &&
      p2.writerFeatures.exists(_.contains("vacuumProtocolCheck")),
      s"the feature property must upgrade BOTH lists, got $p2")
    val badFeat = try {
      t.updateProperties(Map("graft.feature.vacuumV9" -> "supported")); None
    } catch { case e: Exception => Some(rootMessage(e)) }
    require(badFeat.exists(_.contains("unknown table feature")),
      s"unknown feature names must refuse the ALTER, got: $badFeat")
    // this engine passes its own vacuum protocol gate
    spark.conf.set("spark.graft.vacuum.retentionCheck", "false")
    try require(t.vacuum(retentionMs = 0L) >= 0)
    finally spark.conf.unset("spark.graft.vacuum.retentionCheck")
    // a foreign table demanding an unimplemented WRITER feature: vacuum
    // refuses rather than reaping files whose liveness rules it cannot know
    val floc = tmp.resolve("db/foreign").toString
    spark.range(3).selectExpr("id AS n_nationkey")
      .write.format("gwdelta").save(floc)
    val flog = GwTable.forPath(spark, floc).log
    val fs = flog.logPathFor(1L).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(flog.logPathFor(1L), false)
    out.write(("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["vacuumProtocolCheck"],""" +
      """"writerFeatures":["vacuumProtocolCheck","futureVacuumV9"]}}""" + "\n")
      .getBytes("UTF-8"))
    out.close()
    val refuse = try { GwTable.forPath(spark, floc).vacuum(); None }
      catch { case e: Exception => Some(rootMessage(e)) }
    require(refuse.exists(m => m.contains("futureVacuumV9") &&
      m.contains("does not implement")),
      s"downlevel vacuum must refuse, got: $refuse")
    spark.sql(s"SELECT n_nationkey, n_name, n_regionkey FROM gw.$ns.t")
  }

  /** gw71: `VACUUM ... LITE` (Delta 4.0 parity) — tombstone-named
    * reclaim with ZERO filesystem listing: at 100 TB the debris sweep's
    * recursive listing dominates a vacuum's cost, while the log already
    * names every superseded file. In-gate pins: LITE deletes exactly the
    * compaction-orphaned rewrite, planted uncommitted crash debris
    * SURVIVES the lite pass (no listing = never seen) and a subsequent
    * FULL vacuum sweeps it, the SQL form routes mode + retention, and
    * content is unchanged throughout. */
  def gw71VacuumLite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("gw71")
    val loc = tmp.resolve("db/nation").toString
    val src = spark.read.parquet(s"$dir/nation.parquet")
    src.filter(col("n_nationkey") < 12).coalesce(1)
      .write.format("gwdelta").mode("append").save(loc)
    src.filter(col("n_nationkey") >= 12).coalesce(1)
      .write.format("gwdelta").mode("append").save(loc)
    val t = GwTable.forPath(spark, loc)
    require(t.compact() > 0, "compaction must commit (orphans the originals)")
    // plant uncommitted crash debris in an engine-owned namespace, aged
    // past the in-flight floor — a FULL vacuum's listing finds it, LITE
    // must never even look
    val fs = new org.apache.hadoop.fs.Path(loc)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val debris = new org.apache.hadoop.fs.Path(loc, "_stream/debris/part-junk.parquet")
    fs.mkdirs(debris.getParent)
    val os = fs.create(debris, true)
    os.write("junk".getBytes("UTF-8")); os.close()
    fs.setTimes(debris, System.currentTimeMillis() - 2 * GwTable.DebrisMinAgeMs, -1)
    val expected = t.toDF.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val lite = GwTable.withRetentionCheckDisabled(spark)(
      spark.sql(s"VACUUM '$loc' LITE RETAIN 0 HOURS").head().getInt(1))
    require(lite == 2,
      s"LITE must reclaim exactly the two tombstoned originals, got $lite")
    require(fs.exists(debris),
      "LITE performs no listing: uncommitted debris must survive")
    require(t.toDF.collect().map(_.toSeq.mkString("|")).sorted.toSeq == expected,
      "content must be unchanged by the lite vacuum")
    val full = GwTable.withRetentionCheckDisabled(spark)(t.vacuum(retentionMs = 0))
    require(!fs.exists(debris), "a FULL vacuum must sweep the planted debris")
    require(full >= 1, s"full vacuum reports the swept debris, got $full")
    t.toDF.select(col("n_nationkey").cast("long").as("n_nationkey"),
      col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
  }

  /** gw67: dynamic FILE pruning — the fact side of a broadcast join is a
    * gwdelta table with range-disjoint files on the join key; Spark's
    * runtime-filtering planner delivers the (selective) dim side's key
    * set into the scan at execution time (`SupportsRuntimeFiltering`),
    * and the scan prunes fact FILES by footer stats/blooms before opening
    * them — semi-join reduction from a plain `fact.join(dim, key)`, no
    * manual orchestration. In-gate pins: a runtime filter is present on
    * the fact scan AND strictly fewer files than the snapshot are
    * planned; the oracle replays the join in SQL. */
  def gw67DynamicFilePruning(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, round, sum}
    val tmp = Files.createTempDirectory("gw67")
    val loc = tmp.resolve("db/lineitem").toString
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.format("gwdelta").save(loc)
    val total = GwTable.forPath(spark, loc).snapshot().files.size
    require(total >= 6, s"expected >= 6 range-disjoint files, got $total")
    val dim = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderkey") < 600)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val fact = spark.read.format("gwdelta").load(loc)
    val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("qty_c"),
        count(lit(1)).as("n"))
    joined.collect() // materialize: runtime filters only exist at execution
    val scans = collectRuntimeFilteringScans(joined.queryExecution.executedPlan)
    require(scans.nonEmpty, "no runtime-filtering fact scan in the executed plan")
    val (b, s) = scans.head
    require(b.runtimeFilters.nonEmpty,
      "the planner must insert a dynamic-pruning filter on the fact scan")
    require(s.plannedFiles.size < total,
      s"runtime keys < 600 must prune high-range files: planned " +
        s"${s.plannedFiles.size} of $total")
    joined
  }

  /** AQE-aware walk to the gwdelta runtime-filtering scans of an executed
    * plan (descends into adaptive stages). */
  private def collectRuntimeFilteringScans(
      p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[(org.apache.spark.sql.execution.datasources.v2.BatchScanExec,
             org.apache.spark.sql.graftbridge.GwRuntimeFilteringScan)] =
    p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        collectRuntimeFilteringScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectRuntimeFilteringScans(q.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        (b.scan match {
          case s: org.apache.spark.sql.graftbridge.GwRuntimeFilteringScan =>
            Some((b, s))
          case w: org.apache.spark.sql.graftbridge.GwDeltaScan =>
            w.innerScan match {
              case s: org.apache.spark.sql.graftbridge.GwRuntimeFilteringScan =>
                Some((b, s))
              case _ => None
            }
          case _ => None
        }).toSeq
    }.flatten

  /** The deepest non-null message in a (possibly wrapped) failure chain —
    * maintenance commands surface engine messages wrapped in Spark's
    * command-execution exceptions. */
  private def rootMessage(e: Throwable): String = {
    var cur: Throwable = e
    val sb = new StringBuilder
    while (cur != null) {
      if (cur.getMessage != null) { sb.append(cur.getMessage); sb.append(" | ") }
      cur = cur.getCause
    }
    sb.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gw01_index_read" -> gw01IndexRead _,
    "gw02_time_travel" -> gw02TimeTravel _,
    "gw03_restatement" -> gw03Restatement _,
    "gw04_incremental_append" -> gw04IncrementalAppend _,
    "gw05_datasource_v2" -> gw05DataSourceV2 _,
    "gw06_changes_since" -> gw06ChangesSince _,
    "gw07_stream_tail" -> gw07StreamTail _,
    "gw08_compaction" -> gw08Compaction _,
    "gw09_vacuum" -> gw09Vacuum _,
    "gw10_stream_sink" -> gw10StreamSink _,
    "gw11_sink_format" -> gw11StreamSinkFormat _,
    "gw12_sql_catalog" -> gw12SqlCatalog _,
    "gw13_sql_insert" -> gw13SqlInsert _,
    "gw14_clustered_compact" -> gw14ClusteredCompact _,
    "gw15_sql_delete" -> gw15SqlDelete _,
    "gw16_api_update" -> gw16ApiUpdate _,
    "gw17_api_merge" -> gw17ApiMerge _,
    "gw18_schema_evolution" -> gw18SchemaEvolution _,
    "gw19_row_changes" -> gw19RowChanges _,
    "gw20_sql_update" -> gw20SqlUpdate _,
    "gw21_sql_merge" -> gw21SqlMerge _,
    "gw22_sql_ctas" -> gw22SqlCtas _,
    "gw23_stream_totable" -> gw23StreamToTable _,
    "gw24_partitioned_table" -> gw24PartitionedTable _,
    "gw25_deletion_vectors" -> gw25DeletionVectors _,
    "gw26_sql_maintenance" -> gw26SqlMaintenance _,
    "gw27_mor_sql_update" -> gw27MorSqlUpdate _,
    "gw28_mor_sql_merge" -> gw28MorSqlMerge _,
    "gw29_restore" -> gw29Restore _,
    "gw30_shallow_clone" -> gw30ShallowClone _,
    "gw31_zorder_compact" -> gw31ZorderCompact _,
    "gw32_cdf_stream" -> gw32CdfStream _,
    "gw33_check_constraint" -> gw33CheckConstraint _,
    "gw34_idempotent_write" -> gw34IdempotentWrite _,
    "gw35_occ_conflicts" -> gw35OccConflicts _,
    "gw36_generated_columns" -> gw36GeneratedColumns _,
    "gw37_identity_columns" -> gw37IdentityColumns _,
    "gw38_column_mapping" -> gw38ColumnMapping _,
    "gw39_merge_schema" -> gw39MergeSchema _,
    "gw40_reorg_purge" -> gw40Reorg _,
    "gw41_cluster_by" -> gw41ClusterBy _,
    "gw42_auto_compact" -> gw42AutoCompact _,
    "gw43_change_data_feed" -> gw43ChangeDataFeed _,
    "gw44_in_commit_timestamps" -> gw44InCommitTimestamps _,
    "gw45_log_retention" -> gw45LogRetention _,
    "gw46_table_features" -> gw46TableFeatures _,
    "gw47_append_only" -> gw47AppendOnly _,
    "gw48_deep_clone" -> gw48DeepClone _,
    "gw49_type_widening" -> gw49TypeWidening _,
    "gw50_column_defaults" -> gw50ColumnDefaults _,
    "gw51_replace_where" -> gw51ReplaceWhere _,
    "gw52_row_tracking" -> gw52RowTracking _,
    "gw53_convert" -> gw53Convert _,
    "gw54_vacuum_dry_run" -> gw54VacuumDryRun _,
    "gw55_restore_timestamp" -> gw55RestoreTimestamp _,
    "gw56_multipart_checkpoint" -> gw56MultipartCheckpoint _,
    "gw57_bloom_skipping" -> gw57BloomSkipping _,
    "gw58_log_compaction" -> gw58LogCompaction _,
    "gw59_v2_checkpoint" -> gw59V2Checkpoint _,
    "gw62_incremental_checkpoint" -> gw62IncrementalCheckpoint _,
    "gw63_drop_feature" -> gw63DropFeature _,
    "gw64_merge_evolution" -> gw64MergeEvolution _,
    "gw65_optimize_write" -> gw65OptimizeWrite _,
    "gw66_symlink_manifest" -> gw66SymlinkManifest _,
    "gw67_dynamic_file_pruning" -> gw67DynamicFilePruning _,
    "gw68_dynamic_overwrite" -> gw68DynamicOverwrite _,
    "gw69_stats_columns" -> gw69StatsColumns _,
    "gw70_stats_backfill" -> gw70StatsBackfill _,
    "gw71_vacuum_lite" -> gw71VacuumLite _,
    "gw72_path_constraints" -> gw72PathConstraints _,
    "gw73_generated_pruning" -> gw73GeneratedPartitionPruning _,
    "gw74_protocol_protection" -> gw74ProtocolProtection _,
    "gw60_version_checksum" -> gw60VersionChecksum _,
    "gw61_domain_metadata" -> gw61DomainMetadata _,
  )

  val oracles: Map[String, String] = Map(
    "gw01_index_read" -> "SELECT * FROM nation",
    "gw02_time_travel" -> "SELECT * FROM region",
    "gw03_restatement" -> "SELECT * FROM region",
    "gw04_incremental_append" ->
      "SELECT * FROM nation UNION ALL SELECT * FROM nation",
    "gw05_datasource_v2" -> "SELECT * FROM nation",
    "gw06_changes_since" -> "SELECT * FROM region",
    "gw07_stream_tail" ->
      "SELECT * FROM region UNION ALL SELECT * FROM region",
    "gw08_compaction" ->
      "SELECT * FROM region UNION ALL SELECT * FROM region",
    "gw09_vacuum" ->
      """SELECT * FROM region UNION ALL SELECT * FROM region
        |UNION ALL SELECT * FROM region""".stripMargin,
    "gw10_stream_sink" ->
      "SELECT * FROM region UNION ALL SELECT * FROM region",
    "gw11_sink_format" ->
      "SELECT * FROM region UNION ALL SELECT * FROM region",
    "gw12_sql_catalog" -> "SELECT * FROM nation",
    "gw13_sql_insert" -> "SELECT r_regionkey, r_name FROM region",
    "gw14_clustered_compact" ->
      "SELECT * FROM region UNION ALL SELECT * FROM region",
    "gw15_sql_delete" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | o_orderpriority
        |FROM orders WHERE o_orderkey >= 5600""".stripMargin,
    // UPDATE = CASE over the pre-update row; * 2 is exact in IEEE, so the
    // doubles compare bit-identical across engines
    "gw16_api_update" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | CASE WHEN o_orderkey < 5600 THEN o_totalprice * 2
        |      ELSE o_totalprice END AS o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | CASE WHEN o_orderkey < 5600 THEN 'REPRICED'
        |      ELSE o_orderpriority END AS o_orderpriority
        |FROM orders""".stripMargin,
    // MERGE = left join for the matched update + the not-matched inserts
    "gw17_api_merge" ->
      """WITH src AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus,
        |        o_totalprice * 3 AS o_totalprice, o_orderdate, o_orderpriority
        | FROM orders WHERE o_orderkey >= 5600 AND o_orderkey < 9000),
        |tgt AS (SELECT * FROM orders WHERE o_orderkey < 7500)
        |SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
        | COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
        | strftime(t.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | t.o_orderpriority
        |FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | o_orderpriority
        |FROM src WHERE o_orderkey >= 7500""".stripMargin,
    // pre-evolution rows null-fill the added column; post-evolution rows carry it
    "gw18_schema_evolution" ->
      """SELECT r_regionkey, r_name, CAST(NULL AS VARCHAR) AS r_flag FROM region
        |UNION ALL
        |SELECT r_regionkey + 100, r_name, 'NEW' AS r_flag FROM region""".stripMargin,
    // the DELETE's rows at commit 1, the INSERT's rows at commit 2; the
    // rewrite's surviving rows cancel out of the bag difference
    "gw19_row_changes" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | o_orderpriority, CAST(1 AS BIGINT) AS change_seq,
        | 'delete' AS _change_type
        |FROM orders WHERE o_orderkey < 2000
        |UNION ALL
        |SELECT o_orderkey + 100000, o_custkey, o_orderstatus, o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | o_orderpriority, CAST(2 AS BIGINT) AS change_seq,
        | 'insert' AS _change_type
        |FROM orders WHERE o_orderkey < 500""".stripMargin,
    // identical answer shape to gw16 (the API form) - * 2 is exact in IEEE
    "gw20_sql_update" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | CASE WHEN o_orderkey < 5600 THEN o_totalprice * 2
        |      ELSE o_totalprice END AS o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | CASE WHEN o_orderkey < 5600 THEN 'REPRICED'
        |      ELSE o_orderpriority END AS o_orderpriority
        |FROM orders""".stripMargin,
    // identical answer shape to gw17 (the API form)
    "gw21_sql_merge" ->
      """WITH src AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus,
        |        o_totalprice * 3 AS o_totalprice, o_orderdate, o_orderpriority
        | FROM orders WHERE o_orderkey >= 5600 AND o_orderkey < 9000),
        |tgt AS (SELECT * FROM orders WHERE o_orderkey < 7500)
        |SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
        | COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
        | strftime(t.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | t.o_orderpriority
        |FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | o_orderpriority
        |FROM src WHERE o_orderkey >= 7500""".stripMargin,
    "gw22_sql_ctas" ->
      "SELECT r_regionkey, upper(r_name) AS r_name_u FROM region",
    "gw23_stream_totable" ->
      "SELECT * FROM region UNION ALL SELECT * FROM region",
    "gw24_partitioned_table" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey = 2
        |UNION ALL
        |SELECT n_nationkey + 100, n_name, n_regionkey FROM nation
        |WHERE n_regionkey = 2""".stripMargin,
    "gw25_deletion_vectors" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | o_orderpriority
        |FROM orders WHERE o_custkey % 3 <> 0""".stripMargin,
    "gw26_sql_maintenance" ->
      """SELECT r_regionkey, r_name FROM region
        |UNION ALL SELECT r_regionkey, r_name FROM region""".stripMargin,
    // the guarded insert is invisible (never committed); only the fixture
    // rows and the post-UNSET row survive
    "gw33_check_constraint" ->
      """SELECT r_regionkey, r_name FROM region
        |UNION ALL SELECT -1, 'unchecked'""".stripMargin,
    // replayed/below-mark writes are no-ops; only the first full write,
    // the (etl,2) slice and the (audit,1) slice land
    "gw34_idempotent_write" ->
      """SELECT r_regionkey, r_name FROM region
        |UNION ALL SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 2
        |UNION ALL SELECT r_regionkey, r_name FROM region WHERE r_regionkey = 4""".stripMargin,
    // file A survives, file B's removal lands past the benign append, the
    // aborted races commit nothing, and the three racing appends restore
    // the upper keys
    "gw35_occ_conflicts" ->
      """SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 12
        |UNION ALL SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 3
        |UNION ALL SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 12""".stripMargin,
    // the omitted-column slice is computed, the correct-value slice lands
    // verbatim, and the mismatched row never committed
    "gw36_generated_columns" ->
      """SELECT o_orderkey, o_custkey, o_orderkey * 2 AS ok2
        |FROM orders""".stripMargin,
    // every row (seed + both allocated slices) carries an id; exact id
    // values are partition-stride-dependent, pinned in-gate instead
    // compaction is content-neutral: keys 0..5 exactly once
    "gw42_auto_compact" ->
      """SELECT n_nationkey, n_name FROM nation
        |WHERE n_nationkey <= 5""".stripMargin,
    // layout-only feature: content is the plain projection
    "gw41_cluster_by" ->
      """SELECT o_orderkey, o_custkey FROM orders""".stripMargin,
    // keys < 3 left via the MOR delete; key 24 repriced post-reorg
    "gw40_reorg_purge" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        | CASE WHEN n_nationkey = 24 THEN 'X' ELSE n_name END AS nation_name
        |FROM nation WHERE n_nationkey >= 3""".stripMargin,
    // pre-widening rows null-fill the new column; the widened batch
    // carries it; the column-subset batch null-fills the rest
    "gw39_merge_schema" ->
      """SELECT r_regionkey, r_name, CAST(NULL AS BIGINT) AS name_len FROM region
        |UNION ALL
        |SELECT r_regionkey, r_name, CAST(length(r_name) AS BIGINT) FROM region
        |UNION ALL
        |SELECT r_regionkey, NULL, CAST(NULL AS BIGINT) FROM region
        |WHERE r_regionkey < 2""".stripMargin,
    // 25 originals + the re-ingested keys 0..3, filtered at >= 2: the
    // renamed column serves the same bytes under its new name
    "gw38_column_mapping" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        | n_name AS nation_name FROM nation
        |WHERE n_nationkey >= 2
        |UNION ALL
        |SELECT CAST(n_nationkey AS BIGINT), n_name FROM nation
        |WHERE n_nationkey >= 2 AND n_nationkey < 4""".stripMargin,
    "gw37_identity_columns" ->
      """SELECT CAST(1 AS BOOLEAN) AS id_assigned,
        | CAST(-1 AS BIGINT) AS o_orderkey, CAST(-1 AS BIGINT) AS o_custkey
        |UNION ALL
        |SELECT CAST(1 AS BOOLEAN), o_orderkey, o_custkey FROM orders""".stripMargin,
    // same answer as gw20 — only the rewrite strategy differs (DVs, no
    // group rewrite), which the in-query file-survival requires pin
    "gw27_mor_sql_update" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | CASE WHEN o_orderkey < 5600 THEN o_totalprice * 2
        |      ELSE o_totalprice END AS o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | CASE WHEN o_orderkey < 5600 THEN 'REPRICED'
        |      ELSE o_orderpriority END AS o_orderpriority
        |FROM orders""".stripMargin,
    // same answer as gw21 — delta-based rewrite, same rows
    "gw28_mor_sql_merge" ->
      """WITH src AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus,
        |        o_totalprice * 3 AS o_totalprice, o_orderdate, o_orderpriority
        | FROM orders WHERE o_orderkey >= 5600 AND o_orderkey < 9000),
        |tgt AS (SELECT * FROM orders WHERE o_orderkey < 7500)
        |SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
        | COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
        | strftime(t.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | t.o_orderpriority
        |FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | o_orderpriority
        |FROM src WHERE o_orderkey >= 7500""".stripMargin,
    // RESTORE undoes the DELETE: final content = the original table
    "gw29_restore" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    // the clone ends at exactly one region copy (delete-all + one insert)
    "gw30_shallow_clone" ->
      "SELECT r_regionkey, r_name FROM region",
    // the z-order rewrite must not change content: 8 modulo slices
    // reassemble to exactly the source table
    "gw31_zorder_compact" ->
      """SELECT o_orderkey, o_custkey,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s
        |FROM orders""".stripMargin,
    "gw32_cdf_stream" ->
      """SELECT r_regionkey, r_name, CAST(0 AS BIGINT) AS change_seq, 'insert' AS _change_type FROM region
        |UNION ALL
        |SELECT r_regionkey, r_name, CAST(1 AS BIGINT), 'insert' FROM region
        |UNION ALL
        |SELECT r_regionkey, r_name, CAST(2 AS BIGINT), 'delete' FROM region
        |UNION ALL
        |SELECT r_regionkey, r_name, CAST(2 AS BIGINT), 'delete' FROM region""".stripMargin,
    "gw43_change_data_feed" ->
      """SELECT r_regionkey, r_name, 'insert' AS change_type,
        |       CAST(0 AS BIGINT) AS change_seq
        |FROM region
        |UNION ALL
        |SELECT r_regionkey, r_name, 'update_preimage', CAST(2 AS BIGINT)
        |FROM region WHERE r_regionkey < 2
        |UNION ALL
        |SELECT r_regionkey, upper(r_name), 'update_postimage', CAST(2 AS BIGINT)
        |FROM region WHERE r_regionkey < 2
        |UNION ALL
        |SELECT r_regionkey, r_name, 'delete', CAST(3 AS BIGINT)
        |FROM region WHERE r_regionkey = 3
        |UNION ALL
        |SELECT r_regionkey, r_name, 'delete', CAST(4 AS BIGINT)
        |FROM region WHERE r_regionkey = 4""".stripMargin,
    "gw44_in_commit_timestamps" ->
      """SELECT * FROM region UNION ALL SELECT * FROM region
        |UNION ALL SELECT * FROM region""".stripMargin,
    "gw45_log_retention" ->
      "SELECT * FROM nation WHERE n_nationkey < 25",
    "gw46_table_features" ->
      "SELECT * FROM region WHERE r_regionkey <> 1",
    // two appends of region, then the post-unset DELETE of key 1
    "gw47_append_only" ->
      """SELECT * FROM (SELECT * FROM region UNION ALL SELECT * FROM region)
        |WHERE r_regionkey <> 1""".stripMargin,
    // the deep clone preserves the source snapshot (orders minus the MOR
    // delete) even after the source is truncated and vacuumed away
    "gw48_deep_clone" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | o_orderpriority
        |FROM orders WHERE o_custkey % 3 <> 0""".stripMargin,
    // the widened table = nation at BIGINT keys plus the beyond-int32 row
    "gw49_type_widening" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        | CAST(n_regionkey AS INT) AS n_regionkey
        |FROM nation
        |UNION ALL
        |SELECT CAST(3000000000 AS BIGINT), 'wide', CAST(0 AS INT)""".stripMargin,
    // defaults materialize at insert: 1-2 & 4 at CREATE's defaults, 3
    // explicit, 5 under the altered default
    "gw50_column_defaults" ->
      """SELECT CAST(k AS INT) AS k, status, CAST(score AS DOUBLE) AS score
        |FROM (VALUES (1, 'open', 1.5), (2, 'open', 1.5), (3, 'closed', 0.0),
        |             (4, 'open', 1.5), (5, 'pending', 1.5)) v(k, status, score)""".stripMargin,
    // the F window doubled (exact IEEE *2), everything else untouched
    "gw51_replace_where" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
        |      ELSE o_totalprice END AS o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | o_orderpriority
        |FROM orders""".stripMargin,
    // ordered single-file appends pin the key->id mapping: copy 1 id = key,
    // copy 2 id = key + 25; the MOR delete keeps odd keys' original ids
    "gw52_row_tracking" ->
      """SELECT n_nationkey, n_name, CAST(n_nationkey AS BIGINT) AS row_id
        |FROM nation WHERE n_nationkey % 2 = 1
        |UNION ALL
        |SELECT n_nationkey, n_name, CAST(n_nationkey + 25 AS BIGINT)
        |FROM nation WHERE n_nationkey % 2 = 1""".stripMargin,
    // the converted table after the post-conversion DELETE of keys >= 20
    "gw53_convert" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey < 20",
    // content is untouched by the vacuum lifecycle (two region copies,
    // compacted then reclaimed)
    "gw54_vacuum_dry_run" ->
      """SELECT CAST(r_regionkey AS INT) AS r_regionkey, r_name FROM region
        |UNION ALL
        |SELECT CAST(r_regionkey AS INT), r_name FROM region""".stripMargin,
    // the timestamp restore undoes the DELETE: back to the full insert
    "gw55_restore_timestamp" ->
      """SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
        | CAST(n_regionkey AS INT) AS n_regionkey FROM nation""".stripMargin,
    // eleven appended copies of region, served through the part set
    "gw56_multipart_checkpoint" ->
      """SELECT r_regionkey, r_name
        |FROM region, (SELECT unnest(generate_series(1, 11)))""".stripMargin,
    // the three smallest order keys' rows, found through bloom skipping
    "gw57_bloom_skipping" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        | o_orderpriority
        |FROM orders
        |WHERE o_orderkey IN (SELECT o_orderkey FROM orders ORDER BY 1 LIMIT 3)""".stripMargin,
    // keys 0..10 appended one commit each, then key 5 deleted — served
    // through three compacted log segments
    "gw58_log_compaction" ->
      "SELECT * FROM nation WHERE n_nationkey <= 10 AND n_nationkey <> 5",
    // region key i%5 appended once per commit i in 0..21, served through
    // the v20 V2 checkpoint manifest + sidecars
    "gw59_v2_checkpoint" ->
      """SELECT r.* FROM region r
        |JOIN (SELECT unnest(generate_series(0, 21)) % 5 AS k) c
        |  ON c.k = r.r_regionkey""".stripMargin,
    // region key i%5 appended per commit i in 0..10 plus one extra key-2
    // append, all served through the incremental v21 manifest after the
    // covered JSONs aged out; the reuse/GC invariants are require()-pinned
    "gw62_incremental_checkpoint" ->
      """SELECT r.* FROM region r
        |JOIN (SELECT unnest(generate_series(0, 10)) % 5 AS k
        |      UNION ALL SELECT 2) c
        |  ON c.k = r.r_regionkey""".stripMargin,
    // nation minus the deleted n_regionkey=4 partition; the manifest
    // layout/content/regeneration invariants are require()-pinned in-gate
    "gw66_symlink_manifest" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation WHERE n_regionkey <> 4""".stripMargin,
    // gw69: content unchanged through the stats-column filter; the
    // stats-shape and pruning invariants are require()-pinned in-gate
    "gw69_stats_columns" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  CAST(o_custkey AS BIGINT) AS o_custkey, o_orderpriority
        |FROM orders WHERE o_custkey % 10 = 0""".stripMargin,
    // gw74: the nation fixture unchanged end to end (the MOR delete's
    // rows are re-inserted); every protection/refusal invariant is
    // require()-pinned in-gate
    "gw74_protocol_protection" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation""".stripMargin,
    // gw73: the date-predicate slice with its generated month column;
    // the partition-pruning invariants are require()-pinned in-gate
    "gw73_generated_pruning" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
        |  CAST(CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
        |    AS VARCHAR) AS mon
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1999-06-15'""".stripMargin,
    // gw72: regions 0-3 survive (the violating region-4 batches raised
    // and committed nothing) plus the NULL-region row CHECK passes by
    // SQL-standard semantics; the typed-error/no-commit invariants are
    // require()-pinned in-gate
    "gw72_path_constraints" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation WHERE n_regionkey < 4
        |UNION ALL
        |SELECT 900, 'NULLREGION', CAST(NULL AS BIGINT)""".stripMargin,
    // gw71: nation unchanged through compaction + LITE vacuum + full
    // vacuum; the no-listing/debris-survival/reclaim-count invariants are
    // require()-pinned in-gate
    "gw71_vacuum_lite" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation""".stripMargin,
    // gw70: content unchanged through the metadata-only stats backfill;
    // the no-rewrite/pruning/idempotence invariants are require()-pinned
    // in-gate
    "gw70_stats_backfill" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  CAST(o_custkey AS BIGINT) AS o_custkey, o_orderpriority
        |FROM orders WHERE o_custkey % 7 = 0""".stripMargin,
    // gw68: nation after region 2's dynamic restatement; file-level
    // untouched/replaced invariants are require()-pinned in-gate
    "gw68_dynamic_overwrite" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  CASE WHEN n_regionkey = 2 THEN concat('DYN_', n_name)
        |       ELSE n_name END AS n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation""".stripMargin,
    // gw67: result-exact replay of the dynamically-pruned join; the
    // file-pruning invariants are require()-pinned in-gate
    "gw67_dynamic_file_pruning" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderkey < 600
        |GROUP BY 1""".stripMargin,
    // the nation fixture unchanged through the optimized write; the
    // file-count invariants (control fan-out, <=1 per value, AQE packing)
    // are require()-pinned in-gate
    "gw65_optimize_write" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation""".stripMargin,
    // seed keys 0-14, evolving merge over keys 10-24: matched rows take
    // starred names + the NEW n_len column, unmatched insert by name,
    // pre-evolution rows null-fill; single-commit/old-schema invariants
    // are require()-pinned in-gate
    "gw64_merge_evolution" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  CASE WHEN n_nationkey BETWEEN 10 AND 14
        |       THEN n_name || '*' ELSE n_name END AS n_name,
        |  CASE WHEN n_nationkey >= 10
        |       THEN CAST(length(n_name) AS BIGINT) END AS n_len
        |FROM nation WHERE n_nationkey <= 24""".stripMargin,
    // the nation fixture minus the MOR-deleted keys, untouched by the
    // REORG + two protocol downgrades; every drop-feature invariant
    // (refusals, truncation, fresh replay) is require()-pinned in-gate
    "gw63_drop_feature" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation WHERE n_nationkey >= 3""".stripMargin,
    // the full orders fixture minus the merge-on-read DELETE's rows; the
    // crc/verification invariants are require()-pinned inside the gate
    "gw60_version_checksum" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_s,
        |  o_orderpriority
        |FROM orders WHERE o_custkey % 7 <> 0""".stripMargin,
    // the region fixture unchanged end to end — every domain-metadata
    // invariant (feature upgrade, latest-wins, tombstones, checkpoint
    // survival, clone carry, RESTORE revert) is require()-pinned in-gate
    "gw61_domain_metadata" ->
      "SELECT r_regionkey, r_name FROM region",
  )
}
