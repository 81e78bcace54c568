package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** Row-level DELETE / TRUNCATE: GwTable.delete's three-tier classification
  * (untouched / full metadata-only drop / partial copy-on-write rewrite),
  * SQL DELETE FROM + TRUNCATE TABLE through the catalog, null predicate
  * semantics, and vacuum reclaim of superseded `_dml/` rewrites. */
class DmlSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Fresh gwdelta table holding `nation` split into two known key ranges
    * (one commit each): file A = n_nationkey < 12, file B = the rest. */
  private def twoRangeTable(): (String, GwTable) = {
    val dir = Files.createTempDirectory("dml").resolve("nation").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
    src.filter(col("n_nationkey") < 12).coalesce(1)
      .write.format("gwdelta").mode("append").save(dir)
    src.filter(col("n_nationkey") >= 12).coalesce(1)
      .write.format("gwdelta").mode("append").save(dir)
    (dir, GwTable.forPath(spark, dir))
  }

  private def rows(df: DataFrame): Long = df.count()

  test("delete classifies files: untouched / full drop / partial rewrite") {
    val (_, t) = twoRangeTable()
    val before = t.snapshot().files.map(_.path)
    assert(before.size == 2)
    // matches ALL of file A (0..11) and none of file B -> metadata-only
    val v1 = t.delete(col("n_nationkey") < 12)
    assert(v1 > 0)
    val afterFull = t.snapshot().files.map(_.path)
    assert(afterFull.size == 1 && !afterFull.head.contains("/_dml/"),
      "full-file delete must not rewrite anything")
    // partial: file B keeps its upper half through a _dml rewrite
    val v2 = t.delete(col("n_nationkey") < 20)
    assert(v2 == v1 + 1)
    val afterPartial = t.snapshot().files.map(_.path)
    assert(afterPartial.size == 1 && afterPartial.head.contains("/_dml/"))
    assert(rows(t.toDF) ==
      rows(spark.read.parquet(s"$sf/nation.parquet").filter(col("n_nationkey") >= 20)))
    // content, not just counts
    assert(t.toDF.select("n_nationkey").collect().map(_.getAs[Number](0).longValue)
        .sorted.toSeq ==
      spark.read.parquet(s"$sf/nation.parquet").filter(col("n_nationkey") >= 20)
        .select("n_nationkey").collect().map(_.getAs[Number](0).longValue).sorted.toSeq)
  }

  test("delete with no matching row is a no-op (no commit)") {
    val (_, t) = twoRangeTable()
    val before = t.snapshot().version
    assert(t.delete(col("n_nationkey") > 1000) == -1L)
    assert(t.snapshot().version == before)
  }

  test("NULL predicate keeps the row (SQL DELETE semantics)") {
    val dir = Files.createTempDirectory("dml").resolve("t").toString
    import spark.implicits._
    Seq((1L, Some("a")), (2L, None: Option[String]), (3L, Some("b")))
      .toDF("id", "s").coalesce(1)
      .write.format("gwdelta").mode("append").save(dir)
    val t = GwTable.forPath(spark, dir)
    // s != 'a' is NULL for id=2 -> that row must SURVIVE
    assert(t.delete(col("s") =!= lit("a")) > 0)
    assert(t.toDF.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("delete(lit(true)) and truncate are metadata-only remove-alls") {
    val (_, t) = twoRangeTable()
    val v = t.delete(lit(true))
    assert(v > 0)
    assert(t.snapshot().files.isEmpty)
    assert(rows(t.toDF) == 0)
    // truncate on already-empty table still commits (INSERT OVERWRITE parity)
    assert(t.truncate() == v + 1)
    // and the content is still time-travelable
    assert(rows(t.versionAsOf(v - 1)) == rows(spark.read.parquet(s"$sf/nation.parquet")))
  }

  test("dynamic partition overwrite threads writeOptions: txn replay + userMetadata") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    import spark.implicits._
    val dir = Files.createTempDirectory("dynopts").resolve("t").toString
    Seq((1L, "a", 0L), (2L, "b", 1L)).toDF("k", "v", "p")
      .write.format("gwdelta").partitionBy("p").save(dir)
    val ns = s"dml${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.t USING gwdelta LOCATION '$dir'")
    val t = GwTable.forPath(spark, dir)
    val v0 = t.snapshot().version
    def overwriteP1(): Unit =
      Seq((9L, "z", 1L)).toDF("k", "v", "p")
        .writeTo(s"gw.$ns.t")
        .option("txnAppId", "dynow").option("txnVersion", "1")
        .option("userMetadata", "audit-dyn-1")
        .overwritePartitions()
    overwriteP1()
    val v1 = t.snapshot().version
    assert(v1 == v0 + 1)
    // only partition p=1 was restated
    assert(t.toDF.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 0L), (9L, "z", 1L)))
    // the audit string landed on the commit
    val ci = t.log.readVersion(v1).collectFirst {
      case c: graft.log.CommitInfo => c }.get
    assert(ci.userMetadata.contains("audit-dyn-1"),
      s"userMetadata must thread through the dynamic overwrite: $ci")
    // identical (app, version) txn: the replayed statement commits NOTHING
    overwriteP1()
    assert(t.snapshot().version == v1,
      "a replayed txnAppId/txnVersion dynamic overwrite must be a no-op")
  }

  test("SQL DELETE FROM + TRUNCATE TABLE through the catalog") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val (dir, t) = twoRangeTable()
    val ns = s"dml${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    // predicate algebra beyond plain comparison: IN-list + conjunction
    spark.sql(s"DELETE FROM gw.$ns.nation " +
      "WHERE n_nationkey IN (0, 1, 2, 3) AND n_name IS NOT NULL")
    assert(rows(spark.table(s"gw.$ns.nation")) ==
      rows(spark.read.parquet(s"$sf/nation.parquet").filter(col("n_nationkey") > 3)))
    val preTruncate = t.snapshot().version
    spark.sql(s"TRUNCATE TABLE gw.$ns.nation")
    assert(rows(spark.table(s"gw.$ns.nation")) == 0)
    assert(rows(spark.sql(
      s"SELECT * FROM gw.$ns.nation VERSION AS OF $preTruncate")) > 0)
  }

  test("ALTER TABLE ADD COLUMNS: metadata-only, null-fill on read, time travel keeps old schema") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val (dir, t) = twoRangeTable()
    val ns = s"dml${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    val preAlter = t.snapshot().version
    val filesBefore = t.snapshot().files.map(_.path).toSet
    spark.sql(s"ALTER TABLE gw.$ns.nation ADD COLUMNS (score BIGINT, tag STRING)")
    assert(t.snapshot().files.map(_.path).toSet == filesBefore,
      "ADD COLUMNS must not rewrite any file")
    val widened = spark.table(s"gw.$ns.nation")
    assert(widened.columns.takeRight(2).toSeq == Seq("score", "tag"))
    assert(widened.filter(col("score").isNotNull || col("tag").isNotNull).count() == 0,
      "pre-evolution rows must null-fill the new columns")
    assert(!spark.sql(s"SELECT * FROM gw.$ns.nation VERSION AS OF $preAlter")
      .columns.contains("score"), "time travel must keep the pre-ALTER schema")
    // duplicate columns and unsupported change kinds are rejected
    // (RENAME/DROP COLUMN are supported since round 6 — MappingSpec/gw38)
    assertThrows[Exception](
      spark.sql(s"ALTER TABLE gw.$ns.nation ADD COLUMNS (n_name STRING)"))
    assertThrows[Exception](
      spark.sql(s"ALTER TABLE gw.$ns.nation ALTER COLUMN score TYPE STRING"))
  }

  test("SQL UPDATE rewrites only stats-surviving files; pre-update version intact") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val (dir, t) = twoRangeTable()
    val ns = s"dml${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    val before = t.snapshot().files.map(_.path)
    val preUpdate = t.snapshot().version
    spark.sql(s"UPDATE gw.$ns.nation SET n_name = concat('X_', n_name) " +
      "WHERE n_nationkey < 5") // strictly inside file A: B (min=12) must stats-prune
    val live = t.snapshot().files.map(_.path)
    assert(live.contains(before(1)),
      "the upper-range file must survive untouched (stats-pruned out of the groups)")
    assert(!live.contains(before.head), "the matching file must be rewritten")
    assert(live.exists(_.contains("/_dml/")))
    val out = spark.table(s"gw.$ns.nation")
    assert(out.filter(col("n_nationkey") < 5 && !col("n_name").startsWith("X_")).count() == 0)
    assert(out.filter(col("n_nationkey") >= 5 && col("n_name").startsWith("X_")).count() == 0)
    assert(out.count() == rows(spark.read.parquet(s"$sf/nation.parquet")))
    assert(spark.sql(s"SELECT * FROM gw.$ns.nation VERSION AS OF $preUpdate")
      .filter(col("n_name").startsWith("X_")).count() == 0,
      "pre-update version must serve the original rows")
  }

  test("SQL MERGE INTO updates matched rows and inserts unmatched source rows") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val (dir, t) = twoRangeTable()
    val ns = s"dml${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    val n = spark.read.parquet(s"$sf/nation.parquet")
    // source: rekeyed lower rows (match -> update) + new keys (insert)
    n.filter(col("n_nationkey") < 5)
      .withColumn("n_name", lit("MERGED"))
      .unionAll(n.filter(col("n_nationkey") >= 20)
        .withColumn("n_nationkey", col("n_nationkey") + 1000))
      .createOrReplaceTempView(s"${ns}_src")
    spark.sql(s"""MERGE INTO gw.$ns.nation t USING ${ns}_src s
      ON t.n_nationkey = s.n_nationkey
      WHEN MATCHED THEN UPDATE SET n_name = s.n_name
      WHEN NOT MATCHED THEN INSERT *""")
    val out = spark.table(s"gw.$ns.nation")
    assert(out.filter(col("n_name") === "MERGED").count() == 5)
    assert(out.filter(col("n_nationkey") >= 1000).count() ==
      rows(n.filter(col("n_nationkey") >= 20)))
    assert(out.count() == rows(n) + rows(n.filter(col("n_nationkey") >= 20)))
  }

  test("DELETE with a predicate canDeleteWhere declines takes the row-level path") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val (dir, t) = twoRangeTable()
    val ns = s"dml${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    // modulo arithmetic has no V1 filter translation -> group-based rewrite
    spark.sql(s"DELETE FROM gw.$ns.nation WHERE n_nationkey % 2 = 0")
    val out = spark.table(s"gw.$ns.nation")
    assert(out.filter(col("n_nationkey") % 2 === 0).count() == 0)
    assert(out.count() ==
      rows(spark.read.parquet(s"$sf/nation.parquet").filter(col("n_nationkey") % 2 =!= 0)))
    assert(t.snapshot().files.exists(_.path.contains("/_dml/")))
  }

  test("rowChanges: compaction emits nothing, schema change fails fast, no-op range is empty") {
    val (_, t) = twoRangeTable()
    val v0 = t.snapshot().version
    // DELETE half of file A -> one delete commit; CDF = exactly the deleted rows
    assert(t.delete(col("n_nationkey") < 6) > 0)
    val cdf = t.rowChanges(v0)
    assert(cdf.filter(col("_change_type") === "delete").count() == 6)
    assert(cdf.filter(col("_change_type") === "insert").count() == 0,
      "the rewrite's surviving rows must cancel out of the bag difference")
    // compaction is dataChange=false: a consumer at the current version sees nothing
    val v1 = t.snapshot().version
    assert(t.compact(targetFileBytes = 1L << 30) > 0)
    assert(t.rowChanges(v1).count() == 0)
    // empty range short-circuits
    assert(t.rowChanges(t.snapshot().version).count() == 0)
    // a schema change in range must fail fast, like changesSince
    t.addColumns(org.apache.spark.sql.types.StructField("tag",
      org.apache.spark.sql.types.StringType))
    assertThrows[IllegalStateException](t.rowChanges(v1).count())
  }

  test("V2 epoch commit (commitHarvested) dedups crash-replayed epochs by txnId") {
    val dir = Files.createTempDirectory("v2sink").resolve("t").toString
    val src = spark.read.parquet(s"$sf/region.parquet")
    val out = new org.apache.hadoop.fs.Path(dir, "_stream/manual/0")
    src.coalesce(1).write.mode("overwrite").parquet(out.toString)
    val conf = spark.sparkContext.hadoopConfiguration
    val adds = graft.sources.SchemaProbe.harvestAddFiles(conf, out, dataChange = true)
    val v1 = graft.streaming.GwSink.commitHarvested(conf, dir, src.schema, adds, Some("q1/0"))
    val v2 = graft.streaming.GwSink.commitHarvested(conf, dir, src.schema, adds, Some("q1/0"))
    assert(v1 >= 0 && v2 == v1, "a replayed epoch must return the original version, not recommit")
    assert(GwTable.forPath(spark, dir).toDF.count() == rows(src))
    // a different epoch of the same stream commits normally
    val v3 = graft.streaming.GwSink.commitHarvested(conf, dir, src.schema, adds, Some("q1/1"))
    assert(v3 == v1 + 1)
  }

  test("replaceFiles aborts when a scanned file is no longer live (concurrent replacement)") {
    val (_, t) = twoRangeTable()
    val stale = t.snapshot().files.map(_.path)
    // a competing commit replaces file A before the row-level commit lands
    assert(t.delete(col("n_nationkey") < 6) > 0)
    val e = intercept[graft.log.ConcurrentDeleteDeleteException](
      t.replaceFiles("UPDATE", stale.toSet, Nil))
    assert(e.getMessage.contains("concurrent commit"))
  }

  test("delete scans only stats-surviving candidate files") {
    // files have disjoint harvested n_nationkey ranges; a predicate on the
    // upper range must not classify (or rewrite) the lower file even
    // though its rows would also be read in a naive full scan
    val (_, t) = twoRangeTable()
    val lower = t.snapshot().files.map(_.path).head
    assert(t.delete(col("n_nationkey") >= 12) > 0)
    val live = t.snapshot().files.map(_.path)
    assert(live == Seq(lower), "lower-range file must survive byte-identical")
  }

  test("update rewrites only files containing matches, preserving schema") {
    val (_, t) = twoRangeTable()
    val before = t.snapshot().files.map(_.path)
    val schemaBefore = t.toDF.schema
    // assignment references the PRE-update value (SQL UPDATE semantics)
    val v = t.update(col("n_nationkey") < 5,
      Map("n_name" -> org.apache.spark.sql.functions.concat(lit("X_"), col("n_name"))))
    assert(v > 0)
    val after = t.snapshot().files.map(_.path)
    assert(after.contains(before(1)), "upper-range file must survive untouched")
    assert(!after.contains(before(0)) && after.exists(_.contains("/_dml/")))
    assert(t.toDF.schema == schemaBefore)
    val names = t.toDF.orderBy("n_nationkey").select("n_name")
      .collect().map(_.getString(0)).toSeq
    val expected = spark.read.parquet(s"$sf/nation.parquet").orderBy("n_nationkey")
      .select(org.apache.spark.sql.functions.when(col("n_nationkey") < 5,
        org.apache.spark.sql.functions.concat(lit("X_"), col("n_name")))
        .otherwise(col("n_name")))
      .collect().map(_.getString(0)).toSeq
    assert(names == expected)
    assert(t.update(col("n_nationkey") > 1000, Map("n_name" -> lit("z"))) == -1L)
  }

  test("merge updates matched rows and appends unmatched source rows") {
    val (_, t) = twoRangeTable()
    val before = t.snapshot().files.map(_.path)
    import spark.implicits._
    val src = spark.read.parquet(s"$sf/nation.parquet")
      .filter(col("n_nationkey") < 3)
      .withColumn("n_name", org.apache.spark.sql.functions.concat(lit("M_"), col("n_name")))
      .unionByName(
        spark.read.parquet(s"$sf/nation.parquet").filter(col("n_nationkey") === 0)
          .withColumn("n_nationkey", lit(100).cast("int"))
          .withColumn("n_name", lit("NEWLAND")))
    val v = t.merge(src, col("t.n_nationkey") === col("s.n_nationkey"),
      whenMatchedSet = Map("n_name" -> col("s.n_name")))
    assert(v > 0)
    // only the lower-range file held matches; the upper one survives as-is
    assert(t.snapshot().files.map(_.path).contains(before(1)))
    val byKey = t.toDF.select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).intValue -> r.getString(1)).toMap
    assert(byKey(0).startsWith("M_") && byKey(2).startsWith("M_"))
    assert(!byKey(5).startsWith("M_"))
    assert(byKey(100) == "NEWLAND")
    assert(byKey.size == 26) // 25 originals + 1 insert
  }

  test("merge rejects a target row matched by multiple source rows") {
    val (_, t) = twoRangeTable()
    val src = spark.read.parquet(s"$sf/nation.parquet").filter(col("n_nationkey") === 1)
    val dup = src.unionByName(src)
    val e = intercept[IllegalStateException] {
      t.merge(dup, col("t.n_nationkey") === col("s.n_nationkey"),
        whenMatchedSet = Map("n_name" -> col("s.n_name")))
    }
    assert(e.getMessage.contains("non-deterministic"))
  }

  test("merge into a truncated table is a pure insert") {
    val (_, t) = twoRangeTable()
    t.truncate()
    val src = spark.read.parquet(s"$sf/nation.parquet").filter(col("n_nationkey") < 4)
    assert(t.merge(src, col("t.n_nationkey") === col("s.n_nationkey")) > 0)
    assert(rows(t.toDF) == 4)
    // and a merge with nothing to do commits nothing
    val vBefore = t.snapshot().version
    assert(t.merge(src.limit(0), col("t.n_nationkey") === col("s.n_nationkey")) == -1L)
    assert(t.snapshot().version == vBefore)
  }

  test("vacuum retention guard blocks short retention unless explicitly disabled") {
    val (_, t) = twoRangeTable()
    val err = intercept[IllegalArgumentException](t.vacuum(retentionMs = 0L))
    assert(err.getMessage.contains("retentionCheck"), err.getMessage)
    assert(t.vacuum() == 0, "default 7-day retention passes the guard")
  }

  test("vacuum reclaims superseded _dml rewrites but never live ones") {
    val (dir, t) = twoRangeTable()
    assert(t.delete(col("n_nationkey") < 20) > 0) // leaves one _dml file live
    val dmlLive = t.snapshot().files.map(_.path).filter(_.contains("/_dml/"))
    assert(dmlLive.size == 1)
    // supersede the rewrite itself, then vacuum with zero retention
    assert(t.delete(lit(true)) > 0)
    val deleted = GwTable.withRetentionCheckDisabled(spark)(t.vacuum(retentionMs = 0L))
    assert(deleted >= 1, s"expected the tombstoned _dml rewrite reclaimed, got $deleted")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dmlLive.head)))
    // original source-namespace files are NEVER vacuum candidates — but for
    // a gwdelta-written table they live under _stream/, which IS owned and
    // tombstoned, so they are reclaimed too; time travel past them now 404s
    // (documented retention contract), while the latest (empty) snapshot reads
    assert(rows(t.toDF) == 0)
  }

  // ---------------------------------------------------------- deletion vectors

  test("merge-on-read delete: no byte moves, V2 scan reconciles, DVs accumulate") {
    val (_, t) = twoRangeTable()
    val before = t.snapshot()
    // partial in both files
    assert(t.delete(col("n_nationkey") % 2 === 0, mergeOnRead = true) > 0)
    val snap = t.snapshot()
    assert(snap.files.map(_.path).toSet == before.files.map(_.path).toSet,
      "MOR delete must re-assert the same paths")
    assert(snap.files.forall(_.dv.isDefined))
    // V2 connector read (GwMorScan) reconciles
    assert(rows(t.toDF) == 12) // odd keys 1..23
    assert(t.toDF.filter(col("n_nationkey") === 2).count() == 0)
    assert(t.toDF.filter(col("n_nationkey") === 3).count() == 1)
    // a second MOR delete UNIONS into the vectors
    assert(t.delete(col("n_nationkey") === 3, mergeOnRead = true) > 0)
    assert(rows(t.toDF) == 11)
    val card = t.snapshot().files.flatMap(_.dv).map(_.cardinality).sum
    assert(card == 14, s"expected 13 even + key 3 = 14 deleted positions, got $card")
    // time travel serves every historical state
    assert(t.versionAsOf(before.version).count() == 25)
  }

  test("MOR scan reports log-exact statistics; small MOR join auto-broadcasts") {
    val (_, t) = twoRangeTable()
    assert(t.delete(col("n_nationkey") % 2 === 0, mergeOnRead = true) > 0)
    val df = t.toDF
    // the optimizer sees the log's exact live row count (25 - 13 deleted)
    val stats = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.computeStats()
    }
    assert(stats.nonEmpty, "expected a V2 scan relation in the plan")
    assert(stats.head.rowCount.contains(BigInt(12)),
      s"expected log-exact rowCount 12, got ${stats.head.rowCount}")
    // and therefore auto-broadcasts the MOR side without a hint
    val big = spark.range(0, 1000).selectExpr("id % 25 as k")
    val joined = big.join(df, big("k") === df("n_nationkey"))
    val hasBroadcast = joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin")
    assert(hasBroadcast, "small MOR table should plan a broadcast join:\n" +
      joined.queryExecution.executedPlan)
    assert(joined.count() == 480) // 12 live keys x 40 each
  }

  test("MOR delete covering a file's every row upgrades to a plain remove") {
    val (_, t) = twoRangeTable()
    assert(t.delete(col("n_nationkey") < 12, mergeOnRead = true) > 0)
    val snap = t.snapshot()
    assert(snap.files.size == 1, "fully-covered file must tombstone, not carry a DV")
    assert(snap.files.forall(_.dv.isEmpty))
    assert(rows(t.toDF) == 13)
  }

  test("UPDATE and SQL UPDATE on DV'd files do not resurrect deleted rows") {
    val (dir, t) = twoRangeTable()
    assert(t.delete(col("n_nationkey") === 0, mergeOnRead = true) > 0)
    // API update rewrites via readLive
    assert(t.update(col("n_nationkey") < 5, Map("n_name" -> lit("X"))) > 0)
    assert(rows(t.toDF) == 24, "deleted row must stay deleted through UPDATE")
    assert(t.toDF.filter(col("n_name") === "X").count() == 4) // keys 1..4
    // SQL UPDATE routes through the row-level group scan (GwMorScan there)
    assert(t.delete(col("n_nationkey") === 1, mergeOnRead = true) > 0)
    val ns = s"dv${System.nanoTime()}"
    operators.GwCore.ensureGwCatalog(spark)
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    spark.sql(s"UPDATE gw.$ns.nation SET n_name = 'Y' WHERE n_nationkey < 5")
    assert(spark.table(s"gw.$ns.nation").count() == 23)
    assert(spark.table(s"gw.$ns.nation").filter(col("n_name") === "Y").count() == 3)
  }

  test("MERGE on DV'd files does not resurrect deleted rows") {
    val (_, t) = twoRangeTable()
    assert(t.delete(col("n_nationkey") === 0, mergeOnRead = true) > 0)
    // merge touches the file holding the DV'd row (key 2 lives with key 0)
    val src = spark.read.parquet(s"$sf/nation.parquet")
      .filter(col("n_nationkey") === 2).withColumn("n_name", lit("M"))
    assert(t.merge(src, col("t.n_nationkey") === col("s.n_nationkey"),
      whenMatchedSet = Map("n_name" -> col("s.n_name"))) > 0)
    assert(rows(t.toDF) == 24, "DV-deleted row must stay deleted through MERGE")
    assert(t.toDF.filter(col("n_nationkey") === 0).isEmpty)
    assert(t.toDF.filter(col("n_name") === "M").count() == 1)
  }

  test("MERGE conditional branches: WHEN MATCHED DELETE + guarded insert") {
    val (_, t) = twoRangeTable()
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    // source: delete marker for key 3, update for key 4, insert for 99,
    // and a delete marker for absent key 98 (must NOT insert)
    val src = nation.filter(col("n_nationkey") === 3).withColumn("op", lit("delete"))
      .union(nation.filter(col("n_nationkey") === 4)
        .withColumn("n_name", lit("U")).withColumn("op", lit("upsert")))
      .union(nation.filter(col("n_nationkey") === 5)
        .withColumn("n_nationkey", lit(99)).withColumn("op", lit("upsert")))
      .union(nation.filter(col("n_nationkey") === 5)
        .withColumn("n_nationkey", lit(98)).withColumn("op", lit("delete")))
    assert(t.merge(src, col("t.n_nationkey") === col("s.n_nationkey"),
      whenMatchedSet = Map("n_name" -> col("s.n_name")),
      whenMatchedDeleteIf = Some(col("s.op") === "delete"),
      insertNotMatchedIf = Some(col("op") =!= "delete")) > 0)
    val out = t.toDF
    assert(out.filter(col("n_nationkey") === 3).isEmpty, "matched delete must drop the row")
    assert(out.filter(col("n_nationkey") === 98).isEmpty, "delete marker must not insert")
    assert(out.filter(col("n_nationkey") === 99).count() == 1, "guarded insert lands")
    assert(out.filter(col("n_nationkey") === 4).select("n_name").head.getString(0) == "U")
    assert(rows(out) == 25, "25 - 1 delete + 1 insert")
  }

  test("rowChanges surfaces exactly the MOR-deleted rows as deletes") {
    val (_, t) = twoRangeTable()
    val v0 = t.snapshot().version
    assert(t.delete(col("n_nationkey").isin(2, 13), mergeOnRead = true) > 0)
    val changes = t.rowChanges(v0).collect()
    assert(changes.length == 2)
    assert(changes.forall(_.getString(changes.head.length - 2) == "delete"))
    assert(changes.map(_.getInt(0)).sorted.toSeq == Seq(2, 13))
    // a second MOR delete reports only the NEWLY deleted row
    val v1 = t.snapshot().version
    assert(t.delete(col("n_nationkey").isin(2, 5), mergeOnRead = true) > 0)
    val second = t.rowChanges(v1).collect()
    assert(second.map(_.getInt(0)).toSeq == Seq(5),
      s"already-deleted key 2 must not re-report: ${second.mkString(",")}")
  }

  test("merge-on-read UPDATE: matched rows move to a new file via DV, no rewrite") {
    val (_, t) = twoRangeTable()
    val before = t.snapshot().files.map(_.path).toSet
    assert(t.update(col("n_nationkey") < 3, Map("n_name" -> lit("U")),
      mergeOnRead = true) > 0)
    val snap = t.snapshot()
    assert(before.subsetOf(snap.files.map(_.path).toSet),
      "MOR update must keep the original files live (DV'd), not rewrite them")
    assert(snap.files.exists(f => f.path.contains("/_dml/") && f.dv.isEmpty),
      "updated rows must land as a fresh clean file")
    assert(rows(t.toDF) == 25)
    assert(t.toDF.filter(col("n_name") === "U").count() == 3)
    assert(t.toDF.filter(col("n_nationkey") < 3).count() == 3, "no duplicates")
    // layered: MOR delete then MOR update over the same key space — the
    // deleted row must not resurrect, updates hit live rows only
    assert(t.delete(col("n_nationkey") === 5, mergeOnRead = true) > 0)
    assert(t.update(col("n_nationkey") < 6, Map("n_name" -> lit("V")),
      mergeOnRead = true) > 0)
    assert(rows(t.toDF) == 24, "deleted key 5 must stay deleted")
    assert(t.toDF.filter(col("n_name") === "V").count() == 5) // keys 0..4
    assert(t.toDF.filter(col("n_name") === "U").count() == 0)
    // full-coverage MOR update upgrades the emptied file to a plain remove
    assert(t.update(col("n_nationkey") < 12, Map("n_name" -> lit("W")),
      mergeOnRead = true) > 0)
    assert(rows(t.toDF) == 24)
    assert(t.toDF.filter(col("n_name") === "W").count() == 11) // 0..11 minus 5
  }

  test("maintenance SQL: OPTIMIZE / VACUUM / DESCRIBE HISTORY on a quoted path") {
    val (dir, t) = twoRangeTable()
    val hist = spark.sql(s"DESCRIBE HISTORY '$dir'").collect()
    assert(hist.length == 2, s"expected 2 commits, got ${hist.length}")
    val opt = spark.sql(s"OPTIMIZE '$dir'").collect()
    assert(opt.head.getLong(1) > 0)
    assert(t.snapshot().files.size == 1, "OPTIMIZE must consolidate the two files")
    assert(spark.sql(s"DESCRIBE HISTORY '$dir'")
      .collect().exists(_.getString(2) == "OPTIMIZE"))
    val vac = GwTable.withRetentionCheckDisabled(spark)(
      spark.sql(s"VACUUM '$dir' RETAIN 0 HOURS").collect())
    assert(vac.head.getInt(1) >= 2,
      s"expected the superseded insert files reclaimed, got ${vac.head.getInt(1)}")
    assert(rows(t.toDF) == 25)
    // DESCRIBE DETAIL: snapshot facts, including deletion-vector totals
    assert(t.delete(col("n_nationkey") === 1, mergeOnRead = true) > 0)
    val detail = spark.sql(s"DESCRIBE DETAIL '$dir'").collect().head
    assert(detail.getString(0) == "gwdelta")
    assert(detail.getLong(3) == t.snapshot().files.size.toLong)
    assert(detail.getLong(6) == 0L, s"unpartitioned table: numPartitions=0: $detail")
    assert(detail.getLong(7) == 1L && detail.getLong(8) == 1L,
      s"expected one DV file with one deleted row: $detail")
  }

  test("maintenance SQL resolves bare names in the current namespace; foreign tables fall through") {
    val (dir, _) = twoRangeTable()
    val ns = s"mnt${System.nanoTime()}"
    operators.GwCore.ensureGwCatalog(spark)
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    try {
      spark.sql(s"USE gw.$ns")
      // single-part identifier: must resolve through the CURRENT namespace
      assert(spark.sql("DESCRIBE HISTORY nation").collect().length == 2)
      assert(spark.sql("DESCRIBE DETAIL nation").collect().head.getString(0) == "gwdelta")
    } finally spark.sql("USE spark_catalog.default")
    // a table another connector owns: the statement must fall through to
    // the delegate parser (here: Spark, which rejects the syntax), NOT die
    // in our command with UnsupportedOperationException
    val name = s"mnt_pq_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $name (a INT) USING parquet")
    try {
      val e = intercept[Exception] { spark.sql(s"OPTIMIZE $name") }
      assert(!e.isInstanceOf[UnsupportedOperationException],
        s"foreign-table OPTIMIZE must reach the delegate, got: $e")
    } finally spark.sql(s"DROP TABLE $name")
  }

  test("generated columns: set-time validation rejects bad declarations") {
    val (_, t) = twoRangeTable()
    // unknown target column
    val e1 = intercept[IllegalArgumentException] {
      t.updateProperties(Map("graft.generated.nope" -> "n_nationkey * 2"))
    }
    assert(e1.getMessage.contains("not in the table schema"))
    // expression referencing an unknown column
    val e2 = intercept[IllegalArgumentException] {
      t.updateProperties(Map("graft.generated.n_name" -> "n_nationkeyy * 2"))
    }
    assert(e2.getMessage.contains("unknown column"))
    // expression not castable to the column type
    val e3 = intercept[IllegalArgumentException] {
      t.updateProperties(Map("graft.generated.n_regionkey" -> "array(n_nationkey)"))
    }
    assert(e3.getMessage.contains("types as"))
    // one generated column may not reference another (both in one ALTER)
    val e4 = intercept[IllegalArgumentException] {
      t.updateProperties(Map(
        "graft.generated.n_regionkey" -> "n_nationkey + 1",
        "graft.generated.n_name" -> "cast(n_regionkey as string)"))
    }
    assert(e4.getMessage.contains("unknown column"))
    // existing rows that violate the expression reject the declaration
    // (scans would otherwise prune files holding matching rows); the
    // fixture's regionkey is nationkey % 5, so % 3 genuinely mismatches
    val e5 = intercept[IllegalArgumentException] {
      t.updateProperties(Map("graft.generated.n_regionkey" -> "n_nationkey % 3"))
    }
    assert(e5.getMessage.contains("violate the generation invariant"))
    // a declaration existing rows DO satisfy commits metadata-only
    val files = t.snapshot().files.size
    assert(t.updateProperties(Map("graft.generated.n_regionkey" -> "n_nationkey % 5")) > 0)
    assert(t.snapshot().files.size == files)
  }

  test("replaceFiles aborts when a scanned file's deletion vector changed (concurrent MOR)") {
    val (_, t) = twoRangeTable()
    val stale = t.snapshot().files.head // planned scan state: no DV
    // a concurrent merge-on-read delete grows the file's deletion vector
    assert(t.delete(col("n_nationkey") === 1, mergeOnRead = true) > 0)
    val err = intercept[graft.log.ConcurrentDeleteDeleteException] {
      t.replaceFiles("UPDATE", Set(stale.path), Nil, Seq(stale))
    }
    assert(err.getMessage.contains("concurrent"),
      s"stale-DV rewrite must abort, got: ${err.getMessage}")
  }

  test("commitDeltaDml aborts when a planned file mutated mid-operation") {
    val (_, t) = twoRangeTable()
    val planned = t.snapshot().files // delta scan's candidate set: no DVs
    // a concurrent MOR delete grows a DV on the first file
    assert(t.delete(col("n_nationkey") === 1, mergeOnRead = true) > 0)
    val chunk = graft.log.RoaringBitmapArray.serialize(Array(2L))
    val err = intercept[graft.log.ConcurrentDeleteDeleteException] {
      t.commitDeltaDml("UPDATE", planned,
        Seq(planned.head.path -> Seq(chunk)), Nil)
    }
    assert(err.getMessage.contains("concurrent"),
      s"stale planned set must abort, got: ${err.getMessage}")
    // and an UNTOUCHED-but-planned file mutating also aborts (verify set):
    // deletes target file B, but file A changed under the scan
    val planned2 = planned
    // the mutated file is only in the VERIFY set here (deletes target file
    // B), so the taxonomy distinguishes: read-dependency broken, not a
    // double delete
    val err2 = intercept[graft.log.ConcurrentDeleteReadException] {
      t.commitDeltaDml("MERGE", planned2,
        Seq(planned2(1).path -> Seq(chunk)), Nil)
    }
    assert(err2.getMessage.contains("concurrent"))
  }

  test("commitDeltaDml rejects deletes for a file outside the planned set") {
    val (_, t) = twoRangeTable()
    val planned = t.snapshot().files.take(1)
    val chunk = graft.log.RoaringBitmapArray.serialize(Array(0L))
    val err = intercept[IllegalStateException] {
      t.commitDeltaDml("UPDATE", planned,
        Seq("file:/nowhere/else.parquet" -> Seq(chunk)), Nil)
    }
    assert(err.getMessage.contains("never planned"))
  }

  test("RESTORE: file set + rows return to the target version, old state time-travelable") {
    val (dir, t) = twoRangeTable()
    val v0 = t.snapshot().version
    val filesV0 = t.snapshot().files.toSet
    assert(t.delete(col("n_nationkey") < 12) > 0) // full-file drop
    assert(t.delete(col("n_nationkey") < 20) > 0) // partial rewrite
    assert(rows(t.toDF) == 5)
    val restored = spark.sql(s"RESTORE TABLE '$dir' TO VERSION AS OF $v0")
      .collect().head
    assert(restored.getLong(0) > v0 && restored.getLong(1) == v0)
    assert(t.snapshot().files.toSet == filesV0,
      "live file set must equal the target version's exactly")
    assert(rows(t.toDF) == 25)
    // the pre-restore (deleted) state is still one version back
    assert(spark.read.format("gwdelta")
      .option("versionAsOf", restored.getLong(0) - 1).load(dir).count() == 5)
    // CDF across the restore surfaces the resurrected rows as inserts
    val cdf = t.rowChanges(restored.getLong(0) - 1)
    assert(cdf.filter(col("_change_type") === "insert").count() == 20)
    // restoring to the current state is a no-op
    assert(t.restore(t.snapshot().version) == -1L)
    // and a DV'd file restores WITH its deletion vector state
    assert(t.delete(col("n_nationkey") === 3, mergeOnRead = true) > 0)
    val vDv = t.snapshot().version
    assert(t.delete(col("n_nationkey") === 4, mergeOnRead = true) > 0)
    assert(t.restore(vDv) > 0)
    assert(t.snapshot().files.flatMap(_.dv).map(_.cardinality).sum == 1L,
      "restore must bring back the target's DV state, not the newer one")
    assert(rows(t.toDF) == 24)
  }

  test("RESTORE to a vacuumed-away version fails fast naming the missing file") {
    val (_, t) = twoRangeTable()
    val v0 = t.snapshot().version
    assert(t.delete(col("n_nationkey") < 20) > 0) // rewrites file A+B -> _dml
    GwTable.withRetentionCheckDisabled(spark)(t.vacuum(retentionMs = 0L)) // reclaims the superseded originals
    val err = intercept[IllegalArgumentException] { t.restore(v0) }
    assert(err.getMessage.contains("no longer exists"),
      s"expected missing-file failure, got: ${err.getMessage}")
  }

  test("SHALLOW CLONE: zero-copy bootstrap, independent evolution, DV state carried") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val (dir, t) = twoRangeTable()
    assert(t.delete(col("n_nationkey") === 1, mergeOnRead = true) > 0)
    val srcFiles = t.snapshot().files.toSet
    val ns = s"cl${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.src USING gwdelta LOCATION '$dir'")
    // identifier target, managed location
    val res = spark.sql(s"CREATE TABLE gw.$ns.copy SHALLOW CLONE gw.$ns.src")
      .collect().head
    assert(res.getLong(0) == 0L, "clone bootstrap must be version 0")
    val cloneLoc = res.getString(2)
    val clone = GwTable.forPath(spark, cloneLoc)
    // zero copy: the clone's files ARE the source's entries (DV included)
    assert(clone.snapshot().files.toSet == srcFiles)
    assert(spark.table(s"gw.$ns.copy").count() == 24)
    // no data under the clone's directory
    val fs = new org.apache.hadoop.fs.Path(cloneLoc)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(cloneLoc, "_stream")))
    // independent evolution: clone DML doesn't touch the source
    assert(clone.delete(col("n_nationkey") === 2) > 0)
    assert(spark.table(s"gw.$ns.copy").count() == 23)
    assert(rows(t.toDF) == 24, "source must be unaffected by clone DML")
    // version-pinned clone of the PRE-delete source state
    val tmp2 = Files.createTempDirectory("clone2").resolve("t").toString
    spark.sql(s"CREATE TABLE '$tmp2' SHALLOW CLONE '$dir' VERSION AS OF 0")
    assert(GwTable.forPath(spark, tmp2).toDF.count() == 12,
      "VERSION AS OF 0 clone must see only the first commit")
    // cloning onto an existing table fails
    val err = intercept[Exception] {
      GwTable.forPath(spark, dir).cloneTo(tmp2)
    }
    assert(err.getMessage.contains("already exists"))
  }

  test("DV actions round-trip the JSON log and the parquet checkpoint") {
    // both descriptor shapes: on-disk sidecar ("p", offset-framed) and
    // inline bitmap ("i", Z85 text, no offset)
    val onDisk = graft.log.AddFile("/t/p.parquet", 10L, 1L,
      stats = Some("""{"numRecords":5}"""),
      dv = Some(graft.log.DvDescriptor("p", "file:/t/_dv/x.bin", Some(1), 42, 3L)))
    val inline = graft.log.AddFile("/t/q.parquet", 10L, 1L,
      dv = Some(graft.log.DvDescriptor("i",
        graft.log.RoaringBitmapArray.z85Encode(
          graft.log.RoaringBitmapArray.serialize(Array(0L, 2L, 5L))),
        None,
        graft.log.RoaringBitmapArray.serialize(Array(0L, 2L, 5L)).length, 3L)))
    Seq(onDisk, inline).foreach { add =>
      val json = graft.log.Actions.toJson(add)
      assert(json.contains("\"deletionVector\""))
      assert(graft.log.Actions.fromJson(json).contains(add))
    }
    // a DV-less add keeps the byte-identical legacy shape
    assert(!graft.log.Actions.toJson(onDisk.copy(dv = None)).contains("deletionVector"))
    val tmp = Files.createTempDirectory("dv-ckpt")
    val target = new org.apache.hadoop.fs.Path(s"$tmp/ckpt.parquet")
    val conf = spark.sparkContext.hadoopConfiguration
    graft.log.Checkpoint.write(target, conf, Seq(onDisk, inline))
    assert(graft.log.Checkpoint.read(target, conf) == Seq(onDisk, inline))
  }

  test("roaring bitmap + Z85 codec round-trips across container shapes") {
    import graft.log.RoaringBitmapArray._
    val shapes: Seq[Array[Long]] = Seq(
      Array.empty[Long],
      Array(0L),
      Array(7L, 8L, 65535L, 65536L, 131071L), // array containers, 2 keys
      (0L until 5000L).toArray, // bitmap container (card > 4096)
      (0L until 5000L).map(_ * 2).toArray, // sparse bitmap container
      Array(0L, (1L << 32) + 3, (5L << 32) + 70000), // multiple 32-bit bitmaps
      (0L until 70000L).toArray) // spans containers, mixed kinds
    shapes.foreach { pos =>
      val bytes = serialize(pos)
      assert(deserialize(bytes).toSeq == pos.toSeq, s"bitmap n=${pos.length}")
      val z = z85Encode(bytes)
      assert(z85Decode(z, bytes.length).toSeq == bytes.toSeq, s"z85 n=${pos.length}")
    }
    // deterministic: the same positions always serialize identically
    assert(serialize(Array(1L, 2L, 3L)).toSeq == serialize(Array(1L, 2L, 3L)).toSeq)
  }

  test("large MOR delete writes one on-disk sidecar; vacuum RETAIN 0 keeps it live") {
    import org.apache.spark.sql.functions.expr
    val dir = Files.createTempDirectory("dml-big").resolve("t").toString
    spark.range(3000).selectExpr("id", "id % 7 AS grp").coalesce(1)
      .write.format("gwdelta").mode("append").save(dir)
    val t = GwTable.forPath(spark, dir)
    // 1500 deleted positions -> ~3 KB array-container bitmap -> on-disk "p"
    assert(t.delete(expr("id % 2 = 0"), mergeOnRead = true) > 0)
    val dvs = t.snapshot().files.flatMap(_.dv)
    assert(dvs.nonEmpty && dvs.forall(_.isOnDisk),
      s"1500 positions must spill to a sidecar, got $dvs")
    assert(dvs.forall(_.cardinality == 1500L))
    val sidecar = new org.apache.hadoop.fs.Path(dvs.head.pathOrInlineDv)
    val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(sidecar))
    // the ADVICE regression: vacuum's debris sweep compares fully-qualified
    // listing paths against descriptor paths — a LIVE sidecar past the
    // debris age floor must never be reaped. RETAIN 0 HOURS exercises the
    // tombstone path; the age floor shields the sidecar from the debris
    // path, and the uriKey-normalized referenced-set keeps it shielded
    // even when the floor passes (simulated by backdating the mtime)
    fs.setTimes(sidecar, System.currentTimeMillis() - 16L * 60 * 1000, -1)
    GwTable.withRetentionCheckDisabled(spark)(t.vacuum(retentionMs = 0L))
    assert(fs.exists(sidecar), "vacuum deleted a LIVE table's DV sidecar")
    assert(t.toDF.count() == 1500)
    assert(t.toDF.filter(expr("id % 2 = 0")).count() == 0)
    // an UNREFERENCED stale sidecar (crash debris) past the floor IS reaped
    val debris = new org.apache.hadoop.fs.Path(sidecar.getParent, "debris.bin")
    val out = fs.create(debris); out.write(1); out.close()
    fs.setTimes(debris, System.currentTimeMillis() - 16L * 60 * 1000, -1)
    GwTable.withRetentionCheckDisabled(spark)(t.vacuum(retentionMs = 0L))
    assert(!fs.exists(debris), "crash-debris sidecar must be reclaimed")
    assert(fs.exists(sidecar))
  }

  test("MOR scan planning never materializes DV positions driver-side") {
    import org.apache.spark.sql.functions.expr
    val dir = Files.createTempDirectory("dml-plan").resolve("t").toString
    spark.range(3000).selectExpr("id", "id % 7 AS grp").coalesce(1)
      .write.format("gwdelta").mode("append").save(dir)
    val t = GwTable.forPath(spark, dir)
    assert(t.delete(expr("id % 2 = 0"), mergeOnRead = true) > 0)
    val sidecars = t.snapshot().files.flatMap(_.dv)
      .filter(_.isOnDisk).map(_.pathOrInlineDv).distinct
    assert(sidecars.size == 1, s"expected one on-disk sidecar, got $sidecars")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // hide the sidecar: planning must still succeed (descriptors only);
    // only EXECUTION — the task-side bitmap decode — may touch its bytes
    val p = new org.apache.hadoop.fs.Path(sidecars.head)
    val hidden = new org.apache.hadoop.fs.Path(p.getParent, s".hidden-${p.getName}")
    assert(fs.rename(p, hidden))
    try {
      val df = t.toDF.filter(expr("id >= 0"))
      df.queryExecution.executedPlan // plan fully (scan construction included)
      intercept[Exception] { df.collect() } // decode happens task-side
    } finally fs.rename(hidden, p)
    assert(t.toDF.count() == 1500)
    // a second delete UNIONS into the bitmap (1500 + 1 positions)
    assert(t.delete(expr("id = 1"), mergeOnRead = true) > 0)
    assert(t.snapshot().files.flatMap(_.dv).exists(_.cardinality == 1501L))
    assert(t.toDF.count() == 1499)
  }

  private def withMor[A](body: => A): A = {
    spark.conf.set("spark.graft.mergeOnRead", "true")
    try body finally spark.conf.unset("spark.graft.mergeOnRead")
  }

  test("SQL UPDATE under mergeOnRead: delta op grows DVs, untouched rows never move") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val (dir, t) = twoRangeTable()
    val ns = s"dml${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    val before = t.snapshot().files.map(_.path)
    val preUpdate = t.snapshot().version
    withMor {
      spark.sql(s"UPDATE gw.$ns.nation SET n_name = concat('X_', n_name) " +
        "WHERE n_nationkey < 5")
    }
    val after = t.snapshot().files
    // BOTH original files stay live: A re-asserted with a DV, B untouched
    assert(before.forall(p => after.exists(_.path == p)),
      "merge-on-read UPDATE must not replace any original file")
    val dvd = after.filter(_.dv.isDefined)
    assert(dvd.map(_.path) == Seq(before.head),
      "exactly the matching file must carry a deletion vector")
    assert(dvd.head.dv.get.cardinality == 5L)
    assert(after.filter(_.dv.isEmpty).exists(_.path.contains("/_dml/")),
      "the 5 updated rows must land in a fresh _dml file")
    val out = spark.table(s"gw.$ns.nation")
    assert(out.filter(col("n_nationkey") < 5 && !col("n_name").startsWith("X_")).count() == 0)
    assert(out.filter(col("n_nationkey") >= 5 && col("n_name").startsWith("X_")).count() == 0)
    assert(out.count() == rows(spark.read.parquet(s"$sf/nation.parquet")))
    assert(spark.sql(s"SELECT * FROM gw.$ns.nation VERSION AS OF $preUpdate")
      .filter(col("n_name").startsWith("X_")).count() == 0)
    // a second MOR UPDATE on the same file UNIONS into the existing DV
    withMor {
      spark.sql(s"UPDATE gw.$ns.nation SET n_name = concat('Y_', n_name) " +
        "WHERE n_nationkey = 5")
    }
    assert(t.snapshot().files.flatMap(_.dv).exists(_.cardinality == 6L))
    assert(spark.table(s"gw.$ns.nation").filter(col("n_name").startsWith("Y_"))
      .count() == 1)
  }

  test("delta scan stats-prunes candidates: only the matching file is planned") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val (dir, _) = twoRangeTable()
    val ns = s"dml${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    val scans = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        qe.executedPlan.foreach {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            scans.add(b.scan.description()); ()
          case _ => ()
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try withMor {
      // strictly inside file A (min 0..11); file B (min 12) must stats-prune
      spark.sql(s"UPDATE gw.$ns.nation SET n_name = concat('X_', n_name) " +
        "WHERE n_nationkey < 5")
      // listener delivery is async on the listener bus; poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!scans.toArray.exists(_.toString.contains("GwRowIdScan")) &&
        System.nanoTime() < deadline) Thread.sleep(50)
      val rowIdScans = scans.toArray.map(_.toString).filter(_.contains("GwRowIdScan"))
      assert(rowIdScans.nonEmpty, s"expected a row-id scan in the DML plan: $scans")
      assert(rowIdScans.exists(_.contains("files=1")),
        s"stats pruning must plan exactly the matching file: $rowIdScans")
    } finally spark.listenerManager.unregister(listener)
  }

  test("SQL MERGE INTO under mergeOnRead: matched rows via DV, inserts appended") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val (dir, t) = twoRangeTable()
    val ns = s"dml${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    val before = t.snapshot().files.map(_.path)
    val n = spark.read.parquet(s"$sf/nation.parquet")
    n.filter(col("n_nationkey") < 5)
      .withColumn("n_name", lit("MERGED"))
      .unionAll(n.filter(col("n_nationkey") >= 20)
        .withColumn("n_nationkey", col("n_nationkey") + 1000))
      .createOrReplaceTempView(s"${ns}_src")
    withMor {
      spark.sql(s"""MERGE INTO gw.$ns.nation t USING ${ns}_src s
        ON t.n_nationkey = s.n_nationkey
        WHEN MATCHED THEN UPDATE SET n_name = s.n_name
        WHEN NOT MATCHED THEN INSERT *""")
    }
    val after = t.snapshot().files
    assert(before.forall(p => after.exists(_.path == p)),
      "merge-on-read MERGE must not replace any original file")
    assert(after.filter(_.dv.isDefined).map(_.path) == Seq(before.head))
    val out = spark.table(s"gw.$ns.nation")
    assert(out.filter(col("n_name") === "MERGED").count() == 5)
    assert(out.filter(col("n_nationkey") >= 1000).count() ==
      rows(n.filter(col("n_nationkey") >= 20)))
    assert(out.count() == rows(n) + rows(n.filter(col("n_nationkey") >= 20)))
  }

  test("SQL DELETE (untranslatable predicate) under mergeOnRead takes the delta path") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val (dir, t) = twoRangeTable()
    val ns = s"dml${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    val before = t.snapshot().files.map(_.path)
    // modulo has no V1 translation -> row-level rewrite -> delta op under MOR
    withMor { spark.sql(s"DELETE FROM gw.$ns.nation WHERE n_nationkey % 2 = 0") }
    val after = t.snapshot().files
    assert(before.forall(p => after.exists(_.path == p)),
      "merge-on-read DELETE must keep every original file live")
    assert(after.forall(_.dv.isDefined), "both files lose even keys -> both get DVs")
    assert(!after.exists(_.path.contains("/_dml/")),
      "a pure delete writes no replacement rows")
    val out = spark.table(s"gw.$ns.nation")
    assert(out.filter(col("n_nationkey") % 2 === 0).count() == 0)
    assert(out.count() ==
      rows(spark.read.parquet(s"$sf/nation.parquet").filter(col("n_nationkey") % 2 =!= 0)))
  }

  test("row-identity metadata columns: provenance SELECT, DV'd positions excluded") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val (dir, t) = twoRangeTable()
    val ns = s"dml${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    val prov = spark.sql(
      s"SELECT __gw_file, __gw_pos, n_nationkey FROM gw.$ns.nation")
    assert(prov.count() == rows(spark.read.parquet(s"$sf/nation.parquet")))
    assert(prov.select("__gw_file").distinct().count() == 2)
    // (file, pos) is unique — it IS the row identity
    assert(prov.select("__gw_file", "__gw_pos").distinct().count() == prov.count())
    // filters still apply above the filter-free row-id scan
    assert(spark.sql(s"SELECT __gw_pos FROM gw.$ns.nation WHERE n_nationkey = 3")
      .count() == 1)
    // after a MOR delete, deleted positions vanish but survivors keep theirs
    val posBefore = prov.filter(col("n_nationkey") === 7)
      .select("__gw_file", "__gw_pos").collect().head
    assert(t.delete(col("n_nationkey") < 5, mergeOnRead = true) > 0)
    val provAfter = spark.sql(
      s"SELECT __gw_file, __gw_pos, n_nationkey FROM gw.$ns.nation")
    assert(provAfter.count() == prov.count() - 5)
    val posAfter = provAfter.filter(col("n_nationkey") === 7)
      .select("__gw_file", "__gw_pos").collect().head
    assert(posAfter == posBefore,
      "surviving rows keep their file-absolute identity under a DV")
  }

  test("table_changes TVF serves the batch change feed from SQL") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    GraftExtensions.register(spark)
    val (dir, t) = twoRangeTable()
    val ns = s"dml${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    val v0 = t.snapshot().version
    spark.sql(s"DELETE FROM gw.$ns.nation WHERE n_nationkey < 12")
    // by catalog identifier AND by path — both resolve to the same feed
    val byIdent = spark.sql(
      s"SELECT n_nationkey, _change_type, _commit_version " +
        s"FROM table_changes('gw.$ns.nation', $v0)")
    val byPath = spark.sql(
      s"SELECT n_nationkey, _change_type, _commit_version " +
        s"FROM table_changes('$dir', $v0)")
    val expected = t.rowChanges(v0)
      .select("n_nationkey", "_change_type", "_commit_version")
    def canon(df: DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(canon(byIdent).sameElements(canon(expected)))
    assert(canon(byPath).sameElements(canon(expected)))
    assert(byIdent.filter(col("_change_type") === "delete").count() == 12)
    // the TVF composes with ordinary SQL (aggregation over the feed)
    val agg = spark.sql(
      s"SELECT _change_type, count(*) AS n FROM table_changes('$dir', $v0) " +
        "GROUP BY 1").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == Map("delete" -> 12L))
  }

  test("CHECK constraints: SQL-null passes, overwrite enforced, multi-constraint names") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val ns = s"ck${System.nanoTime()}"
    val dir = Files.createTempDirectory("ck").resolve("t").toString
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.t (k INT, v STRING) USING gwdelta LOCATION '$dir'")
    // seed with a null so the bootstrapped log schema keeps k nullable
    spark.sql(s"INSERT INTO gw.$ns.t SELECT * FROM VALUES (1, 'a'), (CAST(null AS INT), 'seed') AS s(k, v)")
    spark.sql(s"ALTER TABLE gw.$ns.t SET TBLPROPERTIES (" +
      "'graft.constraints.pos' = 'k > 0', " +
      "'graft.constraints.named' = \"v != 'forbidden'\")")
    // SQL-standard CHECK: NULL constraint result passes (k null -> null > 0)
    spark.sql(s"INSERT INTO gw.$ns.t VALUES (null, 'nullk')")
    // each constraint rejects under its own name
    def failing(sqlText: String): String = {
      val e = intercept[Exception](spark.sql(sqlText))
      e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    }
    assert(failing(s"INSERT INTO gw.$ns.t VALUES (0, 'z')")
      .contains("CHECK constraint pos"))
    assert(failing(s"INSERT INTO gw.$ns.t VALUES (5, 'forbidden')")
      .contains("CHECK constraint named"))
    // INSERT OVERWRITE takes the same guard
    assert(failing(s"INSERT OVERWRITE gw.$ns.t VALUES (-3, 'x')")
      .contains("CHECK constraint pos"))
    // valid overwrite still works and the state is exactly what passed
    spark.sql(s"INSERT OVERWRITE gw.$ns.t VALUES (7, 'ok')")
    val fin = spark.table(s"gw.$ns.t").collect().map(r => (r.get(0), r.getString(1)))
    assert(fin.toSet == Set((7, "ok")))
  }

  test("deep clone copies on-disk DV sidecars and survives source deletion") {
    val tmp = Files.createTempDirectory("deepclone")
    val srcDir = tmp.resolve("src").toString
    // one big file + a scattered MOR delete large enough to force the
    // on-disk sidecar branch (inline cap is 512 bytes)
    spark.read.parquet(s"$sf/lineitem.parquet").coalesce(1)
      .write.format("gwdelta").mode("append").save(srcDir)
    val t = GwTable.forPath(spark, srcDir)
    assert(t.delete(col("l_orderkey") % 2 === 0, mergeOnRead = true) > 0)
    val dvs = t.snapshot().files.flatMap(_.dv)
    assert(dvs.nonEmpty && dvs.forall(_.isOnDisk),
      s"expected an on-disk DV sidecar, got $dvs")
    val expect = t.toDF.count()
    val cloneDir = tmp.resolve("copy").toString
    assert(t.deepCloneTo(cloneDir) == 0L)
    val clone = GwTable.forPath(spark, cloneDir)
    val cSnap = clone.snapshot()
    val cKey = GwTable.uriKey(new org.apache.hadoop.fs.Path(cloneDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(new org.apache.hadoop.fs.Path(cloneDir)).toString)
    assert(cSnap.files.forall(f => GwTable.uriKey(f.path).startsWith(cKey)))
    val cdvs = cSnap.files.flatMap(_.dv)
    assert(cdvs.nonEmpty && cdvs.forall(d =>
      d.isOnDisk && GwTable.uriKey(d.pathOrInlineDv).startsWith(cKey)),
      "clone DV descriptors must point into the clone's own _dv/")
    assert(clone.toDF.count() == expect)
    // obliterate the source tree entirely: the clone must not notice
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(srcDir))
    assert(GwTable.forPath(spark, cloneDir).toDF.count() == expect)
    // the clone evolves independently after the source is gone
    assert(clone.delete(col("l_orderkey") % 4 === 1, mergeOnRead = true) > 0)
    assert(clone.toDF.count() < expect)
  }

  test("replaceWhere: straddling files rewrite, empty batch deletes the window") {
    import org.apache.spark.sql.functions.{concat, lit => flit}
    val (_, t) = twoRangeTable()
    // replace keys [6, 18) with renamed rows: BOTH files straddle
    val repl = spark.read.parquet(s"$sf/nation.parquet")
      .filter(col("n_nationkey") >= 6 && col("n_nationkey") < 18)
      .withColumn("n_name", concat(flit("NEW_"), col("n_name")))
    assert(t.replaceWhere(repl,
      col("n_nationkey") >= 6 && col("n_nationkey") < 18) > 0)
    val names = t.toDF.collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(names.size == 25)
    assert((6 until 18).forall(k => names(k).startsWith("NEW_")))
    assert(((0 until 6) ++ (18 until 25)).forall(k => !names(k).startsWith("NEW_")))
    // empty batch = predicate-scoped delete through the same surface
    val empty = t.toDF.filter(flit(false))
    assert(t.replaceWhere(empty, col("n_nationkey") >= 20) > 0)
    assert(t.toDF.count() == 20)
    // out-of-window rows refused, nothing committed
    val v = t.snapshot().version
    intercept[IllegalArgumentException](
      t.replaceWhere(t.toDF.limit(5), col("n_nationkey") < 0))
    assert(t.snapshot().version == v)
  }

  test("setColumnDefault guards: foldable, castable, known column") {
    val (_, t) = twoRangeTable()
    // valid: literal castable to the column type, then dropped again
    assert(t.setColumnDefault("n_name", Some("'unknown'")) > 0)
    assert(t.snapshot().schema("n_name").metadata
      .getString("CURRENT_DEFAULT") == "'unknown'")
    assert(t.setColumnDefault("n_name", None) > 0)
    assert(!t.snapshot().schema("n_name").metadata.contains("CURRENT_DEFAULT"))
    // non-foldable expressions and impossible casts die before the commit
    intercept[IllegalArgumentException](
      t.setColumnDefault("n_name", Some("rand()")))
    intercept[IllegalArgumentException](
      t.setColumnDefault("n_regionkey", Some("'not-a-number'")))
    intercept[IllegalArgumentException](
      t.setColumnDefault("nope", Some("1")))
    val v = t.snapshot().version
    intercept[IllegalArgumentException](
      t.setColumnDefault("n_name", Some("rand()")))
    assert(t.snapshot().version == v, "failed validations must not commit")
  }
}
