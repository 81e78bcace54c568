package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Metadata-only stats backfill ([[GwTable.computeStats]] / `ANALYZE
  * TABLE ... COMPUTE DELTA STATISTICS`): rebase semantics under
  * merge-on-read state, FOR ALL FILES, idempotence, and the
  * column-mapping refusal. The end-to-end prune-after-backfill lifecycle
  * is gate gw70. */
class StatsBackfillSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def freshNoStats(): (String, GwTable) = {
    val loc = Files.createTempDirectory("backfill").resolve("t").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
      .repartitionByRange(4, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
    graft.streaming.GwSink.append(li, loc,
      bootstrapProps = Map("graft.stats.numIndexedCols" -> "0"))
    (loc, GwTable.forPath(spark, loc))
  }

  test("backfill preserves deletion vectors and never resurrects deleted rows") {
    val (_, t) = freshNoStats()
    val liveBefore = t.toDF.count()
    assert(t.delete(col("l_quantity") >= 49.0, mergeOnRead = true) > 0)
    val deleted = liveBefore - t.toDF.count()
    assert(deleted > 0 && t.snapshot().files.exists(_.dv.isDefined))
    t.updateProperties(Map("graft.stats.columns" -> "l_orderkey"),
      unset = Seq("graft.stats.numIndexedCols"))
    val n = t.computeStats()
    assert(n == t.snapshot().files.size, s"all files need the backfill: $n")
    val after = t.snapshot()
    assert(after.files.exists(_.dv.isDefined),
      "the re-asserted AddFiles must keep their deletion vectors")
    assert(t.toDF.count() == liveBefore - deleted,
      "backfill must not resurrect MOR-deleted rows")
    assert(after.files.forall(_.stats.exists(_.contains("\"l_orderkey\""))),
      "every live file must carry the declared column's stats")
    // stats describe the FILE bytes (numRecords includes DV'd rows): the
    // pruning path subtracts DV cardinality elsewhere, stats stay raw
    assert(t.computeStats() == 0, "second pass finds nothing to do")
  }

  test("maxFilesPerCommit batches a large backfill into bounded commits") {
    val (_, t) = freshNoStats()
    val files = t.snapshot().files.size
    assert(files >= 4, s"fixture needs >= 4 files, got $files")
    t.updateProperties(Map("graft.stats.columns" -> "l_orderkey"),
      unset = Seq("graft.stats.numIndexedCols"))
    val v0 = t.snapshot().version
    // batch size 2: a 4-file backfill must land as ceil(4/2) = 2 commits,
    // every file refreshed exactly once, partial progress always valid
    val n = t.computeStats(maxFilesPerCommit = 2)
    assert(n == files, s"all $files files must refresh, got $n")
    val commits = t.snapshot().version - v0
    assert(commits == (files + 1) / 2,
      s"expected ${(files + 1) / 2} bounded commits, got $commits")
    assert(t.snapshot().files.forall(_.stats.exists(_.contains("l_orderkey"))),
      "every live file carries the backfilled column stats")
    // idempotence survives the batched path
    assert(t.computeStats(maxFilesPerCommit = 2) == 0)
  }

  test("FOR ALL FILES re-harvests even files whose stats are complete") {
    val (loc, t) = freshNoStats()
    t.updateProperties(Map("graft.stats.columns" -> "l_orderkey"),
      unset = Seq("graft.stats.numIndexedCols"))
    assert(t.computeStats() == t.snapshot().files.size)
    assert(t.computeStats() == 0)
    val res = spark.sql(
      s"ANALYZE TABLE '$loc' COMPUTE DELTA STATISTICS FOR ALL FILES").head()
    assert(res.getInt(1) == t.snapshot().files.size,
      "FOR ALL FILES must refresh everything regardless of need")
  }

  test("statsColumnFilter accepts the delta.* spellings; graft.* wins") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", LongType)))
    val f = graft.streaming.GwSink.statsColumnFilter _
    assert(f(Map("delta.dataSkippingStatsColumns" -> "a, c"), schema)
      .contains(Set("a", "c")))
    assert(f(Map("delta.dataSkippingNumIndexedCols" -> "2"), schema)
      .contains(Set("a", "b")))
    // graft spelling wins over delta; the explicit list wins over counts
    assert(f(Map("graft.stats.columns" -> "b",
      "delta.dataSkippingStatsColumns" -> "a"), schema).contains(Set("b")))
    assert(f(Map("graft.stats.numIndexedCols" -> "1",
      "delta.dataSkippingNumIndexedCols" -> "3"), schema).contains(Set("a")))
    assert(f(Map("delta.dataSkippingStatsColumns" -> "c",
      "delta.dataSkippingNumIndexedCols" -> "3"), schema).contains(Set("c")))
    assert(f(Map.empty, schema).isEmpty, "absent all: harvest everything")
  }

  test("a column-mapped table refuses with a typed message") {
    val loc = Files.createTempDirectory("backfillmap").resolve("t").toString
    spark.read.parquet(s"$sf/nation.parquet").write.format("gwdelta").save(loc)
    val t = GwTable.forPath(spark, loc)
    assert(t.renameColumn("n_name", "nation_name") > 0)
    val e = intercept[UnsupportedOperationException](t.computeStats())
    assert(e.getMessage.contains("column-mapped"))
  }

  test("pre-declaration files backfill; post-declaration files already pass") {
    val (loc, t) = freshNoStats()
    t.updateProperties(Map("graft.stats.columns" -> "l_orderkey"),
      unset = Seq("graft.stats.numIndexedCols"))
    // a fresh append AFTER the declaration harvests the declared column
    val oldFiles = t.snapshot().files.size
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity")).limit(100).coalesce(1)
      .write.format("gwdelta").mode("append").save(loc)
    assert(t.snapshot().files.size == oldFiles + 1)
    // only the PRE-declaration files need the backfill
    assert(t.computeStats() == oldFiles,
      "files written after the declaration must not re-harvest")
  }
}
