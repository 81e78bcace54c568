package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, concat, lit}

/** Change-data files (Delta CDF `delta.enableChangeDataFeed` parity):
  * DML on a CDF-enabled table persists its row-level changes under
  * `_change_data/` with `cdc` log actions; both change-feed faces
  * (batch `rowChanges`, streaming `readChangeFeed`) serve them directly,
  * so rewrite and deletion-vector commits stream. gw43 covers the API
  * UPDATE/DELETE faces end to end; this suite pins the SQL paths, the
  * action round trip, and the vacuum lifetime. */
class CdcSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Two-file nation table with CDF enabled (property commit = v2). */
  private def cdfTable(): (String, GwTable) = {
    val dir = Files.createTempDirectory("cdc").resolve("nation").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
    src.filter(col("n_nationkey") < 12).coalesce(1)
      .write.format("gwdelta").mode("append").save(dir)
    src.filter(col("n_nationkey") >= 12).coalesce(1)
      .write.format("gwdelta").mode("append").save(dir)
    val t = GwTable.forPath(spark, dir)
    assert(t.updateProperties(Map("graft.enableChangeDataFeed" -> "true")) == 2L)
    (dir, t)
  }

  private def drainCdf(dir: String): DataFrame = {
    val name = s"cdc_${System.nanoTime()}"
    val q = spark.readStream.format("gwdelta")
      .option("readChangeFeed", "true")
      .option("startingVersion", "3") // past the bootstrap + property commits
      .load(dir)
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  test("cdc action JSON round trip") {
    val c = graft.log.CdcFile("_change_data/ab/part-0.parquet", 1234L)
    val json = graft.log.Actions.toJson(c)
    assert(json.contains("\"cdc\"") && json.contains("\"dataChange\":false"))
    assert(graft.log.Actions.fromJson(json).contains(c))
  }

  test("SQL UPDATE (group rewrite) writes derived cdc; the CDF stream serves it") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val (dir, t) = cdfTable()
    val ns = s"cdc${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    spark.sql(s"UPDATE gw.$ns.nation SET n_name = concat('X_', n_name) " +
      "WHERE n_nationkey < 3")
    val v = t.snapshot().version
    val cdcs = t.log.readVersion(v).collect { case c: graft.log.CdcFile => c }
    assert(cdcs.nonEmpty, "SQL UPDATE on a CDF table must log cdc actions")
    // group-based rewrites derive NET changes: delete + insert pairs for
    // exactly the updated rows (unchanged survivors cancel out)
    val feed = t.rowChanges(2).filter(col("_commit_version") === v)
    val dels = feed.filter(col("_change_type") === "delete")
    val ins = feed.filter(col("_change_type") === "insert")
    assert(dels.count() == 3 && ins.count() == 3)
    assert(ins.select("n_name").collect().map(_.getString(0)).forall(_.startsWith("X_")))
    // the previously-unstreamable rewrite commit now streams
    val streamed = drainCdf(dir).filter(col("_commit_version") === v)
    assert(streamed.count() == 6)
  }

  test("SQL merge-on-read UPDATE (SupportsDelta) writes derived cdc and streams") {
    graft.operators.GwCore.ensureGwCatalog(spark)
    val (dir, t) = cdfTable()
    val ns = s"cdc${System.nanoTime()}"
    spark.sql(s"CREATE NAMESPACE gw.$ns")
    spark.sql(s"CREATE TABLE gw.$ns.nation USING gwdelta LOCATION '$dir'")
    spark.conf.set("spark.graft.mergeOnRead", "true")
    try spark.sql(s"UPDATE gw.$ns.nation SET n_name = 'MOR' WHERE n_nationkey IN (1, 13)")
    finally spark.conf.unset("spark.graft.mergeOnRead")
    val v = t.snapshot().version
    assert(t.snapshot().files.exists(_.dv.isDefined),
      "merge-on-read UPDATE must leave deletion vectors")
    val feed = t.rowChanges(2).filter(col("_commit_version") === v)
    assert(feed.filter(col("_change_type") === "delete").count() == 2)
    val ins = feed.filter(col("_change_type") === "insert")
    assert(ins.count() == 2 &&
      ins.select("n_name").collect().forall(_.getString(0) == "MOR"))
    // a DV commit previously stopped readChangeFeed; cdc files make it stream
    val streamed = drainCdf(dir).filter(col("_commit_version") === v)
    assert(streamed.count() == 4)
  }

  test("API MERGE on a CDF table: pre/post images for matches, insert rows") {
    val (_, t) = cdfTable()
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    // one matching source row (key 2, renamed) + one not-matched (key 99)
    val source = nation.filter(col("n_nationkey") === 2)
      .withColumn("n_name", lit("UPD"))
      .union(nation.filter(col("n_nationkey") === 3)
        .withColumn("n_nationkey", lit(99)))
    val v = t.merge(source, col("t.n_nationkey") === col("s.n_nationkey"),
      whenMatchedSet = Map("n_name" -> col("s.n_name")))
    assert(v == 3L)
    val feed = t.rowChanges(2)
    assert(feed.filter(col("_change_type") === "update_preimage").count() == 1)
    val post = feed.filter(col("_change_type") === "update_postimage")
    assert(post.count() == 1 && post.select("n_name").head.getString(0) == "UPD")
    val ins = feed.filter(col("_change_type") === "insert")
    assert(ins.count() == 1 &&
      ins.select("n_nationkey").head.getAs[Number](0).intValue == 99)
  }

  test("vacuum keeps committed cdc files, sweeps uncommitted cdc debris") {
    val (dir, t) = cdfTable()
    assert(t.delete(col("n_nationkey") === 5) > 0)
    val conf = spark.sparkContext.hadoopConfiguration
    val cdcDir = new org.apache.hadoop.fs.Path(dir, "_change_data")
    val fs = cdcDir.getFileSystem(conf)
    def cdcFiles(): Seq[String] = {
      val it = fs.listFiles(cdcDir, true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && s.getPath.getName.endsWith(".parquet")) b += s.getPath.toString
      }
      b.result()
    }
    val committed = cdcFiles()
    assert(committed.nonEmpty)
    // plant debris: an uncommitted cdc file, aged past the floor
    val debris = new org.apache.hadoop.fs.Path(cdcDir, "debris/part-0.parquet")
    fs.mkdirs(debris.getParent)
    val out = fs.create(debris)
    out.write(Array[Byte](1, 2, 3)); out.close()
    fs.setTimes(debris, System.currentTimeMillis() - 48L * 3600 * 1000, -1)
    val reclaimed = GwTable.withRetentionCheckDisabled(spark) {
      t.vacuum(retentionMs = 0L)
    }
    assert(reclaimed >= 1)
    val after = cdcFiles()
    assert(!after.exists(_.contains("debris")), "uncommitted cdc debris must be swept")
    committed.foreach(p => assert(after.contains(p),
      "committed cdc files must survive vacuum (the log still serves their version)"))
    // and the feed still reads after the vacuum
    assert(t.rowChanges(2).count() == 1)
  }

  test("property-only metadata restatements pass through rowChanges") {
    val (_, t) = cdfTable()
    assert(t.delete(col("n_nationkey") === 7) == 3L)
    // another property commit INSIDE the consumed range
    assert(t.updateProperties(Map("graft.someTag" -> "x")) == 4L)
    assert(t.delete(col("n_nationkey") === 8) == 5L)
    assert(t.rowChanges(2).filter(col("_change_type") === "delete").count() == 2)
    // a real schema change still stops the feed
    t.addColumns(org.apache.spark.sql.types.StructField("extra",
      org.apache.spark.sql.types.StringType))
    val e = intercept[IllegalStateException](t.rowChanges(2).count())
    assert(e.getMessage.contains("schema change"))
  }
}
