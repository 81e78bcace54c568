package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import graft.log.{Actions, AddFile}

/** Row tracking ([[graft.log.GwLog]] id assignment + the `__gw_row_id`
  * metadata column): action round trips, high-water monotonicity (deleted
  * ids never reused), stability under merge-on-read DML, fresh ids under
  * copy-on-write maintenance, and the untracked-table refusal. */
class RowTrackingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def trackedTable(): (String, GwTable) = {
    val dir = Files.createTempDirectory("rowtrack").resolve("nation").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
      .orderBy("n_nationkey").coalesce(1)
    graft.streaming.GwSink.append(src, dir,
      bootstrapProps = Map("graft.enableRowTracking" -> "true"))
    (dir, GwTable.forPath(spark, dir))
  }

  private def ids(dir: String): Map[Int, Long] =
    spark.read.format("gwdelta").load(dir)
      .select("n_nationkey", "__gw_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("AddFile row-id fields round-trip JSON and checkpoint parquet") {
    val a = AddFile("f.parquet", 10L, 5L, dataChange = true,
      stats = Some("""{"numRecords":3}"""),
      baseRowId = Some(42L), defaultRowCommitVersion = Some(7L))
    val json = Actions.toJson(a)
    assert(json.contains("\"baseRowId\":42"))
    assert(Actions.fromJson(json).contains(a))
    // plain adds stay byte-free of row-id keys (golden-file parity)
    val plain = AddFile("g.parquet", 1L, 1L)
    assert(!Actions.toJson(plain).contains("RowId"))
    // checkpoint parquet round trip
    val tmp = Files.createTempDirectory("ckpt")
    val target = new org.apache.hadoop.fs.Path(tmp.toString, "c.parquet")
    val conf = spark.sparkContext.hadoopConfiguration
    graft.log.Checkpoint.write(target, conf, Seq(a, plain))
    assert(graft.log.Checkpoint.read(target, conf) == Seq(a, plain))
  }

  test("high-water is monotone: deleted ids are never reused") {
    val dir = Files.createTempDirectory("rowtrack").resolve("nation").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
    // two files: [0,20) ids 0..19, [20,25) ids 20..24 — so the delete
    // below is a FULL-file metadata drop, not a survivor rewrite
    graft.streaming.GwSink.append(
      src.filter(col("n_nationkey") < 20).orderBy("n_nationkey").coalesce(1),
      dir, bootstrapProps = Map("graft.enableRowTracking" -> "true"))
    graft.streaming.GwSink.append(
      src.filter(col("n_nationkey") >= 20).orderBy("n_nationkey").coalesce(1), dir)
    val t = GwTable.forPath(spark, dir)
    def pairs(): Set[(Int, Long)] =
      spark.read.format("gwdelta").load(dir)
        .select("n_nationkey", "__gw_row_id").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toSet
    val before = pairs()
    assert(before.map(_._2) == (0L until 25L).toSet)
    assert(t.delete(col("n_nationkey") >= 20) > 0)
    graft.streaming.GwSink.append(
      spark.read.parquet(s"$sf/nation.parquet")
        .filter(col("n_nationkey") < 3).orderBy("n_nationkey").coalesce(1), dir)
    val after = pairs()
    // survivors keep ids; the re-added keys (now duplicated) get ids ABOVE
    // the high-water, never the freed 20..24 range
    assert(before.filter(_._1 < 20).subsetOf(after),
      "surviving rows must keep their ids")
    assert(after.map(_._2).intersect((20L until 25L).toSet).isEmpty,
      s"freed ids must not be reused: $after")
    assert((after -- before).forall(_._2 >= 25L),
      "fresh rows allocate beyond the high-water mark")
  }

  test("MOR update keeps unmatched ids; CoW compaction mints fresh unique ids") {
    val (dir, t) = trackedTable()
    val before = ids(dir)
    // MOR update moves matched rows to a new file (fresh ids there), but
    // unmatched rows' files only grow bitmaps — their ids must hold
    assert(t.update(col("n_nationkey") < 5,
      Map("n_name" -> org.apache.spark.sql.functions.lit("X")),
      mergeOnRead = true) > 0)
    val after = ids(dir)
    (5 until 25).foreach(k => assert(after(k) == before(k),
      s"unmatched key $k id moved: ${before(k)} -> ${after(k)}"))
    (0 until 5).foreach(k => assert(after(k) >= 25L,
      "updated rows live in a new file and carry fresh ids"))
    // compaction rewrites files: ids refresh but stay unique; content holds
    assert(t.compact(targetFileBytes = 1L << 30) > 0)
    val compacted = ids(dir)
    assert(compacted.keySet == after.keySet)
    assert(compacted.values.toSet.size == compacted.size, "ids stay unique")
  }

  test("concurrent appends on a tracked table allocate disjoint id ranges") {
    val (dir, _) = trackedTable() // ids 0..24 committed
    val src = spark.read.parquet(s"$sf/nation.parquet")
      .orderBy("n_nationkey").coalesce(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { _ =>
      new Thread(() =>
        try graft.streaming.GwSink.append(src, dir)
        catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent appends failed: ${errs.toArray.toSeq}")
    // a losing racer re-assigns from the winner's advanced mark, so the
    // five commits' ranges tile 0..124 with no overlap and no gap
    val allIds = spark.read.format("gwdelta").load(dir)
      .select("__gw_row_id").collect().map(_.getLong(0))
    assert(allIds.length == 125)
    assert(allIds.toSet == (0L until 125L).toSet,
      s"expected a perfect tiling, got ${allIds.sorted.take(30).toSeq}...")
  }

  test("RESTORE keeps the high-water mark monotone: no id reuse after rewind") {
    val (dir, t) = trackedTable() // ids 0..24 at v0
    val v0 = t.snapshot().version
    val src = spark.read.parquet(s"$sf/nation.parquet")
      .orderBy("n_nationkey").coalesce(1)
    graft.streaming.GwSink.append(src, dir) // ids 25..49 at v1
    assert(t.restore(v0) > 0)
    // restating the TARGET metadata verbatim would rewind the mark to 24
    // and the next append would re-issue 25..49 — ids already bound to
    // v1's rows, visible through time travel. The mark must carry forward.
    val hw = t.snapshot().metadata.get
      .configuration("graft.rowTracking.highWaterMark").toLong
    assert(hw == 49L, s"high-water must survive RESTORE, got $hw")
    graft.streaming.GwSink.append(src, dir)
    val fresh = spark.read.format("gwdelta").load(dir)
      .select("__gw_row_id").collect().map(_.getLong(0)).toSet
    assert(fresh == (0L until 25L).toSet ++ (50L until 75L).toSet,
      s"post-restore appends must allocate ABOVE the pre-restore mark: " +
        s"${fresh.toSeq.sorted.mkString(",")}")
  }

  test("untracked tables refuse __gw_row_id with guidance") {
    val dir = Files.createTempDirectory("untracked").resolve("nation").toString
    spark.read.parquet(s"$sf/nation.parquet").coalesce(1)
      .write.format("gwdelta").mode("append").save(dir)
    val e = intercept[Exception](
      spark.read.format("gwdelta").load(dir).select("__gw_row_id").collect())
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + msgs(t.getCause)
    assert(msgs(e).contains("enableRowTracking"))
  }
}
