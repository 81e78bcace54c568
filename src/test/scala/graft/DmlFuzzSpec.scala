package graft

import org.apache.spark.sql.functions._

/** Randomized DML lifecycle fuzz: a seeded random sequence of append /
  * update / delete (copy-on-write AND merge-on-read, interleaved) / merge
  * upsert / compact / RESTORE against an in-memory row model. After every
  * operation the table must equal the model exactly, and any recorded
  * version must time-travel back to the model state that committed it —
  * the cross-operation interaction check no single-op gate can make
  * (e.g. RESTORE over a DV delete followed by a merge into the restored
  * state, or compaction between a MOR update and its reader). */
class DmlFuzzSpec extends SparkSpec {

  private def runFuzz(seed: Long, nOps: Int): Unit = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    val dir = java.nio.file.Files.createTempDirectory(s"dml-fuzz-$seed")
      .resolve("t").toString
    var model = Map.empty[Long, Long]
    var nextId = 0L

    def appendRows(k: Int): Unit = {
      val rows = (0 until k).map { _ =>
        val id = nextId; nextId += 1; (id, rng.nextInt(100).toLong)
      }
      rows.toDF("id", "v").coalesce(1)
        .write.format("gwdelta").mode("append").save(dir)
      model ++= rows
    }

    appendRows(20)
    val t = GwTable.forPath(spark, dir)
    var history = Map(t.snapshot().version -> model)

    def readAt(version: Option[Long]): Map[Long, Long] = {
      val r = version.foldLeft(spark.read.format("gwdelta"))(
        (r, v) => r.option("versionAsOf", v.toString))
      r.load(dir).select("id", "v")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    }

    def check(tag: String): Unit = {
      val got = readAt(None)
      assert(got == model,
        s"[seed=$seed $tag] table diverged from model: " +
          s"unexpected=${(got.toSet -- model.toSet).take(5)} " +
          s"missing=${(model.toSet -- got.toSet).take(5)}")
    }

    (1 to nOps).foreach { i =>
      val op = rng.nextInt(10)
      op match {
        case 0 | 1 => appendRows(1 + rng.nextInt(10))
        case 2 | 3 => // arithmetic UPDATE over a modular slice, CoW or MOR
          val m = 2 + rng.nextInt(5); val r = rng.nextInt(m)
          val c = rng.nextInt(50).toLong
          t.update(col("id") % m === r, Map("v" -> (col("v") + c)),
            mergeOnRead = rng.nextBoolean())
          model = model.map { case (id, v) =>
            if (id % m == r) (id, v + c) else (id, v) }
        case 4 | 5 => // DELETE a bounded recent slice, CoW or MOR
          val m = 2 + rng.nextInt(6); val r = rng.nextInt(m)
          val floor = math.max(0L, nextId - 40)
          t.delete(col("id") % m === r && col("id") >= floor,
            mergeOnRead = rng.nextBoolean())
          model = model.filter { case (id, _) => !(id % m == r && id >= floor) }
        case 6 => // MERGE upsert: half existing keys re-valued, half fresh
          val existing = rng.shuffle(model.keys.toList).take(3)
          val fresh = (0 until 2).map { _ => val id = nextId; nextId += 1; id }
          val rows = (existing ++ fresh).map(id => (id, rng.nextInt(100).toLong))
          if (rows.nonEmpty) {
            t.merge(rows.toDF("id", "v"), col("t.id") === col("s.id"),
              whenMatchedSet = Map("v" -> col("s.v")))
            model ++= rows
          }
        case 7 => // maintenance between DMLs: contents must not move
          t.compact()
        case 8 => // RESTORE to a random recorded version
          val vs = history.keys.toSeq.sorted
          val v = vs(rng.nextInt(vs.size))
          t.restore(v)
          model = history(v)
        case 9 => // time-travel audit of a random recorded version
          val vs = history.keys.toSeq.sorted
          val v = vs(rng.nextInt(vs.size))
          assert(readAt(Some(v)) == history(v),
            s"[seed=$seed op$i] versionAsOf $v diverged from its model")
      }
      history += (t.snapshot().version -> model)
      check(s"op$i(kind=$op)")
    }
    // lifecycle close: checkpoint + metadata cleanup must replay the same
    // table; a fresh log sees identical contents
    t.log.writeCheckpoint(t.snapshot().version)
    assert(t.cleanupMetadata(retentionMs = 0L) >= 0)
    check("post-checkpoint-cleanup")
  }

  test("randomized DML lifecycle matches the model (seed 1)") {
    runFuzz(seed = 1L, nOps = 18)
  }

  test("randomized DML lifecycle matches the model (seed 2)") {
    runFuzz(seed = 2L, nOps = 18)
  }
}
