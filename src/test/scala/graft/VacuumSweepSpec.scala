package graft

import org.apache.hadoop.fs.Path
import java.nio.file.Files

/** The vacuum sweep helpers at BOTH scales: below `VacuumDistributeMin`
  * the sweep is a driver loop, at or above it the listing/deletes ship to
  * executors — same results either side of the threshold (the 100 TB
  * contract: a distributed vacuum must reap exactly what the driver loop
  * would). */
class VacuumSweepSpec extends SparkSpec {

  private def hconf = spark.sparkContext.hadoopConfiguration

  test("sweepPaths: distributed deletes reap exactly the existing candidates") {
    val dir = Files.createTempDirectory("sweep-paths")
    val n = GwTable.VacuumDistributeMin + 44 // force the distributed path
    val existing = (0 until n).map { i =>
      val f = dir.resolve(s"part-$i.parquet")
      Files.write(f, Array[Byte](1, 2, 3))
      f.toString
    }
    val phantom = (0 until 50).map(i => dir.resolve(s"gone-$i.parquet").toString)
    val cands = scala.util.Random.shuffle(existing ++ phantom)
    // dry run: reports the existing ones, touches nothing
    val dry = GwTable.sweepPaths(spark, hconf, cands, dryRun = true)
    assert(dry.map(p => new Path(p).getName).toSet ==
      existing.map(p => new Path(p).getName).toSet)
    assert(existing.forall(p => Files.exists(java.nio.file.Paths.get(p))),
      "dry run must not delete")
    // real run: deletes exactly those, phantoms are skipped silently
    val swept = GwTable.sweepPaths(spark, hconf, cands, dryRun = false)
    assert(swept.size == n)
    assert(existing.forall(p => !Files.exists(java.nio.file.Paths.get(p))),
      "distributed sweep must delete every candidate")
  }

  test("sweepPaths: the driver loop below the threshold agrees") {
    val dir = Files.createTempDirectory("sweep-few")
    val fs = (0 until 5).map { i =>
      val f = dir.resolve(s"part-$i.parquet")
      Files.write(f, Array[Byte](7))
      f.toString
    }
    val swept = GwTable.sweepPaths(spark, hconf, fs, dryRun = false)
    assert(swept.size == 5 &&
      fs.forall(p => !Files.exists(java.nio.file.Paths.get(p))))
  }

  test("sweepDebris: sharded distributed listing keeps referenced and young files") {
    val root = Files.createTempDirectory("sweep-debris")
    val nShards = GwTable.VacuumDistributeMin + 10 // force distribution
    val old = System.currentTimeMillis() - 3600_000L
    val fsys = new Path(root.toString).getFileSystem(hconf)
    var keep = Set.empty[String]
    val expectReaped = Seq.newBuilder[String]
    (0 until nShards).foreach { i =>
      val shard = root.resolve(f"shard-$i%04d")
      Files.createDirectories(shard)
      val f = shard.resolve(s"data-$i.parquet")
      Files.write(f, Array[Byte](9))
      fsys.setTimes(new Path(f.toString), old, -1)
      i % 3 match {
        case 0 => keep += GwTable.uriKey(f.toString) // referenced: survives
        case 1 => // old + unreferenced: reaped
          expectReaped += f.getFileName.toString
        case 2 => // young + unreferenced: survives the age floor
          fsys.setTimes(new Path(f.toString), System.currentTimeMillis(), -1)
      }
      // non-data names never reaped regardless of age
      val marker = shard.resolve("_SUCCESS")
      Files.write(marker, Array[Byte](0))
      fsys.setTimes(new Path(marker.toString), old, -1)
    }
    val shards = (0 until nShards)
      .map(i => root.resolve(f"shard-$i%04d").toString)
    val floor = System.currentTimeMillis() - GwTable.DebrisMinAgeMs
    val reaped = GwTable.sweepDebris(spark, hconf, shards, keep, floor,
      dryRun = false)
    assert(reaped.map(p => new Path(p).getName).toSet ==
      expectReaped.result().toSet,
      s"distributed debris sweep reaped the wrong set")
    // survivors are intact on disk
    (0 until nShards).foreach { i =>
      val f = root.resolve(f"shard-$i%04d").resolve(s"data-$i.parquet")
      if (i % 3 == 1) assert(!Files.exists(f)) else assert(Files.exists(f))
    }
  }
}
