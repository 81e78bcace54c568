package graft

import graft.log._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/**
 * M1 exit tests: replay of the reference's golden delta logs
 * (/root/reference/src/test/resources/delta, mirrored in test resources)
 * and byte-level JSON round-trips.
 */
class LogSpec extends AnyFunSuite {

  private def goldenLines: Seq[(Long, Seq[String])] =
    (0L to 3L).map { v =>
      val url = getClass.getResource(f"/delta/$v%020d.json")
      val text = new String(
        Files.readAllBytes(Paths.get(url.toURI)), StandardCharsets.UTF_8)
      v -> text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    }

  test("golden action JSON round-trips byte-identically") {
    goldenLines.foreach { case (v, lines) =>
      lines.foreach { line =>
        val action = Actions.fromJson(line)
        assert(action.isDefined, s"unparsed action in v$v: $line")
        assert(Actions.toJson(action.get) == line, s"round-trip mismatch in v$v")
      }
    }
  }

  test("golden log replays to the expected snapshots per version") {
    val perVersion = goldenLines.map { case (_, lines) => lines.flatMap(Actions.fromJson) }
    // v0: 1 file, 2-col schema
    val s0 = Snapshot.replay(0, perVersion.take(1))
    assert(s0.files.size == 1)
    assert(s0.schema.fieldNames.toSeq == Seq("firstName", "age"))
    assert(s0.protocol.contains(Protocol(1, 2)))
    // v1: blind append -> 4 files, same schema
    val s1 = Snapshot.replay(1, perVersion.take(2))
    assert(s1.files.size == 4)
    assert(s1.schema.fieldNames.toSeq == Seq("firstName", "age"))
    // v2: restatement -> 1 file, 3-col schema
    val s2 = Snapshot.replay(2, perVersion.take(3))
    assert(s2.files.size == 1)
    assert(s2.schema.fieldNames.toSeq == Seq("firstName", "lastName", "age"))
    assert(s2.files.head.size == 1025)
    // v3: append -> 5 files
    val s3 = Snapshot.replay(3, perVersion.take(4))
    assert(s3.files.size == 5)
    assert(s3.schema.fieldNames.toSeq == Seq("firstName", "lastName", "age"))
  }

  test("GwLog writes and reads versions with create-no-overwrite atomicity") {
    val dir = Files.createTempDirectory("gwlog").toString
    val log = GwLog.forTable(new Configuration(), dir)
    val add = AddFile("file:///tmp/a.parquet", 10, 1000)
    val v0 = log.commit(Seq(Protocol(), Metadata("id0", new StructType().json, createdTime = 1L), add,
      CommitInfo(1L, "WRITE", "Overwrite", 1, 10, isBlindAppend = false, "t0")))
    assert(v0 == 0L)
    val v1 = log.commit(Seq(AddFile("file:///tmp/b.parquet", 20, 2000),
      CommitInfo(2L, "WRITE", "Append", 1, 20, isBlindAppend = true, "t1")))
    assert(v1 == 1L)
    assert(log.listVersions() == Seq(0L, 1L))
    assert(log.snapshot().files.map(_.path).toSet ==
      Set("file:///tmp/a.parquet", "file:///tmp/b.parquet"))
    assert(log.snapshot(Some(0L)).files.map(_.path) == Seq("file:///tmp/a.parquet"))
    // double-commit of the same version must fail (optimistic concurrency)
    intercept[Exception] { log.commitAt(1L, Seq(add)) }
  }

  test("add-by-path is last-writer-wins; remove deletes") {
    val a1 = AddFile("p1", 1, 1)
    val a1b = AddFile("p1", 5, 5)
    val a2 = AddFile("p2", 2, 2)
    val snap = Snapshot.replay(2, Seq(Seq(a1, a2), Seq(a1b), Seq(RemoveFile("p2", 2, 9))))
    assert(snap.files == Seq(a1b))
  }
}
