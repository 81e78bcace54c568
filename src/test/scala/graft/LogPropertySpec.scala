package graft

import graft.log.{Action, AddFile, Bloom, Metadata, RemoveFile, Snapshot}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/**
 * Property-based invariants of the transaction-log kernel (SURVEY §5.2.2):
 * replay is last-writer-wins by path, monotone in version prefix, action
 * JSON round-trips, and schema JSON round-trips losslessly.
 */
object LogPropertySpec extends Properties("graft.log") {

  private sealed trait Op
  private case class Add(path: String, size: Long) extends Op
  private case class Remove(path: String) extends Op

  private val genPath: Gen[String] = Gen.chooseNum(0, 20).map(i => s"part-$i.parquet")
  private val genOp: Gen[Op] = Gen.oneOf(
    for { p <- genPath; s <- Gen.chooseNum(1L, 1000L) } yield Add(p, s),
    genPath.map(Remove(_)))
  private val genCommits: Gen[List[List[Op]]] =
    Gen.listOfN(8, Gen.listOfN(4, genOp))

  private val meta = Metadata("id0",
    StructType(Seq(StructField("a", LongType))).json)

  /** Reference model: last-writer-wins add/remove by path. */
  private def model(commits: List[List[Op]], upTo: Int): Map[String, Long] =
    commits.take(upTo + 1).flatten.foldLeft(Map.empty[String, Long]) {
      case (live, Add(p, s)) => live + (p -> s)
      case (live, Remove(p)) => live - p
    }

  private def actionsFor(ops: List[Op], first: Boolean): Seq[Action] =
    (if (first) Seq(meta) else Nil) ++ ops.map {
      case Add(p, s) => AddFile(p, s, 0L)
      case Remove(p) => RemoveFile(p, 0L, 0L)
    }

  property("replay is last-writer-wins by path at every version prefix") =
    forAll(genCommits) { commits =>
      val versions = commits.zipWithIndex.map { case (ops, v) => actionsFor(ops, v == 0) }
      commits.indices.forall { upTo =>
        val snap = Snapshot.replay(upTo.toLong, versions.take(upTo + 1))
        val expected = model(commits, upTo)
        snap.files.map(f => f.path -> f.size).toMap == expected &&
          snap.metadata.contains(meta) &&
          snap.totalBytes == expected.values.sum
      }
    }

  property("action JSON round-trips through the wire format") =
    forAll(genCommits) { commits =>
      actionsFor(commits.flatten, first = true).forall { a =>
        graft.log.Actions.fromJson(graft.log.Actions.toJson(a)).contains(a)
      }
    }

  property("schema JSON round-trips: DataType.fromJson(t.json) == t") = {
    val genField: Gen[StructField] = for {
      name <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      dt <- Gen.oneOf[DataType](LongType, IntegerType, StringType, DoubleType,
        BooleanType, TimestampType, BinaryType, ArrayType(LongType),
        MapType(StringType, DoubleType))
      nullable <- Gen.oneOf(true, false)
    } yield StructField(name, dt, nullable)
    forAll(Gen.listOfN(6, genField)) { fields =>
      val distinct = fields.groupBy(_.name).values.map(_.head).toSeq
      val t = StructType(distinct)
      DataType.fromJson(t.json) == t
    }
  }

  property("parquet checkpoint round-trips arbitrary snapshot-state actions") = {
    val genStats: Gen[Option[String]] = Gen.oneOf(
      Gen.const(None),
      Gen.chooseNum(0L, 999L).map(n => Some(s"""{"numRecords":$n}""")))
    val genAdd: Gen[AddFile] = for {
      p <- genPath
      s <- Gen.chooseNum(1L, 1000L)
      m <- Gen.chooseNum(0L, 1000L)
      dc <- Gen.oneOf(true, false)
      pv <- Gen.mapOf(Gen.zip(Gen.identifier.map(_.take(4)), Gen.identifier.map(_.take(4))))
      st <- genStats
    } yield AddFile(p, s, m, dc, pv, st)
    forAll(Gen.listOfN(10, genAdd)) { adds =>
      val actions: Seq[Action] = Seq(graft.log.Protocol(1, 2), meta) ++ adds
      val dir = java.nio.file.Files.createTempDirectory("cp-prop")
      val target = new org.apache.hadoop.fs.Path(dir.toString, "cp.parquet")
      val conf = new org.apache.hadoop.conf.Configuration()
      graft.log.Checkpoint.write(target, conf, actions)
      graft.log.Checkpoint.read(target, conf) == actions
    }
  }

  /** Idempotence: re-applying a version's actions (crash-rerun, SURVEY
    * §2.6.5) converges to the same snapshot. */
  property("re-applied commits converge (add-by-path replaces)") =
    forAll(genCommits) { commits =>
      val versions = commits.zipWithIndex.map { case (ops, v) => actionsFor(ops, v == 0) }
      val once = Snapshot.replay(99L, versions)
      val rerun = Snapshot.replay(99L, versions ++ versions.lastOption.toSeq)
      once.files.map(f => f.path -> f.size).toMap ==
        rerun.files.map(f => f.path -> f.size).toMap
    }

  private val genRef: Gen[(String, Bloom.Ref)] = for {
    col <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
    p <- Gen.chooseNum(0, 9).map(i => s"/t/_bloom/run-$i.bin")
    off <- Gen.chooseNum(0L, 1L << 30)
    len <- Gen.chooseNum(1, 1 << 19)
    crc <- Gen.chooseNum(0L, (1L << 32) - 1)
  } yield col -> Bloom.Ref(p, off, len, crc)

  property("bloom refs survive the stats JSON round trip and remap moves only paths") =
    forAll(Gen.nonEmptyListOf(genRef), Gen.chooseNum(1L, 1000L)) { (refs0, rows) =>
      // distinct columns (a JSON object has one entry per key)
      val refs = refs0.groupBy(_._1).map(_._2.head).toSeq
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.createObjectNode()
      root.put("numRecords", rows)
      val bn = root.putObject("gwBloomRef")
      refs.foreach { case (c, r) =>
        val o = bn.putObject(c)
        o.put("p", r.path); o.put("o", r.offset)
        o.put("l", r.length); o.put("c", r.crc)
      }
      val f = AddFile("f.parquet", 1L, 1L,
        stats = Some(mapper.writeValueAsString(root)))
      val readBack = refs.forall { case (c, r) => Bloom.refOf(f, c).contains(r) }
      val paths = Bloom.sidecarPaths(f).toSet == refs.map(_._2.path).toSet
      // remap: every mapped path moves, offsets/lengths/crc/other stats hold
      val mapping = refs.map(_._2.path).distinct.map(p => p -> s"$p.clone").toMap
      val remapped = f.copy(stats = f.stats.map(Bloom.remapStats(_, mapping)))
      val moved = refs.forall { case (c, r) =>
        Bloom.refOf(remapped, c).contains(r.copy(path = s"${r.path}.clone"))
      }
      val rowsHold = mapper.readTree(remapped.stats.get)
        .path("numRecords").asLong() == rows
      readBack && paths && moved && rowsHold
    }

  property("a reconciled segment replays exactly like the range it covers") =
    forAll(genCommits, Gen.chooseNum(0, 7), Gen.chooseNum(0, 7)) {
      (commits, a, b) =>
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        val versions = commits.zipWithIndex
          .map { case (ops, v) => actionsFor(ops, v == 0) }
        val segment = graft.log.GwLog.reconcile(versions.slice(lo, hi + 1))
        val substituted =
          versions.take(lo) ++ Seq(segment) ++ versions.drop(hi + 1)
        val direct = Snapshot.replay(commits.length - 1L, versions)
        val via = Snapshot.replay(commits.length - 1L, substituted)
        via.files.map(f => f.path -> f.size).toMap ==
          direct.files.map(f => f.path -> f.size).toMap &&
          via.metadata == direct.metadata &&
          via.tombstones.map(_.path).toSet ==
            direct.tombstones.map(_.path).toSet &&
          via.transactions == direct.transactions
    }

  property("every commit's crc equals the replayed state (incremental = replay)") =
    forAll(genCommits) { commits =>
      val dir = java.nio.file.Files.createTempDirectory("gwlog-crcprop").toString
      val log = graft.log.GwLog.forTable(
        new org.apache.hadoop.conf.Configuration(), dir)
      commits.zipWithIndex.foreach { case (ops, v) =>
        // a BLIND append's paths are fresh by the engine's append
        // invariant (UUID staging) — the incremental crc path relies on
        // it; mixed/removing commits reuse paths and take the replay path
        val blind = ops.forall(_.isInstanceOf[Add])
        val acts =
          if (blind) (if (v == 0) Seq(meta) else Nil) ++
            ops.zipWithIndex.map { case (Add(_, s), i) =>
              AddFile(s"fresh-$v-$i.parquet", s, 0L)
            case _ => throw new MatchError("unreachable")
            }
          else actionsFor(ops, v == 0)
        log.commit(acts :+ graft.log.CommitInfo(v.toLong, "WRITE",
          if (blind) "Append" else "Mixed", ops.size.toLong, 0L,
          isBlindAppend = blind, s"t$v"))
      }
      commits.indices.forall { v =>
        log.readChecksum(v.toLong).contains(
          graft.log.VersionChecksum.of(log.snapshot(Some(v.toLong))))
      }
    }
}
