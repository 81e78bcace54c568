package graft.log

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetReader}
import org.apache.parquet.schema.MessageTypeParser

/**
 * Parquet checkpoint codec for the transaction log — the O(1) snapshot
 * resume the reference inherits from delta-standalone's log checkpointing
 * (commits at `/root/reference/src/main/scala/com/databricks/labs/guidewire/Guidewire.scala:219-245`
 * go through `DeltaLog`, which checkpoints every N commits). Without it,
 * `snapshot()` opens every version JSON: CDA syncs every few hours for
 * years, so tables reach tens of thousands of versions and snapshot
 * construction becomes O(versions) driver-side file opens.
 *
 * A checkpoint row is one action in delta's checkpoint shape (struct
 * columns `protocol` / `metaData` / `add` / `remove` / `txn`, exactly one
 * non-null per row). Built on parquet-hadoop's Example API rather than a
 * Spark write because the log is committed from executor-side table tasks
 * where no SparkSession exists. A checkpoint stores the REPLAYED snapshot
 * state: latest protocol + metadata + live files, plus — per the Delta
 * spec — unexpired remove tombstones (vacuum semantics survive a future
 * log cleanup) and the app-transaction high-water marks (`txn`), so
 * streaming exactly-once replay detection does not depend on how much
 * JSON history remains.
 */
object Checkpoint {

  private val SchemaText =
    """message checkpoint {
      |  optional group protocol {
      |    optional int32 minReaderVersion;
      |    optional int32 minWriterVersion;
      |    optional group readerFeatures (LIST) {
      |      repeated group list {
      |        optional binary element (UTF8);
      |      }
      |    }
      |    optional group writerFeatures (LIST) {
      |      repeated group list {
      |        optional binary element (UTF8);
      |      }
      |    }
      |  }
      |  optional group metaData {
      |    optional binary id (UTF8);
      |    optional binary schemaString (UTF8);
      |    optional group partitionColumns (LIST) {
      |      repeated group list {
      |        optional binary element (UTF8);
      |      }
      |    }
      |    optional group configuration (MAP) {
      |      repeated group key_value {
      |        required binary key (UTF8);
      |        optional binary value (UTF8);
      |      }
      |    }
      |    optional int64 createdTime;
      |  }
      |  optional group add {
      |    optional binary path (UTF8);
      |    optional group partitionValues (MAP) {
      |      repeated group key_value {
      |        required binary key (UTF8);
      |        optional binary value (UTF8);
      |      }
      |    }
      |    optional int64 size;
      |    optional int64 modificationTime;
      |    optional boolean dataChange;
      |    optional int64 baseRowId;
      |    optional int64 defaultRowCommitVersion;
      |    optional binary stats (UTF8);
      |    optional group statsParsed {
      |      optional int64 numRecords;
      |      optional int32 gwStatsV;
      |      optional group minValues (MAP) {
      |        repeated group key_value {
      |          required binary key (UTF8);
      |          optional group value {
      |            optional binary num (UTF8);
      |            optional binary str (UTF8);
      |          }
      |        }
      |      }
      |      optional group maxValues (MAP) {
      |        repeated group key_value {
      |          required binary key (UTF8);
      |          optional group value {
      |            optional binary num (UTF8);
      |            optional binary str (UTF8);
      |          }
      |        }
      |      }
      |      optional group nullCount (MAP) {
      |        repeated group key_value {
      |          required binary key (UTF8);
      |          optional int64 value;
      |        }
      |      }
      |    }
      |    optional group deletionVector {
      |      optional binary storageType (UTF8);
      |      optional binary pathOrInlineDv (UTF8);
      |      optional int32 offset;
      |      optional int32 sizeInBytes;
      |      optional int64 cardinality;
      |    }
      |  }
      |  optional group remove {
      |    optional binary path (UTF8);
      |    optional int64 size;
      |    optional int64 deletionTimestamp;
      |    optional boolean dataChange;
      |    optional group partitionValues (MAP) {
      |      repeated group key_value {
      |        required binary key (UTF8);
      |        optional binary value (UTF8);
      |      }
      |    }
      |  }
      |  optional group txn {
      |    optional binary appId (UTF8);
      |    optional int64 version;
      |    optional int64 lastUpdated;
      |  }
      |  optional group domainMetadata {
      |    optional binary domain (UTF8);
      |    optional binary configuration (UTF8);
      |    optional boolean removed;
      |  }
      |  optional group checkpointMetadata {
      |    optional int64 version;
      |  }
      |  optional group sidecar {
      |    optional binary path (UTF8);
      |    optional int64 sizeInBytes;
      |    optional int64 modificationTime;
      |  }
      |}""".stripMargin

  private val schema = MessageTypeParser.parseMessageType(SchemaText)

  private def putMap(parent: Group, field: String, m: Map[String, String]): Unit = {
    val g = parent.addGroup(field)
    m.foreach { case (k, v) =>
      val kv = g.addGroup("key_value")
      kv.append("key", k)
      kv.append("value", v)
    }
  }

  private def readMap(parent: Group, field: String): Map[String, String] =
    if (parent.getFieldRepetitionCount(field) == 0) Map.empty
    else {
      val g = parent.getGroup(field, 0)
      (0 until g.getFieldRepetitionCount("key_value")).map { i =>
        val kv = g.getGroup("key_value", i)
        kv.getString("key", 0) -> kv.getString("value", 0)
      }.toMap
    }

  private val statsMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Stats JSON -> `statsParsed` group. Numbers travel as their exact
    * JSON text; booleans are skipped (the pruning JSON path skips them
    * too); malformed JSON writes nothing. */
  private def writeParsedStats(add: Group, statsJson: String): Unit =
    scala.util.Try {
      val root = statsMapper.readTree(statsJson)
      val g = add.addGroup("statsParsed")
      val nr = root.path("numRecords")
      if (nr.isNumber) g.append("numRecords", nr.asLong())
      g.append("gwStatsV", root.path("gwStatsV").asInt(0))
      def putBounds(field: String): Unit = {
        val node = root.path(field)
        if (node.isObject) {
          val m = g.addGroup(field)
          val it = node.fields()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue.isNumber || e.getValue.isTextual) {
              val kv = m.addGroup("key_value")
              kv.append("key", e.getKey)
              val v = kv.addGroup("value")
              if (e.getValue.isNumber) v.append("num", e.getValue.asText())
              else v.append("str", e.getValue.asText())
            }
          }
        }
      }
      putBounds("minValues")
      putBounds("maxValues")
      val nc = root.path("nullCount")
      if (nc.isObject) {
        val m = g.addGroup("nullCount")
        val it = nc.fields()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.isNumber) {
            val kv = m.addGroup("key_value")
            kv.append("key", e.getKey)
            kv.append("value", e.getValue.asLong())
          }
        }
      }
    }.getOrElse(())

  /** `statsParsed` group -> [[ParsedStats]], the typed twin pruning
    * prefers over re-parsing the JSON. */
  private def readParsedStats(add: Group): Option[ParsedStats] =
    if (add.getFieldRepetitionCount("statsParsed") == 0) None
    else scala.util.Try {
      val g = add.getGroup("statsParsed", 0)
      def bounds(field: String): Map[String, Bound] =
        if (g.getFieldRepetitionCount(field) == 0) Map.empty
        else {
          val m = g.getGroup(field, 0)
          (0 until m.getFieldRepetitionCount("key_value")).flatMap { i =>
            val kv = m.getGroup("key_value", i)
            val v = kv.getGroup("value", 0)
            val b: Option[Bound] =
              if (v.getFieldRepetitionCount("num") > 0)
                Some(Bound.Num(BigDecimal(v.getString("num", 0))))
              else if (v.getFieldRepetitionCount("str") > 0)
                Some(Bound.Str(v.getString("str", 0)))
              else None
            b.map(kv.getString("key", 0) -> _)
          }.toMap
        }
      val nulls: Map[String, Long] =
        if (g.getFieldRepetitionCount("nullCount") == 0) Map.empty
        else {
          val m = g.getGroup("nullCount", 0)
          (0 until m.getFieldRepetitionCount("key_value")).map { i =>
            val kv = m.getGroup("key_value", i)
            kv.getString("key", 0) -> kv.getLong("value", 0)
          }.toMap
        }
      ParsedStats(
        numRecords =
          if (g.getFieldRepetitionCount("numRecords") > 0)
            Some(g.getLong("numRecords", 0))
          else None,
        gwStatsV =
          if (g.getFieldRepetitionCount("gwStatsV") > 0)
            g.getInteger("gwStatsV", 0)
          else 0,
        minValues = bounds("minValues"),
        maxValues = bounds("maxValues"),
        nullCount = nulls)
    }.toOption

  /** Write snapshot-state actions (protocol / metadata / adds) to `target`. */
  def write(target: Path, conf: Configuration, actions: Seq[Action]): Unit = {
    val writer = ExampleParquetWriter.builder(target)
      .withConf(conf)
      .withType(schema)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    try actions.foreach { a =>
      val row = new SimpleGroup(schema)
      a match {
        case Protocol(r, w, rf, wf) =>
          val g = row.addGroup("protocol")
          g.append("minReaderVersion", r)
          g.append("minWriterVersion", w)
          rf.foreach { fs =>
            val lg = g.addGroup("readerFeatures")
            fs.foreach(f => lg.addGroup("list").append("element", f))
          }
          wf.foreach { fs =>
            val lg = g.addGroup("writerFeatures")
            fs.foreach(f => lg.addGroup("list").append("element", f))
          }
        case Metadata(id, schemaString, partCols, configuration, createdTime) =>
          val g = row.addGroup("metaData")
          g.append("id", id)
          g.append("schemaString", schemaString)
          val pc = g.addGroup("partitionColumns")
          partCols.foreach(c => pc.addGroup("list").append("element", c))
          putMap(g, "configuration", configuration)
          g.append("createdTime", createdTime)
        case a: AddFile =>
          val g = row.addGroup("add")
          g.append("path", a.path)
          putMap(g, "partitionValues", a.partitionValues)
          g.append("size", a.size)
          g.append("modificationTime", a.modificationTime)
          g.append("dataChange", a.dataChange)
          a.baseRowId.foreach(b => g.append("baseRowId", b))
          a.defaultRowCommitVersion.foreach(v =>
            g.append("defaultRowCommitVersion", v))
          a.stats.foreach { s =>
            g.append("stats", s)
            // Delta writeStatsAsStruct parity: the SAME stats, pre-parsed
            // into a typed struct, so a snapshot served from this
            // checkpoint prunes without one JSON parse per file. Values
            // ride as exact decimal TEXT (see [[ParsedStats]]) — a parse
            // failure just skips the struct, the JSON column stays
            // authoritative for replay/goldens either way.
            writeParsedStats(g, s)
          }
          a.dv.foreach { d =>
            val dg = g.addGroup("deletionVector")
            dg.append("storageType", d.storageType)
            dg.append("pathOrInlineDv", d.pathOrInlineDv)
            d.offset.foreach(o => dg.append("offset", o))
            dg.append("sizeInBytes", d.sizeInBytes)
            dg.append("cardinality", d.cardinality)
          }
        case RemoveFile(path, size, dts, dataChange, partVals) =>
          val g = row.addGroup("remove")
          g.append("path", path)
          g.append("size", size)
          g.append("deletionTimestamp", dts)
          g.append("dataChange", dataChange)
          putMap(g, "partitionValues", partVals)
        case SetTransaction(appId, version, lastUpdated) =>
          val g = row.addGroup("txn")
          g.append("appId", appId)
          g.append("version", version)
          lastUpdated.foreach(ts => g.append("lastUpdated", ts))
        case DomainMetadata(domain, configuration, removed) =>
          val g = row.addGroup("domainMetadata")
          g.append("domain", domain)
          g.append("configuration", configuration)
          g.append("removed", removed)
        case CheckpointMetadata(version) =>
          row.addGroup("checkpointMetadata").append("version", version)
        case SidecarFile(path, sizeInBytes, modificationTime) =>
          val g = row.addGroup("sidecar")
          g.append("path", path)
          g.append("sizeInBytes", sizeInBytes)
          g.append("modificationTime", modificationTime)
        case other =>
          throw new IllegalArgumentException(
            s"checkpoints store snapshot state, not $other")
      }
      writer.write(row)
    } finally writer.close()
  }

  /** Read a checkpoint back into actions (order preserved). */
  def read(target: Path, conf: Configuration): Seq[Action] = {
    val reader = ParquetReader.builder(new GroupReadSupport(), target)
      .withConf(conf)
      .build()
    try {
      val out = Seq.newBuilder[Action]
      var row = reader.read()
      while (row != null) {
        if (row.getFieldRepetitionCount("protocol") > 0) {
          val g = row.getGroup("protocol", 0)
          def features(field: String): Option[Seq[String]] =
            if (g.getFieldRepetitionCount(field) == 0) None
            else {
              val lg = g.getGroup(field, 0)
              Some((0 until lg.getFieldRepetitionCount("list"))
                .map(i => lg.getGroup("list", i).getString("element", 0)))
            }
          out += Protocol(g.getInteger("minReaderVersion", 0),
            g.getInteger("minWriterVersion", 0),
            features("readerFeatures"), features("writerFeatures"))
        } else if (row.getFieldRepetitionCount("metaData") > 0) {
          val g = row.getGroup("metaData", 0)
          val parts =
            if (g.getFieldRepetitionCount("partitionColumns") == 0) Nil
            else {
              val pc = g.getGroup("partitionColumns", 0)
              (0 until pc.getFieldRepetitionCount("list"))
                .map(i => pc.getGroup("list", i).getString("element", 0))
            }
          out += Metadata(
            id = g.getString("id", 0),
            schemaString = g.getString("schemaString", 0),
            partitionColumns = parts,
            configuration = readMap(g, "configuration"),
            createdTime = g.getLong("createdTime", 0))
        } else if (row.getFieldRepetitionCount("add") > 0) {
          val g = row.getGroup("add", 0)
          val add = AddFile(
            path = g.getString("path", 0),
            size = g.getLong("size", 0),
            modificationTime = g.getLong("modificationTime", 0),
            dataChange = g.getBoolean("dataChange", 0),
            partitionValues = readMap(g, "partitionValues"),
            stats =
              if (g.getFieldRepetitionCount("stats") > 0) Some(g.getString("stats", 0))
              else None,
            baseRowId =
              if (g.getFieldRepetitionCount("baseRowId") > 0)
                Some(g.getLong("baseRowId", 0))
              else None,
            defaultRowCommitVersion =
              if (g.getFieldRepetitionCount("defaultRowCommitVersion") > 0)
                Some(g.getLong("defaultRowCommitVersion", 0))
              else None,
            dv =
              if (g.getFieldRepetitionCount("deletionVector") > 0) {
                val dg = g.getGroup("deletionVector", 0)
                Some(DvDescriptor(
                  storageType = dg.getString("storageType", 0),
                  pathOrInlineDv = dg.getString("pathOrInlineDv", 0),
                  offset =
                    if (dg.getFieldRepetitionCount("offset") > 0)
                      Some(dg.getInteger("offset", 0))
                    else None,
                  sizeInBytes = dg.getInteger("sizeInBytes", 0),
                  cardinality = dg.getLong("cardinality", 0)))
              } else None)
          add.parsedStats = readParsedStats(g)
          out += add
        } else if (row.getFieldRepetitionCount("remove") > 0) {
          val g = row.getGroup("remove", 0)
          out += RemoveFile(
            path = g.getString("path", 0),
            size = g.getLong("size", 0),
            deletionTimestamp = g.getLong("deletionTimestamp", 0),
            dataChange = g.getBoolean("dataChange", 0),
            partitionValues = readMap(g, "partitionValues"))
        } else if (row.getFieldRepetitionCount("txn") > 0) {
          val g = row.getGroup("txn", 0)
          out += SetTransaction(
            appId = g.getString("appId", 0),
            version = g.getLong("version", 0),
            lastUpdated =
              if (g.getFieldRepetitionCount("lastUpdated") > 0)
                Some(g.getLong("lastUpdated", 0))
              else None)
        } else if (row.getFieldRepetitionCount("domainMetadata") > 0) {
          val g = row.getGroup("domainMetadata", 0)
          out += DomainMetadata(
            domain = g.getString("domain", 0),
            configuration = g.getString("configuration", 0),
            removed = g.getBoolean("removed", 0))
        } else if (row.getFieldRepetitionCount("checkpointMetadata") > 0) {
          out += CheckpointMetadata(
            row.getGroup("checkpointMetadata", 0).getLong("version", 0))
        } else if (row.getFieldRepetitionCount("sidecar") > 0) {
          val g = row.getGroup("sidecar", 0)
          out += SidecarFile(
            path = g.getString("path", 0),
            sizeInBytes = g.getLong("sizeInBytes", 0),
            modificationTime = g.getLong("modificationTime", 0))
        }
        row = reader.read()
      }
      out.result()
    } finally reader.close()
  }
}
