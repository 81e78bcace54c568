package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParameterContext}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructType}

/**
 * SQL maintenance surface over [[graft.GwTable]]'s API maintenance ops —
 * the statements a Delta user types, parsed by a thin delegating parser
 * (everything else falls through to Spark's own):
 *
 * {{{
 *   OPTIMIZE <table> [WHERE <pred>] [ZORDER BY (col [, ...])]
 *   VACUUM <table> [RETAIN <n> HOURS] [DRY RUN]
 *   DESCRIBE HISTORY <table>
 *   DESCRIBE DETAIL <table>
 *   RESTORE [TABLE] <table> TO VERSION AS OF <n>
 *   RESTORE [TABLE] <table> TO TIMESTAMP AS OF '<ts>'
 *   CREATE TABLE <t2> [SHALLOW|DEEP] CLONE <t1> [VERSION AS OF <n>] [LOCATION '<p>']
 *   REORG TABLE <table> APPLY (PURGE)
 *   CONVERT TO GWDELTA parquet.`<dir>`
 * }}}
 *
 * `<table>` is a catalog identifier (`gw.ns.t`) or a quoted path
 * (`'/path/to/table'`). Activated by
 * `.config("spark.sql.extensions", "graft.GraftExtensions")` at session
 * build (parsers cannot be injected into a live session).
 */
object GwMaintenance {

  /** `TIMESTAMP AS OF` literal -> epoch millis. Accepts the forms Delta
    * accepts — date-only (`2026-08-01`), local datetime with space or `T`
    * separator (fractional seconds included), and ISO instants with an
    * explicit offset/zone — all zoneless forms interpreted in the JVM
    * zone, matching `java.sql.Timestamp.valueOf` for the forms it could
    * parse. Failures raise a typed error naming the statement and the
    * accepted formats instead of surfacing a bare IllegalArgumentException
    * from `Timestamp.valueOf`. */
  def parseTsMillis(ts: String): Long = {
    val t = ts.trim
    val zone = java.time.ZoneId.systemDefault()
    def tryAll: Option[java.time.Instant] =
      scala.util.Try(java.time.Instant.parse(t)).toOption
        .orElse(scala.util.Try(java.time.OffsetDateTime.parse(t).toInstant).toOption)
        .orElse(scala.util.Try(
          java.time.LocalDateTime.parse(t.replace(' ', 'T'))
            .atZone(zone).toInstant).toOption)
        .orElse(scala.util.Try(
          java.time.LocalDate.parse(t).atStartOfDay(zone).toInstant).toOption)
    tryAll.map(_.toEpochMilli).getOrElse(throw new IllegalArgumentException(
      s"RESTORE ... TO TIMESTAMP AS OF: cannot parse '$ts'; accepted " +
        "formats: 'yyyy-MM-dd', 'yyyy-MM-dd HH:mm:ss[.SSS]' (space or 'T' " +
        "separator), or an ISO-8601 instant with offset " +
        "('2026-08-01T12:00:00Z')"))
  }

  private val TableRef = """(`[^`]+`|'[^']+'|"[^"]+"|[\w.]+)"""
  private val Optimize =
    ("""(?is)^\s*OPTIMIZE\s+""" + TableRef +
      """(?:\s+WHERE\s+(.+?))?""" +
      """(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""").r
  private val Vacuum =
    ("""(?is)^\s*VACUUM\s+""" + TableRef +
      """(?:\s+(LITE|FULL))?""" +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS?)?(?:\s+(DRY\s+RUN))?\s*;?\s*$""").r
  private val History =
    ("""(?is)^\s*DESC(?:RIBE)?\s+HISTORY\s+""" + TableRef + """\s*;?\s*$""").r
  private val Detail =
    ("""(?is)^\s*DESC(?:RIBE)?\s+DETAIL\s+""" + TableRef + """\s*;?\s*$""").r
  private val Restore =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?""" + TableRef +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private val RestoreTs =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?""" + TableRef +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""").r
  private val Clone =
    ("""(?is)^\s*CREATE\s+TABLE\s+""" + TableRef +
      """\s+(?:(SHALLOW|DEEP)\s+)?CLONE\s+""" +
      TableRef + """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?""" +
      """(?:\s+LOCATION\s+'([^']+)')?\s*;?\s*$""").r
  private val Reorg =
    ("""(?is)^\s*REORG\s+(?:TABLE\s+)?""" + TableRef +
      """\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$""").r
  private val Convert =
    """(?is)^\s*CONVERT\s+TO\s+GWDELTA\s+parquet\s*\.\s*(`[^`]+`|'[^']+'|"[^"]+")\s*;?\s*$""".r
  private val DropFeature =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + TableRef +
      """\s+DROP\s+FEATURE\s+(\w+)(?:\s+(TRUNCATE\s+HISTORY))?\s*;?\s*$""").r
  private val Generate =
    ("""(?is)^\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+""" +
      TableRef + """\s*;?\s*$""").r
  // ONLY the DELTA spelling is ours — plain `ANALYZE TABLE ... COMPUTE
  // STATISTICS` stays Spark's own catalog-statistics statement
  private val Analyze =
    ("""(?is)^\s*ANALYZE\s+TABLE\s+""" + TableRef +
      """\s+COMPUTE\s+DELTA\s+STATISTICS(\s+FOR\s+ALL\s+FILES)?\s*;?\s*$""").r

  /** Maintenance statement -> command plan; None = not ours. */
  def parse(sql: String): Option[LogicalPlan] = sql match {
    case Optimize(ref, where, zorder) =>
      val cols = Option(zorder).toSeq
        .flatMap(_.split(",")).map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty)
      Some(GwOptimizeCommand(ref, cols, Option(where).map(_.trim)))
    case Vacuum(ref, mode, hours, dry) =>
      Some(GwVacuumCommand(ref, Option(hours).map(_.toLong), dry != null,
        lite = "LITE".equalsIgnoreCase(Option(mode).getOrElse("FULL"))))
    case History(ref) => Some(GwDescribeHistoryCommand(ref))
    case Detail(ref) => Some(GwDescribeDetailCommand(ref))
    case Restore(ref, v) => Some(GwRestoreCommand(ref, v.toLong))
    case RestoreTs(ref, ts) => Some(GwRestoreTimestampCommand(ref, ts))
    case Reorg(ref) => Some(GwReorgCommand(ref))
    case DropFeature(ref, feat, trunc) =>
      Some(GwDropFeatureCommand(ref, feat, trunc != null))
    case Generate(ref) => Some(GwGenerateCommand(ref))
    case Analyze(ref, allFiles) => Some(GwAnalyzeCommand(ref, allFiles != null))
    case Convert(path) =>
      Some(GwConvertCommand(path.substring(1, path.length - 1)))
    case Clone(target, mode, source, v, loc) =>
      // Delta's contract: bare CLONE is deep; SHALLOW must be asked for
      Some(GwCloneCommand(target, source,
        Option(v).map(_.toLong), Option(loc),
        deep = !"SHALLOW".equalsIgnoreCase(Option(mode).getOrElse("DEEP"))))
    case _ => None
  }

  /** Resolve a statement's table reference to the gwdelta table PATH:
    * quoted forms are paths; identifier forms resolve through the session's
    * V2 catalogs to the loaded table's location. A single-part identifier
    * resolves in the session's CURRENT namespace (`USE gw.ns; OPTIMIZE t`),
    * like any other table reference. */
  /** A quoted table reference's path, if `ref` is the quoted form. */
  private[graftbridge] def unquotedPath(ref: String): Option[String] = {
    def unquote(q: Char): Option[String] =
      if (ref.length >= 2 && ref.head == q && ref.last == q)
        Some(ref.substring(1, ref.length - 1))
      else None
    unquote('\'').orElse(unquote('"'))
  }

  /** Resolve an identifier-form reference through the session's V2
    * catalogs (single-part identifiers resolve in the current namespace). */
  private[graftbridge] def catalogIdent(
      spark: SparkSession, ref: String): (TableCatalog, Identifier) = {
    val parts =
      if (ref.head == '`') Seq(ref.stripPrefix("`").stripSuffix("`"))
      else ref.split("\\.").toSeq
    val mgr = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager
    val (catalog, ident) =
      if (parts.length >= 2 && mgr.isCatalogRegistered(parts.head))
        (mgr.catalog(parts.head), parts.tail)
      else if (parts.length == 1)
        (mgr.currentCatalog, mgr.currentNamespace.toSeq ++ parts)
      else (mgr.currentCatalog, parts)
    (catalog.asInstanceOf[TableCatalog],
      Identifier.of(ident.init.toArray, ident.last))
  }

  def resolvePath(spark: SparkSession, ref: String): String =
    unquotedPath(ref).getOrElse {
      val (catalog, ident) = catalogIdent(spark, ref)
      catalog.loadTable(ident) match {
        case t: GwDeltaTable => t.tablePath
        case other => throw new UnsupportedOperationException(
          s"$ref is not a gwdelta table (got ${other.getClass.getSimpleName}); " +
            "maintenance SQL operates on gwdelta tables only")
      }
    }

  /** True when `ref` RESOLVES to a table another connector owns (loadTable
    * succeeds but the table is not gwdelta-backed): the statement then
    * falls through to the delegate parser instead of dying here — a Delta
    * table's OPTIMIZE belongs to Delta's parser, not ours. Quoted paths
    * and unresolvable identifiers stay OURS, so the user sees
    * table-not-found from the command, not a delegate syntax error. */
  def targetIsForeign(spark: SparkSession, ref: String): Boolean =
    scala.util.Try(resolvePath(spark, ref)).failed.toOption
      .exists(_.isInstanceOf[UnsupportedOperationException])
}

/** Common shape of the maintenance commands (the parser needs the ref to
  * decide ownership before claiming the statement). */
sealed trait GwMaintenanceCommand extends LeafRunnableCommand {
  def ref: String
}

case class GwOptimizeCommand(ref: String, zorderBy: Seq[String],
    where: Option[String] = None)
  extends GwMaintenanceCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GwMaintenance.resolvePath(spark, ref)
    // conf-driven output sizing, the Delta OPTIMIZE convention (its
    // optimize.maxFileSize conf) — SQL has no inline size clause
    val target = spark.conf
      .getOption("spark.graft.optimize.targetFileBytes")
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    val v = graft.GwTable.forPath(spark, path)
      .compact(target, zorderBy,
        where.map(org.apache.spark.sql.functions.expr))
    Seq(Row(path, v))
  }
}

/** `REORG TABLE t APPLY (PURGE)`: physical rebase — folds deletion
  * vectors away, rewrites renamed-column layouts, purges dropped-column
  * bytes, clears the mapping layer ([[graft.GwTable.reorg]]). */
case class GwReorgCommand(ref: String) extends GwMaintenanceCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GwMaintenance.resolvePath(spark, ref)
    val target = spark.conf
      .getOption("spark.graft.optimize.targetFileBytes")
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    Seq(Row(path, graft.GwTable.forPath(spark, path).reorg(target)))
  }
}

/** `ALTER TABLE t DROP FEATURE f [TRUNCATE HISTORY]`: protocol downgrade
  * once the feature is provably unused — current-state traces refuse with
  * the clearing maintenance step; reader features with traces in retained
  * history demand TRUNCATE HISTORY ([[graft.GwTable.dropFeature]]). */
case class GwDropFeatureCommand(ref: String, feature: String,
    truncateHistory: Boolean) extends GwMaintenanceCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("feature", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GwMaintenance.resolvePath(spark, ref)
    val v = graft.GwTable.forPath(spark, path)
      .dropFeature(feature, truncateHistory)
    Seq(Row(path, feature, v))
  }
}

/** `ANALYZE TABLE t COMPUTE DELTA STATISTICS [FOR ALL FILES]`: the
  * metadata-only stats backfill ([[graft.GwTable.computeStats]]) — fresh
  * footer stats for live files missing the currently-declared columns
  * (or every live file with FOR ALL FILES), no data rewrite. */
case class GwAnalyzeCommand(ref: String, allFiles: Boolean)
    extends GwMaintenanceCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("files_refreshed", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GwMaintenance.resolvePath(spark, ref)
    Seq(Row(path, graft.GwTable.forPath(spark, path).computeStats(allFiles)))
  }
}

/** `GENERATE symlink_format_manifest FOR TABLE t`: the Hive-symlink
  * manifest export external engines read Delta tables through
  * ([[graft.GwTable.generateSymlinkManifest]]). */
case class GwGenerateCommand(ref: String) extends GwMaintenanceCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("manifests", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GwMaintenance.resolvePath(spark, ref)
    Seq(Row(path, graft.GwTable.forPath(spark, path).generateSymlinkManifest()))
  }
}

case class GwVacuumCommand(ref: String, retainHours: Option[Long],
    dryRun: Boolean = false,
    /** `VACUUM t LITE` (Delta 4.0): tombstone-named deletes only, zero
      * filesystem listing ([[graft.GwTable.vacuumLite]]). */
    lite: Boolean = false) extends GwMaintenanceCommand {
  override val output: Seq[Attribute] =
    if (dryRun) Seq(AttributeReference("path", StringType, nullable = false)())
    else Seq(
      AttributeReference("path", StringType, nullable = false)(),
      AttributeReference("deleted_files", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GwMaintenance.resolvePath(spark, ref)
    val table = graft.GwTable.forPath(spark, path)
    val retention = retainHours.map(_ * 3600L * 1000L)
    if (dryRun)
      // Delta's DRY RUN shape: one row per file that WOULD be deleted —
      // a LITE dry run previews the tombstone-named set only
      retention.map(table.vacuumDryRun(_, lite))
        .getOrElse(table.vacuumDryRun(lite = lite))
        .sorted.map(Row(_))
    else if (lite) {
      val deleted =
        retention.map(table.vacuumLite).getOrElse(table.vacuumLite())
      Seq(Row(path, deleted))
    } else {
      val deleted = retention.map(table.vacuum).getOrElse(table.vacuum())
      Seq(Row(path, deleted))
    }
  }
}

/** `RESTORE TABLE t TO TIMESTAMP AS OF '<ts>'`: resolves the greatest
  * version at or before the timestamp (same clock as `TIMESTAMP AS OF`
  * reads — in-commit timestamps when the table records them) and
  * restores to it. */
case class GwRestoreTimestampCommand(ref: String, ts: String)
  extends GwMaintenanceCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("restored_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GwMaintenance.resolvePath(spark, ref)
    val millis = GwMaintenance.parseTsMillis(ts)
    val table = graft.GwTable.forPath(spark, path)
    val target = table.versionAtTimestamp(millis)
    Seq(Row(table.restore(target), target))
  }
}

case class GwDescribeHistoryCommand(ref: String) extends GwMaintenanceCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("mode", StringType, nullable = false)(),
    AttributeReference("numFiles", LongType, nullable = false)(),
    AttributeReference("numOutputBytes", LongType, nullable = false)(),
    AttributeReference("isBlindAppend", BooleanType, nullable = false)(),
    AttributeReference("userMetadata", StringType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GwMaintenance.resolvePath(spark, ref)
    graft.GwTable.forPath(spark, path).history.collect().toSeq
  }
}

case class GwDescribeDetailCommand(ref: String) extends GwMaintenanceCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("numFiles", LongType, nullable = false)(),
    AttributeReference("sizeInBytes", LongType, nullable = false)(),
    AttributeReference("partitionColumns", StringType, nullable = false)(),
    AttributeReference("numPartitions", LongType, nullable = false)(),
    AttributeReference("numDeletionVectorFiles", LongType, nullable = false)(),
    AttributeReference("numDeletedRows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GwMaintenance.resolvePath(spark, ref)
    val snap = graft.GwTable.forPath(spark, path).snapshot()
    val dvd = snap.files.flatMap(_.dv)
    // distinct partition-value tuples among LIVE files; 0 = unpartitioned
    val nParts = snap.files.map(_.partitionValues).filter(_.nonEmpty)
      .distinct.size.toLong
    Seq(Row("gwdelta", path, snap.version, snap.files.size.toLong,
      snap.totalBytes,
      snap.metadata.map(_.partitionColumns.mkString(",")).getOrElse(""),
      nParts, dvd.size.toLong, dvd.map(_.cardinality).sum))
  }
}

/** `RESTORE [TABLE] t TO VERSION AS OF n`: one metadata-scale commit
  * re-asserting version n's file set ([[graft.GwTable.restore]]); the
  * pre-restore state stays time-travelable. */
case class GwRestoreCommand(ref: String, version: Long) extends GwMaintenanceCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("restored_to", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GwMaintenance.resolvePath(spark, ref)
    val v = graft.GwTable.forPath(spark, path).restore(version)
    Seq(Row(v, version))
  }
}

/** `CONVERT TO GWDELTA parquet.`<dir>``: in-place conversion of a plain
  * parquet directory into a gwdelta table ([[graft.GwTable.convert]]) —
  * one bootstrap commit pointing at the files where they lie. */
case class GwConvertCommand(path: String) extends GwMaintenanceCommand {
  override def ref: String = s"'$path'" // quoted form: never a foreign table
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(path, graft.GwTable.convert(spark, path)))
}

/** `CREATE TABLE t2 [SHALLOW|DEEP] CLONE t1 [VERSION AS OF n]
  * [LOCATION 'p']`: SHALLOW is the zero-copy clone
  * ([[graft.GwTable.cloneTo]] — the bootstrap commit re-asserts the source
  * snapshot's absolute-path files); DEEP — Delta's default for a bare
  * `CLONE` — physically copies the snapshot into the new table's tree
  * ([[graft.GwTable.deepCloneTo]], distributed copy), so the clone
  * survives source vacuum. An identifier target is registered in its
  * catalog (managed location unless LOCATION is given); a quoted-path
  * target clones straight to the path. */
case class GwCloneCommand(target: String, source: String,
    version: Option[Long], location: Option[String],
    deep: Boolean = false) extends GwMaintenanceCommand {
  override def ref: String = source // foreign-table fall-through checks the SOURCE
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("source_path", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val srcPath = GwMaintenance.resolvePath(spark, source)
    val tgtPath = GwMaintenance.unquotedPath(target).getOrElse {
      val (catalog, ident) = GwMaintenance.catalogIdent(spark, target)
      val props = new java.util.HashMap[String, String]()
      props.put(TableCatalog.PROP_PROVIDER, "gwdelta")
      location.foreach(l => props.put(TableCatalog.PROP_LOCATION, l))
      catalog.createTable(ident, new StructType(),
        Array.empty[org.apache.spark.sql.connector.expressions.Transform], props) match {
        case p: GwDeltaPendingTable => p.path
        case t: GwDeltaTable => t.tablePath
        case other => throw new IllegalStateException(
          s"catalog returned a non-gwdelta table for $target: ${other.getClass}")
      }
    }
    val src = graft.GwTable.forPath(spark, srcPath)
    val v = if (deep) src.deepCloneTo(tgtPath, version)
            else src.cloneTo(tgtPath, version)
    Seq(Row(v, srcPath, tgtPath))
  }
}

/** Delegating parser: the maintenance statements parse here — UNLESS the
  * target resolves to another connector's table, in which case the whole
  * statement falls through to the delegate (whose own extensions may own
  * OPTIMIZE/VACUUM for it) — and everything else falls through untouched. */
class GwSqlParser(delegate: ParserInterface) extends ParserInterface {
  private def claim(sqlText: String): Option[LogicalPlan] =
    GwMaintenance.parse(sqlText).filter {
      case c: GwMaintenanceCommand =>
        SparkSession.getActiveSession
          .forall(s => !GwMaintenance.targetIsForeign(s, c.ref))
      case _ => true
    }
  override def parsePlan(sqlText: String): LogicalPlan =
    claim(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    claim(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}
