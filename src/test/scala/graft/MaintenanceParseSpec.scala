package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graftbridge._

/** The maintenance parser's statement forms ([[GwMaintenance.parse]]) —
  * every supported shape resolves to its command with the right fields,
  * and non-maintenance SQL falls through untouched. Parse-level only (no
  * session), so a regex regression fails here with the statement text,
  * not as a downstream delegate syntax error. */
class MaintenanceParseSpec extends AnyFunSuite {

  private def p(sql: String) = GwMaintenance.parse(sql)

  test("VACUUM forms: retention, dry run, both, case-insensitive") {
    assert(p("VACUUM t").exists {
      case v: GwVacuumCommand => !v.dryRun && v.retainHours.isEmpty
      case _ => false
    })
    assert(p("VACUUM t RETAIN 168 HOURS").exists {
      case v: GwVacuumCommand => !v.dryRun && v.retainHours.contains(168L)
      case _ => false
    })
    assert(p("VACUUM 'a/path' DRY RUN").exists {
      case v: GwVacuumCommand => v.dryRun && v.retainHours.isEmpty
      case _ => false
    })
    assert(p("VACUUM t LITE").exists {
      case v: GwVacuumCommand => v.lite && !v.dryRun && v.retainHours.isEmpty
      case _ => false
    })
    assert(p("vacuum 'a/path' lite retain 0 hours").exists {
      case v: GwVacuumCommand => v.lite && v.retainHours.contains(0L)
      case _ => false
    })
    assert(p("VACUUM t FULL RETAIN 24 HOURS").exists {
      case v: GwVacuumCommand => !v.lite && v.retainHours.contains(24L)
      case _ => false
    })
    assert(p("vacuum t retain 0 hour dry run").exists {
      case v: GwVacuumCommand => v.dryRun && !v.lite && v.retainHours.contains(0L)
      case _ => false
    })
  }

  test("CLONE forms: bare = deep, SHALLOW/DEEP explicit, version + location") {
    assert(p("CREATE TABLE a CLONE b").exists {
      case c: GwCloneCommand => c.deep && c.version.isEmpty
      case _ => false
    })
    assert(p("CREATE TABLE a DEEP CLONE b").exists {
      case c: GwCloneCommand => c.deep; case _ => false
    })
    assert(p("CREATE TABLE a SHALLOW CLONE b VERSION AS OF 3 LOCATION '/x'").exists {
      case c: GwCloneCommand =>
        !c.deep && c.version.contains(3L) && c.location.contains("/x")
      case _ => false
    })
  }

  test("RESTORE forms: version and timestamp") {
    assert(p("RESTORE TABLE t TO VERSION AS OF 4").exists {
      case r: GwRestoreCommand => r.version == 4L; case _ => false
    })
    assert(p("RESTORE t TO TIMESTAMP AS OF '2024-01-01 00:00:00'").exists {
      case r: GwRestoreTimestampCommand => r.ts == "2024-01-01 00:00:00"
      case _ => false
    })
  }

  test("TIMESTAMP AS OF literal parse: Delta-accepted forms, typed failure") {
    val zone = java.time.ZoneId.systemDefault()
    def local(s: String): Long =
      java.time.LocalDateTime.parse(s).atZone(zone).toInstant.toEpochMilli
    // classic Timestamp.valueOf form still parses identically
    assert(GwMaintenance.parseTsMillis("2024-01-01 12:30:45") ==
      local("2024-01-01T12:30:45"))
    assert(GwMaintenance.parseTsMillis("2024-01-01 12:30:45.250") ==
      local("2024-01-01T12:30:45.250"))
    // date-only (Delta accepts; Timestamp.valueOf rejected)
    assert(GwMaintenance.parseTsMillis("2024-01-01") ==
      local("2024-01-01T00:00"))
    // T separator and explicit-offset ISO instants
    assert(GwMaintenance.parseTsMillis("2024-01-01T12:30:45") ==
      local("2024-01-01T12:30:45"))
    assert(GwMaintenance.parseTsMillis("2024-01-01T12:30:45Z") ==
      java.time.Instant.parse("2024-01-01T12:30:45Z").toEpochMilli)
    assert(GwMaintenance.parseTsMillis("2024-01-01T12:30:45+02:00") ==
      java.time.OffsetDateTime.parse("2024-01-01T12:30:45+02:00")
        .toInstant.toEpochMilli)
    // failure is typed and names the statement + accepted formats
    val e = intercept[IllegalArgumentException](
      GwMaintenance.parseTsMillis("not-a-time"))
    assert(e.getMessage.contains("TIMESTAMP AS OF") &&
      e.getMessage.contains("yyyy-MM-dd"))
  }

  test("OPTIMIZE / REORG / CONVERT / DESCRIBE forms") {
    assert(p("OPTIMIZE t WHERE a = 1 ZORDER BY (x, y)").exists {
      case o: GwOptimizeCommand =>
        o.zorderBy == Seq("x", "y") && o.where.contains("a = 1")
      case _ => false
    })
    assert(p("REORG TABLE t APPLY (PURGE)").exists(_.isInstanceOf[GwReorgCommand]))
    assert(p("CONVERT TO GWDELTA parquet.`/data/x`").exists {
      case c: GwConvertCommand => c.path == "/data/x"; case _ => false
    })
    assert(p("DESCRIBE HISTORY t").exists(_.isInstanceOf[GwDescribeHistoryCommand]))
    assert(p("DESC DETAIL 't'").exists(_.isInstanceOf[GwDescribeDetailCommand]))
  }

  test("ANALYZE forms: DELTA spelling is ours, Spark's own ANALYZE is not") {
    assert(p("ANALYZE TABLE t COMPUTE DELTA STATISTICS").exists {
      case a: GwAnalyzeCommand => a.ref == "t" && !a.allFiles
      case _ => false
    })
    assert(p("analyze table 'a/path' compute delta statistics for all files;").exists {
      case a: GwAnalyzeCommand => a.ref == "'a/path'" && a.allFiles
      case _ => false
    })
    // plain COMPUTE STATISTICS stays Spark's catalog-statistics statement
    assert(p("ANALYZE TABLE t COMPUTE STATISTICS").isEmpty)
    assert(p("ANALYZE TABLE t COMPUTE STATISTICS FOR ALL COLUMNS").isEmpty)
  }

  test("everything else falls through to the delegate parser") {
    assert(p("SELECT * FROM t").isEmpty)
    assert(p("CREATE TABLE a (x INT) USING gwdelta").isEmpty)
    assert(p("VACUUM").isEmpty)
    assert(p("CONVERT TO DELTA parquet.`/x`").isEmpty) // another engine's statement
  }
}
