package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites (one JVM-wide session, forked sbt). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  implicit def implicitSpark: SparkSession = spark
}

/** Peel observability wrappers off a V2 scan down to the parquet/MOR core
  * (GwDeltaScan streaming face, GwRuntimeFilteringScan dynamic pruning,
  * GwLogicalNamesScan column mapping) — test plan assertions target the
  * core scan whatever faces the table carries. */
object ScanPeel {
  import org.apache.spark.sql.connector.read.Scan
  def peel(s: Scan): Scan = org.apache.spark.sql.graftbridge.GwScanPeel.peel(s)
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
