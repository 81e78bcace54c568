package graft

import graft.functions.{SimHashAgg, VecDot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SQL surface for the engine's native expressions and maintenance
 * statements:
 *
 *  - `vec_dot(a, b)` — codegen'd sequential-fold dot product (VecDot);
 *  - `simhash_agg(termHash, weight)` — 64-bit SimHash aggregate;
 *  - `OPTIMIZE` / `VACUUM` / `DESCRIBE HISTORY` over gwdelta tables
 *    ([[org.apache.spark.sql.graftbridge.GwMaintenance]]).
 *
 * Two registration paths:
 *
 *  - new sessions: `.config("spark.sql.extensions", "graft.GraftExtensions")`
 *    (the standard SparkSessionExtensions hook);
 *  - existing sessions: `GraftExtensions.register(spark)` (functions only —
 *    a live session's parser cannot be swapped).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Local-FS permission ops fork a `chmod` process per file create when
    // the hadoop native library is absent — every driver-side commit,
    // checkpoint write and committer setup pays it (see
    // GwNioRawLocalFileSystem). Swap in the NIO-based local FS for the
    // session's hadoop conf unless the deployment already chose one;
    // cluster schemes (hdfs/s3) are untouched by construction.
    org.apache.spark.sql.graftbridge.Bridge.activeHadoopConf.foreach { hc =>
      if (hc.get("fs.file.impl") == null)
        hc.set("fs.file.impl", "graft.sources.GwNioLocalFileSystem")
    }
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    GraftExtensions.tableFunctions.foreach(ext.injectTableFunction)
    ext.injectParser((_, delegate) =>
      new org.apache.spark.sql.graftbridge.GwSqlParser(delegate))
    // write-path CHECK constraint enforcement (graft.constraints.* table
    // properties) — runs once after resolution, wraps batch ingest plans
    ext.injectPostHocResolutionRule(session =>
      org.apache.spark.sql.graftbridge.GwConstraintRule(session))
    // partitionOverwriteMode=dynamic INSERT OVERWRITE (Spark has no V1
    // fallback for OverwritePartitionsDynamic) — planned into the sink's
    // one-commit dynamic overwrite
    ext.injectPlannerStrategy(session =>
      new org.apache.spark.sql.graftbridge.GwDynamicOverwriteStrategy(session))
  }
}

object GraftExtensions {

  private def info(className: String, name: String): ExpressionInfo =
    new ExpressionInfo(className, null, name)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("graft.functions.VecDot", "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot takes exactly 2 arguments")
        VecDot(children(0), children(1))
      }),
    (FunctionIdentifier("simhash_agg"),
      info("graft.functions.SimHashAgg", "simhash_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "simhash_agg takes exactly 2 arguments")
        SimHashAgg(children(0), children(1)).toAggregateExpression()
      }))

  /** `table_changes('t' | '/path/to/table', sinceVersion)` — the batch
    * row-level change feed ([[GwTable.rowChanges]]) as a SQL table-valued
    * function, Delta's TVF shape:
    * `SELECT * FROM table_changes('gw.ns.t', 3)`. A reference containing
    * `/` is taken as a table path; anything else resolves through the
    * session catalog. */
  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    (FunctionIdentifier("table_changes"),
      info("graft.GwTable", "table_changes"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "table_changes(table, sinceVersion) takes exactly 2 arguments")
        def literal(e: Expression, what: String): Any = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v
          case other => throw new IllegalArgumentException(
            s"table_changes needs a literal $what, got $other")
        }
        val ref = String.valueOf(literal(children(0), "table reference"))
        val since = literal(children(1), "version") match {
          case i: java.lang.Integer => i.longValue()
          case l: java.lang.Long => l.longValue()
          case other => throw new IllegalArgumentException(
            s"table_changes version must be an integer, got $other")
        }
        val spark = SparkSession.active
        val path =
          if (ref.contains("/")) ref
          else org.apache.spark.sql.graftbridge.GwMaintenance.resolvePath(spark, ref)
        org.apache.spark.sql.graftbridge.Bridge.logicalPlan(
          GwTable.forPath(spark, path).rowChanges(since))
      }))

  /** Register the functions on an already-running session. */
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graftbridge.Bridge.registerFunctions(spark, functions)
    org.apache.spark.sql.graftbridge.Bridge.registerTableFunctions(spark, tableFunctions)
  }
}
