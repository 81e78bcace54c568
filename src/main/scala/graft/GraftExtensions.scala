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
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectParser((_, delegate) =>
      new org.apache.spark.sql.graftbridge.GwSqlParser(delegate))
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

  /** Register the functions on an already-running session. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.registerFunctions(spark, functions)
}
