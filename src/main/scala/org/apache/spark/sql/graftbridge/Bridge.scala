package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge for custom Catalyst expressions. Spark 4
 * moved the classic converters behind `private[sql]`; extension libraries
 * reach them from inside the `org.apache.spark.sql` package namespace (the
 * same access path spark-internal function registration uses).
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The active SparkContext's hadoop conf (`SparkContext.getActive` is
    * private[spark]) — the session-extensions hook mutates it before any
    * query runs (see graft.GraftExtensions). */
  def activeHadoopConf: Option[org.apache.hadoop.conf.Configuration] =
    org.apache.spark.SparkContext.getActive.map(_.hadoopConfiguration)

  /** `DataType.sameType` (equality ignoring nullability) is private[sql]. */
  def sameType(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = a.sameType(b)

  /** The partition columns `df.write.partitionBy(...)` smuggles to a V1
    * CreatableRelationProvider (JSON-encoded under `__partition_columns`);
    * the codec lives in private[sql] DataSourceUtils. */
  def partitioningColumns(parameters: Map[String, String]): Seq[String] = {
    import org.apache.spark.sql.execution.datasources.DataSourceUtils
    parameters.get(DataSourceUtils.PARTITIONING_COLUMNS_KEY)
      .map(DataSourceUtils.decodePartitioningColumns)
      .getOrElse(Nil)
  }

  /** A DataFrame over an arbitrary logical plan (`Dataset.ofRows` is
    * private[sql]) — the reverse of [[logicalPlan]], for physical nodes
    * that re-enter the engine's DataFrame-level write path. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A DataFrame's analyzed logical plan (private[sql] on the classic
    * Dataset) — lets a table-valued function splice an engine-built frame
    * into the calling query. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** Register table-function builders on a LIVE session. */
  def registerTableFunctions(
      spark: org.apache.spark.sql.SparkSession,
      fns: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)]): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry
    fns.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }

  /** Register function builders on a LIVE session (the extensions hook only
    * covers sessions built after the config is set). */
  def registerFunctions(
      spark: org.apache.spark.sql.SparkSession,
      fns: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)]): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    fns.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
