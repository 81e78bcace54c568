package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, OverwritePartitionsDynamic}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, V2CommandExec}

/**
 * Planner strategy for `INSERT OVERWRITE` under
 * `spark.sql.sources.partitionOverwriteMode=dynamic` on gwdelta tables:
 * Spark has no V1-write fallback for `OverwritePartitionsDynamic` (only
 * append and overwrite-by-expression), so the statement is planned here
 * directly into the engine's own transactional dynamic overwrite —
 * ONE commit that tombstones exactly the partitions the batch touches
 * ([[graft.streaming.GwSink.overwrite]] with `dynamicPartitions`).
 */
class GwDynamicOverwriteStrategy(session: SparkSession)
  extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case o: OverwritePartitionsDynamic => o.table match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GwDeltaTable] =>
        val t = r.table.asInstanceOf[GwDeltaTable]
        GwDynamicOverwriteExec(t.tablePath,
          t.schema().fieldNames.toSeq, o.query, o.writeOptions) :: Nil
      case _ => Nil
    }
    case _ => Nil
  }
}

/** Runs once (V2CommandExec result memoization): evaluates the source
  * query as a DataFrame and lands it through the engine's dynamic
  * overwrite. Output columns rename positionally to the table's schema —
  * the analyzer has already checked compatibility, but the sink's strict
  * schema check compares NAMES. The statement's write options thread
  * through with the V1 path's spellings: `txnAppId`+`txnVersion`
  * (idempotent writes) and `userMetadata` (commit audit string). */
case class GwDynamicOverwriteExec(
    tablePath: String,
    tableColumns: Seq[String],
    query: LogicalPlan,
    writeOptions: Map[String, String] = Map.empty) extends V2CommandExec with LeafExecNode {
  override def output: Seq[Attribute] = Nil
  override def run(): Seq[InternalRow] = {
    val df = Bridge.ofRows(session, query).toDF(tableColumns: _*)
    val txnId = (writeOptions.get("txnAppId"), writeOptions.get("txnVersion")) match {
      case (Some(app), Some(v)) =>
        require(!app.contains("/"), s"txnAppId must not contain '/': $app")
        val ver = v.toLongOption.getOrElse(throw new IllegalArgumentException(
          s"txnVersion must be a long, got '$v'"))
        Some(s"$app/$ver")
      case (None, None) => None
      case _ => throw new IllegalArgumentException(
        "txnAppId and txnVersion must be set together")
    }
    graft.streaming.GwSink.overwrite(df, tablePath, txnId = txnId,
      userMetadata = writeOptions.get("userMetadata").filter(_.nonEmpty),
      dynamicPartitions = true)
    Nil
  }
}
