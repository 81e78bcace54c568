package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, Expression, If, IsNull, Or, RaiseError}
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, LogicalPlan, OverwriteByExpression, OverwritePartitionsDynamic, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{BooleanType, StructType}

/**
 * Write-path CHECK constraint enforcement — the Delta invariant-checker
 * pattern re-expressed as an injected analysis rule: a gwdelta table whose
 * metadata configuration carries `graft.constraints.<name> = <boolean sql>`
 * entries gets every batch ingest plan (`INSERT INTO` / `INSERT OVERWRITE`
 * / `df.writeTo(...).append` — AppendData, OverwriteByExpression,
 * OverwritePartitionsDynamic) wrapped so each incoming row evaluates the
 * constraints BEFORE it reaches a parquet writer: the first output column
 * is rewritten to `If(pass, col, raise_error(...))`, which whole-stage
 * codegen executes inline — no extra exec node, no second pass over the
 * data, nothing on the driver. A violation fails the write before any
 * commit; the log never sees the bad batch (the engine's atomic-commit
 * contract makes the failed write invisible).
 *
 * Null semantics are SQL-standard CHECK: a constraint evaluating to NULL
 * passes; only a definite FALSE rejects. Expressions are validated at
 * `ALTER TABLE ... SET TBLPROPERTIES` time (parse + bind + boolean check,
 * [[GwConstraintRule.validate]]) so typos fail the ALTER, not a later
 * ingest. Row-level rewrites (UPDATE/MERGE ReplaceData/WriteDelta) carry
 * pre-existing rows and are out of scope by design — parity with the
 * ingest-side enforcement this engine's CDA write path needs.
 */
case class GwConstraintRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case a @ AppendData(r: DataSourceV2Relation, query, _, _, _, _)
        if needsWrap(r, query) =>
      a.copy(query = wrap(query, constraintsOf(r)))
    case o @ OverwriteByExpression(r: DataSourceV2Relation, _, query, _, _, _, _)
        if needsWrap(r, query) =>
      o.copy(query = wrap(query, constraintsOf(r)))
    case o @ OverwritePartitionsDynamic(r: DataSourceV2Relation, query, _, _, _)
        if needsWrap(r, query) =>
      o.copy(query = wrap(query, constraintsOf(r)))
  }

  private def needsWrap(r: DataSourceV2Relation, query: LogicalPlan): Boolean =
    query.resolved && query.output.nonEmpty &&
      constraintsOf(r).nonEmpty && !alreadyWrapped(query)

  private def constraintsOf(r: DataSourceV2Relation): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    r.table.properties().asScala.toSeq
      .collect { case (k, v) if k.startsWith(graft.GwTable.ConstraintPrefix) =>
        k.stripPrefix(graft.GwTable.ConstraintPrefix) -> v
      }
      .sortBy(_._1)
  }

  private def alreadyWrapped(query: LogicalPlan): Boolean = query match {
    case p: Project => p.projectList.exists(_.collectFirst { case r: RaiseError => r }.isDefined)
    case _ => false
  }

  private def wrap(query: LogicalPlan, constraints: Seq[(String, String)]): LogicalPlan = {
    val head = query.output.head
    val guarded = constraints.foldLeft(head: Expression) { case (inner, (name, sql)) =>
      val cond = GwConstraintRule.bind(spark, sql, query.output)
      // SQL-standard CHECK: NULL passes, only definite FALSE rejects
      val pass = Or(IsNull(cond), cond)
      val err = RaiseError(org.apache.spark.sql.catalyst.expressions.Literal(
        s"CHECK constraint $name ($sql) violated by an ingested row"))
      If(pass, inner, Cast(err, head.dataType))
    }
    // the raise_error branch never RETURNS a value (it throws), but it
    // widens If's static nullability — restore the original attribute's
    // nullability so the write's outputResolved contract is untouched
    val typed = if (head.nullable) guarded
      else org.apache.spark.sql.catalyst.expressions.KnownNotNull(guarded)
    Project(Alias(typed, head.name)() +: query.output.tail, query)
  }
}

object GwConstraintRule {

  /** Parse `sql`, bind its attribute references against `out` by
    * case-insensitive name, and require a boolean result type. */
  private[graftbridge] def bind(
      spark: SparkSession, sql: String, out: Seq[Attribute]): Expression = {
    val parsed = spark.sessionState.sqlParser.parseExpression(sql)
    val bound = parsed.transformUp {
      case u: UnresolvedAttribute =>
        out.find(_.name.equalsIgnoreCase(u.nameParts.mkString(".")))
          .getOrElse(throw new IllegalArgumentException(
            s"CHECK constraint references unknown column '${u.nameParts.mkString(".")}'" +
              s" (have: ${out.map(_.name).mkString(", ")})"))
    }
    if (bound.dataType != BooleanType)
      throw new IllegalArgumentException(
        s"CHECK constraint must be boolean, got ${bound.dataType.sql}: $sql")
    bound
  }

  /** Set-time validation: the expression must parse, bind against the
    * table schema, and type as boolean — called by
    * [[graft.GwTable.updateProperties]] before the metadata commit. */
  def validate(spark: SparkSession, name: String, sql: String, schema: StructType): Unit = {
    require(name.nonEmpty, "constraint name must be non-empty")
    val out = schema.fields.toSeq.map(f =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        f.name, f.dataType, f.nullable)())
    bind(spark, sql, out)
  }
}
