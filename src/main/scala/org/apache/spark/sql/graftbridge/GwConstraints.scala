package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, EqualNullSafe, Expression, If, IsNull, Literal, Or, RaiseError}
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, LogicalPlan, OverwriteByExpression, OverwritePartitionsDynamic, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{BooleanType, StructType}

/**
 * Write-path CHECK constraint + GENERATED COLUMN enforcement — the Delta
 * invariant-checker pattern re-expressed as an injected analysis rule over
 * batch ingest plans (`INSERT INTO` / `INSERT OVERWRITE` /
 * `df.writeTo(...).append` — AppendData, OverwriteByExpression,
 * OverwritePartitionsDynamic).
 *
 * CHECK constraints (`graft.constraints.<name> = <boolean sql>`): each
 * incoming row evaluates the constraints BEFORE it reaches a parquet
 * writer — the first output column is rewritten to
 * `If(pass, col, raise_error(...))`, which whole-stage codegen executes
 * inline (no extra exec node, no second pass, nothing on the driver). A
 * violation fails the write before any commit; the log never sees the bad
 * batch. Null semantics are SQL-standard CHECK: NULL passes, only a
 * definite FALSE rejects.
 *
 * Generated columns (`graft.generated.<col> = <sql expr>`, Delta's
 * `GENERATED ALWAYS AS (expr)` in property form): the ingest projection
 * rewrites the column slot so a NULL arriving there is COMPUTED from the
 * expression — Spark's by-name INSERT fills omitted columns with NULL, so
 * simply omitting the column computes it — while a provided non-NULL value
 * must EQUAL the expression (null-safe) or the write fails pre-commit.
 * (Delta rejects explicit NULLs instead of computing them; folding the
 * omitted-column and explicit-NULL cases into "compute" keeps the
 * one-projection codegen shape and is strictly more permissive.) The
 * expression may reference only non-generated columns of the same row —
 * validated at `ALTER TABLE ... SET TBLPROPERTIES` time, like constraint
 * expressions, so typos fail the ALTER and not a later ingest.
 *
 * Row-level rewrites (UPDATE/MERGE ReplaceData/WriteDelta) carry
 * pre-existing rows and are out of scope by design — parity with the
 * ingest-side enforcement this engine's CDA write path needs.
 */
case class GwConstraintRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case a @ AppendData(r: DataSourceV2Relation, query, _, _, _, _)
        if needsWrap(r, query) =>
      a.copy(query = wrapAll(r, query))
    case o @ OverwriteByExpression(r: DataSourceV2Relation, _, query, _, _, _, _)
        if needsWrap(r, query) =>
      o.copy(query = wrapAll(r, query))
    case o @ OverwritePartitionsDynamic(r: DataSourceV2Relation, query, _, _, _)
        if needsWrap(r, query) =>
      o.copy(query = wrapAll(r, query))
    // the V2 STREAMING write face (`writeStream.toTable`): each
    // micro-batch's IncrementalExecution re-analyzes the plan with this
    // node at the root, so the same wrap binds per batch — without it,
    // streaming ingest would bypass the table's declared constraints
    // (the V1/foreachBatch face is enforced sink-side)
    case w: org.apache.spark.sql.execution.streaming.sources.WriteToMicroBatchDataSource
        if w.relation.exists(r => needsWrap(r, w.query)) =>
      w.copy(query = wrapAll(w.relation.get, w.query))
  }

  private def needsWrap(r: DataSourceV2Relation, query: LogicalPlan): Boolean =
    query.resolved && query.output.nonEmpty &&
      (constraintsOf(r).nonEmpty || generatedOf(r).nonEmpty ||
        identityOf(r).nonEmpty) &&
      !alreadyWrapped(query)

  private def propsOf(r: DataSourceV2Relation, prefix: String): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    r.table.properties().asScala.toSeq
      .collect { case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v }
      .sortBy(_._1)
  }

  private def constraintsOf(r: DataSourceV2Relation): Seq[(String, String)] =
    propsOf(r, graft.GwTable.ConstraintPrefix)

  private def generatedOf(r: DataSourceV2Relation): Seq[(String, String)] =
    propsOf(r, graft.GwTable.GeneratedPrefix)

  /** (col, start, step, highWaterMark) per identity column. The engine
    * maintains `graft.identity.<col>.highWaterMark`; absent means nothing
    * allocated yet (watermark = start - step). */
  private def identityOf(r: DataSourceV2Relation): Seq[(String, Long, Long, Long)] = {
    val props = propsOf(r, graft.GwTable.IdentityPrefix)
    props.collect {
      case (col, spec) if !col.endsWith(".highWaterMark") =>
        val (start, step) = graft.GwTable.parseIdentitySpec(spec)
        val hw = props.collectFirst {
          case (k, v) if k == s"$col.highWaterMark" => v.toLong
        }.getOrElse(start - step)
        (col, start, step, hw)
    }
  }

  private def alreadyWrapped(query: LogicalPlan): Boolean = query match {
    case p: Project => p.projectList.exists(_.collectFirst { case r: RaiseError => r }.isDefined)
    case _ => false
  }

  private def wrapAll(r: DataSourceV2Relation, query: LogicalPlan): LogicalPlan =
    wrapConstraints(
      identityColumns(generateColumns(query, generatedOf(r)), identityOf(r)),
      constraintsOf(r))

  /** Rewrite each identity column's slot (Delta `GENERATED ALWAYS AS
    * IDENTITY` semantics): a NULL slot (= the column was omitted) receives
    * `hw + step * (monotonically_increasing_id() + 1)` — unique per row,
    * strictly beyond the watermark in the step's direction, gaps allowed
    * (the per-partition id stride), exactly Delta's contract; a provided
    * value raises (ALWAYS forbids explicit values). The plan-time
    * watermark is re-verified at commit from the written files' footer
    * stats ([[graft.streaming.GwSink]]), so a raced allocation aborts
    * typed instead of双 colliding. */
  private def identityColumns(query: LogicalPlan,
      idents: Seq[(String, Long, Long, Long)]): LogicalPlan = {
    if (idents.isEmpty) return query
    import org.apache.spark.sql.catalyst.expressions.{Add, Multiply, MonotonicallyIncreasingID}
    val projected = query.output.map { attr =>
      idents.find(_._1.equalsIgnoreCase(attr.name)) match {
        case None => attr: org.apache.spark.sql.catalyst.expressions.NamedExpression
        case Some((name, _, step, hw)) =>
          val next = Add(Literal(hw),
            Multiply(Literal(step), Add(MonotonicallyIncreasingID(), Literal(1L))))
          val err = RaiseError(Literal(
            s"identity column $name is GENERATED ALWAYS: explicit values " +
              "are not accepted — omit the column (or insert NULL)"))
          val v = If(IsNull(attr), Cast(next, attr.dataType), Cast(err, attr.dataType))
          // the raise_error branch throws, never returns — restore the
          // slot's static nullability for the write's outputResolved
          Alias(if (attr.nullable) v
            else org.apache.spark.sql.catalyst.expressions.KnownNotNull(v),
            attr.name)()
      }
    }
    Project(projected, query)
  }

  /** Rewrite each generated column's slot: NULL computes, a provided value
    * must match the expression. The expression binds against the OTHER
    * output columns only (self/cross-generated references were rejected at
    * set time; binding without the slot makes that structural). */
  private def generateColumns(query: LogicalPlan,
      gens: Seq[(String, String)]): LogicalPlan =
    GwConstraintRule.generateColumnsPlan(spark, query, gens)

  private def wrapConstraints(query: LogicalPlan,
      constraints: Seq[(String, String)]): LogicalPlan =
    GwConstraintRule.wrapConstraintsPlan(spark, query, constraints)
}

object GwConstraintRule {

  private[graftbridge] def generateColumnsPlan(spark: SparkSession,
      query: LogicalPlan, gens: Seq[(String, String)]): LogicalPlan = {
    if (gens.isEmpty) return query
    val projected = query.output.map { attr =>
      gens.find(_._1.equalsIgnoreCase(attr.name)) match {
        case None => attr: org.apache.spark.sql.catalyst.expressions.NamedExpression
        case Some((name, sql)) =>
          val others = query.output.filterNot(_.name.equalsIgnoreCase(name))
          val expected = Cast(bindExpr(spark, sql, others), attr.dataType)
          val err = RaiseError(Literal(
            s"generated column $name = ($sql) does not match the value " +
              "provided by the ingest"))
          val v = If(IsNull(attr), expected,
            If(EqualNullSafe(attr, expected), attr, Cast(err, attr.dataType)))
          // computing for a NULL slot genuinely widens nullability only if
          // the generation expression itself is nullable; the raise branch
          // must not (it throws)
          Alias(if (attr.nullable || expected.nullable) v
            else org.apache.spark.sql.catalyst.expressions.KnownNotNull(v),
            attr.name)()
      }
    }
    Project(projected, query)
  }

  private[graftbridge] def wrapConstraintsPlan(spark: SparkSession,
      query: LogicalPlan, constraints: Seq[(String, String)]): LogicalPlan = {
    if (constraints.isEmpty) return query
    val head = query.output.head
    val guarded = constraints.foldLeft(head: Expression) { case (inner, (name, sql)) =>
      val cond = bind(spark, sql, query.output)
      // SQL-standard CHECK: NULL passes, only definite FALSE rejects
      val pass = Or(IsNull(cond), cond)
      val err = RaiseError(Literal(
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

  /** CHECK-constraint + generated-column enforcement on the DataFrame
    * face — what the PATH-BASED sink ingest paths apply
    * (`GwSink.append` / `overwrite` / `replaceWhere`): the catalog
    * analysis rule above only sees DSv2 write plans, so a
    * `df.write.format("gwdelta").save(path)` against a table carrying
    * `graft.constraints.*` / `graft.generated.*` would otherwise bypass
    * its own declared invariants entirely (Delta enforces them on every
    * write). Same wrap shapes, same typed RaiseErrors; generated-column
    * enforcement on this face is also what keeps the generated-column
    * PARTITION PRUNING derivation ([[GwGeneratedPruning]]) sound — no
    * write path can land a row where the generated column disagrees
    * with its expression. Nothing declared = the frame returns
    * untouched. */
  def enforce(df: org.apache.spark.sql.DataFrame,
      config: Map[String, String]): org.apache.spark.sql.DataFrame = {
    def props(prefix: String): Seq[(String, String)] = config.toSeq
      .collect { case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v }
      .sortBy(_._1)
    val cs = props(graft.GwTable.ConstraintPrefix)
    val gens = props(graft.GwTable.GeneratedPrefix)
    if (cs.isEmpty && gens.isEmpty) df
    else {
      val spark = df.sparkSession
      Bridge.ofRows(spark,
        wrapConstraintsPlan(spark,
          generateColumnsPlan(spark, df.queryExecution.analyzed, gens), cs))
    }
  }

  /** Parse `sql`, bind its attribute references against `out` by
    * case-insensitive name, and run the analyzer's type coercion (so e.g.
    * `bigint_col * 2` gets its literal promoted exactly as it would in a
    * SELECT) — the expression must come out fully resolved. */
  private[graftbridge] def bindExpr(
      spark: SparkSession, sql: String, out: Seq[Attribute]): Expression = {
    val parsed = spark.sessionState.sqlParser.parseExpression(sql)
    val bound = parsed.transformUp {
      case u: UnresolvedAttribute =>
        out.find(_.name.equalsIgnoreCase(u.nameParts.mkString(".")))
          .getOrElse(throw new IllegalArgumentException(
            s"expression references unknown column '${u.nameParts.mkString(".")}'" +
              s" (have: ${out.map(_.name).mkString(", ")})"))
    }
    val probe = Project(
      Seq(Alias(bound, "__gw_expr")()),
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(out))
    val analyzed = spark.sessionState.analyzer.execute(probe)
    spark.sessionState.analyzer.checkAnalysis(analyzed)
    analyzed.collectFirst { case Project(Seq(a: Alias), _) => a.child }
      .getOrElse(throw new IllegalStateException(
        s"analyzer did not return the probed expression for: $sql"))
  }

  /** [[bindExpr]] + require a boolean result (CHECK constraint shape). */
  private[graftbridge] def bind(
      spark: SparkSession, sql: String, out: Seq[Attribute]): Expression = {
    val bound = bindExpr(spark, sql, out)
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
    bind(spark, sql, attrsOf(schema))
  }

  /** Set-time validation for a generated column: the column must exist,
    * and the expression must parse, bind against the OTHER non-generated
    * columns (Delta's rule: a generation expression may not reference
    * itself or another generated column), and be castable to the column's
    * declared type. `allGenerated` = every generated column name being
    * declared (this ALTER's set plus the ones already on the table). */
  def validateGenerated(spark: SparkSession, colName: String, sql: String,
      schema: StructType, allGenerated: Set[String]): Unit = {
    val field = schema.fields.find(_.name.equalsIgnoreCase(colName))
      .getOrElse(throw new IllegalArgumentException(
        s"generated column '$colName' is not in the table schema " +
          s"(${schema.fieldNames.mkString(", ")})"))
    val lowerGen = allGenerated.map(_.toLowerCase)
    val others = attrsOf(schema).filterNot(a =>
      lowerGen.contains(a.name.toLowerCase))
    val bound = bindExpr(spark, sql, others)
    if (!org.apache.spark.sql.catalyst.expressions.Cast
        .canCast(bound.dataType, field.dataType))
      throw new IllegalArgumentException(
        s"generated column '$colName' has type ${field.dataType.sql} but its " +
          s"expression types as ${bound.dataType.sql}: $sql")
  }

  private def attrsOf(schema: StructType): Seq[Attribute] =
    schema.fields.toSeq.map(f =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        f.name, f.dataType, f.nullable)())
}
