package org.apache.spark.sql.graftbridge

import scala.util.Try

import graft.log.{Bound, ColRange, Snapshot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression, Literal, RuntimeReplaceable, TruncDate, TruncTimestamp, Year}
import org.apache.spark.sql.types._

/**
 * Generated-column partition/stats filter DERIVATION (Delta parity:
 * "generated column partition filters"): when a column is declared
 * `graft.generated.P = <expr>` over a single source column X through a
 * MONOTONE date-family expression — `CAST(x AS DATE)`, `to_date(x)`,
 * `date_trunc(unit, x)`, `trunc(x, fmt)`, `year(x)` (including the
 * implicit casts type coercion inserts) — a pushed range predicate on X
 * derives a range constraint on P, so `WHERE ts >= '2024-06-01'` prunes
 * a `day = CAST(ts AS DATE)` partitioned table's directories without the
 * user ever mentioning `day`. At 100 TB this is the classic star-schema
 * ingest shape: nobody filters on the derived partition column, everyone
 * filters on the event timestamp.
 *
 * Soundness: the generation invariant (P = expr(X) for every row) is
 * enforced on EVERY write face ([[GwConstraintRule]] on catalog +
 * streaming plans, [[GwConstraintRule.enforce]] on the path sink), so
 * the derivation only has to respect monotonicity. Zone wobble —
 * DST transitions make micros→wall-clock non-monotone by up to an hour,
 * and a reader session zone may differ from the writer's — is absorbed
 * by WIDENING every derived bound by a unit margin (2 days for
 * date-family outputs, covering even a ±14h writer/reader zone split; 1
 * for `year`): at most a couple of extra partitions scan, and a pruned
 * file provably holds no matching row. Derivation skips column-mapped
 * tables, multi-source or non-whitelisted expressions, and NULL
 * evaluations — skipping only costs pruning, never correctness (null X
 * rows cannot satisfy the range predicate on X anyway).
 */
object GwGeneratedPruning {

  def derive(spark: SparkSession, snapshot: Snapshot,
      constraints: Seq[ColRange]): Seq[ColRange] = {
    if (constraints.isEmpty) return Nil
    val config = snapshot.metadata.map(_.configuration).getOrElse(Map.empty)
    val gens = config.toSeq.collect {
      case (k, v) if k.startsWith(graft.GwTable.GeneratedPrefix) =>
        k.stripPrefix(graft.GwTable.GeneratedPrefix) -> v
    }
    if (gens.isEmpty) return Nil
    val schema = snapshot.schema
    if (graft.log.ColumnMapping.hasMapping(schema)) return Nil
    val attrs = schema.fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
    gens.flatMap { case (pcol, sql) =>
      for {
        field <- schema.fields.find(_.name.equalsIgnoreCase(pcol))
        bound <- Try(GwConstraintRule.bindExpr(spark, sql, attrs)).toOption
        src <- sourceAttr(bound)
        if temporalSource(src.dataType)
        widen <- widenFor(bound.dataType)
        cr <- constraints.find(c => c.column.equalsIgnoreCase(src.name) &&
          (c.lower.nonEmpty || c.upper.nonEmpty))
        derived <- {
          val lo = cr.lower.flatMap(evalAt(bound, src, _)).map(v => Bound.Num(v - widen))
          val hi = cr.upper.flatMap(evalAt(bound, src, _)).map(v => Bound.Num(v + widen))
          if (lo.isEmpty && hi.isEmpty) None
          else Some(ColRange(field.name, lo, hi, minStatsVersion(bound.dataType)))
        }
      } yield derived
    }
  }

  /** Timestamp-typed derived bounds are micros: trust v2 stats only,
    * exactly like direct timestamp predicates. */
  private def minStatsVersion(out: DataType): Int = out match {
    case TimestampType | TimestampNTZType => 2
    case _ => 0
  }

  /** Unit margin per output type (see soundness note above). */
  private def widenFor(out: DataType): Option[BigDecimal] = out match {
    case DateType => Some(BigDecimal(2)) // days
    case IntegerType => Some(BigDecimal(1)) // year(x)
    case TimestampType | TimestampNTZType =>
      Some(BigDecimal(2L * 86400L * 1000000L)) // micros
    case _ => None
  }

  private def temporalSource(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  /** The single source attribute, provided the WHOLE expression tree is
    * built from the monotone whitelist. */
  private def sourceAttr(e: Expression): Option[AttributeReference] = {
    val as = e.collect { case a: AttributeReference => a }
    if (as.length == 1 && monotoneOnly(e)) Some(as.head) else None
  }

  private def monotoneOnly(e: Expression): Boolean = e match {
    case _: AttributeReference | _: Literal => true
    case c: Cast => temporalPair(c.child.dataType, c.dataType) && monotoneOnly(c.child)
    case y: Year => monotoneOnly(y.child)
    case t: TruncTimestamp =>
      t.format.isInstanceOf[Literal] && monotoneOnly(t.timestamp)
    case t: TruncDate =>
      t.format.isInstanceOf[Literal] && monotoneOnly(t.date)
    case r: RuntimeReplaceable => monotoneOnly(r.replacement)
    case _ => false
  }

  /** Casts within the date/timestamp family are monotone (modulo the
    * zone wobble the widening absorbs); anything else is not claimed. */
  private def temporalPair(from: DataType, to: DataType): Boolean =
    temporalSource(from) && temporalSource(to)

  /** Evaluate the generation expression at a boundary value of the
    * source column. The bound travels in the stats encoding (micros for
    * timestamps, epoch days for dates); the result comes back in the
    * OUTPUT column's stats encoding. */
  private def evalAt(gen: Expression, src: AttributeReference,
      b: Bound): Option[BigDecimal] = b match {
    case Bound.Str(_) => None
    case Bound.Num(v) => Try {
      val lit = src.dataType match {
        case TimestampType | TimestampNTZType =>
          Literal(v.toLongExact, src.dataType)
        case DateType => Literal(v.toIntExact, DateType)
        case other => return None
      }
      val substituted = gen.transformUp {
        case a: AttributeReference if a.exprId == src.exprId => lit
      }
      // RuntimeReplaceable (to_date & co) carries no eval of its own
      val runnable = substituted.transformUp {
        case r: RuntimeReplaceable => r.replacement
      }
      runnable.eval(null) match {
        case i: java.lang.Integer => Some(BigDecimal(i.intValue()))
        case l: java.lang.Long => Some(BigDecimal(l.longValue()))
        case _ => None
      }
    }.toOption.flatten
  }
}
