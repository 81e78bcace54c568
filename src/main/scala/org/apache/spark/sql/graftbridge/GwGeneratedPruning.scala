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
 * streaming plans, [[GwConstraintRule.enforce]] on the path sink), and
 * rows that PRE-DATE the declaration are validated when the
 * `graft.generated.*` property is set ([[graft.GwTable.updateProperties]]
 * scans existing data and rejects the ALTER on any violating row — Delta
 * sidesteps the same hole by only allowing generation expressions at
 * CREATE). So the derivation only has to respect monotonicity. Zone
 * wobble — DST transitions make micros→wall-clock non-monotone by up to
 * an hour, and a reader session zone may differ from the writer's (up to
 * ~26h split) — is absorbed by WIDENING every derived bound by a margin
 * sized to the TRUNCATION UNIT of the expression: 2 days for
 * day-or-finer granularity (covers the full zone split), one whole unit
 * plus 2 days for `date_trunc`/`trunc` to week/month/quarter/year (a
 * zone split near a unit boundary shifts the generated value by an
 * entire unit, not just the wobble), 1 for `year()`. At most a few extra
 * partitions scan, and a pruned file provably holds no matching row.
 * Derivation skips column-mapped tables, multi-source or non-whitelisted
 * expressions, unknown truncation formats, and NULL evaluations —
 * skipping only costs pruning, never correctness (null X rows cannot
 * satisfy the range predicate on X anyway).
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
        widen <- widenFor(bound)
        cr <- foldRanges(constraints.filter(c =>
          c.column.equalsIgnoreCase(src.name) &&
            (c.lower.nonEmpty || c.upper.nonEmpty)))
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

  /** Widening margin in the OUTPUT column's stats encoding (see
    * soundness note above). The margin scales with the TRUNCATION UNIT,
    * not just the output type: `date_trunc('month', ts)` under a
    * writer/reader zone split near a month boundary shifts the generated
    * value by a whole month — a flat 2-day margin would prune files that
    * hold matching rows. One whole unit (max-length: 366/92/31/7 days)
    * plus the 2-day wobble covers any split; unknown formats derive
    * nothing. */
  private def widenFor(gen: Expression): Option[BigDecimal] = {
    val units = gen.collect {
      case t: TruncTimestamp => t.format
      case t: TruncDate => t.format
    }.map {
      case Literal(f: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        unitDays(f.toString)
      case _ => None // non-literal format: not derivable
    }
    if (units.exists(_.isEmpty)) return None
    val unitMargin = (units.flatten :+ 0L).max + 2L // days
    gen.dataType match {
      case DateType => Some(BigDecimal(unitMargin))
      case IntegerType => Some(BigDecimal(1)) // year(x): one year unit
      case TimestampType | TimestampNTZType =>
        Some(BigDecimal(unitMargin * 86400L * 1000000L)) // micros
      case _ => None
    }
  }

  /** Max length in days of a trunc unit; 0 for day-or-finer granularity
    * (the flat 2-day wobble margin already covers those); None =
    * unrecognized format (trunc evaluates it to NULL — skip derivation). */
  private def unitDays(fmt: String): Option[Long] =
    fmt.toLowerCase(java.util.Locale.ROOT) match {
      case "year" | "yyyy" | "yy" => Some(366L)
      case "quarter" => Some(92L)
      case "month" | "mm" | "mon" => Some(31L)
      case "week" => Some(7L)
      case "day" | "dd" | "hour" | "minute" | "second" |
           "millisecond" | "microsecond" => Some(0L)
      case _ => None
    }

  /** Fold every pushed range on the source column into one combined
    * [lower, upper]: a BETWEEN arrives as TWO one-sided ColRanges (the
    * And split in `GwPruningScan.rangeOf`), so taking only the first
    * would miss one side. Tightest numeric bound wins per side; string
    * bounds are skipped (evalAt cannot use them anyway). */
  private def foldRanges(crs: Seq[ColRange]): Option[ColRange] = {
    if (crs.isEmpty) return None
    val los = crs.flatMap(_.lower).collect { case n: Bound.Num => n.v }
    val his = crs.flatMap(_.upper).collect { case n: Bound.Num => n.v }
    if (los.isEmpty && his.isEmpty) None
    else Some(ColRange(crs.head.column,
      if (los.isEmpty) None else Some(Bound.Num(los.max)),
      if (his.isEmpty) None else Some(Bound.Num(his.min))))
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
