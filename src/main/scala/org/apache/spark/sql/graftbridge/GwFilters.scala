package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._

/**
 * V1 `Filter` -> `Column` translation for the connector's DELETE surface:
 * Spark resolves `DELETE FROM t WHERE ...` into source filters, and the
 * engine replays them as a Column predicate over its own copy-on-write
 * rewrite ([[graft.GwTable.delete]]). Translation is total over the filter
 * algebra Spark can emit for flat schemas; `None` means "can't express",
 * which `canDeleteWhere` surfaces as an unsupported DELETE instead of a
 * silently wrong one.
 */
private[graftbridge] object GwFilters {

  def toColumn(f: Filter): Option[Column] = f match {
    case AlwaysTrue()                 => Some(lit(true))
    case AlwaysFalse()                => Some(lit(false))
    case And(l, r)                    => for { a <- toColumn(l); b <- toColumn(r) } yield a && b
    case Or(l, r)                     => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case Not(c)                       => toColumn(c).map(!_)
    case EqualTo(a, v)                => ref(a).map(_ === lit(v))
    case EqualNullSafe(a, v)          => ref(a).map(_ <=> lit(v))
    case GreaterThan(a, v)            => ref(a).map(_ > lit(v))
    case GreaterThanOrEqual(a, v)     => ref(a).map(_ >= lit(v))
    case LessThan(a, v)               => ref(a).map(_ < lit(v))
    case LessThanOrEqual(a, v)        => ref(a).map(_ <= lit(v))
    case In(a, vs)                    => ref(a).map(_.isin(vs.toIndexedSeq: _*))
    case IsNull(a)                    => ref(a).map(_.isNull)
    case IsNotNull(a)                 => ref(a).map(_.isNotNull)
    case StringStartsWith(a, v)       => ref(a).map(_.startsWith(v))
    case StringEndsWith(a, v)         => ref(a).map(_.endsWith(v))
    case StringContains(a, v)         => ref(a).map(_.contains(v))
    case _                            => None
  }

  /** gwdelta schemas are flat; a dotted or backquoted attribute would be a
    * nested/escaped reference this translation can't round-trip — refuse. */
  private def ref(attr: String): Option[Column] =
    if (attr.contains('.') || attr.contains('`')) None else Some(col(attr))
}
