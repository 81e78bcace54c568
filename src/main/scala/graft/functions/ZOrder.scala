package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions.{col, lit, percentile_approx, unix_date}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DateType, DoubleType, IntegerType, LongType, StringType, TimestampNTZType, TimestampType}

/**
 * Z-order (Morton-order) clustering value for multi-column OPTIMIZE.
 *
 * A lexicographic sort on `(a, b)` gives file-level locality on `a` only:
 * every output file spans nearly the whole range of `b`, so the harvested
 * min/max stats can never skip a file for a predicate on `b` alone. The
 * Z-value interleaves the BITS of each column's rank bucket, so sorting by
 * it tiles the key space into hyper-rectangles — every clustered column
 * gets tight per-file bounds and stats pruning bites on any of them. Same
 * role as Delta Lake's `OPTIMIZE ... ZORDER BY` (the reference's platform
 * delegates this to the Databricks runtime; `/root/reference/README.md:45`
 * tells users not to run OPTIMIZE at all).
 *
 * Rank buckets come from equal-FREQUENCY boundaries (quantiles), not
 * equal-width ranges, so skewed columns still spread across the grid:
 *
 *  - numeric / date / timestamp columns: one `percentile_approx` pass
 *    computes every column's boundaries together (driver holds
 *    2^bits doubles per column);
 *  - string columns: a bounded random sample per column (RangePartitioner
 *    style — fixed size, independent of table volume), sorted driver-side,
 *    evenly-spaced picks as boundaries.
 *
 * Bucketing + interleaving run as codegen'd expressions
 * ([[BucketByBoundaries]], [[InterleaveBits]]); the clustered write is
 * `repartitionByRange(zvalue) + sortWithinPartitions(zvalue)` — sampling
 * the z-value like any range write, no driver materialization.
 */
object ZOrder {

  /** Cap on driver-side sampled values per STRING column. */
  private val StringSampleSize = 20000

  /** Bits per column: the finest grid whose interleaved value fits a
    * long. 8 bits (256 buckets) saturates file-level granularity. */
  def bitsFor(nCols: Int): Int = math.max(1, math.min(8, 62 / nCols))

  /** The Z-value column for `cols` of `df`. `estRows` sizes the string
    * sample fraction (pass the stats-known row count; only used for
    * string columns). */
  def zvalue(df: DataFrame, cols: Seq[String], estRows: Long): Column = {
    val bits = bitsFor(cols.size)
    val nBounds = (1 << bits) - 1
    val schema = df.schema
    val normalized: Seq[(Column, DataType)] = cols.map { c =>
      schema(schema.fieldIndex(c)).dataType match {
        case StringType => (col(c), StringType)
        case DateType => (unix_date(col(c)).cast(DoubleType), DoubleType)
        case TimestampNTZType => (col(c).cast(TimestampType).cast(DoubleType), DoubleType)
        case _ => (col(c).cast(DoubleType), DoubleType)
      }
    }

    // one aggregation pass for EVERY numeric column's quantile boundaries
    val numericIdx = normalized.zipWithIndex.collect { case ((_, DoubleType), i) => i }
    val numericBounds: Map[Int, Array[AnyRef]] =
      if (numericIdx.isEmpty) Map.empty
      else {
        val probs = (1 to nBounds).map(_.toDouble / (nBounds + 1))
        val aggs = numericIdx.map(i =>
          percentile_approx(normalized(i)._1, lit(probs.toArray), lit(10000))
            .as(s"__zq$i"))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        numericIdx.zipWithIndex.map { case (i, fieldPos) =>
          val qs =
            if (row.isNullAt(fieldPos)) Array.empty[Double]
            else row.getSeq[Double](fieldPos).toArray
          i -> dedupeSorted(qs.map(java.lang.Double.valueOf(_): AnyRef))
        }.toMap
      }

    val buckets: Seq[Expression] = normalized.zipWithIndex.map { case ((nc, dt), i) =>
      val bounds: Array[AnyRef] = dt match {
        case DoubleType => numericBounds(i)
        case StringType =>
          val frac = math.min(1.0,
            StringSampleSize.toDouble / math.max(1L, estRows))
          val sampled = df.select(nc.as("__zs")).where(nc.isNotNull)
            .sample(withReplacement = false, frac, seed = 0x5eed)
            .collect().map(_.getString(0))
          val sorted = sampled.distinct.sorted
          if (sorted.isEmpty) Array.empty[AnyRef]
          else dedupeSorted((1 to nBounds).map { k =>
            val idx = math.min(sorted.length - 1, k * sorted.length / (nBounds + 1))
            org.apache.spark.unsafe.types.UTF8String.fromString(sorted(idx)): AnyRef
          }.toArray)
      }
      BucketByBoundaries(Bridge.expression(nc), bounds, 1 << bits)
    }
    Bridge.column(InterleaveBits(buckets, bits))
  }

  private def dedupeSorted(a: Array[AnyRef]): Array[AnyRef] = a.distinct
}

/**
 * Rank bucket of a value against sorted boundaries (binary search): the
 * number of boundaries at or below the value — RESCALED onto
 * `[0, scaleTo)` so a low-cardinality column (fewer distinct boundaries
 * than 2^bits) still spreads across its full bit range. Without the
 * rescale its high bits would sit at zero and the other columns would
 * dominate the interleave, silently degrading the Z-curve back to a
 * lexicographic sort. Null (and an empty boundary set) maps to bucket 0 —
 * nulls cluster first, as in a range sort. Boundaries hold boxed Doubles
 * or UTF8Strings (both `Comparable`, UTF8String in binary order — the
 * same order the stats harvest compares strings).
 */
case class BucketByBoundaries(child: Expression, boundaries: Array[AnyRef],
    scaleTo: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "zorder_bucket"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"zorder_bucket expects double or string input, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else BucketByBoundaries.bucket(boundaries, v.asInstanceOf[AnyRef], scaleTo)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bnd = ctx.addReferenceObj("boundaries", boundaries, "java.lang.Object[]")
    val c = child.genCode(ctx)
    val boxed = child.dataType match {
      case DoubleType => s"(Object) java.lang.Double.valueOf(${c.value})"
      case _ => s"(Object) ${c.value}"
    }
    ev.copy(code = code"""
      ${c.code}
      int ${ev.value} = 0;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.BucketByBoundaries.bucket($bnd, $boxed, $scaleTo);
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BucketByBoundaries =
    copy(child = newChild)
}

object BucketByBoundaries {
  /** Shared by interpreted and generated code. */
  def bucket(boundaries: Array[AnyRef], key: AnyRef, scaleTo: Int): Int = {
    if (boundaries.length == 0) return 0
    val idx = java.util.Arrays.binarySearch(
      boundaries.asInstanceOf[Array[AnyRef]], key,
      null.asInstanceOf[java.util.Comparator[AnyRef]])
    val raw = if (idx >= 0) idx + 1 else -(idx + 1)
    // raw in [0, len]: spread onto [0, scaleTo)
    (raw.toLong * (scaleTo - 1) / boundaries.length).toInt
  }
}

/**
 * Morton interleave of the children's low `bits` bits into one long:
 * result bit `i * n + j` = bit `i` of child `j`. Children are rank
 * buckets in `[0, 2^bits)`; `n * bits <= 62` by construction
 * ([[ZOrder.bitsFor]]).
 */
case class InterleaveBits(children: Seq[Expression], bits: Int) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "interleave_bits"

  override def eval(input: InternalRow): Any = {
    var z = 0L
    val n = children.size
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      val b = if (v == null) 0 else v.asInstanceOf[Int]
      var i = 0
      while (i < bits) {
        z |= ((b >> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val codes = children.map(_.genCode(ctx))
    val assigns = codes.zipWithIndex.map { case (c, j) =>
      val safe = if (children(j).nullable) s"(${c.isNull} ? 0 : ${c.value})" else c.value
      (0 until bits).map { i =>
        s"${ev.value} |= ((long)(($safe >> $i) & 1)) << ${i * n + j};"
      }.mkString("\n")
    }.mkString("\n")
    val childEval = codes.foldLeft(code"") { (acc, c) => code"$acc\n${c.code}" }
    ev.copy(code = code"""
      $childEval
      long ${ev.value} = 0L;
      $assigns""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
}
