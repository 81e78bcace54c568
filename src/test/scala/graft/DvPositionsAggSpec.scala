package graft

import graft.functions.DvPositionsAgg
import org.apache.spark.sql.functions.col

/** The merge-on-read DV build's map-side-combining aggregate: value parity
  * with the serialize-of-sorted-distinct-array contract, duplicate
  * positions collapsing (the union with a file's EXISTING DV), and the
  * partial/final plan shape that keeps the exchange packed-blob-sized. */
class DvPositionsAggSpec extends SparkSpec {
  import spark.implicits._

  test("bitmap equals serialize(sorted distinct positions), per file") {
    val rows = Seq(
      ("f1", 7L), ("f1", 3L), ("f1", 7L), ("f1", 0L), // dup 7
      ("f2", 100000L), ("f2", 99999L), ("f2", 100000L))
    val got = rows.toDF("dv_path", "pos")
      .repartition(4) // positions split across partitions: partials must merge
      .groupBy(col("dv_path"))
      .agg(DvPositionsAgg(col("pos")).as("dv"))
      .select(col("dv_path"), col("dv.bitmap"), col("dv.card"))
      .as[(String, Array[Byte], Long)]
      .collect().map(r => r._1 -> ((r._2.toSeq, r._3))).toMap
    val expect = rows.groupBy(_._1).map { case (p, rs) =>
      val sorted = rs.map(_._2).distinct.sorted.toArray
      p -> ((graft.log.RoaringBitmapArray.serialize(sorted).toSeq, sorted.length.toLong))
    }
    assert(got == expect,
      "aggregate bitmap/cardinality must be byte-identical to the direct serialize")
  }

  test("buffer serde round-trips (sort-based fallback path)") {
    val agg = DvPositionsAgg(Bridge2.expr(col("pos")))
    val buf = agg.createAggregationBuffer()
    Seq(5L, 1L, 5L, 9L).foreach(buf.append)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sortedDistinct().toSeq == Seq(1L, 5L, 9L))
  }

  test("plan: partial aggregation below the exchange, final above") {
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, Final}
    val frame = (1 to 1000).map(i => (s"f${i % 3}", i.toLong)).toDF("dv_path", "pos")
      .repartition(4)
      .groupBy(col("dv_path"))
      .agg(DvPositionsAgg(col("pos")).as("dv"))
    val plan = frame.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val aggs = plan.collect { case a: ObjectHashAggregateExec => a }
    assert(aggs.size == 2, s"expected partial+final ObjectHashAggregate, got:\n$plan")
    assert(aggs.exists(_.aggregateExpressions.forall(_.mode == Partial)) &&
      aggs.exists(_.aggregateExpressions.forall(_.mode == Final)),
      s"partial/final split expected:\n$plan")
    val ex = plan.collect { case e: ShuffleExchangeExec => e }
    assert(ex.nonEmpty && ex.head.child.collectFirst {
      case a: ObjectHashAggregateExec => a
    }.exists(_.aggregateExpressions.forall(_.mode == Partial)),
      "positions must be packed per (file x partition) BEFORE the shuffle")
  }
}

/** Column->Expression for the serde test (Bridge is in a spark package). */
private object Bridge2 {
  def expr(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)
}
