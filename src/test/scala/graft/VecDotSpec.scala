package graft

import graft.functions.VecDot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native expression must be numerically identical to the declarative
  * sequential fold it replaces (the oracle contract). */
class VecDotSpec extends AnyFunSuite {
  private val spark = SparkSpec.session
  import spark.implicits._

  private def foldDot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the zip_with/aggregate fold on float arrays") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = df.select(col("vec_id"), col("embedding").as("x"))
    val b = df.select((col("vec_id") + 7).as("vec_id"), col("embedding").as("y"))
    val j = a.join(b, "vec_id")
    val diffs = j.select(
      (VecDot(col("x"), col("y")) - foldDot(col("x"), col("y"))).as("d"))
      .filter(col("d") =!= 0.0)
    assert(diffs.count() == 0)
  }

  test("mixed float/double-literal arrays and interpreted eval agree with codegen") {
    val planes = graft.api.Pipelines.hyperplanes(2, 4)
    val df = Seq((1L, Array(1.0f, 2.0f, -3.0f, 0.5f))).toDF("id", "v")
    val expected = planes.map(p =>
      ((1.0 * p(0)) + (2.0 * p(1))) + (-3.0 * p(2)) + (0.5 * p(3)))
    val got = df.select(VecDot(col("v"), lit(planes(0))), VecDot(col("v"), lit(planes(1))))
      .collect().head
    assert(got.getDouble(0) == expected(0) && got.getDouble(1) == expected(1))
  }

  test("empty and length-mismatched arrays fold over the common prefix") {
    val df = Seq((Array.empty[Float], Array(1.0f)),
      (Array(2.0f, 4.0f), Array(3.0f))).toDF("x", "y")
    val got = df.select(VecDot(col("x"), col("y")).as("d")).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.0, 6.0))
  }

  test("SQL registration: vec_dot and simhash_agg callable from spark.sql") {
    GraftExtensions.register(spark)
    val d = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head.getDouble(0)
    assert(d == 11.0)
    Seq((1L, 42L, 2L), (1L, 7L, 1L)).toDF("g", "h", "w").createOrReplaceTempView("sh_in")
    val fp = spark.sql("SELECT simhash_agg(h, w) AS fp FROM sh_in GROUP BY g")
      .head.getLong(0)
    // votes: bits of 42 get +2, others -2; bits of 7 get +1, others -1 —
    // positive total only where both agree or 42's weight wins
    val expected = {
      val votes = Array.tabulate(64) { j =>
        (if (((42L >> j) & 1L) == 1L) 2L else -2L) +
          (if (((7L >> j) & 1L) == 1L) 1L else -1L)
      }
      votes.zipWithIndex.collect { case (v, j) if v > 0 => 1L << j }.sum
    }
    assert(fp == expected)
  }
}
