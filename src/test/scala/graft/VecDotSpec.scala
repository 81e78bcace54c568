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
}
