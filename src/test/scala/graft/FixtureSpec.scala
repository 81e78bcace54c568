package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Fixture-drift tripwire: the driver REGENERATES /root/testdata between
 * rounds and has already changed a physical type once (events.ts,
 * round 5 — it silently broke 13 queries at analysis time). This spec
 * pins the Spark-visible schema of every fixture table, so the next
 * regeneration fails HERE with a diff-style message naming exactly what
 * moved, instead of as a scatter of downstream analysis errors.
 *
 * Columns with engine-side adaptivity get a SET of accepted types
 * (events.ts goes through graft.functions.EventTime and legitimately
 * varies); everything else is exact.
 */
class FixtureSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** table -> (column -> accepted Spark types). */
  private val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> Set(TimestampType, TimestampNTZType),
      "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> Set(TimestampType, TimestampNTZType)),
    "events" -> Seq(
      "event_id" -> Set(LongType),
      // adaptive via graft.functions.EventTime — all three encodings OK
      "ts" -> Set(LongType, TimestampType, TimestampNTZType),
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Seq(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Set(LongType),
      // float is the shipped encoding; double is tolerated — VecDot and
      // the quantization/LSH paths are element-type adaptive (guard below)
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false),
        ArrayType(DoubleType), ArrayType(DoubleType, false)),
      "label" -> Set(IntegerType)))

  test("driver fixture schemas match what the query surface binds against") {
    val drift = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val actual = spark.read.parquet(s"$sf/$table.parquet").schema
      val actualByName = actual.fields.map(f => f.name -> f.dataType).toMap
      val missing = cols.collect {
        case (c, _) if !actualByName.contains(c) => s"$table.$c: MISSING"
      }
      val changed = cols.collect {
        case (c, ok) if actualByName.get(c).exists(t => !ok.contains(t)) =>
          s"$table.$c: ${actualByName(c)} (accepted: ${ok.mkString(" | ")})"
      }
      val extra = actual.fieldNames.filterNot(cols.map(_._1).toSet)
        .map(c => s"$table.$c: UNEXPECTED NEW COLUMN (harmless, update FixtureSpec)")
      missing ++ changed ++ extra
    }
    assert(drift.isEmpty,
      "the driver regenerated /root/testdata with a different shape — " +
        "fix the affected operators (see events-ts round-5 postmortem in " +
        s"SCALE.md / EventTime) then update this pin:\n  ${drift.mkString("\n  ")}")
  }

  test("similarity ops are embedding-element-type invariant (float vs double)") {
    import org.apache.spark.sql.functions._
    import graft.api.Pipelines
    val f = spark.read.parquet(s"$sf/embeddings.parquet")
    // same VALUES, double encoding — the drift a fixture regeneration
    // could introduce; every result must be bit-identical because the
    // engine computes in doubles either way
    val d = f.withColumn("embedding", col("embedding").cast("array<double>"))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq.toSeq).toSeq.sortBy(_.mkString("|"))
    def topk(src: org.apache.spark.sql.DataFrame) =
      Pipelines.cosineTopK(src, src.filter(col("vec_id") < 5),
        col("vec_id"), col("embedding"), k = 3)
    def ann(src: org.apache.spark.sql.DataFrame) =
      Pipelines.annTopK(src, src.filter(col("vec_id") < 5),
        col("vec_id"), col("embedding"), k = 3, dim = 64, nPlanes = 32, bands = 8)
    def quant(src: org.apache.spark.sql.DataFrame) =
      Pipelines.quantizeEmbeddings(src, col("vec_id"), col("embedding"))
        .select("vec_id", "scale_micro", "qsum", "qnorm2")
    assert(canon(topk(f)) == canon(topk(d)), "cosineTopK diverged on dtype")
    assert(canon(ann(f)) == canon(ann(d)), "annTopK diverged on dtype")
    assert(canon(quant(f)) == canon(quant(d)), "quantization diverged on dtype")
  }
}
