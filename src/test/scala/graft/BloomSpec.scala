package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import graft.log.Bloom

/** Log-level Bloom file skipping: codec properties (no false negative,
  * honest FP band), sizing, the write-path build + read-path probe E2E,
  * and the property validation. */
class BloomSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("codec: inserted values always hit; absent values mostly miss") {
    val bits = new Array[Byte](Bloom.MinBits / 8)
    val present = (0 until 1000).map(i => Bloom.hashLiteral(s"val-$i"))
    present.foreach(h => Bloom.set(bits, h))
    assert(present.forall(h => Bloom.mightContain(bits, h)),
      "a bloom can never false-negative")
    val absent = (0 until 1000).count(i =>
      Bloom.mightContain(bits, Bloom.hashLiteral(s"other-$i")))
    assert(absent < 100, s"FP rate out of band: $absent/1000")
    // sizing: grows with rows, clamped both ends
    assert(Bloom.bitsFor(10) == Bloom.MinBits)
    assert(Bloom.bitsFor(10000) == 1 << 18)
    assert(Bloom.bitsFor(Long.MaxValue / 32) == Bloom.MaxBits)
  }

  test("build + probe E2E: point lookups skip files, conservatively") {
    val dir = Files.createTempDirectory("bloom").resolve("nation").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
    // two files interleaved by key parity: min/max ranges fully overlap
    Seq(0, 1).foreach { m =>
      graft.streaming.GwSink.append(
        src.filter(col("n_nationkey") % 2 === m).coalesce(1), dir,
        bootstrapProps = Map(Bloom.ColumnsProp -> "n_nationkey,n_name"))
    }
    val t = GwTable.forPath(spark, dir)
    val snap = t.snapshot()
    assert(snap.files.forall(f =>
      Bloom.ofFile(f, "n_nationkey").isDefined &&
        Bloom.ofFile(f, "n_name").isDefined))
    // equality constraints resolve through the bloom: key 4 lives in the
    // even file only
    import graft.log.{Bound, ColRange}
    def plannedFor(c: ColRange): Int = snap.filesForRanges(Seq(c)).size
    assert(plannedFor(ColRange("n_nationkey",
      Some(Bound.Num(BigDecimal(4))), Some(Bound.Num(BigDecimal(4))))) == 1)
    // string column equality too
    val name = src.filter(col("n_nationkey") === 7).collect().head.getString(1)
    assert(plannedFor(ColRange("n_name",
      Some(Bound.Str(name)), Some(Bound.Str(name)))) == 1)
    // a value in no file prunes everything; a RANGE constraint never
    // consults the bloom (conservative)
    assert(plannedFor(ColRange("n_nationkey",
      Some(Bound.Num(BigDecimal(999))), Some(Bound.Num(BigDecimal(999))))) == 0)
    assert(plannedFor(ColRange("n_nationkey",
      Some(Bound.Num(BigDecimal(0))), Some(Bound.Num(BigDecimal(24))))) == 2)
    // IN-list constraints probe the bloom per member: {4, 6} both live in
    // the even file; {4, 7} straddles; {990, 999} hits nothing
    def inRange(vs: Int*): ColRange = {
      val bs = vs.map(v => Bound.Num(BigDecimal(v)))
      ColRange("n_nationkey", Some(bs.head), Some(bs.last), anyOf = bs)
    }
    assert(plannedFor(inRange(4, 6)) == 1)
    assert(plannedFor(inRange(4, 7)) == 2)
    assert(plannedFor(inRange(990, 999)) == 0)
    // full contents still read correctly through the connector
    assert(spark.read.format("gwdelta").load(dir).count() == 25)
    // maintenance rewrite drops blooms without breaking anything
    assert(t.compact(targetFileBytes = 1L << 30) > 0)
    val folded = t.snapshot().files
    assert(folded.forall(f => Bloom.ofFile(f, "n_nationkey").isEmpty))
    assert(spark.read.format("gwdelta").load(dir)
      .filter(col("n_nationkey") === 4).count() == 1)
  }

  test("property validation: unknown column and non-hashable type refuse") {
    val dir = Files.createTempDirectory("bloomval").resolve("t").toString
    spark.read.parquet(s"$sf/customer.parquet").coalesce(1)
      .write.format("gwdelta").mode("append").save(dir)
    val t = GwTable.forPath(spark, dir)
    intercept[IllegalArgumentException](
      t.updateProperties(Map(Bloom.ColumnsProp -> "nope")))
    intercept[IllegalArgumentException](
      t.updateProperties(Map(Bloom.ColumnsProp -> "c_acctbal"))) // double
    assert(t.updateProperties(Map(Bloom.ColumnsProp -> "c_custkey,c_name")) > 0)
  }
}
