package graft

import graft.log.AddFile
import graft.sources.{Manifest, SchemaProbe}
import java.nio.file.Paths
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types._

class SchemaProbeSpec extends SparkSpec {
  private val conf = new Configuration()

  test("footer schema inference on example.snappy.parquet") {
    val p = Paths.get(getClass.getResource("/example.snappy.parquet").toURI).toString
    val schema = SchemaProbe.readSchema(conf, p)
    assert(schema.isDefined)
    assert(schema.get.fieldNames.toSeq == Seq("firstName", "lastName", "age"))
    assert(schema.get("age").dataType == IntegerType)
  }

  test("inference matches spark.read.parquet schema on testdata") {
    for (t <- Seq("lineitem", "embeddings", "events", "documents")) {
      val p = s"/root/testdata/sf0.001/$t.parquet"
      val viaSpark = spark.read.parquet(p).schema
      val viaProbe = SchemaProbe.readSchema(conf, p)
      assert(viaProbe.isDefined, t)
      // pyarrow files carry no spark footer key -> exercises our converter;
      // compare names and types (nullability may differ: parquet optional)
      assert(viaProbe.get.fields.map(f => (f.name, f.dataType)).toSeq ==
        viaSpark.fields.map(f => (f.name, f.dataType)).toSeq, t)
    }
  }

  test("recursive probe falls back past unreadable files and reads 0-row footers") {
    val good = Paths.get(getClass.getResource("/example.snappy.parquet").toURI).toString
    // 0-row (footer-only) parquet written on the fly
    val tmp = java.nio.file.Files.createTempDirectory("probe").toString
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("x", LongType)))).write.parquet(s"$tmp/zero")
    val zeroFile = new java.io.File(s"$tmp/zero").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head.getAbsolutePath
    val zeroSchema = SchemaProbe.readSchema(conf, zeroFile)
    assert(zeroSchema.contains(StructType(Seq(StructField("x", LongType, nullable = true)))))
    // bogus file first (smaller) -> probe must fall through to the good one
    val bogus = s"$tmp/bogus.parquet"
    java.nio.file.Files.write(Paths.get(bogus), "notparquet".getBytes)
    val probed = SchemaProbe.readSchemaFromFiles(conf,
      Seq(AddFile(bogus, 5, 0), AddFile(good, 1000, 0)))
    assert(probed.isDefined)
    assert(probed.get.fieldNames.toSeq == Seq("firstName", "lastName", "age"))
  }

  test("manifest fixtures parse (both shapes, path normalization)") {
    for (res <- Seq("/manifest.json", "/guidewire/manifest.json")) {
      val text = new String(java.nio.file.Files.readAllBytes(
        Paths.get(getClass.getResource(res).toURI)))
      val m = Manifest.parse(text)
      assert(m.nonEmpty)
      m.values.foreach { e =>
        assert(!e.dataPath.endsWith("/"))
        assert(e.schemaHistory.nonEmpty)
        assert(e.lastWriteTs > 0)
      }
    }
    val single = Manifest.parse(new String(java.nio.file.Files.readAllBytes(
      Paths.get(getClass.getResource("/manifest.json").toURI))))
    assert(single.keySet == Set("databricks"))
    assert(single("databricks").dataPath == "databricks")
  }
}
