package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/JIT/FS metadata so the first timed query doesn't
    // absorb JVM startup (was ~5s of pure warmup on whichever query ran
    // first); touches each input table's footer without timing it
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
      // warmup must never abort the bench (per-query failures are reported
      // in the JSON instead)
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // n runs per query, report the per-query MIN: the bench host has ~3x
    // load noise, and the min is the least-noisy estimator of the plan's
    // intrinsic cost (regressions show as a raised floor, not a bad draw)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runs")
    var failed = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        if (failed.contains(name)) None // don't re-run a known-failing query
        else {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            failed ::= name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            Some((System.nanoTime() - t0) / 1e9)
          }
        }
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
