package graft.tools

import graft.api.Pipelines
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the MinHash+LSH dedup pipeline: times each stage of
  * `Pipelines.minHashDedupPairs` in isolation so bench regressions can be
  * attributed. Not part of the library surface. */
object ProfileD02 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PROF $label ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"PROF docs=${docs.count()}")

    val numPerm = 32; val bands = 8; val rowsPerBand = numPerm / bands
    val sh = Pipelines.shingleRows(docs, col("doc_id"), col("text")).persist()
    time("shingle_distinct_cache")(sh.count())

    val mhCols = (0 until numPerm).map(p => min(xxhash64(lit(p), col("s"))).as(s"mh$p"))
    val mh = sh.groupBy("__id").agg(mhCols.head, mhCols.tail: _*).persist()
    time("minhash_agg")(mh.count())

    val bandCols = (0 until bands).map { b =>
      xxhash64((lit(b) +: (0 until rowsPerBand).map(i => col(s"mh${b * rowsPerBand + i}"))): _*)
    }
    val banded = mh.select(col("__id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket").persist()
    time("banding")(banded.count())

    val candidates = banded.select(col("band"), col("bucket"), col("__id").as("doc_a"))
      .join(banded.select(col("band"), col("bucket"), col("__id").as("doc_b")),
        Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct().persist()
    val nCand = time("candidates")(candidates.count())
    println(s"PROF nCandidates=$nCand")

    val sizes = sh.groupBy("__id").agg(count(lit(1)).as("sz"))
    val inter = candidates
      .join(sh.select(col("__id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(sh.select(col("__id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    time("verify_join") {
      inter
        .join(sizes.select(col("__id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
        .join(sizes.select(col("__id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
        .count()
    }

    time("full_operator") {
      Pipelines.minHashDedupPairs(docs, col("doc_id"), col("text"), 32, 8, 0.5).count()
    }
    spark.stop()
  }
}
