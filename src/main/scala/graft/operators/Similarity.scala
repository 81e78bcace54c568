package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table (`Array[Float]`, dim 64).
 *
 * Two paths:
 *  - brute-force cosine top-k: the exact baseline. At scale the query set is
 *    broadcast against the corpus (one narrow pass over corpus splits, then a
 *    per-query top-k window) — no corpus shuffle at all;
 *  - random-hyperplane LSH ANN: the 100 TB path. Each vector gets a compact
 *    bit signature (16 fixed hyperplanes -> 16-bit bucket); candidates are
 *    same-bucket (or neighboring-band) pairs only, so cost tracks bucket
 *    occupancy, not n^2. Recall vs the exact baseline is asserted in
 *    SimilaritySpec.
 */
object Similarity {

  private def embs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Deterministic hyperplanes: fixed seed, data-independent. */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rng = new scala.util.Random(42)
    Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  // ---------------------------------------------------------------- s01
  /** Brute-force cosine top-k: queries = vec_id < 10, k = 5.
    * Exact, oracle-checked; ranking on the raw double with id tiebreak. */
  def s01TopKBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir).withColumn("nrm", Dedup.l2norm(col("embedding")))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val c = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("cos",
        Dedup.dotProd(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("n_id"), col("rnk"),
        round(col("cos") * 1000000).cast("long").as("cos_micro"))
  }

  // ---------------------------------------------------------------- s02
  /** LSH-bucketed ANN: 4 bands of 4 hyperplane bits; candidates share at
    * least one band value; top-3 per query among candidates.
    * Hash-bucket layout is engine-specific -> rows-only driver check;
    * recall asserted in SimilaritySpec. */
  def s02AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val nPlanes = 32
    val bands = 8
    val bitsPerBand = nPlanes / bands
    val planes = hyperplanes(nPlanes, 64)

    def signatureBits(embCol: String) = (0 until nPlanes).map { p =>
      val dot = aggregate(
        zip_with(col(embCol), lit(planes(p)), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, 1L).otherwise(0L)
    }

    def bandKeys(embCol: String) = {
      val bits = signatureBits(embCol)
      (0 until bands).map { b =>
        (0 until bitsPerBand).map(i => bits(b * bitsPerBand + i) * (1L << i)).reduce(_ + _)
      }
    }

    val e = embs(spark, dir).withColumn("nrm", Dedup.l2norm(col("embedding")))
    val banded = e.select(col("vec_id"), col("embedding"), col("nrm"),
      posexplode(array(bandKeys("embedding").map(_.cast("long")): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    val q = banded.filter(col("vec_id") < 10)
      .select(col("band"), col("bucket"), col("vec_id").as("q_id"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val c = banded.select(col("band"), col("bucket"),
      col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("nrm").as("n_nrm"))

    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    q.join(c, Seq("band", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), col("q_emb"), col("n_emb"),
        col("q_nrm"), col("n_nrm")).distinct()
      .withColumn("cos",
        Dedup.dotProd(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("n_id"), col("rnk"),
        round(col("cos") * 1000000).cast("long").as("cos_micro"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_topk_bruteforce" -> s01TopKBruteForce _,
    "s02_ann_lsh" -> s02AnnLsh _,
  )

  /** s02 is hash-bucket-based -> intentionally no oracle (rows-only). */
  val oracles: Map[String, String] = Map(
    "s01_topk_bruteforce" ->
      """SELECT q_id, n_id, rnk, CAST(round(1000000 * cos) AS BIGINT) AS cos_micro
        |FROM (
        | SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |  list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos,
        |  row_number() OVER (
        |    PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |             c.vec_id) AS rnk
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 10
        |) WHERE rnk <= 5""".stripMargin,
  )
}
