package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators over the `documents` / `embeddings` tables — the
 * dedup half of a large-scale training-data pipeline.
 *
 * Scale design (100 TB):
 *  - exact dedup is a single hash-aggregate on a content digest (one shuffle
 *    keyed by the digest — uniform by construction, no skew);
 *  - MinHash near-dup runs as shingle->minhash signatures (narrow, per-row),
 *    then an LSH band-bucket join so candidate generation never goes O(n^2):
 *    only same-bucket pairs are verified with exact Jaccard;
 *  - SimHash packs a document into one 64-bit value, and candidate pairs come
 *    from joining on 16-bit chunks (pigeonhole: hamming<=3 guarantees a shared
 *    chunk) rather than all-pairs;
 *  - n-gram Jaccard runs as an inverted-index set-similarity join inside
 *    lang+length blocks (candidates = docs sharing a shingle hash, never
 *    block^2) — exposed standalone with an oracle;
 *  - embedding near-dup blocks on the label column; cosine is computed as a
 *    sequential double fold (bit-identical to the DuckDB oracle's
 *    list_cosine_similarity over DOUBLE[]).
 */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def embs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Distinct word 3-gram shingles of `text` (docs with >=3 words only). */
  private val shingles: Column = {
    val w = split(col("text"), " ")
    array_distinct(transform(sequence(lit(1), size(w) - 2),
      i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
  }

  /** Exact Jaccard over two shingle-set columns (distinct-element sets). */
  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /**
   * One row per distinct (doc, 3-gram-shingle-hash): the codegen-friendly
   * shingle representation. Built with posexplode + window leads + a 3-column
   * xxhash64 — every operator whole-stage-codegen'd (the array-of-shingles
   * `transform(...)` form is interpreted CodegenFallback and measured ~20x
   * slower at sf0.1). Extra cols are carried through for blocking keys.
   */
  private def shingleRows(spark: SparkSession, dir: String, extraCols: Column*): DataFrame = {
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    docs(spark, dir)
      .select((col("doc_id") +: extraCols :+
        posexplode(split(col("text"), " "))): _*)
      .withColumn("w2", lead("col", 1).over(byPos))
      .withColumn("w3", lead("col", 2).over(byPos))
      .filter(col("w3").isNotNull)
      .withColumn("s", xxhash64(col("col"), col("w2"), col("w3")))
      .drop("pos", "col", "w2", "w3")
      .distinct()
  }

  /** Sequential-fold dot product in doubles — bit-identical cross-engine. */
  def dotProd(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Vector L2 norm (sequential fold). */
  def l2norm(x: Column): Column = sqrt(dotProd(x, x))

  /** Sequential-fold cosine in doubles — bit-identical cross-engine.
    * Prefer precomputing `l2norm` per vector and dividing `dotProd` by the
    * norm product: the fold is an interpreted higher-order expression, so
    * per-pair work should be one fold, not three. */
  def cosine(a: Column, b: Column): Column =
    dotProd(a, b) / (l2norm(a) * l2norm(b))

  // ---------------------------------------------------------------- d01
  /** Exact dedup: content-digest hash-groupBy; canonical = min doc_id. */
  def d01ExactDedup(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  // ---------------------------------------------------------------- d02
  /** MinHash + LSH near-dup: 32 permutations, 8 bands x 4 rows, band-bucket
    * candidate join, exact-Jaccard verification at 0.5.
    * Non-SQL-expressible (xxhash64 minhash) -> rows-only driver check;
    * recall/precision asserted in DedupSpec against the exact pairs. */
  def d02MinHashLsh(spark: SparkSession, dir: String): DataFrame = {
    val numPerm = 32
    val bands = 8
    val rowsPerBand = numPerm / bands

    // one row per distinct (doc, shingle-hash); reused 4x -> persist
    val sh = shingleRows(spark, dir).persist()

    // minhash as 32 codegen'd min-aggregates over the shingle rows
    val mhCols = (0 until numPerm).map(p => min(xxhash64(lit(p), col("s"))).as(s"mh$p"))
    val mh = sh.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)

    // one row per (doc, band): bucket key = hash of the band's minhash columns
    val bandCols = (0 until bands).map { b =>
      xxhash64((lit(b) +: (0 until rowsPerBand).map(i => col(s"mh${b * rowsPerBand + i}"))): _*)
    }
    val banded = mh
      .select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    // candidate pairs on ids only, deduped across bands BEFORE verification
    val candidates = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
      .join(banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b")),
        Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()

    // exact-jaccard verification via inverted-index join: intersection =
    // per-pair count of shared shingle hashes; union from per-doc set sizes
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(lit(1000.0) * col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
          .cast("long").as("jacc_permille"))
      .filter(col("jacc_permille") >= 500)
  }

  // ---------------------------------------------------------------- d03
  /** SimHash near-dup: 64-bit signature from word-frequency-weighted bit
    * votes; candidates share a 16-bit chunk; keep hamming <= 6.
    * Rows-only driver check; properties asserted in DedupSpec. */
  def d03SimHash(spark: SparkSession, dir: String): DataFrame = {
    val wordCounts = docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("word")))

    // per bit j: vote = +cnt when bit set else -cnt; fingerprint bit = vote>0
    val bitVotes = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"v$j")
    }
    val fingerprint = (0 until 64).map { j =>
      when(col(s"v$j") > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))

    val sims = wordCounts.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("doc_id"), fingerprint.as("simhash"))

    // pigeonhole banding: 4 chunks of 16 bits
    val chunks = sims.select(col("doc_id"), col("simhash"), posexplode(
      array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")

    val a = chunks.select(col("chunk"), col("chunk_val"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = chunks.select(col("chunk"), col("chunk_val"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 6)
  }

  // ---------------------------------------------------------------- d04
  /** Exact n-gram Jaccard within lang+length blocks (block-nested exact
    * near-dup; also the ground truth for the LSH recall test). */
  def d04NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // inverted-index set-similarity join: candidate pairs come from sharing
    // a shingle hash within a (lang, length) block — cost tracks shingle
    // co-occurrence, not block^2 (identical result set: a pair with zero
    // shared shingles can never reach the jaccard threshold)
    val sh = shingleRows(spark, dir, col("lang"), expr("n_chars div 100").as("len_block"))
      .persist()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("lang"), col("len_block"), col("s"), col("doc_id").as("doc_a"))
      .join(sh.select(col("lang"), col("len_block"), col("s"), col("doc_id").as("doc_b")),
        Seq("lang", "len_block", "s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(lit(1000.0) * col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
          .cast("long").as("jacc_permille"))
      .filter(col("jacc_permille") >= 200)
  }

  // ---------------------------------------------------------------- d05
  /** Embedding cosine near-dup within label blocks. */
  def d05CosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir).withColumn("nrm", l2norm(col("embedding")))
    val a = e.select(col("label"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = e.select(col("label"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", dotProd(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= 0.3)
      .select(col("vec_a"), col("vec_b"), col("label"),
        round(col("cos") * 1000000).cast("long").as("cos_micro"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d01_dedup_exact" -> d01ExactDedup _,
    "d02_dedup_minhash_lsh" -> d02MinHashLsh _,
    "d03_dedup_simhash" -> d03SimHash _,
    "d04_ngram_jaccard" -> d04NgramJaccard _,
    "d05_cosine_neardup" -> d05CosineNearDup _,
  )

  private val duckShingles =
    """list_distinct(list_transform(generate_series(1, len(string_split(text,' '))-2),
      | i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]))""".stripMargin

  /** d02/d03 are hash-function-based -> intentionally no oracle (rows-only). */
  val oracles: Map[String, String] = Map(
    "d01_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "d04_ngram_jaccard" ->
      s"""WITH s AS (
         | SELECT doc_id, lang, n_chars // 100 AS len_block, $duckShingles AS sh
         | FROM documents WHERE len(string_split(text, ' ')) >= 3)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | CAST(round(1000.0 * len(list_intersect(a.sh, b.sh)) / len(list_distinct(a.sh || b.sh))) AS BIGINT) AS jacc_permille
         |FROM s a JOIN s b
         | ON a.lang = b.lang AND a.len_block = b.len_block AND a.doc_id < b.doc_id
         |WHERE CAST(round(1000.0 * len(list_intersect(a.sh, b.sh)) / len(list_distinct(a.sh || b.sh))) AS BIGINT) >= 200""".stripMargin,
    "d05_cosine_neardup" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
        | CAST(round(1000000 * list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])) AS BIGINT) AS cos_micro
        |FROM embeddings a JOIN embeddings b
        | ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3""".stripMargin,
  )
}
