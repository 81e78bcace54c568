package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads travel as opaque
 * `binary` columns with typed metadata alongside. The decode step itself is
 * STUBBED (no codec libraries in this environment — see `FakeDecoder`), but
 * everything Spark-side is real: schema shape, per-row metadata extraction,
 * frame fan-out, and batch-iterator decoding via `mapPartitions` (the Scala
 * equivalent of a Pandas-UDF `mapInPandas` pass: one decoder instantiation
 * per partition, streaming row batches through it).
 *
 * The `documents.text` bytes stand in for media payloads; a real deployment
 * swaps `FakeDecoder.decode` for an actual codec and nothing else changes.
 */
object Multimodal {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Payload column: media bytes (here: utf-8 of text). */
  private def withPayload(df: DataFrame): DataFrame =
    df.withColumn("payload", encode(col("text"), "UTF-8"))

  // ---------------------------------------------------------------- m01
  /** Per-asset metadata: byte size, content digest, fake decoded dims
    * (deterministic functions of the payload -> oracle-checkable). */
  def m01BinaryMeta(spark: SparkSession, dir: String): DataFrame =
    withPayload(docs(spark, dir))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"),
        (octet_length(col("payload")) % 640).cast("long").as("width"),
        (octet_length(col("payload")) * 7 % 480).cast("long").as("height"),
        (expr("n_chars div 50") + 1).as("n_frames"))

  // ---------------------------------------------------------------- m02
  /** Frame sampling fan-out: one row per (asset, frame index) — the shape of
    * a video->frames explode; downstream per-frame ops hang off this. */
  def m02FrameSample(spark: SparkSession, dir: String): DataFrame =
    m01BinaryMeta(spark, dir)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(concat_ws("_", col("doc_id"), col("frame_idx"))).as("frame_key"))

  // ---------------------------------------------------------------- m03
  /** Batch decode via mapPartitions: the decoder is constructed once per
    * partition and fed a row iterator — the streaming-batch shape a real
    * (expensive, stateful) codec needs. Deterministic fake features.
    * Engine-specific iteration -> rows-only driver check + MultimodalSpec. */
  def m03DecodeStub(spark: SparkSession, dir: String): DataFrame = {
    val input = withPayload(docs(spark, dir)).select("doc_id", "payload")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("feat_sum", LongType, nullable = false),
      StructField("feat_dim", IntegerType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    input.mapPartitions { rows =>
      val decoder = new FakeDecoder // one per partition, like mapInPandas
      rows.map { r =>
        val feats = decoder.decode(r.getAs[Array[Byte]]("payload"))
        Row(r.getAs[Long]("doc_id"), feats.sum, feats.length)
      }
    }(encoder)
  }

  /** Stand-in for an image/audio codec: deterministic "features" from bytes.
    * A real deployment replaces this class only. */
  final class FakeDecoder {
    def decode(payload: Array[Byte]): Array[Long] =
      Array(payload.length.toLong,
        payload.foldLeft(0L)((acc, b) => acc + (b & 0xff)),
        if (payload.isEmpty) 0L else (payload.head & 0xff).toLong)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_binary_meta" -> m01BinaryMeta _,
    "m02_frame_sample" -> m02FrameSample _,
    "m03_decode_stub" -> m03DecodeStub _,
  )

  /** m03 iterates partition-side -> rows-only driver check. */
  val oracles: Map[String, String] = Map(
    "m01_binary_meta" ->
      """SELECT doc_id,
        | CAST(strlen(text) AS BIGINT) AS n_bytes,
        | md5(text) AS digest,
        | CAST(strlen(text) % 640 AS BIGINT) AS width,
        | CAST(strlen(text) * 7 % 480 AS BIGINT) AS height,
        | n_chars // 50 + 1 AS n_frames
        |FROM documents""".stripMargin,
    "m02_frame_sample" ->
      """SELECT doc_id, frame_idx,
        | md5(doc_id || '_' || frame_idx) AS frame_key
        |FROM (
        | SELECT doc_id, unnest(generate_series(0, n_chars // 50)) AS frame_idx
        | FROM documents)""".stripMargin,
  )
}
