package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads travel as opaque
 * `binary` columns with typed metadata alongside. The image path is REAL:
 * m03 synthesizes one PNG per asset and decodes it with the JDK's built-in
 * `javax.imageio` codec (no external jars) inside a `mapPartitions` pass —
 * the Scala equivalent of a Pandas-UDF `mapInPandas` stage: one decoder
 * instantiation per partition, streaming row batches through it. PNG is
 * lossless, so the decoded features are exactly predictable and the driver
 * hash-checks the full encode->decode round trip against a DuckDB oracle.
 *
 * For m01/m02 the `documents.text` bytes stand in for media payloads; a
 * video/audio deployment swaps the codec class only — the Spark-side
 * schema, partitioning, and batch shape are the product.
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
  /** Real image decode via mapPartitions: each asset's stored payload is a
    * genuine PNG (pixel values a pure function of (doc_id, x, y, channel) —
    * see [[PngCodec]]), and the decode is a real `ImageIO.read`, one decoder
    * per partition, streaming rows through — the stateful-codec batch shape.
    * Because PNG is lossless, width/height/pixel-sum are exactly the encode
    * formula's values, which the DuckDB oracle recomputes — the whole
    * encode->decode round trip is hash-checked. */
  def m03Decode(spark: SparkSession, dir: String): DataFrame = {
    val input = pngPayloads(docs(spark, dir))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("pix_sum", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    input.mapPartitions { rows =>
      val decoder = new PngDecoder // one per partition, like mapInPandas
      rows.map { r =>
        val (w, h, sum) = decoder.decode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), w, h, sum)
      }
    }(encoder)
  }

  /** Synthetic stored media: one real PNG per doc, built executor-side in
    * its own mapPartitions pass (standing in for media ingested from object
    * storage — the decode stage sees only an opaque binary column). */
  private def pngPayloads(df: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    // codec work is CPU-heavy per row and the docs scan is one small row
    // group = ONE task: spread first (no-op at scale — see spreadForCompute)
    graft.api.Pipelines.spreadForCompute(
      df.select(col("doc_id").cast("long"), col("n_chars").cast("long")),
      col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), PngCodec.encode(r.getLong(0), r.getLong(1)))
        }
      }(enc)
  }

  /** Deterministic PNG synthesis: dims and every channel value are pure
    * integer functions of (doc_id, n_chars, x, y, channel), so the decoded
    * image is SQL-predictable. TYPE_INT_RGB + PNG = lossless round trip. */
  object PngCodec {
    def dims(docId: Long, nChars: Long): (Int, Int) =
      ((nChars % 40 + 8).toInt, (docId % 24 + 8).toInt)
    def pixel(docId: Long, x: Int, y: Int, c: Int): Int =
      ((x * 31L + y * 17L + docId * 7L + c * 11L) % 256L).toInt
    /** `perturb` bumps ONE pixel's blue channel (wrap-safe) — the
      * near-duplicate variant the perceptual-hash dedup (m07) must catch. */
    def encode(docId: Long, nChars: Long, perturb: Boolean = false): Array[Byte] = {
      val (w, h) = dims(docId, nChars)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val blue =
            if (perturb && x == 3 && y == 3) (pixel(docId, x, y, 2) + 1) % 256
            else pixel(docId, x, y, 2)
          img.setRGB(x, y,
            (pixel(docId, x, y, 0) << 16) |
              (pixel(docId, x, y, 1) << 8) |
              blue)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Real image codec: JDK `javax.imageio` PNG decode (headless-safe,
    * memory-only). An audio/video deployment replaces this class only. */
  final class PngDecoder {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
    def decode(payload: Array[Byte]): (Long, Long, Long) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      (w.toLong, h.toLong, sum)
    }

    /** Decode + 2x2 integer box filter: each output channel value is
      * floor((p00 + p10 + p01 + p11) / 4); odd trailing row/col cropped.
      * Returns (out_w, out_h, sum of all downsampled channel values). */
    def decodeAndDownsample(payload: Array[Byte]): (Long, Long, Long) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val (ow, oh) = (img.getWidth / 2, img.getHeight / 2)
      var sum = 0L
      var y = 0
      while (y < oh) {
        var x = 0
        while (x < ow) {
          var c = 0
          while (c < 3) {
            val shift = 16 - 8 * c
            def ch(px: Int, py: Int): Int = (img.getRGB(px, py) >> shift) & 0xff
            sum += (ch(2 * x, 2 * y) + ch(2 * x + 1, 2 * y) +
              ch(2 * x, 2 * y + 1) + ch(2 * x + 1, 2 * y + 1)) / 4
            c += 1
          }
          x += 1
        }
        y += 1
      }
      (ow.toLong, oh.toLong, sum)
    }
  }

  // ---------------------------------------------------------------- m04
  /** Real audio decode via mapPartitions: each asset's payload is a genuine
    * RIFF/PCM16 WAV (samples a pure integer function of (doc_id, i) — see
    * [[WavCodec]]) and the decode is a real `javax.sound.sampled.
    * AudioSystem.getAudioInputStream` (JDK-builtin, headless), one decoder
    * state per partition. PCM is lossless, so sample count, rate and the
    * integer energy (sum of squared samples — order-independent, no float
    * fold) replay exactly in SQL: the full encode->decode round trip is
    * hash-checked, same contract as m03's PNG path. */
  def m04AudioDecode(spark: SparkSession, dir: String): DataFrame = {
    val input = wavPayloads(docs(spark, dir))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("energy", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    input.mapPartitions { rows =>
      val decoder = new WavDecoder
      rows.map { r =>
        val (rate, n, energy) = decoder.decode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), rate, n, energy)
      }
    }(encoder)
  }

  private def wavPayloads(df: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    // deliberately NOT spread (unlike pngPayloads): the WAV decode path
    // goes through javax.sound's AudioSystem, whose provider lookup
    // contends globally across threads — a controlled bracket measured
    // m04 2.2x / m12 3.1x SLOWER with the 32-way spread than with the
    // narrow single-task decode
    df.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), WavCodec.encode(r.getLong(0), r.getLong(1)))
        }
      }(enc)
  }

  /** Deterministic WAV synthesis: mono PCM16 @8kHz, sample i of doc d =
    * `(d*31 + i*7) % 2001 - 1000` — pure integers, SQL-replayable.
    * `gain` scales every sample (the amplitude-changed re-encode of the
    * same recording — what a loudness-invariant fingerprint must match). */
  object WavCodec {
    val SampleRate = 8000f
    def nSamples(nChars: Long): Int = (nChars % 400 + 100).toInt
    def sample(docId: Long, i: Int): Short =
      ((docId * 31L + i * 7L) % 2001L - 1000L).toShort
    def encodeScaled(docId: Long, nChars: Long, gain: Int): Array[Byte] = {
      val n = nSamples(nChars)
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = (sample(docId, i) * gain).toShort // |v| <= 1000*gain, no clip for gain <= 32
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(SampleRate, 16, 1,
        /* signed = */ true, /* bigEndian = */ false)
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(stream,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def encode(docId: Long, nChars: Long): Array[Byte] = {
      val n = nSamples(nChars)
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = sample(docId, i)
        pcm(2 * i) = (v & 0xff).toByte // little-endian PCM16
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(SampleRate, 16, 1,
        /* signed = */ true, /* bigEndian = */ false)
      val stream = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(stream,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** 64-bit block-mean perceptual hash (see [[m06PerceptualHash]]):
    * pure integer block/total mean comparison, bit (bj*8+bi) per grid
    * cell. Extension of [[PngDecoder]], kept beside the other raster
    * passes. */
  implicit final class PngHashOps(private val d: PngDecoder) {
    def blockMeanHash(payload: Array[Byte]): Long = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val blockSum = new Array[Long](64)
      val blockN = new Array[Long](64)
      var total = 0L
      var y = 0
      while (y < h) {
        val bj = y * 8 / h
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val gray = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          val slot = bj * 8 + x * 8 / w
          blockSum(slot) += gray
          blockN(slot) += 1
          total += gray
          x += 1
        }
        y += 1
      }
      val nTotal = w.toLong * h
      var bits = 0L
      var i = 0
      while (i < 64) {
        if (blockSum(i) * nTotal > total * blockN(i)) bits |= 1L << i
        i += 1
      }
      bits
    }
  }

  /** 64-bit energy-contour audio fingerprint (see [[m08AudioFingerprint]]):
    * the decoded samples partition into 65 windows with integer bounds
    * (sample i lands in window i*65/n), window energy = Σ v² (exact
    * integers), and bit k is set iff window k+1's energy exceeds window
    * k's — the energy CONTOUR. Positive gain scales every energy by gain²
    * and preserves every comparison, so re-encodes at different loudness
    * fingerprint identically — the Shazam/Chromaprint robustness property,
    * here in exact arithmetic. */
  implicit final class WavFingerprintOps(private val d: WavDecoder) {
    def energyContourFingerprint(payload: Array[Byte]): Long = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        require(n >= 65, s"fingerprint needs >= 65 samples, got $n")
        val energy = new Array[Long](65)
        var i = 0
        while (i < n) {
          val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
          energy(((i.toLong * 65) / n).toInt) += v * v
          i += 1
        }
        var bits = 0L
        var k = 0
        while (k < 64) {
          if (energy(k + 1) > energy(k)) bits |= 1L << k
          k += 1
        }
        bits
      } finally in.close()
    }
  }

  /** Real audio codec: JDK `javax.sound.sampled` WAV decode (memory-only).
    * Returns (sampleRate, nSamples, energy = sum of squared samples). */
  final class WavDecoder {
    def decode(payload: Array[Byte]): (Long, Long, Long) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian, s"unexpected WAV shape: $fmt")
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        var energy = 0L
        var i = 0
        while (i < n) {
          val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
          energy += v * v
          i += 1
        }
        (fmt.getSampleRate.toLong, n.toLong, energy)
      } finally in.close()
    }

    /** Per-frame integer energies (sum of squared samples) over fixed
      * `frameLen`-sample frames; the final frame may be partial. The VAD
      * primitive (m12) — pure integers, SQL-replayable. */
    def frameEnergies(payload: Array[Byte], frameLen: Int): Array[Long] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian, s"unexpected WAV shape: $fmt")
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        val out = new Array[Long]((n + frameLen - 1) / frameLen)
        var i = 0
        while (i < n) {
          val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
          out(i / frameLen) += v * v
          i += 1
        }
        out
      } finally in.close()
    }
  }

  // ---------------------------------------------------------------- m12
  /** Energy-based voice-activity segmentation (VAD) through the REAL WAV
    * decode: 80-sample (10 ms @ 8 kHz) frames, integer per-frame energy
    * (sum of squared PCM16 samples), a frame is ACTIVE iff its energy
    * reaches the threshold, and consecutive active frames merge into
    * segments — the speech-region primitive an audio curation pipeline
    * runs before transcription/training (silence trim, speech-density
    * filters). Everything after the decode is exact integer arithmetic,
    * so frame energies, the activity mask, segment count and the longest
    * run all replay in SQL from the codec's sample formula. One decoder
    * per partition; only five longs per doc leave the executor. */
  def m12AudioVad(spark: SparkSession, dir: String): DataFrame = {
    val input = wavPayloads(docs(spark, dir))
    val frameLen = 80
    val threshold = 26700000L // ~E[s^2]*80 for the +/-1000 synth: splits
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("active_frames", LongType, nullable = false),
      StructField("n_segments", LongType, nullable = false),
      StructField("max_run", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    input.mapPartitions { rows =>
      val decoder = new WavDecoder
      rows.map { r =>
        val es = decoder.frameEnergies(r.getAs[Array[Byte]](1), frameLen)
        var act = 0L; var segs = 0L; var run = 0L; var maxRun = 0L
        es.foreach { e =>
          if (e >= threshold) {
            act += 1; run += 1
            if (run == 1) segs += 1
            if (run > maxRun) maxRun = run
          } else run = 0
        }
        Row(r.getLong(0), es.length.toLong, act, segs, maxRun)
      }
    }(encoder)
  }

  // ---------------------------------------------------------------- m06
  /** Real image PERCEPTUAL HASH via mapPartitions: decode the stored PNG
    * and compute a 64-bit block-mean hash (aHash family) — the raster
    * partitions into an 8x8 grid of rectangular blocks (integer bounds:
    * pixel x lands in block x*8/w), and bit (bj*8+bi) is set iff the
    * block's mean gray exceeds the image mean. Means compare by integer
    * CROSS-MULTIPLICATION (block_sum * n_total > total_sum * n_block), so
    * the whole hash is exact integer arithmetic and replays in SQL.
    * Near-identical images land within a few Hamming bits — the image
    * near-dedup key, the visual sibling of d03's SimHash. One decoder per
    * partition; only (id, hash, popcount) ever leaves the executor. */
  def m06PerceptualHash(spark: SparkSession, dir: String): DataFrame = {
    val input = pngPayloads(docs(spark, dir))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false),
      StructField("n_bright", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    input.mapPartitions { rows =>
      val decoder = new PngDecoder
      rows.map { r =>
        val bits = decoder.blockMeanHash(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), bits, java.lang.Long.bitCount(bits).toLong)
      }
    }(encoder)
  }

  // ---------------------------------------------------------------- m07
  /** Image near-dup pairs — the dedup machinery crossing into the image
    * modality: every fifth document gets a near-duplicate variant (same
    * image, one pixel's blue bumped), all members hash through the real
    * decode ([[m06PerceptualHash]]'s block-mean hash), and pairs emerge
    * from the SHARED Hamming pigeonhole ([[Pipelines.hammingNearDupPairs]]
    * — the same banded self-join SimHash text dedup uses, never
    * all-pairs). Every perturbed variant must pair with its original
    * within 2 bits (pinned in-gate); the oracle replays the perturbed
    * pixel formula, both hashes, the banding and the verify in SQL. */
  def m07ImageNearDup(spark: SparkSession, dir: String): DataFrame = {
    // the decode+hash pass feeds candidate generation, the in-gate recall
    // pin and the verify — cache it once (tiny: one id + one long per
    // member), like the other eager near-dup stages
    val hashes = imageMemberHashes(spark, dir).persist()
    try {
      // eager distributed freeze: the in-gate pin below must see the same
      // rows the caller gets, and the returned frame must not recompute
      // the decode after the finally-unpersist — localCheckpoint cuts the
      // lineage without ever materializing the result on the driver
      val pairs = graft.api.Pipelines.hammingNearDupPairs(
        hashes, col("member_id"), col("ahash"), maxHamming = 2)
        .localCheckpoint()
      val found = pairs.filter(col("doc_b") === col("doc_a") + 10000L).count()
      require(found == docs(spark, dir).filter(col("doc_id") % 5 === 0).count(),
        s"every perturbed variant must pair with its original, found $found")
      pairs
    } finally hashes.unpersist()
  }

  /** Shared member corpus of m07/m09: every doc's PNG plus a one-pixel-
    * perturbed variant (id + 10000) for every fifth doc, hashed through
    * the real decode. */
  private def imageMemberHashes(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("member_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val members = graft.api.Pipelines.spreadForCompute(docs(spark, dir)
      .select(col("doc_id").cast("long"), col("n_chars").cast("long")),
      col("doc_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (id, n) = (r.getLong(0), r.getLong(1))
          val orig = Row(id, PngCodec.encode(id, n))
          if (id % 5 == 0)
            Iterator(orig, Row(id + 10000L, PngCodec.encode(id, n, perturb = true)))
          else Iterator(orig)
        }
      }(enc)
    val hashSchema = StructType(Seq(
      StructField("member_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val hashEnc = org.apache.spark.sql.Encoders.row(hashSchema)
    members.mapPartitions { rows =>
      val decoder = new PngDecoder
      rows.map(r => Row(r.getLong(0),
        decoder.blockMeanHash(r.getAs[Array[Byte]](1))))
    }(hashEnc)
  }

  // ---------------------------------------------------------------- m10
  /** Video near-dup by TEMPORAL-MAJORITY perceptual signature — the video
    * rung of the near-dup ladder (m07 images, m08 audio): every doc's
    * "video" is 3 real PNG frames (frame id = doc*10+f, so each frame has
    * its own dims and content), each frame decodes through the real codec
    * to its block-mean aHash, and the video signature is the per-bit
    * MAJORITY of the 3 frame hashes — one bitwise expression
    * `(h0&h1)|(h1&h2)|(h0&h2)`, no per-bit loop — which tolerates a
    * minority of damaged/re-encoded frames by construction. Every sixth
    * doc gets a fully re-encoded variant (each frame one-pixel-perturbed);
    * since frames differ in dims, their flipped bits rarely coincide and
    * the majority absorbs them — the variant must pair with its original
    * within 3 bits through the shared Hamming pigeonhole (pinned). The
    * oracle replays frames, hashes, majority, banding and verify in SQL. */
  def m10VideoNearDup(spark: SparkSession, dir: String): DataFrame = {
    val memSchema = StructType(Seq(
      StructField("member_id", LongType, nullable = false),
      StructField("frame", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val memEnc = org.apache.spark.sql.Encoders.row(memSchema)
    val members = graft.api.Pipelines.spreadForCompute(docs(spark, dir)
      .select(col("doc_id").cast("long"), col("n_chars").cast("long")),
      col("doc_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (id, n) = (r.getLong(0), r.getLong(1))
          val orig = (0L until 3L).iterator.map(f =>
            Row(id, f, PngCodec.encode(id * 10 + f, n)))
          val pert =
            if (id % 6 == 0)
              (0L until 3L).iterator.map(f =>
                Row(id + 10000L, f, PngCodec.encode(id * 10 + f, n, perturb = true)))
            else Iterator.empty[Row]
          orig ++ pert
        }
      }(memEnc)
    val fhSchema = StructType(Seq(
      StructField("member_id", LongType, nullable = false),
      StructField("frame", LongType, nullable = false),
      StructField("fh", LongType, nullable = false)))
    val fhEnc = org.apache.spark.sql.Encoders.row(fhSchema)
    val fhs = members.mapPartitions { rows =>
      val decoder = new PngDecoder
      rows.map(r => Row(r.getLong(0), r.getLong(1),
        decoder.blockMeanHash(r.getAs[Array[Byte]](2))))
    }(fhEnc)
    def hOf(f: Int) = max(when(col("frame") === f, col("fh"))).as(s"h$f")
    val sigs = fhs.groupBy("member_id").agg(hOf(0), hOf(1), hOf(2))
      .select(col("member_id"),
        col("h0").bitwiseAND(col("h1"))
          .bitwiseOR(col("h1").bitwiseAND(col("h2")))
          .bitwiseOR(col("h0").bitwiseAND(col("h2"))).as("vhash"))
      .persist()
    try {
      val pairs = graft.api.Pipelines.hammingNearDupPairs(
        sigs, col("member_id"), col("vhash"), maxHamming = 3)
        .localCheckpoint()
      val planted = docs(spark, dir).filter(col("doc_id") % 6 === 0).count()
      val found = pairs.filter(col("doc_b") === col("doc_a") + 10000L).count()
      require(found == planted,
        s"every re-encoded video must pair with its original: $found/$planted")
      pairs
    } finally sigs.unpersist()
  }

  // ---------------------------------------------------------------- m13
  /** Video SCENE-CHANGE detection / keyframe selection — the sampling
    * step a video training pipeline runs before any expensive per-frame
    * model: uniform frame sampling wastes budget inside static scenes,
    * so frames are decoded (REAL PNG codec), perceptually hashed
    * (block-mean, m06's primitive), and a scene boundary is declared
    * where the frame-to-frame Hamming distance exceeds a threshold; each
    * scene's FIRST frame is its keyframe. Every doc is a 6-frame video
    * whose frames repeat a per-scene seed (planted cuts at
    * `(doc_id*13 + f*7) % 3 == 0`), so within-scene hash distance is 0
    * by construction and the boundary rule is content-derived, not
    * metadata-derived — the oracle replays pixels → hashes → lag
    * distances → gaps-and-islands scenes in SQL, byte-exact. Shape:
    * decode fan-out (one codec per partition, streaming batches), ONE
    * per-doc window pass for the boundaries — no joins, no driver data. */
  def m13SceneDetect(spark: SparkSession, dir: String): DataFrame = {
    val FramesPerDoc = 6L
    def sceneOf(id: Long, f: Long): Long =
      (1L to f).count(i => (id * 13 + i * 7) % 3 == 0).toLong
    val memSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val memEnc = org.apache.spark.sql.Encoders.row(memSchema)
    // every other doc: the decode fan-out is the gate's entire cost and
    // half the corpus exercises the machinery identically
    val frames = graft.api.Pipelines.spreadForCompute(docs(spark, dir)
      .filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").cast("long"), col("n_chars").cast("long")),
      col("doc_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (id, n) = (r.getLong(0), r.getLong(1))
          (0L until FramesPerDoc).iterator.map(f =>
            Row(id, f, PngCodec.encode(id * 100 + sceneOf(id, f), n)))
        }
      }(memEnc)
    val fhSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame", LongType, nullable = false),
      StructField("fh", LongType, nullable = false)))
    val fhEnc = org.apache.spark.sql.Encoders.row(fhSchema)
    val fhs = frames.mapPartitions { rows =>
      val decoder = new PngDecoder
      rows.map(r => Row(r.getLong(0), r.getLong(1),
        decoder.blockMeanHash(r.getAs[Array[Byte]](2))))
    }(fhEnc)
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame")
    val scenes = fhs
      .withColumn("prev", lag(col("fh"), 1).over(byDoc))
      .withColumn("boundary",
        when(col("prev").isNull, 1)
          .when(bit_count(col("fh").bitwiseXOR(col("prev"))) > 8, 1)
          .otherwise(0))
      .withColumn("scene_id",
        sum(col("boundary")).over(byDoc).cast("long") - 1L)
      .groupBy(col("doc_id"), col("scene_id"))
      .agg(min(col("frame")).as("keyframe"),
        count(lit(1)).as("n_frames"))
    // light in-gate sanity (the oracle is the real check): frame 0 always
    // opens scene 0, and scenes can only MERGE planted cuts, never split
    val audit = scenes.groupBy("doc_id")
      .agg(count(lit(1)).as("n_scenes"), min("keyframe").as("first"))
      .agg(max(when(col("first") =!= 0L, 1).otherwise(0)).as("badFirst"),
        max("n_scenes").as("maxScenes")).head()
    require(audit.getInt(0) == 0, "scene 0 must start at frame 0")
    require(audit.getLong(1) <= FramesPerDoc, "more scenes than frames")
    scenes
  }

  // ---------------------------------------------------------------- m09
  /** End-to-end image dedup — m07's pairs composed through connected
    * components and a canonical keep (min member id per cluster), the
    * image analog of d10's semantic dedup: perceptual-hash pairs →
    * duplicate clusters → one survivor each. Every perturbed variant
    * clusters with its original (smaller id), so NO variant may survive —
    * pinned in-gate; the oracle replays hashes, banding, pairs, a
    * recursive-CTE component labeling and the keep rule in SQL. */
  def m09ImageDedup(spark: SparkSession, dir: String): DataFrame = {
    // one decode+hash pass serves pairs, components, keep and the pin
    val hashes = imageMemberHashes(spark, dir).persist()
    try {
      val pairs = graft.api.Pipelines.hammingNearDupPairs(
        hashes, col("member_id"), col("ahash"), maxHamming = 2)
      val comps = graft.api.Pipelines.connectedComponents(
        pairs, col("doc_a"), col("doc_b"))
      // distributed freeze before the pin — O(kept corpus) rows never
      // touch the driver (see m07)
      val kept = hashes
        .join(comps, hashes("member_id") === comps("node"), "left")
        .filter(col("node").isNull || col("component") === col("member_id"))
        .select(col("member_id"))
        .localCheckpoint()
      require(kept.filter(col("member_id") >= 10000L).count() == 0,
        "every perturbed variant must dedup away to its original")
      kept
    } finally hashes.unpersist()
  }

  // ---------------------------------------------------------------- m08
  /** Audio near-dup by energy-contour fingerprint: every fourth document
    * gets a LOUDER re-encode of the same recording (gain 3, no clipping),
    * all members decode through the real WAV codec and fingerprint via
    * [[WavFingerprintOps]] — gain scales every window energy by gain², so
    * the contour (and the fingerprint) is IDENTICAL, and the pair falls
    * out of the shared Hamming machinery at distance 0. The oracle
    * replays the sample formula, windowing, energies, contour bits and
    * banding in SQL. */
  def m08AudioFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("member_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val members = docs(spark, dir)
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      // not spread: WAV decode contends in javax.sound (see wavPayloads)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (id, n) = (r.getLong(0), r.getLong(1))
          val orig = Row(id, WavCodec.encode(id, n))
          if (id % 4 == 0)
            Iterator(orig, Row(id + 10000L, WavCodec.encodeScaled(id, n, gain = 3)))
          else Iterator(orig)
        }
      }(enc)
    val fpSchema = StructType(Seq(
      StructField("member_id", LongType, nullable = false),
      StructField("fp", LongType, nullable = false)))
    val fpEnc = org.apache.spark.sql.Encoders.row(fpSchema)
    val fps = members.mapPartitions { rows =>
      val decoder = new WavDecoder
      rows.map(r => Row(r.getLong(0),
        decoder.energyContourFingerprint(r.getAs[Array[Byte]](1))))
    }(fpEnc)
    val cached = fps.persist()
    try {
      // distributed freeze before the pin (see m07)
      val pairs = graft.api.Pipelines.hammingNearDupPairs(
        cached, col("member_id"), col("fp"), maxHamming = 0)
        .localCheckpoint()
      val planted = docs(spark, dir).filter(col("doc_id") % 4 === 0).count()
      require(pairs.filter(col("doc_b") === col("doc_a") + 10000L)
        .count() == planted,
        "every gain-scaled re-encode must fingerprint identically")
      pairs
    } finally cached.unpersist()
  }

  // ---------------------------------------------------------------- m05
  /** Real image RESIZE via mapPartitions: decode the stored PNG (m03's
    * codec) and 2x2 box-downsample the raster with an explicit integer
    * rule — floor of the 4-pixel channel sum / 4, trailing odd row/column
    * cropped — the thumbnail/preprocess stage of a vision-training
    * pipeline. The filter is defined on INTEGERS (not Java2D's scaler,
    * whose rounding is unspecified), so the output raster is exactly
    * SQL-predictable and the decode->resize round trip hash-checks like
    * m03/m04. One decoder per partition; at scale the payload column
    * streams through executors and only (id, dims, checksum) returns. */
  def m05ImageResize(spark: SparkSession, dir: String): DataFrame = {
    val input = pngPayloads(docs(spark, dir))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("out_w", LongType, nullable = false),
      StructField("out_h", LongType, nullable = false),
      StructField("out_sum", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    input.mapPartitions { rows =>
      val decoder = new PngDecoder
      rows.map { r =>
        val (ow, oh, osum) = decoder.decodeAndDownsample(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), ow, oh, osum)
      }
    }(encoder)
  }


  // ---------------------------------------------------------------- m11
  /** Cross-modal duplicate clustering: a "post" is an (image, caption)
    * pair and duplication spreads through EITHER modality — an image
    * repost under a fresh caption (every 5th doc: one-pixel-perturbed
    * PNG) and a caption repost over a different image (every 7th doc:
    * same text, new image basis) must land in the ORIGINAL's cluster even
    * though no single modality connects all three members. Edges =
    * perceptual Hamming pairs (m07's real-decode aHash, <= 2 bits) UNION
    * exact-caption pairs (content-digest equality, the d01 shape);
    * components via the shared min-label propagation; isolated members
    * keep their own id. The oracle replays hashes, banding, caption
    * pairs, and the component recurrence in SQL. Runs over the even half
    * of the corpus (the m13 trim): the PNG encode+decode volume is the
    * gate's entire cost and half the docs — variants included — exercise
    * identical machinery. */
  def m11CrossModalDedup(spark: SparkSession, dir: String): DataFrame = {
    val memSchema = StructType(Seq(
      StructField("member_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("caption", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(memSchema)
    val members = graft.api.Pipelines.spreadForCompute(docs(spark, dir)
      .filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"),
        col("text")),
      col("doc_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (id, n, tx) = (r.getLong(0), r.getLong(1), r.getString(2))
          val out = scala.collection.mutable.ArrayBuffer(
            Row(id, PngCodec.encode(id, n), tx))
          if (id % 5 == 0)
            out += Row(id + 10000L, PngCodec.encode(id, n, perturb = true),
              s"variant-$id")
          if (id % 7 == 0)
            out += Row(id + 20000L, PngCodec.encode(id + 20000L, n), tx)
          out.iterator
        }
      }(enc).persist()
    try {
      val hashSchema = StructType(Seq(
        StructField("member_id", LongType, nullable = false),
        StructField("ahash", LongType, nullable = false)))
      val hashEnc = org.apache.spark.sql.Encoders.row(hashSchema)
      val hashes = members.mapPartitions { rows =>
        val decoder = new PngDecoder
        rows.map(r => Row(r.getLong(0),
          decoder.blockMeanHash(r.getAs[Array[Byte]](1))))
      }(hashEnc)
      val imgPairs = graft.api.Pipelines.hammingNearDupPairs(
        hashes, col("member_id"), col("ahash"), maxHamming = 2)
        .select(col("doc_a"), col("doc_b"))
      val tkey = members.select(col("member_id"), md5(col("caption")).as("k"))
      val textPairs = tkey.as("a").join(tkey.as("b"),
        col("a.k") === col("b.k") && col("a.member_id") < col("b.member_id"))
        .select(col("a.member_id").as("doc_a"), col("b.member_id").as("doc_b"))
      val comps = graft.api.Pipelines.connectedComponents(
        imgPairs.unionAll(textPairs).distinct(), col("doc_a"), col("doc_b"))
      members.select(col("member_id"))
        .join(comps, col("member_id") === col("node"), "left")
        .select(col("member_id"),
          coalesce(col("component"), col("member_id")).as("component"))
        .localCheckpoint(true)
    } finally { members.unpersist(); () }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_binary_meta" -> m01BinaryMeta _,
    "m02_frame_sample" -> m02FrameSample _,
    "m03_decode" -> m03Decode _,
    "m04_audio_decode" -> m04AudioDecode _,
    "m05_image_resize" -> m05ImageResize _,
    "m06_perceptual_hash" -> m06PerceptualHash _,
    "m07_image_neardup" -> m07ImageNearDup _,
    "m08_audio_fingerprint" -> m08AudioFingerprint _,
    "m09_image_dedup" -> m09ImageDedup _,
    "m10_video_neardup" -> m10VideoNearDup _,
    "m11_crossmodal_dedup" -> m11CrossModalDedup _,
    "m12_audio_vad" -> m12AudioVad _,
    "m13_scene_detect" -> m13SceneDetect _,
  )

  val oracles: Map[String, String] = Map(
    // m13: planted per-scene frame seeds -> pixel formula -> block-mean
    // hashes -> lag Hamming distances -> gaps-and-islands scenes; the
    // boundary rule is CONTENT-derived on both sides, so adjacent scenes
    // that happen to hash within the threshold merge identically
    "m13_scene_detect" ->
      """WITH fr0 AS (
        | SELECT doc_id, n_chars, f.f AS frame,
        |  CASE WHEN f.f > 0 AND (doc_id*13 + f.f*7) % 3 = 0
        |   THEN 1 ELSE 0 END AS cut
        | FROM documents, (SELECT unnest(generate_series(0, 5)) AS f) f
        | WHERE doc_id % 2 = 0),
        |fr AS (
        | SELECT doc_id, frame,
        |  doc_id*100 + sum(cut) OVER (PARTITION BY doc_id ORDER BY frame)
        |    AS fid,
        |  n_chars % 40 + 8 AS w
        | FROM fr0),
        |frh AS (SELECT doc_id, frame, fid, w, fid % 24 + 8 AS h FROM fr),
        |px AS (
        | SELECT fr.doc_id, fr.frame,
        |  (x.x*31 + y.y*17 + fr.fid*7) % 256
        |   + (x.x*31 + y.y*17 + fr.fid*7 + 11) % 256
        |   + (x.x*31 + y.y*17 + fr.fid*7 + 22) % 256 AS gray,
        |  (y.y * 8) // fr.h * 8 + (x.x * 8) // fr.w AS slot
        | FROM frh fr
        | JOIN (SELECT unnest(generate_series(0, 46)) AS x) x ON x.x < fr.w
        | JOIN (SELECT unnest(generate_series(0, 30)) AS y) y ON y.y < fr.h),
        |blk AS (SELECT doc_id, frame, slot, sum(gray) AS bs, count(*) AS bn
        |        FROM px GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, frame, sum(gray) AS ts, count(*) AS tn
        |        FROM px GROUP BY 1, 2),
        |fh AS (
        | SELECT b.doc_id, b.frame,
        |  CAST(sum(CASE
        |    WHEN b.bs * t.tn <= t.ts * b.bn THEN 0
        |    WHEN b.slot = 63 THEN -9223372036854775807 - 1
        |    ELSE 1::BIGINT << CAST(b.slot AS INT) END) AS BIGINT) AS h
        | FROM blk b JOIN tot t USING (doc_id, frame) GROUP BY 1, 2),
        |lagd AS (
        | SELECT doc_id, frame, h,
        |  lag(h) OVER (PARTITION BY doc_id ORDER BY frame) AS prev
        | FROM fh),
        |b AS (
        | SELECT doc_id, frame,
        |  CASE WHEN prev IS NULL THEN 1
        |       WHEN bit_count(xor(h, prev)) > 8 THEN 1 ELSE 0 END AS boundary
        | FROM lagd),
        |s AS (
        | SELECT doc_id, frame,
        |  CAST(sum(boundary) OVER (PARTITION BY doc_id ORDER BY frame)
        |    AS BIGINT) - 1 AS scene_id
        | FROM b)
        |SELECT doc_id, scene_id, min(frame) AS keyframe,
        |  count(*) AS n_frames
        |FROM s GROUP BY 1, 2""".stripMargin,
    // m12: WavCodec's sample formula -> 80-sample frame energies ->
    // threshold mask -> gaps-and-islands segments, all exact integers
    "m12_audio_vad" ->
      """WITH f AS (
        | SELECT doc_id, i.i // 80 AS frame,
        |  sum(((doc_id*31 + i.i*7) % 2001 - 1000)
        |    * ((doc_id*31 + i.i*7) % 2001 - 1000)) AS e
        | FROM documents, (SELECT unnest(generate_series(0, 499)) AS i) i
        | WHERE i.i < n_chars % 400 + 100
        | GROUP BY 1, 2),
        |a0 AS (SELECT doc_id, frame, e >= 26700000 AS active FROM f),
        |a AS (
        | SELECT doc_id, frame, active,
        |  CASE WHEN active AND NOT coalesce(
        |    lag(active) OVER (PARTITION BY doc_id ORDER BY frame), FALSE)
        |   THEN 1 ELSE 0 END AS seg_start
        | FROM a0),
        |r AS (
        | SELECT doc_id, active,
        |  sum(seg_start) OVER (PARTITION BY doc_id ORDER BY frame) AS seg_id
        | FROM a),
        |agg AS (
        | SELECT doc_id, count(*) AS n_frames,
        |  sum(CASE WHEN active THEN 1 ELSE 0 END) AS active_frames
        | FROM r GROUP BY 1),
        |segs AS (
        | SELECT doc_id, seg_id, count(*) AS len
        | FROM r WHERE active GROUP BY 1, 2),
        |mx AS (
        | SELECT doc_id, count(*) AS n_segments, max(len) AS max_run
        | FROM segs GROUP BY 1)
        |SELECT agg.doc_id,
        | CAST(agg.n_frames AS BIGINT) AS n_frames,
        | CAST(agg.active_frames AS BIGINT) AS active_frames,
        | CAST(coalesce(mx.n_segments, 0) AS BIGINT) AS n_segments,
        | CAST(coalesce(mx.max_run, 0) AS BIGINT) AS max_run
        |FROM agg LEFT JOIN mx USING (doc_id)""".stripMargin,
    // cross-modal components: the m07 aHash replay over the 3-class member
    // zoo, caption-equality pairs, and the d08 component recurrence
    "m11_crossmodal_dedup" ->
      """WITH RECURSIVE mem AS (
        | SELECT doc_id AS mid, doc_id AS sid, 0 AS pert,
        |  n_chars % 40 + 8 AS w, doc_id % 24 + 8 AS h, text AS cap
        | FROM documents WHERE doc_id % 2 = 0
        | UNION ALL
        | SELECT doc_id + 10000, doc_id, 1,
        |  n_chars % 40 + 8, doc_id % 24 + 8, 'variant-' || doc_id
        | FROM documents WHERE doc_id % 2 = 0 AND doc_id % 5 = 0
        | UNION ALL
        | SELECT doc_id + 20000, doc_id + 20000, 0,
        |  n_chars % 40 + 8, (doc_id + 20000) % 24 + 8, text
        | FROM documents WHERE doc_id % 2 = 0 AND doc_id % 7 = 0),
        |px AS (
        | SELECT m.mid,
        |  (x.x*31 + y.y*17 + m.sid*7) % 256
        |   + (x.x*31 + y.y*17 + m.sid*7 + 11) % 256
        |   + CASE WHEN m.pert = 1 AND x.x = 3 AND y.y = 3
        |      THEN ((x.x*31 + y.y*17 + m.sid*7 + 22) % 256 + 1) % 256
        |      ELSE (x.x*31 + y.y*17 + m.sid*7 + 22) % 256 END AS gray,
        |  (y.y * 8) // m.h * 8 + (x.x * 8) // m.w AS slot
        | FROM mem m
        | JOIN (SELECT unnest(generate_series(0, 46)) AS x) x ON x.x < m.w
        | JOIN (SELECT unnest(generate_series(0, 30)) AS y) y ON y.y < m.h),
        |blk AS (SELECT mid, slot, sum(gray) AS bs, count(*) AS bn FROM px GROUP BY 1, 2),
        |tot AS (SELECT mid, sum(gray) AS ts, count(*) AS tn FROM px GROUP BY 1),
        |hash AS (
        | SELECT b.mid,
        |  CAST(sum(CASE
        |    WHEN b.bs * t.tn <= t.ts * b.bn THEN 0
        |    WHEN b.slot = 63 THEN -9223372036854775807 - 1
        |    ELSE 1::BIGINT << CAST(b.slot AS INT) END) AS BIGINT) AS ahash
        | FROM blk b JOIN tot t USING (mid) GROUP BY 1),
        |bands AS (
        | SELECT mid, ahash, c.c AS chunk, (ahash >> (16 * c.c)) & 65535 AS chunk_val
        | FROM hash, (SELECT unnest(generate_series(0, 3)) AS c) c),
        |ipairs AS (
        | SELECT DISTINCT a.mid AS doc_a, b.mid AS doc_b
        | FROM bands a JOIN bands b
        |   ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.mid < b.mid
        | WHERE bit_count(xor(a.ahash, b.ahash)) <= 2),
        |tpairs AS (
        | SELECT a.mid AS doc_a, b.mid AS doc_b
        | FROM mem a JOIN mem b ON a.cap = b.cap AND a.mid < b.mid),
        |upairs AS (SELECT * FROM ipairs UNION SELECT * FROM tpairs),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM upairs
        |          UNION SELECT doc_b, doc_a FROM upairs),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |reach(node, label) AS (
        | SELECT node, node FROM nodes
        | UNION
        | SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
        |comp AS (SELECT node, min(label) AS component FROM reach GROUP BY 1)
        |SELECT m.mid AS member_id,
        | CAST(coalesce(c.component, m.mid) AS BIGINT) AS component
        |FROM mem m LEFT JOIN comp c ON c.node = m.mid""".stripMargin,

    // m10: per-frame replay of the m06/m07 hash chain (frame id =
    // doc*10+f gives each frame its own dims and pixels), the bitwise
    // 2-of-3 majority signature, and the shared banding + verify
    "m10_video_neardup" ->
      """WITH vids AS (
        | SELECT doc_id, n_chars, 0 AS pert, doc_id AS mid FROM documents
        | UNION ALL
        | SELECT doc_id, n_chars, 1, doc_id + 10000 FROM documents
        | WHERE doc_id % 6 = 0),
        |frames AS (
        | SELECT v.mid, v.pert, f.f, v.doc_id * 10 + f.f AS fid,
        |  v.n_chars % 40 + 8 AS w, (v.doc_id * 10 + f.f) % 24 + 8 AS h
        | FROM vids v, (SELECT unnest(generate_series(0, 2)) AS f) f),
        |px AS (
        | SELECT fr.mid, fr.f,
        |  (x.x*31 + y.y*17 + fr.fid*7) % 256
        |   + (x.x*31 + y.y*17 + fr.fid*7 + 11) % 256
        |   + CASE WHEN fr.pert = 1 AND x.x = 3 AND y.y = 3
        |      THEN ((x.x*31 + y.y*17 + fr.fid*7 + 22) % 256 + 1) % 256
        |      ELSE (x.x*31 + y.y*17 + fr.fid*7 + 22) % 256 END AS gray,
        |  (y.y * 8) // fr.h * 8 + (x.x * 8) // fr.w AS slot
        | FROM frames fr
        | JOIN (SELECT unnest(generate_series(0, 46)) AS x) x ON x.x < fr.w
        | JOIN (SELECT unnest(generate_series(0, 30)) AS y) y ON y.y < fr.h),
        |blk AS (SELECT mid, f, slot, sum(gray) AS bs, count(*) AS bn
        |        FROM px GROUP BY 1, 2, 3),
        |tot AS (SELECT mid, f, sum(gray) AS ts, count(*) AS tn
        |        FROM px GROUP BY 1, 2),
        |fh AS (
        | SELECT b.mid, b.f,
        |  CAST(sum(CASE
        |    WHEN b.bs * t.tn <= t.ts * b.bn THEN 0
        |    WHEN b.slot = 63 THEN -9223372036854775807 - 1
        |    ELSE 1::BIGINT << CAST(b.slot AS INT) END) AS BIGINT) AS h
        | FROM blk b JOIN tot t USING (mid, f) GROUP BY 1, 2),
        |sig AS (
        | SELECT mid,
        |  (max(CASE WHEN f = 0 THEN h END) & max(CASE WHEN f = 1 THEN h END))
        |  | (max(CASE WHEN f = 1 THEN h END) & max(CASE WHEN f = 2 THEN h END))
        |  | (max(CASE WHEN f = 0 THEN h END) & max(CASE WHEN f = 2 THEN h END))
        |    AS vhash
        | FROM fh GROUP BY 1),
        |bands AS (
        | SELECT mid, vhash, c.c AS chunk, (vhash >> (16 * c.c)) & 65535 AS chunk_val
        | FROM sig, (SELECT unnest(generate_series(0, 3)) AS c) c)
        |SELECT DISTINCT a.mid AS doc_a, b.mid AS doc_b,
        | CAST(bit_count(xor(a.vhash, b.vhash)) AS INT) AS hamming
        |FROM bands a JOIN bands b
        |  ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.mid < b.mid
        |WHERE bit_count(xor(a.vhash, b.vhash)) <= 3""".stripMargin,
    // replays the pixel formula -> per-block gray sums -> cross-multiplied
    // mean comparison -> packed bits (bit 63 via the min-long literal:
    // DuckDB's << raises on 1<<63)
    "m06_perceptual_hash" ->
      """WITH d AS (
        | SELECT doc_id, n_chars % 40 + 8 AS w, doc_id % 24 + 8 AS h
        | FROM documents),
        |px AS (
        | SELECT d.doc_id,
        |  (x.x*31 + y.y*17 + d.doc_id*7) % 256
        |    + (x.x*31 + y.y*17 + d.doc_id*7 + 11) % 256
        |    + (x.x*31 + y.y*17 + d.doc_id*7 + 22) % 256 AS gray,
        |  (y.y * 8) // d.h * 8 + (x.x * 8) // d.w AS slot
        | FROM d
        | JOIN (SELECT unnest(generate_series(0, 46)) AS x) x ON x.x < d.w
        | JOIN (SELECT unnest(generate_series(0, 30)) AS y) y ON y.y < d.h),
        |blk AS (
        | SELECT doc_id, slot, sum(gray) AS bs, count(*) AS bn
        | FROM px GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(gray) AS ts, count(*) AS tn FROM px GROUP BY 1)
        |SELECT b.doc_id,
        | CAST(sum(CASE
        |   WHEN b.bs * t.tn <= t.ts * b.bn THEN 0
        |   WHEN b.slot = 63 THEN -9223372036854775807 - 1
        |   ELSE 1::BIGINT << CAST(b.slot AS INT) END) AS BIGINT) AS ahash,
        | CAST(sum(CASE WHEN b.bs * t.tn > t.ts * b.bn THEN 1 ELSE 0 END) AS BIGINT) AS n_bright
        |FROM blk b JOIN tot t USING (doc_id)
        |GROUP BY 1""".stripMargin,
    // m07's replay chain + recursive component labeling + min-id keep
    "m09_image_dedup" ->
      """WITH RECURSIVE mem AS (
        | SELECT doc_id AS mid, doc_id AS sid, 0 AS pert,
        |  n_chars % 40 + 8 AS w, doc_id % 24 + 8 AS h FROM documents
        | UNION ALL
        | SELECT doc_id + 10000, doc_id, 1,
        |  n_chars % 40 + 8, doc_id % 24 + 8 FROM documents WHERE doc_id % 5 = 0),
        |px AS (
        | SELECT m.mid,
        |  (x.x*31 + y.y*17 + m.sid*7) % 256
        |   + (x.x*31 + y.y*17 + m.sid*7 + 11) % 256
        |   + CASE WHEN m.pert = 1 AND x.x = 3 AND y.y = 3
        |      THEN ((x.x*31 + y.y*17 + m.sid*7 + 22) % 256 + 1) % 256
        |      ELSE (x.x*31 + y.y*17 + m.sid*7 + 22) % 256 END AS gray,
        |  (y.y * 8) // m.h * 8 + (x.x * 8) // m.w AS slot
        | FROM mem m
        | JOIN (SELECT unnest(generate_series(0, 46)) AS x) x ON x.x < m.w
        | JOIN (SELECT unnest(generate_series(0, 30)) AS y) y ON y.y < m.h),
        |blk AS (SELECT mid, slot, sum(gray) AS bs, count(*) AS bn FROM px GROUP BY 1, 2),
        |tot AS (SELECT mid, sum(gray) AS ts, count(*) AS tn FROM px GROUP BY 1),
        |hash AS (
        | SELECT b.mid,
        |  CAST(sum(CASE
        |    WHEN b.bs * t.tn <= t.ts * b.bn THEN 0
        |    WHEN b.slot = 63 THEN -9223372036854775807 - 1
        |    ELSE 1::BIGINT << CAST(b.slot AS INT) END) AS BIGINT) AS ahash
        | FROM blk b JOIN tot t USING (mid) GROUP BY 1),
        |bands AS (
        | SELECT mid, ahash, c.c AS chunk, (ahash >> (16 * c.c)) & 65535 AS chunk_val
        | FROM hash, (SELECT unnest(generate_series(0, 3)) AS c) c),
        |pairs AS (
        | SELECT DISTINCT a.mid AS doc_a, b.mid AS doc_b
        | FROM bands a JOIN bands b
        |   ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.mid < b.mid
        | WHERE bit_count(xor(a.ahash, b.ahash)) <= 2),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |reach(node, lbl) AS (
        | SELECT node, node FROM nodes
        | UNION
        | SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node),
        |comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY 1)
        |SELECT h.mid AS member_id FROM hash h
        |LEFT JOIN comp ON h.mid = comp.node
        |WHERE comp.node IS NULL OR comp.component = h.mid""".stripMargin,
    // full SQL replay: members (originals + every-fifth perturbed variant),
    // the perturbed pixel's blue bump, both block-mean hashes, the 16-bit
    // pigeonhole bands, and the exact bit_count(xor) verify
    "m07_image_neardup" ->
      """WITH mem AS (
        | SELECT doc_id AS mid, doc_id AS sid, 0 AS pert,
        |  n_chars % 40 + 8 AS w, doc_id % 24 + 8 AS h FROM documents
        | UNION ALL
        | SELECT doc_id + 10000, doc_id, 1,
        |  n_chars % 40 + 8, doc_id % 24 + 8 FROM documents WHERE doc_id % 5 = 0),
        |px AS (
        | SELECT m.mid,
        |  (x.x*31 + y.y*17 + m.sid*7) % 256
        |   + (x.x*31 + y.y*17 + m.sid*7 + 11) % 256
        |   + CASE WHEN m.pert = 1 AND x.x = 3 AND y.y = 3
        |      THEN ((x.x*31 + y.y*17 + m.sid*7 + 22) % 256 + 1) % 256
        |      ELSE (x.x*31 + y.y*17 + m.sid*7 + 22) % 256 END AS gray,
        |  (y.y * 8) // m.h * 8 + (x.x * 8) // m.w AS slot
        | FROM mem m
        | JOIN (SELECT unnest(generate_series(0, 46)) AS x) x ON x.x < m.w
        | JOIN (SELECT unnest(generate_series(0, 30)) AS y) y ON y.y < m.h),
        |blk AS (SELECT mid, slot, sum(gray) AS bs, count(*) AS bn FROM px GROUP BY 1, 2),
        |tot AS (SELECT mid, sum(gray) AS ts, count(*) AS tn FROM px GROUP BY 1),
        |hash AS (
        | SELECT b.mid,
        |  CAST(sum(CASE
        |    WHEN b.bs * t.tn <= t.ts * b.bn THEN 0
        |    WHEN b.slot = 63 THEN -9223372036854775807 - 1
        |    ELSE 1::BIGINT << CAST(b.slot AS INT) END) AS BIGINT) AS ahash
        | FROM blk b JOIN tot t USING (mid) GROUP BY 1),
        |bands AS (
        | SELECT mid, ahash, c.c AS chunk, (ahash >> (16 * c.c)) & 65535 AS chunk_val
        | FROM hash, (SELECT unnest(generate_series(0, 3)) AS c) c)
        |SELECT DISTINCT a.mid AS doc_a, b.mid AS doc_b,
        | CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
        |FROM bands a JOIN bands b
        |  ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.mid < b.mid
        |WHERE bit_count(xor(a.ahash, b.ahash)) <= 2""".stripMargin,
    // full SQL replay: members (originals + every-fourth gain-3 re-encode),
    // the integer-bounded 65-window energies (scaled samples squared), the
    // contour bits, the banding and the exact-distance verify
    "m08_audio_fingerprint" ->
      """WITH mem AS (
        | SELECT doc_id AS mid, doc_id AS sid, 1 AS gain,
        |  n_chars % 400 + 100 AS n FROM documents
        | UNION ALL
        | SELECT doc_id + 10000, doc_id, 3, n_chars % 400 + 100
        | FROM documents WHERE doc_id % 4 = 0),
        |sm AS (
        | SELECT m.mid, (i.i * 65) // m.n AS win,
        |  ((m.sid*31 + i.i*7) % 2001 - 1000) * m.gain AS v
        | FROM mem m
        | JOIN (SELECT unnest(generate_series(0, 498)) AS i) i ON i.i < m.n),
        |en AS (SELECT mid, win, sum(v*v) AS e FROM sm GROUP BY 1, 2),
        |fp AS (
        | SELECT a.mid,
        |  CAST(sum(CASE
        |    WHEN b.e <= a.e THEN 0
        |    WHEN a.win = 63 THEN -9223372036854775807 - 1
        |    ELSE 1::BIGINT << CAST(a.win AS INT) END) AS BIGINT) AS f
        | FROM en a JOIN en b ON b.mid = a.mid AND b.win = a.win + 1
        | WHERE a.win < 64 GROUP BY 1),
        |bands AS (
        | SELECT mid, f, c.c AS chunk, (f >> (16 * c.c)) & 65535 AS chunk_val
        | FROM fp, (SELECT unnest(generate_series(0, 3)) AS c) c)
        |SELECT DISTINCT a.mid AS doc_a, b.mid AS doc_b,
        | CAST(bit_count(xor(a.f, b.f)) AS INT) AS hamming
        |FROM bands a JOIN bands b
        |  ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.mid < b.mid
        |WHERE bit_count(xor(a.f, b.f)) <= 0""".stripMargin,
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
    // replays PngCodec's pixel formula: lossless PNG means the decoded
    // sum equals the generation formula exactly
    "m03_decode" ->
      """WITH d AS (
        | SELECT doc_id, n_chars % 40 + 8 AS w, doc_id % 24 + 8 AS h
        | FROM documents)
        |SELECT d.doc_id,
        | CAST(d.w AS BIGINT) AS width,
        | CAST(d.h AS BIGINT) AS height,
        | CAST(sum((x.x*31 + y.y*17 + d.doc_id*7) % 256
        |        + (x.x*31 + y.y*17 + d.doc_id*7 + 11) % 256
        |        + (x.x*31 + y.y*17 + d.doc_id*7 + 22) % 256) AS BIGINT) AS pix_sum
        |FROM d
        |JOIN (SELECT unnest(generate_series(0, 46)) AS x) x ON x.x < d.w
        |JOIN (SELECT unnest(generate_series(0, 30)) AS y) y ON y.y < d.h
        |GROUP BY d.doc_id, d.w, d.h""".stripMargin,
    // replays WavCodec's sample formula: lossless PCM means the decoded
    // integer energy equals the generation formula exactly
    "m04_audio_decode" ->
      """SELECT doc_id,
        | CAST(8000 AS BIGINT) AS sample_rate,
        | CAST(n_chars % 400 + 100 AS BIGINT) AS n_samples,
        | CAST((SELECT sum(((doc_id*31 + i.i*7) % 2001 - 1000)
        |            * ((doc_id*31 + i.i*7) % 2001 - 1000))
        |       FROM (SELECT unnest(generate_series(0, 499)) AS i) i
        |       WHERE i.i < n_chars % 400 + 100) AS BIGINT) AS energy
        |FROM documents""".stripMargin,
    // replays the 2x2 integer box filter over PngCodec's pixel formula:
    // floor((p00+p10+p01+p11)/4) per channel over the cropped even grid
    "m05_image_resize" ->
      """WITH d AS (
        | SELECT doc_id, (n_chars % 40 + 8) // 2 AS ow, (doc_id % 24 + 8) // 2 AS oh
        | FROM documents)
        |SELECT d.doc_id,
        | CAST(d.ow AS BIGINT) AS out_w,
        | CAST(d.oh AS BIGINT) AS out_h,
        | CAST(sum(
        |   ((2*x.x*31   + 2*y.y*17 + d.doc_id*7) % 256
        |  + ((2*x.x+1)*31 + 2*y.y*17 + d.doc_id*7) % 256
        |  + (2*x.x*31   + (2*y.y+1)*17 + d.doc_id*7) % 256
        |  + ((2*x.x+1)*31 + (2*y.y+1)*17 + d.doc_id*7) % 256) // 4
        | + ((2*x.x*31   + 2*y.y*17 + d.doc_id*7 + 11) % 256
        |  + ((2*x.x+1)*31 + 2*y.y*17 + d.doc_id*7 + 11) % 256
        |  + (2*x.x*31   + (2*y.y+1)*17 + d.doc_id*7 + 11) % 256
        |  + ((2*x.x+1)*31 + (2*y.y+1)*17 + d.doc_id*7 + 11) % 256) // 4
        | + ((2*x.x*31   + 2*y.y*17 + d.doc_id*7 + 22) % 256
        |  + ((2*x.x+1)*31 + 2*y.y*17 + d.doc_id*7 + 22) % 256
        |  + (2*x.x*31   + (2*y.y+1)*17 + d.doc_id*7 + 22) % 256
        |  + ((2*x.x+1)*31 + (2*y.y+1)*17 + d.doc_id*7 + 22) % 256) // 4
        | ) AS BIGINT) AS out_sum
        |FROM d
        |JOIN (SELECT unnest(generate_series(0, 23)) AS x) x ON x.x < d.ow
        |JOIN (SELECT unnest(generate_series(0, 15)) AS y) y ON y.y < d.oh
        |GROUP BY d.doc_id, d.ow, d.oh""".stripMargin,
  )
}
