package graft.operators

import graft.api.Pipelines
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis gate queries over the `documents` table — thin wrappers over
 * the library surface (`graft.api.Pipelines`), validated row-for-row against
 * the DuckDB oracles below. See Pipelines for the operator design notes.
 */
object TextOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  def t01LangId(spark: SparkSession, dir: String): DataFrame =
    Pipelines.langId(
      docs(spark, dir).select(col("doc_id"), col("lang").as("actual_lang"), col("text")),
      col("text"))
      .select("doc_id", "actual_lang", "pred_lang", "h_en", "h_de", "h_fr", "h_es")

  def t02Quality(spark: SparkSession, dir: String): DataFrame =
    Pipelines.textQuality(docs(spark, dir), col("text"))
      .select("doc_id", "n_chars", "n_words", "punct_cnt", "alpha_cnt",
        "stop_hits", "alpha_permille", "keep")

  def t03Tokens(spark: SparkSession, dir: String): DataFrame =
    Pipelines.tokenCounts(docs(spark, dir), col("text"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("total_ws_tokens"),
        sum("word_tokens").as("total_word_tokens"),
        sum("chars").as("total_chars"))

  def t04Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Pipelines.fingerprint(docs(spark, dir), col("text"))
      .select("doc_id", "fp_full", "fp_head")

  /** Corpus term statistics: per-language top terms by document frequency
    * (the integer core of TF-IDF — idf's `ln` is libm-dependent, so ranking
    * stays on exact counts). */
  def t05TermStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs(spark, dir)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("word"))
      .groupBy("lang", "word")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
    val w = Window.partitionBy("lang")
      .orderBy(col("df").desc, col("tf").desc, col("word"))
    terms.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 10)
      .select("lang", "word", "tf", "df", "rnk")
  }

  /** Gopher-style repetition filters: top-bigram share + distinct-word
    * ratio per document (integer permille — see Pipelines.repetitionStats). */
  def t06Repetition(spark: SparkSession, dir: String): DataFrame =
    Pipelines.repetitionStats(docs(spark, dir), col("doc_id"), col("text"))
      .withColumnRenamed("__id", "doc_id")

  /** Deterministic per-language sample: 10 docs per lang ranked by content
    * hash — reproducible curation subsets (see Pipelines.stratifiedSample). */
  def t07Sample(spark: SparkSession, dir: String): DataFrame =
    Pipelines.stratifiedSample(
      docs(spark, dir).select(col("doc_id"), col("lang")),
      col("lang"), col("doc_id"), k = 10)
      .select("doc_id", "lang", "rn")

  /** End-to-end curation composition: quality filter -> exact dedup ->
    * deterministic per-language sample. Exercises that the library stages
    * compose as plain DataFrame transforms with one Catalyst plan. */
  def t08Curation(spark: SparkSession, dir: String): DataFrame = {
    val kept = Pipelines.textQuality(docs(spark, dir), col("text"))
      .filter(col("keep") === 1)
    val deduped = Pipelines.applyExactDedup(kept, col("text"), col("doc_id"))
    Pipelines.stratifiedSample(
      deduped.select(col("doc_id"), col("lang")),
      col("lang"), col("doc_id"), k = 5)
      .select("doc_id", "lang", "rn")
  }

  /** Sketch-based heavy hitters: t05's question (frequent terms per
    * language) answered with bounded state — a Misra-Gries summary of 64
    * counters per language generates candidates, then a broadcast-join
    * second pass counts them exactly and keeps the provable heavy hitters
    * (frequency > n/65), so the result is deterministic and hash-exact
    * against a plain GROUP BY oracle while no per-distinct-term aggregate
    * ever materializes. The MG retention bound itself is additionally
    * asserted vs exact ground truth in OperatorSpec. */
  def t09HeavyHitters(spark: SparkSession, dir: String): DataFrame =
    Pipelines.verifiedHeavyHitters(
      docs(spark, dir).select(col("lang"), explode(split(col("text"), " ")).as("word")),
      Seq("lang"), col("word"), k = 5, capacity = 64)

  /** Sequence packing: greedy next-fit of documents into 1000-token rows,
    * sharded by language, deterministic by doc_id order — the pre-training
    * batching step. Oracle = the same greedy recurrence as a DuckDB
    * recursive CTE over the identical whitespace token counts. */
  def t10SequencePacking(spark: SparkSession, dir: String): DataFrame =
    Pipelines.packSequences(
      docs(spark, dir),
      col("lang"), col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long"),
      budget = 1000L)
      .withColumnRenamed("shard", "lang")
      .withColumnRenamed("id", "doc_id")

  /** t11's language mixture — shared between the Spark query and the
    * DuckDB oracle so the permille weights cannot drift. */
  private val MixtureWeights = Map(
    "en" -> 600, "de" -> 1000, "fr" -> 250, "es" -> 0, "zh" -> 125)

  /** Deterministic mixture sampling: per-language hash-threshold Bernoulli
    * keep (static domain reweighting). Same hash on both engines (md5 of
    * the id string), so the kept set is hash-exact. */
  def t11MixtureSample(spark: SparkSession, dir: String): DataFrame =
    Pipelines.mixtureSample(
      docs(spark, dir).select(col("doc_id"), col("lang")),
      col("lang"), col("doc_id"), MixtureWeights)
      .select("doc_id", "lang", "bucket")

  /** t20: temperature-flattened source mixture — keep rates derived from
    * the data (sqrt scaling: the smallest source keeps everything), then
    * the deterministic md5-bucket filter. Integer-permille rates + IEEE
    * sqrt make the data-dependent rates replay exactly in SQL. */
  def t20TemperatureSample(spark: SparkSession, dir: String): DataFrame =
    Pipelines.temperatureSample(
      docs(spark, dir).select(col("doc_id"), col("lang")),
      col("lang"), col("doc_id"))
      .select("doc_id", "lang", "bucket")

  /** PII redaction (emails / IPv4 / phone numbers). The corpus itself is
    * clean, so the gate appends deterministic PII derived from `doc_id` —
    * the oracle builds the IDENTICAL text in SQL, so the redacted output
    * and the per-kind counts are hash-compared exactly. */
  def t12PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val withPii = docs(spark, dir).select(col("doc_id"),
      concat(col("text"),
        lit(" contact u"), col("doc_id").cast("string"),
        lit("@example.com or 10."), (col("doc_id") % 256).cast("string"),
        lit(".0.1 tel +1555"), col("doc_id").cast("string")).as("text"))
    Pipelines.redactPii(withPii, col("text"))
      .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
  }

  /** t13: URL canonicalization + dedup report. The corpus carries no URL
    * column, so the gate synthesizes one per doc — two variants per base id
    * that must COLLIDE after canonicalization (scheme case, www, tracking
    * params, fragment, trailing slash all differ); the oracle rebuilds the
    * identical URLs and replays the canonicalization in SQL. */
  def t13UrlCanonicalize(spark: SparkSession, dir: String): DataFrame = {
    val base = expr("doc_id div 2").cast("string")
    val withUrl = docs(spark, dir).select(col("doc_id")).withColumn("url",
      when(col("doc_id") % 2 === 0,
        concat(lit("https://WWW.News-Site.com/articles/item-"), base,
          lit("/?utm_source=rss&utm_medium=feed&page="),
          (expr("doc_id div 2") % 3).cast("string"), lit("#top")))
        .otherwise(
          concat(lit("http://news-site.com/articles/item-"), base,
            lit("?page="), (expr("doc_id div 2") % 3).cast("string"),
            lit("&gclid=g"), col("doc_id").cast("string"))))
    Pipelines.canonicalizeUrls(withUrl, col("url"))
      .groupBy("canonical_url", "host")
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("canonical_id"))
  }

  /** t14: overlapping token-window chunking (64-token chunks, 16-token
    * overlap) — chunk identity carried as md5 so the gate output stays
    * row-per-chunk without shipping the text twice. */
  def t14ChunkDocs(spark: SparkSession, dir: String): DataFrame =
    Pipelines.chunkByTokens(docs(spark, dir), col("doc_id"), col("text"),
      chunkTokens = 64, overlap = 16)

  /** t15: C4-style page/line filters. The corpus is single-line and
    * punctuation-free, so the gate synthesizes page structure
    * deterministically — 7-word lines, a terminal period on 2 of 3 lines,
    * and per-doc-id injections of the C4 drop markers (lorem ipsum, a
    * curly-brace code line, a javascript notice). The oracle rebuilds the
    * identical pages and replays the filters in SQL. */
  def t15C4Filters(spark: SparkSession, dir: String): DataFrame = {
    val synth = docs(spark, dir).select(col("doc_id"), col("text"))
      .withColumn("__w", split(col("text"), " "))
      .withColumn("__nl", expr("greatest(1L, (size(__w) + 6) div 7)"))
      .withColumn("__lines", expr(
        "transform(sequence(0L, __nl - 1), i -> " +
          "array_join(slice(__w, cast(i*7+1 as int), 7), ' ') || " +
          "(case when (doc_id + i) % 3 = 0 then '' else '.' end))"))
      .withColumn("__lines2", concat(
        when(col("doc_id") % 13 === 0,
          array(lit("lorem ipsum dolor sit amet consectetur adipiscing.")))
          .otherwise(lit(Array.empty[String])),
        col("__lines"),
        when(col("doc_id") % 17 === 0,
          array(lit("function() { return 1; }.")))
          .otherwise(lit(Array.empty[String])),
        when(col("doc_id") % 11 === 0,
          array(lit("enable javascript to view this page properly.")))
          .otherwise(lit(Array.empty[String]))))
      .withColumn("page_text", array_join(col("__lines2"), "\n"))
    Pipelines.c4Filters(synth, col("page_text"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("page_keep"),
        md5(col("cleaned")).as("clean_md5"))
  }

  /** Winnowing fingerprints (MOSS): per-document (pos, hash) selections —
    * every shared substring of length >= w+k-1 = 15 chars is guaranteed to
    * surface as a shared fingerprint at ~2/(w+1) shingling density. The
    * coverage guarantee is property-tested in OperatorSpec; the oracle
    * replays the single-window-pass selection byte-identically. */
  def t16WinnowFingerprints(spark: SparkSession, dir: String): DataFrame =
    Pipelines.winnowFingerprints(docs(spark, dir), col("doc_id"), col("text"),
      k = 8, w = 8)
      .withColumnRenamed("id", "doc_id")

  /** Model-based quality classifier (t17): hashed-feature linear scorer
    * with a synthesized deterministic weight table (bucket b's weight =
    * hash60(b) % 2001 - 1000 millis) — the model values are arbitrary by
    * design; what the gate pins is the full scoring pipeline: tokenize,
    * bigram, hash-trick bucketing, broadcast weight join, integer logit
    * fold, monotone-link thresholding. A real model drops in as the same
    * (bucket, weight_milli) table. */
  def t17QualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val b = 1024
    val weights = spark.range(b).select(col("id").as("bucket"),
      (pmod(graft.functions.KmvDistinctAgg.hash60(col("id")), lit(2001L)) - 1000L)
        .as("weight_milli"))
    Pipelines.linearQualityScore(docs(spark, dir), col("doc_id"), col("text"),
      weights, buckets = b)
      .withColumnRenamed("__id", "doc_id")
  }

  /** t18: rare-word scoring — per-doc share of tokens outside the
    * corpus's top-256 document-frequency vocabulary (broadcast set, zero
    * corpus shuffle for the scoring). All-integer permille output. */
  def t18RareWords(spark: SparkSession, dir: String): DataFrame =
    Pipelines.rareWordScore(docs(spark, dir), col("doc_id"), col("text"), topK = 256)
      .withColumnRenamed("__id", "doc_id")

  /** t19: unigram-LM surprisal scoring (integer bits-per-token, the CCNet
    * perplexity-filter shape) — high tail = gibberish/OCR noise, low tail
    * = boilerplate. Engine-exact via binary bit lengths (no libm ln). */
  def t19LmSurprisal(spark: SparkSession, dir: String): DataFrame =
    Pipelines.lmSurprisalScore(docs(spark, dir), col("doc_id"), col("text"))
      .withColumnRenamed("__id", "doc_id")

  /** t28: trigram-LM surprisal with stupid backoff — the CCNet/KenLM
    * perplexity-filter shape one order above t19's unigram: shuffled-word
    * salad that unigram statistics cannot see scores expensive here
    * because its CONTEXTS are unattested. Integer bits throughout (floor-
    * log2 via binary length, +2 bits per backoff level), trigrams pruned
    * below count 2 — both choices keep the oracle hash-exact with no libm
    * `ln` on either side. */
  def t28TrigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    // cross-trained (the production shape): the model's counts come from
    // the even-id half only, so scoring the full corpus exercises every
    // backoff level INCLUDING the unigram floor — self-trained scoring
    // structurally never reaches it (each trigram embeds its own backoff
    // bigram)
    val d = docs(spark, dir)
    Pipelines.trigramLmScore(d, col("doc_id"), col("text"),
      train = Some(d.filter(col("doc_id") % 2 === 0)))
      .withColumnRenamed("__id", "doc_id")
  }

  /** t21: Unicode text normalization — the curation front door (CCNet /
    * C4 / FineWeb normalize BEFORE dedup and filtering, because 'Café'
    * and 'Café' must hash identically). The decoration prefix makes
    * every rule fire on every row: an NFD-form combining acute (NFC
    * composition), precomposed accents (fold), uppercase (ROOT
    * lowercase), doubled and trailing whitespace (collapse + trim). The
    * fused codegen expression ([[graft.functions.NormalizeText]]) has an
    * allocation-free ASCII fast path; the oracle replays the pipeline as
    * `trim(regexp_replace(lower(strip_accents(nfc_normalize(...))), ...))`. */
  def t21UnicodeNormalize(spark: SparkSession, dir: String): DataFrame = {
    val deco = concat(
      lit("Café  NAÏVE — Façade  "), col("text"))
    docs(spark, dir).select(col("doc_id"),
      graft.functions.NormalizeText(deco).as("norm"))
      .withColumn("n_chars_norm", length(col("norm")).cast("long"))
  }

  /** t22: CCNet/RefinedWeb cross-document boilerplate line removal — a
    * line whose normalized form recurs in >= 5 distinct documents is
    * template chrome and drops from every carrier. Synthetic pages reuse
    * t15's 7-word-line construction plus two injected boilerplate lines
    * (a copyright header on every 5th doc — UPPERCASED on every 10th, so
    * the removal is pinned to the NORMALIZED form — and a newsletter
    * footer on every 7th); the oracle replays the page build, the md5
    * line-key df-count, the threshold, and the order-preserving rebuild. */
  def t22BoilerplateLines(spark: SparkSession, dir: String): DataFrame = {
    val synth = docs(spark, dir).select(col("doc_id"), col("text"))
      .withColumn("__w", split(col("text"), " "))
      .withColumn("__nl", expr("greatest(1L, (size(__w) + 6) div 7)"))
      .withColumn("__lines", expr(
        "transform(sequence(0L, __nl - 1), i -> " +
          "array_join(slice(__w, cast(i*7+1 as int), 7), ' '))"))
      .withColumn("__lines2", concat(
        when(col("doc_id") % 10 === 0,
          array(lit("ALL RIGHTS RESERVED COPYRIGHT NOTICE.")))
          .when(col("doc_id") % 5 === 0,
            array(lit("all rights reserved copyright notice.")))
          .otherwise(lit(Array.empty[String])),
        col("__lines"),
        when(col("doc_id") % 7 === 0,
          array(lit("Subscribe to our newsletter for updates!")))
          .otherwise(lit(Array.empty[String]))))
      .withColumn("page_text", array_join(col("__lines2"), "\n"))
    Pipelines.boilerplateLines(synth, col("page_text"), col("doc_id"),
      minDocs = 5)
      .select(col("doc_id"), col("n_lines"), col("n_boiler"),
        md5(col("cleaned")).as("clean_md5"))
  }

  /** t23: the published Gopher quality-rule bundle over synthetic pages —
    * t15's 7-word-line construction plus doc-dependent bullet lines
    * (every 4th doc) and ellipsis endings (every 6th), so the line-shape
    * rules actually fire; every metric is integer fixed-point and every
    * regex sits in the Java/RE2 common subset, so the whole bundle —
    * metrics AND keep decisions — replays exactly. */
  def t23GopherQuality(spark: SparkSession, dir: String): DataFrame = {
    val synth = docs(spark, dir).select(col("doc_id"), col("text"))
      .withColumn("__w", split(col("text"), " "))
      .withColumn("__nl", expr("greatest(1L, (size(__w) + 6) div 7)"))
      .withColumn("__lines", expr(
        "transform(sequence(0L, __nl - 1), i -> " +
          "array_join(slice(__w, cast(i*7+1 as int), 7), ' '))"))
      .withColumn("__lines2", concat(
        when(col("doc_id") % 4 === 0,
          array(lit("- first bullet item"), lit("* second bullet item")))
          .otherwise(lit(Array.empty[String])),
        col("__lines"),
        when(col("doc_id") % 6 === 0,
          array(lit("to be continued...")))
          .otherwise(lit(Array.empty[String]))))
      .withColumn("page_text", array_join(col("__lines2"), "\n"))
    Pipelines.gopherQualityFilters(synth, col("page_text"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len_centi"),
        col("symbol_ratio_milli"), col("bullet_frac_milli"),
        col("ellipsis_frac_milli"), col("alpha_frac_milli"),
        col("stop_hits"), col("keep"))
  }

  /** t24: DSIR importance resampling — the target distribution is the
    * corpus's own English slice (the standard fixture shape: a trusted
    * subset steers selection over the whole crawl). Every doc comes back
    * with its integer-bits importance score and the resampling verdict;
    * the oracle replays featurization, both smoothed hashed-ngram models,
    * the bit-length log quantization, and the shifted-power-of-two coin. */
  def t24DsirResample(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    Pipelines.dsirResample(d, d.filter(col("lang") === "en"),
      col("doc_id"), col("text"), buckets = 512)
      .select(col("__id").as("doc_id"), col("score_bits"), col("kept"))
  }

  /** t25: memorization exposure — per-doc permille of characters covered
    * by corpus-duplicated 40-char windows, the doc-level risk score over
    * the d13 span machinery; oracle replays spans + the integer fold. */
  def t25MemorizationExposure(spark: SparkSession, dir: String): DataFrame =
    Pipelines.memorizationExposure(docs(spark, dir), col("doc_id"), col("text"), L = 40)
      .withColumnRenamed("__id", "doc_id")

  // ---------------------------------------------------------------- t26
  /** Distributed BPE tokenizer training (Sennrich et al. 2016, the
    * subword-vocabulary algorithm behind GPT-2/LLaMA tokenizers): one
    * corpus scan aggregates word frequencies, then each greedy merge
    * round iterates over the compact word table — see
    * [[Pipelines.bpeTrain]]. Output: the three learned merges (round,
    * pair, weighted count) plus the round-4 top-20 pair statistics over
    * the merged state, all oracle-exact — the argmax of every round is
    * replayed in SQL as a scalar-subquery CTE, merged pairs compressed to
    * the same U+E000.. sentinels on both sides. */
  def t26BpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val (merges, words) = Pipelines.bpeTrain(
      docs(spark, dir).select(col("text")), "text", numMerges = 3)
    import spark.implicits._
    val mergesDf = merges.toDF("round", "pair", "cnt")
    val p4 = Pipelines.bpePairStats(words)
      .orderBy(col("cnt").desc, col("pair").asc).limit(20)
      .select(lit(4).as("round"), col("pair"), col("cnt"))
    mergesDf.select(col("round"), col("pair"), col("cnt")).unionAll(p4)
  }

  // ---------------------------------------------------------------- t31
  /** Unigram-LM tokenizer training (Kudo 2018, the SentencePiece
    * algorithm — the other dominant public tokenizer family next to
    * t26's BPE): substring-count seeding, Viterbi E-steps, integer-bits
    * M-steps, zero-loss pruning — see [[Pipelines.unigramTrain]]. The
    * oracle replays the ENTIRE training loop in SQL: seed fan-out and
    * top-K selection, both EM rounds' position-unrolled Viterbi DP
    * (row_number over the same (cost, pieces, backpointer) tiebreak),
    * backtracked piece counts, bit-length score re-estimation, and the
    * prune rule — so the gate pins every step, not just the final
    * shape. Output: the final vocabulary (piece, cnt, score_bits). */
  def t31UnigramVocab(spark: SparkSession, dir: String): DataFrame = {
    val (vocab, _) = Pipelines.unigramTrain(
      docs(spark, dir).select(col("text")), "text",
      maxPieceLen = 4, seedSize = 64, emIters = 2, maxWordLen = 8)
    import spark.implicits._
    vocab.toDF("piece", "cnt", "score_bits")
  }

  // ---------------------------------------------------------------- t32
  /** Unigram ENCODE (see [[Pipelines.unigramEncode]]): train the same
    * vocabulary as t31, then price every document in tokens — the
    * per-word Viterbi DP nested inside the per-doc word fold, one
    * zero-shuffle codegen scan with the scores baked in as a literal
    * map; over-cap words price at character fallback. */
  def t32UnigramEncode(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val (vocab, _) = Pipelines.unigramTrain(d.select(col("text")), "text",
      maxPieceLen = 4, seedSize = 64, emIters = 2, maxWordLen = 8)
    Pipelines.unigramEncode(d, col("doc_id"), col("text"),
      vocab.map(v => (v._1, v._3)), maxPieceLen = 4, maxWordLen = 8)
      .withColumnRenamed("id", "doc_id")
  }

  // ---------------------------------------------------------------- t29
  /** BPE encode (see [[Pipelines.bpeEncode]]): train the same three
    * merges as t26, then price every document in tokens — one zero-
    * shuffle codegen scan with the merge chain baked in as literals. */
  def t29BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val (merges, _) = Pipelines.bpeTrain(d.select(col("text")), "text", 3)
    Pipelines.bpeEncode(d, col("doc_id"), col("text"), merges)
      .withColumnRenamed("id", "doc_id")
  }

  // ---------------------------------------------------------------- t30
  /** Leakage-free split (see [[Pipelines.leakageFreeSplit]]): near-dup
    * clusters (d04's pairs) land WHOLE in one split — the representative's
    * hash decides for every member — so the held-out set cannot leak
    * through paraphrases of training documents. In-gate pin: no cluster
    * straddles a split boundary. */
  def t30LeakageFreeSplit(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val res = Pipelines.leakageFreeSplit(d, col("doc_id"),
      Dedup.d04NgramJaccard(spark, dir), seed = "graft")
    val straddlers = res.groupBy("rep")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    require(straddlers == 0, s"$straddlers clusters straddle a split boundary")
    res.withColumnRenamed("id", "doc_id")
  }

  // ---------------------------------------------------------------- t27
  /** Deterministic split + sharded shuffle (see [[Pipelines.splitShuffle]]):
    * 96/2/2 train/val/test by the id's seeded md5, 8 shards, and a
    * deterministic within-shard order — the trainer-facing deal of the
    * corpus, stable under reruns and corpus growth. Oracle-exact: both
    * engines compute the same md5, hex thresholds, and window. */
  def t27SplitShuffle(spark: SparkSession, dir: String): DataFrame =
    Pipelines.splitShuffle(
      docs(spark, dir).select(col("doc_id")), col("doc_id"), seed = "graft")
      .select(col("doc_id"), col("split"), col("shard"), col("pos"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_langid" -> t01LangId _,
    "t02_quality" -> t02Quality _,
    "t03_tokens" -> t03Tokens _,
    "t04_fingerprint" -> t04Fingerprint _,
    "t05_term_stats" -> t05TermStats _,
    "t06_repetition" -> t06Repetition _,
    "t07_sample" -> t07Sample _,
    "t08_curation" -> t08Curation _,
    "t09_heavy_hitters" -> t09HeavyHitters _,
    "t10_sequence_packing" -> t10SequencePacking _,
    "t11_mixture_sample" -> t11MixtureSample _,
    "t12_pii_redact" -> t12PiiRedact _,
    "t13_url_canonicalize" -> t13UrlCanonicalize _,
    "t14_chunk_docs" -> t14ChunkDocs _,
    "t15_c4_filters" -> t15C4Filters _,
    "t16_winnow_fingerprints" -> t16WinnowFingerprints _,
    "t17_quality_classifier" -> t17QualityClassifier _,
    "t18_rare_words" -> t18RareWords _,
    "t19_lm_surprisal" -> t19LmSurprisal _,
    "t20_temperature_sample" -> t20TemperatureSample _,
    "t21_unicode_normalize" -> t21UnicodeNormalize _,
    "t22_boilerplate_lines" -> t22BoilerplateLines _,
    "t23_gopher_quality" -> t23GopherQuality _,
    "t24_dsir_resample" -> t24DsirResample _,
    "t25_memorization_exposure" -> t25MemorizationExposure _,
    "t26_bpe_merges" -> t26BpeMerges _,
    "t27_split_shuffle" -> t27SplitShuffle _,
    "t28_trigram_surprisal" -> t28TrigramSurprisal _,
    "t29_bpe_encode" -> t29BpeEncode _,
    "t30_leakage_free_split" -> t30LeakageFreeSplit _,
    "t31_unigram_vocab" -> t31UnigramVocab _,
    "t32_unigram_encode" -> t32UnigramEncode _,
  )

  /** t31's oracle: the full unigram training loop in static SQL. The
    * Viterbi DP unrolls by position (words cap at maxWordLen = 8), each
    * position's argmin replayed as a row_number over the exact
    * (cost, np, bp) tiebreak [[Pipelines.unigramSegment]] uses; the
    * backtrack unrolls the same way. Two EM rounds, then the final
    * (piece, cnt, score_bits) state. */
  private def unigramOracleSql: String = {
    val EM = UnigramEm
    s"""WITH ${unigramTrainCtes()}
       |SELECT piece, CAST(cnt AS BIGINT) AS cnt,
       | CAST(score AS BIGINT) AS score_bits FROM voc$EM""".stripMargin
  }

  /** t32's oracle: the t31 training CTEs verbatim (so gate and oracle
    * can never diverge on the model), then one more position-unrolled DP
    * pass over the distinct word table under the FINAL scores — the
    * full-length prefix's piece count IS the word's price — joined back
    * to per-document word multiplicities; words beyond the training cap
    * price at character fallback (`length(w)`). */
  private def unigramEncodeOracleSql: String = {
    val EM = UnigramEm; val L = UnigramMaxWordLen
    s"""WITH ${unigramTrainCtes()},
       |${unigramDpCtes(EM)},
       |etok AS MATERIALIZED (
       | SELECT w, np FROM (
       |${(1 to L).map(i =>
           s"  SELECT w, CAST($i AS BIGINT) AS pos, np FROM d${EM}_$i")
           .mkString("\n  UNION ALL\n")}
       | ) WHERE pos = length(w)),
       |dw AS MATERIALIZED (
       | SELECT doc_id, w, count(*) AS cnt FROM (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
       |  FROM documents)
       | WHERE w <> '' GROUP BY 1, 2)
       |SELECT d.doc_id,
       | CAST(sum(d.cnt) AS BIGINT) AS n_words,
       | CAST(sum(d.cnt * length(d.w)) AS BIGINT) AS n_chars,
       | CAST(sum(d.cnt * CASE WHEN length(d.w) > $L THEN length(d.w)
       |   ELSE t.np END) AS BIGINT) AS n_tokens
       |FROM dw d LEFT JOIN etok t ON t.w = d.w
       |GROUP BY 1""".stripMargin
  }

  private val UnigramP = 4
  private val UnigramSeed = 64
  private val UnigramEm = 2
  private val UnigramMaxWordLen = 8
  private val UnigramBig = "1000000000000"

  /** The position-unrolled Viterbi DP over `w0` under `voc{k}`:
    * CTEs `d{k}_0 .. d{k}_L`, argmin per position replayed as a
    * row_number over the exact (cost, np, bp) tiebreak
    * [[Pipelines.unigramSegment]]'s struct array_min uses. */
  private def unigramDpCtes(k: Int): String = {
    val P = UnigramP; val L = UnigramMaxWordLen; val BIG = UnigramBig
    val dps = (1 to L).map { i =>
      val branches = (math.max(0, i - P) until i).map { j =>
        s"""   SELECT d.w, d.cnt,
           |    d.cost + coalesce(v.score, $BIG) AS cost,
           |    d.np + 1 AS np, CAST($j AS BIGINT) AS bp
           |   FROM d${k}_$j d LEFT JOIN voc$k v
           |     ON v.piece = substr(d.w, ${j + 1}, ${i - j})
           |   WHERE length(d.w) >= $i""".stripMargin
      }.mkString("\n   UNION ALL\n")
      s"""d${k}_$i AS MATERIALIZED (
         | SELECT w, cnt, cost, np, bp FROM (
         |  SELECT *, row_number() OVER (PARTITION BY w ORDER BY cost, np, bp) AS rn
         |  FROM (
         |$branches
         |  )) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""d${k}_0 AS MATERIALIZED (SELECT w, cnt, CAST(0 AS BIGINT) AS cost,
       |  CAST(0 AS BIGINT) AS np, CAST(-1 AS BIGINT) AS bp FROM w0),
       |$dps""".stripMargin
  }

  /** The full t31 training chain as WITH-body CTEs (seed fan-out, top-K
    * selection, `UnigramEm` rounds of DP + backtrack + count + prune +
    * re-estimate), ending at `voc{UnigramEm}` — shared by the t31 and
    * t32 oracles so the trained model is literally the same SQL. */
  private def unigramTrainCtes(): String = {
    val P = UnigramP; val S = UnigramSeed; val EM = UnigramEm
    val L = UnigramMaxWordLen
    def bitsOf(x: String) = s"(length(bin(CAST($x AS BIGINT))) - 1)"
    def emRound(k: Int): String = {
      val dall = (1 to L).map(i =>
        s" SELECT w, CAST($i AS BIGINT) AS pos, bp FROM d${k}_$i")
        .mkString("\n UNION ALL\n")
      val bts = (1 to L).map { t =>
        s"""bt${k}_$t AS MATERIALIZED (
           | SELECT b.w, b.cnt, d.bp AS pos,
           |  substr(b.w, CAST(d.bp + 1 AS INT), CAST(b.pos - d.bp AS INT)) AS piece
           | FROM bt${k}_${t - 1} b JOIN dall$k d ON d.w = b.w AND d.pos = b.pos
           | WHERE b.pos > 0)""".stripMargin
      }.mkString(",\n")
      val pieces = (1 to L).map(t => s" SELECT piece, cnt FROM bt${k}_$t")
        .mkString("\n UNION ALL\n")
      s"""${unigramDpCtes(k)},
         |dall$k AS MATERIALIZED (
         |$dall),
         |bt${k}_0 AS MATERIALIZED (SELECT w, cnt, CAST(length(w) AS BIGINT) AS pos,
         |  '' AS piece FROM w0),
         |$bts,
         |cnt$k AS MATERIALIZED (
         | SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
         |$pieces
         | ) GROUP BY 1),
         |keep$k AS MATERIALIZED (
         | SELECT v.piece, coalesce(c.cnt, 0) AS cnt
         | FROM voc$k v LEFT JOIN cnt$k c USING (piece)
         | WHERE length(v.piece) = 1 OR coalesce(c.cnt, 0) > 0),
         |tv${k + 1} AS MATERIALIZED (SELECT sum(cnt) AS t, count(*) AS v FROM keep$k),
         |voc${k + 1} AS MATERIALIZED (
         | SELECT piece, cnt,
         |  ${bitsOf("t + v")} - ${bitsOf("cnt + 1")} AS score
         | FROM keep$k, tv${k + 1})""".stripMargin
    }
    s"""w0 AS MATERIALIZED (
       | SELECT w, count(*) AS cnt FROM (
       |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
       |  FROM documents)
       | WHERE w <> '' AND length(w) <= $L
       | GROUP BY 1),
       |subs AS MATERIALIZED (
       | SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq FROM (
       |  SELECT substr(w, i.i, l.l) AS piece, cnt
       |  FROM w0,
       |   LATERAL unnest(generate_series(1, length(w))) AS i(i),
       |   LATERAL unnest(generate_series(1, $P)) AS l(l)
       |  WHERE i.i + l.l - 1 <= length(w))
       | GROUP BY 1),
       |seed AS MATERIALIZED (
       | SELECT piece, freq FROM subs WHERE length(piece) = 1
       | UNION ALL
       | SELECT piece, freq FROM (
       |  SELECT piece, freq,
       |   row_number() OVER (ORDER BY freq * length(piece) DESC, piece) AS rn
       |  FROM subs WHERE length(piece) > 1) WHERE rn <= $S),
       |tv0 AS MATERIALIZED (SELECT sum(freq) AS t, count(*) AS v FROM seed),
       |voc0 AS MATERIALIZED (
       | SELECT piece, freq AS cnt,
       |  ${bitsOf("t + v")} - ${bitsOf("freq + 1")} AS score
       | FROM seed, tv0),
       |${(0 until EM).map(emRound).mkString(",\n")}""".stripMargin
  }

  /** t30's oracle: d08's component recursion over the d04 pairs, rep =
    * component (or self), then splitShuffle's exact md5 thresholds keyed
    * on the representative. */
  private def leakageFreeSplitOracleSql: String = {
    val t1 = Pipelines.hexThreshold(960)
    val t2 = Pipelines.hexThreshold(980)
    s"""WITH RECURSIVE ${Dedup.ShingleCte},
       |pairs AS (
       | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       | ${Dedup.PairJoin}
       | WHERE ${Dedup.JaccExpr} >= 200),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |reach(node, label) AS (
       | SELECT node, node FROM nodes
       | UNION
       | SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
       |comp AS (
       | SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS component
       | FROM reach GROUP BY 1),
       |r AS (
       | SELECT d.doc_id, coalesce(c.component, d.doc_id) AS rep
       | FROM documents d LEFT JOIN comp c USING (doc_id))
       |SELECT doc_id, rep,
       | CASE WHEN substr(md5('graft:' || rep::VARCHAR), 1, 4) < '$t1' THEN 'train'
       |      WHEN substr(md5('graft:' || rep::VARCHAR), 1, 4) < '$t2' THEN 'val'
       |      ELSE 'test' END AS split
       |FROM r""".stripMargin
  }

  private def sqlList(lang: String): String =
    Pipelines.stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  /** The shared BPE-training CTE block (w0 word counts + three greedy
    * merge rounds m1..m3/w1..w3) used by BOTH the t26 and t29 oracles, so
    * the trained merges cannot silently diverge between them. Round r's
    * argmax pair is a scalar subquery over that round's pair counts;
    * applying it is `replace(w, pair, chr(57344 + r - 1))` — left-to-
    * right non-overlapping in DuckDB exactly like Spark's `replace`,
    * which IS greedy BPE application for a single pair. */
  private def bpePairsCte(src: String): String =
    s"""SELECT substr(w, i, 2) AS pair, sum(cnt)::BIGINT AS cnt FROM (
       |  SELECT w, cnt, unnest(generate_series(1, length(w) - 1)) AS i
       |  FROM $src WHERE length(w) >= 2) GROUP BY 1""".stripMargin

  private def bpeTrainCtes: String = {
    val rounds = (1 to 3).map { r =>
      s"""p$r AS (${bpePairsCte(s"w${r - 1}")}),
         |m$r AS (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
         |w$r AS (SELECT replace(w, (SELECT pair FROM m$r),
         |  chr(${57344 + r - 1})) AS w, cnt FROM w${r - 1})""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (
       | SELECT w, count(*)::BIGINT AS cnt FROM (
       |  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
       |  FROM documents) WHERE w <> '' GROUP BY 1),
       |$rounds""".stripMargin
  }

  private def bpeOracleSql: String =
    s"""WITH $bpeTrainCtes,
       |p4 AS (${bpePairsCte("w3")})
       |SELECT 1 AS round, pair, cnt FROM m1
       |UNION ALL SELECT 2 AS round, pair, cnt FROM m2
       |UNION ALL SELECT 3 AS round, pair, cnt FROM m3
       |UNION ALL SELECT 4 AS round, pair, cnt FROM (
       | SELECT pair, cnt FROM p4 ORDER BY cnt DESC, pair LIMIT 20)""".stripMargin

  /** t29's oracle: re-train the same three merges (shared CTEs), then
    * re-encode every document with the same ordered replace chain and
    * count words/chars/tokens per document. */
  private def bpeEncodeOracleSql: String =
    s"""WITH $bpeTrainCtes,
       |dw AS (
       | SELECT doc_id,
       |  unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
       | FROM documents),
       |enc AS (
       | SELECT doc_id, length(w) AS wlen,
       |  length(replace(replace(replace(w,
       |    (SELECT pair FROM m1), chr(57344)),
       |    (SELECT pair FROM m2), chr(57345)),
       |    (SELECT pair FROM m3), chr(57346))) AS tlen
       | FROM dw WHERE w <> '')
       |SELECT doc_id, count(*)::BIGINT AS n_words,
       | sum(wlen)::BIGINT AS n_chars, sum(tlen)::BIGINT AS n_tokens
       |FROM enc GROUP BY 1""".stripMargin

  /** t27's oracle: same md5, same hex thresholds (rendered from the very
    * hexThreshold the operator uses), same window — engine-exact. */
  private def splitShuffleOracleSql: String = {
    val t1 = Pipelines.hexThreshold(960)
    val t2 = Pipelines.hexThreshold(980)
    s"""WITH s AS (
       | SELECT doc_id, md5('graft:' || doc_id::VARCHAR) AS m FROM documents),
       |a AS (
       | SELECT doc_id, m,
       |  CASE WHEN substr(m, 1, 4) < '$t1' THEN 'train'
       |       WHEN substr(m, 1, 4) < '$t2' THEN 'val'
       |       ELSE 'test' END AS split,
       |  CAST(CAST(CONCAT('0x', substr(m, 5, 15)) AS BIGINT) % 8 AS INTEGER)
       |    AS shard
       | FROM s)
       |SELECT doc_id, split, shard,
       | row_number() OVER (PARTITION BY split, shard ORDER BY m, doc_id) - 1
       |   AS pos
       |FROM a""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "t26_bpe_merges" -> bpeOracleSql,
    "t29_bpe_encode" -> bpeEncodeOracleSql,
    "t30_leakage_free_split" -> leakageFreeSplitOracleSql,
    "t31_unigram_vocab" -> unigramOracleSql,
    "t32_unigram_encode" -> unigramEncodeOracleSql,
    "t27_split_shuffle" -> splitShuffleOracleSql,
    // identical integer-bits trigram surprisal: array-side n-gram streams,
    // model counts from the even-id training half, trigrams pruned below
    // count 2, stupid backoff at +2 bits per level down to the add-one
    // unigram floor, floor-log2 via binary length — no libm ln anywhere
    "t28_trigram_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |ttoks AS (SELECT a FROM toks WHERE doc_id % 2 = 0),
        |tri AS (
        |  SELECT doc_id, a[i] AS w1, a[i+1] AS w2, a[i+2] AS t
        |  FROM toks, LATERAL unnest(generate_series(1, len(a) - 2)) AS g(i)
        |  WHERE len(a) >= 3),
        |c3 AS (
        |  SELECT a[i] AS w1, a[i+1] AS w2, a[i+2] AS t, count(*) AS c
        |  FROM ttoks, LATERAL unnest(generate_series(1, len(a) - 2)) AS g(i)
        |  WHERE len(a) >= 3 GROUP BY 1, 2, 3 HAVING count(*) >= 2),
        |bi AS (
        |  SELECT a[i] AS b1, a[i+1] AS b2, count(*) AS c
        |  FROM ttoks, LATERAL unnest(generate_series(1, len(a) - 1)) AS g(i)
        |  WHERE len(a) >= 2 GROUP BY 1, 2),
        |uni AS (SELECT w, count(*) AS c
        |        FROM (SELECT unnest(a) AS w FROM ttoks) GROUP BY 1),
        |tot AS (SELECT sum(c) AS n, count(*) AS v FROM uni),
        |typ AS (SELECT DISTINCT w1, w2, t FROM tri),
        |tb AS (
        |  SELECT typ.w1, typ.w2, typ.t,
        |    CASE WHEN c3.c IS NOT NULL THEN
        |        (length(bin(CAST(b12.c AS BIGINT))) - 1)
        |          - (length(bin(CAST(c3.c AS BIGINT))) - 1)
        |      WHEN b2t.c IS NOT NULL THEN
        |        2 + (length(bin(CAST(u2.c AS BIGINT))) - 1)
        |          - (length(bin(CAST(b2t.c AS BIGINT))) - 1)
        |      ELSE
        |        4 + (length(bin(CAST(tot.n + tot.v AS BIGINT))) - 1)
        |          - (length(bin(CAST(coalesce(ut.c, 0) + 1 AS BIGINT))) - 1)
        |    END AS tb
        |  FROM typ
        |  LEFT JOIN c3 ON c3.w1 = typ.w1 AND c3.w2 = typ.w2 AND c3.t = typ.t
        |  LEFT JOIN bi b12 ON b12.b1 = typ.w1 AND b12.b2 = typ.w2
        |  LEFT JOIN bi b2t ON b2t.b1 = typ.w2 AND b2t.b2 = typ.t
        |  LEFT JOIN uni u2 ON u2.w = typ.w2
        |  LEFT JOIN uni ut ON ut.w = typ.t
        |  CROSS JOIN tot),
        |sb AS (
        |  SELECT tri.doc_id, tb.tb FROM tri
        |  JOIN tb ON tb.w1 = tri.w1 AND tb.w2 = tri.w2 AND tb.t = tri.t)
        |SELECT doc_id, count(*) AS n_trigrams,
        |  CAST(round(1000.0 * sum(tb) / count(*)) AS BIGINT) AS surprisal3_milli
        |FROM sb GROUP BY doc_id""".stripMargin,
    // t21: the combining acute is built with chr(769) (encoding-proof
    // through the JSON round trip); the pipeline is the documented
    // NFC -> strip accents -> lower -> collapse -> trim contract.
    "t21_unicode_normalize" ->
      """WITH n AS (
        | SELECT doc_id,
        |  trim(regexp_replace(lower(strip_accents(nfc_normalize(
        |    'Cafe' || chr(769) || '  NAÏVE — Façade  ' || text))),
        |    '\s+', ' ', 'g')) AS norm
        | FROM documents)
        |SELECT doc_id, norm, CAST(length(norm) AS BIGINT) AS n_chars_norm
        |FROM n""".stripMargin,
    // page build replayed, then every Gopher metric in integer fixed
    // point and the conjunctive keep, exactly as the operator computes
    "t23_gopher_quality" ->
      """WITH w AS (
        | SELECT doc_id, string_split(text, ' ') AS ws,
        |  greatest(1, (len(string_split(text, ' ')) + 6) // 7) AS nl
        | FROM documents),
        |base AS (
        | SELECT doc_id,
        |  list_transform(generate_series(0, nl - 1), i ->
        |    array_to_string(ws[i*7+1 : i*7+7], ' ')) AS lines
        | FROM w),
        |aug AS (
        | SELECT doc_id,
        |  (CASE WHEN doc_id % 4 = 0 THEN ['- first bullet item', '* second bullet item'] ELSE [] END)
        |  || lines
        |  || (CASE WHEN doc_id % 6 = 0 THEN ['to be continued...'] ELSE [] END) AS lines
        | FROM base),
        |p AS (SELECT doc_id, array_to_string(lines, chr(10)) AS page FROM aug),
        |m AS (
        | SELECT doc_id,
        |  regexp_split_to_array(trim(page), '\s+') AS words,
        |  string_split(page, chr(10)) AS lns,
        |  len(regexp_extract_all(page, '#|\.\.\.')) AS symbols,
        |  len(list_intersect(list_distinct(string_split(page, ' ')),
        |    ['the','be','to','of','and','that','have','with'])) AS stop_hits
        | FROM p),
        |agg AS (
        | SELECT doc_id,
        |  CAST(len(words) AS BIGINT) AS n_words,
        |  CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT) AS wchars,
        |  CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT) AS alpha_words,
        |  CAST(symbols AS BIGINT) AS symbols,
        |  CAST(len(lns) AS BIGINT) AS n_lines,
        |  CAST(len(list_filter(lns, l -> regexp_matches(l, '^\s*[-*•]'))) AS BIGINT) AS bullet_lines,
        |  CAST(len(list_filter(lns, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS BIGINT) AS ellipsis_lines,
        |  CAST(stop_hits AS BIGINT) AS stop_hits
        | FROM m)
        |SELECT doc_id, n_words,
        | wchars * 100 // greatest(n_words, 1) AS mean_word_len_centi,
        | symbols * 1000 // greatest(n_words, 1) AS symbol_ratio_milli,
        | bullet_lines * 1000 // greatest(n_lines, 1) AS bullet_frac_milli,
        | ellipsis_lines * 1000 // greatest(n_lines, 1) AS ellipsis_frac_milli,
        | alpha_words * 1000 // greatest(n_words, 1) AS alpha_frac_milli,
        | stop_hits,
        | CAST(CASE WHEN n_words BETWEEN 50 AND 100000
        |   AND wchars * 100 // greatest(n_words, 1) BETWEEN 300 AND 1000
        |   AND symbols * 1000 // greatest(n_words, 1) < 100
        |   AND bullet_lines * 1000 // greatest(n_lines, 1) < 900
        |   AND ellipsis_lines * 1000 // greatest(n_lines, 1) < 300
        |   AND alpha_words * 1000 // greatest(n_words, 1) > 800
        |   AND stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM agg""".stripMargin,
    // page build replayed, then the md5 line-key distinct-doc count, the
    // >=5 threshold, and the order-preserving cleaned-text rebuild
    "t22_boilerplate_lines" ->
      """WITH w AS (
        | SELECT doc_id, string_split(text, ' ') AS ws,
        |  greatest(1, (len(string_split(text, ' ')) + 6) // 7) AS nl
        | FROM documents),
        |base AS (
        | SELECT doc_id,
        |  list_transform(generate_series(0, nl - 1), i ->
        |    array_to_string(ws[i*7+1 : i*7+7], ' ')) AS lines
        | FROM w),
        |aug AS (
        | SELECT doc_id,
        |  (CASE WHEN doc_id % 10 = 0 THEN ['ALL RIGHTS RESERVED COPYRIGHT NOTICE.']
        |        WHEN doc_id % 5 = 0 THEN ['all rights reserved copyright notice.']
        |        ELSE [] END)
        |  || lines
        |  || (CASE WHEN doc_id % 7 = 0 THEN ['Subscribe to our newsletter for updates!'] ELSE [] END) AS lines
        | FROM base),
        |l AS (
        | SELECT doc_id, i, lines[i] AS line,
        |  md5(lower(trim(lines[i]))) AS k
        | FROM aug, UNNEST(generate_series(1, len(lines))) AS t(i)),
        |boiler AS (
        | SELECT k FROM l GROUP BY k HAVING count(DISTINCT doc_id) >= 5),
        |tagged AS (
        | SELECT l.doc_id, l.i, l.line, (b.k IS NOT NULL) AS is_boiler
        | FROM l LEFT JOIN boiler b ON l.k = b.k)
        |SELECT doc_id,
        | CAST(count(*) AS BIGINT) AS n_lines,
        | CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        | md5(array_to_string(list(CASE WHEN NOT is_boiler THEN line END ORDER BY i)
        |   FILTER (NOT is_boiler), chr(10))) AS clean_md5
        |FROM tagged
        |GROUP BY doc_id""".stripMargin,
    "t01_langid" ->
      s"""WITH h AS (
         | SELECT doc_id, lang AS actual_lang,
         |  len(list_intersect(list_distinct(string_split(text, ' ')), ${sqlList("en")})) AS h_en,
         |  len(list_intersect(list_distinct(string_split(text, ' ')), ${sqlList("de")})) AS h_de,
         |  len(list_intersect(list_distinct(string_split(text, ' ')), ${sqlList("fr")})) AS h_fr,
         |  len(list_intersect(list_distinct(string_split(text, ' ')), ${sqlList("es")})) AS h_es
         | FROM documents)
         |SELECT doc_id, actual_lang,
         | CASE WHEN h_en + h_de + h_fr + h_es = 0 THEN 'und'
         |      WHEN h_en >= greatest(h_de, h_fr, h_es) THEN 'en'
         |      WHEN h_de >= greatest(h_fr, h_es) THEN 'de'
         |      WHEN h_fr >= h_es THEN 'fr'
         |      ELSE 'es' END AS pred_lang,
         | h_en, h_de, h_fr, h_es
         |FROM h""".stripMargin,
    "t02_quality" ->
      s"""SELECT doc_id, n_chars,
         | len(string_split(text, ' ')) AS n_words,
         | length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct_cnt,
         | length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_cnt,
         | len(list_intersect(list_distinct(string_split(text, ' ')), ${sqlList("en")})) AS stop_hits,
         | CAST(round(1000.0 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text)) AS BIGINT) AS alpha_permille,
         | CASE WHEN len(string_split(text, ' ')) >= 5
         |       AND CAST(round(1000.0 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text)) AS BIGINT) >= 500
         |      THEN 1 ELSE 0 END AS keep
         |FROM documents""".stripMargin,
    "t03_tokens" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_ws_tokens,
        | CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+'))) AS BIGINT) AS total_word_tokens,
        | CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1""".stripMargin,
    "t04_fingerprint" ->
      """WITH n AS (
        | SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        | FROM documents)
        |SELECT doc_id, md5(norm) AS fp_full,
        | md5(array_to_string(string_split(norm, ' ')[1:8], ' ')) AS fp_head
        |FROM n""".stripMargin,
    "t08_curation" ->
      """WITH q AS (
        | SELECT doc_id, lang, text FROM documents
        | WHERE len(string_split(text, ' ')) >= 5
        |  AND CAST(round(1000.0 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text)) AS BIGINT) >= 500),
        | d AS (
        | SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS drn
        |  FROM q) WHERE drn = 1),
        | s AS (
        | SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        | FROM d)
        |SELECT doc_id, lang, rn FROM s WHERE rn <= 5""".stripMargin,
    "t07_sample" ->
      """SELECT doc_id, lang, rn FROM (
        | SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        | FROM documents
        |) WHERE rn <= 10""".stripMargin,
    "t06_repetition" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        | bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1])) AS bigram FROM ws),
        | bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        | bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |        max(c) AS top_bigram_n FROM bc GROUP BY 1),
        | wstats AS (SELECT doc_id, count(*) AS n_words, count(DISTINCT word) AS n_distinct
        |   FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |   GROUP BY 1)
        |SELECT w.doc_id, n_words, n_distinct,
        | CAST(round(1000.0 * n_distinct / n_words) AS BIGINT) AS distinct_permille,
        | n_bigrams, top_bigram_n,
        | CAST(round(1000.0 * top_bigram_n / n_bigrams) AS BIGINT) AS rep_permille
        |FROM wstats w JOIN bs USING (doc_id)""".stripMargin,
    "t16_winnow_fingerprints" ->
      // Byte-identical replay of the one-pass winnowing selection: same
      // 8-gram md5-prefix hashes, same fixed-width (hash || reversed-pos)
      // sortable encoding, same 8-row window min, same valid-start filter.
      """WITH g AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    CAST(CONCAT('0x', substr(md5(substr(text, i + 1, 8)), 1, 15)) AS BIGINT) AS h
        |  FROM documents, UNNEST(range(0, length(text) - 7)) AS t(i)
        |  WHERE length(text) >= 15),
        |e AS (
        |  SELECT doc_id, pos,
        |    lpad(CAST(h AS VARCHAR), 19, '0')
        |      || lpad(CAST(1048575 - pos AS VARCHAR), 7, '0') AS key,
        |    count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM g),
        |s AS (
        |  SELECT doc_id, pos, n,
        |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS sel
        |  FROM e)
        |SELECT DISTINCT doc_id,
        |  1048575 - CAST(substr(sel, 20, 7) AS BIGINT) AS pos,
        |  CAST(substr(sel, 1, 19) AS BIGINT) AS fp
        |FROM s WHERE pos <= n - 8""".stripMargin,
    "t17_quality_classifier" ->
      // Full replay of the hashed-linear scorer: same tokens + bigrams,
      // same 60-bit md5-prefix feature hash mod 1024, same synthesized
      // integer weight table, same integer logit fold and 0-threshold.
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |f AS (
        |  SELECT doc_id, unnest(w) AS f FROM t
        |  UNION ALL
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i + 1])) AS f FROM t),
        |b AS (
        |  SELECT doc_id,
        |    CAST(CONCAT('0x', substr(md5(f), 1, 15)) AS BIGINT) % 1024 AS bucket
        |  FROM f),
        |wt AS (
        |  SELECT bucket,
        |    CAST(CONCAT('0x', substr(md5(CAST(bucket AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 2001 - 1000 AS weight_milli
        |  FROM (SELECT unnest(range(0, 1024)) AS bucket)),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_features,
        |    CAST(sum(wt.weight_milli) AS BIGINT) AS logit_milli
        |  FROM b JOIN wt USING (bucket) GROUP BY 1)
        |SELECT doc_id, n_features, logit_milli, logit_milli >= 0 AS keep
        |FROM agg""".stripMargin,
    "t18_rare_words" ->
      // same two passes: top-256 document-frequency vocabulary with the
      // deterministic (df DESC, word ASC) tiebreak, then per-doc scoring
      """WITH v AS (
        |  SELECT w FROM (
        |    SELECT w, count(*) AS df FROM (
        |      SELECT DISTINCT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS w
        |      FROM documents)
        |    GROUP BY w ORDER BY df DESC, w LIMIT 256)),
        |t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |  CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT) AS rare_permille
        |FROM t LEFT JOIN v ON t.w = v.w
        |GROUP BY doc_id""".stripMargin,
    "t19_lm_surprisal" ->
      // identical integer-bits surprisal: length(bin(x)) - 1 = floor(log2 x)
      // in both engines, add-one smoothing over the corpus unigram LM
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |lm AS (SELECT w, count(*) AS c FROM w GROUP BY w),
        |tot AS (SELECT sum(c) AS n, count(*) AS v FROM lm),
        |sb AS (
        |  SELECT w.doc_id,
        |    (length(bin(CAST(tot.n + tot.v AS BIGINT))) - 1)
        |      - (length(bin(CAST(lm.c + 1 AS BIGINT))) - 1) AS bits
        |  FROM w JOIN lm ON w.w = lm.w CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(round(1000.0 * sum(bits) / count(*)) AS BIGINT) AS surprisal_milli
        |FROM sb GROUP BY doc_id""".stripMargin,
    "t20_temperature_sample" ->
      // identical data-dependent rates: integer counts -> correctly-rounded
      // IEEE sqrt -> integer permille -> the t11 hex-threshold machinery
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |mn AS (SELECT min(n) AS mn FROM n),
        |r AS (SELECT lang,
        |  CAST(round(1000 * sqrt(CAST(mn AS DOUBLE) / n)) AS INT) AS pm
        |  FROM n, mn),
        |thr AS (SELECT lang,
        |  CASE WHEN pm >= 1000 THEN 'zzzz'
        |       ELSE printf('%04x', (pm * 65536) // 1000) END AS th FROM r)
        |SELECT d.doc_id, d.lang,
        |  substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS bucket
        |FROM documents d JOIN thr USING (lang)
        |WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < thr.th""".stripMargin,
    "t09_heavy_hitters" ->
      // The verified-heavy-hitter contract is oracle-expressible exactly:
      // items with true frequency > n/(capacity+1), exact counts, top-5
      // by (count desc, item asc). capacity=64 -> the *65 comparison.
      """WITH words AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
        |tot AS (SELECT lang, count(*) AS n FROM words GROUP BY 1),
        |cnt AS (SELECT lang, word, count(*) AS c FROM words GROUP BY 1, 2)
        |SELECT lang, rnk, item, cnt FROM (
        |  SELECT c.lang,
        |    CAST(row_number() OVER (PARTITION BY c.lang ORDER BY c DESC, word) AS BIGINT) AS rnk,
        |    word AS item, c AS cnt
        |  FROM cnt c JOIN tot t USING (lang)
        |  WHERE c * 65 > n)
        |WHERE rnk <= 5""".stripMargin,
    "t05_term_stats" ->
      """SELECT lang, word, tf, df, rnk FROM (
        | SELECT lang, word, count(*) AS tf, count(DISTINCT doc_id) AS df,
        |  row_number() OVER (PARTITION BY lang ORDER BY count(DISTINCT doc_id) DESC, count(*) DESC, word) AS rnk
        | FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents)
        | GROUP BY lang, word
        |) WHERE rnk <= 10""".stripMargin,
    "t11_mixture_sample" -> {
      val cases = MixtureWeights.toSeq.sortBy(_._1).map { case (g, w) =>
        s"WHEN '$g' THEN '${Pipelines.hexThreshold(w)}'"
      }.mkString(" ")
      s"""SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket
         |FROM documents
         |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
         |  CASE lang $cases ELSE 'zzzz' END""".stripMargin
    },
    // identical synthesized PII, redacted with the same RE2/Java-common
    // regexes ('g' = replace all, matching Spark's regexp_replace)
    "t12_pii_redact" ->
      """WITH pii AS (
        | SELECT doc_id,
        |  text || ' contact u' || doc_id || '@example.com or 10.' ||
        |   (doc_id % 256) || '.0.1 tel +1555' || doc_id AS text
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(text,
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        | CAST(len(regexp_extract_all(text, '\+\d{5,15}')) AS BIGINT) AS n_phones,
        | regexp_replace(regexp_replace(regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |   '\+\d{5,15}', '<PHONE>', 'g') AS redacted
        |FROM pii""".stripMargin,
    // rebuilds the identical synthesized URLs, then replays the
    // canonicalization (fragment/scheme strip, host lowercase + www strip,
    // tracking-param filter with survivor order preserved, trailing-slash
    // trim); the tracking regex is shared with the engine so it cannot drift
    "t13_url_canonicalize" ->
      s"""WITH raw AS (
         | SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0
         |   THEN 'https://WWW.News-Site.com/articles/item-' || (doc_id // 2) ||
         |        '/?utm_source=rss&utm_medium=feed&page=' || ((doc_id // 2) % 3) || '#top'
         |   ELSE 'http://news-site.com/articles/item-' || (doc_id // 2) ||
         |        '?page=' || ((doc_id // 2) % 3) || '&gclid=g' || doc_id
         |  END AS url
         | FROM documents),
         |nos AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(url, '#.*', ''), '^https?://', '') AS u FROM raw),
         |hp AS (SELECT doc_id, u, regexp_extract(u, '^[^/?]+') AS raw_host FROM nos),
         |rp AS (SELECT doc_id, regexp_replace(lower(raw_host), '^www\\.', '') AS host,
         |        substr(u, length(raw_host) + 1) AS rest FROM hp),
         |pq AS (SELECT doc_id, host, regexp_extract(rest, '^[^?]*') AS path,
         |        substr(rest, length(regexp_extract(rest, '^[^?]*')) + 2) AS query FROM rp),
         |cn AS (SELECT doc_id, host,
         |        regexp_replace(path, '/$$', '') AS cpath,
         |        list_filter(string_split(query, '&'),
         |          x -> x <> '' AND NOT regexp_matches(x, '${Pipelines.TrackingParamRegex}')) AS params
         |       FROM pq)
         |SELECT host || cpath ||
         |  CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END AS canonical_url,
         | host, count(*) AS n_copies, min(doc_id) AS canonical_id
         |FROM cn GROUP BY 1, 2""".stripMargin,
    // rebuilds the identical synthesized pages (7-word lines, 2-of-3
    // terminal periods, the per-doc-id drop-marker injections) and replays
    // the C4 line + page filters
    "t15_c4_filters" ->
      """WITH w AS (
        | SELECT doc_id, string_split(text, ' ') AS ws,
        |  greatest(1, (len(string_split(text, ' ')) + 6) // 7) AS nl
        | FROM documents),
        |base AS (
        | SELECT doc_id,
        |  list_transform(generate_series(0, nl - 1), i ->
        |    array_to_string(ws[i*7+1 : i*7+7], ' ') ||
        |    CASE WHEN (doc_id + i) % 3 = 0 THEN '' ELSE '.' END) AS lines
        | FROM w),
        |aug AS (
        | SELECT doc_id,
        |  (CASE WHEN doc_id % 13 = 0 THEN ['lorem ipsum dolor sit amet consectetur adipiscing.'] ELSE [] END)
        |  || lines
        |  || (CASE WHEN doc_id % 17 = 0 THEN ['function() { return 1; }.'] ELSE [] END)
        |  || (CASE WHEN doc_id % 11 = 0 THEN ['enable javascript to view this page properly.'] ELSE [] END) AS lines
        | FROM base),
        |f AS (
        | SELECT doc_id, lines,
        |  array_to_string(lines, chr(10)) AS page_text,
        |  list_filter(lines, l ->
        |    regexp_matches(l, '[.!?"]\s*$')
        |    AND len(regexp_split_to_array(trim(l), '\s+')) >= 5
        |    AND NOT contains(lower(l), 'javascript')) AS kept
        | FROM aug),
        |p AS (
        | SELECT doc_id, lines, kept,
        |  CASE WHEN contains(page_text, '{') OR contains(lower(page_text), 'lorem ipsum')
        |        OR len(kept) < 3 THEN 0 ELSE 1 END AS pk
        | FROM f)
        |SELECT doc_id,
        | CAST(len(lines) AS BIGINT) AS n_lines,
        | CAST(len(kept) AS BIGINT) AS n_kept,
        | CAST(pk AS BIGINT) AS page_keep,
        | md5(CASE WHEN pk = 1 THEN array_to_string(kept, chr(10)) ELSE '' END) AS clean_md5
        |FROM p""".stripMargin,
    // windows of 64 tokens advancing by 48: max(1, ceil((n-16)/48)) chunks,
    // list_slice clamps the tail exactly like Spark's slice
    "t14_chunk_docs" ->
      """WITH d AS (
        | SELECT doc_id, string_split(text, ' ') AS w,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        | FROM documents),
        |nc AS (SELECT doc_id, w, greatest(1, (n - 16 + 47) // 48) AS n_chunks FROM d),
        |c AS (SELECT doc_id, w,
        |  unnest(generate_series(0, n_chunks - 1)) AS chunk_idx FROM nc)
        |SELECT doc_id, chunk_idx, chunk_idx * 48 AS chunk_start,
        | CAST(len(w[chunk_idx*48+1 : chunk_idx*48+64]) AS BIGINT) AS chunk_tokens,
        | md5(array_to_string(w[chunk_idx*48+1 : chunk_idx*48+64], ' ')) AS chunk_md5
        |FROM c""".stripMargin,
    // greedy next-fit recurrence, one step per doc in (lang, doc_id) order
    "t10_sequence_packing" ->
      """WITH RECURSIVE d AS (
        | SELECT lang, doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tokens,
        |  row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        | FROM documents),
        |p AS (
        | SELECT lang, doc_id, tokens, rn,
        |  CAST(0 AS BIGINT) AS pack_id, tokens AS fill, CAST(0 AS BIGINT) AS pack_pos
        | FROM d WHERE rn = 1
        | UNION ALL
        | SELECT d.lang, d.doc_id, d.tokens, d.rn,
        |  CASE WHEN p.fill + d.tokens > 1000 THEN p.pack_id + 1 ELSE p.pack_id END,
        |  CASE WHEN p.fill + d.tokens > 1000 THEN d.tokens ELSE p.fill + d.tokens END,
        |  CASE WHEN p.fill + d.tokens > 1000 THEN CAST(0 AS BIGINT) ELSE p.pack_pos + 1 END
        | FROM d JOIN p ON d.lang = p.lang AND d.rn = p.rn + 1)
        |SELECT lang, doc_id, tokens, pack_id, pack_pos FROM p""".stripMargin,
    // full DSIR replay: unigram+bigram features into 512 md5-prefix
    // buckets, add-one-smoothed target (lang='en') vs raw models with
    // bit-length log2 quantization, per-doc integer score fold, and the
    // hash < 2^(60 + score - max) resampling coin
    "t24_dsir_resample" ->
      """WITH f AS (
        | SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS f
        | FROM documents
        | UNION ALL
        | SELECT doc_id, lang, unnest(list_transform(
        |   generate_series(1, len(string_split(lower(text), ' ')) - 1),
        |   i -> string_split(lower(text), ' ')[i] || ' ' ||
        |        string_split(lower(text), ' ')[i+1])) AS f
        | FROM documents),
        |bk AS (
        | SELECT doc_id, lang,
        |  CAST(CONCAT('0x', substr(md5(f), 1, 15)) AS BIGINT) % 512 AS bucket
        | FROM f),
        |rc AS (SELECT bucket, count(*) AS rc FROM bk GROUP BY 1),
        |tc AS (SELECT bucket, count(*) AS tc FROM bk WHERE lang = 'en' GROUP BY 1),
        |tot AS (SELECT (SELECT sum(rc) FROM rc) AS rn, (SELECT sum(tc) FROM tc) AS tn),
        |w AS (
        | SELECT rc.bucket,
        |  ((length(bin(CAST(coalesce(tc.tc, 0) + 1 AS BIGINT))) - 1
        |     - (length(bin(CAST(tot.tn + 512 AS BIGINT))) - 1))
        |   - (length(bin(CAST(rc.rc + 1 AS BIGINT))) - 1
        |     - (length(bin(CAST(tot.rn + 512 AS BIGINT))) - 1))) AS w
        | FROM rc LEFT JOIN tc ON rc.bucket = tc.bucket CROSS JOIN tot),
        |sc AS (
        | SELECT bk.doc_id, CAST(sum(w.w) AS BIGINT) AS score_bits
        | FROM bk JOIN w ON bk.bucket = w.bucket GROUP BY 1),
        |mx AS (SELECT max(score_bits) AS t FROM sc)
        |SELECT sc.doc_id, sc.score_bits,
        |  (CAST(CONCAT('0x', substr(md5(CAST(sc.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |    < (CAST(1 AS BIGINT) << CAST(60 + greatest(sc.score_bits - mx.t, -60) AS INT)))
        |  AS kept
        |FROM sc CROSS JOIN mx""".stripMargin,
    // the d13 span replay (same windows, hash, islands) + the per-doc
    // integer coverage fold; docs without spans score 0
    "t25_memorization_exposure" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    CAST(CONCAT('0x', substr(md5(substr(text, i + 1, 40)), 1, 15)) AS BIGINT) AS h
        |  FROM documents, UNNEST(range(0, length(text) - 39)) AS t(i)),
        |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
        |hits AS (SELECT doc_id, pos FROM g JOIN dup USING (h)),
        |pr AS (SELECT doc_id, pos,
        |         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |       FROM hits),
        |isl AS (SELECT doc_id, pos,
        |          sum(CASE WHEN prev IS NULL OR pos > prev + 40 THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |        FROM pr),
        |spans AS (SELECT doc_id,
        |            CAST(max(pos) + 40 - min(pos) AS BIGINT) AS span_len
        |          FROM isl GROUP BY doc_id, island),
        |agg AS (SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS dup_chars
        |        FROM spans GROUP BY 1)
        |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars_t,
        |  COALESCE(a.dup_chars, 0) AS dup_chars,
        |  COALESCE(a.dup_chars, 0) * 1000 // greatest(CAST(length(d.text) AS BIGINT), 1)
        |    AS dup_permille
        |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id""".stripMargin,
  )
}
