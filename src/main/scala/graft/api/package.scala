package graft

import org.apache.spark.sql.{Column, DataFrame}

/**
 * The user-facing library surface: column-parameterized DataFrame transforms
 * for the training-data-pipeline operators, exposed as extension syntax.
 *
 * {{{
 *   import graft.api._
 *
 *   docs.exactDedup($"text", $"doc_id")
 *   docs.minHashDedupPairs($"doc_id", $"text", threshold = 0.8)
 *   corpus.cosineTopK(queries, $"vec_id", $"embedding", k = 10)
 *   docs.langId($"text")
 * }}}
 *
 * Everything is a pure plan transform (no driver materialization), so the
 * operators compose with arbitrary Spark code and scale with the cluster.
 */
package object api {

  implicit class TextPipelineOps(private val df: DataFrame) {

    /** Language-ID columns (`pred_lang` + per-language stopword hit counts). */
    def langId(text: Column): DataFrame = Pipelines.langId(df, text)

    /** Quality-signal columns for filtering (word/punct/alpha/stopword stats). */
    def textQuality(text: Column): DataFrame = Pipelines.textQuality(df, text)

    /** Token/char counts per row (whitespace + regex word tokens). */
    def tokenCounts(text: Column): DataFrame = Pipelines.tokenCounts(df, text)

    /** Content fingerprints over normalized text (`fp_full`, `fp_head`). */
    def fingerprint(text: Column): DataFrame = Pipelines.fingerprint(df, text)

    /** Repetition quality signals (top-bigram share, distinct-word ratio). */
    def repetitionStats(id: Column, text: Column): DataFrame =
      Pipelines.repetitionStats(df, id, text)

    /** Deterministic k-per-group sample ranked by content hash. */
    def stratifiedSample(group: Column, id: Column, k: Int): DataFrame =
      Pipelines.stratifiedSample(df, group, id, k)

    /** Exact duplicate groups keyed by content digest. */
    def exactDedup(key: Column, id: Column): DataFrame = Pipelines.exactDedup(df, key, id)

    /** Keep one (lowest-id) row per duplicate-key group, all columns. */
    def applyExactDedup(key: Column, id: Column): DataFrame =
      Pipelines.applyExactDedup(df, key, id)

    /** Corpus-level C4-style chunk dedup; see [[Pipelines.chunkDedup]]. */
    def chunkDedup(id: Column, text: Column, chunkWords: Int = 5): DataFrame =
      Pipelines.chunkDedup(df, id, text, chunkWords)

    /** Bounded-state per-group heavy hitters; see [[Pipelines.heavyHitters]]. */
    def heavyHitters(groups: Seq[Column], item: Column, k: Int,
        capacity: Int = 256): DataFrame =
      Pipelines.heavyHitters(df, groups, item, k, capacity)

    /** Deterministic two-pass heavy hitters (exact counts, provable
      * threshold); see [[Pipelines.verifiedHeavyHitters]]. */
    def verifiedHeavyHitters(groups: Seq[String], item: Column, k: Int,
        capacity: Int = 256): DataFrame =
      Pipelines.verifiedHeavyHitters(df, groups, item, k, capacity)

    /** Any-offset exact substring dedup spans (Lee et al. 2022); see
      * [[Pipelines.substringDedupSpans]]. */
    def substringDedupSpans(id: Column, text: Column, L: Int = 40): DataFrame =
      Pipelines.substringDedupSpans(df, id, text, L)

    /** Winnowing (MOSS) document fingerprints; see
      * [[Pipelines.winnowFingerprints]]. */
    def winnowFingerprints(id: Column, text: Column, k: Int = 8, w: Int = 8): DataFrame =
      Pipelines.winnowFingerprints(df, id, text, k, w)

    /** C4-style page/line cleanup filters (terminal-punct lines, >= 5
      * words, javascript/brace/lorem-ipsum drops); adds
      * n_lines/n_kept/page_keep/cleaned. */
    def c4Filters(text: Column): DataFrame = Pipelines.c4Filters(df, text)

    /** `host` + `canonical_url` columns (scheme/www/tracking-param/fragment
      * noise stripped) — the zero-cost web-corpus URL dedup key. */
    def canonicalizeUrls(url: Column): DataFrame =
      Pipelines.canonicalizeUrls(df, url)

    /** Overlapping token-window chunks (RAG / long-doc prep); one row per
      * (doc, chunk) with md5 chunk identity. */
    def chunkByTokens(id: Column, text: Column, chunkTokens: Int,
        overlap: Int = 0): DataFrame =
      Pipelines.chunkByTokens(df, id, text, chunkTokens, overlap)

    /** Cluster duplicate pairs into components (label = min member id). */
    def connectedComponents(a: Column, b: Column): DataFrame =
      Pipelines.connectedComponents(df, a, b)

    /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification. */
    def minHashDedupPairs(id: Column, text: Column, numPerm: Int = 32,
        bands: Int = 8, threshold: Double = 0.5): DataFrame =
      Pipelines.minHashDedupPairs(df, id, text, numPerm, bands, threshold)

    /** SimHash near-duplicate pairs (hamming <= maxHamming). */
    def simHashDedupPairs(id: Column, text: Column, maxHamming: Int = 6): DataFrame =
      Pipelines.simHashDedupPairs(df, id, text, maxHamming)

    /** Exact Levenshtein near-dup pairs within blocks (char-level verify). */
    def editDistancePairs(id: Column, text: Column, blocks: Seq[Column],
        maxDist: Int): DataFrame =
      Pipelines.editDistancePairs(df, id, text, blocks, maxDist)

    /** Exact n-gram-Jaccard pairs within blocks (inverted-index join). */
    def ngramJaccardPairs(id: Column, text: Column, blocks: Seq[Column],
        threshold: Double): DataFrame =
      Pipelines.ngramJaccardPairs(df, id, text, blocks, threshold)

    /** Greedy next-fit sequence packing into `budget`-token rows, sharded
      * by `shard`, deterministic in `id` order (the pre-training batching
      * step). */
    def packSequences(shard: Column, id: Column, tokens: Column,
        budget: Long): DataFrame =
      Pipelines.packSequences(df, shard, id, tokens, budget)

    /** Train docs sharing any word n-gram with `evalSet` (contamination
      * report: id + distinct shared-gram count); eval grams broadcast. */
    /** Embedding-space decontamination vs a broadcast eval set;
      * see [[Pipelines.semanticDecontaminationReport]]. */
    def semanticDecontaminationReport(evalSet: DataFrame, id: Column,
        vec: Column, thresholdMicro: Long): DataFrame =
      Pipelines.semanticDecontaminationReport(df, evalSet, id, vec, thresholdMicro)

    /** Fused Unicode normalization column appended as `norm` (NFC,
      * accent fold, ROOT lowercase, whitespace collapse/trim — the
      * curation front door); see [[graft.functions.NormalizeText]]. */
    def normalizeText(text: Column): DataFrame =
      df.withColumn("norm", graft.functions.NormalizeText(text))

    def decontaminationReport(evalSet: DataFrame, id: Column, text: Column,
        n: Int = 5): DataFrame =
      Pipelines.decontaminationReport(df, evalSet, id, text, n)

    /** 1-bit sign-quantized top-k (Hamming prefilter + exact rerank);
      * see [[Pipelines.signBitTopK]]. */
    def signBitTopK(queries: DataFrame, id: Column, vec: Column,
        k: Int, candidates: Int): DataFrame =
      Pipelines.signBitTopK(df, queries, id, vec, k, candidates)

    /** Rare-word scoring vs the corpus's broadcast top-K vocabulary;
      * see [[Pipelines.rareWordScore]]. */
    def rareWordScore(id: Column, text: Column, topK: Int = 65536): DataFrame =
      Pipelines.rareWordScore(df, id, text, topK)

    /** Hashed-feature linear quality classifier (fastText-style): integer
      * logit per doc from a broadcast (bucket, weight_milli) model; see
      * [[Pipelines.linearQualityScore]]. */
    def qualityClassifierScore(id: Column, text: Column, weights: DataFrame,
        buckets: Int): DataFrame =
      Pipelines.linearQualityScore(df, id, text, weights, buckets)

    /** Content-defined chunking dedup (rolling-hash boundaries); see
      * [[Pipelines.cdcChunkDedup]]. */
    def cdcChunkDedup(id: Column, text: Column, w: Int = 16,
        divisor: Int = 64): DataFrame =
      Pipelines.cdcChunkDedup(df, id, text, w, divisor)

    /** Rows whose `key` occurs in `reference` (Bloom prefilter + exact
      * verify — exact answer, corpus never shuffles). */
    def membershipReport(key: Column, id: Column, reference: DataFrame,
        refKey: Column, expectedItems: Long = 1000000L,
        fpp: Double = 0.03): DataFrame =
      Pipelines.membershipReport(df, id, key, reference, refKey, expectedItems, fpp)

    /** Deterministic per-group hash-threshold subsampling (domain/language
      * mixture reweighting); weights in permille, absent groups keep
      * `defaultPermille`. */
    /** Okapi BM25 lexical top-k (sparse retrieval, s11);
      * see [[Pipelines.bm25TopK]]. */
    def bm25TopK(queries: DataFrame, id: Column, text: Column, k: Int,
        k1: Double = 1.2, b: Double = 0.75): DataFrame =
      Pipelines.bm25TopK(df, queries, id, text, k, k1, b)

    /** Temperature-flattened source mixture (sqrt scaling, t20);
      * see [[Pipelines.temperatureSample]]. */
    def temperatureSample(group: Column, id: Column,
        maxGroups: Int = 100000): DataFrame =
      Pipelines.temperatureSample(df, group, id, maxGroups)

    /** PII redaction with typed tokens + per-kind counts (t12);
      * see [[Pipelines.redactPii]]. */
    def redactPii(text: Column): DataFrame = Pipelines.redactPii(df, text)

    /** Hamming near-dup pairs over 64-bit codes (SimHash / perceptual
      * hashes); see [[Pipelines.hammingNearDupPairs]]. */
    def hammingNearDupPairs(id: Column, bits: Column, maxHamming: Int,
        bucketCap: Int = 65536): DataFrame =
      Pipelines.hammingNearDupPairs(df, id, bits, maxHamming, bucketCap)

    /** Persist this corpus as a list-partitioned IVF index table;
      * see [[Pipelines.buildIvfIndex]]. */
    def buildIvfIndex(id: Column, vec: Column, dim: Int, indexPath: String,
        nCentroids: Int = 16,
        centroids: Option[Array[Array[Double]]] = None): Long =
      Pipelines.buildIvfIndex(df, id, vec, dim, indexPath, nCentroids, centroids)

    /** Assign these vectors against a persisted index's frozen centroids
      * and append; see [[Pipelines.appendToIvfIndex]]. */
    def appendToIvfIndex(id: Column, vec: Column, indexPath: String,
        txnId: Option[String] = None): Long =
      Pipelines.appendToIvfIndex(df, id, vec, indexPath, txnId)

    /** Search a persisted IVF index with these rows as queries;
      * see [[Pipelines.ivfIndexTopK]]. */
    def ivfIndexTopK(id: Column, vec: Column, indexPath: String,
        k: Int, nProbe: Int): DataFrame =
      Pipelines.ivfIndexTopK(df, id, vec, indexPath, k, nProbe)

    def mixtureSample(group: Column, id: Column, weightsPermille: Map[String, Int],
        defaultPermille: Int = 1000): DataFrame =
      Pipelines.mixtureSample(df, group, id, weightsPermille, defaultPermille)
  }

  implicit class VectorPipelineOps(private val df: DataFrame) {

    /** Cosine near-duplicate pairs — DEFAULTS to the blockless LSH
      * candidate + exact VecDot verify path, the sub-quadratic form that
      * survives 100 TB. Exhaustive all-pairs is the explicit opt-in
      * [[cosineNearDupPairsExact]]. */
    def cosineNearDupPairs(id: Column, vec: Column, threshold: Double,
        dim: Int, nPlanes: Int = 24, bands: Int = 8,
        bucketCap: Int = 1024): DataFrame =
      Pipelines.cosineNearDupPairs(df, id, vec, threshold, dim, nPlanes, bands, bucketCap)

    /** Same as the default (kept as the explicit name for the scale path). */
    def cosineNearDupPairsAnn(id: Column, vec: Column, threshold: Double,
        dim: Int, nPlanes: Int = 24, bands: Int = 8,
        bucketCap: Int = 1024): DataFrame =
      Pipelines.cosineNearDupPairsAnn(df, id, vec, threshold, dim, nPlanes, bands, bucketCap)

    /** Exhaustive all-pairs within a blocking column: exact recall,
      * O(n²/blocks) — oracled gate form; opt-in, does not survive 100 TB. */
    def cosineNearDupPairsExact(id: Column, vec: Column, block: Column,
        threshold: Double): DataFrame =
      Pipelines.cosineNearDupPairsExact(df, id, vec, block, threshold)

    /** Exact cosine top-k neighbors of `queries` against this corpus. */
    def cosineTopK(queries: DataFrame, id: Column, vec: Column, k: Int): DataFrame =
      Pipelines.cosineTopK(df, queries, id, vec, k)

    /** Approximate top-k via random-hyperplane LSH banding. */
    def annTopK(queries: DataFrame, id: Column, vec: Column, k: Int,
        dim: Int, nPlanes: Int = 32, bands: Int = 8,
        bucketCap: Int = 1024): DataFrame =
      Pipelines.annTopK(df, queries, id, vec, k, dim, nPlanes, bands, bucketCap)

    /** Int8 max-abs quantization: (vec_id, scale_micro, q, qsum, qnorm2) —
      * 4x smaller embedding storage with bounded dequantization error. */
    def quantizeEmbeddings(id: Column, vec: Column): DataFrame =
      Pipelines.quantizeEmbeddings(df, id, vec)

    /** Deterministic two-tier top-k: int8-code integer-dot shortlist of
      * `candidates` per query, exact float rerank of the shortlist only. */
    def quantizedTopK(queries: DataFrame, id: Column, vec: Column, k: Int,
        candidates: Int): DataFrame =
      Pipelines.quantizedTopK(df, queries, id, vec, k, candidates)

    /** k-NN graph over the whole corpus (capped LSH bucket self-join +
      * exact-cosine bounded-heap top-k per node). */
    def knnGraph(id: Column, vec: Column, k: Int, dim: Int,
        nPlanes: Int = 24, bands: Int = 8, bucketCap: Int = 1024): DataFrame =
      Pipelines.knnGraph(df, id, vec, k, dim, nPlanes, bands, bucketCap)

    /** Approximate top-k via IVF inverted lists (probe nearest centroids). */
    def ivfTopK(queries: DataFrame, id: Column, vec: Column, k: Int,
        dim: Int, nCentroids: Int = 16, nProbe: Int = 4): DataFrame =
      Pipelines.ivfTopK(df, queries, id, vec, k, dim, nCentroids, nProbe)

    /** Product-quantization top-k (ADC shortlist + exact rerank); pass
      * [[Pipelines.trainPqCodebooks]] output for trained codebooks. */
    def pqTopK(queries: DataFrame, id: Column, vec: Column, k: Int,
        dim: Int, m: Int = 8, ks: Int = 16, candidates: Int = 20,
        codebooks: Option[Array[Array[Array[Double]]]] = None): DataFrame =
      Pipelines.pqTopK(df, queries, id, vec, k, dim, m, ks, candidates, codebooks)

    /** Unigram-LM surprisal scoring (integer bits-per-token, CCNet
      * perplexity-filter shape); see [[Pipelines.lmSurprisalScore]]. */
    def lmSurprisalScore(id: Column, text: Column): DataFrame =
      Pipelines.lmSurprisalScore(df, id, text)

    /** SemDeDup-style cluster-scoped semantic dedup (survivors + cluster);
      * see [[Pipelines.semDedupClusters]]. */
    def semDedupClusters(id: Column, vec: Column, dim: Int,
        nCentroids: Int = 16, threshold: Double = 0.9): DataFrame =
      Pipelines.semDedupClusters(df, id, vec, dim, nCentroids, threshold)

    /** MMR-diversified retrieval over the exact-cosine shortlist (s08);
      * see [[Pipelines.mmrTopK]]. */
    def mmrTopK(queries: DataFrame, id: Column, vec: Column, k: Int,
        candidates: Int): DataFrame =
      Pipelines.mmrTopK(df, queries, id, vec, k, candidates)

    /** Label-filtered ANN top-k (attribute-constrained search, s13);
      * see [[Pipelines.filteredAnnTopK]]. */
    def filteredAnnTopK(queries: DataFrame, id: Column, vec: Column,
        label: Column, k: Int, dim: Int, nPlanes: Int = 32,
        bands: Int = 8): DataFrame =
      Pipelines.filteredAnnTopK(df, queries, id, vec, label, k, dim,
        nPlanes, bands)
  }
}
