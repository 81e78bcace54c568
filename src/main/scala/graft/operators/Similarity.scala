package graft.operators

import graft.api.Pipelines
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity-search gate queries over `embeddings` — thin wrappers over the
 * library surface (`graft.api.Pipelines`). All six are DuckDB-oracle-exact:
 * the approximate ones (s02 LSH, s03 IVF) render their seeded,
 * data-independent constants (hyperplanes / centroids) into the oracle SQL
 * as literals so DuckDB replays the same candidate generation; recall
 * properties are additionally asserted in OperatorSpec.
 */
object Similarity {

  private def embs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  def s01TopKBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    Pipelines.cosineTopK(e, e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), k = 5)
  }

  def s02AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    Pipelines.annTopK(e, e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), k = 3, dim = 64, nPlanes = 32, bands = 8)
  }

  def s03IvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    Pipelines.ivfTopK(e, e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), k = 3, dim = 64, nCentroids = 16, nProbe = 8)
  }

  /** The SQL surface of the native expressions: `vec_dot` live-registered
    * into the gate session (`GraftExtensions.register`, same builders as the
    * `spark.sql.extensions` config path) and invoked from plain SQL — every
    * vector dotted against vector 0, broadcast one-row cross join. The
    * micro-rounded results must match DuckDB's list_dot_product bit-for-bit,
    * which pins the expression's sequential-fold contract through the SQL
    * registration path too. */
  def s04SqlVecDot(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(spark)
    embs(spark, dir).createOrReplaceTempView("graft_s04_emb")
    spark.sql(
      """SELECT e.vec_id, e.label,
        | CAST(round(1000000 * vec_dot(e.embedding, q.embedding)) AS BIGINT) AS dot_micro
        |FROM graft_s04_emb e
        |CROSS JOIN (SELECT embedding FROM graft_s04_emb WHERE vec_id = 0) q""".stripMargin)
  }

  /** Int8 max-abs quantization checksums: integer qsum/qnorm2 per vector
    * make the gate exact — any drift in scale math, rounding rule, or a
    * single code flips them. The dequantization error bound is property-
    * tested in OperatorSpec. */
  def s05QuantizedEmbeddings(spark: SparkSession, dir: String): DataFrame =
    Pipelines.quantizeEmbeddings(embs(spark, dir), col("vec_id"), col("embedding"))
      .select("vec_id", "scale_micro", "qsum", "qnorm2")

  /** Quantized-prefilter + exact rerank: the int8 codes choose a
    * deterministic 20-candidate shortlist per query (pure integer dots),
    * the float arithmetic re-scores only that shortlist — the two-tier
    * compressed-scan serving shape, oracle-exact end to end. */
  def s06QuantizedRerank(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    Pipelines.quantizedTopK(e, e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), k = 5, candidates = 20)
  }

  /** s07: k-NN graph over the whole embedding corpus (LSH candidates,
    * exact-cosine top-3 per node) — same hyperplane family as s02, so the
    * oracle is the s02 replay without the query restriction. */
  def s07KnnGraph(spark: SparkSession, dir: String): DataFrame =
    Pipelines.knnGraph(embs(spark, dir),
      col("vec_id"), col("embedding"), k = 3, dim = 64, nPlanes = 32, bands = 8)

  /** s08: MMR-diversified retrieval — exact-cosine shortlist (20) per
    * query, then the greedy 0.5*rel - 0.5*maxSim re-rank to top-10. The
    * greedy trajectory is IEEE-deterministic, so the oracle replays it
    * with a recursive CTE (pick-by-pick, same tiebreaks). */
  def s08MmrTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    Pipelines.mmrTopK(e, e.filter(col("vec_id") < 5),
      col("vec_id"), col("embedding"), k = 10, candidates = 20)
  }

  /** s09: 1-bit sign quantization + Hamming prefilter (the extreme rung
    * of the s04-s06 quantization ladder: one BIGINT per vector, 32x
    * compression) — bit_count(XOR) shortlist through the bounded heap,
    * exact cosine rerank of the shortlist only. Both stages replay in
    * SQL: DuckDB computes the identical sign bits, xor, bit_count. */
  def s09SignBitTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    Pipelines.signBitTopK(e, e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), k = 5, candidates = 20)
  }

  /** s10: product quantization (PQ) + asymmetric-distance shortlist — the
    * rung between int8 (s05/s06) and sign bits (s09): m=8 subspaces x
    * ks=16 centroids compress dim-64 float32 to 8 codes; candidates are
    * ranked by ADC table lookups and only the 20-deep shortlist pays the
    * exact cosine. Codebooks are seeded doubles rendered into the oracle
    * as literals (the s02/s03 replay technique). */
  def s10PqTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    Pipelines.pqTopK(e, e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), k = 5, dim = 64, m = 8, ks = 16,
      candidates = 20)
  }

  /** s11: Okapi BM25 lexical retrieval over `documents` ("more-like-this":
    * each query doc's term set scores the corpus). Per-term contributions
    * micro-round to integers BEFORE summing, so the score — and therefore
    * the ranking — is aggregation-order-independent and replays exactly in
    * SQL. */
  def s11Bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    Pipelines.bm25TopK(d, d.filter(col("doc_id") < 5),
      col("doc_id"), col("text"), k = 10)
  }

  /** s12: hybrid retrieval — reciprocal-rank fusion of the dense cosine
    * ranking (s01 family, over `embeddings`) and the sparse BM25 ranking
    * (s11, over `documents`), joined on the shared id space. Integer RRF
    * contributions (nano-reciprocals via floor-div) make the fusion exact. */
  def s12HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val dense = Pipelines.cosineTopK(e, e.filter(col("vec_id") < 5),
      col("vec_id"), col("embedding"), k = 20)
    val sparse = Pipelines.bm25TopK(d, d.filter(col("doc_id") < 5),
      col("doc_id"), col("text"), k = 20)
    Pipelines.rrfFuse(Seq(dense, sparse), k = 10)
  }

  /** s13: label-filtered ANN — each query searches only vectors carrying
    * its own label (the label joins the band-bucket key, so the filter
    * SHRINKS candidate generation instead of post-filtering a global
    * search). In-gate: every neighbor shares its query's label. */
  def s13FilteredAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    val res = Pipelines.filteredAnnTopK(e, e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), col("label"),
      k = 3, dim = 64, nPlanes = 32, bands = 8)
    val labels = e.select(col("vec_id"), col("label"))
    val crossed = res
      .join(labels.select(col("vec_id").as("q_id"), col("label").as("ql")), Seq("q_id"))
      .join(labels.select(col("vec_id").as("n_id"), col("label").as("nl")), Seq("n_id"))
      .filter(col("ql") =!= col("nl")).count()
    require(crossed == 0, s"filtered search leaked $crossed cross-label results")
    res
  }

  /** s14: PERSISTED IVF index — [[Pipelines.buildIvfIndex]] materializes
    * the inverted lists as a list-partitioned gwdelta table (centroids in
    * the table configuration, self-describing), and search reads ONLY the
    * probed lists through per-member IN-list partition pruning (pinned
    * in-gate: an `isin` over two lists plans strictly fewer files than
    * the table holds). Same centroids, assignment and tiebreaks as s03's
    * in-memory path, so the same SQL oracle replays the persisted path. */
  def s14IvfIndex(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("s14")
      .resolve("ivf").toString
    Pipelines.buildIvfIndex(e, col("vec_id"), col("embedding"),
      dim = 64, indexPath = tmp)
    val t = graft.GwTable.forPath(spark, tmp)
    val total = t.snapshot().files.size
    def planned(lists: Int*): Int =
      spark.read.format("gwdelta").load(tmp)
        .filter(col("list").isin(lists.map(Int.box): _*))
        .queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan).asInstanceOf[
                org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
              .fileIndex.inputFiles.length
        }.head
    require(planned(0, 15) < total,
      s"IN-list partition pruning must plan only the probed lists' files " +
        s"(planned ${planned(0, 15)} of $total)")
    Pipelines.ivfIndexTopK(e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), tmp, k = 3, nProbe = 8)
  }

  /** s15: INCREMENTAL index maintenance — build the index without every
    * tenth vector, then [[Pipelines.appendToIvfIndex]] the rest: new
    * vectors assign against the FROZEN stored centroids and land as one
    * transactional append (pinned: exactly 2 commits — no rebuild), and
    * search immediately sees them. Contents now equal the one-shot build,
    * so the oracle is the same replay over the full corpus. */
  def s15IvfAppend(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("s15")
      .resolve("ivf").toString
    Pipelines.buildIvfIndex(e.filter(col("vec_id") % 10 =!= 0),
      col("vec_id"), col("embedding"), dim = 64, indexPath = tmp)
    Pipelines.appendToIvfIndex(e.filter(col("vec_id") % 10 === 0),
      col("vec_id"), col("embedding"), tmp)
    val t = graft.GwTable.forPath(spark, tmp)
    require(t.snapshot().version == 1L,
      s"append must be incremental (one extra commit), at v${t.snapshot().version}")
    val res = Pipelines.ivfIndexTopK(
      e.filter(col("vec_id") >= 10 && col("vec_id") < 20),
      col("vec_id"), col("embedding"), tmp, k = 3, nProbe = 8)
    res
  }

  /** s16: index MAINTENANCE — streaming/incremental ingest fragments the
    * inverted lists (every append lands >= one file per touched list), and
    * OPTIMIZE heals them: compaction groups by partition tuple, so each
    * list's small files fold WITHIN the list (pinned: fewer files after,
    * every rewritten file still carries its `list` partition value) and
    * probe-time partition pruning survives untouched. Search answers the
    * same oracle as s14 — maintenance must be invisible to results. */
  def s16IvfOptimize(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("s16")
      .resolve("ivf").toString
    Pipelines.buildIvfIndex(e.filter(col("vec_id") % 4 === 0),
      col("vec_id"), col("embedding"), dim = 64, indexPath = tmp)
    (1 until 4).foreach { m =>
      Pipelines.appendToIvfIndex(e.filter(col("vec_id") % 4 === m),
        col("vec_id"), col("embedding"), tmp)
    }
    val t = graft.GwTable.forPath(spark, tmp)
    val before = t.snapshot().files.size
    require(t.compact(targetFileBytes = 1L << 30) > 0,
      "fragmented lists must have something to compact")
    val snap = t.snapshot()
    require(snap.files.size < before,
      s"OPTIMIZE must fold list fragments: $before -> ${snap.files.size}")
    require(snap.files.forall(_.partitionValues.contains("list")),
      "rewritten files must keep their list partition value (pruning survives)")
    Pipelines.ivfIndexTopK(e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), tmp, k = 3, nProbe = 8)
  }

  /** s17: REINDEX — build (16 seeded centroids) + append fragments the
    * index, then [[Pipelines.rebuildIvfIndex]] retrains/reassigns and
    * lands contents + centroids as ONE transactional overwrite (pinned:
    * exactly one commit past the append; stored centroids swapped to the
    * new 8-family atomically; every rewritten file keeps its `list`
    * partition value so probe pruning survives). The gate rebuilds onto a
    * PINNED centroid family (`hyperplanes(8, 64)`) so the oracle replays
    * the same assignment with 8-centroid literals; the RETRAINING path
    * (data-dependent, not SQL-renderable) is pinned by the
    * recall-under-drift property test in OperatorSpec. */
  def s17IvfRebuild(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("s17")
      .resolve("ivf").toString
    Pipelines.buildIvfIndex(e.filter(col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), dim = 64, indexPath = tmp)
    Pipelines.appendToIvfIndex(e.filter(col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"), tmp)
    Pipelines.rebuildIvfIndex(spark, tmp, nCentroids = 8,
      centroids = Some(Pipelines.hyperplanes(8, 64)))
    val t = graft.GwTable.forPath(spark, tmp)
    val snap = t.snapshot()
    require(snap.version == 2L,
      s"rebuild must be ONE transactional overwrite commit, at v${snap.version}")
    require(Pipelines.storedCentroids(spark, tmp).length == 8,
      "rebuilt centroids must be restated atomically with the content swap")
    require(snap.files.forall(_.partitionValues.contains("list")),
      "reassigned files must keep their list partition value (pruning survives)")
    // time travel still serves the PRE-rebuild index whole (old centroids
    // with old lists — never a mix)
    require(spark.read.format("gwdelta").option("versionAsOf", "1")
      .load(tmp).count() == e.count(), "pre-rebuild contents must time-travel")
    Pipelines.ivfIndexTopK(e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), tmp, k = 3, nProbe = 4)
  }

  /** s18: persisted IVF+PQ index (IVFADC) — the s14 inverted-file table
    * with per-vector PQ codes: search probes its lists (partition pruning,
    * pinned), ranks candidates by ADC over the CODES-ONLY scan (column
    * pruning pinned: the ADC projection's parquet scan must not read
    * `n_emb`), and pays floats only for the shortlist rerank. Seeded
    * centroids + codebooks ride the table config, so the oracle replays
    * probe, assignment, codes, LUTs, ADC ranking, and rerank from
    * literals (the s03 x s10 composition). */
  def s18IvfPqIndex(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("s18")
      .resolve("ivfpq").toString
    Pipelines.buildIvfPqIndex(e, col("vec_id"), col("embedding"),
      dim = 64, indexPath = tmp)
    val t = graft.GwTable.forPath(spark, tmp)
    val total = t.snapshot().files.size
    val adcShape = spark.read.format("gwdelta").load(tmp)
      .filter(col("list").isin(0, 15)).select("n_id", "n_codes")
    val scan = adcShape.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan).asInstanceOf[
          org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
    }.head
    require(scan.fileIndex.inputFiles.length < total,
      s"probed-list partition pruning must plan fewer files " +
        s"(planned ${scan.fileIndex.inputFiles.length} of $total)")
    require(!scan.readDataSchema.fieldNames.contains("n_emb"),
      "the ADC stage must scan codes only — column pruning lost n_emb " +
        s"exclusion: ${scan.readDataSchema.fieldNames.mkString(",")}")
    Pipelines.ivfPqIndexTopK(e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), tmp, k = 5, nProbe = 8, candidates = 20)
  }

  /** s22: REINDEX for the IVF+PQ index — s17's maintenance step where
    * BOTH frozen families refresh: [[Pipelines.rebuildIvfPqIndex]]
    * retrains coarse centroids AND PQ codebooks over the index's current
    * contents, reassigns lists, recomputes every code, and lands
    * contents + both config properties as ONE transactional overwrite
    * (pinned: exactly one commit past the append; stored centroids AND
    * codebooks swap atomically; rewritten files keep `list` partition
    * values; the pre-rebuild index time-travels whole — never new codes
    * under old codebooks). The gate rebuilds onto PINNED families
    * (8 hyperplane centroids + the negated default codebook grid) so the
    * oracle replays the post-rebuild IVFADC pipeline from the NEW
    * literals; the retraining path is covered by trainPqCodebooks'
    * distortion-monotonicity property test. */
  def s22IvfPqRebuild(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("s22")
      .resolve("ivfpq").toString
    Pipelines.buildIvfPqIndex(e.filter(col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), dim = 64, indexPath = tmp)
    Pipelines.appendToIvfPqIndex(e.filter(col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"), tmp)
    val newCents = Pipelines.hyperplanes(8, 64)
    val newBooks = s22RebuildBooks
    Pipelines.rebuildIvfPqIndex(spark, tmp, nCentroids = 8,
      centroids = Some(newCents), codebooks = Some(newBooks))
    val t = graft.GwTable.forPath(spark, tmp)
    val snap = t.snapshot()
    require(snap.version == 2L,
      s"rebuild must be ONE transactional overwrite commit, at v${snap.version}")
    require(Pipelines.storedCentroids(spark, tmp).length == 8,
      "rebuilt centroids must be restated atomically with the content swap")
    require(Pipelines.storedCodebooks(spark, tmp).head.head.head ==
      newBooks.head.head.head,
      "rebuilt codebooks must be restated atomically with the content swap")
    require(snap.files.forall(_.partitionValues.contains("list")),
      "reassigned files must keep their list partition value (pruning survives)")
    require(spark.read.format("gwdelta").option("versionAsOf", "1")
      .load(tmp).count() == e.count(),
      "pre-rebuild contents must time-travel whole")
    Pipelines.ivfPqIndexTopK(e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), tmp, k = 3, nProbe = 4, candidates = 8)
  }

  /** The pinned post-rebuild codebook family: the default deterministic
    * grid, negated — a genuinely different quantizer (scores flip around
    * the |c|^2/2 penalty, so assignments differ) that both the gate and
    * its oracle can render as literals. */
  private def s22RebuildBooks: Array[Array[Array[Double]]] =
    Pipelines.pqCodebooks(64, 8, 16).map(_.map(_.map(x => -x)))

  /** s19: recall@5 of the banded-LSH ANN against exact brute-force ground
    * truth — the eval harness run before trusting any approximate index.
    * Both sides replay in SQL (s01's brute force, s02's plane-literal LSH
    * at k=5), so the metric itself — hits and floor-milli recall per
    * query — is oracle-exact, not just sanity-bounded. */
  def s19AnnRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    val queries = e.filter(col("vec_id") < 10)
    val truth = Pipelines.cosineTopK(e, queries,
      col("vec_id"), col("embedding"), k = 5)
    val approx = Pipelines.annTopK(e, queries,
      col("vec_id"), col("embedding"), k = 5, dim = 64, nPlanes = 32, bands = 8)
    Pipelines.recallAtK(approx, truth)
  }

  /** s20: IVF RANGE search (radius query) — all corpus neighbors of each
    * query within a cosine threshold, probing the s03 lists. Top-k clips
    * dense neighborhoods; the radius form is threshold-complete within
    * the probed lists, which is what dedup/contamination sweeps want. The
    * threshold compares ROUNDED micro-similarity, so the set boundary is
    * integer-exact and the oracle replays it verbatim. */
  def s20IvfRangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    Pipelines.ivfRangeSearch(e, e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), minSimMicro = 250000L,
      dim = 64, nCentroids = 16, nProbe = 8)
  }

  /** s21: radius search ON the persisted index — s20's threshold-complete
    * semantics through the s14 on-disk access path (stored centroids,
    * probed-lists partition pruning, pinned in-gate). Index contents =
    * the full corpus under the same seeded centroid family, so s20's
    * oracle replays this path verbatim. */
  def s21IvfIndexRangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("s21")
      .resolve("ivf").toString
    Pipelines.buildIvfIndex(e, col("vec_id"), col("embedding"),
      dim = 64, indexPath = tmp)
    val t = graft.GwTable.forPath(spark, tmp)
    val total = t.snapshot().files.size
    val planned = spark.read.format("gwdelta").load(tmp)
      .filter(col("list").isin(0, 15))
      .queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          org.apache.spark.sql.graftbridge.GwScanPeel.peel(b.scan).asInstanceOf[
              org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.head
    require(planned < total,
      s"the radius sweep must partition-prune to the probed lists' files " +
        s"(planned $planned of $total)")
    Pipelines.ivfIndexRangeSearch(e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), tmp,
      minSimMicro = 250000L, nProbe = 8)
  }

  /** s23: index DELETE — the unlearning/right-to-be-forgotten face of the
    * persisted index: vectors leave through the engine's merge-on-read
    * row-level delete, so NO index file is rewritten (the delete lands as
    * deletion-vector sidecars re-asserted onto the same files — pinned:
    * identical data-file path set, at least one DV) and the next search
    * simply never surfaces them. Oracle: the same centroid-literal IVF
    * replay over the corpus MINUS the deleted ids. */
  def s23IvfDelete(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("s23")
      .resolve("ivf").toString
    Pipelines.buildIvfIndex(e, col("vec_id"), col("embedding"),
      dim = 64, indexPath = tmp)
    val t = graft.GwTable.forPath(spark, tmp)
    val paths0 = t.snapshot().files.map(_.path).toSet
    require(t.delete(col("n_id") % 10 === 0, mergeOnRead = true) > 0,
      "the unlearning delete must commit")
    val snap = t.snapshot()
    require(snap.files.map(_.path).toSet == paths0,
      "a merge-on-read index delete must not rewrite index files")
    require(snap.files.exists(_.dv.isDefined),
      "the delete must land as deletion vectors")
    val res = Pipelines.ivfIndexTopK(e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), tmp, k = 3, nProbe = 8)
    require(res.filter(col("n_id") % 10 === 0).count() == 0,
      "no deleted vector may surface as a neighbor")
    res
  }

  /** s24: metadata-FILTERED search over the persisted index — the index
    * carries PAYLOAD columns ([[Pipelines.buildIvfIndex]]'s `payload`),
    * and the filter composes INTO the probed-list scan (footer-stats
    * pushdown on the payload column), so a selective filter shrinks the
    * candidate read instead of post-filtering scored results — s13's
    * semantics through the on-disk access path. In-gate: every neighbor
    * carries the filter label. */
  def s24FilteredIndexSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = embs(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("s24")
      .resolve("ivf").toString
    Pipelines.buildIvfIndex(e, col("vec_id"), col("embedding"),
      dim = 64, indexPath = tmp,
      payload = Seq(col("label").cast("string").as("label")))
    val res = Pipelines.ivfIndexTopK(e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), tmp, k = 3, nProbe = 8,
      filter = Some(col("label") === "3"))
    val labels = e.select(col("vec_id").as("n_id"),
      col("label").cast("string").as("lb"))
    require(res.join(labels, Seq("n_id")).filter(col("lb") =!= "3").count() == 0,
      "filtered index search must only surface the filter label")
    res
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_topk_bruteforce" -> s01TopKBruteForce _,
    "s02_ann_lsh" -> s02AnnLsh _,
    "s03_ivf_topk" -> s03IvfTopK _,
    "s04_sql_vecdot" -> s04SqlVecDot _,
    "s05_quantized_embeddings" -> s05QuantizedEmbeddings _,
    "s06_quantized_rerank" -> s06QuantizedRerank _,
    "s07_knn_graph" -> s07KnnGraph _,
    "s08_mmr_topk" -> s08MmrTopK _,
    "s09_signbit_topk" -> s09SignBitTopK _,
    "s10_pq_topk" -> s10PqTopK _,
    "s11_bm25_topk" -> s11Bm25TopK _,
    "s12_hybrid_rrf" -> s12HybridRrf _,
    "s13_filtered_ann" -> s13FilteredAnn _,
    "s14_ivf_index" -> s14IvfIndex _,
    "s15_ivf_append" -> s15IvfAppend _,
    "s16_ivf_optimize" -> s16IvfOptimize _,
    "s17_ivf_rebuild" -> s17IvfRebuild _,
    "s18_ivfpq_index" -> s18IvfPqIndex _,
    "s19_ann_recall" -> s19AnnRecall _,
    "s20_ivf_range_search" -> s20IvfRangeSearch _,
    "s21_index_range_search" -> s21IvfIndexRangeSearch _,
    "s22_ivfpq_rebuild" -> s22IvfPqRebuild _,
    "s23_ivf_delete" -> s23IvfDelete _,
    "s24_filtered_index_search" -> s24FilteredIndexSearch _,
  )

  /** s13's oracle: the s02 LSH replay with the label equality joined into
    * the candidate stage — same hyperplane literals, same bands, same
    * exact-cosine top-3, restricted to same-label candidates. */
  private def s13OracleSql: String = {
    val planes = Pipelines.hyperplanes(32, 64)
    def planeLit(p: Array[Double]): String = p.mkString("[", ",", "]")
    val bits = (0 until 32)
      .map(i => s"CASE WHEN list_dot_product(emb, ${planeLit(planes(i))}) > 0" +
        " THEN 1 ELSE 0 END")
      .mkString("[\n ", ",\n ", "\n]")
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
       |sig AS (SELECT vec_id, label, $bits AS bits FROM e),
       |bands AS (
       | SELECT vec_id, label, band,
       |  bits[band*4+1] + 2*bits[band*4+2] + 4*bits[band*4+3] + 8*bits[band*4+4] AS bucket
       | FROM sig, (SELECT unnest(generate_series(0, 7)) AS band)),
       |cand AS (
       | SELECT DISTINCT q.vec_id AS q_id, n.vec_id AS n_id
       | FROM bands q JOIN bands n
       |   ON q.band = n.band AND q.bucket = n.bucket AND q.label = n.label
       | WHERE q.vec_id < 10 AND q.vec_id <> n.vec_id),
       |scored AS (
       | SELECT c.q_id, c.n_id, list_cosine_similarity(eq.emb, en.emb) AS cos
       | FROM cand c JOIN e eq ON eq.vec_id = c.q_id JOIN e en ON en.vec_id = c.n_id)
       |SELECT q_id, n_id, rnk, CAST(round(1000000 * cos) AS BIGINT) AS cos_micro
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk FROM scored)
       |WHERE rnk <= 3""".stripMargin
  }

  /** Shared BM25 replay (s11 and the sparse half of s12): identical
    * tokenization (single-space split, empties dropped), tf/dl/df/avgdl
    * derivations, the same fixed IEEE expression tree per term — micro-
    * rounded per term, integer-summed — and (score DESC, n_id) ranking. */
  private def bm25OracleCte(k: Int): String =
    s"""tok AS (
       | SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (
       | SELECT doc_id AS n_id, term, count(*) AS tf FROM tok
       | WHERE len(term) > 0 GROUP BY 1, 2),
       |dl AS (SELECT n_id, sum(tf) AS dl FROM tf GROUP BY 1),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (
       | SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
       |qt AS (
       | SELECT DISTINCT doc_id AS q_id, term FROM tok
       | WHERE doc_id < 5 AND len(term) > 0),
       |bm_scored AS (
       | SELECT q.q_id, t.n_id,
       |  CAST(sum(CAST(round(1000000.0
       |    * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
       |    * (t.tf * (1.2 + 1.0)
       |       / (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * l.dl / s.avgdl)))) AS BIGINT)
       |  ) AS BIGINT) AS score_micro
       | FROM qt q
       | JOIN tf t USING (term)
       | JOIN dfreq d USING (term)
       | JOIN dl l ON l.n_id = t.n_id
       | CROSS JOIN stats s
       | WHERE t.n_id <> q.q_id
       | GROUP BY 1, 2),
       |bm_ranked AS (
       | SELECT q_id, n_id, rnk, score_micro FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY q_id ORDER BY score_micro DESC, n_id) AS rnk
       |  FROM bm_scored) WHERE rnk <= $k)""".stripMargin

  /** s02's oracle REPLAYS the LSH: the hyperplanes are deterministic
    * (fixed seed, data-independent), so their doubles are rendered
    * straight into the SQL as literals — DuckDB recomputes the same sign
    * bits, band buckets, candidate set, and exact-cosine top-k. Shortest
    * round-trip `Double.toString` parses back to the identical double, so
    * both engines threshold the same dot products. */
  private def s02OracleSql: String = lshTopKOracle("q.vec_id < 10 AND ")

  /** Shared LSH-replay oracle for s02 (restricted query side) and the s07
    * k-NN graph (every vector is a query): hyperplanes rendered as double
    * literals, DuckDB recomputes sign bits, band buckets, candidates, and
    * the exact-cosine top-3. */
  private def lshTopKOracle(queryFilter: String, k: Int = 3): String = {
    val planes = Pipelines.hyperplanes(32, 64)
    def planeLit(p: Array[Double]): String = p.mkString("[", ",", "]")
    val bits = (0 until 32)
      .map(i => s"CASE WHEN list_dot_product(emb, ${planeLit(planes(i))}) > 0" +
        " THEN 1 ELSE 0 END")
      .mkString("[\n ", ",\n ", "\n]")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |sig AS (SELECT vec_id, $bits AS bits FROM e),
       |bands AS (
       | SELECT vec_id, band,
       |  bits[band*4+1] + 2*bits[band*4+2] + 4*bits[band*4+3] + 8*bits[band*4+4] AS bucket
       | FROM sig, (SELECT unnest(generate_series(0, 7)) AS band)),
       |cand AS (
       | SELECT DISTINCT q.vec_id AS q_id, n.vec_id AS n_id
       | FROM bands q JOIN bands n ON q.band = n.band AND q.bucket = n.bucket
       | WHERE ${queryFilter}q.vec_id <> n.vec_id),
       |scored AS (
       | SELECT c.q_id, c.n_id, list_cosine_similarity(eq.emb, en.emb) AS cos
       | FROM cand c JOIN e eq ON eq.vec_id = c.q_id JOIN e en ON en.vec_id = c.n_id)
       |SELECT q_id, n_id, rnk, CAST(round(1000000 * cos) AS BIGINT) AS cos_micro
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk FROM scored)
       |WHERE rnk <= $k""".stripMargin
  }

  /** s19's oracle composes the s01 brute-force replay (ground truth) with
    * the s02 plane-literal LSH replay at k=5 (the approximate side), then
    * computes the identical integer metric: per-query hits via the
    * (q_id, n_id) left join, recall_milli by floor division. */
  private def s19OracleSql: String = {
    val brute =
      """SELECT q_id, n_id FROM (
        | SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |  row_number() OVER (
        |    PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |             c.vec_id) AS rnk
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 10
        |) WHERE rnk <= 5""".stripMargin
    s"""SELECT q_id, truth_k, hits, recall_milli FROM (
       | SELECT t.q_id,
       |  CAST(count(*) AS BIGINT) AS truth_k,
       |  CAST(sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |  CAST(sum(CASE WHEN a.n_id IS NOT NULL THEN 1 ELSE 0 END) * 1000
       |    // count(*) AS BIGINT) AS recall_milli
       | FROM ($brute) t
       | LEFT JOIN (${lshTopKOracle("q.vec_id < 10 AND ", k = 5)}) a
       |   ON a.q_id = t.q_id AND a.n_id = t.n_id
       | GROUP BY t.q_id)""".stripMargin
  }

  /** s03's oracle replays the IVF the way s02 replays its LSH: the 16
    * seeded centroids are data-independent doubles rendered straight into
    * the SQL as literals, and DuckDB recomputes every vector's centroid
    * scores, the corpus argmax assignment (first index on score ties —
    * `list_position` = Spark's `array_position`), each query's top-8
    * probed lists (score DESC, index DESC on ties — `sort_array`'s
    * descending struct order), and the exact-cosine top-3 within the
    * probed lists. Valid because both engines compute the identical
    * double dot products (the s04 gate pins vec_dot == list_dot_product),
    * so every comparison falls the same way. */
  private def s03OracleSql: String = ivfOracleSql("vec_id < 10")

  /** s14's oracle IS s03's: the persisted index stores the same seeded
    * centroids and the same assignment, so the replay is identical. s15
    * replays over the full corpus too (build + append contents equal the
    * one-shot build) with its own query window. */
  private def s14OracleSql: String = ivfOracleSql("vec_id < 10")
  private def s15OracleSql: String =
    ivfOracleSql("vec_id >= 10 AND vec_id < 20")

  /** Shared IVF candidate-generation CTEs (seeded centroids rendered as
    * literals): yields `scored(q_id, n_id, cos)` for the final SELECT the
    * top-k (s03/s14/s15) and range (s20) oracles each append. */
  private def ivfScoredCte(queryPred: String, nCentroids: Int,
      nProbe: Int, corpusPred: String = "TRUE"): String = {
    val cents = Pipelines.hyperplanes(nCentroids, 64)
    def centLit(p: Array[Double]): String = p.mkString("[", ",", "]")
    val scores = (0 until nCentroids)
      .map(c => s"list_dot_product(emb, ${centLit(cents(c))})")
      .mkString("[\n ", ",\n ", "\n]")
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
       |sc AS (SELECT vec_id, label, emb, $scores AS s FROM e),
       |corpus AS (SELECT vec_id, list_position(s, list_max(s)) - 1 AS cl FROM sc
       |          WHERE $corpusPred),
       |probe AS (
       | SELECT q.vec_id AS q_id, c.cl
       | FROM (SELECT vec_id, s FROM sc WHERE $queryPred) q
       | CROSS JOIN (SELECT unnest(generate_series(0, ${nCentroids - 1})) AS cl) c
       | QUALIFY row_number() OVER (
       |   PARTITION BY q.vec_id ORDER BY q.s[c.cl+1] DESC, c.cl DESC) <= $nProbe),
       |cand AS (
       | SELECT p.q_id, n.vec_id AS n_id
       | FROM probe p JOIN corpus n ON n.cl = p.cl
       | WHERE n.vec_id <> p.q_id),
       |scored AS (
       | SELECT c.q_id, c.n_id, list_cosine_similarity(eq.emb, en.emb) AS cos
       | FROM cand c JOIN e eq ON eq.vec_id = c.q_id JOIN e en ON en.vec_id = c.n_id)""".stripMargin
  }

  private[graft] def ivfOracleSql(queryPred: String, nCentroids: Int = 16,
      nProbe: Int = 8, corpusPred: String = "TRUE"): String =
    s"""${ivfScoredCte(queryPred, nCentroids, nProbe, corpusPred)}
       |SELECT q_id, n_id, rnk, CAST(round(1000000 * cos) AS BIGINT) AS cos_micro
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk FROM scored)
       |WHERE rnk <= 3""".stripMargin

  /** s20: the same candidate generation, finished by the integer-micro
    * threshold instead of a rank cut. */
  private def s20OracleSql: String =
    s"""${ivfScoredCte("vec_id < 10", 16, 8)}
       |SELECT q_id, n_id, CAST(round(1000000 * cos) AS BIGINT) AS cos_micro
       |FROM scored
       |WHERE CAST(round(1000000 * cos) AS BIGINT) >= 250000""".stripMargin

  /** s10's oracle replays the PQ end to end with the seeded codebooks as
    * literals: per-subspace argmin codes (first index on ties, the shared
    * list_position/array_position contract), per-query ADC lookup tables,
    * the left-to-right ADC sum (IEEE order matches the Spark reduce), the
    * (adc DESC, n_id) 20-deep shortlist, and the exact-cosine top-5. */
  private def s10OracleSql: String = {
    val books = Pipelines.pqCodebooks(64, 8, 16)
    val m = 8
    val sub = 8
    def litArr(p: Array[Double]): String = p.mkString("[", ",", "]")
    def sliceExpr(mi: Int): String = s"emb[${mi * sub + 1}:${(mi + 1) * sub}]"
    def scoreArr(mi: Int): String =
      books(mi).indices.map { c =>
        val c2h = books(mi)(c).map(x => x * x).sum / 2.0
        s"list_dot_product(${sliceExpr(mi)}, ${litArr(books(mi)(c))}) - ($c2h)"
      }.mkString("[\n  ", ",\n  ", "\n ]")
    def lutArr(mi: Int): String =
      books(mi).indices
        .map(c => s"list_dot_product(${sliceExpr(mi)}, ${litArr(books(mi)(c))})")
        .mkString("[\n  ", ",\n  ", "\n ]")
    val scoreCols = (0 until m).map(mi => s"${scoreArr(mi)} AS s$mi").mkString(",\n ")
    val codeCols = (0 until m)
      .map(mi => s"list_position(s$mi, list_max(s$mi)) - 1 AS c$mi").mkString(",\n ")
    val lutCols = (0 until m).map(mi => s"${lutArr(mi)} AS l$mi").mkString(",\n ")
    val adc = (0 until m).map(mi => s"q.l$mi[n.c$mi + 1]").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |nc AS (
       | SELECT vec_id,
       | $codeCols
       | FROM (SELECT vec_id,
       | $scoreCols
       | FROM e)),
       |q AS (
       | SELECT vec_id,
       | $lutCols
       | FROM e WHERE vec_id < 10),
       |pre AS (
       | SELECT q.vec_id AS q_id, n.vec_id AS n_id,
       |  row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |    ($adc) DESC, n.vec_id) AS prernk
       | FROM q JOIN nc n ON q.vec_id <> n.vec_id),
       |short AS (SELECT q_id, n_id FROM pre WHERE prernk <= 20)
       |SELECT q_id, n_id, rnk, CAST(round(1000000 * cos) AS BIGINT) AS cos_micro
       |FROM (
       | SELECT s.q_id, s.n_id,
       |  list_cosine_similarity(eq.emb, en.emb) AS cos,
       |  row_number() OVER (PARTITION BY s.q_id
       |    ORDER BY list_cosine_similarity(eq.emb, en.emb) DESC, s.n_id) AS rnk
       | FROM short s
       | JOIN e eq ON eq.vec_id = s.q_id
       | JOIN e en ON en.vec_id = s.n_id
       |) WHERE rnk <= 5""".stripMargin
  }

  /** s18's oracle composes the s03 IVF replay (centroid literals: corpus
    * assignment + top-8 probed lists) with the s10 PQ replay (codebook
    * literals: argmin codes, per-query LUTs, left-to-right ADC sum)
    * RESTRICTED to the probed lists, then the exact-cosine rerank of the
    * 20-deep shortlist — every stage's ties fall identically in both
    * engines (list_position/array_position, adc DESC + n_id, cos DESC +
    * n_id). */
  private def s18OracleSql: String =
    ivfPqOracleSql(Pipelines.hyperplanes(16, 64),
      Pipelines.pqCodebooks(64, 8, 16), "vec_id < 10",
      nProbe = 8, candidates = 20, k = 5)

  /** s22 replays the SAME IVFADC pipeline from the POST-rebuild literals:
    * the 8-centroid family + negated codebooks the rebuild landed, at the
    * gate's nProbe/candidates/k — correct only if the overwrite really
    * swapped contents, centroids, and codebooks together. */
  private def s22OracleSql: String =
    ivfPqOracleSql(Pipelines.hyperplanes(8, 64), s22RebuildBooks,
      "vec_id < 10", nProbe = 4, candidates = 8, k = 3)

  /** Shared IVF+PQ (IVFADC) replay: probe/assignment/codes/LUTs/ADC/
    * rerank from centroid + codebook literals — s18 with the build-time
    * family, s22 with the family the rebuild landed. */
  private[graft] def ivfPqOracleSql(cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]], queryPred: String,
      nProbe: Int, candidates: Int, k: Int): String = {
    val nCent = cents.length
    def centLit(p: Array[Double]): String = p.mkString("[", ",", "]")
    val centScores = (0 until nCent)
      .map(c => s"list_dot_product(emb, ${centLit(cents(c))})")
      .mkString("[\n ", ",\n ", "\n]")
    val m = books.length
    val sub = 64 / m
    def litArr(p: Array[Double]): String = p.mkString("[", ",", "]")
    def sliceExpr(mi: Int): String = s"emb[${mi * sub + 1}:${(mi + 1) * sub}]"
    def scoreArr(mi: Int): String =
      books(mi).indices.map { c =>
        val c2h = books(mi)(c).map(x => x * x).sum / 2.0
        s"list_dot_product(${sliceExpr(mi)}, ${litArr(books(mi)(c))}) - ($c2h)"
      }.mkString("[\n  ", ",\n  ", "\n ]")
    def lutArr(mi: Int): String =
      books(mi).indices
        .map(c => s"list_dot_product(${sliceExpr(mi)}, ${litArr(books(mi)(c))})")
        .mkString("[\n  ", ",\n  ", "\n ]")
    val scoreCols = (0 until m).map(mi => s"${scoreArr(mi)} AS s$mi").mkString(",\n ")
    val codeCols = (0 until m)
      .map(mi => s"list_position(s$mi, list_max(s$mi)) - 1 AS c$mi").mkString(",\n ")
    val lutCols = (0 until m).map(mi => s"${lutArr(mi)} AS l$mi").mkString(",\n ")
    val adc = (0 until m).map(mi => s"ql.l$mi[nc.c$mi + 1]").mkString(" + ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |sc AS (SELECT vec_id, emb, $centScores AS s FROM e),
       |corpus AS (SELECT vec_id, list_position(s, list_max(s)) - 1 AS cl FROM sc),
       |probe AS (
       | SELECT q.vec_id AS q_id, c.cl
       | FROM (SELECT vec_id, s FROM sc WHERE $queryPred) q
       | CROSS JOIN (SELECT unnest(generate_series(0, ${nCent - 1})) AS cl) c
       | QUALIFY row_number() OVER (
       |   PARTITION BY q.vec_id ORDER BY q.s[c.cl+1] DESC, c.cl DESC) <= $nProbe),
       |nc AS (
       | SELECT vec_id,
       | $codeCols
       | FROM (SELECT vec_id,
       | $scoreCols
       | FROM e)),
       |ql AS (
       | SELECT vec_id,
       | $lutCols
       | FROM e WHERE $queryPred),
       |cand AS (
       | SELECT p.q_id, n.vec_id AS n_id
       | FROM probe p JOIN corpus n ON n.cl = p.cl
       | WHERE n.vec_id <> p.q_id),
       |pre AS (
       | SELECT c.q_id, c.n_id,
       |  row_number() OVER (PARTITION BY c.q_id ORDER BY
       |    ($adc) DESC, c.n_id) AS prernk
       | FROM cand c JOIN ql ON ql.vec_id = c.q_id JOIN nc ON nc.vec_id = c.n_id),
       |short AS (SELECT q_id, n_id FROM pre WHERE prernk <= $candidates)
       |SELECT q_id, n_id, rnk, CAST(round(1000000 * cos) AS BIGINT) AS cos_micro
       |FROM (
       | SELECT s.q_id, s.n_id,
       |  list_cosine_similarity(eq.emb, en.emb) AS cos,
       |  row_number() OVER (PARTITION BY s.q_id
       |    ORDER BY list_cosine_similarity(eq.emb, en.emb) DESC, s.n_id) AS rnk
       | FROM short s
       | JOIN e eq ON eq.vec_id = s.q_id
       | JOIN e en ON en.vec_id = s.n_id
       |) WHERE rnk <= $k""".stripMargin
  }

  private def s11OracleSql: String =
    s"""WITH ${bm25OracleCte(10)}
       |SELECT q_id, n_id, rnk, score_micro FROM bm_ranked""".stripMargin

  /** s12: both rankings replayed (s01-pattern exact cosine at k=20, BM25
    * CTE at k=20), fused with integer nano-reciprocals (BIGINT floor-div,
    * exact in both engines), re-ranked (rrf_nano DESC, n_id). */
  private def s12OracleSql: String =
    s"""WITH ${bm25OracleCte(20)},
       |cos_ranked AS (
       | SELECT q_id, n_id, rnk FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |   row_number() OVER (
       |     PARTITION BY q.vec_id
       |     ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
       |              c.vec_id) AS rnk
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 5
       | ) WHERE rnk <= 20),
       |fused AS (
       | SELECT q_id, n_id, CAST(sum(1000000000 // (60 + rnk)) AS BIGINT) AS rrf_nano
       | FROM (SELECT q_id, n_id, rnk FROM cos_ranked
       |       UNION ALL SELECT q_id, n_id, rnk FROM bm_ranked)
       | GROUP BY 1, 2)
       |SELECT q_id, n_id, rnk, rrf_nano FROM (
       | SELECT *, row_number() OVER (
       |   PARTITION BY q_id ORDER BY rrf_nano DESC, n_id) AS rnk
       | FROM fused) WHERE rnk <= 10""".stripMargin

  val oracles: Map[String, String] = Map(
    "s11_bm25_topk" -> s11OracleSql,
    "s12_hybrid_rrf" -> s12OracleSql,
    "s13_filtered_ann" -> s13OracleSql,
    "s02_ann_lsh" -> s02OracleSql,
    "s10_pq_topk" -> s10OracleSql,
    "s03_ivf_topk" -> s03OracleSql,
    "s14_ivf_index" -> s14OracleSql,
    "s15_ivf_append" -> s15OracleSql,
    // s23: the s14 replay over the corpus minus the unlearned ids
    "s23_ivf_delete" ->
      ivfOracleSql("vec_id < 10", corpusPred = "vec_id % 10 <> 0"),
    // s24: the s14 replay over the corpus restricted to the filter label
    "s24_filtered_index_search" ->
      ivfOracleSql("vec_id < 10", corpusPred = "label::VARCHAR = '3'"),
    // s16: contents equal the full corpus after build+appends+OPTIMIZE,
    // so maintenance must answer s14's replay verbatim
    "s16_ivf_optimize" -> ivfOracleSql("vec_id < 10"),
    // s17: after the rebuild the contents are the full corpus REASSIGNED
    // to the pinned 8-centroid family — the replay is the same IVF SQL
    // with 8-centroid literals and the gate's nProbe=4
    "s17_ivf_rebuild" -> ivfOracleSql("vec_id < 10", nCentroids = 8, nProbe = 4),
    "s18_ivfpq_index" -> s18OracleSql,
    "s19_ann_recall" -> s19OracleSql,
    "s20_ivf_range_search" -> s20OracleSql,
    // the persisted index holds the full corpus under the same seeded
    // centroids, so the s20 replay covers the on-disk path verbatim
    "s21_index_range_search" -> s20OracleSql,
    "s22_ivfpq_rebuild" -> s22OracleSql,
    "s07_knn_graph" -> lshTopKOracle(""),
    "s08_mmr_topk" ->
      // Recursive replay of the greedy MMR trajectory: each recursion
      // step picks argmax(0.5*rel - 0.5*max sim-to-picked) with the same
      // empty-max=0.0 convention and vec_id tiebreak; list_cosine_similarity
      // doubles are bit-identical to VecDot/l2norm (s01 contract).
      """WITH RECURSIVE
        |qv AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id < 5),
        |cv AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |rel AS (
        |  SELECT qv.vec_id AS q_id, cv.vec_id AS n_id,
        |    list_cosine_similarity(qv.emb, cv.emb) AS rel,
        |    row_number() OVER (PARTITION BY qv.vec_id
        |      ORDER BY list_cosine_similarity(qv.emb, cv.emb) DESC, cv.vec_id) AS rnk
        |  FROM qv JOIN cv ON qv.vec_id <> cv.vec_id),
        |short AS (SELECT q_id, n_id, rel FROM rel WHERE rnk <= 20),
        |sims AS (
        |  SELECT a.q_id, a.n_id AS a_id, b.n_id AS b_id,
        |    list_cosine_similarity(ca.emb, cb.emb) AS sim
        |  FROM short a JOIN short b ON a.q_id = b.q_id AND a.n_id <> b.n_id
        |  JOIN cv ca ON ca.vec_id = a.n_id JOIN cv cb ON cb.vec_id = b.n_id),
        |sel AS (
        |  SELECT q_id, 0 AS it, CAST([] AS BIGINT[]) AS picked, CAST([] AS DOUBLE[]) AS scores
        |  FROM (SELECT DISTINCT q_id FROM short)
        |  UNION ALL
        |  SELECT s.q_id, s.it + 1, list_append(s.picked, nxt.n_id), list_append(s.scores, nxt.score)
        |  FROM sel s, LATERAL (
        |    SELECT c.n_id,
        |      0.5*c.rel - 0.5*coalesce((SELECT max(m.sim) FROM sims m
        |         WHERE m.q_id = s.q_id AND m.a_id = c.n_id AND list_contains(s.picked, m.b_id)), 0.0) AS score
        |    FROM short c
        |    WHERE c.q_id = s.q_id AND NOT list_contains(s.picked, c.n_id)
        |    ORDER BY score DESC, c.n_id LIMIT 1) nxt
        |  WHERE s.it < 10)
        |SELECT q_id, CAST(u.i AS BIGINT) AS rnk, picked[CAST(u.i AS INT)] AS n_id,
        |  CAST(round(1000000 * scores[CAST(u.i AS INT)]) AS BIGINT) AS mmr_micro
        |FROM (SELECT q_id, picked, scores FROM sel WHERE it = 10) f,
        |  LATERAL (SELECT unnest(range(1, 11)) AS i) u""".stripMargin,
    "s05_quantized_embeddings" ->
      """WITH m AS (
        | SELECT vec_id, embedding,
        |  CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE) AS mx
        | FROM embeddings),
        |qz AS (
        | SELECT vec_id,
        |  CAST(round(mx * 1000000) AS BIGINT) AS scale_micro,
        |  CASE WHEN mx = 0
        |    THEN list_transform(embedding, y -> 0)
        |    ELSE list_transform(embedding, y -> CAST(round(CAST(y AS DOUBLE) * 127.0 / mx) AS INT))
        |  END AS q
        | FROM m)
        |SELECT vec_id, scale_micro,
        | CAST(list_sum(q) AS BIGINT) AS qsum,
        | CAST(list_sum(list_transform(q, v -> CAST(v AS BIGINT) * v)) AS BIGINT) AS qnorm2
        |FROM qz""".stripMargin,
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
    // same quantization CTE as s05, integer prefilter, exact rerank
    "s06_quantized_rerank" ->
      """WITH m AS (
        | SELECT vec_id, embedding,
        |  CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE) AS mx
        | FROM embeddings),
        |qz AS (
        | SELECT vec_id,
        |  CASE WHEN mx = 0
        |    THEN list_transform(embedding, y -> 0)
        |    ELSE list_transform(embedding, y -> CAST(round(CAST(y AS DOUBLE) * 127.0 / mx) AS INT))
        |  END AS q
        | FROM m),
        |pre AS (
        | SELECT qq.vec_id AS q_id, cc.vec_id AS n_id,
        |  row_number() OVER (PARTITION BY qq.vec_id ORDER BY
        |    list_sum(list_transform(generate_series(1, len(qq.q)),
        |      i -> CAST(qq.q[i] AS BIGINT) * cc.q[i])) DESC,
        |    cc.vec_id) AS prernk
        | FROM qz qq JOIN qz cc ON qq.vec_id <> cc.vec_id
        | WHERE qq.vec_id < 10),
        |short AS (SELECT q_id, n_id FROM pre WHERE prernk <= 20)
        |SELECT q_id, n_id, rnk, CAST(round(1000000 * cos) AS BIGINT) AS cos_micro
        |FROM (
        | SELECT s.q_id, s.n_id,
        |  list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos,
        |  row_number() OVER (PARTITION BY s.q_id
        |    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |             s.n_id) AS rnk
        | FROM short s
        | JOIN embeddings q ON q.vec_id = s.q_id
        | JOIN embeddings c ON c.vec_id = s.n_id
        |) WHERE rnk <= 5""".stripMargin,
    "s09_signbit_topk" ->
      // identical sign-bit packing (bit i set iff vec[i] > 0), integer
      // Hamming shortlist, exact-cosine rerank — all engine-shared
      """WITH b AS (
        | SELECT vec_id,
        |  list_sum(list_transform(generate_series(1, least(len(embedding), 63)),
        |    i -> CASE WHEN embedding[i] > 0 THEN 1::BIGINT << (i - 1) ELSE 0::BIGINT END)) AS bits
        | FROM embeddings),
        |pre AS (
        | SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |  row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |    bit_count(xor(q.bits, n.bits)) ASC, n.vec_id) AS prernk
        | FROM b q JOIN b n ON q.vec_id <> n.vec_id
        | WHERE q.vec_id < 10),
        |short AS (SELECT q_id, n_id FROM pre WHERE prernk <= 20)
        |SELECT q_id, n_id, rnk, CAST(round(1000000 * cos) AS BIGINT) AS cos_micro
        |FROM (
        | SELECT s.q_id, s.n_id,
        |  list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos,
        |  row_number() OVER (PARTITION BY s.q_id
        |    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
        |             s.n_id) AS rnk
        | FROM short s
        | JOIN embeddings q ON q.vec_id = s.q_id
        | JOIN embeddings c ON c.vec_id = s.n_id
        |) WHERE rnk <= 5""".stripMargin,
    "s04_sql_vecdot" ->
      """SELECT e.vec_id, e.label,
        | CAST(round(1000000 * list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[])) AS BIGINT) AS dot_micro
        |FROM embeddings e
        |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q""".stripMargin,
  )
}
