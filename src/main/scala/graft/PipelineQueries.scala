package graft

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-pipeline query surface (SURVEY §2 D): dedup, similarity search, text
  * analysis, multimodal — wired to the driver's oracle gate where DuckDB can
  * express the semantics, rows-only otherwise (LSH uses Spark's xxhash64,
  * which DuckDB lacks).
  */
object PipelineQueries {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Queries.table(spark, sfDir, "documents")
  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    Queries.table(spark, sfDir, "embeddings")

  // ------------------------------------------------------------------ dedup

  /** D1: exact dedup on text (min doc_id survives), per-language survivors. */
  def dedupExactDocs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Dedup.exactDedup(docs(spark, sfDir), Seq("text"), "doc_id")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("min_id"))
      .orderBy($"lang")
  }

  val dedupExactSql: String =
    """SELECT lang, COUNT(*) AS n_docs, MIN(doc_id) AS min_id FROM documents d
      |WHERE doc_id = (SELECT MIN(doc_id) FROM documents d2 WHERE d2.text = d.text)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** D1 normalized flavor: normalize-then-hash exact dedup (the Dolma/C4
    * recipe). The fixture corpus is already clean lowercase, so the query
    * PLANTS the variation the normalizer exists for: every doc_id ≡ 3
    * (mod 7) re-enters as an uppercased copy with trailing punctuation —
    * byte-distinct, normalization-equal. Distinct counts run over md5
    * digests (16-byte shuffle rows at corpus scale, engine-portable), and
    * the row proves n_distinct_norm < n_distinct_raw per language.
    */
  def dedupExactNormalized(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, sfDir).select($"doc_id", $"lang", $"text")
    val planted = d.union(
      d.filter($"doc_id" % 7 === 3)
        .select($"doc_id" + lit(1000000L), $"lang", concat(upper($"text"), lit(" !!"))))
    planted.groupBy($"lang")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(md5($"text")).as("n_distinct_raw"),
        countDistinct(md5(Dedup.normalizedText($"text"))).as("n_distinct_norm"))
      .orderBy($"lang")
  }

  val dedupExactNormalizedSql: String =
    s"""WITH planted AS (
       |  SELECT doc_id, lang, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, lang, upper(text) || ' !!' FROM documents
       |  WHERE doc_id % 7 = 3
       |)
       |SELECT lang, COUNT(*) AS n_rows,
       |  COUNT(DISTINCT md5(text)) AS n_distinct_raw,
       |  COUNT(DISTINCT md5(${Dedup.normalizedTextSql("text")})) AS n_distinct_norm
       |FROM planted GROUP BY lang ORDER BY lang""".stripMargin

  /** D2 exact flavor: high-overlap pairs by 3-gram-shingle Jaccard.
    * maxDocFreq=256 is the corpus-scale boilerplate guard: it never engages
    * on the test SFs (max shingle df at sf0.1 is 25 — measured, so the
    * DuckDB oracle's uncapped formulation stays value-identical) but bounds
    * the posting self-join at stress/corpus scale, where shingles shared by
    * thousands of documents would alone contribute O(df²) candidate pairs
    * (measured in the round-6 stress run: capped shuffle grows linearly
    * with corpus size where the uncapped join grew quadratically).
    */
  /** Corpus-scale document-frequency cap for the ngram pair join (echoed
    * into the stress artifact so a shuffle-volume delta is diagnosable).
    */
  val NgramMaxDocFreq = 256

  def dedupNgramPairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(spark, sfDir), "doc_id", "text", 0.6, maxDocFreq = NgramMaxDocFreq)
      .orderBy(col("jaccard").desc, col("d1"), col("d2"))
      .limit(100)

  val dedupNgramSql: String =
    Dedup.ngramJaccardPairsSql(0.6) +
      "\nORDER BY jaccard DESC, d1, d2 LIMIT 100"

  /** D2 SimHash: per-doc 60-bit signature, bit-exact vs DuckDB via md5. */
  def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simHash(docs(spark, sfDir), "doc_id", "text")
      .orderBy(col("doc"))

  def dedupSimhashSql: String = Dedup.simHashSql + " ORDER BY doc"

  /** D2 MinHash-LSH: near-dup pairs at Jaccard >= 0.5 over 3-shingles.
    * md5-derived permutation family, so the DuckDB oracle replays the exact
    * signatures and banding.
    */
  def dedupMinhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.nearDupPairs(docs(spark, sfDir), "doc_id", "text", 0.5)
      .orderBy(col("jaccard").desc, col("d1"), col("d2"))

  val dedupMinhashSql: String =
    Dedup.minHashPairsSql(0.5) + "\nORDER BY jaccard DESC, d1, d2"

  val dedupClustersSql: String = Dedup.clusterSizesSql(0.5)

  /** `reliableCheckpoint = true` (stress-harness use) writes CC iterations
    * to the SparkContext's checkpoint dir — the fault-tolerant 100 TB mode —
    * instead of executor block storage; caller must `setCheckpointDir`.
    */
  def dedupClusters(spark: SparkSession, sfDir: String,
                    reliableCheckpoint: Boolean = false): DataFrame = {
    import spark.implicits._
    val pairs = Dedup.nearDupPairs(docs(spark, sfDir), "doc_id", "text", 0.5)
    Dedup.duplicateClusters(pairs, reliableCheckpoint = reliableCheckpoint)
      .groupBy($"comp")
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy($"cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy($"cluster_size")
  }

  /** D1/D2 composition: keep-one-per-cluster after MinHash near-dup — the
    * canonical survivor (most tokens, ties → lowest id) of every near-dup
    * component. The step a real pipeline runs between pair generation and
    * the training corpus write.
    */
  def dedupKeepCanonical(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    Dedup.keepCanonical(Dedup.nearDupPairs(d, "doc_id", "text", 0.5), d, "doc_id", "text")
      .orderBy(col("comp"))
  }

  val dedupKeepCanonicalSql: String = Dedup.keepCanonicalSql(0.5)

  /** Sequence packing ("concat and chunk", budget 2048 tokens): histogram of
    * documents-per-bin with token mass per histogram bucket. The engine-side
    * bin assignment is a distributed prefix sum (see [[graft.ops.Packing]]);
    * the oracle replays it with a plain global window.
    */
  def packTrainingSequences(spark: SparkSession, sfDir: String): DataFrame =
    Packing.packedBins(docs(spark, sfDir), "doc_id", "text", budgetTokens = 2048)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("docs_in_bin"), sum(col("n_tokens")).as("bin_tokens"))
      .groupBy(col("docs_in_bin"))
      .agg(count(lit(1)).as("n_bins"), sum(col("bin_tokens")).as("total_tokens"))
      .orderBy(col("docs_in_bin"))

  val packTrainingSequencesSql: String =
    s"""WITH b AS (
       |${Packing.packedBinsSql(2048)}
       |), g AS (
       |  SELECT bin, COUNT(*) AS docs_in_bin, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
       |  FROM b GROUP BY bin
       |)
       |SELECT docs_in_bin, COUNT(*) AS n_bins, CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens
       |FROM g GROUP BY docs_in_bin ORDER BY docs_in_bin""".stripMargin

  /** Token-budget curation (budget 10 000 tokens): keep the highest-quality
    * docs until the budget is reached — output size is bounded by the BUDGET,
    * not the corpus, so the query returns ~the same rows at any scale. The
    * selection is the same distributed prefix sum as packing, ordered by
    * (quality desc, id).
    */
  def sampleTokenBudget(spark: SparkSession, sfDir: String): DataFrame =
    Packing.tokenBudgetSample(docs(spark, sfDir), "doc_id", "text", budgetTokens = 10000L)
      .orderBy(col("quality").desc, col("doc"))

  val sampleTokenBudgetSql: String =
    s"""WITH scored AS (
       |  ${TextAnalysis.scoredDocsSql()}
       |), offs AS (
       |  SELECT doc, n_tokens, quality,
       |    COALESCE(SUM(n_tokens) OVER (ORDER BY quality DESC, doc
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
       |  FROM scored
       |)
       |SELECT doc, n_tokens, quality FROM offs WHERE start < 10000
       |ORDER BY quality DESC, doc""".stripMargin

  /** Domain-mixture reweighting: per-source resampling weight (milli) that
    * would equalize token mass across sources — the "data mixing" step of a
    * training pipeline. Corpus totals ride a broadcast 1-row aggregate
    * (same shape as bm25's stats row — no driver collect, no re-scan).
    */
  def mixtureWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val per = docs(spark, sfDir)
      .select(col("source"), TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("tokens"))
    val tot = per.agg(sum(col("tokens")).as("total"), count(lit(1)).as("k"))
    per.join(broadcast(tot))
      .withColumn("weight_milli",
        round(lit(1000.0) * col("total") / (col("k") * col("tokens"))).cast("long"))
      .select(col("source"), col("n_docs"), col("tokens"), col("weight_milli"))
      .orderBy(col("source"))
  }

  val mixtureWeightsSql: String =
    s"""WITH per AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(${TextAnalysis.tokenCountSql("text")}) AS BIGINT) AS tokens
       |  FROM documents GROUP BY source
       |), tot AS (
       |  SELECT CAST(SUM(tokens) AS BIGINT) AS total, COUNT(*) AS k FROM per
       |)
       |SELECT source, n_docs, tokens,
       |  CAST(ROUND(1000.0 * total / (k * tokens)) AS BIGINT) AS weight_milli
       |FROM per, tot ORDER BY source""".stripMargin

  /** D+ mixture flavor: materialize the reweighted corpus that
    * `mixture_weights` only reports — deterministic md5-bucket stochastic
    * rounding of per-doc copy counts toward equal per-source token mass.
    * See [[Sampling.mixtureResample]].
    */
  def mixtureResample(spark: SparkSession, sfDir: String): DataFrame =
    Sampling.mixtureResample(docs(spark, sfDir), "doc_id", "text", "source")

  def mixtureResampleSql: String = Sampling.mixtureResampleSql

  /** Exact-substring duplication report: the 50 documents most covered by
    * 8-token spans that appear verbatim in other documents (the
    * suffix-array-dedup signal at fixed span length). See [[Spans]] for the
    * linear-scale shape.
    */
  def spanDupCoverage(spark: SparkSession, sfDir: String): DataFrame =
    Spans.dupSpanCoverage(docs(spark, sfDir), "doc_id", "text", k = 8)
      .orderBy(col("dup_tokens").desc, col("doc"))
      .limit(50)

  val spanDupCoverageSql: String =
    Spans.dupSpanCoverageSql(8) + "\nORDER BY dup_tokens DESC, doc LIMIT 50"

  /** Exact-substring dedup rewrite: remove cross-document duplicated runs of
    * >= 12 tokens (8-token spans, contiguous coverage merged) and emit the
    * rewritten docs with an md5 of the cleaned text — the output a corpus
    * materialization would write. See [[Spans.removeDupSpans]].
    */
  def spanDedupRewrite(spark: SparkSession, sfDir: String): DataFrame =
    Spans.removeDupSpans(docs(spark, sfDir), "doc_id", "text", k = 8, minRunTokens = 12)
      .orderBy(col("removed_tokens").desc, col("doc"))
      .limit(50)

  val spanDedupRewriteSql: String =
    Spans.removeDupSpansSql(8, 12) + "\nORDER BY removed_tokens DESC, doc LIMIT 50"

  /** Variable-length span rewrite: 8-token islands removed only when backed
    * by a 24-token shared span — the two-level precision/recall refinement
    * of [[spanDedupRewrite]], computed map-side against broadcast hot-key
    * sets (no per-position window exchange). See
    * [[Spans.removeDupSpansVarK]].
    */
  def spanDedupRewriteVarK(spark: SparkSession, sfDir: String): DataFrame =
    Spans.removeDupSpansVarK(docs(spark, sfDir), "doc_id", "text",
        kSeed = 24, kExt = 8, minRunTokens = 12)
      .orderBy(col("removed_tokens").desc, col("doc"))
      .limit(50)

  val spanDedupRewriteVarKSql: String =
    Spans.removeDupSpansVarKSql(24, 8, 12) + "\nORDER BY removed_tokens DESC, doc LIMIT 50"

  /** The nightly-corpus-build composition, end to end in one plan: quality
    * gate → exact dedup (min-id survivor) → exact-substring span removal
    * over the surviving set, reported per language (docs kept, docs
    * rewritten, tokens removed, clean token mass). Each stage is the SAME
    * shared operator the standalone rows prove ([[TextAnalysis]] quality
    * gate, [[Dedup.exactDedup]], [[Spans.removeDupSpans]]), so the
    * composition's oracle reuses their SQL mirrors verbatim — this row
    * exists to prove the stages COMPOSE, the thing a real pipeline does
    * every run. Scale shape is the union of the parts: one quality scan,
    * one text-keyed dedup shuffle, the span machinery's aggregate-up/
    * broadcast-down, and a final per-doc left join at survivor granularity.
    */
  def corpusMaterialize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = docs(spark, sfDir)
      .withColumn("_toks", TextAnalysis.tokens($"text"))
      .filter(
        TextAnalysis.qualityScoreFromTokens($"text", $"_toks") >= 40 &&
          size($"_toks") >= 10 &&
          TextAnalysis.punctPerMille($"text") <= 100)
      .drop("_toks")
    val surv = Dedup.exactDedup(base, Seq("text"), "doc_id")
    val rewrites = Spans.removeDupSpans(surv, "doc_id", "text", k = 8, minRunTokens = 12)
      .select(col("doc"), col("removed_tokens"))
    surv
      .select($"doc_id".as("doc"), $"lang", TextAnalysis.tokenCount($"text").cast("long").as("_n"))
      .join(rewrites, Seq("doc"), "left")
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"removed_tokens".isNotNull, 1L).otherwise(0L)).as("n_rewritten"),
        sum(coalesce($"removed_tokens", lit(0L))).as("removed_tokens"),
        sum($"_n" - coalesce($"removed_tokens", lit(0L))).as("clean_tokens"))
      .orderBy($"lang")
  }

  val corpusMaterializeSql: String = {
    import TextAnalysis._
    s"""WITH filtered AS (
       |  SELECT doc_id, lang, text FROM documents
       |  WHERE ${qualityScoreSql("text")} >= 40 AND ${tokenCountSql("text")} >= 10
       |    AND ${punctPerMilleSql("text")} <= 100
       |), srcdocs AS (
       |  SELECT doc_id, lang, text FROM filtered d
       |  WHERE doc_id = (SELECT MIN(doc_id) FROM filtered d2 WHERE d2.text = d.text)
       |),
       |${Spans.dupRunRemovedCtes(8, 12)}
       |SELECT s.lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN r.removed_tokens IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rewritten,
       |  CAST(SUM(COALESCE(r.removed_tokens, 0)) AS BIGINT) AS removed_tokens,
       |  CAST(SUM(${tokenCountSql("s.text")} - COALESCE(r.removed_tokens, 0)) AS BIGINT) AS clean_tokens
       |FROM srcdocs s LEFT JOIN removed r ON s.doc_id = r.doc
       |GROUP BY s.lang ORDER BY s.lang""".stripMargin
  }

  /** Incremental ingest admission: docs with `doc_id % 5 = 4` play the
    * "new crawl batch", the rest the existing corpus; each batch doc is
    * classified exact_dup / near_dup (MinHash tau=0.5) / novel and counted
    * per (lang, status). See [[Incremental]] — the corpus side is never
    * self-joined, so the shape is batch-bounded at 100 TB.
    */
  def incrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val isBatch = col("doc_id") % 5 === 4
    val newDocs = d.filter(isBatch)
    Incremental.batchStatus(newDocs, d.filter(!isBatch), "doc_id", "text", 0.5)
      .join(newDocs.select(col("doc_id").as("doc"), col("lang")), "doc")
      .groupBy(col("lang"), col("status"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("status"))
  }

  val incrementalDedupSql: String =
    Incremental.batchStatusCountsSql(0.5, "doc_id % 5 = 4")

  /** Steady-state variant of [[incrementalDedup]]: the corpus signatures
    * come from a PERSISTED parquet index (built once per sf dir, cached in
    * /tmp, parquet-round-tripped), so per-batch work never touches corpus
    * text. Value-identical to the recompute path — same oracle SQL.
    */
  def incrementalDedupSteady(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val isBatch = col("doc_id") % 5 === 4
    val newDocs = d.filter(isBatch)
    val sigPath = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_sigtable_v1_${java.lang.Integer.toHexString(sfDir.hashCode)}").getAbsolutePath
    val corpSigs = Incremental.ensureSignatureTable(
      spark, d.filter(!isBatch), "doc_id", "text", sigPath)
    Incremental.batchStatusSteady(newDocs, corpSigs, "doc_id", "text", 0.5)
      .join(newDocs.select(col("doc_id").as("doc"), col("lang")), "doc")
      .groupBy(col("lang"), col("status"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("status"))
  }

  val incrementalDedupSteadySql: String = incrementalDedupSql

  /** [[incrementalDedupSteady]] with the signature index stored IN the 4mc
    * container (round 12): `(doc, digest, sig: array<long>, shingles:
    * array<long>)` rides the csv payload with digest blooms — the parquet
    * sidecar is gone, and the steady-state admission reads MinHash arrays
    * straight off the splittable container. Value-identical to the recompute
    * and parquet-steady paths (same signature family end-to-end), so the
    * oracle SQL is shared.
    */
  def incrementalDedupSteadyNative(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val isBatch = col("doc_id") % 5 === 4
    val newDocs = d.filter(isBatch)
    val sigPath = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_sigtable4mc_v1_${java.lang.Integer.toHexString(sfDir.hashCode)}").getAbsolutePath
    val corpSigs = Incremental.ensureSignatureTable4mc(
      spark, d.filter(!isBatch), "doc_id", "text", sigPath)
    Incremental.batchStatusSteady(newDocs, corpSigs, "doc_id", "text", 0.5)
      .join(newDocs.select(col("doc_id").as("doc"), col("lang")), "doc")
      .groupBy(col("lang"), col("status"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("status"))
  }

  val incrementalDedupSteadyNativeSql: String = incrementalDedupSql

  /** Exact-dup batch admission against a 4MC SIGNATURE ARCHIVE with digest
    * BLOOMS — this round's format features composed into the pipeline's
    * steady-state shape: the corpus admission index `(doc, digest)` lives in
    * the container format with per-block bloom filters on the md5 digest,
    * and the daily batch probes it as the PROBE side of a broadcast join, so
    * [[graft.plans.McInjectRuntimeKeyFilter]] hashes the batch's ~|batch|
    * digests and refutes archive blocks by bloom membership. At 100 TB the
    * nightly "which of these documents have we already ingested?" touches
    * the blocks that may hold a matching digest and decompresses nothing
    * else — no shuffle of the archive, no scan of it either. (Near-dup
    * admission stays [[Incremental.batchStatusSteady]] over the parquet
    * signature table — MinHash arrays don't ride the csv payload yet.)
    */
  def incrementalExactArchive(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
    val d = docs(spark, sfDir)
    val isBatch = col("doc_id") % 5 === 4
    val dir = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_sig_archive_${java.lang.Integer.toHexString(sfDir.hashCode)}").getAbsolutePath
    // admission key: md5 of the 80-char text prefix — the cheap first-pass
    // fingerprint a real pipeline stores (full-text digests follow only for
    // prefix hits); also what makes the fixture non-vacuous at small SF
    def fp(c: org.apache.spark.sql.Column) =
      md5(substring(c, 1, 80).cast(BinaryType)).as("digest")
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      d.filter(!isBatch)
        .select(col("doc_id").as("doc"), fp(col("text")))
        .coalesce(1)
        .write.mode("overwrite").format("4mc").option("payload", "csv")
        .option("bloomColumns", "digest").save(dir)
    }
    val schema = StructType(Seq(
      StructField("doc", LongType), StructField("digest", StringType)))
    val archive = spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir)
    val batch = d.filter(isBatch)
      .select(fp(col("text")), col("doc_id"), col("lang"))
    archive.join(broadcast(batch), Seq("digest"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_exact"))
      .orderBy(col("lang"))
  }

  val incrementalExactArchiveSql: String =
    """SELECT n.lang, COUNT(DISTINCT n.doc_id) AS n_exact
      |FROM documents n JOIN documents c ON substr(n.text, 1, 80) = substr(c.text, 1, 80)
      |WHERE n.doc_id % 5 = 4 AND NOT (c.doc_id % 5 = 4)
      |GROUP BY n.lang ORDER BY n.lang""".stripMargin

  /** Curriculum tiers: 10 equal-population quality bins (0 = best) with
    * doc/token mass and the exact quality range per bin. Global rank via
    * the distributed prefix sum ([[Packing.qualityCurriculum]]).
    */
  def qualityCurriculum(spark: SparkSession, sfDir: String): DataFrame =
    Packing.qualityCurriculum(docs(spark, sfDir), "doc_id", "text", nBins = 10)
      .orderBy(col("bin"))

  val qualityCurriculumSql: String = Packing.qualityCurriculumSql(10)

  /** D+ per-domain admission cap (Gopher rule): keep the 10 highest-quality
    * docs per source; per-source admission stats.
    */
  def domainCapSample(spark: SparkSession, sfDir: String): DataFrame =
    Sampling.domainCapSample(docs(spark, sfDir), "doc_id", "text", "source", cap = 10)
      .orderBy(col("source"))

  val domainCapSampleSql: String = Sampling.domainCapSampleSql(10)

  // ------------------------------------------------------------- similarity

  /** D3 exact: top-5 cosine neighbors for queries vec_id < 10. */
  def annBruteForce(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    Similarity.bruteForceTopKRounded(e, e.filter(col("vec_id") < 10), 5)
  }

  def annBruteForceSql: String = Similarity.bruteForceSql(10, 5)

  /** [[annBruteForce]] over CONTAINER-NATIVE embeddings (round 12 arrays):
    * the `array<float>` column round-trips through the 4mc csv payload, so
    * similarity search runs straight off the splittable container — no
    * parquet hop for the vector store. Same oracle as the parquet path
    * (element-exact round-trip ⇒ identical similarities).
    */
  def annBruteForceFourMc(spark: SparkSession, sfDir: String): DataFrame = {
    val e = RoundTrip.roundTrip(spark, sfDir, "embeddings", "lz4-fast")
    Similarity.bruteForceTopKRounded(e, e.filter(col("vec_id") < 10), 5)
  }

  def annBruteForceFourMcSql: String = annBruteForceSql

  /** D2 embedding flavor at a LOOSE threshold (τ=0.4) — the QUARANTINED
    * exact baseline, NOT the scale path. At τ=0.4 over dense 64-dim
    * embeddings a threshold pair's per-bit SRP agreement (~0.63) is barely
    * above random (0.5), so *no* (bits, tables) family both prunes and keeps
    * recall — LSH degenerates to all-pairs plus a 20× posting/distinct
    * overhead (measured: the bucketed form was the slowest query in the
    * whole bench at 3.2 s, ~all N²/2 candidates surviving). The honest
    * baseline at this regime is the EXACT all-pairs formulation with
    * precomputed norms, and the quarantine makes its cost BOUNDED BY
    * CONSTRUCTION: both sides are capped to the first
    * [[EmbeddingBaselineSampleCap]] vector ids, so the plan's nested-loop
    * join is over a fixed-size sample no matter the corpus size (OpsSpec
    * asserts no registered plan carries a BNLJ over an unbounded side).
    * Real dedup thresholds (τ ≥ 0.8) use the SRP-bucketed operator, proven
    * sub-quadratic by the `_tight` row and OpsSpec's candidate-volume
    * assertion.
    */
  def dedupEmbeddingPairsExactBaseline(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.embeddingDupPairs(
        emb(spark, sfDir).filter(col("vec_id") < EmbeddingBaselineSampleCap), 0.4)
      .orderBy(col("simr").desc, col("d1"), col("d2"))

  /** Covers all of sf0.01 (500 vectors, so the oracle rows are unchanged)
    * while capping the all-pairs work at 1000²/2 comparisons at any scale.
    */
  val EmbeddingBaselineSampleCap = 1000L

  def dedupEmbeddingPairsExactBaselineSql: String =
    Similarity.embeddingDupPairsSql(0.4, EmbeddingBaselineSampleCap) +
      "\nORDER BY simr DESC, d1, d2"

  /** D2 embedding flavor at the dedup-realistic regime (τ=0.8, bits=8,
    * tables=8): the corpus is embeddings ∪ a deterministically perturbed twin
    * of every vector ([[Similarity.withPlantedDups]] — pure id arithmetic the
    * oracle replays), so ground truth is ~N real pairs at cosine ≈ 1 while
    * cross pairs stay ≤ 0.61. At this τ the SRP buckets prune candidates to
    * ~4% of N²/2 (26×, measured at all SFs, recall 1.0 — asserted in
    * OpsSpec), which is the regime that makes the operator linear-ish at
    * 100 TB; the τ=0.4 row keeps the loose-threshold semantics.
    */
  def dedupEmbeddingPairsTight(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    Similarity.embeddingDupPairsViaLsh(
        Similarity.withPlantedDups(e, Similarity.plantedOffset(e)),
        0.8, dim = 64, bits = 8, tables = 8)
      .orderBy(col("d1"), col("d2"))
  }

  def dedupEmbeddingPairsTightSql: String =
    Similarity.plantedDupPairsSql(0.8) + "\nORDER BY d1, d2"

  /** D2 embedding flavor, cluster-then-prune (SemDeDup): same planted corpus
    * and τ=0.8 as the `_tight` row, but candidates come from a k=16 Voronoi
    * partition of the embedding space instead of SRP buckets — map-only
    * centroid assignment, then an equality self-join on the cluster id.
    * `iters=0` seed-medoid centroids keep the row exactly SQL-replayable;
    * the Lloyd path (`iters>0`) is the corpus-scale configuration and shares
    * every plan property (see [[Similarity.semanticDedup]]).
    */
  def semanticDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    Similarity.semanticDedup(
        Similarity.withPlantedDups(e, Similarity.plantedOffset(e)),
        k = 16, tau = 0.8)
      .orderBy(col("vec_id"))
  }

  def semanticDedupSql: String = Similarity.semanticDedupSql(16, 0.8)

  /** D6 quality flavor: CCNet-style unigram-LM perplexity-proxy scoring.
    * vocabCap=16 deliberately cuts inside this corpus's vocabulary so BOTH
    * paths are exercised: in-vocab tokens score ln(cnt/total), the rest take
    * the OOV floor ln(1/total). See [[TextAnalysis.unigramLogProb]].
    */
  def unigramLogProb(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.unigramLogProb(docs(spark, sfDir), "doc_id", "text", vocabCap = 16)
      .orderBy(col("doc"))

  def unigramLogProbSql: String =
    TextAnalysis.unigramLogProbSql(16) + "\nORDER BY doc"

  /** D6 bigram flavor: interpolated-absolute-discount bigram LM scoring —
    * one order closer to CCNet's KenLM than the unigram row. vocabCap=16 /
    * bigramCap=48 cut inside this corpus's vocabulary and bigram table so
    * all three scoring paths run: discounted in-table bigrams, λ-backoff
    * for out-of-table bigrams over known histories, and pure unigram for
    * OOV histories. See [[TextAnalysis.bigramLogProb]].
    */
  def bigramLogProb(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.bigramLogProb(docs(spark, sfDir), "doc_id", "text",
        vocabCap = 16, bigramCap = 48)
      .orderBy(col("doc"))

  def bigramLogProbSql: String =
    TextAnalysis.bigramLogProbSql(16, 48) + "\nORDER BY doc"

  /** D4+ trained-subword segmentation: real BPE (Sennrich et al. 2016)
    * applied per token by the codegen [[graft.functions.BpeEncodeExpr]].
    * The registered row uses [[Bpe.DisjointMerges]] — a merge table whose
    * pairwise-disjoint alphabets make greedy min-rank BPE provably equal an
    * arithmetic identity DuckDB can state; the trained path (distributed
    * word counts + driver merge loop) and interacting-merge behavior are
    * exercised in BpeSpec.
    */
  def bpeSegmentStats(spark: SparkSession, sfDir: String): DataFrame =
    Bpe.bpeSegmentStats(docs(spark, sfDir), "lang", "text")

  val bpeSegmentStatsSql: String = Bpe.bpeSegmentStatsSql

  /** D+ data-selection flavor: DSIR importance resampling toward the
    * English-labeled slice of the corpus — hashed-bigram importance weights,
    * Gumbel top-k selection, everything md5-keyed and micro-nat-quantized so
    * the resample is exactly replayable. m=1024 buckets comfortably exceeds
    * this fixture's bigram mass while staying the corpus-size-independent
    * broadcast the paper's 10^4-bucket production setting would be.
    * See [[Dsir.dsirSelect]].
    */
  def dsirSelect(spark: SparkSession, sfDir: String): DataFrame =
    Dsir.dsirSelect(docs(spark, sfDir), "doc_id", "text",
      targetPred = col("lang") === "en", m = 1024, k = 100)

  def dsirSelectSql: String = Dsir.dsirSelectSql(1024, 100)

  /** D3 approximate: SRP-LSH bucketed ANN over the same queries. At
    * (bits=2, tables=24) the bucket union covers every true top-5 neighbor
    * on this corpus (measured at all SFs; deterministic hyperplanes), so the
    * output equals brute force exactly and the brute-force SQL is its
    * oracle. Neighbor ids are excluded from the projection so a rank swap
    * between float-identical sims can't flip the hash.
    */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    Similarity.annTopK(e, e.filter(col("vec_id") < 10), 5, dim = 64, bits = 2, tables = 24)
      .select(col("qid"), col("rn"), round(col("sim"), 5).as("simr"))
      .orderBy(col("qid"), col("rn"))
  }

  val annLshSql: String = Similarity.bruteForceSql(10, 5)

  /** D3 approximate: IVF cell-probing ANN. nprobe=14/16 reaches exact
    * brute-force agreement on this weakly-clustered corpus (lower nprobe
    * drops true neighbors at small SFs) — with real cluster structure the
    * same operator prunes far harder at equal recall.
    */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), 5, nCells = 16, nprobe = 14)
      .select(col("qid"), col("rn"), round(col("sim"), 5).as("simr"))
      .orderBy(col("qid"), col("rn"))
  }

  val annIvfSql: String = Similarity.bruteForceSql(10, 5)

  /** D3 compressed-domain: product-quantization ADC (mSub=32 2-dim
    * subspaces × ks=16 spherical sub-centroids = 2 bits/dim) generates
    * nCand=128 candidates per query from the 16×-smaller code scan, then
    * exact re-rank makes the emitted top-5 equal brute force (recall swept
    * at 500- and 2000-vector corpora: zero misses at nCand=100, 128 adds
    * margin; OpsSpec asserts the fixture recall), so the brute-force SQL is
    * its oracle. See [[Similarity.pqTopK]].
    */
  def annPq(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    Similarity.pqTopK(e, e.filter(col("vec_id") < 10), 5, dim = 64,
        mSub = 32, ks = 16, nCand = 128)
      .select(col("qid"), col("rn"), round(col("sim"), 5).as("simr"))
      .orderBy(col("qid"), col("rn"))
  }

  val annPqSql: String = Similarity.bruteForceSql(10, 5)

  /** D3 production shape: IVF + PQ (FAISS IVFPQ) — probe-bounded candidate
    * cells joined by EQUALITY on the cell id (no nested-loop join), each
    * candidate ADC-scored over its 16-byte code, exact re-rank keeps the
    * top-5 brute-force-exact (recall asserted at both fixture corpus sizes
    * in PqSpec). See [[Similarity.ivfPqTopK]].
    */
  def annIvfPq(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10), 5, dim = 64,
        nCells = 16, nprobe = 14, mSub = 32, ks = 16, nCand = 128)
      .select(col("qid"), col("rn"), round(col("sim"), 5).as("simr"))
      .orderBy(col("qid"), col("rn"))
  }

  val annIvfPqSql: String = Similarity.bruteForceSql(10, 5)

  /** D3+ corpus analysis: per-cluster profile over k=16 seed-medoid cells —
    * the report a curation run reads before choosing semantic-dedup
    * parameters. See [[Similarity.clusterProfile]].
    */
  def clusterProfile(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.clusterProfile(emb(spark, sfDir), k = 16)

  val clusterProfileSql: String = Similarity.clusterProfileSql(16)

  /** D3+ contrastive-training prep: top-5 most-similar DIFFERENT-label
    * neighbors per probe vector. See [[Similarity.hardNegatives]].
    */
  def annHardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    Similarity.hardNegatives(e, e.filter(col("vec_id") < 10), 5)
      .select(col("qid"), col("rn"), round(col("sim"), 5).as("simr"))
      .orderBy(col("qid"), col("rn"))
  }

  val annHardNegativesSql: String = Similarity.hardNegativesSql(10, 5)

  // ------------------------------------------------------------------- text

  /** D4: per-language token/quality statistics. */
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .select($"lang", $"text", TextAnalysis.tokens($"text").as("_toks"))
      .select(
        $"lang",
        size($"_toks").as("n_tokens"),
        TextAnalysis.qualityScoreFromTokens($"text", $"_toks").as("quality"),
        TextAnalysis.punctPerMille($"text").as("punct"),
        TextAnalysis.meanTokenLenMilliFromTokens($"_toks").as("mtl")
      )
      .groupBy($"lang")
      .agg(
        sum($"n_tokens").as("total_tokens"),
        min($"quality").as("min_q"),
        max($"quality").as("max_q"),
        sum($"quality").as("sum_q"),
        sum($"punct").as("sum_punct"),
        sum($"mtl").as("sum_mtl")
      )
      .orderBy($"lang")
  }

  val textStatsSql: String = {
    import TextAnalysis._
    s"""SELECT lang, CAST(SUM(${tokenCountSql("text")}) AS BIGINT) AS total_tokens,
       |  MIN(${qualityScoreSql("text")}) AS min_q,
       |  MAX(${qualityScoreSql("text")}) AS max_q,
       |  CAST(SUM(${qualityScoreSql("text")}) AS BIGINT) AS sum_q,
       |  CAST(SUM(${punctPerMilleSql("text")}) AS BIGINT) AS sum_punct,
       |  CAST(SUM(${meanTokenLenMilliSql("text")}) AS BIGINT) AS sum_mtl
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** D4: language-ID heuristic vs. labeled lang — confusion counts. */
  def langIdConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .select($"lang", TextAnalysis.tokens($"text").as("_toks"))
      .select($"lang".as("actual"), TextAnalysis.langIdFromTokens($"_toks").as("predicted"))
      .groupBy($"actual", $"predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy($"actual", $"predicted")
  }

  val langIdConfusionSql: String =
    s"""SELECT lang AS actual, ${TextAnalysis.langIdSql("text")} AS predicted, COUNT(*) AS n
       |FROM documents GROUP BY 1, 2 ORDER BY actual, predicted""".stripMargin

  /** D4: min-hash-of-3-grams document fingerprints (md5-based, exact). */
  def docFingerprints(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .filter($"doc_id" < 100)
      .select($"doc_id", TextAnalysis.tokens($"text").as("_toks"))
      .select($"doc_id", TextAnalysis.fingerprintFromTokens($"_toks").as("fp"))
      .orderBy($"doc_id")
  }

  val docFingerprintsSql: String =
    s"""SELECT doc_id, ${TextAnalysis.fingerprintSql("text")} AS fp
       |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  /** D6: quality filter — docs passing a pipeline gate, per (lang, source). */
  def qualityFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .withColumn("_toks", TextAnalysis.tokens($"text"))
      .filter(
        TextAnalysis.qualityScoreFromTokens($"text", $"_toks") >= 40 &&
          size($"_toks") >= 10 &&
          TextAnalysis.punctPerMille($"text") <= 100
      )
      .drop("_toks")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_pass"), sum(length($"text")).as("pass_chars"))
      .orderBy($"lang")
  }

  val qualityFilterSql: String = {
    import TextAnalysis._
    s"""SELECT lang, COUNT(*) AS n_pass, CAST(SUM(length(text)) AS BIGINT) AS pass_chars FROM documents
       |WHERE ${qualityScoreSql("text")} >= 40 AND ${tokenCountSql("text")} >= 10
       |  AND ${punctPerMilleSql("text")} <= 100
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** D4: vocabulary statistics — exact distinct tokens per language (oracle)
    * next to the HLL sketch (approx_count_distinct; engine-specific, checked
    * for sanity in OpsSpec, excluded from the oracle projection).
    */
  def vocabStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .select($"lang", explode(TextAnalysis.tokens($"text")).as("w"))
      .groupBy($"lang")
      .agg(countDistinct($"w").as("vocab_exact"), count(lit(1)).as("n_tokens"))
      .orderBy($"lang")
  }

  /** D4: whitespace vs BPE-ish subword token budget per language. The corpus
    * text is pure lowercase words, so the subword tokenizer is exercised on
    * derived mixed text (a deterministic `" v<id>.x!"` suffix adds digit and
    * punctuation runs) — the two counts must diverge by exactly the extra
    * runs, and the oracle replays the same regex in RE2.
    */
  def tokenCountsSubword(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .select($"lang",
        concat($"text", lit(" v"), $"doc_id".cast("string"), lit(".x!")).as("t2"))
      .groupBy($"lang")
      .agg(
        sum(TextAnalysis.tokenCount($"t2").cast("long")).as("ws_tokens"),
        sum(TextAnalysis.subwordTokenCount($"t2").cast("long")).as("subword_tokens"))
      .orderBy($"lang")
  }

  val tokenCountsSubwordSql: String = {
    import TextAnalysis._
    s"""SELECT lang,
       |  CAST(SUM(${tokenCountSql("t2")}) AS BIGINT) AS ws_tokens,
       |  CAST(SUM(${subwordTokenCountSql("t2")}) AS BIGINT) AS subword_tokens
       |FROM (SELECT lang, text || ' v' || CAST(doc_id AS VARCHAR) || '.x!' AS t2 FROM documents) d
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  val vocabStatsSql: String =
    """SELECT lang, COUNT(DISTINCT w) AS vocab_exact, COUNT(*) AS n_tokens FROM (
      |  SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents) t
      |GROUP BY lang ORDER BY lang""".stripMargin

  // --------------------------------------------------------------- protobuf

  // field 4 is repeated int64 — written PACKED (wire type 2, the proto3
  // default), exercising the packed decode path end-to-end
  private val partProtoSpec = "1:p_partkey:long,2:p_name:string,3:tags:rstring,4:tag_lens:rlong"

  /** A3/A10 typed-record path: the reference's flagship protobuf Spark
    * example (`TestProtobufInput.java:88-112` — explode a repeated field,
    * count per tag, sort) reproduced end-to-end over REAL protobuf wire
    * bytes: rows serialize to wire format (graft.functions.ProtoWire), ride
    * the container's binary payload, decode through the proto_struct
    * Catalyst expression, and the aggregate oracle runs on the original
    * parquet — any wire-format or container corruption breaks the hash.
    */
  def protobufTagCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{ProtoFunctions, ProtoWire}
    import spark.implicits._
    val dir = partProtoDir(spark, sfDir)
    // explode_outer: the plain explode triggers InferFiltersFromGenerate,
    // which re-evaluates the proto decode inside a pre-filter (3x per row);
    // outer explode keeps one decode per row, and part names are never empty
    spark.read.format("4mc").option("payload", "binary").load(dir.getAbsolutePath)
      .select(ProtoFunctions.proto_struct(col("value"), partProtoSpec).as("m"))
      .select(explode_outer($"m.tags").as("tag"))
      .filter($"tag".isNotNull)
      .groupBy($"tag")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tag")
  }

  val protobufTagCountsSql: String =
    """SELECT tag, COUNT(*) AS cnt FROM (
      |  SELECT unnest(string_split(p_name, ' ')) AS tag FROM part) t
      |GROUP BY tag ORDER BY cnt DESC, tag""".stripMargin

  /** Write (once per sf) the part table as protobuf wire messages inside the
    * 4mc binary payload. Field 4 (`tag_lens`) is a packed repeated int64.
    */
  private def partProtoDir(spark: SparkSession, sfDir: String): java.io.File = {
    import graft.functions.ProtoWire
    import spark.implicits._
    val key = java.lang.Integer.toHexString(sfDir.hashCode)
    val dir = new java.io.File(s"/tmp/graft-rt2/$key/part-proto2-4mc")
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val fields = ProtoWire.parseSpec(partProtoSpec)
      Queries.table(spark, sfDir, "part")
        .select($"p_partkey", $"p_name", split($"p_name", " ").as("tags"))
        .as[(Long, String, Seq[String])]
        .map { case (k, n, t) =>
          ProtoWire.encode(fields, Seq(k, n, t, t.map(_.length.toLong)))
        }
        .toDF("value")
        .repartition(2)
        .write.mode("overwrite").format("4mc")
        .option("payload", "binary").option("codec", "lz4-fast")
        .save(dir.getAbsolutePath)
    }
    dir
  }

  /** A3 packed-repeated path: decode the PACKED int64 field per message and
    * oracle-check its per-row aggregate against string arithmetic on the
    * original parquet — any mis-framing of the packed run breaks the hash.
    */
  def protobufPackedLens(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.ProtoFunctions
    import spark.implicits._
    val dir = partProtoDir(spark, sfDir)
    spark.read.format("4mc").option("payload", "binary").load(dir.getAbsolutePath)
      .select(ProtoFunctions.proto_struct(col("value"), partProtoSpec).as("m"))
      .select(
        $"m.p_partkey".as("p_partkey"),
        size($"m.tag_lens").as("n_tags"),
        aggregate($"m.tag_lens", lit(0L), (a, x) => a + x).as("sum_len"))
      .orderBy($"p_partkey")
  }

  val protobufPackedLensSql: String =
    """SELECT p_partkey,
      |  CAST(len(string_split(p_name, ' ')) AS INT) AS n_tags,
      |  CAST(list_aggregate(list_transform(string_split(p_name, ' '),
      |       w -> CAST(length(w) AS BIGINT)), 'sum') AS BIGINT) AS sum_len
      |FROM part ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------------------- multimodal

  /** D5: full binary pipeline through the 4mc container. The rolling
    * checksum column stays out of the driver projection (a per-byte fold the
    * oracle can't express cheaply; asserted deterministic in OpsSpec) —
    * everything else, including the first-body-byte payload probe, is
    * oracle-checked against pure id arithmetic.
    */
  def multimodalPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val key = java.lang.Integer.toHexString(sfDir.hashCode)
    Multimodal.pipelineMetrics(spark, 2000, s"/tmp/graft-rt/$key/media-4mc")
      .drop("checksum_sum")
  }

  val multimodalSql: String = Multimodal.pipelineMetricsSql(2000)

  /** Real-format header parse: genuine JPEG/WAV bytes through the 4mc
    * binary sink + splittable scan, dims/duration parsed byte-level by
    * [[graft.functions.MediaHeaderExpr]], aggregates checked against pure
    * id arithmetic. See [[Multimodal.mediaHeaderPipeline]].
    */
  def mediaHeaderParse(spark: SparkSession, sfDir: String): DataFrame = {
    val key = java.lang.Integer.toHexString(sfDir.hashCode)
    Multimodal.mediaHeaderPipeline(spark, 2000, s"/tmp/graft-rt/$key/media-real-4mc")
  }

  val mediaHeaderParseSql: String = Multimodal.mediaHeaderSql(2000)

  // --------------------------------------------------------- sketch surface

  /** D8: heavy hitters via the mergeable Misra-Gries aggregate
    * ([[graft.functions.FrequencySketch]]). capacity=64 exceeds the
    * event_type cardinality, so the sketch is EXACT here and oracle-checkable;
    * the approximation regime (capacity < distinct) is pinned in
    * FrequencySketchSpec. At 100 TB each partition ships 64 counters — the
    * shuffle never carries rows.
    */
  def topkEventTypes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Queries.events(spark, sfDir)
      .agg(graft.functions.FrequencySketch.topk_freq($"event_type", 5, 64).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item".as("event_type"), $"e.cnt".as("n_events"))
      .orderBy($"n_events".desc, $"event_type")
  }

  val topkEventTypesSql: String =
    """SELECT event_type, COUNT(*) AS n_events FROM events
      |GROUP BY event_type ORDER BY n_events DESC, event_type LIMIT 5""".stripMargin

  // ------------------------------------------------------- skew & bucketing

  /** Salted join driver row: per-supplier revenue through
    * [[Skew.saltedJoin]] — the salt spreads a hot supplier over 8 reducers
    * and must NOT change the result, so the oracle is the plain join.
    */
  def skewSaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val li = Queries.table(spark, sfDir, "lineitem").withColumnRenamed("l_suppkey", "suppkey")
    val supp = Queries.table(spark, sfDir, "supplier").withColumnRenamed("s_suppkey", "suppkey")
    Skew.saltedJoin(li, supp, "suppkey", 8)
      .groupBy($"s_name")
      .agg(
        sum(($"l_extendedprice".cast(DecimalType(18, 2))) * (lit(1) - $"l_discount".cast(DecimalType(18, 2))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy($"revenue".desc, $"s_name")
      .limit(25)
  }

  val skewSaltedJoinSql: String =
    """SELECT s_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY revenue DESC, s_name LIMIT 25""".stripMargin

  /** Hot-key measurement op as a driver row: the 10 heaviest part keys. */
  def skewHotKeys(spark: SparkSession, sfDir: String): DataFrame =
    Skew.hotKeys(Queries.table(spark, sfDir, "lineitem"), "l_partkey", 10)

  val skewHotKeysSql: String =
    """SELECT l_partkey, COUNT(*) AS cnt FROM lineitem
      |GROUP BY l_partkey ORDER BY cnt DESC, l_partkey ASC LIMIT 10""".stripMargin

  /** Bucketed co-located join as a driver row: both sides written
    * bucketed+sorted on the join key (once per JVM per sf), then joined with
    * ZERO exchange (plan pinned in OpsSpec) — result identical to the plain
    * join, which is the oracle.
    */
  def bucketedJoinRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val key = java.lang.Integer.toHexString(sfDir.hashCode)
    val liTbl = s"graft_li_bkt_$key"
    val ordTbl = s"graft_ord_bkt_$key"
    if (!spark.catalog.tableExists(liTbl)) {
      Bucketing.writeBucketed(
        Queries.table(spark, sfDir, "lineitem")
          .select($"l_orderkey", $"l_extendedprice", $"l_discount"),
        liTbl, "l_orderkey", 8)
      Bucketing.writeBucketed(
        Queries.table(spark, sfDir, "orders").select($"o_orderkey", $"o_orderpriority"),
        ordTbl, "o_orderkey", 8)
    }
    spark.table(liTbl)
      .join(spark.table(ordTbl), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        sum(($"l_extendedprice".cast(DecimalType(18, 2))) * (lit(1) - $"l_discount".cast(DecimalType(18, 2))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy($"o_orderpriority")
  }

  val bucketedJoinRevenueSql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Runtime bloom-filter join as a driver row: a selective predicate on
    * orders injects a bloom probe on the lineitem side BEFORE its shuffle
    * (Catalyst InjectRuntimeFilter) — at 100 TB the fact table shuffles only
    * probable matches, not every row. Runs in an isolated session: the
    * thresholds that make the optimization fire at test scale (and the
    * disabled broadcast that makes the join shuffle at all) never touch the
    * caller's conf. Plan pinned in OpsSpec; the result is byte-identical to
    * the plain join, which is the oracle.
    */
  def bloomFilteredJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Queries.table(s, sfDir, "lineitem")
    val ord = Queries.table(s, sfDir, "orders").filter(col("o_totalprice") > 250000)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(li("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        sum((col("l_extendedprice").cast(DecimalType(18, 2)))
          * (lit(1) - col("l_discount").cast(DecimalType(18, 2))))
          .cast(DoubleType).as("revenue")
      )
      .orderBy(col("l_returnflag"))
  }

  val bloomFilteredJoinSql: String =
    """SELECT l_returnflag, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_totalprice > 250000
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** TF-IDF top terms per language: the classic postings shape — explode to
    * (doc, term), two partial-agg'd groupBys (per-doc tf, then per-language
    * totals and global document frequency), a shuffle join on term, and a
    * WindowGroupLimit top-5 per language. All aggregation is exact integer
    * arithmetic, and the one transcendental — ln(N/df) — is floored to
    * integer millis BEFORE it enters the score, because libm ln differs by
    * 1 ulp between the JVM and DuckDB (observed: …2253 vs …2251): scoring
    * and ranking stay in exact BIGINT arithmetic on both engines. (Flooring
    * shrinks the exposure to the case where a ulp disagreement straddles an
    * exact integer-milli boundary — vanishingly rare with a handful of
    * distinct df values, but a soft spot, not a proof; same caveat as bm25.)
    */
  def tfidfTopTerms(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DoubleType
    val d = docs(spark, sfDir)
    // corpus size rides a broadcast 1-row aggregate (like bm25's stats row)
    // instead of a driver-side count(): no eager job at construction time
    val nStats = d.agg(count(lit(1)).as("n"))
    val tf = d
      .select($"lang", $"doc_id", explode(TextAnalysis.tokens($"text")).as("term"))
      .groupBy($"doc_id", $"lang", $"term")
      .agg(count(lit(1)).as("tf"))
    // two-level rollup instead of two independent full-volume aggregates +
    // a term join (r17, guide §2.3/§2.4): the per-doc tf relation is the
    // op's largest (178.6 M rows at 700×) and used to be aggregated TWICE
    // (dfreq by term, totals by (lang, term)) then re-joined on term. A doc
    // has exactly one lang, so dfreq = Σ_lang count(docs of that lang with
    // the term): aggregate once to (term, lang) granularity, then roll the
    // tiny per-(term, lang) table up to terms — one pass over the big
    // relation, no join, value-identical (same oracle SQL).
    val byTermLang = tf
      .groupBy($"term", $"lang")
      .agg(sum($"tf").as("total_tf"), count(lit(1)).as("_nd"))
    val scored = byTermLang
      .groupBy($"term")
      .agg(sum($"_nd").as("dfreq"),
        collect_list(struct($"lang", $"total_tf")).as("_lt"))
      .select($"term", $"dfreq", explode($"_lt").as("_e"))
      .select($"term", $"dfreq", $"_e.lang".as("lang"), $"_e.total_tf".as("total_tf"))
    val w = Window.partitionBy($"lang").orderBy($"score".desc, $"term")
    scored
      .crossJoin(broadcast(nStats))
      .withColumn("idf_milli",
        floor(lit(1000.0) * log($"n".cast(DoubleType) / $"dfreq")).cast("long"))
      .withColumn("score", $"total_tf" * $"idf_milli")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"lang", $"rk".cast("long").as("rk"), $"term", $"total_tf", $"dfreq", $"score")
      .orderBy($"lang", $"rk")
  }

  val tfidfTopTermsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents
      |), tf AS (
      |  SELECT doc_id, lang, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3
      |), dfreq AS (
      |  SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY 1
      |), bylang AS (
      |  SELECT lang, term, CAST(SUM(tf) AS BIGINT) AS total_tf FROM tf GROUP BY 1, 2
      |), scored AS (
      |  SELECT lang, term, total_tf, dfreq,
      |    total_tf * CAST(floor(1000.0
      |      * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / dfreq)) AS BIGINT) AS score
      |  FROM bylang JOIN dfreq USING (term)
      |), ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rk
      |  FROM scored
      |)
      |SELECT lang, rk, term, total_tf, dfreq, score FROM ranked
      |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin

  // ------------------------------------------------- release-hygiene ops

  /** Benchmark decontamination: eval split = doc_id % 10 == 0, report every
    * eval doc whose 3-gram shingles appear in the train split.
    */
  def decontaminateEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Decontaminate.contaminationReport(
      docs(spark, sfDir), "doc_id", "text", col("doc_id") % 10 === 0)
      .orderBy($"contamination".desc, $"eval_doc")
  }

  val decontaminateEvalSql: String =
    Decontaminate.contaminationReportSql("doc % 10 = 0") +
      "\nORDER BY contamination DESC, eval_doc"

  /** The capped variant (maxDocFreq=5): boilerplate shingles present in >5
    * docs of a split are dropped from that split before the overlap join —
    * the skew guard a full-corpus train side needs, oracle-proven here.
    */
  def decontaminateEvalCapped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Decontaminate.contaminationReport(
      docs(spark, sfDir), "doc_id", "text", col("doc_id") % 10 === 0, maxDocFreq = 5L)
      .orderBy($"contamination".desc, $"eval_doc")
  }

  val decontaminateEvalCappedSql: String =
    Decontaminate.contaminationReportSql("doc % 10 = 0", maxDocFreq = 5L) +
      "\nORDER BY contamination DESC, eval_doc"

  /** Deterministic stratified sampling: md5-bucket Bernoulli at per-language
    * rates (en 25%, zh 75%, rest 50%) counted in one conditional-agg pass.
    */
  def sampleStratified(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rate = when($"lang" === "en", 25).when($"lang" === "zh", 75).otherwise(50)
    docs(spark, sfDir)
      .withColumn("_b", Sampling.md5Bucket($"doc_id", 100))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_total"),
        count(when($"_b" < rate, lit(1))).as("n_sampled")
      )
      .orderBy($"lang")
  }

  val sampleStratifiedSql: String = {
    val b = Sampling.md5BucketSql("doc_id", 100)
    s"""SELECT lang, COUNT(*) AS n_total,
       |  COUNT(CASE WHEN $b < (CASE WHEN lang = 'en' THEN 25 WHEN lang = 'zh' THEN 75 ELSE 50 END)
       |        THEN 1 END) AS n_sampled
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Deterministic 80/10/10 train/val/test assignment, counted per split and
    * language.
    */
  def splitAssignmentCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .withColumn("split", Sampling.splitAssignment($"doc_id", 80, 10))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"split", $"lang")
  }

  val splitAssignmentSql: String =
    s"""SELECT ${Sampling.splitAssignmentSql("doc_id", 80, 10)} AS split, lang,
       |  COUNT(*) AS n_docs
       |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  /** Token-window chunking (64-token windows, stride 48) rolled up per
    * language: chunk count, full-window count, mean chunk tokens.
    */
  def docChunkStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docs(spark, sfDir)
      .select($"lang", TextAnalysis.tokens($"text").as("_toks"))
      .select($"lang", explode(TextAnalysis.chunkLengths($"_toks", 64, 48)).as("clen"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when($"clen" === 64, lit(1))).as("full_chunks"),
        (sum($"clen").cast(org.apache.spark.sql.types.DoubleType) / count(lit(1))).as("avg_chunk_tokens")
      )
      .orderBy($"lang")
  }

  val docChunkStatsSql: String =
    s"""SELECT lang, COUNT(*) AS n_chunks,
       |  COUNT(CASE WHEN clen = 64 THEN 1 END) AS full_chunks,
       |  CAST(SUM(clen) AS DOUBLE) / COUNT(*) AS avg_chunk_tokens
       |FROM (SELECT lang, unnest(${TextAnalysis.chunkLengthsSql("text", 64, 48)}) AS clen
       |      FROM documents)
       |GROUP BY lang ORDER BY lang""".stripMargin

  // --------------------------------------------- repetition / scrub / BM25

  /** Gopher-style repetition quality signals, rolled up per language:
    * type-token ratio and top-bigram mass per document (both ppm-scaled
    * integers BEFORE the rollup, so the per-language averages are exact
    * integer sums divided once — no cross-engine double accumulation), plus
    * the count of docs whose single most-common bigram exceeds 5% of all
    * bigrams (the "repetitive doc" filter a training pipeline drops).
    *
    * Scale shape: MAP-ONLY per document. Top-bigram mass is a per-row
    * statistic, so it's computed as a pure array expression — sort the
    * bigram array, take the longest equal run ([[TextAnalysis.maxRunLength]],
    * O(n log n) per row inside codegen) — instead of exploding to a
    * (doc, bigram) stream and shuffling it through two groupBys. The ONLY
    * exchange in the plan is the final tiny per-language rollup (pinned in
    * OpsSpec).
    */
  def repetitionSignals(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, sfDir)
      .select($"doc_id", $"lang", TextAnalysis.tokens($"text").as("w"))
      .select($"doc_id", $"lang", $"w", TextAnalysis.bigrams($"w").as("bg"))
    d.select(
        $"lang",
        size($"w").as("n_words"),
        size(array_distinct($"w")).as("n_distinct"),
        TextAnalysis.maxRunLength(array_sort($"bg")).as("top_c"),
        size($"bg").as("total_c"))
      .withColumn("ttr_ppm",
        round(lit(1e6) * $"n_distinct" / $"n_words").cast("long"))
      .withColumn("topbg_ppm",
        when($"total_c" > 0, round(lit(1e6) * $"top_c" / $"total_c").cast("long"))
          .otherwise(lit(0L)))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        (sum($"ttr_ppm").cast(org.apache.spark.sql.types.DoubleType) / count(lit(1)))
          .as("avg_ttr_ppm"),
        (sum($"topbg_ppm").cast(org.apache.spark.sql.types.DoubleType) / count(lit(1)))
          .as("avg_topbg_ppm"),
        count(when($"topbg_ppm" >= 50000, lit(1))).as("n_repetitive"),
        max($"topbg_ppm").as("max_topbg_ppm"))
      .orderBy($"lang")
  }

  val repetitionSignalsSql: String =
    """WITH w AS (
      |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), per_doc AS (
      |  SELECT doc_id, lang, len(toks) AS n_words,
      |    len(list_distinct(toks)) AS n_distinct FROM w
      |), bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |    i -> toks[i] || ' ' || toks[i + 1])) AS bg
      |  FROM w WHERE len(toks) >= 2
      |), bgc AS (
      |  SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2
      |), top_bg AS (
      |  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS total_c FROM bgc GROUP BY 1
      |), scored AS (
      |  SELECT lang,
      |    CAST(round(1e6 * n_distinct / n_words) AS BIGINT) AS ttr_ppm,
      |    COALESCE(CAST(round(1e6 * top_c / total_c) AS BIGINT), 0) AS topbg_ppm
      |  FROM per_doc LEFT JOIN top_bg USING (doc_id)
      |)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(ttr_ppm) AS DOUBLE) / COUNT(*) AS avg_ttr_ppm,
      |  CAST(SUM(topbg_ppm) AS DOUBLE) / COUNT(*) AS avg_topbg_ppm,
      |  COUNT(CASE WHEN topbg_ppm >= 50000 THEN 1 END) AS n_repetitive,
      |  MAX(topbg_ppm) AS max_topbg_ppm
      |FROM scored GROUP BY lang ORDER BY lang""".stripMargin

  /** PII/secret scrub over the events props payload: redact numeric runs
    * (and emails — none in this corpus, proving the no-op path) and report,
    * per event type, how many tokens were redacted and how many distinct
    * redacted "shapes" remain. Map-only except the final small aggregate;
    * the regexes are RE2/Java-common so DuckDB replays them byte-identically.
    */
  def piiScrubEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    Queries.table(spark, sfDir, "events")
      .select(
        $"event_type",
        size(regexp_extract_all($"props", lit("[0-9]+"), lit(0))).as("n_nums"),
        size(regexp_extract_all($"props", lit(email), lit(0))).as("n_emails"),
        regexp_replace($"props", lit("[0-9]+"), lit("<NUM>")).as("shape"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"n_nums").as("n_redacted_nums"),
        sum($"n_emails").as("n_redacted_emails"),
        countDistinct($"shape").as("n_shapes"))
      .orderBy($"event_type")
  }

  val piiScrubEventsSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS n_redacted_nums,
      |  CAST(SUM(len(regexp_extract_all(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_redacted_emails,
      |  COUNT(DISTINCT regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS n_shapes
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** BM25 (k1=1.2, b=0.75) top-15 documents for a fixed 3-term query.
    * Determinism follows tfidf_top_terms: idf is floored to integer millis,
    * the rational tf-normalization (exact-input IEEE arithmetic, identical
    * expression tree on both engines) is rounded to integer micros, and the
    * final score is an exact BIGINT sum. One caveat (tiny, accepted): ln is
    * transcendental, and JVM Math.log vs DuckDB's libm are not guaranteed
    * identically rounded — a last-ulp disagreement EXACTLY at an integer
    * milli boundary could flip idf_milli by 1. With 3 query terms (3 idf
    * values) the exposure is negligible, but it is a soft spot, not a proof.
    *
    * Scale shape: one (doc, term) partial-agg shuffle over only the matching
    * terms, df is a 3-row broadcast, and corpus stats (n, avgdl) ride in ONE
    * broadcast 1-row aggregate — no driver-side count job, no extra scan
    * (mirrors the oracle's `stats` CTE; single-job shape pinned in OpsSpec).
    */
  def bm25TopDocs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.DoubleType
    val terms = Seq("dup", "spark", "vector")
    val d = docs(spark, sfDir)
      .select($"doc_id", TextAnalysis.tokens($"text").as("w"))
    val tf = d
      // filter INSIDE the array before exploding: the corpus token stream
      // never materializes as rows — only matching terms (~0-3 per doc vs
      // ~50) leave the codegen stage
      .select($"doc_id", size($"w").as("dl"),
        explode(filter($"w", t => t.isin(terms: _*))).as("term"))
      .groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("dfreq"))
    val stats = d.agg(
      (sum(size($"w")).cast(DoubleType) / count(lit(1))).as("avgdl"),
      count(lit(1)).as("n"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf_milli",
        floor(lit(1000.0) * log(
          lit(1.0) + ($"n".cast(DoubleType) - $"dfreq" + lit(0.5)) / ($"dfreq" + lit(0.5))))
          .cast("long"))
      .withColumn("tfnorm_micro",
        round(lit(1e6) * $"tf" * lit(2.2) /
          ($"tf" + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * $"dl" / $"avgdl")))
          .cast("long"))
      .groupBy($"doc_id")
      .agg(sum($"idf_milli" * $"tfnorm_micro").as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy($"score".desc, $"doc_id")
      .limit(15)
  }

  val bm25TopDocsSql: String =
    """WITH w AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), stats AS (
      |  SELECT CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avgdl, COUNT(*) AS n FROM w
      |), tf AS (
      |  SELECT doc_id, len(toks) AS dl, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, toks, unnest(toks) AS term FROM w)
      |  WHERE term IN ('dup', 'spark', 'vector')
      |  GROUP BY 1, 2, 3
      |), dfreq AS (
      |  SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY 1
      |), scored AS (
      |  SELECT doc_id,
      |    CAST(floor(1000.0 * ln(1.0 + (CAST(n AS DOUBLE) - dfreq + 0.5) / (dfreq + 0.5))) AS BIGINT) AS idf_milli,
      |    CAST(round(1e6 * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS BIGINT) AS tfnorm_micro
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
      |)
      |SELECT doc_id, CAST(SUM(idf_milli * tfnorm_micro) AS BIGINT) AS score, COUNT(*) AS n_terms
      |FROM scored GROUP BY doc_id
      |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin
}
