package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
  * distribution matches a TARGET domain, by importance weights between two
  * bag-of-hashed-ngrams unigram models.
  *
  * The published recipe, restated Spark-first:
  *   1. featurize every document as unigrams + adjacent bigrams, hashed into
  *      `m` buckets (feature hashing makes the model size independent of
  *      vocabulary — the paper uses 10^4 buckets for The Pile);
  *   2. fit add-1-smoothed bucket models p_target and p_raw from bucket
  *      counts;
  *   3. per document, log importance weight = Σ_features
  *      (ln p_target(bucket) − ln p_raw(bucket));
  *   4. resample without replacement via the Gumbel top-k trick:
  *      key_i = log w_i + g_i with g_i standard Gumbel noise; take top-k.
  *
  * Determinism at 100 TB (what `rand()` Gumbel noise cannot give a
  * re-runnable pipeline): the per-feature log-ratio is quantized to integer
  * MICRO-nats BEFORE the per-doc sum — the aggregate is an integer sum,
  * stable under any partitioning — and the Gumbel noise is keyed off
  * md5(doc) ([[Sampling.md5Bucket]]), so a re-run, a backfill, or the DuckDB
  * oracle reproduces the identical selection.
  *
  * Plan shape at 100 TB: one O(features) explode feeds a groupBy over at
  * most `m` buckets (map-side combined, output bounded by `m` regardless of
  * corpus size); the two models collapse into ONE broadcast delta table of
  * ≤ m rows (their totals ride the allowlisted 1-row scalar-agg broadcast);
  * the second featurize pass joins that broadcast map-side and shuffles only
  * (doc, n_feats, Σdelta) rows on doc; the final top-k is a TakeOrdered —
  * per-partition partial top-k, k rows to the driver. Nothing anywhere is
  * sized by the vocabulary or the corpus except the two O(features) passes.
  */
object Dsir {

  /** Unigrams + adjacent bigrams, with multiplicity, from a MATERIALIZED
    * token-array column — the paper's hashed n-gram featurization (n ≤ 2).
    * Two-phase on purpose (same trap as `Dedup.shinglePostings`): a lambda
    * referencing `tokens(text)` directly re-runs the regex split PER ARRAY
    * ELEMENT (no CSE through higher-order functions), turning featurization
    * O(tokens²) per document — measured as ~5× the whole operator's cost at
    * 3.5 M docs before the split was materialized.
    */
  def features(toks: Column): Column =
    concat(toks, TextAnalysis.bigrams(toks))

  /** Per-document DSIR importance weights and the Gumbel-resampled top-`k`
    * selection: (doc, n_feats, lw_sum_micro, key_micro), ordered by the
    * resampling key. `targetPred` marks the target-domain rows INSIDE the
    * same corpus scan (the paper's target corpus is separate; a predicate
    * keeps the fixture self-contained and the shape identical — swap the
    * flag for a second scan + union when the target lives elsewhere).
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 targetPred: Column, m: Int, k: Int,
                 fastHash: Boolean = false): DataFrame = {
    require(m > 0 && k > 0, s"m and k must be positive, got m=$m k=$k")
    // Feature bucketing is the hot loop: O(features) hash calls, twice.
    // md5 keeps the DuckDB oracle exact at fixture scale; at corpus scale
    // `fastHash` switches the bucket to codegen'd xxhash64 — measured at
    // 3.5 M docs (~1 B bucket calls): md5+hex-parse 91 s vs xxhash64 42 s,
    // the same md5-for-oracle / xxhash-for-scale dispatch the MinHash ops
    // use. Both hashes are uniform, so model quality is unchanged; only
    // bucket assignment differs. The Gumbel tie-break stays md5-keyed (one
    // call per DOC).
    val bucket =
      if (fastHash) pmod(xxhash64(col("f")), lit(m.toLong))
      else Sampling.md5Bucket(col("f"), m)
    val feats = docs
      .select(col(idCol).as("doc"), targetPred.as("is_target"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc"), col("is_target"), explode(features(col("toks"))).as("f"))
      .select(col("doc"), col("is_target"), bucket.as("b"))
    val counts = feats.groupBy(col("b")).agg(
      count(lit(1)).as("c_raw"),
      count(when(col("is_target"), lit(1))).as("c_tgt"))
    val tot = counts.agg(sum(col("c_raw")).as("n_raw"), sum(col("c_tgt")).as("n_tgt"))
    val delta = counts.crossJoin(broadcast(tot)).select(
      col("b"),
      round(lit(1e6) * (
        log((col("c_tgt") + lit(1)).cast(DoubleType) / (col("n_tgt") + lit(m))) -
        log((col("c_raw") + lit(1)).cast(DoubleType) / (col("n_raw") + lit(m)))))
        .cast("long").as("delta_micro"))
    val perDoc = feats
      .join(broadcast(delta), Seq("b"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_feats"), sum(col("delta_micro")).as("lw_sum_micro"))
    perDoc
      .withColumn("key_micro", col("lw_sum_micro") + gumbelMicro(col("doc")))
      .select(col("doc"), col("n_feats"), col("lw_sum_micro"), col("key_micro"))
      .orderBy(col("key_micro").desc, col("doc"))
      .limit(k)
  }

  /** Standard Gumbel noise in integer micro-nats, keyed off md5(doc):
    * u = (md5Bucket(doc, 10^6) + 0.5) / 10^6 ∈ (0, 1), g = −ln(−ln u).
    */
  private def gumbelMicro(doc: Column): Column =
    round(lit(1e6) * -log(-log(
      (Sampling.md5Bucket(doc, 1000000).cast(DoubleType) + lit(0.5)) / lit(1e6))))
      .cast("long")

  /** DuckDB mirror of [[dsirSelect]] over `documents` with target predicate
    * `lang = 'en'`: same featurization, same md5 bucketing, same micro-nat
    * quantization before the integer per-doc sum, same md5-keyed Gumbel key.
    */
  def dsirSelectSql(m: Int, k: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id AS doc, (lang = 'en') AS is_target,
       |    string_split_regex(trim(text), '\\s+') AS l
       |  FROM documents
       |), feats AS (
       |  SELECT doc, is_target,
       |    unnest(list_concat(l,
       |      CASE WHEN len(l) < 2 THEN CAST([] AS VARCHAR[])
       |      ELSE list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1])
       |      END)) AS f
       |  FROM toks
       |), bux AS (
       |  SELECT doc, is_target,
       |    CAST('0x' || substr(md5(f), 1, 8) AS BIGINT) % $m AS b
       |  FROM feats
       |), counts AS (
       |  SELECT b, COUNT(*) AS c_raw,
       |    COUNT(*) FILTER (WHERE is_target) AS c_tgt
       |  FROM bux GROUP BY 1
       |), tot AS (
       |  SELECT SUM(c_raw) AS n_raw, SUM(c_tgt) AS n_tgt FROM counts
       |), delta AS (
       |  SELECT b,
       |    CAST(round(1e6 * (ln((c_tgt + 1.0) / (n_tgt + $m))
       |                    - ln((c_raw + 1.0) / (n_raw + $m)))) AS BIGINT) AS delta_micro
       |  FROM counts, tot
       |), perdoc AS (
       |  SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_feats,
       |    CAST(SUM(delta_micro) AS BIGINT) AS lw_sum_micro
       |  FROM bux JOIN delta USING (b) GROUP BY 1
       |)
       |SELECT doc, n_feats, lw_sum_micro,
       |  CAST(lw_sum_micro + round(1e6 * -ln(-ln(
       |    (CAST('0x' || substr(md5(CAST(doc AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 + 0.5)
       |    / 1e6))) AS BIGINT) AS key_micro
       |FROM perdoc
       |ORDER BY key_micro DESC, doc LIMIT $k""".stripMargin
}
