package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Deterministic sampling and split assignment for training corpora.
  *
  * `rand()`-based sampling is unusable in a 100-TB pipeline: re-running a
  * failed stage, backfilling a partition, or auditing a sample months later
  * must pick the SAME rows. The standard fix is a keyed hash bucket — here
  * the first 8 hex chars of md5(key) reduced mod `mod` — which is
  * reproducible across runs, engines (any system with md5 computes the same
  * bucket, which is what makes the DuckDB oracle exact), and data layouts.
  *
  * Shape at 100 TB: the bucket is a narrow map-only expression (md5 of a
  * short key string, no shuffle); sampling is a plain filter that pushes
  * into the scan's data filters, and split assignment is a groupBy over a
  * 3-value derived column — both partial-agg friendly.
  */
object Sampling {

  /** Uniform bucket in [0, mod) from md5(key): the first 8 hex chars are a
    * uniform 32-bit value for any non-degenerate key distribution.
    * Computed by the fused [[graft.functions.Md5PrefixLongExpr]] — one
    * digest call, no hex-string round trip — bit-identical to
    * `conv(substring(md5(key), 1, 8), 16, 10)` (asserted in HashExprSpec);
    * the DuckDB mirror below replays the hex formulation.
    */
  def md5Bucket(key: Column, mod: Int): Column = {
    require(mod > 0, s"mod must be positive, got $mod")
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.functions.Md5PrefixLongExpr(
      expression(key.cast(StringType).cast(BinaryType)), 8)) % mod
  }

  /** DuckDB mirror of [[md5Bucket]] for a BIGINT key column. */
  def md5BucketSql(keyCol: String, mod: Int): String =
    s"CAST('0x' || substr(md5(CAST($keyCol AS VARCHAR)), 1, 8) AS BIGINT) % $mod"

  /** Bernoulli sample at `pct`% (deterministic; 0 <= pct <= 100). */
  def sampled(key: Column, pct: Column): Column = md5Bucket(key, 100) < pct

  /** Train/val/test assignment: bucket < trainPct -> "train",
    * < trainPct+valPct -> "val", else "test".
    */
  def splitAssignment(key: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be <= 100")
    val b = md5Bucket(key, 100)
    when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test")
  }

  def splitAssignmentSql(keyCol: String, trainPct: Int, valPct: Int): String =
    s"""CASE WHEN ${md5BucketSql(keyCol, 100)} < $trainPct THEN 'train'
       |     WHEN ${md5BucketSql(keyCol, 100)} < ${trainPct + valPct} THEN 'val'
       |     ELSE 'test' END""".stripMargin

  /** Per-domain admission cap (the Gopher-style "at most `cap` documents per
    * domain" curation rule): within each `groupCol` group, keep the `cap`
    * highest-quality documents (ties -> lowest id) and report per-group
    * admission stats: (source, n_docs, total_tokens, n_kept, kept_tokens,
    * q_floor) where q_floor is the lowest quality that was admitted.
    *
    * Scale shape: group totals are a plain partial-aggregable groupBy that
    * never touches a window; only the kept side ranks, and because the
    * row_number is immediately filtered by `rk <= cap` Spark's
    * WindowGroupLimit rule inserts a map-side per-group top-`cap` limit
    * BEFORE the rank exchange — a hot domain with 10^8 docs ships at most
    * `cap` rows per map partition, not its whole posting list. The final
    * join is group-count-sized (tiny) on both sides.
    */
  def domainCapSample(docs: DataFrame, idCol: String, textCol: String, groupCol: String,
                      cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be at least 1, got $cap")
    // shared scoring projection; materialize once — it feeds both the
    // totals aggregate and the rank branch, and re-deriving it means
    // re-scanning + re-tokenizing (the expensive part at corpus scale)
    val scoredPlan = TextAnalysis.scoredDocs(docs, idCol, textCol, Seq(groupCol))
      .withColumnRenamed(groupCol, "source")
    val scored = scoredPlan.localCheckpoint(true, Dedup.ckptLevel(scoredPlan))
    val totals = scored
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
    val win = Window.partitionBy(col("source")).orderBy(col("quality").desc, col("doc"))
    val kept = scored
      .withColumn("rk", row_number().over(win))
      .filter(col("rk") <= cap)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("kept_tokens"),
        min(col("quality")).as("q_floor"))
    // cap >= 1 means every non-empty group keeps at least one doc, so the
    // inner join loses nothing
    totals.join(kept, Seq("source"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("n_kept"), col("kept_tokens"), col("q_floor"))
  }

  /** DuckDB mirror of [[domainCapSample]] over `documents`. */
  def domainCapSampleSql(cap: Int): String =
    s"""WITH scored AS (
       |  ${TextAnalysis.scoredDocsSql("source")}
       |), ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality DESC, doc) AS rk
       |  FROM scored
       |), tot AS (
       |  SELECT source, COUNT(*) AS n_docs, SUM(n_tokens) AS total_tokens
       |  FROM scored GROUP BY source
       |), keptagg AS (
       |  SELECT source, COUNT(*) AS n_kept, SUM(n_tokens) AS kept_tokens,
       |    MIN(quality) AS q_floor
       |  FROM ranked WHERE rk <= $cap GROUP BY source
       |)
       |SELECT t.source, t.n_docs, CAST(t.total_tokens AS BIGINT) AS total_tokens,
       |  k.n_kept, CAST(k.kept_tokens AS BIGINT) AS kept_tokens, k.q_floor
       |FROM tot t JOIN keptagg k USING (source)
       |ORDER BY t.source""".stripMargin

  // ------------------------------------------------------- mixture resample

  /** MATERIALIZE the domain-mixture reweighting whose weights
    * `mixture_weights` only reports: every source is deterministically
    * resampled toward the equal-token-mass target total/k. The per-doc
    * expected copy count is weight_milli/1000; each doc receives
    * floor(w/1000) whole copies plus one more iff its md5 bucket (mod 1000)
    * falls below the fractional remainder — integer arithmetic end to end
    * (the engine and the oracle agree exactly), stochastic-rounding-shaped
    * so every source's expected output token mass equals the target, and
    * keyed like [[md5Bucket]] so a re-run, a backfill, or an audit months
    * later reproduces the same corpus.
    *
    * Shape at 100 TB: per-source totals are a partial agg over a handful of
    * groups; the weight row rides a broadcast hash join back onto the doc
    * stream; the copy fan-out is MAP-SIDE with per-row multiplicity bounded
    * by ceil(max weight); the closing per-source aggregate is the only
    * data-sized shuffle. (A real materialization would write the exploded
    * docs; the registered row aggregates them so the oracle stays compact.)
    */
  def mixtureResample(docs: DataFrame, idCol: String, textCol: String,
                      srcCol: String): DataFrame = {
    val scored = docs.select(
      col(srcCol).as("source"), col(idCol).as("doc"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val per = scored.groupBy(col("source")).agg(sum(col("n_tokens")).as("tokens"))
    val tot = per.agg(sum(col("tokens")).as("total"), count(lit(1)).as("k"))
    val w = per.join(broadcast(tot))
      .select(
        col("source"),
        round(lit(1000.0) * col("total") / (col("k") * col("tokens")))
          .cast("long").as("wm"),
        // floor, not cast: DuckDB CAST(DOUBLE AS BIGINT) rounds half-even
        // while Spark's cast truncates — floor() agrees in both engines
        floor(col("total").cast("double") / col("k")).cast("long").as("target_tokens"))
    val expanded = scored
      .join(broadcast(w), Seq("source"))
      .withColumn("copies",
        floor(col("wm").cast("double") / 1000.0).cast("long") +
          when(md5Bucket(col("doc"), 1000) < col("wm") % 1000, 1L).otherwise(0L))
      .withColumn("_c",
        explode(when(col("copies") > 0, sequence(lit(0L), col("copies") - 1))
          .otherwise(array().cast("array<long>"))))
    expanded.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs_out"),
        sum(col("n_tokens")).as("tokens_out"),
        max(col("target_tokens")).as("target_tokens"))
      .withColumn("achieved_ppm",
        round(lit(1e6) * col("tokens_out") / col("target_tokens")).cast("long"))
      .orderBy(col("source"))
  }

  /** DuckDB mirror of [[mixtureResample]]: same weight formula as
    * `mixture_weights`, same md5-bucket stochastic rounding, `unnest(range)`
    * as the copy explode (an empty range drops the row, like Spark's
    * explode of an empty array).
    */
  def mixtureResampleSql: String =
    s"""WITH scored AS (
       |  SELECT source, doc_id AS doc,
       |    CAST(${TextAnalysis.tokenCountSql("text")} AS BIGINT) AS n_tokens
       |  FROM documents
       |), per AS (
       |  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tokens FROM scored GROUP BY 1
       |), tot AS (
       |  SELECT CAST(SUM(tokens) AS BIGINT) AS total, COUNT(*) AS k FROM per
       |), w AS (
       |  SELECT source, CAST(ROUND(1000.0 * total / (k * tokens)) AS BIGINT) AS wm,
       |    CAST(FLOOR(1.0 * total / k) AS BIGINT) AS target_tokens
       |  FROM per, tot
       |), expanded AS (
       |  SELECT s.source, s.n_tokens, w.target_tokens,
       |    (w.wm // 1000) +
       |      CASE WHEN ${md5BucketSql("s.doc", 1000)} < (w.wm % 1000) THEN 1 ELSE 0 END AS copies
       |  FROM scored s JOIN w USING (source)
       |), blown AS (
       |  SELECT source, n_tokens, target_tokens, unnest(range(copies)) AS c FROM expanded
       |)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_out,
       |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_out,
       |  MAX(target_tokens) AS target_tokens,
       |  CAST(ROUND(1e6 * CAST(SUM(n_tokens) AS BIGINT) / MAX(target_tokens)) AS BIGINT) AS achieved_ppm
       |FROM blown GROUP BY source ORDER BY source""".stripMargin
}
