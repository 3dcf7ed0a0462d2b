package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global-running-sum machinery for training pipelines: sequence packing
  * ("concat and chunk" at a fixed token budget) and token-budget curation
  * (keep best-first until a global budget). Both need the EXCLUSIVE running
  * sum of a value column in a deterministic global order — the textbook
  * anti-scale plan is a global `ORDER BY` window (one task over the whole
  * corpus), so [[withRunningOffset]] computes it as a DISTRIBUTED prefix
  * sum instead: range-partition by the order key, local cumulative sums
  * inside each partition (window PARTITIONED by partition id — parallel),
  * then the numParts per-partition totals are window-scanned into absolute
  * offsets and broadcast-joined back. Nothing bigger than numParts rows
  * leaves the executors, so the shape holds at 100 TB with numParts sized
  * to the data.
  */
object Packing {

  /** Appends `start` = exclusive global running sum of `valueCol` in
    * `orderCols` order (which must be a total order — include a unique
    * tiebreaker). The input must already carry `valueCol` as a LongType
    * column named by `valueCol`, and must not use the reserved working
    * names `pid`/`cum`/`off`/`start` (enforced — a silent overwrite or an
    * ambiguous join reference would corrupt caller data otherwise).
    *
    * AQE partition coalescing keeps adjacent range partitions adjacent, so
    * (pid, orderCols) ordering — and therefore every global offset — is
    * invariant to the actual partition count the runtime picks.
    */
  def withRunningOffset(df: DataFrame, orderCols: Seq[Column], valueCol: String,
                        numParts: Int): DataFrame = {
    val reserved = Seq("pid", "cum", "off", "start").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"withRunningOffset reserves column names pid/cum/off/start; input carries: ${reserved.mkString(", ")}")
    val parts = df
      .repartitionByRange(numParts, orderCols: _*)
      .withColumn("pid", spark_partition_id())
    // checkpoint the windowed result: it feeds both the totals aggregate and
    // the final join, and re-deriving it means re-scanning + re-deriving the
    // inputs (tokenization — the expensive part at corpus scale).
    // ROWS frame, not the default RANGE frame: under RANGE, rows tied on the
    // order key are all-peers-inclusive and would get identical (wrong)
    // offsets; ROWS matches the oracle's running-sum semantics
    val localPlan = parts.withColumn(
      "cum", sum(col(valueCol)).over(
        Window.partitionBy(col("pid")).orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val local = localPlan.localCheckpoint(true, Dedup.ckptLevel(localPlan))
    // numParts rows: absolute start offset of each partition via an exclusive
    // running sum. This Window.orderBy without partitionBy is what emits
    // Spark's "WindowExec: No Partition Defined ... can cause serious
    // performance degradation" warning on every run — audited benign: the
    // single-partition window sees exactly numParts rows (one per range
    // partition), never data rows. Don't re-audit; don't "fix" it by
    // partitioning, which would break the global offset scan.
    val offsets = local
      .groupBy(col("pid")).agg(sum(col(valueCol)).as("tot"))
      .withColumn(
        "off",
        coalesce(
          sum(col("tot")).over(
            Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("pid"), col("off"))
    local
      .join(broadcast(offsets), "pid")
      .withColumn("start", col("off") + col("cum") - col(valueCol))
      .drop("pid", "cum", "off")
  }

  /** Per-document bin assignment: (doc, n_tokens, bin). Each document is
    * assigned to the bin its FIRST token lands in, so the assignment is a
    * pure function of the document's global token offset — independent of
    * how the corpus happens to be partitioned.
    */
  def packedBins(docs: DataFrame, idCol: String, textCol: String, budgetTokens: Int,
                 numParts: Int = 32): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val toks = docs.select(
      col(idCol).as("doc"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    withRunningOffset(toks, Seq(col("doc")), "n_tokens", numParts)
      .withColumn("bin", floor(col("start") / lit(budgetTokens.toDouble)).cast("long"))
      .select(col("doc"), col("n_tokens"), col("bin"))
  }

  /** DuckDB mirror of [[packedBins]]: the straightforward global-window
    * formulation (fine at oracle scale; the engine's distributed prefix sum
    * is the one that has to scale).
    */
  def packedBinsSql(budgetTokens: Int): String =
    s"""SELECT doc_id AS doc, ${TextAnalysis.tokenCountSql("text")} AS n_tokens,
       |  CAST(FLOOR(COALESCE(SUM(${TextAnalysis.tokenCountSql("text")})
       |      OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    / ${budgetTokens.toDouble}) AS BIGINT) AS bin
       |FROM documents""".stripMargin

  /** Curriculum binning: split the corpus into `nBins` equal-population
    * quality tiers (bin 0 = best) in (quality desc, id) order — the
    * curriculum/annealing schedule step of a training pipeline. The global
    * rank is the same distributed prefix sum as packing (running count of
    * ones), NOT a global `ORDER BY` window; the corpus size rides a
    * broadcast 1-row aggregate. Returns one row per bin:
    * (bin, n_docs, tokens, q_min, q_max).
    */
  def qualityCurriculum(docs: DataFrame, idCol: String, textCol: String,
                        nBins: Int = 10, numParts: Int = 32): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val scored = TextAnalysis.scoredDocs(docs, idCol, textCol).withColumn("one", lit(1L))
    val ranked = withRunningOffset(scored, Seq(col("quality").desc, col("doc")), "one", numParts)
    val tot = ranked.agg(count(lit(1)).as("n_total"))
    ranked
      .join(broadcast(tot))
      // exact-integer bin boundary: both engines evaluate the same IEEE
      // double division, and rank*nBins stays far under 2^53
      .withColumn("bin", floor(col("start") * nBins / col("n_total")).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"),
        min(col("quality")).as("q_min"), max(col("quality")).as("q_max"))
      .select(col("bin"), col("n_docs"), col("tokens"), col("q_min"), col("q_max"))
  }

  /** DuckDB mirror of [[qualityCurriculum]] (global row_number — the
    * oracle-scale formulation of the distributed rank).
    */
  def qualityCurriculumSql(nBins: Int = 10): String =
    s"""WITH scored AS (
       |  ${TextAnalysis.scoredDocsSql()}
       |), ranked AS (
       |  SELECT doc, n_tokens, quality,
       |    ROW_NUMBER() OVER (ORDER BY quality DESC, doc) - 1 AS rk,
       |    COUNT(*) OVER () AS n_total
       |  FROM scored
       |)
       |SELECT CAST(FLOOR(rk * $nBins / n_total) AS BIGINT) AS bin, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS tokens,
       |  MIN(quality) AS q_min, MAX(quality) AS q_max
       |FROM ranked GROUP BY bin ORDER BY bin""".stripMargin

  /** Token-budget curation: greedily keep the highest-quality documents
    * (ties → lowest id) until the corpus reaches `budgetTokens` — the "best
    * data under a fixed training budget" selection step. A doc is kept iff
    * its exclusive running token offset in (quality desc, id) order is
    * below the budget, so the LAST kept doc may overrun the budget (greedy
    * semantics, deterministic). Returns (doc, n_tokens, quality) of the
    * kept docs.
    */
  def tokenBudgetSample(docs: DataFrame, idCol: String, textCol: String,
                        budgetTokens: Long, numParts: Int = 32): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val scored = TextAnalysis.scoredDocs(docs, idCol, textCol)
    withRunningOffset(scored, Seq(col("quality").desc, col("doc")), "n_tokens", numParts)
      .filter(col("start") < budgetTokens)
      .select(col("doc"), col("n_tokens"), col("quality"))
  }
}
