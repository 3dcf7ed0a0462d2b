package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: concatenate the corpus in
  * deterministic id order and split it at fixed token budgets ("concat and
  * chunk"). Each document is assigned to the bin its FIRST token lands in,
  * so the assignment is a pure function of the document's global token
  * offset — independent of how the corpus happens to be partitioned.
  *
  * The global running offset is a DISTRIBUTED prefix sum, not a global
  * `ORDER BY` window (which Spark executes as one task over the whole
  * corpus): range-partition by id, local cumulative sums inside each
  * partition (window PARTITIONED by partition id — parallel), then the
  * numParts per-partition totals are window-scanned into absolute offsets
  * and broadcast-joined back. Nothing bigger than numParts rows leaves the
  * executors, so the shape holds at 100 TB with numParts sized to the data.
  */
object Packing {

  /** Per-document bin assignment: (doc, n_tokens, bin).
    *
    * AQE partition coalescing keeps adjacent range partitions adjacent, so
    * (pid, doc) ordering — and therefore every global offset — is invariant
    * to the actual partition count the runtime picks.
    */
  def packedBins(docs: DataFrame, idCol: String, textCol: String, budgetTokens: Int,
                 numParts: Int = 32): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val toks = docs.select(
      col(idCol).as("doc"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val parts = toks
      .repartitionByRange(numParts, col("doc"))
      .withColumn("pid", spark_partition_id())
    // checkpoint the windowed result: it feeds both the totals aggregate and
    // the final join, and re-deriving it means re-scanning + re-tokenizing
    // the raw text (the expensive part at corpus scale); rows are 4 longs
    // ROWS frame, not the default RANGE frame: under RANGE, rows tied on
    // `doc` are all-peers-inclusive and would get identical (wrong) offsets
    // if ids ever repeat; ROWS matches the oracle's running-sum semantics
    val localPlan = parts.withColumn(
      "cum", sum(col("n_tokens")).over(
        Window.partitionBy(col("pid")).orderBy(col("doc"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val local = localPlan.localCheckpoint(true, Dedup.ckptLevel(localPlan))
    // numParts rows: absolute start offset of each partition via an exclusive
    // running sum (the single-partition window is over numParts rows only)
    val offsets = local
      .groupBy(col("pid")).agg(sum(col("n_tokens")).as("tot"))
      .withColumn(
        "off",
        coalesce(
          sum(col("tot")).over(
            Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("pid"), col("off"))
    local
      .join(broadcast(offsets), "pid")
      .withColumn("start", col("off") + col("cum") - col("n_tokens"))
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
}
