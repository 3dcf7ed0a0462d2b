package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Benchmark decontamination: find eval-set documents whose word-3-gram
  * shingles also appear in the training split. A training-data pipeline runs
  * this before every release — eval answers leaking into the train corpus
  * invalidate the benchmark.
  *
  * Shape at 100 TB: both sides reduce to (doc, shingle) postings — the same
  * unit as [[Dedup.shinglePostings]], with the same rationale (shingle
  * document-frequency stays low where unigram DF explodes) — and the overlap
  * is ONE equality join on the shingle followed by a partial-agg'd
  * count-distinct. No cross product, no broadcast of the big side; the
  * optional `maxDocFreq` cap drops boilerplate shingles, which is the skew
  * guard when train is the full corpus.
  */
object Decontaminate {

  /** Per eval doc: distinct train docs sharing a shingle, distinct leaked
    * shingles, and the leaked fraction of the eval doc's shingle set.
    * Eval docs with zero overlap are absent (inner join) — at corpus scale
    * the report is the exception list, not the full eval roster.
    */
  def contaminationReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isEval: Column,
      maxDocFreq: Long = 0L
  ): DataFrame = {
    val evalPosts =
      Dedup.shinglePostings(docs.filter(isEval), idCol, textCol, maxDocFreq)
    val trainPosts =
      Dedup.shinglePostings(docs.filter(!isEval), idCol, textCol, maxDocFreq)
    val evalSizes = evalPosts.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    evalPosts
      .as("e")
      .join(trainPosts.as("t"), col("e.w") === col("t.w"))
      .groupBy(col("e.doc").as("eval_doc"))
      .agg(
        countDistinct(col("t.doc")).as("n_train_docs"),
        countDistinct(col("e.w")).as("leaked_ngrams")
      )
      .join(evalSizes.withColumnRenamed("doc", "eval_doc"), "eval_doc")
      .withColumn("contamination", col("leaked_ngrams").cast(DoubleType) / col("sz"))
      .select("eval_doc", "n_train_docs", "leaked_ngrams", "contamination")
  }

  /** DuckDB mirror of [[contaminationReport]] over `documents` with
    * `evalPredSql` selecting the eval split (same 3-gram construction as
    * [[Dedup.ngramJaccardPairsSql]]). `maxDocFreq` mirrors the Scala cap,
    * including its per-split document-frequency definition (each split
    * drops ITS OWN boilerplate shingles).
    */
  def contaminationReportSql(evalPredSql: String, maxDocFreq: Long = 0L): String = {
    def capped(src: String): String =
      if (maxDocFreq <= 0) s"SELECT * FROM $src"
      else
        s"""SELECT * FROM $src WHERE w NOT IN (
           |    SELECT w FROM $src GROUP BY w HAVING COUNT(*) > $maxDocFreq)""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
       |), posts AS (
       |  SELECT DISTINCT doc_id AS doc,
       |    unnest(CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
       |           ELSE list_transform(range(1, len(l) - 1), i -> array_to_string(l[i:i+2], ' '))
       |           END) AS w
       |  FROM toks
       |), ev0 AS (
       |  SELECT * FROM posts WHERE $evalPredSql
       |), tr0 AS (
       |  SELECT * FROM posts WHERE NOT ($evalPredSql)
       |), ev AS (
       |  ${capped("ev0")}
       |), tr AS (
       |  ${capped("tr0")}
       |), sizes AS (
       |  SELECT doc, COUNT(*) AS sz FROM ev GROUP BY doc
       |), hit AS (
       |  SELECT e.doc AS eval_doc,
       |         COUNT(DISTINCT t.doc) AS n_train_docs,
       |         COUNT(DISTINCT e.w) AS leaked_ngrams
       |  FROM ev e JOIN tr t ON e.w = t.w GROUP BY 1
       |)
       |SELECT eval_doc, n_train_docs, leaked_ngrams,
       |       CAST(leaked_ngrams AS DOUBLE) / sz AS contamination
       |FROM hit JOIN sizes ON eval_doc = sizes.doc""".stripMargin
  }
}
