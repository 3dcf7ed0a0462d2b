package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring duplication signal: which token spans of length `k`
  * appear verbatim in more than one document, and how much of each document
  * they cover. The per-doc duplicated-token mass is the standard "exact
  * substring dedup" signal for training corpora (suffix-array dedup's
  * fixed-length approximation): a document whose tokens are largely covered
  * by cross-document spans is boilerplate or a partial copy even when its
  * full-document Jaccard stays below the near-dup threshold.
  *
  * Scale shape (100 TB): span explosion is O(corpus tokens); the
  * document-frequency aggregate is a two-level hash aggregate on an 8-byte
  * span key; marking duplicated positions is a semi join postings→hot-spans
  * (each posting matches at most one span row — no O(df²) pair fanout, so
  * unlike the Jaccard self-join this needs no df cap); coverage is a
  * per-document window. Nothing quadratic anywhere.
  */
object Spans {

  /** (doc, pos, w) for every k-token span start position; `w` is the
    * xxhash64 of the span string — spans are only ever compared for
    * equality and never emitted, so the 8-byte key replaces the ~8-word
    * string on every shuffle (same collision caveat as
    * [[Dedup.shinglePostings]]: ~n²/2⁶⁵, vanishing; the DuckDB oracle keeps
    * string spans and stays value-identical at oracle SFs). Documents
    * shorter than `k` tokens contribute one whole-text span at pos 1.
    */
  def spanPostings(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, "span length must be at least 2 tokens")
    // two-phase (materialize tokens, then slice) — see Dedup.shinglePostings
    // for why lambdas over tokens(text) go quadratic otherwise
    docs
      .select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("_toks"))
      // NULL text tokenizes to a NULL array; drop it here to match the
      // oracle's unnest-over-NULL-list (zero rows) instead of letting the
      // short-doc branch hash the swallowed NULL into xxhash64("")
      .filter(col("_toks").isNotNull)
      .select(
        col("doc"),
        size(col("_toks")).cast("long").as("n_tokens"),
        posexplode(
          when(size(col("_toks")) < k, array(xxhash64(concat_ws(" ", col("_toks")))))
            .otherwise(transform(
              sequence(lit(1), size(col("_toks")) - (k - 1)),
              i => xxhash64(concat_ws(" ", slice(col("_toks"), i, lit(k))))))
        ).as(Seq("off", "w")))
      .select(col("doc"), col("n_tokens"), (col("off") + 1).cast("long").as("pos"), col("w"))
  }

  /** Per-document duplicated-token coverage: (doc, n_tokens, dup_tokens,
    * dup_ratio_milli) for documents with at least one span shared with
    * ANOTHER document (within-doc repeats alone don't count). Coverage is
    * the union length of the duplicated [pos, pos+k) intervals, computed
    * with a per-doc lead window over duplicated start positions.
    */
  def dupSpanCoverage(docs: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame = {
    val postsPlan = spanPostings(docs, idCol, textCol, k)
    // the postings feed both the df aggregate and the position rejoin —
    // materialize once (tokenization + hashing is the expensive part)
    val posts = postsPlan.localCheckpoint(true, Dedup.ckptLevel(postsPlan))
    val hot = posts
      .groupBy(col("w"))
      .agg(count_distinct(col("doc")).as("df"))
      .filter(col("df") >= 2)
      .select("w")
    val dupPos = posts.join(hot, Seq("w"), "left_semi")
    val win = Window.partitionBy(col("doc")).orderBy(col("pos"))
    dupPos
      .withColumn("nxt", lead(col("pos"), 1).over(win))
      // a span covers k tokens, clipped by the doc end (whole-short-doc
      // spans) and by the next duplicated span's start (interval union)
      .withColumn("cov",
        least(
          least(lit(k.toLong), col("n_tokens") - col("pos") + 1L),
          coalesce(col("nxt") - col("pos"), lit(k.toLong))))
      .groupBy(col("doc"), col("n_tokens"))
      .agg(sum(col("cov")).as("dup_tokens"))
      .withColumn("dup_ratio_milli",
        round(lit(1000.0) * col("dup_tokens") / col("n_tokens")).cast("long"))
      .select(col("doc"), col("n_tokens"), col("dup_tokens"), col("dup_ratio_milli"))
  }

  /** DuckDB mirror of [[dupSpanCoverage]] (string spans, global windows —
    * oracle-scale formulation).
    */
  def dupSpanCoverageSql(k: Int = 8): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
       |), spans AS (
       |  SELECT doc_id AS doc, CAST(len(l) AS BIGINT) AS n_tokens, CAST(i AS BIGINT) AS pos,
       |    CASE WHEN len(l) < $k THEN array_to_string(l, ' ')
       |         ELSE array_to_string(l[i:i+${k - 1}], ' ') END AS s
       |  FROM toks, unnest(CASE WHEN len(l) < $k THEN [1]
       |                         ELSE range(1, len(l) - ${k - 2}) END) AS u(i)
       |), hot AS (
       |  SELECT s FROM spans GROUP BY s HAVING COUNT(DISTINCT doc) >= 2
       |), dpos AS (
       |  SELECT doc, n_tokens, pos FROM spans JOIN hot USING (s)
       |), cov AS (
       |  SELECT doc, n_tokens, pos,
       |    LEAST(LEAST($k, n_tokens - pos + 1),
       |          COALESCE(LEAD(pos) OVER (PARTITION BY doc ORDER BY pos) - pos, $k)) AS cov
       |  FROM dpos
       |)
       |SELECT doc, n_tokens, CAST(SUM(cov) AS BIGINT) AS dup_tokens,
       |  CAST(ROUND(1000.0 * SUM(cov) / n_tokens) AS BIGINT) AS dup_ratio_milli
       |FROM cov GROUP BY doc, n_tokens""".stripMargin
}
