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

  /** Start positions of spans shared with ANOTHER document: (doc, n_tokens,
    * pos). The shared front half of [[dupSpanCoverage]] and
    * [[removeDupSpans]]: postings once (checkpointed — tokenization +
    * hashing is the expensive part), document-frequency aggregate on the
    * 8-byte span key, semi join back (each posting matches at most one span
    * row — no pair fanout).
    */
  private def dupStartPositions(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val postsPlan = spanPostings(docs, idCol, textCol, k)
    val posts = postsPlan.localCheckpoint(true, Dedup.ckptLevel(postsPlan))
    val hot = posts
      .groupBy(col("w"))
      .agg(count_distinct(col("doc")).as("df"))
      .filter(col("df") >= 2)
      .select("w")
    posts.join(hot, Seq("w"), "left_semi")
  }

  /** Per-document duplicated-token coverage: (doc, n_tokens, dup_tokens,
    * dup_ratio_milli) for documents with at least one span shared with
    * ANOTHER document (within-doc repeats alone don't count). Coverage is
    * the union length of the duplicated [pos, pos+k) intervals, computed
    * with a per-doc lead window over duplicated start positions.
    */
  def dupSpanCoverage(docs: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame = {
    val dupPos = dupStartPositions(docs, idCol, textCol, k)
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

  /** Exact-substring dedup REWRITE — the missing half of span coverage:
    * splice cross-document duplicated runs OUT of each document and emit the
    * cleaned token stream (the fixed-length-span equivalent of the
    * suffix-array dedup rewrite every training-corpus pipeline runs).
    *
    * A duplicated span start `p` covers tokens [p, min(p+k-1, n)]. Covered
    * intervals are unioned per document — overlapping OR contiguous
    * intervals merge into one run (contiguous duplicated text is one run to
    * a suffix-array, regardless of how the fixed-k spans tile it) — and
    * only runs of at least `minRunTokens` tokens are removed (short
    * incidental matches are kept, mirroring the min-match-length knob of
    * suffix-array dedup). Output: one row per REWRITTEN document
    * (doc, n_tokens, removed_tokens, clean_md5); untouched documents are
    * not emitted (at 100 TB the rewritten minority is the interesting
    * output — union the untouched majority back in by anti join when
    * materializing a corpus).
    *
    * Scale shape: dup starts are O(tokens); the interval union is a per-doc
    * window over dup starts (gaps-and-islands with a running-max-end, so
    * nested spans can't split a run); runs per doc ≤ n/(k+1) DISJOINT
    * intervals; the rebuild is one equality join docs↔runs (inner — only
    * rewritten docs) plus a per-row lambda that is O(tokens × runs) worst
    * case and O(tokens) when duplication is dense (merged runs). Nothing
    * quadratic in the corpus anywhere; a rewrite op must touch every byte
    * of the affected docs by definition.
    */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, minRunTokens: Int = 12): DataFrame = {
    val dupPos = dupStartPositions(docs, idCol, textCol, k)
      .withColumn("e", least(col("pos") + (k - 1), col("n_tokens")))
    val win = Window.partitionBy(col("doc")).orderBy(col("pos"))
    val runs = dupPos
      // running max of interval ends over all PRIOR starts: a new run begins
      // when this start leaves a gap of >= 1 uncovered token (merge
      // overlapping AND contiguous coverage)
      .withColumn("prev_e", max(col("e")).over(win.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk", when(col("prev_e").isNull || col("pos") > col("prev_e") + 1, 1L).otherwise(0L))
      .withColumn("run_id", sum(col("brk")).over(win.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc"), col("n_tokens"), col("run_id"))
      .agg(min(col("pos")).as("s"), max(col("e")).as("e"))
      .filter(col("e") - col("s") + 1 >= minRunTokens)
    val ivs = runs
      .groupBy(col("doc"), col("n_tokens"))
      .agg(
        sort_array(collect_list(struct(col("s"), col("e")))).as("ivs"),
        sum(col("e") - col("s") + 1).as("removed_tokens"))
    docs
      .select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .join(ivs, Seq("doc")) // inner: only rewritten docs carry runs
      .withColumn("_kept",
        filter(
          zip_with(col("_toks"), sequence(lit(1L), size(col("_toks")).cast("long")),
            (t, p) => struct(p.as("p"), t.as("t"))),
          x => !exists(col("ivs"), iv =>
            x.getField("p") >= iv.getField("s") && x.getField("p") <= iv.getField("e"))))
      .select(
        col("doc"), col("n_tokens"), col("removed_tokens"),
        md5(concat_ws(" ", transform(col("_kept"), _.getField("t"))).cast("binary")).as("clean_md5"))
  }

  /** DuckDB mirror of [[removeDupSpans]] (string spans, global windows). */
  def removeDupSpansSql(k: Int = 8, minRunTokens: Int = 12): String =
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
       |  SELECT doc, n_tokens, pos, LEAST(pos + ${k - 1}, n_tokens) AS e
       |  FROM spans JOIN hot USING (s)
       |), marked AS (
       |  SELECT doc, n_tokens, pos, e,
       |    CASE WHEN pos > COALESCE(MAX(e) OVER (PARTITION BY doc ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
       |    THEN 1 ELSE 0 END AS brk
       |  FROM dpos
       |), isl AS (
       |  SELECT doc, n_tokens, pos, e,
       |    SUM(brk) OVER (PARTITION BY doc ORDER BY pos ROWS UNBOUNDED PRECEDING) AS run_id
       |  FROM marked
       |), runs AS (
       |  SELECT doc, n_tokens, run_id, MIN(pos) AS s, MAX(e) AS e
       |  FROM isl GROUP BY doc, n_tokens, run_id
       |  HAVING MAX(e) - MIN(pos) + 1 >= $minRunTokens
       |), removed AS (
       |  SELECT doc, n_tokens, CAST(SUM(e - s + 1) AS BIGINT) AS removed_tokens
       |  FROM runs GROUP BY doc, n_tokens
       |), positions AS (
       |  SELECT t.doc_id AS doc, CAST(i AS BIGINT) AS p, l[i] AS tok
       |  FROM toks t, unnest(range(1, len(l) + 1)) AS u(i)
       |  WHERE t.doc_id IN (SELECT doc FROM removed)
       |), kept AS (
       |  SELECT p.doc, p.p, p.tok FROM positions p
       |  WHERE NOT EXISTS (SELECT 1 FROM runs r
       |                    WHERE r.doc = p.doc AND p.p BETWEEN r.s AND r.e)
       |), clean AS (
       |  SELECT r.doc, r.n_tokens, r.removed_tokens,
       |    md5(COALESCE(string_agg(k.tok, ' ' ORDER BY k.p), '')) AS clean_md5
       |  FROM removed r LEFT JOIN kept k ON r.doc = k.doc
       |  GROUP BY r.doc, r.n_tokens, r.removed_tokens
       |)
       |SELECT doc, n_tokens, removed_tokens, clean_md5 FROM clean""".stripMargin

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
