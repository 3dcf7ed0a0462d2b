package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators (SURVEY §2 D1/D2), each designed as shuffle-native
  * DataFrame transforms with no driver-side materialization:
  *
  *   - exact: hash-groupBy keeping the min-tiebreaker row (2-phase agg);
  *   - n-gram Jaccard: token-postings self-join — the classic inverted-index
  *     pair generation; skew-guarded by a document-frequency cap;
  *   - MinHash-LSH: signature → banded bucket join → verified candidates →
  *     iterative connected components (no collect);
  *   - SimHash: 60-bit md5-derived signature, oracle-checkable.
  */
object Dedup {

  /** D1: exact dedup on `keys`, keeping the row with the smallest `tie`.
    * groupBy + min_by(struct) = partial-aggregated, one shuffle on the key
    * hash — at 100 TB this is the cheapest possible exact dedup.
    */
  def exactDedup(df: DataFrame, keys: Seq[String], tie: String): DataFrame = {
    val all = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(min_by(all, col(tie)).as("_r"))
      .select("_r.*")
  }

  /** Distinct (doc, 3-gram shingle) postings. Shingles — not unigrams — are
    * the unit: natural-language vocabularies are small and every word is hot
    * (a token present in 1M docs creates 10^12 join pairs), while shingle
    * document-frequency stays low, so the self-join fans out linearly.
    * `maxDocFreq` additionally drops boilerplate shingles (the residual skew
    * guard at corpus scale). 0 = uncapped (oracle parity).
    */
  def shinglePostings(docs: DataFrame, idCol: String, textCol: String, maxDocFreq: Long = 0L): DataFrame = {
    // two-phase: materialize the token array, THEN build shingles from it —
    // a lambda that references tokens(text) directly re-runs the regex split
    // per element (no CSE through higher-order functions), turning shingle
    // construction quadratic in document length
    val posts = docs
      .select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col("doc"), explode(array_distinct(shinglesFromTokens(col("_toks")))).as("w"))
    if (maxDocFreq <= 0) posts
    else {
      val hot = posts.groupBy("w").agg(count(lit(1)).as("df")).filter(col("df") > maxDocFreq)
      posts.join(broadcast(hot), Seq("w"), "left_anti")
    }
  }

  /** D2 (exact flavor): all pairs with 3-gram-shingle-set Jaccard >=
    * `threshold`, via postings join + per-pair intersection counts.
    * Deterministic double (int/int division) so the DuckDB oracle matches
    * exactly.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String, threshold: Double): DataFrame = {
    // materialize once: both self-join sides and the size table reuse it
    // instead of re-running the explode+shingle scan three times
    val posts = shinglePostings(docs, idCol, textCol).localCheckpoint(true)
    val sizes = posts.groupBy("doc").agg(count(lit(1)).as("sz"))
    val inter = posts
      .as("a")
      .join(posts.as("b"), col("a.w") === col("b.w") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "d1").withColumnRenamed("sz", "sz1"), "d1")
      .join(sizes.withColumnRenamed("doc", "d2").withColumnRenamed("sz", "sz2"), "d2")
      .withColumn("jaccard", col("inter").cast(DoubleType) / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  def ngramJaccardPairsSql(threshold: Double): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
       |), posts AS (
       |  SELECT DISTINCT doc_id AS doc,
       |    unnest(CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')]
       |           ELSE list_transform(range(1, len(l) - 1), i -> array_to_string(l[i:i+2], ' '))
       |           END) AS w
       |  FROM toks
       |), sizes AS (
       |  SELECT doc, COUNT(*) AS sz FROM posts GROUP BY doc
       |), inter AS (
       |  SELECT a.doc AS d1, b.doc AS d2, COUNT(*) AS inter
       |  FROM posts a JOIN posts b ON a.w = b.w AND a.doc < b.doc
       |  GROUP BY 1, 2
       |)
       |SELECT d1, d2, CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jaccard
       |FROM inter JOIN sizes s1 ON d1 = s1.doc JOIN sizes s2 ON d2 = s2.doc
       |WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= $threshold""".stripMargin

  // ------------------------------------------------------------ MinHash LSH

  /** Word 3-shingles from a MATERIALIZED token-array column (see
    * [[shinglePostings]] for why the two-phase shape matters).
    */
  def shinglesFromTokens(toks: Column): Column =
    when(size(toks) < 3, array(concat_ws(" ", toks))).otherwise(
      transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))
      )
    )

  /** Word 3-shingles (whole text for very short docs). */
  def shingles(text: Column): Column = shinglesFromTokens(TextAnalysis.tokens(text))

  /** MinHash signature: numHashes permutations simulated by salting xxhash64.
    * Pure column expressions — signature computation is map-only; shingle
    * array materialized once per row before the 64 array_min passes.
    */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String, numHashes: Int = 64): DataFrame = {
    val withShingles = docs
      .select(col(idCol).as("doc"), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col("doc"), array_distinct(shinglesFromTokens(col("_toks"))).as("shingles"))
    val sig = array(
      (0 until numHashes).map(i => array_min(transform(col("shingles"), s => xxhash64(lit(i), s)))): _*
    )
    withShingles.select(col("doc"), sig.as("sig"), col("shingles"))
  }

  /** Banded LSH candidate pairs: two docs collide when any band of `rowsPerBand`
    * consecutive signature entries hashes identically. One shuffle on
    * (band, bandHash); bucket sizes are bounded in expectation by collision
    * probability, and the distinct() bounds repeat candidates across bands.
    */
  def lshCandidates(sigs: DataFrame, numHashes: Int = 64, rowsPerBand: Int = 4): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bands = sigs.select(
      col("doc"),
      posexplode(
        array((0 until numBands).map { b =>
          xxhash64(lit(b) +: (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
        }: _*)
      ).as(Seq("band", "bh"))
    )
    bands
      .as("x")
      .join(bands.as("y"), col("x.band") === col("y.band") && col("x.bh") === col("y.bh") && col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("d1"), col("y.doc").as("d2"))
      .distinct()
  }

  /** D2 (probabilistic flavor): LSH candidates verified by exact shingle-set
    * Jaccard >= threshold.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String, threshold: Double,
                   numHashes: Int = 64, rowsPerBand: Int = 4): DataFrame = {
    val sigs = minHashSignatures(docs, idCol, textCol, numHashes).cache()
    val cands = lshCandidates(sigs, numHashes, rowsPerBand)
    val withSets = cands
      .join(sigs.select(col("doc").as("d1"), col("shingles").as("sh1")), "d1")
      .join(sigs.select(col("doc").as("d2"), col("shingles").as("sh2")), "d2")
    withSets
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("uni", size(col("sh1")) + size(col("sh2")) - col("inter"))
      .withColumn("jaccard", col("inter").cast(DoubleType) / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  /** Connected components over dup pairs by iterative min-label propagation —
    * converges in O(log(diameter)) joins, all distributed (no driver graph).
    * Returns (doc, component) where component = min doc id in the cluster.
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // localCheckpoint each iteration: truncates lineage so iteration i does
    // not re-execute the (potentially huge) pair-generation plan i times.
    val edges = pairs
      .select(col("d1").as("a"), col("d2").as("b"))
      .union(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .localCheckpoint(true)
    var labels = edges
      .select(col("a").as("doc"))
      .distinct()
      .withColumn("comp", col("doc"))
      .localCheckpoint(true)
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val nbrMin = edges
        .join(labels, edges("b") === labels("doc"))
        .groupBy(edges("a").as("doc"))
        .agg(min(col("comp")).as("nbrComp"))
      val updated = labels
        .join(nbrMin, Seq("doc"), "left")
        .select(col("doc"), least(col("comp"), coalesce(col("nbrComp"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      val changed = updated
        .join(labels.withColumnRenamed("comp", "old"), "doc")
        .filter(col("comp") =!= col("old"))
        .limit(1)
        .count()
      converged = changed == 0
      labels = updated
      i += 1
    }
    labels
  }

  // ---------------------------------------------------------------- SimHash

  val SimHashBits = 60 // md5-hex-15 fits a signed 64-bit in both engines

  /** 60-bit SimHash over word multiset, hash = first 15 md5 hex digits —
    * identical in DuckDB, so signatures oracle-check exactly.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(
      col(idCol).as("doc"),
      explode(TextAnalysis.tokens(col(textCol))).as("w")
    )
    val h = conv(substring(md5(col("w").cast(BinaryType)), 1, 15), 16, 10).cast(LongType)
    val bitSums = (0 until SimHashBits).map { i =>
      sum(shiftright(h, i).bitwiseAND(1) * 2 - 1).as(s"s$i")
    }
    val sums = words.groupBy("doc").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until SimHashBits)
      .map(i => when(col(s"s$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
      .reduce(_ + _)
    sums.select(col("doc"), sig.as("simhash"))
  }

  def simHashSql: String = {
    val h = "CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT)"
    val bitSums = (0 until SimHashBits)
      .map(i => s"SUM((($h >> $i) & 1) * 2 - 1) AS s$i")
      .mkString(",\n    ")
    val sig = (0 until SimHashBits)
      .map(i => s"CASE WHEN s$i > 0 THEN (CAST(1 AS BIGINT) << $i) ELSE 0 END")
      .mkString(" + ")
    s"""WITH words AS (
       |  SELECT doc_id AS doc, unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
       |), sums AS (
       |  SELECT doc, $bitSums
       |  FROM words GROUP BY doc
       |) SELECT doc, $sig AS simhash FROM sums""".stripMargin
  }

  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
