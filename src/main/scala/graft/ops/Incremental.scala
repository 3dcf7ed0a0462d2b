package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Incremental (batch-vs-corpus) deduplication: classify each document of a
  * new ingest batch against the existing corpus as `exact_dup` (verbatim
  * text already present), `near_dup` (MinHash-LSH Jaccard >= threshold with
  * some corpus document), or `novel`. This is the daily-crawl admission
  * step of a production pipeline — the batch is small, the corpus is the
  * 100 TB side, and nothing here ever self-joins the corpus:
  *
  *  - exact: one semi join on a 16-byte md5 digest (corpus side shuffles
  *    digests only, never text);
  *  - near: the batch's band keys join the corpus's band keys (equality
  *    join on (band, band-value); in steady state the corpus signatures are
  *    a precomputed table, so the incremental cost is batch-sized);
  *  - verification re-joins shingle sets for CANDIDATES only.
  */
object Incremental {

  /** Cross-set LSH near-dup pairs (dNew, dCorp, jaccard): band-equality
    * candidates between the two sets (never within either set), verified by
    * exact shingle-set Jaccard. Same signature family, banding, and
    * verification as [[Dedup.nearDupPairs]] — a pair (a, b) with a in
    * `newDocs`, b in `corpus` surfaces here iff the self-join formulation
    * over the union would surface it.
    */
  def crossNearDupPairs(newDocs: DataFrame, corpus: DataFrame, idCol: String, textCol: String,
                        threshold: Double, numHashes: Int = 64, rowsPerBand: Int = 4): DataFrame = {
    val newSigsPlan = Dedup.minHashSignatures(newDocs, idCol, textCol, numHashes)
    val corpSigsPlan = Dedup.minHashSignatures(corpus, idCol, textCol, numHashes)
    // each side feeds its band explosion plus one shingle-set rejoin
    val newSigs = newSigsPlan.localCheckpoint(true, Dedup.ckptLevel(newSigsPlan))
    val corpSigs = corpSigsPlan.localCheckpoint(true, Dedup.ckptLevel(corpSigsPlan))
    // banding layout and Jaccard verification are the SHARED definitions in
    // Dedup — any change to the self-join family propagates here by
    // construction, keeping the oracle's cross-pair restriction value-exact
    val cands = Dedup.bandKeys(newSigs, numHashes, rowsPerBand).as("x")
      .join(Dedup.bandKeys(corpSigs, numHashes, rowsPerBand).as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv"))
      .select(col("x.doc").as("d_new"), col("y.doc").as("d_corp"))
      .distinct()
    val withSets = cands
      .join(newSigs.select(col("doc").as("d_new"), col("shingles").as("sh1")), "d_new")
      .join(corpSigs.select(col("doc").as("d_corp"), col("shingles").as("sh2")), "d_corp")
    Dedup.verifiedJaccard(withSets, threshold).select("d_new", "d_corp", "jaccard")
  }

  /** The persisted corpus-side index for STEADY-STATE admission:
    * (doc, digest, sig, shingles) — the md5 text digest (exact path), the
    * MinHash signature (banding), and the xxhash64 shingle-key set
    * (verification). Once this table is written, a batch admission never
    * reads, tokenizes, or hashes the corpus text again — the 100 TB side
    * shrinks to a columnar scan of ~0.6 KB/doc of index.
    *
    * Build cost: two corpus scans (signatures + digest) and one id-keyed
    * shuffle to zip them — offline, amortized across every future batch.
    * (A production build would fuse the digest into the signature scan; the
    * join keeps [[Dedup.minHashSignatures]] the single signature
    * definition, which is what keeps steady-state value-identical to the
    * self-join family.)
    */
  def signatureTable(corpus: DataFrame, idCol: String, textCol: String,
                     numHashes: Int = 64): DataFrame =
    Dedup.minHashSignatures(corpus, idCol, textCol, numHashes)
      .join(
        corpus.select(col(idCol).as("doc"), md5(col(textCol).cast(BinaryType)).as("digest")),
        Seq("doc"))
      .select("doc", "digest", "sig", "shingles")

  /** Metadata fingerprint of the corpus: the canonicalized logical plan
    * (captures the source, projection, and any filter) plus
    * (path, length, modificationTime) of every input file. Computed WITHOUT
    * reading any data — the steady-state path stays corpus-free — yet a
    * regenerated corpus (new file sizes/mtimes) or a different corpus
    * expression changes the fingerprint and forces a rebuild. Out of scope
    * by design: a byte-level edit that preserves every file's size AND
    * mtime (not something a parquet writer produces).
    */
  private def corpusFingerprint(spark: org.apache.spark.sql.SparkSession,
                                corpus: DataFrame): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = corpus.inputFiles.sorted.map { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val st = path.getFileSystem(conf).getFileStatus(path)
      s"$p:${st.getLen}:${st.getModificationTime}"
    }
    val key = corpus.queryExecution.analyzed.canonicalized.toString + files.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Write [[signatureTable]] to `path` if absent or stale, then read it
    * back. Staleness is judged by a sidecar [[corpusFingerprint]] written
    * with the table: a half-written table (no sidecar), a regenerated
    * corpus, or a different corpus expression all rebuild rather than being
    * silently measured — and the freshness check itself reads only file
    * METADATA, so a steady-state caller never pays a corpus scan. The
    * parquet round-trip is the point: the steady-state path must work from
    * the STORED index, not a lineage cache.
    */
  /** Freshness probe + fingerprint IO through the Hadoop FileSystem API, so
    * hdfs:// / s3a:// index paths probe correctly (a java.io.File probe saw
    * any non-local path as never-fresh, rewrote the table on every call,
    * and dropped the fingerprint at a local relative path — r12 advice).
    * The fingerprint write happens AFTER the table write: overwrite mode
    * clears the directory first, so a crash between the two leaves a
    * stale-free "not fresh" state, never a wrong "fresh" one.
    */
  private def ensureFresh(spark: org.apache.spark.sql.SparkSession, path: String, fp: String)(
      write: => Unit): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val success = new org.apache.hadoop.fs.Path(hPath, "_SUCCESS")
    val fpPath = new org.apache.hadoop.fs.Path(hPath, "_GRAFT_CORPUS_FP")
    val fresh = fs.exists(success) && fs.exists(fpPath) && {
      val len = fs.getFileStatus(fpPath).getLen.toInt
      val in = fs.open(fpPath)
      try {
        val b = new Array[Byte](len)
        in.readFully(b)
        new String(b, "UTF-8") == fp
      } finally in.close()
    }
    if (!fresh) {
      write
      val out = fs.create(fpPath, true)
      try out.write(fp.getBytes("UTF-8")) finally out.close()
    }
  }

  def ensureSignatureTable(spark: org.apache.spark.sql.SparkSession, corpus: DataFrame,
                           idCol: String, textCol: String, path: String,
                           numHashes: Int = 64): DataFrame = {
    val fp = corpusFingerprint(spark, corpus)
    ensureFresh(spark, path, fp) {
      signatureTable(corpus, idCol, textCol, numHashes)
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** [[ensureSignatureTable]] stored IN the 4mc container (round 12: MinHash
    * and shingle-hash arrays ride the csv payload as `array<long>`), with
    * per-block BLOOM filters on the md5 digest column. Same freshness
    * protocol; value-identical table. What the container adds at 100 TB:
    * the exact-dup admission probe (`digest IN batch-digests`) is a bloomed
    * point lookup that decompresses only may-contain blocks, and the
    * steady-state index needs no second storage system — signatures live in
    * the same splittable format as the corpus itself.
    */
  def ensureSignatureTable4mc(spark: org.apache.spark.sql.SparkSession, corpus: DataFrame,
                              idCol: String, textCol: String, path: String,
                              numHashes: Int = 64): DataFrame = {
    import org.apache.spark.sql.types._
    val fp = corpusFingerprint(spark, corpus)
    ensureFresh(spark, path, fp) {
      signatureTable(corpus, idCol, textCol, numHashes)
        .write.mode("overwrite").format("4mc").option("payload", "csv")
        .option("bloomColumns", "digest")
        .save(path)
    }
    val schema = StructType(Seq(
      StructField("doc", LongType, nullable = false),
      StructField("digest", StringType, nullable = true),
      StructField("sig", ArrayType(LongType, containsNull = true), nullable = true),
      StructField("shingles", ArrayType(LongType, containsNull = true), nullable = true)))
    spark.read.format("4mc").option("payload", "csv").schema(schema).load(path)
  }

  /** Steady-state batch admission against a PRECOMPUTED corpus signature
    * table — value-identical to [[batchStatus]] (same signature family,
    * banding, verification — all shared definitions), but the per-batch
    * cost profile is what a daily 100 TB admission needs:
    *
    *  - the corpus text is never touched: every corpus-side input is a
    *    columnar scan of the stored index;
    *  - every shuffle is candidate- or batch-bounded (batch signatures,
    *    band-key join, verification rejoins); the corpus index is scanned
    *    once per path but re-derived never. Catalyst's runtime bloom filter
    *    (on by default in Spark 4) prunes the corpus band scan against the
    *    batch's band keys when the batch side is small.
    */
  def batchStatusSteady(newDocs: DataFrame, corpusSigs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, numHashes: Int = 64, rowsPerBand: Int = 4): DataFrame = {
    val newSigsPlan = Dedup.minHashSignatures(newDocs, idCol, textCol, numHashes)
    val newSigs = newSigsPlan.localCheckpoint(true, Dedup.ckptLevel(newSigsPlan))
    val exact = newDocs
      .select(md5(col(textCol).cast(BinaryType)).as("digest"), col(idCol).as("doc"))
      .join(corpusSigs.select("digest"), Seq("digest"), "left_semi")
      .select(col("doc"), lit(true).as("_is_exact"))
    val cands = Dedup.bandKeys(newSigs, numHashes, rowsPerBand).as("x")
      .join(Dedup.bandKeys(corpusSigs.select("doc", "sig"), numHashes, rowsPerBand).as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv"))
      .select(col("x.doc").as("d_new"), col("y.doc").as("d_corp"))
      .distinct()
    val withSets = cands
      .join(newSigs.select(col("doc").as("d_new"), col("shingles").as("sh1")), "d_new")
      .join(corpusSigs.select(col("doc").as("d_corp"), col("shingles").as("sh2")), "d_corp")
    val near = Dedup.verifiedJaccard(withSets, threshold)
      .select(col("d_new").as("doc")).distinct()
      .select(col("doc"), lit(true).as("_is_near"))
    newDocs
      .select(col(idCol).as("doc"))
      .join(exact, Seq("doc"), "left")
      .join(near, Seq("doc"), "left")
      .withColumn("status",
        when(col("_is_exact"), "exact_dup")
          .when(col("_is_near"), "near_dup")
          .otherwise("novel"))
      .select("doc", "status")
  }

  /** Batch admission statuses: (doc, status) for every document of
    * `newDocs`, with `exact_dup` taking precedence over `near_dup`.
    */
  def batchStatus(newDocs: DataFrame, corpus: DataFrame, idCol: String, textCol: String,
                  threshold: Double): DataFrame = {
    val exact = newDocs
      .select(md5(col(textCol).cast(BinaryType)).as("_dg"), col(idCol).as("doc"))
      .join(corpus.select(md5(col(textCol).cast(BinaryType)).as("_dg")), Seq("_dg"), "left_semi")
      .select(col("doc"), lit(true).as("_is_exact"))
    val near = crossNearDupPairs(newDocs, corpus, idCol, textCol, threshold)
      .select(col("d_new").as("doc")).distinct()
      .select(col("doc"), lit(true).as("_is_near"))
    newDocs
      .select(col(idCol).as("doc"))
      .join(exact, Seq("doc"), "left")
      .join(near, Seq("doc"), "left")
      .withColumn("status",
        when(col("_is_exact"), "exact_dup")
          .when(col("_is_near"), "near_dup")
          .otherwise("novel"))
      .select("doc", "status")
  }

  /** DuckDB mirror of [[batchStatus]] aggregated per (lang, status), for a
    * batch defined by `batchPredSql` over `documents` (e.g. a doc_id mod
    * split). The near-dup CTE is the full self-join MinHash formulation
    * restricted to cross pairs — value-identical to the engine's cross-set
    * band join (see [[crossNearDupPairs]]).
    */
  def batchStatusCountsSql(threshold: Double, batchPredSql: String): String =
    s"""WITH pairs AS (
       |${Dedup.minHashPairsSql(threshold)}
       |), newdocs AS (
       |  SELECT doc_id, lang, text FROM documents WHERE $batchPredSql
       |), corpus AS (
       |  SELECT doc_id, text FROM documents WHERE NOT ($batchPredSql)
       |), exactd AS (
       |  SELECT DISTINCT n.doc_id FROM newdocs n JOIN corpus c ON n.text = c.text
       |), neard AS (
       |  SELECT DISTINCT CASE WHEN d1 IN (SELECT doc_id FROM newdocs) THEN d1 ELSE d2 END AS doc_id
       |  FROM pairs
       |  WHERE (d1 IN (SELECT doc_id FROM newdocs)) <> (d2 IN (SELECT doc_id FROM newdocs))
       |), status AS (
       |  SELECT n.lang,
       |    CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
       |         WHEN r.doc_id IS NOT NULL THEN 'near_dup'
       |         ELSE 'novel' END AS status
       |  FROM newdocs n
       |  LEFT JOIN exactd e ON n.doc_id = e.doc_id
       |  LEFT JOIN neard r ON n.doc_id = r.doc_id
       |)
       |SELECT lang, status, COUNT(*) AS n_docs FROM status
       |GROUP BY lang, status ORDER BY lang, status""".stripMargin
}
