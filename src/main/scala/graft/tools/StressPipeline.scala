package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Scale-stress harness for the LLM-pipeline operators: replicates the sf
  * documents/embeddings tables by a large factor with DETERMINISTIC
  * perturbations (pure column expressions — generation runs at scan speed),
  * then times the bucketed operators on the result and reports wall time,
  * output rows, and shuffle-write volume per operator.
  *
  * The point is measured evidence for the "survives 100×" claim: the format
  * layer has a 2 GiB stress file ([[graft.Bench]]), but until round 6 no
  * dedup/ANN/text operator had run above sf0.1 (~1.5 MB of document text).
  * At the default factor (700×) the generated corpus is ≥1 GB of text /
  * 3.5 M documents and 1 M embedding vectors — sub-quadratic growth shows up
  * directly as time(700×) / time(1×) ≪ 700² (the per-query section of the
  * same bench JSON carries the 1× numbers).
  *
  * Corpus construction (all seeded by (word, replica) hashes — no RNG):
  *  - each replica substitutes ~60% of words deterministically, so replicas
  *    of the same document share <7% of 3-gram shingles (NOT near-dups — a
  *    naive replication would create R-sized near-dup cliques and turn every
  *    bucketed join quadratic by construction);
  *  - ~0.5% of replica rows get a TWIN with only 5% substitution (shingle
  *    Jaccard ≈ 0.75) — a bounded planted near-dup population that keeps the
  *    pair-generation and cluster stages honestly exercised;
  *  - embeddings replicate with a per-replica dimension rotation plus ±0.3%
  *    noise, so replicas are not mutual near-neighbors.
  */
object StressPipeline {

  /** `tasks` = first-attempt task completions, `attempts` = ALL task-end
    * events (retries + speculation + stage re-attempts included), and
    * `firstAttemptShuffleMb` sums shuffle writes over first attempts only —
    * so a pressured run that re-ran work is SELF-IDENTIFYING
    * (attempts > tasks, all-attempts sum > first-attempt sum) instead of
    * needing a diff against the deterministic plan volume (r12 verdict #3:
    * the driver's loaded-box ngram row read 18,588 MB vs the 16,111 MB
    * plan volume purely from retry double-counting).
    */
  final case class OpResult(name: String, secs: Double, rows: Long, shuffleWriteMb: Double,
                            canaryMs: Double = -1.0, tasks: Long = -1L, attempts: Long = -1L,
                            firstAttemptShuffleMb: Double = -1.0,
                            // r15: shuffle RECORDS over first attempts — the
                            // truly plan-determined currency. Cross-process
                            // runs of identical pinned plans repeat byte
                            // volumes only to ~±15% (lz4 shuffle-block framing
                            // is sensitive to map-side content ordering, which
                            // scheduling order changes), while record counts
                            // are a pure function of the plan + data
                            firstAttemptShuffleRecords: Long = -1L,
                            measuredAt: Long = 0L, // epoch seconds; sentinel rows carry the
                                                   // ROTATION's last-measured time so staleness
                                                   // is visible in the artifact (r13 verdict #8)
                            // r17: failure cause for secs == -1 rows — the
                            // exception class + message, so a failed op is
                            // diagnosable FROM THE ARTIFACT (r16: the cause
                            // went to stderr and was lost with the log)
                            error: String = null)

  /** 5e7-round spin (~80 ms unloaded): the per-op load calibration. Same
    * ALU-only mix as [[graft.Bench.spinCanaryMs]] at a quarter of the work,
    * cheap enough to run before all 23 ops.
    */
  private def quickCanaryMs(): Double = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    val t0 = System.nanoTime()
    while (i < 50000000) { x = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL; i += 1 }
    val ms = (System.nanoTime() - t0) / 1e6
    if (x == 42L) System.err.println("spin fixpoint")
    ms
  }
  final case class StressReport(repDocs: Int, repEmb: Int, nDocs: Long, nVecs: Long,
                                textMb: Double, genSecs: Double, budgetSecs: Long,
                                conf: Seq[(String, String)], ops: Seq[OpResult])

  /** Least-recently-measured rotation state: op name → epoch millis of its
    * last completed in-artifact measurement. Persisted OUTSIDE the repo
    * (beside the corpus cache) so consecutive rounds' budget-limited runs
    * cover complementary subsets — every op lands in an archived artifact at
    * least once every few rounds instead of the same tail being `secs: -2`
    * forever (r8 verdict #2).
    */
  private val RotationStatePath = "/tmp/graft-stress-pipeline/rotation.tsv"

  private def loadRotation(): Map[String, Long] =
    try {
      val f = new java.io.File(RotationStatePath)
      if (!f.exists()) Map.empty
      else
        scala.io.Source.fromFile(f).getLines().flatMap { l =>
          l.split("\t") match {
            case Array(n, t) => t.toLongOption.map(n -> _)
            case _           => None
          }
        }.toMap
    } catch { case _: Exception => Map.empty }

  /** Op names whose row in any COMMITTED bench artifact
    * (`bench/BENCH_full_*.json`, repo-relative like the writer) is a budget
    * sentinel (`"secs":-2.00`). The artifact is committed every round, so
    * this survives fresh boxes where the /tmp rotation state does not —
    * no op can sit out two consecutive artifacts (r15 verdict #1).
    */
  private def previouslySentineled(): Set[String] =
    try {
      val dir = new java.io.File("bench")
      if (!dir.isDirectory) Set.empty
      else {
        val pat = """"([a-zA-Z0-9_]+)":\{"secs":-2\.00?\b""".r
        dir.listFiles().filter(f => f.getName.startsWith("BENCH_full_") &&
            f.getName.endsWith(".json")).toSet[java.io.File].flatMap { f =>
          val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          pat.findAllMatchIn(text).map(_.group(1)).toSet
        }
      }
    } catch { case _: Exception => Set.empty }

  private def saveRotation(state: Map[String, Long]): Unit =
    try {
      val f = new java.io.File(RotationStatePath)
      f.getParentFile.mkdirs()
      val w = new java.io.PrintWriter(f)
      try state.foreach { case (n, t) => w.println(s"$n\t$t") }
      finally w.close()
    } catch { case e: Exception => System.err.println(s"[stress] rotation save failed: $e") }

  /** ~60%-substituted words, keyed by (word, replica, tag): the same word is
    * rewritten identically within a replica (stable vocab shape) and
    * differently across replicas (no cross-replica shingle overlap).
    */
  private def perturbText(text: Column, rep: Column, subPct: Int, tag: Int): Column = {
    val toks = split(trim(text), "\\s+")
    concat_ws(" ",
      transform(toks, w =>
        when(pmod(hash(w, rep, lit(tag)), lit(100)) < subPct,
          concat(w, lit("x"), pmod(hash(w, rep, lit(tag), lit(1)), lit(997)).cast("string")))
          .otherwise(w)))
  }

  /** Generate (or reuse) the replicated corpus under `dir` (the cache key —
    * base sf + replication factors — is encoded in the dir name by [[run]];
    * a cached documents table whose row count disagrees with
    * repDocs × base-count is treated as stale and regenerated). Writes
    * `documents.parquet` and `embeddings.parquet` Spark directories so
    * [[graft.PipelineQueries]] reads them like any sf dir.
    */
  def ensureCorpus(spark: SparkSession, baseSf: String, dir: String,
                   repDocs: Int, repEmb: Int): (Long, Long, Double) = {
    val docsPath = s"$dir/documents.parquet"
    val embPath = s"$dir/embeddings.parquet"
    val docs = spark.read.parquet(s"$baseSf/documents.parquet")
    val emb = spark.read.parquet(s"$baseSf/embeddings.parquet")

    def exists(p: String): Boolean =
      new java.io.File(p, "_SUCCESS").exists()

    // stale-cache guard: replicas (base × repDocs) plus the planted twins
    // must account for every row; anything else is a corpus from older
    // generation logic — regenerate rather than silently measuring it
    if (exists(docsPath)) {
      val cached = spark.read.parquet(docsPath).count()
      val expectedBase = docs.count() * repDocs
      if (cached < expectedBase || cached > expectedBase + expectedBase / 100) {
        System.err.println(
          s"[stress] cached corpus $docsPath has $cached rows, expected ~$expectedBase — regenerating")
        org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(docsPath), true)
      }
    }

    if (!exists(docsPath)) {
      val reps = broadcast(spark.range(repDocs).select(col("id").as("rep")))
      val base = docs.crossJoin(reps).select(
        (col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        col("lang"), col("source"),
        perturbText(col("text"), col("rep"), 60, 0).as("text"))
      // bounded planted near-dups: twin ids live in the +5M half of each
      // replica's 10M id band, so they can never collide with base rows
      val twins = base
        .filter(pmod(col("doc_id"), lit(211)) === 7)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("lang"), col("source"),
          perturbText(col("text"), lit(0), 5, 1).as("text"))
      base.unionByName(twins)
        .withColumn("n_chars", length(col("text")))
        .repartition(64)
        .write.mode("overwrite").parquet(docsPath)
    }
    if (!exists(embPath)) {
      val reps = broadcast(spark.range(repEmb).select(col("id").as("rep")))
      emb.crossJoin(reps).select(
        (col("vec_id") + col("rep") * 10000000L).as("vec_id"),
        transform(sequence(lit(0), lit(63)), j =>
          (element_at(col("embedding"), (pmod(j + col("rep"), lit(64)) + 1).cast("int")).cast("double") *
            (lit(1.0) + (pmod(col("vec_id") * 31 + j, lit(7)) - 3).cast("double") * lit(0.001)))
            .cast("float")).as("embedding"))
        .repartition(32)
        .write.mode("overwrite").parquet(embPath)
    }
    val nDocs = spark.read.parquet(docsPath).count()
    val nVecs = spark.read.parquet(embPath).count()
    val textMb = spark.read.parquet(docsPath)
      .agg(sum(length(col("text")))).head().getLong(0) / 1e6
    (nDocs, nVecs, textMb)
  }

  /** Time one action with a stage listener summing shuffle writes. The
    * listener bus is async, so a short drain sleep precedes the readback —
    * worst case a late stage under-counts the shuffle number, never the
    * wall time.
    */
  private[tools] def timed(spark: SparkSession, name: String)(action: => Long): OpResult = {
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val firstShuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val firstShuffleRecords = new java.util.concurrent.atomic.AtomicLong(0L)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0L)
    val attempts = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      // task-level accounting so retried/speculative attempts are COUNTED
      // but separable: `attempts` > `tasks` flags a pressured run, and the
      // first-attempt shuffle sum is the deterministic plan volume
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        attempts.incrementAndGet()
        val first = te.stageAttemptId == 0 && te.taskInfo != null && te.taskInfo.attemptNumber == 0
        if (first) tasks.incrementAndGet()
        val m = te.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          if (first) {
            firstShuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            firstShuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // snapshot pre-existing persistent RDDs: only blocks created DURING this
    // op are released below, so a bench section running after (or sharing
    // the session with) stress cannot lose its own cached data
    val preexisting = spark.sparkContext.getPersistentRDDs.keySet
    try {
      val can = quickCanaryMs()
      val t0 = System.nanoTime()
      val rows = action
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      OpResult(name, secs, rows, shuffleBytes.get() / 1e6, can,
        tasks.get(), attempts.get(), firstShuffleBytes.get() / 1e6,
        firstShuffleRecords.get())
    } catch {
      // a failed op must be VISIBLE in the report (secs = -1), not abort the
      // remaining ops or silently vanish from the JSON
      case e: Throwable =>
        System.err.println(s"[stress] $name failed: ${e.getMessage}")
        // record the ROOT cause too: Spark wraps executor OOMs/fetch
        // failures in layers of SparkException whose top-level message is
        // often just "Job aborted" — the artifact row must say WHY
        val root = {
          var c: Throwable = e
          while (c.getCause != null && (c.getCause ne c)) c = c.getCause
          c
        }
        val msg = {
          val top = s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}"
          val full =
            if (root ne e) s"$top <- ${root.getClass.getName}: ${String.valueOf(root.getMessage)}"
            else top
          if (full.length > 500) full.take(500) + "..." else full
        }
        OpResult(name, -1.0, -1L, shuffleBytes.get() / 1e6, -1.0,
          tasks.get(), attempts.get(), firstShuffleBytes.get() / 1e6,
          firstShuffleRecords.get(), error = msg)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      // each op checkpoints multi-GB intermediates (postings, signatures, CC
      // labels); the ContextCleaner only reclaims them after a driver GC
      // notices the dropped references, and at this volume a later op can
      // heap-OOM first (measured) — release them deterministically instead
      spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !preexisting.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
  }

  /** Run the five bucketed pipeline operators on the replicated corpus.
    * ann_lsh runs at the SCALE parameter point (bits=12, tables=8 — the
    * [[Similarity.annTopK]] default): the registered sf0.1 row's bits=2 was
    * tuned for exact recall on 2 000 vectors and its 4 buckets/table would
    * put ~N/4 of a million-vector corpus in every probe's candidate set —
    * the parameter choice is part of the scale story, so the stress key
    * names it explicitly (no silent swap).
    */
  def run(spark: SparkSession, baseSf: String, repDocs: Int, repEmb: Int): StressReport = {
    // cache key carries the base sf (different bases must not share a
    // corpus) and a generator version token (bump when perturbation logic
    // changes so stale corpora from older rounds are never measured)
    val sfKey = java.lang.Integer.toHexString(baseSf.hashCode)
    val dir = s"/tmp/graft-stress-pipeline/g2-$sfKey/d${repDocs}_e$repEmb"
    val tGen0 = System.nanoTime()
    val (nDocs, nVecs, textMb) = ensureCorpus(spark, baseSf, dir, repDocs, repEmb)
    val genSecs = (System.nanoTime() - tGen0) / 1e9
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // Partition sizing is part of the scale story: 32 shuffle partitions at
    // 700x put >200 MB (compressed) per partition against ~145 MB of
    // per-task execution memory on an 8 GiB local[32] driver — exactly the
    // spill/OOM regime the brief warns about. 256 partitions with AQE
    // coalescing restore bounded per-task state; restored after the run so
    // the per-query bench keeps its own sizing.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCkpt = spark.conf.getOption("spark.graft.checkpoint.storage")
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    // DISK_ONLY intermediates at this volume: a memory-first checkpoint of
    // the O(corpus-token) postings starves aggregation tasks (measured OOM)
    spark.conf.set("spark.graft.checkpoint.storage", "DISK_ONLY")
    // Pin AQE's runtime RE-PLANNING for the stress section (r13 verdict #2):
    // two attempts==tasks runs of identical code measured 16,169 vs
    // 18,589 MB first-attempt shuffle on ngram (739 vs 733 tasks) because
    // coalescing / skew-split / local-reader decisions hinge on observed
    // partition sizes, which drift run to run with scheduling order and
    // shuffle compression framing — so PLAN SHAPE itself varied. With these
    // four knobs pinned the stage graph is data-deterministic and
    // first-attempt shuffle is comparable across runs; AQE's join-strategy
    // flips (driven by stable map-output size totals) stay on. Restored
    // after the section so the per-query bench keeps stock AQE.
    val aqePins = Seq(
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      "spark.sql.adaptive.localShuffleReader.enabled" -> "false",
      "spark.sql.adaptive.optimizeSkewsInRebalancePartitions.enabled" -> "false")
    val prevAqe = aqePins.map { case (k, _) => k -> spark.conf.getOption(k) }
    aqePins.foreach { case (k, v) => spark.conf.set(k, v) }
    try runOps(spark, dir, emb, repDocs, repEmb, nDocs, nVecs, textMb, genSecs)
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevCkpt match {
        case Some(v) => spark.conf.set("spark.graft.checkpoint.storage", v)
        case None => spark.conf.unset("spark.graft.checkpoint.storage")
      }
      prevAqe.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  private def runOps(spark: SparkSession, dir: String, emb: DataFrame,
                     repDocs: Int, repEmb: Int, nDocs: Long, nVecs: Long,
                     textMb: Double, genSecs: Double): StressReport = {
    // Total time budget for the section (SPARK_GRAFT_STRESS_BUDGET seconds,
    // default 1500): an over-budget run SKIPS remaining ops with secs = -2
    // — visible in the JSON, never a silent truncation — so one slow box
    // can't starve the rest of the bench or lose the whole output line.
    val budgetSecs = sys.env.get("SPARK_GRAFT_STRESS_BUDGET")
      .flatMap(_.toLongOption).getOrElse(1800L)
    val deadline = System.nanoTime() + budgetSecs * 1000000000L
    // SPARK_GRAFT_STRESS_OPS=a,b limits the section to named ops (local
    // iteration on one operator without paying for the other four)
    val onlyOps = sys.env.get("SPARK_GRAFT_STRESS_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).filter(_.nonEmpty)
    // section-start load baseline for the canary-gated retry below
    val baseCanaryMs = quickCanaryMs()
    // rotation timestamps double as the staleness stamp on sentinel rows
    lazy val rotationStamps = loadRotation()
    def lastMeasured(name: String): Long = rotationStamps.getOrElse(name, 0L) / 1000L
    // Per-op shuffle sizing (r16 What's wrong #1): dedup_ngram_pairs moves
    // ~11x the corpus text through its postings/prefix/verify stages
    // (16.7 GB first-attempt shuffle at textMb=1489), and the section-wide
    // 256 partitions put ~65 MB of compressed shuffle — several×
    // uncompressed collect_list state — per task; on a loaded box that is
    // the measured OOM/retry-cascade regime. Scale THIS op's partitions to
    // ~24 MB/task, deterministically from the corpus size (plan shape stays
    // data-deterministic; record counts — the cross-run currency — are
    // partition-count-invariant by construction).
    val ngramParts: Int = {
      val want = math.max(256L, textMb.toLong * 11 / 24)
      (((want + 31) / 32) * 32).toInt
    }
    val opConf: Map[String, Seq[(String, String)]] =
      Map("dedup_ngram_pairs" ->
        Seq("spark.sql.shuffle.partitions" -> ngramParts.toString))
    def guarded(name: String)(action: => Long): OpResult =
      if (onlyOps.exists(!_.contains(name)))
        OpResult(name, -3.0, -1L, 0.0, measuredAt = lastMeasured(name))
      else if (System.nanoTime() > deadline) {
        System.err.println(s"[stress] $name skipped: section budget (${budgetSecs}s) exhausted")
        OpResult(name, -2.0, -1L, 0.0, measuredAt = lastMeasured(name))
      } else {
        val overrides = opConf.getOrElse(name, Nil)
        val prev = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
        overrides.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          val r1 = timed(spark, name)(action)
          // canary-gated retry (r10 verdict #4): when the pre-op spin canary
          // shows >2x contention, the measurement is pressure-tainted —
          // re-measure once if budget remains and keep the quieter run (its
          // shuffle volume rides along, so the ngram 16,111 MB cross-check
          // stays a per-run invariant, never a double-count)
          if (r1.secs >= 0 && r1.canaryMs > 2 * baseCanaryMs && System.nanoTime() < deadline) {
            System.err.println(
              f"[stress] $name measured under pressure (canary ${r1.canaryMs}%.0f ms vs base $baseCanaryMs%.0f ms) — re-measuring")
            val r2 = timed(spark, name)(action)
            if (r2.secs >= 0 && r2.secs < r1.secs) r2 else r1
          } else r1
        } finally prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      }
    // Op catalog in CANONICAL report order. Ops that must run together (the
    // steady-state pair: build must precede and absorb the index cost) share
    // a group; rotation reorders GROUPS by least-recently-measured so a
    // budget-limited run measures the ops the previous runs skipped.
    val groups: Seq[Seq[(String, () => Long)]] = Seq(
      Seq("dedup_ngram_pairs" -> (() =>
        graft.PipelineQueries.dedupNgramPairs(spark, dir).count())),
      Seq("dedup_minhash_pairs" -> (() =>
        graft.PipelineQueries.dedupMinhashPairs(spark, dir).count())),
      Seq("dedup_clusters" -> (() =>
        graft.PipelineQueries.dedupClusters(spark, dir).count())),
      Seq("ann_lsh_b12t8" -> (() =>
        Similarity.annTopK(emb, emb.filter(col("vec_id") < 10), 5, dim = 64,
          bits = 12, tables = 8).count())),
      Seq("tfidf_top_terms" -> (() =>
        graft.PipelineQueries.tfidfTopTerms(spark, dir).count())),
      // distributed-prefix-sum packing: one scan + range shuffle of
      // (doc, n_tokens) — should stay near-linear in corpus size
      Seq("pack_training_sequences" -> (() =>
        graft.PipelineQueries.packTrainingSequences(spark, dir).count())),
      // exact-substring coverage: O(corpus tokens) span postings, two-level
      // distinct aggregate, semi join back, per-doc window — every stage
      // linear in corpus size (the replicated corpus makes EVERY span
      // cross-replica-duplicated, so this measures the worst case where the
      // hot-span set is the whole vocabulary)
      Seq("span_dup_coverage" -> (() =>
        graft.PipelineQueries.spanDupCoverage(spark, dir).count())),
      // the rewrite half of exact-substring dedup: same linear span
      // machinery plus the interval union and the doc↔runs equality join —
      // time should track span_dup_coverage plus one corpus-text join, never
      // anything quadratic (on the replicated corpus every span is hot, so
      // runs merge to ~1 interval/doc — the rebuild lambda's dense-dup
      // best case)
      Seq("span_dedup_rewrite" -> (() =>
        graft.PipelineQueries.spanDedupRewrite(spark, dir).count())),
      // variable-length rewrite: SAME corpus, islands found map-side against
      // broadcast hot sets + a 24-token seed pass — its shuffle must come in
      // BELOW single-k's (the window exchange is gone; the second hot
      // aggregate is the only added exchange). The stress pair
      // (span_dedup_rewrite, span_dedup_rewrite_vark) is the r8-verdict
      // "shuffle does not grow vs single-k" evidence.
      Seq("span_dedup_rewrite_vark" -> (() =>
        graft.PipelineQueries.spanDedupRewriteVarK(spark, dir).count())),
      // batch-vs-corpus admission: minhash signatures on both splits plus
      // the cross-set band join — the shape whose incremental cost must stay
      // batch-bounded, measured here with a 20% batch against an 80% corpus
      Seq("incremental_dedup" -> (() =>
        graft.PipelineQueries.incrementalDedup(spark, dir).count())),
      // steady state: corpus signatures precomputed into a parquet index
      // (built+cached under the stress dir — the build is timed as its own
      // op so the report separates offline index cost from per-batch cost).
      // The delta vs incremental_dedup IS the measurement: per-batch time
      // must scale with the 20% batch, not the 80% corpus.
      Seq(
        "incremental_sig_table_build" -> (() => {
          val p = new org.apache.hadoop.fs.Path(s"$dir/sigtable")
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
          val d = spark.read.parquet(s"$dir/documents.parquet")
          graft.ops.Incremental.ensureSignatureTable(
            spark, d.filter(col("doc_id") % 5 =!= 4), "doc_id", "text", s"$dir/sigtable").count()
        }),
        "incremental_dedup_steady" -> (() => {
          val d = spark.read.parquet(s"$dir/documents.parquet")
          val isBatch = col("doc_id") % 5 === 4
          val corpSigs = graft.ops.Incremental.ensureSignatureTable(
            spark, d.filter(!isBatch), "doc_id", "text", s"$dir/sigtable")
          graft.ops.Incremental.batchStatusSteady(
            d.filter(isBatch), corpSigs, "doc_id", "text", 0.5).count()
        }),
        // round 12: the same index IN the 4mc container (MinHash + shingle
        // arrays ride the csv payload, digest blooms attached). Build cost
        // and per-batch admission are measured against the parquet twin
        // above — the array scan must keep per-batch time batch-bounded,
        // the composition evidence that container-native indexes hold at
        // 700x docs
        "incremental_sig_table_build_4mc" -> (() => {
          val p = new org.apache.hadoop.fs.Path(s"$dir/sigtable4mc")
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
          val d = spark.read.parquet(s"$dir/documents.parquet")
          graft.ops.Incremental.ensureSignatureTable4mc(
            spark, d.filter(col("doc_id") % 5 =!= 4), "doc_id", "text", s"$dir/sigtable4mc").count()
        }),
        "incremental_dedup_steady_4mc" -> (() => {
          val d = spark.read.parquet(s"$dir/documents.parquet")
          val isBatch = col("doc_id") % 5 === 4
          val corpSigs = graft.ops.Incremental.ensureSignatureTable4mc(
            spark, d.filter(!isBatch), "doc_id", "text", s"$dir/sigtable4mc")
          graft.ops.Incremental.batchStatusSteady(
            d.filter(isBatch), corpSigs, "doc_id", "text", 0.5).count()
        })),
      // per-domain cap: one checkpointed scoring pass, then a plain agg +
      // a WindowGroupLimit-capped rank — the window shuffle carries at most
      // cap rows per (map partition, domain), so corpus growth should cost
      // only the linear scoring scan
      Seq("domain_cap_sample" -> (() =>
        graft.PipelineQueries.domainCapSample(spark, dir).count())),
      // SemDeDup at stress scale: k = 2048 seed-medoid cells sits near the
      // k ≈ √N balance point — the map-only assignment (N·k dot products,
      // embarrassingly parallel, zero shuffle) and the within-cell pair
      // stage (~N²/2k candidates through an equality join on cid) cost the
      // same order. The rotation-replicated stress embeddings plant true
      // near-twins (reps 64 apart share a rotation), so the removed set is
      // real, while cross-rotation replicas stay decorrelated
      Seq("semantic_dedup_k2048" -> (() =>
        Similarity.semanticDedup(emb, k = 2048, tau = 0.8)
          .filter(col("removed")).count())),
      // the corpus-scale SemDeDup configuration: 2 Lloyd iterations of
      // deterministic partial-agg k-means before assignment. Each iteration
      // is one fused N·k mapPartitions pass (k×dim partials per partition,
      // merged on the driver) — the training cost should be ~2 assignment
      // scans on top of semantic_dedup_k2048, never super-linear
      Seq("semantic_dedup_lloyd2" -> (() =>
        Similarity.semanticDedup(emb, k = 2048, tau = 0.8, iters = 2)
          .filter(col("removed")).count())),
      // unigram-LM quality scoring: O(tokens) explode, one token-count
      // shuffle, broadcast vocabulary back — should track tfidf's linear
      // profile (same skeleton, one fewer per-doc stage)
      Seq("unigram_logprob" -> (() =>
        graft.ops.TextAnalysis.unigramLogProb(
          spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          vocabCap = 4096).count())),
      // DSIR importance resampling: two O(features) explodes, a groupBy
      // bounded by m=1024 buckets, one ≤m-row broadcast back, TakeOrdered
      // top-k — every shuffle except the per-doc sum is constant-size, so
      // time should be ~2 tokenize scans regardless of corpus size
      Seq("dsir_select" -> (() =>
        graft.ops.Dsir.dsirSelect(
          spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          targetPred = col("lang") === "en", m = 1024, k = 100,
          fastHash = true).count())),
      // bigram LM: the bigram count aggregate is THE shuffle (any n-gram LM
      // training pays it — KenLM included); both reductions after it are
      // vocabulary-bounded and the scoring joins broadcast, so time should
      // track ~2 tokenize scans + one bigram-count shuffle, linear in corpus
      Seq("bigram_logprob" -> (() =>
        graft.ops.TextAnalysis.bigramLogProb(
          spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          vocabCap = 4096, bigramCap = 65536).count())),
      // PQ-ADC at corpus scale: codebook training (iters=1 — production
      // trains on a sample; the full-corpus pass here upper-bounds it) +
      // fused map-only encode + the LUT-broadcast candidate scan. The scan
      // reads 32 small ints + a norm per row instead of 64 floats; scoring
      // is 32 lookups/pair — time should scale with N at a lower constant
      // than ann brute force would
      Seq("ann_pq_adc" -> (() =>
        Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10), 5, dim = 64,
          mSub = 32, ks = 16, nCand = 128, iters = 1).count())),
      // BPE segmentation: encode is a map-only per-token loop against the
      // broadcast merge ranks — time should be ~1 tokenize scan + the
      // string work, with only the per-lang aggregate shuffling
      Seq("bpe_segment_stats" -> (() =>
        graft.PipelineQueries.bpeSegmentStats(spark, dir).count())),
      // IVFPQ at corpus scale (nCells ~ sqrt(N), nprobe 1/16 of cells): the
      // candidate join touches ~nprobe/nCells of the code table per query —
      // against flat PQ's full-scan this is the sublinear production shape;
      // time should be dominated by index construction (two training passes
      // + one map-only encode), with the probe join itself near-free
      Seq("ann_ivfpq" -> (() =>
        Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 10), 5, dim = 64,
          nCells = 1024, nprobe = 64, mSub = 32, ks = 16, nCand = 128,
          iters = 1).count())),
      // the composed nightly-build row: quality gate -> exact dedup -> span
      // removal -> per-lang stats. Cost should track its parts (one quality
      // scan + one text-keyed dedup shuffle + the span machinery) — a
      // super-linear surprise here means the stages interfere
      Seq("corpus_materialize" -> (() =>
        graft.PipelineQueries.corpusMaterialize(spark, dir).count())),
      // same CC computation as dedup_clusters, reliable (FS-backed)
      // checkpoints: the fault-tolerant mode a 100 TB many-iteration run
      // would use. The delta vs dedup_clusters IS the measurement —
      // write-through-FS cost per iteration vs executor block storage.
      Seq("dedup_clusters_reliable" -> (() => {
        val ckpt = s"$dir/ckpt"
        spark.sparkContext.setCheckpointDir(ckpt)
        try graft.PipelineQueries.dedupClusters(spark, dir, reliableCheckpoint = true).count()
        finally {
          val p = new org.apache.hadoop.fs.Path(ckpt)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        }
      })))
    val rotation = loadRotation()
    // r15 verdict #1: the /tmp rotation state doesn't survive a fresh box,
    // so on the driver the canonical order ran the two heaviest ops last
    // and they sentineled in two consecutive COMMITTED artifacts. The
    // committed artifact itself is the cross-box memory: any op whose last
    // archived row is a budget sentinel jumps the queue this run.
    val prioritized = previouslySentineled()
    if (prioritized.nonEmpty)
      System.err.println("[stress] previously-sentineled (run first): " +
        prioritized.toSeq.sorted.mkString(", "))
    val ordered = groups.zipWithIndex
      .sortBy { case (g, idx) =>
        val pri = if (g.exists(t => prioritized.contains(t._1))) 0 else 1
        (pri, g.map(t => rotation.getOrElse(t._1, 0L)).min, idx)
      }
      .map(_._1)
    System.err.println("[stress] run order (least-recently-measured first): " +
      ordered.flatMap(_.map(_._1)).mkString(", "))
    var state = rotation
    // SPARK_GRAFT_STRESS_REPEAT=N re-measures each selected op N times in
    // one process (rows name#2..#N ride along in the JSON) — the
    // determinism protocol: with the AQE re-planning knobs pinned, repeats
    // must land within ±2% first-attempt shuffle of each other.
    val repeat = sys.env.get("SPARK_GRAFT_STRESS_REPEAT")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(1)
    val measured = scala.collection.mutable.Map.empty[String, OpResult]
    val repeated = scala.collection.mutable.ArrayBuffer.empty[OpResult]
    ordered.foreach(_.foreach { case (name, action) =>
      val r0 = guarded(name)(action())
      val r = if (r0.secs >= 0) r0.copy(measuredAt = System.currentTimeMillis() / 1000L) else r0
      measured(name) = r
      if (r.secs >= 0) state = state.updated(name, System.currentTimeMillis())
      var rep = 2
      while (rep <= repeat && r.secs >= 0) {
        val rr = guarded(name)(action())
        repeated += rr.copy(name = s"$name#$rep",
          measuredAt = if (rr.secs >= 0) System.currentTimeMillis() / 1000L else rr.measuredAt)
        rep += 1
      }
    })
    saveRotation(state)
    val ops = groups.flatten.map(t => measured(t._1)) ++ repeated
    // the knobs a shuffle-volume delta would hinge on (r8 verdict #1: make
    // the artifact self-diagnosing; r13 verdict #2: echo every pinned AQE
    // re-planning knob so a cross-run shuffle delta is attributable)
    def eff(k: String): String = spark.conf.getOption(k).getOrElse("default")
    val confEcho = Seq(
      "spark.sql.shuffle.partitions" -> spark.conf.get("spark.sql.shuffle.partitions"),
      "spark.sql.adaptive.enabled" -> eff("spark.sql.adaptive.enabled"),
      "spark.sql.adaptive.coalescePartitions.enabled" ->
        eff("spark.sql.adaptive.coalescePartitions.enabled"),
      "spark.sql.adaptive.skewJoin.enabled" -> eff("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.localShuffleReader.enabled" ->
        eff("spark.sql.adaptive.localShuffleReader.enabled"),
      "spark.graft.checkpoint.storage" ->
        spark.conf.getOption("spark.graft.checkpoint.storage").getOrElse("unset"),
      "ngram.maxDocFreq" -> graft.PipelineQueries.NgramMaxDocFreq.toString,
      "ngram.shufflePartitions" -> ngramParts.toString,
      "minhash.threshold" -> "0.5",
      "spans.kExt/kSeed/minRun" -> "8/24/12"
    )
    StressReport(repDocs, repEmb, nDocs, nVecs, textMb, genSecs, budgetSecs, confEcho, ops)
  }

  /** Minimal JSON string escape for the error field (quotes, backslashes,
    * control chars — exception messages carry paths and newlines).
    */
  private[tools] def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.toString
  }

  def toJson(r: StressReport): String = {
    val ops = r.ops.map { o =>
      val err = if (o.error == null) "" else s""","error":"${jsonEscape(o.error)}""""
      f""""${o.name}":{"secs":${o.secs}%.2f,"rows":${o.rows},"shuffle_write_mb":${o.shuffleWriteMb}%.1f,"canary_ms":${o.canaryMs}%.0f,"tasks":${o.tasks},"attempts":${o.attempts},"first_attempt_shuffle_mb":${o.firstAttemptShuffleMb}%.1f,"first_attempt_shuffle_records":${o.firstAttemptShuffleRecords},"measured_at":${o.measuredAt}$err}"""
    }
      .mkString("{", ",", "}")
    val conf = r.conf.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    f"""{"rep_docs":${r.repDocs},"rep_emb":${r.repEmb},"n_docs":${r.nDocs},"n_vecs":${r.nVecs},"text_mb":${r.textMb}%.0f,"gen_secs":${r.genSecs}%.1f,"budget_secs":${r.budgetSecs},"conf":$conf,"ops":$ops}"""
  }

  /** Local-iteration entry: `runMain graft.tools.StressPipeline [repDocs] [repEmb] [baseSf]`. */
  def main(args: Array[String]): Unit = {
    val repDocs = args.headOption.map(_.toInt).getOrElse(700)
    val repEmb = args.lift(1).map(_.toInt).getOrElse(500)
    val baseSf = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(toJson(run(spark, baseSf, repDocs, repEmb)))
    spark.stop()
  }
}
