package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SURVEY §2 D7: Structured Streaming over 4mc directories. The same
  * FileFormat powers `readStream`, so a directory of container files is a
  * tailable source; windowed aggregation with watermark and custom state via
  * flatMapGroupsWithState both run over it.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def eventsAsFourMc(dir: String): Unit = {
    import spark.implicits._
    spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", $"ts".cast(TimestampType))
      .select(concat_ws("|", $"event_id", date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSS"),
        $"user_id", $"event_type", $"value").as("value"))
      .repartition(4)
      .write.mode("overwrite").format("4mc").option("codec", "lz4-fast").save(dir)
  }

  private def parse(df: org.apache.spark.sql.DataFrame) = {
    val p = split(col("value"), "\\|")
    df.select(
      p(0).cast(LongType).as("event_id"),
      to_timestamp(p(1), "yyyy-MM-dd HH:mm:ss.SSS").as("ts"),
      p(2).cast(LongType).as("user_id"),
      p(3).as("event_type"),
      p(4).cast(DoubleType).as("value")
    )
  }

  test("streaming windowed agg over 4mc dir equals batch result") {
    val dir = Files.createTempDirectory("stream4mc").toString + "/events"
    eventsAsFourMc(dir)
    val schema = StructType(Seq(StructField("value", StringType)))

    val stream = spark.readStream.format("4mc").schema(schema).load(dir)
    val agg = parse(stream)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName("ev_agg")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("ev_agg").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = parse(spark.read.format("4mc").load(dir))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming 4mc SINK: writeStream.format(\"4mc\") produces readable container files") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("streamsrc").toString + "/in"
    eventsAsFourMc(srcDir)
    val outDir = Files.createTempDirectory("streamsink").toString + "/out"
    val ckDir = Files.createTempDirectory("streamck").toString
    val schema = StructType(Seq(StructField("value", StringType)))
    val q = spark.readStream.format("4mc").schema(schema).load(srcDir)
      .writeStream.format("4mc")
      .option("codec", "zstd-3")
      .option("checkpointLocation", ckDir)
      .option("path", outDir)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val files = new java.io.File(outDir).listFiles.filter(_.getName.startsWith("part-"))
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".4mz")), files.map(_.getName).mkString(","))
    val n = spark.read.format("4mc").load(outDir).count()
    val want = spark.read.format("4mc").load(srcDir).count()
    assert(n == want && n > 0)
  }

  test("foreachBatch ingest into 4mc preserves every row across micro-batches") {
    val out = StreamingQueries.streamingIngestFourMc(spark, "/root/testdata/sf0.001")
    val got = out.agg(sum(col("n_events"))).head().getLong(0)
    val want = graft.Queries.table(spark, "/root/testdata/sf0.001", "events").count()
    assert(got == want, s"ingested $got events, source has $want")
  }

  test("batch-commit ingest with bloomColumns publishes bloom-bearing files") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-stream-bloom").toString
    val batch = (0L until 50000L).map(i => ((i * 2654435761L) % 50000L, "z" * 30))
      .toDF("k", "pad")
    graft.streaming.FourMcBatchCommit.writeBatch(batch, 0L, out,
      Map("payload" -> "csv", "bloomColumns" -> "k"))
    val f = new java.io.File(out).listFiles
      .filter(f => f.getName.endsWith(".4mc") && !f.getName.startsWith("_")).head
    val in = graft.format.McInput.local(f.toPath)
    try {
      val idx = graft.format.FourMcReader.readIndex(in)
      assert(idx.blooms.isDefined && idx.blooms.get.ordOf(0) >= 0,
        "streamed files must carry the bloom segment (writeOpts passthrough)")
      assert(idx.stats.isDefined)
    } finally in.close()
  }

  test("partitioned ingest prunes partitions on read-back and keeps every row") {
    val sf = "/root/testdata/sf0.001"
    val out = StreamingQueries.streamingIngestPartitioned(spark, sf)
    // correctness: the click-hourly aggregate equals the batch answer
    val gotClicks = out.agg(sum(col("n_events"))).head().getLong(0)
    val src = graft.Queries.table(spark, sf, "events")
    assert(gotClicks == src.filter(col("event_type") === "click").count())
    // pruning: the filtered read-back scan carries a PartitionFilters entry
    // on event_type and zero pushed data filters for it
    val dir = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_stream_ingest_part_${java.lang.Integer.toHexString(sf.hashCode)}")
    assert(dir.listFiles().exists(f => f.getName.startsWith("event_type=")), "hive layout expected")
    val pruned = StreamingQueries.readIngestedPartitioned(spark, dir.getAbsolutePath, src.schema)
      .filter(col("event_type") === "purchase")
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("event_type"),
      s"no partition pruning in:\n${planStr.take(800)}")
    assert(pruned.count() == src.filter(col("event_type") === "purchase").count())
  }

  test("watermarked append-mode query emits exactly the closed windows, isolated session") {
    val sf = "/root/testdata/sf0.001"
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val viewsBefore = spark.catalog.listTables().count()
    val got = graft.streaming.StreamingQueries.streamingEventsWatermarked(spark, sf).collect()
    // session hygiene: the stream ran in an isolated session — the caller's
    // conf is untouched and no memory-sink temp view leaked into any catalog
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prevShuffle)
    assert(spark.catalog.listTables().count() == viewsBefore)
    assert(got.nonEmpty)
    // closed-window semantics: everything up to max(ts)-17min window end,
    // nothing after — i.e. the batch result minus the still-open windows
    import spark.implicits._
    val events = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", $"ts".cast(TimestampType))
    val maxTs = events.agg(max($"ts")).head().getTimestamp(0)
    val wmMs = maxTs.getTime - 17 * 60 * 1000
    val batch = events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .select($"window.start".as("hour"), $"window.end".as("end"), $"event_type", $"n_events")
      .collect()
    val wantClosed = batch.filter(_.getTimestamp(1).getTime <= wmMs)
      .map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3))).toSet
    val gotSet = got.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(gotSet == wantClosed,
      s"${gotSet.size} emitted vs ${wantClosed.size} closed windows (of ${batch.length} total)")
    assert(gotSet.size < batch.length, "some windows must remain open for the test to mean anything")
  }

  test("complete-mode hourly query leaves no temp view or conf mutation behind") {
    val sf = "/root/testdata/sf0.001"
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val got = graft.streaming.StreamingQueries.streamingEventsHourly(spark, sf)
    assert(got.count() > 0)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prevShuffle)
    assert(spark.catalog.listTables().filter(_.name.startsWith("graft_stream")).isEmpty)
  }

  test("dropDuplicatesWithinWatermark ingest drops planted redeliveries exactly") {
    val base = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    val out = StreamingQueries.streamingDedupIngest(spark, "/root/testdata/sf0.001")
    val total = out.agg(sum("n_events")).head().getLong(0)
    // every unique event exactly once: planted redeliveries (every 5th id,
    // +20% volume) must disappear; a pass-through would yield base * 1.2
    assert(total == base, s"deduped stream carried $total events, expected $base")
  }

  test("stream-stream interval join equals the batch bounded range join") {
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamingQueries.streamingIntervalJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = graft.ops.TemporalJoins.rangeViewClick(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch,
      s"stream-stream join diverged from batch range join: $streamed vs $batch")
    assert(streamed.nonEmpty, "fixture must produce at least one conversion pair")
  }

  test("stateful flatMapGroupsWithState: per-user event counting") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream4mc2").toString + "/events"
    eventsAsFourMc(dir)
    val schema = StructType(Seq(StructField("value", StringType)))
    val stream = parse(spark.readStream.format("4mc").schema(schema).load(dir))

    case class UserCount(user_id: Long, n: Long)
    val counted = stream
      .as[(Long, java.sql.Timestamp, Long, String, Double)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp, Long, String, Double)],
         state: GroupState[Long]) => {
          val prev = state.getOption.getOrElse(0L)
          val now = prev + it.size
          state.update(now)
          Iterator((uid, now))
        }
      )
      .toDF("user_id", "n")
    val q = counted.writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName("user_counts")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val got = spark.table("user_counts")
      .groupBy($"user_id").agg(max($"n").as("n"))
    val want = parse(spark.read.format("4mc").load(dir))
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    assert(got.join(want, Seq("user_id")).filter(got("n") =!= want("n")).count() == 0)
    assert(got.count() == want.count())
  }

  test("stateful session windows: closed sessions match the batch gap-split") {
    import spark.implicits._
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val out = StreamingQueries.streamingSessionsStateful(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out.nonEmpty)
    // batch mirror: gap >= 30 min starts a new session; keep sessions closed
    // at the final watermark (max ts floored to ms − 17 min)
    val ev = graft.Queries.events(spark, "/root/testdata/sf0.001")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    // watermark is ms-floored, but Spark compares the session's FULL-micro
    // end (last event + gap) against it — keep micros on the session side
    val wmMicros = (ev.agg(max(unix_millis($"ts"))).head().getLong(0) - 17 * 60 * 1000) * 1000L
    val sess = ev
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_s",
        when($"prev_ts".isNull || unix_micros($"ts") - unix_micros($"prev_ts") >= 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum($"new_s").over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy($"user_id", $"sid")
      .agg(count(lit(1)).as("n"), max($"ts").as("last_ts"))
      .filter(unix_micros($"last_ts") + 1800000000L <= wmMicros)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n").as("n_events"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out == sess)
    // session hygiene: caller conf untouched
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("batch-commit protocol: replay and crash-between-publish-and-marker cause no duplicates") {
    import spark.implicits._
    val out = Files.createTempDirectory("commit4mc").toString + "/sink"
    val opts = Map("payload" -> "csv")
    def sinkRows(): Seq[Long] = {
      val schema = StructType(Seq(StructField("k", LongType), StructField("s", StringType)))
      spark.read.format("4mc").option("payload", "csv").schema(schema).load(out)
        .select($"k").as[Long].collect().toSeq.sorted
    }
    val b0 = (0L until 100L).map(k => (k, s"v$k")).toDF("k", "s")
    val b1 = (100L until 180L).map(k => (k, s"v$k")).toDF("k", "s")
    FourMcBatchCommit.writeBatch(b0, 0L, out, opts)
    FourMcBatchCommit.writeBatch(b1, 1L, out, opts)
    assert(sinkRows() == (0L until 180L))
    // replay after crash-after-commit: marker present → publish nothing
    FourMcBatchCommit.writeBatch(b1, 1L, out, opts)
    assert(sinkRows() == (0L until 180L))
    // crash BETWEEN publish and marker: files are live, marker missing —
    // the retry must supersede them without duplicating
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out, "_commits/1"), false)
    FourMcBatchCommit.writeBatch(b1, 1L, out, opts)
    assert(sinkRows() == (0L until 180L), "retry after torn publish must not duplicate")
    assert(fs.exists(new org.apache.hadoop.fs.Path(out, "_commits/1")))
    // crash AFTER marker creation but BEFORE _tmp cleanup: the replay must
    // drop the orphaned _tmp copy instead of leaking a whole batch on disk
    val orphan = new org.apache.hadoop.fs.Path(out, "_tmp/batch-1")
    fs.mkdirs(orphan)
    FourMcBatchCommit.writeBatch(b1, 1L, out, opts)
    assert(!fs.exists(orphan), "replay of a committed batch must clean its _tmp leftovers")
    assert(sinkRows() == (0L until 180L))
  }

  test("streaming restart after a crash between sink write and checkpoint commit: exactly-once") {
    import spark.implicits._
    val base = Files.createTempDirectory("restart4mc").toString
    val srcDir = s"$base/src"
    eventsAsFourMc(srcDir)
    val nSrc = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    val out = s"$base/sink"
    val ckpt = s"$base/ckpt"
    val schema = StructType(Seq(StructField("value", StringType)))
    // First run: crash AFTER the sink committed batch 1 but BEFORE the
    // checkpoint recorded it — the exact at-least-once window the protocol
    // exists for. The thrown error fails the query like a killed executor.
    def run(crashAfterBatch: Long): Option[Throwable] = {
      val q = spark.readStream.format("4mc").schema(schema)
        .option("maxFilesPerTrigger", "1").load(srcDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          FourMcBatchCommit.writeBatch(b, id, out, Map.empty)
          if (id == crashAfterBatch)
            throw new RuntimeException("injected crash after sink commit")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try { q.awaitTermination(); None }
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException => Some(e) }
      finally q.stop()
    }
    val crash = run(crashAfterBatch = 1L)
    assert(crash.exists(_.getMessage.contains("injected crash")), s"crash must surface: $crash")
    // Restart with the same checkpoint: batch 1 replays (its offsets were
    // never committed), the marker skips its publish, remaining batches run.
    assert(run(crashAfterBatch = -1L).isEmpty)
    val got = spark.read.format("4mc").load(out).count()
    assert(got == nSrc, s"sink rows $got != source rows $nSrc after crash+restart")
    // every source file landed through >= 3 distinct committed batches
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = fs.listStatus(new org.apache.hadoop.fs.Path(out, "_commits")).length
    assert(commits >= 3, s"expected >=3 commit markers, got $commits")
  }
}
