package graft.streaming

import graft.RoundTrip
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** SURVEY §2 D7 as driver-gated queries: Structured Streaming over a 4mz
  * directory (the SAME typed-csv FileFormat powers readStream), hourly
  * tumbling aggregation, memory sink drained with processAllAvailable — the
  * finished result is a plain DataFrame the DuckDB oracle checks like any
  * batch query. countDistinct is excluded (unsupported in streaming aggs);
  * everything else matches the batch q_events_hourly semantics.
  *
  * Session hygiene: each query runs in `spark.newSession()` — the state-store
  * partition override and the memory-sink temp view live and die in that
  * session, so concurrent planning on the caller's session never sees a
  * mutated `spark.sql.shuffle.partitions` and no temp view accumulates per
  * invocation (the r3 leak). The sink's rows stay reachable through the
  * returned DataFrame's analyzed plan after the view is dropped.
  */
object StreamingQueries {

  private val counter = new java.util.concurrent.atomic.AtomicLong()

  /** Complete-mode formulation: the full window range re-emits every batch.
    * Correct for bounded backfills; for unbounded 100-TB ingest use
    * [[streamingEventsWatermarked]], which only materializes closed windows.
    */
  def streamingEventsHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val micro = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val (dir, schema) = RoundTrip.ensureRoundTrip(spark, sfDir, "events", "zstd-1", micro)
    val session = spark.newSession()
    val stream = session.readStream
      .format("4mc")
      .option("payload", "csv")
      .option("timestampFormat", micro)
      .schema(schema)
      .load(dir)
    val agg = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value")
      )
      .select(col("window.start").as("hour"), col("event_type"), col("n_events"), col("sum_value"))
    drain(session, agg, OutputMode.Complete())
      .orderBy(col("hour"), col("event_type"))
  }

  /** Same aggregate over the raw parquet in DuckDB: window(1 hour).start ==
    * date_trunc('hour', ts) for epoch-aligned tumbling windows.
    */
  val streamingEventsHourlySql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** The 100-TB output pattern: watermarked APPEND mode. Each hourly window
    * is emitted exactly once, when the event-time watermark
    * (max ts − 17 min) passes its end — state for closed windows is dropped,
    * so state-store size is bounded by the windows inside the lateness
    * horizon, not the stream's history, and the sink receives each result
    * row once instead of a full re-emit per batch. Draining a bounded
    * directory yields every window whose end ≤ final watermark; the last
    * (still-open) windows are exactly the ones the oracle's HAVING clause
    * excludes.
    */
  def streamingEventsWatermarked(spark: SparkSession, sfDir: String): DataFrame = {
    val micro = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val (dir, schema) = RoundTrip.ensureRoundTrip(spark, sfDir, "events", "zstd-1", micro)
    val session = spark.newSession()
    val stream = session.readStream
      .format("4mc")
      .option("payload", "csv")
      .option("timestampFormat", micro)
      .schema(schema)
      .load(dir)
    val agg = stream
      .withWatermark("ts", "17 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value")
      )
      .select(col("window.start").as("hour"), col("event_type"), col("n_events"), col("sum_value"))
    drain(session, agg, OutputMode.Append())
      .orderBy(col("hour"), col("event_type"))
  }

  /** DuckDB mirror: append mode emits a window once its end is at or below
    * the final watermark = max(ts) floored to milliseconds (Spark tracks
    * event time in millis) minus the 17-minute delay.
    */
  val streamingEventsWatermarkedSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2
      |HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <=
      |  (SELECT to_timestamp(epoch_ms(max(ts)) / 1000.0) - INTERVAL 17 MINUTE FROM events)
      |ORDER BY hour, event_type""".stripMargin

  /** Stateful session windows in APPEND mode: `session_window(ts, 30 min)`
    * per user — windows merge while consecutive gaps stay under 30 minutes
    * and close (emit + state drop) when the watermark passes `last event +
    * gap`. The state store holds only OPEN sessions, so at 100 TB its size
    * tracks concurrently-active users inside the lateness horizon, not
    * history. Drained result is re-aggregated per user over the CLOSED
    * sessions; the oracle mirrors the gap-split (new session when the gap is
    * >= 30 min — session_window's interval end is exclusive) and the closing
    * condition.
    */
  def streamingSessionsStateful(spark: SparkSession, sfDir: String): DataFrame = {
    val micro = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val (dir, schema) = RoundTrip.ensureRoundTrip(spark, sfDir, "events", "zstd-1", micro)
    val session = spark.newSession()
    val stream = session.readStream
      .format("4mc")
      .option("payload", "csv")
      .option("timestampFormat", micro)
      .schema(schema)
      .load(dir)
    val perSession = stream
      .withWatermark("ts", "17 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_session_events"))
      .select(col("user_id"), col("n_session_events"))
    drain(session, perSession, OutputMode.Append())
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_session_events")).as("n_events")
      )
      .orderBy(col("user_id"))
  }

  /** DuckDB mirror: gap-split sessionization (>= 30 min starts a new
    * session), keep sessions whose `max(ts) + 30 min` is at or below the
    * final watermark, re-aggregate per user.
    */
  val streamingSessionsStatefulSql: String =
    """WITH lagged AS (
      |  SELECT user_id, ts, event_id,
      |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events
      |), numbered AS (
      |  SELECT user_id, ts,
      |    SUM(CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
      |        THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM lagged
      |), sess AS (
      |  SELECT user_id, sid, COUNT(*) AS n_session_events, MAX(ts) AS last_ts
      |  FROM numbered GROUP BY 1, 2
      |)
      |SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_session_events) AS BIGINT) AS n_events
      |FROM sess
      |WHERE last_ts + INTERVAL 30 MINUTE <=
      |  (SELECT to_timestamp(epoch_ms(max(ts)) / 1000.0) - INTERVAL 17 MINUTE FROM events)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** At-least-once ingest dedup — the streaming dedup every production
    * pipeline runs in front of its corpus: redelivered events (same
    * event_id) are dropped by `dropDuplicatesWithinWatermark`, whose state
    * store holds only the ids inside the watermark horizon — at 100 TB/day
    * the dedup state tracks the lateness window (minutes of ids), not the
    * stream's history, which is what makes exactly-once-by-key ingest
    * feasible on an unbounded stream. A deterministic redelivery is planted
    * map-side (every 5th event_id arrives twice, identical payload), so the
    * oracle over the clean table proves the duplicates were dropped: if
    * dedup failed, every planted event_type count would inflate.
    */
  def streamingDedupIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val micro = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val (dir, schema) = RoundTrip.ensureRoundTrip(spark, sfDir, "events", "zstd-1", micro)
    val session = spark.newSession()
    val stream = session.readStream
      .format("4mc")
      .option("payload", "csv")
      .option("timestampFormat", micro)
      .schema(schema)
      .load(dir)
    val redelivered = stream
      .withColumn("_copy",
        explode(when(col("event_id") % 5 === 0, array(lit(0), lit(1)))
          .otherwise(array(lit(0)))))
      .drop("_copy")
    val deduped = redelivered
      .withWatermark("ts", "17 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    // dedup is pass-through stateful: rows emit immediately, the watermark
    // only drives state eviction — so the drained append stream carries every
    // unique event exactly once; aggregate batch-side for a compact oracle row
    drain(session, deduped, OutputMode.Append())
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value")
      )
      .orderBy(col("event_type"))
  }

  /** Redeliveries carry identical payloads, so the deduped stream must equal
    * the clean source table under any aggregate.
    */
  val streamingDedupIngestSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Stream-stream INTERVAL join: view→click conversions within 5 minutes
    * per user, joined while BOTH sides are unbounded streams — the streaming
    * twin of the batch `range_join_view_click` row (same semantics, same
    * oracle SQL). Both sides carry a watermark and the join condition bounds
    * the event-time distance, which is exactly what lets Spark evict join
    * state: a buffered view row can only ever match clicks inside
    * `(v_ts, v_ts + 5 min]`, so once the click-side watermark passes
    * `v_ts + 5 min` the row is dropped. At 100 TB the state store therefore
    * holds only the lateness horizon + 5 minutes of each stream — not
    * history — while an unwatermarked stream-stream join would buffer
    * forever.
    *
    * Inner joins emit each match as it is found (the watermark is needed for
    * state EVICTION, not emission), so draining the bounded directory yields
    * every qualifying pair; the per-user count happens batch-side on the
    * drained result, keeping the stream itself single-stateful-operator.
    */
  def streamingIntervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val micro = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val (dir, schema) = RoundTrip.ensureRoundTrip(spark, sfDir, "events", "zstd-1", micro)
    val session = spark.newSession()
    def src() = session.readStream
      .format("4mc")
      .option("payload", "csv")
      .option("timestampFormat", micro)
      .schema(schema)
      .load(dir)
    val views = src().filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    val clicks = src().filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val joined = views.join(clicks,
      col("v_user") === col("c_user") &&
        col("c_ts") > col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 5 MINUTES"))
    drain(session, joined, OutputMode.Append())
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  /** Identical semantics to the batch bounded range join, so it shares that
    * row's oracle formulation.
    */
  val streamingIntervalJoinSql: String = graft.ops.TemporalJoins.rangeViewClickSql

  /** LEFT OUTER stream-stream interval join — the semantics the inner row
    * cannot show: a view with NO click inside (v_ts, v_ts+5min] emits with
    * nulls only once the GLOBAL watermark (min across both streams, each
    * max-event-time − 10 min) passes v_ts + 5 min — before that, a matching
    * click could still arrive, so the row must wait in state. Matched pairs
    * still emit immediately. Draining a bounded directory therefore yields
    * every matched pair plus exactly the unmatched views whose match window
    * closed under the final watermark — views near the stream's end stay
    * unreported, and the oracle states that cutoff explicitly.
    *
    * This is the 100 TB "conversion funnel with explicit non-conversions"
    * shape: state is bounded by the lateness horizon + the join window, and
    * non-converting impressions surface as soon as their window closes
    * instead of at end-of-day batch.
    */
  def streamingIntervalJoinOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val micro = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val (dir, schema) = RoundTrip.ensureRoundTrip(spark, sfDir, "events", "zstd-1", micro)
    val session = spark.newSession()
    def src() = session.readStream
      .format("4mc")
      .option("payload", "csv")
      .option("timestampFormat", micro)
      .schema(schema)
      .load(dir)
    val views = src().filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    val clicks = src().filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val joined = views.join(clicks,
      col("v_user") === col("c_user") &&
        col("c_ts") > col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 5 MINUTES"),
      "leftOuter")
    drain(session, joined, OutputMode.Append())
      .groupBy(col("v_user").as("user_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("c_ts")).as("n_matched"),
        sum(when(col("c_ts").isNull, 1L).otherwise(0L)).as("n_unmatched"))
      .orderBy(col("user_id"))
  }

  /** Matched pairs are the plain interval join; unmatched views appear iff
    * the final global watermark = min(max view ts, max click ts) − 10 min
    * (floored to millis, as Spark tracks event time) has passed
    * v_ts + 5 min.
    */
  val streamingIntervalJoinOuterSql: String =
    """WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
      |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
      |wm AS (
      |  SELECT least((SELECT to_timestamp(epoch_ms(max(ts)) / 1000.0) FROM v),
      |               (SELECT to_timestamp(epoch_ms(max(ts)) / 1000.0) FROM c))
      |         - INTERVAL 10 MINUTE AS w
      |),
      |matched AS (
      |  SELECT v.user_id, v.ts AS v_ts, c.ts AS c_ts
      |  FROM v JOIN c ON v.user_id = c.user_id
      |    AND epoch_us(c.ts) > epoch_us(v.ts)
      |    AND epoch_us(c.ts) <= epoch_us(v.ts) + 300000000
      |),
      |unmatched AS (
      |  SELECT vv.user_id
      |  FROM v vv
      |  WHERE NOT EXISTS (
      |      SELECT 1 FROM c WHERE c.user_id = vv.user_id
      |        AND epoch_us(c.ts) > epoch_us(vv.ts)
      |        AND epoch_us(c.ts) <= epoch_us(vv.ts) + 300000000)
      |    AND vv.ts + INTERVAL 5 MINUTE < (SELECT w FROM wm)
      |),
      |unioned AS (
      |  SELECT user_id, 1 AS m FROM matched
      |  UNION ALL
      |  SELECT user_id, 0 AS m FROM unmatched
      |)
      |SELECT user_id, COUNT(*) AS n_rows,
      |  CAST(SUM(m) AS BIGINT) AS n_matched,
      |  CAST(SUM(1 - m) AS BIGINT) AS n_unmatched
      |FROM unioned GROUP BY 1 ORDER BY user_id""".stripMargin

  /** Streaming ingest INTO the container — the reference format's primary
    * production pattern (logs stream in, land as splittable compressed
    * files): readStream over the 4mz dir in bounded micro-batches
    * (maxFilesPerTrigger + AvailableNow), each batch APPENDED to a fresh
    * 4mc/lz4 directory via foreachBatch, then the sink dir is read back
    * through the splittable batch reader and aggregated hourly.
    *
    * At 100 TB this is the durable-sink shape (no driver materialization at
    * all — the memory-sink queries exist for the oracle gate): state is
    * zero (no agg inside the stream), each executor writes its own block-
    * aligned files, and downstream batch jobs split them independently of
    * the micro-batch boundaries.
    */
  def streamingIngestFourMc(spark: SparkSession, sfDir: String): DataFrame = {
    val micro = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val (srcDir, schema) = RoundTrip.ensureRoundTrip(spark, sfDir, "events", "zstd-1", micro)
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "8")
    // ONE deterministic sink dir per source sf, wiped before each ingest:
    // append across invocations would duplicate rows, and deleteOnExit
    // cannot remove non-empty directories — this bounds /tmp usage at one
    // ingested copy per sf instead of leaking one per invocation.
    val out = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_stream_ingest_${java.lang.Integer.toHexString(sfDir.hashCode)}")
    if (out.exists()) {
      val fs = new org.apache.hadoop.fs.Path(out.getAbsolutePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out.getAbsolutePath), true)
    }
    val q = session.readStream
      .format("4mc")
      .option("payload", "csv")
      .option("timestampFormat", micro)
      .option("maxFilesPerTrigger", "4")
      .schema(schema)
      .load(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // batch-id commit protocol: a replayed micro-batch (crash between
        // the sink write and the checkpoint commit) publishes zero new files
        FourMcBatchCommit.writeBatch(batch, batchId, out.getAbsolutePath,
          Map("payload" -> "csv", "timestampFormat" -> micro, "codec" -> "lz4-medium"))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    spark.read
      .format("4mc")
      .option("payload", "csv")
      .option("timestampFormat", micro)
      .schema(schema)
      .load(out.getAbsolutePath)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value")
      )
      .orderBy(col("hour"), col("event_type"))
  }

  /** Ingest preserves every row and value exactly, so the oracle is the
    * plain batch aggregate over the raw parquet.
    */
  val streamingIngestFourMcSql: String = streamingEventsHourlySql

  /** Partitioned variant of [[streamingIngestFourMc]] — the standard lake
    * layout: each micro-batch appends hive-partitioned
    * (`event_type=.../part-*.4mc`) files, and the read-back query filters
    * one partition so the scan plans PartitionFilters and never opens the
    * other directories (pruning pinned in StreamingSpec). At 100 TB the
    * partition column is the coarse access path and the footer block index
    * parallelizes within each partition's files.
    */
  def streamingIngestPartitioned(spark: SparkSession, sfDir: String): DataFrame = {
    val micro = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val (srcDir, schema) = RoundTrip.ensureRoundTrip(spark, sfDir, "events", "zstd-1", micro)
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "8")
    val out = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_stream_ingest_part_${java.lang.Integer.toHexString(sfDir.hashCode)}")
    if (out.exists()) {
      val p = new org.apache.hadoop.fs.Path(out.getAbsolutePath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    val q = session.readStream
      .format("4mc")
      .option("payload", "csv")
      .option("timestampFormat", micro)
      .option("maxFilesPerTrigger", "4")
      .schema(schema)
      .load(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        FourMcBatchCommit.writeBatch(batch, batchId, out.getAbsolutePath,
          Map("payload" -> "csv", "timestampFormat" -> micro, "codec" -> "lz4-medium"),
          partitionBy = Seq("event_type"))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    readIngestedPartitioned(spark, out.getAbsolutePath, schema)
      .filter(col("event_type") === "click")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value")
      )
      .orderBy(col("hour"))
  }

  /** Batch read of a partitioned ingest dir (partition column resolved by
    * name from the dir layout; data files carry the remaining columns).
    */
  private[streaming] def readIngestedPartitioned(
      spark: SparkSession,
      dir: String,
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.read
      .format("4mc")
      .option("payload", "csv")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .schema(schema)
      .load(dir)

  val streamingIngestPartitionedSql: String =
    """SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_type = 'click'
      |GROUP BY 1 ORDER BY hour""".stripMargin

  /** Start `agg` against an in-memory sink on `session`, drain it fully, and
    * return the result with the temp view already dropped. The state-store
    * partition count (fixed at stream start from
    * `spark.sql.shuffle.partitions`) is set on the isolated session only:
    * ~3.4k windows need few partitions, and every extra one adds per-batch
    * store open/commit overhead.
    *
    * 8 partitions is measured-optimal for the stateful queries at sf0.1
    * (round-7 sweep on streaming_sessions_stateful: 2 parts 2.43 s, 4 parts
    * 2.13 s, 8 parts 2.15 s, 16 parts 3.12 s; sessionWindow local-merge
    * made it worse, 2.02 → 2.39 s — too few rows per user per partition to
    * pay for the extra local sort). The absolute number swings ±40 % with
    * box state across days under identical code+config (1.46 s r5 bench,
    * 1.75 s r6, 2.0-2.4 s isolated r7 sweep) — treat cross-round deltas on
    * this row as environment noise unless the config or plan changed.
    */
  private def drain(session: SparkSession, agg: DataFrame, mode: OutputMode): DataFrame = {
    val name = s"graft_stream_hourly_${counter.incrementAndGet()}"
    session.conf.set("spark.sql.shuffle.partitions", "8")
    val q = agg.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val out = session.table(name)
    session.catalog.dropTempView(name)
    out
  }
}
