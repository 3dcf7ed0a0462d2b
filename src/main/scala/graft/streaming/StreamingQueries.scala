package graft.streaming

import graft.RoundTrip
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** SURVEY §2 D7 as a driver-gated query: Structured Streaming over a 4mz
  * directory (the SAME typed-csv FileFormat powers readStream), hourly
  * tumbling aggregation, memory sink drained with processAllAvailable — the
  * finished result is a plain DataFrame the DuckDB oracle checks like any
  * batch query. countDistinct is excluded (unsupported in streaming aggs);
  * everything else matches the batch q_events_hourly semantics.
  */
object StreamingQueries {

  private val counter = new java.util.concurrent.atomic.AtomicLong()

  def streamingEventsHourly(spark: SparkSession, sfDir: String): DataFrame = {
    val micro = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val (dir, schema) = RoundTrip.ensureRoundTrip(spark, sfDir, "events", "zstd-1", micro)
    val stream = spark.readStream
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
    val name = s"graft_stream_hourly_${counter.incrementAndGet()}"
    // state-store partitions are fixed at stream start from
    // spark.sql.shuffle.partitions; ~3.4k windows need few partitions, and
    // every extra one adds per-batch store open/commit overhead
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try agg.writeStream
        .outputMode(OutputMode.Complete())
        .format("memory")
        .queryName(name)
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).orderBy(col("hour"), col("event_type"))
  }

  /** Same aggregate over the raw parquet in DuckDB: window(1 hour).start ==
    * date_trunc('hour', ts) for epoch-aligned tumbling windows.
    */
  val streamingEventsHourlySql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin
}
