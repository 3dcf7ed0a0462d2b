package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 4mc/4mz round-trips of the relational tables: parquet → pipe-delimited
  * lines inside the container → read back → typed columns. Queries over these
  * prove the format layer preserves semantics end-to-end (SURVEY §5.5) — the
  * DuckDB oracle runs against the ORIGINAL parquet, so any loss in the
  * container, the split planner, or the line framing shows up as a hash
  * mismatch.
  *
  * Serialization is exact: Double.toString round-trips (shortest repr),
  * timestamps are formatted/parsed with an explicit millisecond pattern.
  */
object RoundTrip {

  private val tsFmt = "yyyy-MM-dd HH:mm:ss.SSS"

  /** Block size for SORT-CLUSTERED round-trips (1 MiB vs the 4 MiB max). */
  private val SortedBlockBytes = 1 << 20

  /** Source size in DATA bytes: a Spark-written table is a DIRECTORY of
    * part files (File.length() on it returns the ~4 KiB dir entry, which
    * once sized every sf1 round-trip at nFiles=1 — a single-task write).
    */
  private def dataBytes(f: java.io.File): Long =
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids == null) 0L else kids.map(dataBytes).sum
    } else f.length()

  /** Deterministic scratch dir per (table, sf, codec, timestamp format);
    * reused when present. The format is part of the key — two callers
    * requesting different precisions must not share a cache written with
    * whichever format ran first.
    */
  private def rtDir(sfDir: String, tableName: String, codec: String, tsFormat: String): java.io.File = {
    val key = java.lang.Integer.toHexString(sfDir.hashCode)
    val fkey = java.lang.Integer.toHexString(tsFormat.hashCode)
    new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      // rt7: v5 stats segments (joint histograms) since round 17 — a fresh
      // cache root so dirs written before a format change are never
      // silently reused as evidence for the features built on it
      s"graft-rt7/$key/$tableName-$codec-$fkey"
    )
  }

  /** Round-trip `table` through the 4mc container with `codec`, returning a
    * DataFrame with the original column names and types.
    */
  def roundTrip(
      spark: SparkSession,
      sfDir: String,
      tableName: String,
      codec: String = "lz4-fast",
      timestampFormat: String = tsFmt
  ): DataFrame = {
    val (dir, schema) = ensureRoundTrip(spark, sfDir, tableName, codec, timestampFormat)
    // typed csv payload: the FileFormat parses ONLY the columns Catalyst
    // requires (projection pushdown into the parse) — no from_csv struct
    // materialization, no regex split
    spark.read
      .format("4mc")
      .option("payload", "csv")
      .option("timestampFormat", timestampFormat)
      .schema(schema)
      .load(dir)
  }

  /** Write (once) the typed-csv 4mc round-trip of `tableName`; returns the
    * directory and schema — the same dir also serves as a readStream source.
    */
  def ensureRoundTrip(
      spark: SparkSession,
      sfDir: String,
      tableName: String,
      codec: String,
      timestampFormat: String = tsFmt
  ): (String, StructType) = {
    val src = Queries.table(spark, sfDir, tableName)
    val schema = src.schema
    val dir = rtDir(sfDir, tableName, codec, timestampFormat)
    val success = new java.io.File(dir, "_SUCCESS")
    if (!success.exists()) {
      // typed csv payload sink: the writer serializes InternalRow fields
      // directly. File count scales with data size (~2 MiB of source parquet
      // per file, capped at the core count): enough files that the read side
      // fans out, but not a fixed 32 — per-file open overhead dominates the
      // scan when a tiny table is shredded into tiny files. Larger files
      // still parallelize beyond the file count because splits are
      // block-aligned byte ranges, not whole files.
      val srcBytes = dataBytes(new java.io.File(s"$sfDir/$tableName.parquet"))
      val nFiles = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
        (srcBytes + (2 << 20) - 1) / (2 << 20))).toInt
      src
        .repartition(nFiles)
        .write.mode("overwrite").format("4mc")
        .option("payload", "csv")
        .option("timestampFormat", timestampFormat)
        .option("codec", codec)
        .save(dir.getAbsolutePath)
    }
    (dir.getAbsolutePath, schema)
  }

  /** Lineitem re-typed the way a warehouse actually stores it — DATE
    * shipdate, DECIMAL(12,2) money — round-tripped through the container
    * (round 13: native DATE/DECIMAL payload columns, not the timestamp /
    * double adaptations). Cached like every round-trip fixture.
    */
  def typedLineitem(spark: SparkSession, sfDir: String, codec: String = "lz4-fast"): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = rtDir(sfDir, "lineitem-typed", codec, tsFmt)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_quantity", DecimalType(12, 2)),
      StructField("l_extendedprice", DecimalType(12, 2)),
      StructField("l_discount", DecimalType(12, 2)),
      StructField("l_tax", DecimalType(12, 2)),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", DateType)
    ))
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val li = Queries.table(spark, sfDir, "lineitem")
      li.select(
          col("l_orderkey"),
          col("l_quantity").cast(DecimalType(12, 2)).as("l_quantity"),
          col("l_extendedprice").cast(DecimalType(12, 2)).as("l_extendedprice"),
          col("l_discount").cast(DecimalType(12, 2)).as("l_discount"),
          col("l_tax").cast(DecimalType(12, 2)).as("l_tax"),
          col("l_returnflag"), col("l_linestatus"),
          col("l_shipdate").cast(DateType).as("l_shipdate"))
        .repartition(math.max(1, spark.sparkContext.defaultParallelism / 8))
        .write.mode("overwrite").format("4mc")
        .option("payload", "csv").option("codec", codec)
        .save(dir.getAbsolutePath)
    }
    spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir.getAbsolutePath)
  }

  /** The typed lineitem CLUSTERED on `l_shipdate` and written COLUMNAR —
    * the full warehouse stack in one fixture: declared types (DATE epoch
    * days, DECIMAL unscaled longs), a sort key so the stats segment's zone
    * maps actually separate blocks, and per-column sub-streams so surviving
    * blocks decompress only the projected columns.
    */
  def typedLineitemSortedColumnar(
      spark: SparkSession, sfDir: String, codec: String = "lz4-fast"): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = rtDir(sfDir, "lineitem-typed-by-l_shipdate-col", codec, tsFmt)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_quantity", DecimalType(12, 2)),
      StructField("l_extendedprice", DecimalType(12, 2)),
      StructField("l_discount", DecimalType(12, 2)),
      StructField("l_tax", DecimalType(12, 2)),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", DateType)
    ))
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val li = Queries.table(spark, sfDir, "lineitem")
      li.select(
          col("l_orderkey"),
          col("l_quantity").cast(DecimalType(12, 2)).as("l_quantity"),
          col("l_extendedprice").cast(DecimalType(12, 2)).as("l_extendedprice"),
          col("l_discount").cast(DecimalType(12, 2)).as("l_discount"),
          col("l_tax").cast(DecimalType(12, 2)).as("l_tax"),
          col("l_returnflag"), col("l_linestatus"),
          col("l_shipdate").cast(DateType).as("l_shipdate"))
        .repartitionByRange(
          math.max(1, spark.sparkContext.defaultParallelism / 8), col("l_shipdate"))
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite").format("4mc")
        .option("payload", "csv").option("codec", codec)
        .option("layout", "columnar")
        .option("blockBytes", SortedBlockBytes.toString)
        .save(dir.getAbsolutePath)
    }
    spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir.getAbsolutePath)
  }

  /** Q1-shaped pricing summary over the DATE/DECIMAL-typed container: the
    * date filter prunes by zone map, the decimal sums aggregate exact
    * unscaled longs (oracle: DuckDB computes the same casts from parquet).
    */
  private def datePricingOver(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df
      .filter(col("l_shipdate") <= lit(java.sql.Date.valueOf("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast(DoubleType).as("sum_qty"),
        sum(col("l_extendedprice")).cast(DoubleType).as("sum_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def datePricingOverFourMc(spark: SparkSession, sfDir: String): DataFrame =
    datePricingOver(typedLineitem(spark, sfDir))

  /** The same pricing summary over the typed + sorted + COLUMNAR fixture —
    * every scan feature at once: the shipdate range prunes whole blocks by
    * the DATE zone maps, surviving blocks decompress only the 7 projected
    * column streams, and the decimal sums ride exact unscaled longs.
    */
  def datePricingColumnar(spark: SparkSession, sfDir: String): DataFrame =
    datePricingOver(typedLineitemSortedColumnar(spark, sfDir))

  /** Footer-stats MIN/MAX over the typed container's date and decimal
    * columns — the metadata-only aggregate shape, no block decompression.
    */
  def dateMinMaxMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    typedLineitem(spark, sfDir)
      .agg(
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        count(col("l_shipdate")).as("n_ship"))
  }

  /** Footer-stats SUM over DECIMAL columns (round 14): blocks store exact
    * unscaled long sums (overflow-poisoned blocks decode), the stats
    * relation emits DecimalType(p+10, s) partials, and the rewritten
    * aggregate re-sums them under the original eval context — SUM(money)
    * joins the metadata-only lake-ops set with zero blocks decompressed.
    * Output types are Sum's own (DECIMAL(22,2)); the oracle casts to match.
    */
  def decimalSumMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // bare Alias(Sum) outputs keep the Aggregate pushdown-eligible; the
    // double casts live in a Project ABOVE it (oracle type parity — exact
    // decimal totals at these magnitudes are double-representable)
    typedLineitem(spark, sfDir)
      .agg(
        sum(col("l_quantity")).as("sq"),
        sum(col("l_extendedprice")).as("sp"),
        sum(col("l_discount")).as("sd"),
        count(col("l_extendedprice")).as("n_price"),
        count(lit(1)).as("n"))
      .select(
        col("sq").cast(DoubleType).as("sum_qty"),
        col("sp").cast(DoubleType).as("sum_price"),
        col("sd").cast(DoubleType).as("sum_disc"),
        col("n_price"), col("n"))
  }

  val decimalSumMetaSql: String =
    """SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |       CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc,
      |       COUNT(l_extendedprice) AS n_price, COUNT(*) AS n
      |FROM lineitem""".stripMargin

  /** q_json_props re-expressed over a NATIVE `map<string,string>` column
    * (round 13: the csv payload's map type, SURVEY §1.4's `props` shape):
    * events round-trip with props parsed from the JSON string into a real
    * map, and the aggregation reads `element_at(props, 'k')` — no
    * per-row JSON parse on the query side. Oracle identical to
    * q_json_props's.
    */
  def mapPropsOverFourMc(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = rtDir(sfDir, "events-map", "zstd-1", tsFmt)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", MapType(StringType, StringType, valueContainsNull = true))))
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      Queries.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          map(lit("k"), get_json_object(col("props"), "$.k")).as("props"))
        .repartition(math.max(1, spark.sparkContext.defaultParallelism / 8))
        .write.mode("overwrite").format("4mc")
        .option("payload", "csv").option("codec", "zstd-1")
        .save(dir.getAbsolutePath)
    }
    spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir.getAbsolutePath)
      .withColumn("k", element_at(col("props"), "k").cast(LongType))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
      .orderBy(col("k_bucket"))
  }

  /** Positional schema evolution end-to-end (round 15): a directory whose
    * OLD generation (even event_ids) was written WITHOUT the trailing
    * `props` column and whose NEW generation (odd event_ids) carries it.
    * Reading with the full 6-column schema gives NULL props on old rows
    * (the parquet added-column semantics); per-file pruning stays active —
    * predicates on `props` refute old-generation blocks outright
    * (SchemaEvolutionSpec pins the metrics; this row pins values under the
    * DuckDB oracle, where the CASE WHEN reproduces the generation split).
    */
  def schemaEvolutionOverFourMc(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = rtDir(sfDir, "events-twogen", "lz4-fast", tsFmt)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val ev = Queries.events(spark, sfDir)
      val nFiles = math.max(1, spark.sparkContext.defaultParallelism / 16)
      ev.filter(col("event_id") % 2 === 0)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .repartition(nFiles)
        .write.mode("overwrite").format("4mc").option("payload", "csv")
        .option("timestampFormat", tsFmt).save(dir.getAbsolutePath)
      ev.filter(col("event_id") % 2 === 1)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(nFiles)
        .write.mode("append").format("4mc").option("payload", "csv")
        .option("timestampFormat", tsFmt).save(dir.getAbsolutePath)
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    spark.read.format("4mc").option("payload", "csv")
      .option("timestampFormat", tsFmt).schema(schema).load(dir.getAbsolutePath)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count(col("props")).as("n_props"),
        sum(length(col("props"))).as("props_len"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val schemaEvolutionSql: String =
    """SELECT event_type,
      |       COUNT(*) AS n,
      |       COUNT(CASE WHEN event_id % 2 = 1 THEN props END) AS n_props,
      |       CAST(SUM(CASE WHEN event_id % 2 = 1 THEN LENGTH(props) END) AS BIGINT) AS props_len,
      |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q1 over lineitem round-tripped through LZ4 — oracle identical to q1's. */
  def q1OverFourMc(spark: SparkSession, sfDir: String): DataFrame =
    Queries.q1Over(roundTrip(spark, sfDir, "lineitem", "lz4-fast"))

  /** Q1 over lineitem round-tripped through ZSTD (4mz). */
  def q1OverFourMz(spark: SparkSession, sfDir: String): DataFrame =
    Queries.q1Over(roundTrip(spark, sfDir, "lineitem", "zstd-3"))

  /** Columnar-layout round-trip ([[graft.format.ColumnarBlocks]]): every
    * block stores one compressed sub-stream per column, so a k-of-K
    * projection decompresses only its k columns — the structural fix for
    * the row layout's decompress-everything cost on wide tables. Cached
    * like every round-trip fixture (separate key: the layouts must never
    * share a directory).
    */
  def roundTripColumnar(
      spark: SparkSession,
      sfDir: String,
      tableName: String,
      codec: String = "lz4-fast"
  ): DataFrame = {
    val src = Queries.table(spark, sfDir, tableName)
    val schema = src.schema
    val dir = rtDir(sfDir, s"$tableName-columnar", codec, tsFmt)
    val success = new java.io.File(dir, "_SUCCESS")
    if (!success.exists()) {
      val srcBytes = dataBytes(new java.io.File(s"$sfDir/$tableName.parquet"))
      val nFiles = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
        (srcBytes + (2 << 20) - 1) / (2 << 20))).toInt
      src
        .repartition(nFiles)
        .write.mode("overwrite").format("4mc")
        .option("payload", "csv")
        .option("layout", "columnar")
        .option("timestampFormat", tsFmt)
        .option("codec", codec)
        .save(dir.getAbsolutePath)
    }
    spark.read
      .format("4mc")
      .option("payload", "csv")
      .option("timestampFormat", tsFmt)
      .schema(schema)
      .load(dir.getAbsolutePath)
  }

  /** ROW-layout round-trip, explicitly opted out of the columnar default
    * (round 15 flipped csv payloads to `layout=columnar`; `layout=rows` is
    * the opt-out). Kept as a first-class fixture so the legacy layout stays
    * oracle-checked and bench-measured — a reader must handle both layouts
    * per file forever.
    */
  def roundTripRows(
      spark: SparkSession,
      sfDir: String,
      tableName: String,
      codec: String = "lz4-fast"
  ): DataFrame = {
    val src = Queries.table(spark, sfDir, tableName)
    val schema = src.schema
    val dir = rtDir(sfDir, s"$tableName-rows", codec, tsFmt)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val srcBytes = dataBytes(new java.io.File(s"$sfDir/$tableName.parquet"))
      val nFiles = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
        (srcBytes + (2 << 20) - 1) / (2 << 20))).toInt
      src
        .repartition(nFiles)
        .write.mode("overwrite").format("4mc")
        .option("payload", "csv")
        .option("layout", "rows")
        .option("timestampFormat", tsFmt)
        .option("codec", codec)
        .save(dir.getAbsolutePath)
    }
    spark.read
      .format("4mc")
      .option("payload", "csv")
      .option("timestampFormat", tsFmt)
      .schema(schema)
      .load(dir.getAbsolutePath)
  }

  /** Q1 over the explicit ROW-layout lz4 round-trip — the legacy layout's
    * regression row now that the default is columnar.
    */
  def q1OverFourMcRows(spark: SparkSession, sfDir: String): DataFrame =
    Queries.q1Over(roundTripRows(spark, sfDir, "lineitem", "lz4-fast"))

  /** Q1 over the explicit ROW-layout zstd round-trip. */
  def q1OverFourMzRows(spark: SparkSession, sfDir: String): DataFrame =
    Queries.q1Over(roundTripRows(spark, sfDir, "lineitem", "zstd-3"))

  /** Q1 over the COLUMNAR-layout lz4 round-trip — 7 of 16 columns
    * decompressed instead of every byte; oracle identical to q1's.
    */
  def q1OverFourMcColumnar(spark: SparkSession, sfDir: String): DataFrame =
    Queries.q1Over(roundTripColumnar(spark, sfDir, "lineitem", "lz4-fast"))

  /** Q1 over the COLUMNAR-layout zstd round-trip — the fix for the sf5
    * fourmz twin's structural gap (zstd-decompressing 16 columns' bytes for
    * a 7-column projection).
    */
  def q1OverFourMzColumnar(spark: SparkSession, sfDir: String): DataFrame =
    Queries.q1Over(roundTripColumnar(spark, sfDir, "lineitem", "zstd-3"))

  /** COUNT(*) over the container — the metadata-only fast path: an empty
    * projection with no filters is answered from the stats segment's
    * per-block owned-line counts, so the scan reads FOOTERS ONLY (zero
    * blocks decompressed; `FourMcScanMetrics.metadataCountRows`, exactness
    * under arbitrary splits pinned in FourMcFileFormatSpec). The parquet
    * analog is row-group-metadata counting; at 100 TB this turns the most
    * common sanity query into a footer sweep.
    */
  def fourMcCountStar(spark: SparkSession, sfDir: String): DataFrame =
    roundTrip(spark, sfDir, "lineitem", "lz4-fast")
      .agg(count(lit(1)).as("n"))

  val fourMcCountStarSql: String = "SELECT COUNT(*) AS n FROM lineitem"

  /** Unfiltered MIN/MAX + COUNT(*) over the container — the aggregate-
    * pushdown path ([[graft.plans.McAggregatePushdown]]): the plan's scan
    * is the one-row-per-block stats relation, so numeric/timestamp bounds
    * and the count come from footer zone maps with ZERO blocks decompressed
    * (`FourMcScanMetrics.statsAggBlocks`); string bounds ride along and
    * degrade per block to decode only where the 16-byte truncation makes
    * them inexact. Parquet answers the same shapes from row-group metadata
    * via its aggregate pushdown — at 100 TB this is the second-most-common
    * lake sanity query (`MIN/MAX(event_time)` freshness probes) as a footer
    * sweep. Requires the session to carry [[graft.GraftExtensions]].
    */
  def fourMcMinMaxMeta(spark: SparkSession, sfDir: String): DataFrame =
    roundTrip(spark, sfDir, "lineitem", "lz4-fast")
      .agg(
        min(col("l_shipdate")).as("min_ship"), max(col("l_shipdate")).as("max_ship"),
        min(col("l_quantity")).as("min_qty"), max(col("l_extendedprice")).as("max_price"),
        min(col("l_returnflag")).as("min_rf"), max(col("l_linestatus")).as("max_ls"),
        count(lit(1)).as("n"))

  val fourMcMinMaxMetaSql: String =
    """SELECT min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
      |       min(l_quantity) AS min_qty, max(l_extendedprice) AS max_price,
      |       min(l_returnflag) AS min_rf, max(l_linestatus) AS max_ls,
      |       COUNT(*) AS n
      |FROM lineitem""".stripMargin

  /** Write (once) a SORT-CLUSTERED round-trip: rows range-partitioned and
    * sorted by `sortCol`, so the per-block min/max stats segment
    * ([[graft.format.BlockStats]]) actually separates blocks and a selective
    * scan can skip most of them before decompression. This is the declared
    * sort key every columnar warehouse needs for zone-map pruning — parquet
    * row-group min/max is exactly as useless on unclustered data.
    */
  def ensureRoundTripSorted(
      spark: SparkSession,
      sfDir: String,
      tableName: String,
      codec: String,
      sortCol: String,
      timestampFormat: String = tsFmt,
      blockBytes: Int = SortedBlockBytes,
      tsMicros: Boolean = false,
      columnar: Boolean = false
  ): (String, StructType) = {
    val src = Queries.table(spark, sfDir, tableName)
    val schema = src.schema
    // the block size is a write-layout knob, so it is part of the cache key
    // (same rule as timestampFormat): a dir written at another block size
    // must not be silently reused as evidence for this one
    val enc = (if (tsMicros) "-tsmicros" else "") + (if (columnar) "-col" else "")
    val dir = rtDir(sfDir, s"$tableName-by-$sortCol-b${blockBytes >> 10}k$enc", codec,
      timestampFormat)
    val success = new java.io.File(dir, "_SUCCESS")
    if (!success.exists()) {
      // Fewer, bigger files than the unsorted round-trip (~32 MiB of source
      // parquet each): pruning granularity is the 4 MiB BLOCK, so large files
      // cost nothing — and read parallelism comes from block-aligned splits,
      // not file count. This is the 100 TB layout: big sorted files, zone-map
      // skipping inside them.
      val srcBytes = dataBytes(new java.io.File(s"$sfDir/$tableName.parquet"))
      val nFiles = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
        (srcBytes + (32L << 20) - 1) / (32L << 20))).toInt
      src
        .repartitionByRange(nFiles, org.apache.spark.sql.functions.col(sortCol))
        .sortWithinPartitions(sortCol)
        .write.mode("overwrite").format("4mc")
        .option("payload", "csv")
        .option("timestampFormat", timestampFormat)
        .option("codec", codec)
        // small blocks (default 1 MiB vs the 4 MiB max): zone-map pruning
        // works at block granularity, so the sorted layout skips ~4x closer
        // to the true predicate range — worth the small ratio cost on a
        // sorted file
        .option("blockBytes", blockBytes.toString)
        .option("timestampEncoding", if (tsMicros) "micros" else "text")
        .option("layout", if (columnar) "columnar" else "rows")
        .save(dir.getAbsolutePath)
    }
    (dir.getAbsolutePath, schema)
  }

  private def readSorted(
      spark: SparkSession, sfDir: String, tableName: String, codec: String, sortCol: String,
      columnar: Boolean = false
  ): DataFrame = {
    val (dir, schema) =
      ensureRoundTripSorted(spark, sfDir, tableName, codec, sortCol, columnar = columnar)
    spark.read.format("4mc").option("payload", "csv")
      .option("timestampFormat", tsFmt).schema(schema).load(dir)
  }

  /** Q6 over the LZ4 round-trip CLUSTERED on `l_shipdate`: the pushed
    * shipdate range prunes whole 4 MiB blocks against the stats segment
    * before any decompression; surviving blocks still run the in-parse
    * predicate path on the discount/quantity columns.
    */
  def q6OverFourMc(spark: SparkSession, sfDir: String): DataFrame =
    Queries.q6Over(readSorted(spark, sfDir, "lineitem", "lz4-fast", "l_shipdate"))

  /** The same pruned scan through the 4mz (zstd) container — registered
    * separately so block skipping is oracle-checked on both codec families;
    * `FourMcScanMetrics` asserts the skip ratio in the spec layer.
    */
  def q6OverFourMcSkipped(spark: SparkSession, sfDir: String): DataFrame =
    Queries.q6Over(readSorted(spark, sfDir, "lineitem", "zstd-1", "l_shipdate"))

  /** Q6 over a SORT-CLUSTERED COLUMNAR file — the two pruning levels
    * compose: the stats segment skips whole blocks against the shipdate
    * zone maps, and within surviving blocks the columnar cursor
    * decompresses only q6's 4 of 16 column streams, evaluating the pushed
    * range column-major with late materialization. This is the full
    * warehouse read path (sort key + columnar layout + selective I/O) in
    * one oracle-checked query.
    */
  def q6OverFourMcColumnar(spark: SparkSession, sfDir: String): DataFrame =
    Queries.q6Over(readSorted(spark, sfDir, "lineitem", "lz4-fast", "l_shipdate",
      columnar = true))

  /** The zstd twin of [[q6OverFourMcColumnar]] — pruning + selective
    * decompression on the high-ratio codec family.
    */
  def q6OverFourMzColumnar(spark: SparkSession, sfDir: String): DataFrame =
    Queries.q6Over(readSorted(spark, sfDir, "lineitem", "zstd-1", "l_shipdate",
      columnar = true))

  /** Q6 over a file sorted by the PUBLIC writer option
    * (`option("sortBy", "l_shipdate")`, [[graft.plans.McSortedWrite]],
    * round 15) rather than the fixtures' hand-rolled `repartitionByRange` +
    * `sortWithinPartitions`: the one-option path a user actually takes to
    * the zone-map/elision composition. McSortedWriteSpec pins the skip and
    * elision metrics; this row pins end-to-end correctness under the
    * DuckDB oracle.
    */
  def q6OverFourMcSortBy(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Queries.table(spark, sfDir, "lineitem")
    val schema = src.schema
    val dir = rtDir(sfDir, "lineitem-sortby-opt", "lz4-fast", tsFmt)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      src.write.mode("overwrite").format("4mc")
        .option("payload", "csv")
        .option("timestampFormat", tsFmt)
        .option("sortBy", "l_shipdate")
        .option("sortPartitions",
          math.max(1, spark.sparkContext.defaultParallelism / 8).toString)
        .option("blockBytes", SortedBlockBytes.toString)
        .save(dir.getAbsolutePath)
    }
    Queries.q6Over(
      spark.read.format("4mc").option("payload", "csv")
        .option("timestampFormat", tsFmt).schema(schema).load(dir.getAbsolutePath))
  }

  /** Documents through 4mz: per-language doc count + exact char sum. The text
    * itself crosses the container, not just the metadata.
    */
  def documentStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    roundTrip(spark, sfDir, "documents", "zstd-3")
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length($"text")).as("total_chars"),
        min($"doc_id").as("min_doc_id"),
        max($"doc_id").as("max_doc_id")
      )
      .orderBy($"lang")
  }

  val documentStatsSql: String =
    """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(length(text)) AS BIGINT) AS total_chars,
      |  MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Events hourly aggregation over the 4mz round-trip — timestamps with
    * sub-second precision cross the container (micros formatted explicitly),
    * oracle identical to the plain q_events_hourly.
    */
  def eventsHourlyOverFourMz(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Typed csv payload with microsecond timestamps: the reader parses only
    // the projected columns straight from the block bytes — no regex split,
    // no intermediate string row (the hand-rolled variant benched 3.9x
    // parquet; this path is the same machinery as the lineitem roundtrips).
    val back = roundTrip(spark, sfDir, "events", "zstd-1", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    back
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"),
        countDistinct($"user_id").as("n_users")
      )
      .orderBy($"hour", $"event_type")
  }

  /** The classic log-retention scan: events CLUSTERED on `ts` inside the 4mz
    * container (128 KiB blocks — fine pruning granularity for a time-series
    * log), then a 1.5-day window out of the 30-day range aggregated hourly.
    * The pushed ts-range predicate refutes every block whose [min_ts,
    * max_ts] zone lies outside the window BEFORE decompression — ~95% of
    * the file is never inflated (skip ratio pinned in BlockStatsSpec). At
    * 100 TB this is the access path for "last-N-days" queries over an
    * append-ordered event log: sorted container files + block zone maps do
    * what partition-by-date does, at sub-file granularity and without the
    * small-partition explosion.
    */
  def eventsWindowSkipped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val micro = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val (dir, schema) = ensureRoundTripSorted(
      spark, sfDir, "events", "zstd-1", "ts", micro, blockBytes = 128 * 1024)
    val back = spark.read.format("4mc").option("payload", "csv")
      .option("timestampFormat", micro).schema(schema).load(dir)
    back
      .filter($"ts" >= lit("2024-01-10 00:00:00").cast(TimestampType) &&
        $"ts" < lit("2024-01-11 12:00:00").cast(TimestampType))
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value")
      )
      .orderBy($"hour", $"event_type")
  }

  val eventsWindowSkippedSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 12:00:00'
      |GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** The same time-range retention scan over MICROS-encoded timestamps
    * (round 14, `timestampEncoding=micros`): raw int64 tokens instead of
    * formatted text — precision-exact round-trip, allocation-free long
    * parse, and the SAME zone-map pruning (the stats store micros in both
    * encodings; readers detect the tag per file from the stats segment).
    * Oracle identical to [[eventsWindowSkipped]]'s.
    */
  def eventsWindowMicros(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (dir, schema) = ensureRoundTripSorted(
      spark, sfDir, "events", "zstd-1", "ts", blockBytes = 128 * 1024, tsMicros = true)
    val back = spark.read.format("4mc").option("payload", "csv")
      .schema(schema).load(dir)
    back
      .filter($"ts" >= lit("2024-01-10 00:00:00").cast(TimestampType) &&
        $"ts" < lit("2024-01-11 12:00:00").cast(TimestampType))
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value")
      )
      .orderBy($"hour", $"event_type")
  }

  /** Lineitem grouped into HASH BUCKETS of `l_shipmode` (round 14, the
    * dictionary-pruning fixture): each output file holds 1–2 of the 7 modes,
    * so a block's [min, max] STRING RANGE still spans other modes lexically
    * ('MAIL' sits inside [AIR, TRUCK]) and zone maps cannot refute an
    * equality — but the complete per-block value DICTIONARY
    * ([[graft.format.BlockStats.FlagHasDict]]) can. This is the layout a
    * real warehouse gets from any non-sorted partitioning of a
    * low-cardinality column.
    */
  private def ensureFlagBuckets(spark: SparkSession, sfDir: String): (String, StructType) = {
    import org.apache.spark.sql.functions._
    val src = Queries.table(spark, sfDir, "lineitem")
    val dir = rtDir(sfDir, "lineitem-flagbuckets", "lz4-fast", tsFmt)
    val success = new java.io.File(dir, "_SUCCESS")
    if (!success.exists()) {
      // the A/R file's blocks have zone [A, R] which CONTAINS 'N'
      // lexically — only the complete dictionary {A, R} can refute the
      // equality; the N file's blocks are the survivors
      src.filter(col("l_returnflag") =!= "N").coalesce(1)
        .write.mode("overwrite").format("4mc")
        .option("payload", "csv")
        .option("timestampFormat", tsFmt)
        .option("blockBytes", (128 * 1024).toString)
        .save(dir.getAbsolutePath)
      src.filter(col("l_returnflag") === "N").coalesce(1)
        .write.mode("append").format("4mc")
        .option("payload", "csv")
        .option("timestampFormat", tsFmt)
        .option("blockBytes", (128 * 1024).toString)
        .save(dir.getAbsolutePath)
    }
    (dir.getAbsolutePath, src.schema)
  }

  /** Equality on a dictionary column over the mixed layout: blocks whose
    * dictionary lacks 'N' are skipped before decompression — the
    * refutation zone maps can't make (their [A, R] range contains 'N')
    * and blooms needn't (no hashing, exact membership). Oracle: same
    * filter+aggregate over the original parquet.
    */
  def dictReturnflag(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val (dir, schema) = ensureFlagBuckets(spark, sfDir)
    spark.read.format("4mc").option("payload", "csv")
      .option("timestampFormat", tsFmt).schema(schema).load(dir)
      .filter(col("l_returnflag") === "N")
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_linestatus"))
  }

  val dictReturnflagSql: String =
    """SELECT l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
      |FROM lineitem WHERE l_returnflag = 'N'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** `GROUP BY` a dict-covered low-cardinality column answered from footer
    * HISTOGRAMS (r16): v4 stats segments ([[graft.format.BlockStats
    * .StatsVersionDictCounts]]) store per-block entry counts alongside the
    * r14 value dictionaries, so [[graft.plans.McAggregatePushdown]]'s
    * dict-group mode turns this whole aggregate into a footer sweep — one
    * relation row per (block, value) instead of one per data row, ZERO
    * blocks decompressed (asserted in McAggPushdownSpec; the oracle here
    * pins the values at driver scale).
    */
  def dictGroupBy(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    roundTrip(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), count(col("l_returnflag")).as("nn"),
        max(col("l_returnflag")).as("mx"))
      .orderBy(col("l_returnflag"))
  }

  val dictGroupBySql: String =
    """SELECT l_returnflag, COUNT(*) AS n, COUNT(l_returnflag) AS nn,
      |       MAX(l_returnflag) AS mx
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** TWO-column dict group-by — q1's actual grouping shape, `GROUP BY
    * l_returnflag, l_linestatus` — answered from footer JOINT histograms
    * (r17): v5 stats segments ([[graft.format.BlockStats.StatsVersionJoint]])
    * store sparse per-block (value₁, value₂) → count tables for pairs of
    * dict-covered string columns, which per-column histograms cannot compose
    * to (marginals don't determine the joint). One relation row per (block,
    * value-pair) — ZERO blocks decompressed on covered files
    * (McAggPushdownSpec pins that; the oracle here pins the values).
    */
  def dictGroupBy2(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    roundTrip(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), count(col("l_linestatus")).as("nn"),
        max(col("l_returnflag")).as("mx"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val dictGroupBy2Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |       COUNT(l_linestatus) AS nn, MAX(l_returnflag) AS mx
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** `COUNT(DISTINCT col)` from the same v4 entry tables: the distinct count
    * runs over the per-block dictionary entries (≤32 per block), never the
    * rows. Paired with COUNT(*) so the rewrite's row/histogram composition
    * is pinned in one result.
    */
  def dictCountDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    roundTrip(spark, sfDir, "lineitem")
      .agg(countDistinct(col("l_returnflag")).as("d_flags"), count(lit(1)).as("n"))
  }

  val dictCountDistinctSql: String =
    "SELECT COUNT(DISTINCT l_returnflag) AS d_flags, COUNT(*) AS n FROM lineitem"

  /** Dict-group pushdown COMPOSED with a zone-map data filter (r17): q1's
    * actual filtered shape — `GROUP BY returnflag WHERE shipdate >= X`. The
    * stats relation classifies each block against the shipdate zone map:
    * all-pass blocks emit footer histogram rows, none-pass blocks are
    * skipped, only straddlers decode (and re-filter per line). On a
    * shipdate-clustered table the decode set is O(1) blocks regardless of
    * file count (McAggPushdownSpec pins footer-only on the all-pass span;
    * this row pins the values at driver scale over the unsorted layout).
    */
  def dictGroupByFiltered(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    roundTrip(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), count(col("l_returnflag")).as("nn"))
      .orderBy(col("l_returnflag"))
  }

  val dictGroupByFilteredSql: String =
    """SELECT l_returnflag, COUNT(*) AS n, COUNT(l_returnflag) AS nn
      |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Two-generation lineitem dir under TYPE WIDENING (r16): generation 1
    * stores the line number as INT and quantity as DECIMAL(10,2),
    * generation 2 as BIGINT / DECIMAL(14,2). Read with the widened schema:
    * int text parses as long, same-scale decimals parse across precision
    * growth, and the old generation's INT-tagged zone maps keep pruning
    * and aggregate pushdown (SchemaEvolutionSpec pins the mechanics; this
    * row pins values at driver scale). DATE→TIMESTAMP is the refused
    * counterpart — a loud, actionable error instead of a misparse.
    */
  def typeWideningOverFourMc(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = rtDir(sfDir, "lineitem-widened", "lz4-fast", tsFmt)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val li = Queries.table(spark, sfDir, "lineitem")
      li.filter(col("l_orderkey") % 2 === 0)
        .select(col("l_orderkey"), col("l_linenumber").cast(IntegerType).as("ln"),
          col("l_quantity").cast(DecimalType(10, 2)).as("qty"))
        .write.mode("overwrite").format("4mc").option("payload", "csv")
        .save(dir.getAbsolutePath)
      li.filter(col("l_orderkey") % 2 === 1)
        .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("ln"),
          col("l_quantity").cast(DecimalType(14, 2)).as("qty"))
        .write.mode("append").format("4mc").option("payload", "csv")
        .save(dir.getAbsolutePath)
    }
    val widened = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("ln", LongType),
      StructField("qty", DecimalType(14, 2))))
    spark.read.format("4mc").option("payload", "csv").schema(widened)
      .load(dir.getAbsolutePath)
      .groupBy(col("ln"))
      .agg(count(lit(1)).as("n"),
        sum(col("qty")).cast(DoubleType).as("sum_qty"),
        sum(col("l_orderkey")).as("sum_ok"))
      .orderBy(col("ln"))
  }

  val typeWideningSql: String =
    """SELECT CAST(l_linenumber AS BIGINT) AS ln, COUNT(*) AS n,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
      |       CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Selective scan over a MANIFESTED many-file dir (r16): lineitem is
    * range-partitioned into 8 files on `l_orderkey`, the directory gets a
    * `_graft_manifest` ([[graft.format.McManifest]]), and the planner's
    * [[graft.sources.ManifestFileIndex]] drops the out-of-range FILES
    * before any task launches — driver-side pruning on a non-partition
    * key, one level above the executor-side block pruning that then
    * handles the surviving files' interiors. ManifestSpec pins the
    * task-count mechanics; this row pins values at driver scale.
    */
  private def ensureManifested(spark: SparkSession, sfDir: String): (String, StructType) = {
    import org.apache.spark.sql.functions._
    val src = Queries.table(spark, sfDir, "lineitem")
    val dir = rtDir(sfDir, "lineitem-manifested", "lz4-fast", tsFmt)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      src.repartitionByRange(8, col("l_orderkey"))
        .write.mode("overwrite").format("4mc").option("payload", "csv")
        .option("timestampFormat", tsFmt).save(dir.getAbsolutePath)
      graft.format.McManifest.write(
        dir.getAbsolutePath, spark.sessionState.newHadoopConf())
    }
    (dir.getAbsolutePath, src.schema)
  }

  def manifestPruned(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val (dir, schema) = ensureManifested(spark, sfDir)
    spark.read.format("4mc").option("payload", "csv")
      .option("timestampFormat", tsFmt).schema(schema)
      .load(dir)
      .filter(col("l_orderkey") < 1000L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  val manifestPrunedSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem WHERE l_orderkey < 1000 GROUP BY 1 ORDER BY 1""".stripMargin

  /** `COUNT(*)` over the fully-manifested dir (r16): the v2 manifest holds
    * each file's EXACT line total, so a covered count plans as a literal
    * over OneRowRelation — ZERO tasks, zero footer reads (ManifestSpec pins
    * the plan shape; coverage breaks fall back to the per-file
    * metadata-count path, value-identical).
    */
  def manifestCount(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val (dir, schema) = ensureManifested(spark, sfDir)
    spark.read.format("4mc").option("payload", "csv")
      .option("timestampFormat", tsFmt).schema(schema).load(dir)
      .agg(count(lit(1)).as("n"))
  }

  val manifestCountSql: String = "SELECT COUNT(*) AS n FROM lineitem"

  /** Orders joined against its own 4mz round-trip — every column of every row
    * must survive (count mismatch or null join keys would change the result).
    */
  def ordersSelfJoinCheck(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orig = Queries.table(spark, sfDir, "orders")
    val rt = roundTrip(spark, sfDir, "orders", "zstd-1")
    orig
      .join(rt.withColumnRenamed("o_totalprice", "rt_totalprice"), Seq("o_orderkey"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when($"o_totalprice" === $"rt_totalprice", 1L).otherwise(0L)).as("n_price_equal")
      )
  }

  val ordersSelfJoinSql: String =
    """SELECT COUNT(*) AS n_rows, CAST(SUM(CASE WHEN o_totalprice = o_totalprice THEN 1 ELSE 0 END) AS BIGINT) AS n_price_equal
      |FROM orders""".stripMargin

  /** Documents round-tripped into a HIVE-PARTITIONED 4mc layout
    * (`lang=<v>/…`), then scanned with a partition filter: Spark's FileIndex
    * prunes the other languages' directories before any 4mc footer or block
    * is touched — the per-partition-dir analog of split planning, and the
    * standard 100-TB layout for a corpus keyed by source/language/date. The
    * oracle applies the same predicate relationally.
    */
  /** The documents table written once as a lang-partitioned 4mc dir, read
    * back with the partition column discovered from the directory layout.
    */
  private def docsByLang(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = rtDir(sfDir, "documents-bylang", "lz4-fast", tsFmt)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      Queries.table(spark, sfDir, "documents")
        .select($"doc_id", $"n_chars", $"source", $"lang")
        .write.mode("overwrite").format("4mc").option("payload", "csv")
        .partitionBy("lang").save(dir.getAbsolutePath)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType),
      StructField("source", StringType), StructField("lang", StringType)))
    spark.read
      .format("4mc").option("payload", "csv").schema(schema)
      .load(dir.getAbsolutePath)
  }

  def docsPartitionPruned(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docsByLang(spark, sfDir)
      .filter($"lang" === "en" || $"lang" === "zh")
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .orderBy($"lang", $"source")
  }

  val docsPartitionPrunedSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents WHERE lang IN ('en', 'zh')
      |GROUP BY lang, source ORDER BY lang, source""".stripMargin

  /** Grouped/filtered zone-map aggregate pushdown
    * ([[graft.plans.McAggregatePushdown]]): per-partition MIN/MAX/COUNT and
    * the non-null COUNT(col) answered entirely from footer stats — the
    * partition filter prunes directories first, then each surviving block
    * contributes one stats row; zero blocks are decompressed
    * (McAggPushdownSpec pins the metric). At 100 TB this is the
    * per-partition freshness/completeness dashboard — cost scales with
    * block count in the matching partitions, not bytes.
    */
  def fourMcMinMaxGrouped(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    docsByLang(spark, sfDir)
      .filter($"lang" =!= "zh")
      .groupBy($"lang")
      .agg(
        min($"doc_id").as("min_id"), max($"doc_id").as("max_id"),
        max($"n_chars").as("max_chars"), count($"source").as("n_src"),
        count(lit(1)).as("n_docs"))
      .orderBy($"lang")
  }

  val fourMcMinMaxGroupedSql: String =
    """SELECT lang, min(doc_id) AS min_id, max(doc_id) AS max_id,
      |       max(n_chars) AS max_chars, COUNT(source) AS n_src, COUNT(*) AS n_docs
      |FROM documents WHERE lang <> 'zh'
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** DATA-COLUMN-FILTERED zone-map aggregate pushdown (r10 verdict #5,
    * [[graft.plans.McAggregatePushdown]]): `MIN/MAX/COUNT … WHERE ts >= X`
    * over the ts-CLUSTERED events container. The filter compiles to a
    * zone-map range predicate pushed into the stats relation: blocks wholly
    * inside the window contribute their FOOTER stats row (no decode),
    * blocks wholly outside are skipped, and only the boundary block decodes
    * and re-filters per line. At 100 TB this is the dashboard freshness
    * probe over a time window — `MIN(ts) WHERE ts >= yesterday` costs the
    * footer sweep plus ONE block, not a scan (McAggPushdownSpec pins
    * `blocksRead <= straddlers` and the skip/stats split).
    */
  def fourMcMinMaxFiltered(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val micro = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val (dir, schema) = ensureRoundTripSorted(
      spark, sfDir, "events", "zstd-1", "ts", micro, blockBytes = 128 * 1024)
    val back = spark.read.format("4mc").option("payload", "csv")
      .option("timestampFormat", micro).schema(schema).load(dir)
    back
      .filter($"ts" >= lit("2024-01-20 00:00:00").cast(TimestampType))
      .agg(
        min($"ts").as("min_ts"), max($"ts").as("max_ts"),
        min($"value").as("min_value"), max($"value").as("max_value"),
        count($"user_id").as("n_users_nn"), count(lit(1)).as("n"))
  }

  val fourMcMinMaxFilteredSql: String =
    """SELECT min(ts) AS min_ts, max(ts) AS max_ts,
      |       min(value) AS min_value, max(value) AS max_value,
      |       COUNT(user_id) AS n_users_nn, COUNT(*) AS n
      |FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'""".stripMargin

  /** Global SUMs over the container from v2 per-block footer sums
    * ([[graft.format.BlockStats]] + [[graft.plans.McAggregatePushdown]]):
    * integer columns re-sum overflow-checked exact block partials, doubles
    * re-sum row-ordered block partials (l_quantity is integer-valued, so
    * the double arithmetic is exact in any order) — zero blocks
    * decompressed. The lake-ops trio is now complete: COUNT (metadata fast
    * path), MIN/MAX (zone maps), SUM/totals (block sums) — every dashboard
    * sanity aggregate is a footer sweep at 100 TB.
    */
  def fourMcSumMeta(spark: SparkSession, sfDir: String): DataFrame =
    roundTrip(spark, sfDir, "lineitem", "lz4-fast")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        avg(col("l_quantity")).as("avg_qty"),
        sum(col("l_orderkey")).as("sum_ok"),
        sum(col("l_linenumber")).as("sum_ln"),
        count(col("l_quantity")).as("n_qty"),
        count(lit(1)).as("n"))

  // integer sums cast to BIGINT: DuckDB widens SUM(BIGINT) to HUGEINT,
  // Spark's Sum(long) stays long — the driver compares schemas
  val fourMcSumMetaSql: String =
    """SELECT sum(l_quantity) AS sum_qty,
      |       sum(l_quantity) / COUNT(l_quantity) AS avg_qty,
      |       CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
      |       CAST(sum(l_linenumber) AS BIGINT) AS sum_ln,
      |       COUNT(l_quantity) AS n_qty, COUNT(*) AS n
      |FROM lineitem""".stripMargin

  /** Write (once) a round-trip with per-block BLOOM FILTERS on `bloomCols`
    * ([[graft.format.BlockBlooms]]); own scratch key — the plain round-trip
    * of the same table must not alias it.
    */
  def ensureRoundTripBloom(
      spark: SparkSession,
      sfDir: String,
      tableName: String,
      bloomCols: String,
      codec: String = "lz4-fast"
  ): (String, StructType) =
    ensureRoundTripBloomDf(spark, sfDir, tableName,
      Queries.table(spark, sfDir, tableName),
      dataBytes(new java.io.File(s"$sfDir/$tableName.parquet")), bloomCols, codec)

  /** As [[ensureRoundTripBloom]] but over an arbitrary (derived) DataFrame;
    * `label` keys the scratch dir, `srcBytes` sizes the file fan-out.
    */
  def ensureRoundTripBloomDf(
      spark: SparkSession,
      sfDir: String,
      label: String,
      src: DataFrame,
      srcBytes: Long,
      bloomCols: String,
      codec: String = "lz4-fast"
  ): (String, StructType) = {
    val schema = src.schema
    val key = java.lang.Integer.toHexString(sfDir.hashCode)
    val dir = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft-rt2/$key/$label-$codec-bloom-${java.lang.Integer.toHexString(bloomCols.hashCode)}")
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val nFiles = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
        (srcBytes + (2 << 20) - 1) / (2 << 20))).toInt
      src.repartition(nFiles)
        .write.mode("overwrite").format("4mc")
        .option("payload", "csv")
        .option("timestampFormat", tsFmt)
        .option("codec", codec)
        .option("bloomColumns", bloomCols)
        .save(dir.getAbsolutePath)
    }
    (dir.getAbsolutePath, schema)
  }

  /** Point lookups on a key UNCORRELATED with file order — the shape zone
    * maps cannot prune (the hash repartition at write time spreads every
    * key range across every block, so each block's [min, max] spans the
    * domain) and per-block bloom filters can ([[graft.format.BlockBlooms]]):
    * the pushed `IN` probes each block's filter and decodes only blocks
    * that may contain a key. At 100 TB this is "find these orders in a
    * petabyte of unsorted lineitems" as a handful of block reads instead of
    * a full decompress, for ~1% of file size spent on filters. (Pruning
    * effectiveness scales with 1 − per-block key density: at sf0.01 a block
    * holds a third of the whole key domain, at 100 TB a sliver — the bigger
    * the table, the more the blooms pay.)
    */
  def fourMcBloomLookup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (dir, schema) = ensureRoundTripBloom(spark, sfDir, "lineitem", "l_orderkey")
    val back = spark.read.format("4mc").option("payload", "csv")
      .option("timestampFormat", tsFmt).schema(schema).load(dir)
    back
      .filter($"l_orderkey".isin(1L, 5L, 42L, 777L))
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"),
        max($"l_linenumber").as("max_ln"))
      .orderBy($"l_orderkey")
  }

  val fourMcBloomLookupSql: String =
    """SELECT l_orderkey, COUNT(*) AS n, sum(l_quantity) AS sum_qty,
      |       max(l_linenumber) AS max_ln
      |FROM lineitem WHERE l_orderkey IN (1, 5, 42, 777)
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** Point lookups refuted at the DRIVER by manifest FILE-level blooms
    * (r17): the write carries `bloomColumns` (whose v2 segment now
    * accumulates a fixed-size per-FILE filter alongside the per-block ones,
    * [[graft.format.BlockBlooms.BloomVersionFile]]) and `manifest=true`
    * (the v3 manifest lifts each file's filter,
    * [[graft.format.McManifest]]). The hash repartition spreads every key
    * range across every file, so file zone maps cannot refute anything — a
    * point lookup over a 10k-file dir would still launch 10k tasks just to
    * let the per-block blooms refuse. With the manifest blooms the driver
    * drops non-matching FILES before task launch: tasks ∝ surviving files
    * (ManifestSpec pins the task counts; this row pins values at driver
    * scale).
    */
  def fourMcManifestBloomLookup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val src = Queries.table(spark, sfDir, "lineitem")
    val schema = src.schema
    val key = java.lang.Integer.toHexString(sfDir.hashCode)
    val dir = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft-rt7/$key/lineitem-mbloom-lz4-fast")
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val srcBytes = dataBytes(new java.io.File(s"$sfDir/lineitem.parquet"))
      val nFiles = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
        (srcBytes + (2 << 20) - 1) / (2 << 20))).toInt
      src.repartition(nFiles)
        .write.mode("overwrite").format("4mc")
        .option("payload", "csv")
        .option("timestampFormat", tsFmt)
        .option("bloomColumns", "l_orderkey")
        .option("manifest", "true")
        .save(dir.getAbsolutePath)
    }
    val back = spark.read.format("4mc").option("payload", "csv")
      .option("timestampFormat", tsFmt).schema(schema).load(dir.getAbsolutePath)
    back
      .filter($"l_orderkey".isin(1L, 5L, 42L, 777L))
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
      .orderBy($"l_orderkey")
  }

  val fourMcManifestBloomLookupSql: String =
    """SELECT l_orderkey, COUNT(*) AS n, sum(l_quantity) AS sum_qty
      |FROM lineitem WHERE l_orderkey IN (1, 5, 42, 777)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Join-driven bloom pruning, end to end through the PLANNER: the
    * broadcast-small build side (customer 42's orders) makes
    * [[graft.plans.McInjectRuntimeKeyFilter]] collect the ~dozen orderkeys
    * and inject the runtime key filter into the 4mc scan, where
    * [[graft.format.McStatsPruning.keepBlocksForKeys]] probes each block's
    * BLOOM inside the (useless, domain-spanning) zone ranges — the
    * layout-independent "needle join" skip no sort order can give. Without
    * blooms the same plan decodes every block; results are identical.
    */
  def fourMcBloomKeyJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (dir, schema) = ensureRoundTripBloom(spark, sfDir, "lineitem", "l_orderkey")
    val fact = spark.read.format("4mc").option("payload", "csv")
      .option("timestampFormat", tsFmt).schema(schema).load(dir)
    val dim = Queries.table(spark, sfDir, "orders")
      .filter($"o_custkey" === 42L)
      .select($"o_orderkey", $"o_orderdate")
    fact.join(broadcast(dim), fact("l_orderkey") === dim("o_orderkey"))
      .agg(
        count(lit(1)).as("n_items"),
        sum($"l_quantity").as("sum_qty"),
        countDistinct($"l_orderkey").as("n_orders"))
  }

  val fourMcBloomKeyJoinSql: String =
    """SELECT COUNT(*) AS n_items, sum(l_quantity) AS sum_qty,
      |       COUNT(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_custkey = 42""".stripMargin

  /** STRING-key point lookups through the bloom segment: a derived
    * high-cardinality business key (`o<orderkey>-<linenumber>`, the shape of
    * a content hash / URL / doc id in a real corpus) bloomed at write time;
    * the pushed `IN` probes each block's filter with the xxhash64 of the
    * value bytes. String zone maps are DOUBLY useless here — the layout is
    * unsorted AND lexicographic ranges of numeric strings interleave — so
    * every skipped block is the bloom's.
    */
  def fourMcBloomStrLookup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Queries.table(spark, sfDir, "lineitem")
      .withColumn("item_key",
        concat(lit("o"), $"l_orderkey".cast(StringType), lit("-"),
          $"l_linenumber".cast(StringType)))
      .select($"item_key", $"l_quantity", $"l_extendedprice", $"l_shipdate")
    val (dir, schema) = ensureRoundTripBloomDf(spark, sfDir, "lineitem-strkey", li,
      dataBytes(new java.io.File(s"$sfDir/lineitem.parquet")), "item_key")
    val back = spark.read.format("4mc").option("payload", "csv")
      .option("timestampFormat", tsFmt).schema(schema).load(dir)
    back
      .filter($"item_key".isin("o1-1", "o5-2", "o42-1", "o777-3"))
      .select($"item_key", $"l_quantity", $"l_shipdate")
      .orderBy($"item_key")
  }

  /** STRING-key join-driven pruning end to end through the planner: the
    * selective broadcast build collects customer 42's derived item keys,
    * [[graft.plans.McInjectRuntimeKeyFilter]] hashes them (xxhash64 of the
    * UTF-8 bytes — the bloom writer's domain) and injects a HASHED runtime
    * key filter, and the scan refutes blocks by bloom membership alone
    * (hashes carry no order for zone maps to use). This is "filter a corpus
    * by a small denylist of string ids/URLs without scanning it" — at
    * 100 TB the join touches the blocks that may hold a listed key and
    * decompresses nothing else.
    */
  def fourMcBloomStrJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Queries.table(spark, sfDir, "lineitem")
      .withColumn("item_key",
        concat(lit("o"), $"l_orderkey".cast(StringType), lit("-"),
          $"l_linenumber".cast(StringType)))
      .select($"item_key", $"l_quantity", $"l_extendedprice", $"l_shipdate")
    val (dir, schema) = ensureRoundTripBloomDf(spark, sfDir, "lineitem-strkey", li,
      dataBytes(new java.io.File(s"$sfDir/lineitem.parquet")), "item_key")
    val fact = spark.read.format("4mc").option("payload", "csv")
      .option("timestampFormat", tsFmt).schema(schema).load(dir)
    val dim = Queries.table(spark, sfDir, "orders")
      .filter($"o_custkey" === 42L)
      .select(concat(lit("o"), $"o_orderkey".cast(StringType), lit("-1")).as("ik"))
    fact.join(broadcast(dim), fact("item_key") === dim("ik"))
      .agg(count(lit(1)).as("n_items"), sum($"l_quantity").as("sum_qty"))
  }

  val fourMcBloomStrJoinSql: String =
    """SELECT COUNT(*) AS n_items, sum(l_quantity) AS sum_qty
      |FROM lineitem JOIN orders
      |  ON 'o' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
      |   = 'o' || CAST(o_orderkey AS VARCHAR) || '-1'
      |WHERE o_custkey = 42""".stripMargin

  val fourMcBloomStrLookupSql: String =
    """SELECT 'o' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
      |         AS item_key,
      |       l_quantity, l_shipdate
      |FROM lineitem
      |WHERE 'o' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
      |      IN ('o1-1', 'o5-2', 'o42-1', 'o777-3')
      |ORDER BY item_key""".stripMargin

  /** SQL-DDL surface of the 4mc datasource (`DataSourceRegister` shortName
    * "4mc", `FourMcFileFormat.scala:40`): `CREATE TABLE … USING 4mc`, two
    * disjoint `INSERT INTO` appends (which must compose, not overwrite), and
    * a catalog-table `SELECT` joining back to a dimension — the first
    * commands a SQL-first user runs against the format. `DROP TABLE IF
    * EXISTS` up front makes the row idempotent across invocations; the
    * managed-table files live under the session's warehouse dir and go away
    * with the DROP.
    */
  def sqlDdlSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    Queries.table(spark, sfDir, "supplier").createOrReplaceTempView("ddl_src_supplier")
    Queries.table(spark, sfDir, "nation").createOrReplaceTempView("ddl_src_nation")
    spark.sql("DROP TABLE IF EXISTS graft_ddl_supplier")
    // The in-memory catalog forgets tables across sessions but the managed
    // location survives — CREATE then fails with LOCATION_ALREADY_EXISTS.
    // Clear a leftover location so the row is idempotent across JVM runs.
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_ddl_supplier")
    val whFs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (whFs.exists(warehouse)) whFs.delete(warehouse, true)
    spark.sql(
      """CREATE TABLE graft_ddl_supplier (
        |  s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE)
        |USING 4mc OPTIONS (payload 'csv', codec 'zstd-3')""".stripMargin)
    spark.sql(
      "INSERT INTO graft_ddl_supplier SELECT * FROM ddl_src_supplier WHERE s_suppkey % 2 = 0")
    spark.sql(
      "INSERT INTO graft_ddl_supplier SELECT * FROM ddl_src_supplier WHERE s_suppkey % 2 = 1")
    spark.sql(
      """SELECT n.n_name,
        |  COUNT(*) AS suppliers,
        |  CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM graft_ddl_supplier s JOIN ddl_src_nation n ON s.s_nationkey = n.n_nationkey
        |WHERE s.s_acctbal > 0
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
  }

  /** Join-driven block pruning (the fact-table analog of dynamic partition
    * pruning): the dim side — suppliers of two nations — is broadcast-small,
    * so its join keys are collected driver-side (bounded by the same premise
    * that makes the join broadcastable) and shipped to the fact scan as a
    * [[graft.sources.RuntimeKeyFilter]] option. The fact table is the
    * lineitem round-trip SORT-CLUSTERED by `l_suppkey` (64 KiB blocks), so
    * each block's zone covers ~1 supplier and the key-set probe refutes
    * every block owned by a non-selected supplier — NO static filter touches
    * the fact scan, yet ~90% of blocks are never decompressed
    * (`FourMcScanMetrics`, pinned in RuntimeFilterSpec). At 100 TB the skip
    * fraction approaches 1 − |dim keys| / |fact keys| because the sorted
    * layout makes each key's rows contiguous.
    */
  def runtimeKeysetJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (dir, schema) = ensureRoundTripSorted(
      spark, sfDir, "lineitem", "lz4-fast", "l_suppkey", blockBytes = 64 * 1024)
    val supplier = Queries.table(spark, sfDir, "supplier")
    val nation = Queries.table(spark, sfDir, "nation")
    val dim = supplier.join(nation, $"s_nationkey" === $"n_nationkey")
      .filter($"n_name".isin("NATION_3", "NATION_17"))
      .select($"s_suppkey", $"s_name")
    // NO hand-wired key filter: the broadcast build side makes
    // [[graft.plans.McInjectRuntimeKeyFilter]] (GraftExtensions) collect the
    // dim keys and inject the RuntimeKeyFilter scan option during
    // optimization — the SQL-user path the r9 verdict asked for. Pruning is
    // pinned in RuntimeFilterSpec; without the extension the plan degrades
    // to the same join unpruned, value-identical.
    val fact = spark.read.format("4mc").option("payload", "csv")
      .option("timestampFormat", tsFmt)
      .schema(schema).load(dir)
    fact.join(broadcast(dim), fact("l_suppkey") === dim("s_suppkey"))
      .groupBy($"s_name")
      .agg(
        count(lit(1)).as("n_items"),
        sum($"l_extendedprice".cast(DecimalType(18, 2)) *
          (lit(1) - $"l_discount".cast(DecimalType(18, 2))))
          .cast(DoubleType).as("revenue")
      )
      .orderBy($"s_name")
  }

  val runtimeKeysetJoinSql: String =
    """SELECT s_name, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name IN ('NATION_3', 'NATION_17')
      |GROUP BY s_name ORDER BY s_name""".stripMargin

  val sqlDdlSupplierSql: String =
    """SELECT n_name, COUNT(*) AS suppliers,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_acctbal > 0
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** ARRAY columns in the csv payload (round 12): a deterministic
    * `array<long>` fixture covering every encoding corner — null arrays,
    * empty arrays, null ELEMENTS — round-trips through the container and is
    * audited element-exactly by the DuckDB oracle (count / element mass /
    * null-element census per lang). This is the signature-table shape
    * ([[graft.ops.Incremental]]): MinHash arrays ride the payload natively
    * now, so a steady-state dedup index can live IN the bloomed container
    * instead of a parquet sidecar.
    */
  def sigArrayRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft-rt2/${java.lang.Integer.toHexString(sfDir.hashCode)}/sig-arrays"
    )
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      Queries.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), expr(
          """CASE WHEN doc_id % 11 = 0 THEN CAST(NULL AS ARRAY<BIGINT>)
            |     WHEN doc_id % 7 = 3 THEN CAST(ARRAY() AS ARRAY<BIGINT>)
            |     ELSE transform(sequence(1L, doc_id % 5 + 1),
            |          x -> CASE WHEN (doc_id + x) % 13 = 0 THEN NULL
            |               ELSE doc_id * 2654435761L + x * 40503L END)
            |END""".stripMargin).as("sig"))
        .coalesce(1)
        .write.mode("overwrite").format("4mc").option("payload", "csv")
        .save(dir.getAbsolutePath)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("sig", ArrayType(LongType, containsNull = true))))
    spark.read.format("4mc").option("payload", "csv").schema(schema)
      .load(dir.getAbsolutePath)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("sig")).as("n_arrays"),
        sum(size(col("sig"))).as("total_elems"),
        sum(expr("aggregate(filter(sig, x -> x IS NOT NULL), 0L, (a, x) -> a + x)"))
          .as("sum_elems"),
        sum(expr("size(filter(sig, x -> x IS NULL))")).as("n_null_elems"))
      .orderBy(col("lang"))
  }

  val sigArrayRoundTripSql: String =
    """WITH sigs AS (
      |  SELECT lang,
      |    CASE WHEN doc_id % 11 = 0 THEN NULL
      |         WHEN doc_id % 7 = 3 THEN CAST([] AS BIGINT[])
      |         ELSE list_transform(range(1, CAST(doc_id % 5 + 2 AS BIGINT)),
      |              x -> CASE WHEN (doc_id + x) % 13 = 0 THEN NULL
      |                   ELSE doc_id * 2654435761 + x * 40503 END)
      |    END AS sig
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_docs, COUNT(sig) AS n_arrays,
      |  CAST(SUM(len(sig)) AS BIGINT) AS total_elems,
      |  CAST(SUM(list_sum(list_filter(sig, x -> x IS NOT NULL))) AS BIGINT) AS sum_elems,
      |  CAST(SUM(len(list_filter(sig, x -> x IS NULL))) AS BIGINT) AS n_null_elems
      |FROM sigs GROUP BY lang ORDER BY lang""".stripMargin
}
