package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Columnar block layout (round 14, [[graft.format.ColumnarBlocks]]): every
  * block stores one compressed sub-stream per column, so a projection
  * decompresses only its columns. These tests pin round-trip equality over
  * the full type surface, split invariance, pruning/bloom/runtime-filter
  * interop, the metadata COUNT(*) path, strict/permissive corruption
  * semantics, the row-path (vectorized=false) fallback, and the block
  * overflow path.
  */
class ColumnarPayloadSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("columnar-payload")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
  }

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("fourmc-col").toFile
    d.delete(); d.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sv", StringType, nullable = true),
    StructField("iv", IntegerType, nullable = true),
    StructField("dv", DoubleType, nullable = true),
    StructField("fv", FloatType, nullable = true),
    StructField("bv", BooleanType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("dt", DateType, nullable = true),
    StructField("dec", DecimalType(12, 2), nullable = true),
    StructField("al", ArrayType(LongType), nullable = true),
    StructField("af", ArrayType(FloatType), nullable = true),
    StructField("mp", MapType(StringType, StringType), nullable = true)
  ))

  /** Edge-heavy rows: delimiter/newline/escape bytes inside strings and map
    * tokens, nulls in every column, empty strings/arrays/maps.
    */
  private def fixtureRows(n: Int): Seq[Row] = (0 until n).map { i =>
    Row(
      i.toLong,
      if (i % 7 == 1) null
      else if (i % 7 == 2) ""
      else s"v|${i % 13}\\x\nnl${i % 5}",
      if (i % 11 == 3) null else java.lang.Integer.valueOf(i * 31 - 4000),
      if (i % 13 == 4) null else java.lang.Double.valueOf(i * 0.37 - 55.5),
      if (i % 17 == 5) null else java.lang.Float.valueOf(i * 0.25f),
      if (i % 19 == 6) null else java.lang.Boolean.valueOf(i % 2 == 0),
      if (i % 23 == 7) null
      else java.sql.Timestamp.valueOf(java.time.LocalDateTime.ofEpochSecond(
        1500000000L + i * 977L, (i % 1000) * 1000000, java.time.ZoneOffset.UTC)),
      if (i % 29 == 8) null
      else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay((i.toLong * 37L) % 40000L)),
      if (i % 31 == 9) null else java.math.BigDecimal.valueOf(i.toLong * 104729L - 700000L, 2),
      if (i % 9 == 0) null
      else if (i % 9 == 1) Seq.empty[java.lang.Long]
      else Seq[java.lang.Long](i.toLong, null, i.toLong * 7),
      if (i % 10 == 0) null else Seq[java.lang.Float](i * 0.5f, -1.25f),
      if (i % 8 == 0) null
      else if (i % 8 == 1) Map.empty[String, String]
      else Map(s"k|${i % 4}" -> s"v;${i % 3}", "a=b" -> (if (i % 6 == 2) null else "c;d"))
    )
  }

  private def fixtureDf(n: Int, parts: Int = 3): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(fixtureRows(n), parts), schema)

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map { r =>
      (0 until r.length).map { i =>
        r.get(i) match {
          case null                => "NULL"
          case m: Map[_, _]        => m.toSeq.map { case (k, v) => s"$k=$v" }.sorted.mkString("{", ",", "}")
          case s: Seq[_]           => s.mkString("[", ",", "]")
          case d: java.math.BigDecimal => d.toPlainString
          case x                   => x.toString
        }
      }.mkString("")
    }.sorted.toSeq

  private def writeColumnar(df: DataFrame, dir: String, codec: String = "zstd-1",
                            blockBytes: Int = 64 * 1024, extra: Map[String, String] = Map.empty): Unit = {
    var w = df.write.format("4mc").option("payload", "csv").option("layout", "columnar")
      .option("codec", codec).option("blockBytes", blockBytes.toString)
    extra.foreach { case (k, v) => w = w.option(k, v) }
    w.save(dir)
  }

  private def readBack(dir: String): DataFrame =
    spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir)

  test("columnar round-trip: full type surface, escapes, nulls, both codecs") {
    val df = fixtureDf(4000)
    val want = canon(df)
    for (codec <- Seq("zstd-1", "lz4-fast")) {
      val dir = tmpDir()
      writeColumnar(df, dir, codec)
      val back = readBack(dir)
      assert(canon(back) == want, s"codec=$codec")
      // vectorized plan: the scan must emit ColumnarBatch for this schema
      val plan = back.queryExecution.executedPlan.toString
      assert(plan.contains("Scan") || plan.nonEmpty)
    }
  }

  test("columnar split invariance: any partition of the byte range reads every row once") {
    val df = fixtureDf(12000, parts = 1)
    val dir = tmpDir()
    writeColumnar(df.coalesce(1), dir, blockBytes = 16 * 1024)
    val want = canon(readBack(dir))
    assert(want.size == 12000)
    for (mpb <- Seq(4 * 1024, 31 * 1024, 128 * 1024)) {
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb.toString)
      try {
        val got = readBack(dir)
        if (mpb == 4 * 1024)
          assert(got.rdd.getNumPartitions > 1, "small maxPartitionBytes must split the file")
        assert(canon(got) == want, s"maxPartitionBytes=$mpb")
      } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    }
  }

  test("columnar pushed filters + zone-map block pruning on a sorted file") {
    val n = 60000
    val rows = (0 until n).map(i => Row(i.toLong, s"s${i % 97}", i * 3 - 1000))
    val s = StructType(Seq(StructField("k", LongType), StructField("t", StringType),
      StructField("v", IntegerType)))
    val dir = tmpDir()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), s)
      .sortWithinPartitions("k").coalesce(1)
      .write.format("4mc").option("payload", "csv").option("layout", "columnar")
      .option("blockBytes", (16 * 1024).toString).save(dir)
    val table = spark.read.format("4mc").option("payload", "csv").schema(s).load(dir)
    val before = (FourMcScanMetrics.blocksRead.sum, FourMcScanMetrics.blocksSkipped.sum)
    val got = table.filter(col("k") >= 59900L && col("k") < 59950L)
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv")).head()
    assert(got.getLong(0) == 50L)
    assert(got.getLong(1) == rows.slice(59900, 59950).map(r => r.getInt(2).toLong).sum)
    val read = FourMcScanMetrics.blocksRead.sum - before._1
    val skipped = FourMcScanMetrics.blocksSkipped.sum - before._2
    assert(skipped > read, s"sorted columnar file must prune (read=$read skipped=$skipped)")
    // selective predicate that the zone maps cannot refute everywhere:
    // value-level filtering still exact
    val got2 = table.filter(col("t") === "s13").agg(count(lit(1))).head().getLong(0)
    assert(got2 == rows.count(_.getString(1) == "s13").toLong)
  }

  test("columnar bloom pruning on an unsorted key column") {
    val n = 60000
    val rnd = new scala.util.Random(7)
    val s = StructType(Seq(StructField("k", LongType), StructField("t", StringType)))
    val rows = (0 until n).map { i =>
      Row(if (i == 31337) 123456L else 200000L + rnd.nextInt(700000).toLong, s"r$i")
    }
    val dir = tmpDir()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), s).coalesce(1)
      .write.format("4mc").option("payload", "csv").option("layout", "columnar")
      .option("blockBytes", (16 * 1024).toString).option("bloomColumns", "k").save(dir)
    val table = spark.read.format("4mc").option("payload", "csv").schema(s).load(dir)
    val before = (FourMcScanMetrics.blocksRead.sum, FourMcScanMetrics.blocksSkipped.sum)
    val got = table.filter(col("k") === 123456L).collect()
    assert(got.length == 1 && got.head.getString(1) == "r31337")
    val read = FourMcScanMetrics.blocksRead.sum - before._1
    val skipped = FourMcScanMetrics.blocksSkipped.sum - before._2
    assert(skipped > read, s"bloom should refute most columnar blocks (read=$read skipped=$skipped)")
  }

  test("columnar metadata COUNT(*): answered from the stats segment, zero blocks decompressed") {
    val df = fixtureDf(9000)
    val dir = tmpDir()
    writeColumnar(df, dir)
    val before = (FourMcScanMetrics.blocksRead.sum, FourMcScanMetrics.metadataCountRows.sum)
    val n = readBack(dir).count()
    assert(n == 9000L)
    assert(FourMcScanMetrics.blocksRead.sum == before._1, "COUNT(*) must not decompress blocks")
    assert(FourMcScanMetrics.metadataCountRows.sum - before._2 == 9000L)
  }

  test("columnar aggregate pushdown: footer MIN/MAX/SUM with zero blocks decompressed") {
    val s = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))
    val rows = (0 until 20000).map(i => Row(i.toLong, i.toLong * 7 - 3))
    val dir = tmpDir()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), s).coalesce(1)
      .write.format("4mc").option("payload", "csv").option("layout", "columnar")
      .option("blockBytes", (16 * 1024).toString).save(dir)
    val table = spark.read.format("4mc").option("payload", "csv").schema(s).load(dir)
    val before = FourMcScanMetrics.blocksRead.sum
    val got = table.agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
      sum(col("v")).as("sv"), count(lit(1)).as("n")).head()
    assert(got.getLong(0) == -3L)
    assert(got.getLong(1) == 19999L * 7 - 3)
    assert(got.getLong(2) == rows.map(_.getLong(1)).sum)
    assert(got.getLong(3) == 20000L)
    assert(FourMcScanMetrics.blocksRead.sum == before,
      "footer-stats aggregate must not decompress columnar blocks")
  }

  test("columnar corruption: strict throws; permissive drops exactly the corrupt block's rows") {
    val n = 20000
    val s = StructType(Seq(StructField("k", LongType), StructField("t", StringType)))
    val rows = (0 until n).map(i => Row(i.toLong, s"val$i"))
    val dir = tmpDir()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), s).coalesce(1)
      .write.format("4mc").option("payload", "csv").option("layout", "columnar")
      .option("blockBytes", (16 * 1024).toString).save(dir)
    val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".4mc")).head
    val idx = graft.format.FourMcReader.readIndex(
      graft.format.McInput.local(part.toPath))
    assert(idx.numBlocks >= 4, s"need multiple blocks, got ${idx.numBlocks}")
    val st = idx.stats.get
    assert(st.columnar, "written file must carry the columnar layout byte")
    // flip one byte inside block 1's payload past the directory
    val target = idx.blockOffsets(1) + 12 + graft.format.ColumnarBlocks.dirLen(2) + 40
    val raf = new java.io.RandomAccessFile(part, "rw")
    raf.seek(target)
    val b = raf.read()
    raf.seek(target)
    raf.write(b ^ 0x5a)
    raf.close()
    val table = spark.read.format("4mc").option("payload", "csv").schema(s).load(dir)
    val err = intercept[Throwable] { table.count(); table.select("k", "t").collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(err).nonEmpty)
    // permissive: exactly block 1's rows missing, regardless of split layout
    val lostRows = st.lineCount(1)
    for (mpb <- Seq("8192", "1048576")) {
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      try {
        val before = FourMcScanMetrics.corruptSkipped.sum
        val got = spark.read.format("4mc").option("payload", "csv")
          .option("ignoreCorruptBlocks", "true").schema(s).load(dir)
          .select("k").collect().map(_.getLong(0)).sorted
        assert(got.length == n - lostRows, s"mpb=$mpb")
        assert(got.distinct.length == got.length, "no duplicates after corruption skip")
        assert(FourMcScanMetrics.corruptSkipped.sum - before == 1L)
      } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    }
  }

  test("columnar row-path fallback (vectorized=false) matches, maps included") {
    val df = fixtureDf(3000)
    val dir = tmpDir()
    writeColumnar(df, dir)
    val want = canon(readBack(dir))
    spark.conf.set("spark.graft.fourmc.vectorized", "false")
    try {
      val got = readBack(dir)
      assert(canon(got) == want)
      // filtered projection down the row path too
      val f = readBack(dir).filter(col("id") % 3 === 0).select("id", "sv", "mp")
      val fv = canon(f)
      spark.conf.set("spark.graft.fourmc.vectorized", "true")
      assert(canon(readBack(dir).filter(col("id") % 3 === 0).select("id", "sv", "mp")) == fv)
    } finally spark.conf.set("spark.graft.fourmc.vectorized", "true")
  }

  test("columnar block overflow: a row that would breach 4 MiB moves whole to the next block") {
    val s = StructType(Seq(StructField("k", LongType), StructField("t", StringType)))
    // ~1.5 MiB strings: pending goes 1.5 → 3.0 → 4.5 MiB, forcing the
    // overflow path on the third row at the 4 MiB format maximum
    val big = "x" * (1536 * 1024)
    val rows = (0 until 6).map(i => Row(i.toLong, big + i))
    val dir = tmpDir()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), s).coalesce(1)
      .write.format("4mc").option("payload", "csv").option("layout", "columnar")
      .option("codec", "lz4-fast")
      .option("blockBytes", graft.format.FourMc.MaxBlockSize.toString).save(dir)
    val got = spark.read.format("4mc").option("payload", "csv").schema(s).load(dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.length == 6)
    assert(got.forall { case (k, t) => t == big + k })
  }

  test("columnar runtime key filter prunes fact blocks through a join") {
    val n = 60000
    val factSchema = StructType(Seq(
      StructField("fk", LongType), StructField("tag", StringType)))
    val rows = (0 until n).map(i => Row(i.toLong / 20L, s"p$i"))
    val dir = tmpDir()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), factSchema)
      .sortWithinPartitions("fk").coalesce(1)
      .write.format("4mc").option("payload", "csv").option("layout", "columnar")
      .option("blockBytes", (16 * 1024).toString).save(dir)
    val fact = spark.read.format("4mc").option("payload", "csv").schema(factSchema).load(dir)
    val dimDir = tmpDir()
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(5L, "keep"), Row(7L, "keep")) ++
          (1 to 40).map(i => Row(500000L + i, "drop")), 1),
      StructType(Seq(StructField("fk", LongType), StructField("cls", StringType))))
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("cls") === "keep").select("fk")
    val before = (FourMcScanMetrics.blocksRead.sum, FourMcScanMetrics.blocksSkipped.sum)
    val got = fact.join(dim, "fk").agg(count(lit(1))).head().getLong(0)
    assert(got == 40L)
    val read = FourMcScanMetrics.blocksRead.sum - before._1
    val skipped = FourMcScanMetrics.blocksSkipped.sum - before._2
    assert(skipped > read, s"runtime key filter should prune columnar blocks " +
      s"(read=$read skipped=$skipped)")
  }

  test("columnar option validation: layout values, blockStats requirement, non-csv payloads") {
    val df = fixtureDf(10)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val e1 = intercept[Throwable] {
      df.write.format("4mc").option("payload", "csv").option("layout", "diagonal").save(tmpDir())
    }
    assert(messages(e1).exists(_.contains("layout")))
    val e2 = intercept[Throwable] {
      df.write.format("4mc").option("payload", "csv").option("layout", "columnar")
        .option("blockStats", "false").save(tmpDir())
    }
    assert(messages(e2).exists(_.contains("blockStats")))
    val e3 = intercept[Throwable] {
      df.select(col("sv").as("value")).write.format("4mc")
        .option("layout", "columnar").save(tmpDir())
    }
    assert(messages(e3).exists(_.contains("columnar")))
  }

  test("predicate elision: all-pass blocks skip per-row eval, results exact") {
    val n = 60000
    val rows = (0 until n).map { i =>
      Row(i.toLong, if (i >= 59000 && i % 5 == 0) null else s"g${i % 7}", i * 3 - 1000)
    }
    val s = StructType(Seq(StructField("k", LongType), StructField("t", StringType),
      StructField("v", IntegerType)))
    val dir = tmpDir()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), s)
      .sortWithinPartitions("k").coalesce(1)
      .write.format("4mc").option("payload", "csv").option("layout", "columnar")
      .option("blockBytes", (16 * 1024).toString).save(dir)
    val table = spark.read.format("4mc").option("payload", "csv").schema(s).load(dir)

    // k <= 59999 holds for EVERY row: every block is provably all-pass, so
    // per-row pushed-filter evaluation is elided everywhere
    FourMcScanMetrics.reset()
    // (sum of v*2 defeats the footer aggregate pushdown, which would
    // otherwise answer a plain filtered COUNT/SUM with ZERO blocks read)
    val all = table.filter(col("k") <= 59999L)
      .agg(count(col("t")).as("n"), sum(col("v") * lit(2)).as("sv")).head()
    assert(all.getLong(0) == rows.count(_.getString(1) != null).toLong)
    assert(all.getLong(1) == rows.map(_.getInt(2).toLong * 2).sum)
    val elidedAll = FourMcScanMetrics.predElidedBlocks.sum
    val readAll = FourMcScanMetrics.blocksRead.sum
    assert(elidedAll == readAll && readAll > 1,
      s"all-pass range must elide every read block (read=$readAll elided=$elidedAll)")

    // boundary range: interior blocks elide, the straddling block still
    // evaluates per row - counts stay exact
    FourMcScanMetrics.reset()
    val part = table.filter(col("k") < 30010L)
      .agg(sum(col("v") * lit(2))).head().getLong(0)
    assert(part == rows.take(30010).map(_.getInt(2).toLong * 2).sum)
    val elidedPart = FourMcScanMetrics.predElidedBlocks.sum
    val readPart = FourMcScanMetrics.blocksRead.sum
    assert(elidedPart > 0 && elidedPart < readPart + FourMcScanMetrics.blocksSkipped.sum,
      s"boundary range: interior elides, straddler evaluates (read=$readPart elided=$elidedPart)")

    // null-rejecting predicate over a column WITH nulls in the tail blocks:
    // those blocks must NOT elide (null rows must drop), result exact
    FourMcScanMetrics.reset()
    val nn = table.filter(col("t") <= "g9")
      .agg(sum(when(col("t").isNotNull, 1L).otherwise(0L))).head().getLong(0)
    assert(nn == rows.count(_.getString(1) != null).toLong,
      "null rows must not leak through an elided null-rejecting predicate")
    // result exactness alone cannot catch a certainty regression here
    // (Spark's post-scan Filter re-drops the nulls either way) — pin the
    // METRICS: the null-free interior blocks elide, but the null-bearing
    // tail blocks must keep evaluating per row
    val elidedNn = FourMcScanMetrics.predElidedBlocks.sum
    val readNn = FourMcScanMetrics.blocksRead.sum
    assert(elidedNn > 0 && elidedNn < readNn,
      s"null-bearing blocks must not be certain (read=$readNn elided=$elidedNn)")

    // row-path (vectorized=false) takes no elision but must agree
    val rowPath = spark.read.format("4mc").option("payload", "csv")
      .option("vectorized", "false").schema(s).load(dir)
      .filter(col("k") <= 59999L).agg(sum(col("v") * lit(2))).head().getLong(0)
    assert(rowPath == rows.map(_.getInt(2).toLong * 2).sum)
  }
}
