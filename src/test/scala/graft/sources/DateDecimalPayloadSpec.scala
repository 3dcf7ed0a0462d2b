package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** DATE and DECIMAL(p<=18) columns in the typed csv payload (round 13):
  * dates ride `yyyy-MM-dd` (int32 epoch days), decimals the plain decimal
  * form with exactly `scale` fraction digits (compact unscaled long) —
  * both long-domain for filter pushdown, zone maps and footer MIN/MAX.
  * Also pins the write-side `array<int>` → long-token widening and the
  * delimiter/value-alphabet collision validation.
  */
class DateDecimalPayloadSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("date-decimal-payload")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
  }

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("fourmc-dd").toFile
    d.delete(); d.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("d", DateType, nullable = true),
    StructField("m", DecimalType(12, 2), nullable = true),
    StructField("m0", DecimalType(7, 0), nullable = true),   // int-lane decimal, scale 0
    StructField("m18", DecimalType(18, 6), nullable = true), // widest compact decimal
    StructField("tag", StringType, nullable = true)
  ))

  /** Edge-heavy fixture: epoch/extreme dates, negative / zero / max-digit
    * decimals, nulls, and strings alongside (escaping interplay).
    */
  private def fixtureRows(n: Int): Seq[Row] = (0 until n).map { i =>
    val d: java.sql.Date =
      if (i % 11 == 1) null
      else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i match {
        case 2 => 0L          // 1970-01-01
        case 3 => -719162L    // 0001-01-01
        case 4 => 2932896L    // 9999-12-31
        case 5 => -1L         // 1969-12-31
        case _ => (i.toLong * 9973L) % 200000L - 100000L
      }))
    val m: java.math.BigDecimal =
      if (i % 13 == 2) null
      else java.math.BigDecimal.valueOf(i match {
        case 6 => -9999999999L // -99999999.99 at scale 2
        case 7 => 5L           // 0.05
        case 8 => 0L
        case _ => i.toLong * 104729L - 5000000L
      }, 2)
    val m0: java.math.BigDecimal =
      if (i % 17 == 3) null else java.math.BigDecimal.valueOf(i.toLong * 31L - 800000L, 0)
    val m18: java.math.BigDecimal =
      if (i % 19 == 4) null
      else java.math.BigDecimal.valueOf(i match {
        case 9  => 999999999999999999L  // 18 nines
        case 10 => -999999999999999999L
        case _  => i.toLong * 2654435761L - 1000000000L
      }, 6)
    val tag = if (i % 23 == 5) null else s"t|ag\\${i % 7}"
    Row(i.toLong, d, m, m0, m18, tag)
  }

  private def fixtureDf(n: Int) =
    spark.createDataFrame(spark.sparkContext.parallelize(fixtureRows(n), 3), schema)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import spark.implicits._
    df.select(concat_ws("", df.columns.map(c => coalesce(col(c).cast("string"), lit("<null>"))).toIndexedSeq: _*))
      .as[String].collect().sorted.toSeq
  }

  test("date + decimal columns round-trip value-exactly (lz4 and zstd)") {
    val df = fixtureDf(3000)
    for (codec <- Seq("lz4-fast", "zstd-1")) {
      val dir = tmpDir()
      df.write.format("4mc").option("payload", "csv").option("codec", codec).save(dir)
      val back = spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir)
      assert(back.schema.map(f => (f.name, f.dataType)) == schema.map(f => (f.name, f.dataType)))
      assert(canon(back) == canon(df), codec)
    }
  }

  test("split invariance: tiny blocks + tiny splits, same rows") {
    val df = fixtureDf(4000)
    val dir = tmpDir()
    df.coalesce(1).write.format("4mc").option("payload", "csv")
      .option("blockBytes", (64 * 1024).toString).save(dir)
    val whole = canon(spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir))
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (32 * 1024).toString)
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val split = spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir)
      assert(split.rdd.getNumPartitions > 2)
      assert(canon(split) == whole)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
  }

  test("date range filter: pushed, correct, and zone-map block-skipping") {
    // sorted dates => disjoint per-block date zones => selective range skips blocks
    val n = 60000
    val rows = (0 until n).map { i =>
      Row(i.toLong, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(8000L + i / 10)),
        java.math.BigDecimal.valueOf(i.toLong, 2), null, null, s"r$i")
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmpDir()
    df.sortWithinPartitions("id").coalesce(1).write.format("4mc").option("payload", "csv")
      .option("blockBytes", (64 * 1024).toString).save(dir)
    val table = spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir)
    val cut = java.time.LocalDate.ofEpochDay(8000L + (n - 300) / 10)
    val expect = (0 until n).count(i => 8000L + i / 10 >= cut.toEpochDay)
    val before = (FourMcScanMetrics.blocksRead.sum, FourMcScanMetrics.blocksSkipped.sum)
    val got = table.filter(col("d") >= lit(java.sql.Date.valueOf(cut))).count()
    assert(got == expect.toLong)
    val skipped = FourMcScanMetrics.blocksSkipped.sum - before._2
    assert(skipped > 0, s"expected date zone maps to skip blocks (skipped=$skipped)")
  }

  test("decimal range filter is exact at the boundary") {
    val df = fixtureDf(3000)
    val dir = tmpDir()
    df.write.format("4mc").option("payload", "csv").save(dir)
    val table = spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir)
    val lim = new java.math.BigDecimal("103.25")
    val got = table.filter(col("m") >= lit(lim)).agg(count(lit(1)), sum(col("m"))).head()
    val want = df.filter(col("m") >= lit(lim)).agg(count(lit(1)), sum(col("m"))).head()
    assert(got == want)
  }

  test("MIN/MAX/COUNT on a date column answer from footer stats (agg pushdown)") {
    val df = fixtureDf(5000)
    val dir = tmpDir()
    df.write.format("4mc").option("payload", "csv").save(dir)
    val table = spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir)
    val before = FourMcScanMetrics.blocksRead.sum
    val got = table.agg(min(col("d")).as("mn"), max(col("d")).as("mx"),
      count(col("d")).as("nn")).head()
    val after = FourMcScanMetrics.blocksRead.sum
    val want = df.agg(min(col("d")), max(col("d")), count(col("d"))).head()
    assert(got == want)
    assert(after == before, s"date MIN/MAX should be footer-answered, read ${after - before} blocks")
    // decimal MIN/MAX likewise; SUM(decimal) falls back to the scan (typed
    // Decimal result domain) but must stay value-correct
    val gotDec = table.agg(min(col("m18")), max(col("m18")), sum(col("m"))).head()
    val wantDec = df.agg(min(col("m18")), max(col("m18")), sum(col("m"))).head()
    assert(gotDec == wantDec)
  }

  test("array<int> writes widened to long tokens; read as array<long>") {
    import scala.jdk.CollectionConverters._
    val s = StructType(Seq(
      StructField("id", LongType), StructField("xs", ArrayType(IntegerType, containsNull = true))))
    val rows = (0 until 500).map { i =>
      Row(i.toLong,
        if (i % 7 == 1) null
        else (0 until i % 4).map(j => if ((i + j) % 5 == 2) null else Integer.valueOf(i * 31 + j)))
    }
    val df = spark.createDataFrame(rows.asJava, s)
    val dir = tmpDir()
    df.write.format("4mc").option("payload", "csv").save(dir)
    val readSchema = StructType(Seq(
      StructField("id", LongType), StructField("xs", ArrayType(LongType, containsNull = true))))
    val back = spark.read.format("4mc").option("payload", "csv").schema(readSchema).load(dir)
    assert(canon(back) == canon(df.select(col("id"), col("xs").cast(ArrayType(LongType)))))
    // declaring array<int> on read fails fast with the widening instruction
    // (materialize VALUES — a bare count() is answered from footer metadata
    // with an empty projection and never consults the parse tags)
    val err = intercept[Throwable] {
      spark.read.format("4mc").option("payload", "csv").schema(s).load(dir)
        .select(col("xs")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("array<long>")), messages(err).mkString(" | "))
  }

  test("date bloom filters refute blocks zone maps cannot (unsorted equality lookup)") {
    // UNSORTED wide-range dates: every block's zone covers the probe, so
    // only the per-block bloom can refute; a needle present in one block
    // must read ~1 block, not the file
    val rnd = new scala.util.Random(5)
    val n = 60000
    val needle = java.time.LocalDate.ofEpochDay(123456L)
    val rows = (0 until n).map { i =>
      val day = if (i == 31337) 123456L else 200000L + rnd.nextInt(700000) // disjoint from needle
      Row(i.toLong, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(day)),
        null, null, null, s"r$i")
    }
    val dir = tmpDir()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.format("4mc").option("payload", "csv")
      .option("blockBytes", (64 * 1024).toString).option("bloomColumns", "d").save(dir)
    val table = spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir)
    val before = (FourMcScanMetrics.blocksRead.sum, FourMcScanMetrics.blocksSkipped.sum)
    val got = table.filter(col("d") === lit(java.sql.Date.valueOf(needle))).collect()
    assert(got.length == 1 && got.head.getLong(0) == 31337L)
    val read = FourMcScanMetrics.blocksRead.sum - before._1
    val skipped = FourMcScanMetrics.blocksSkipped.sum - before._2
    assert(skipped > read, s"bloom should refute most blocks (read=$read skipped=$skipped)")
  }

  test("DATE-key join injects a runtime key filter that prunes fact blocks") {
    // date-sorted fact => disjoint per-block date zones; a tiny dim of a few
    // dates joins on the DATE column with NO static fact-side filter — the
    // injected key set (epoch days, the same long domain zones store) must
    // refute most blocks
    val n = 60000
    val factSchema = StructType(Seq(
      StructField("fid", LongType), StructField("fd", DateType), StructField("tag", StringType)))
    val rows = (0 until n).map { i =>
      Row(i.toLong, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(9000L + i / 20)), s"p$i")
    }
    val dir = tmpDir()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), factSchema)
      .sortWithinPartitions("fid").coalesce(1).write.format("4mc").option("payload", "csv")
      .option("blockBytes", (64 * 1024).toString).save(dir)
    val fact = spark.read.format("4mc").option("payload", "csv").schema(factSchema).load(dir)
    val dimDates = Seq(9005L, 9007L, 11990L).map(d => java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(d)))
    // the injection rule refuses UNFILTERED builds (a bare dim's full key
    // domain refutes nothing in general) — a selective predicate over a
    // FILE-backed calendar dim is the realistic shape (a filtered local
    // relation would be constant-folded before the rule runs)
    val dimDir = tmpDir()
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        (dimDates.map(d => Row(d, "keep")) ++
          (1 to 40).map(i => Row(java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(500000L + i)), "drop"))), 1),
      StructType(Seq(StructField("fd", DateType), StructField("cls", StringType))))
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("cls") === "keep").select("fd")
    val before = (FourMcScanMetrics.blocksRead.sum, FourMcScanMetrics.blocksSkipped.sum)
    val q = fact.join(dim, "fd").agg(count(lit(1)), sum(col("fid")))
    val opts = q.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.relation.isInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation] =>
        lr.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation].options
    }
    assert(opts.exists(_.contains(graft.sources.RuntimeKeyFilter.OptionKey)),
      s"date key filter must be injected; scan options were: $opts")
    val got = q.head()
    val read = FourMcScanMetrics.blocksRead.sum - before._1
    val skipped = FourMcScanMetrics.blocksSkipped.sum - before._2
    val wantRows = rows.filter(r => dimDates.map(_.toLocalDate.toEpochDay)
      .contains(r.getDate(1).toLocalDate.toEpochDay))
    assert(got.getLong(0) == wantRows.size.toLong)
    assert(got.getLong(1) == wantRows.map(_.getLong(0)).sum)
    assert(skipped > read, s"date-key injection should refute most blocks " +
      s"(read=$read skipped=$skipped)")
  }

  test("DATE-key runtime filter fires under datetime.java8API (LocalDate rows)") {
    // with java8API enabled the dim collect yields java.time.LocalDate, not
    // java.sql.Date — the key conversion must handle both or the filter
    // silently never fires
    val factSchema = StructType(Seq(
      StructField("fid", LongType), StructField("fd", DateType)))
    val rows = (0 until 40000).map { i =>
      Row(i.toLong, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(9000L + i / 20)))
    }
    val dir = tmpDir()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), factSchema)
      .sortWithinPartitions("fid").coalesce(1).write.format("4mc").option("payload", "csv")
      .option("blockBytes", (64 * 1024).toString).save(dir)
    val dimDir = tmpDir()
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(9005L)), "keep")) ++
          (1 to 40).map(i => Row(java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(500000L + i)), "drop")), 1),
      StructType(Seq(StructField("fd", DateType), StructField("cls", StringType))))
      .write.parquet(dimDir)
    val prev = spark.conf.getOption("spark.sql.datetime.java8API.enabled")
    spark.conf.set("spark.sql.datetime.java8API.enabled", "true")
    try {
      val fact = spark.read.format("4mc").option("payload", "csv").schema(factSchema).load(dir)
      val dim = spark.read.parquet(dimDir).filter(col("cls") === "keep").select("fd")
      val before = (FourMcScanMetrics.blocksRead.sum, FourMcScanMetrics.blocksSkipped.sum)
      val q = fact.join(dim, "fd").agg(count(lit(1)).as("n"))
      assert(q.head().getLong(0) == 20L)
      val read = FourMcScanMetrics.blocksRead.sum - before._1
      val skipped = FourMcScanMetrics.blocksSkipped.sum - before._2
      assert(skipped > read, s"java8API date keys must still prune " +
        s"(read=$read skipped=$skipped)")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.datetime.java8API.enabled", v)
        case None    => spark.conf.unset("spark.sql.datetime.java8API.enabled")
      }
    }
  }

  test("property: date and decimal codecs round-trip over random values") {
    val rnd = new scala.util.Random(23)
    val enc = new CsvPayload.LineEncoder(64)
    // dates: the full int-days domain LocalDate supports, plus edges
    val dayEdges = Seq(0, -1, 1, -719162, 2932896, -784353015, 784351576)
    for (days <- dayEdges ++ (0 until 20000).map(_ => rnd.nextInt(4000000) - 2000000)) {
      enc.reset()
      enc.date(days)
      val got = CsvPayload.parseDateDays(enc.bytes, 0, enc.length)
      assert(got == days, s"days=$days -> '${new String(enc.bytes, 0, enc.length)}' -> $got")
      // and the emitted form matches java.time's civil math
      val iso = java.time.LocalDate.ofEpochDay(days.toLong)
      assert(java.time.LocalDate.parse(new String(enc.bytes, 0, enc.length, "UTF-8")) == iso)
    }
    // decimals: random unscaled x scale, plus max-digit and tiny-fraction edges
    val unEdges = Seq(0L, 1L, -1L, 5L, -5L, 999999999999999999L, -999999999999999999L)
    for (_ <- 0 until 30000) {
      val scale = rnd.nextInt(19)
      val un =
        if (rnd.nextInt(10) == 0) unEdges(rnd.nextInt(unEdges.length))
        else rnd.nextLong() % 1000000000000000000L
      enc.reset()
      enc.decimal(un, scale)
      val s = new String(enc.bytes, 0, enc.length, "UTF-8")
      val got = CsvPayload.parseDecimalUnscaled(enc.bytes, 0, enc.length, scale)
      assert(got == un, s"un=$un scale=$scale -> '$s' -> $got")
      // emitted form equals BigDecimal's plain string at the same scale
      assert(new java.math.BigDecimal(s) == java.math.BigDecimal.valueOf(un, scale),
        s"un=$un scale=$scale -> '$s'")
    }
    // digitless tokens fail like any malformed numeric, never read as 0
    for (tok <- Seq(".", "-", "+", "+.", "-.", "")) {
      val b = tok.getBytes("UTF-8")
      intercept[NumberFormatException] {
        CsvPayload.parseDecimalUnscaled(b, 0, b.length, 2)
      }
    }
  }

  test("SQL DDL surface: CREATE TABLE with date/decimal/map columns, INSERT INTO, SELECT") {
    val dir = tmpDir()
    val tbl = "dd_sql_t13"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(
      s"""CREATE TABLE $tbl (
         |  id BIGINT, d DATE, m DECIMAL(12,2), props MAP<STRING,STRING>
         |) USING 4mc OPTIONS (payload 'csv', codec 'zstd-1') LOCATION '$dir'""".stripMargin)
    spark.sql(
      s"""INSERT INTO $tbl VALUES
         |  (1, DATE '1994-05-17', 12345.67, map('k', 'v', 'a=b', 'c;d')),
         |  (2, NULL, -0.05, map()),
         |  (3, DATE '0001-01-01', NULL, NULL)""".stripMargin)
    val got = spark.sql(
      s"""SELECT id, d, m, element_at(props, 'a=b') AS weird, size(props) AS n
         |FROM $tbl ORDER BY id""".stripMargin).collect()
    assert(got.length == 3)
    assert(got(0).getDate(1).toString == "1994-05-17")
    assert(got(0).getDecimal(2).toPlainString == "12345.67")
    assert(got(0).getString(3) == "c;d" && got(0).getInt(4) == 2)
    assert(got(1).isNullAt(1) && got(1).getDecimal(2).toPlainString == "-0.05" &&
      got(1).getInt(4) == 0)
    assert(got(2).getDate(1).toString == "0001-01-01" && got(2).isNullAt(2) && got(2).isNullAt(3))
    // aggregate with a date predicate through SQL (zone-map path end to end)
    val agg = spark.sql(
      s"SELECT COUNT(*) AS n, MIN(d) AS mn FROM $tbl WHERE d >= DATE '1990-01-01'").head()
    assert(agg.getLong(0) == 1L && agg.getDate(1).toString == "1994-05-17")
    spark.sql(s"DROP TABLE $tbl")
  }

  test("delimiter colliding with the value alphabet is rejected at setup") {
    val df = fixtureDf(10)
    for (bad <- Seq(";", "=", "-", "+", ".", "5", "N", "e", " ", ":", "\\")) {
      val err = intercept[Throwable] {
        df.write.format("4mc").option("payload", "csv").option("delimiter", bad)
          .save(tmpDir())
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(err).exists(_.contains("delimiter")), s"'$bad': ${messages(err).take(3)}")
    }
    // a sane non-default delimiter still round-trips, dates and decimals included
    val dir = tmpDir()
    df.write.format("4mc").option("payload", "csv").option("delimiter", "~").save(dir)
    val back = spark.read.format("4mc").option("payload", "csv").option("delimiter", "~")
      .schema(schema).load(dir)
    assert(canon(back) == canon(df))
  }
}
