package graft.format

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Per-block string value dictionaries (round 14, r13 verdict #7,
  * [[BlockStats.FlagHasDict]]): a block whose low-cardinality string column
  * stays within 32 distinct values of ≤32 bytes stores them EXACTLY in the
  * stats segment; equality/IN/prefix predicates then prune by complete
  * membership — the refutation zone ranges can't make when a block's few
  * values happen to straddle the probe lexically, and blooms needn't
  * (no hashing, zero false positives).
  */
class DictPruningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("dict-pruning")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
  }

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("fourmc-dict").toFile
    d.delete(); d.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("mode", StringType),
    StructField("v", LongType)))

  test("dictionary serialize/parse round-trip; caps poison correctly") {
    val s = StructType(Seq(StructField("lo", StringType), StructField("hi", StringType),
      StructField("big", StringType)))
    val b = new McStatsBuilder(s)
    for (i <- 0 until 1000) {
      b.startLine(0, 1)
      b.observeString(0, s"m${i % 5}".getBytes("UTF-8"))      // 5 distinct: dict
      b.observeString(1, s"u$i".getBytes("UTF-8"))             // 1000 distinct: over cap
      b.observeString(2, ("x" * 40 + i % 3).getBytes("UTF-8")) // >32B values: no dict
    }
    val st = McBlockStats.parse(b.serialize(1)).get
    val d0 = st.dictAt(0)
    assert(d0 != null && d0.length == 5)
    assert(d0.map(new String(_, "UTF-8")).sorted.toSeq == (0 until 5).map(i => s"m$i"))
    assert(st.dictAt(1) == null, "over-cap cardinality must store no dict")
    assert(st.dictAt(2) == null, "over-length values must store no dict")
    // v1 serialization carries no dicts and still parses
    val v1 = McBlockStats.parse(b.serialize(1, version = 1)).get
    assert(v1.dictAt(0) == null)
  }

  test("equality on a hash-bucketed low-cardinality column prunes by dictionary") {
    // 8 modes, each block holds 2 whose RANGE straddles the probe value:
    // blocks are built from mode pairs like (AAA, ZZZ) so every zone range
    // contains 'MMM' lexically — only the dictionary can refute
    val n = 40000
    val pairs = Seq(("AAA", "ZZZ"), ("BBB", "YYY"), ("CCC", "XXX"), ("MMM", "NNN"))
    val rows = (0 until n).map { i =>
      val (a, bm) = pairs((i / 10000) % 4)
      Row(i.toLong, if (i % 2 == 0) a else bm, i.toLong * 3)
    }
    val dir = tmpDir()
    // one partition, rows arrive grouped by pair-band => per-block dicts of 2
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.format("4mc").option("payload", "csv")
      .option("blockBytes", (16 * 1024).toString).save(dir)
    val table = spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir)
    val before = (graft.sources.FourMcScanMetrics.blocksRead.sum,
      graft.sources.FourMcScanMetrics.blocksSkipped.sum)
    val got = table.filter(col("mode") === "MMM")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv")).head()
    val expect = rows.filter(_.getString(1) == "MMM")
    assert(got.getLong(0) == expect.size.toLong)
    assert(got.getLong(1) == expect.map(_.getLong(2)).sum)
    val read = graft.sources.FourMcScanMetrics.blocksRead.sum - before._1
    val skipped = graft.sources.FourMcScanMetrics.blocksSkipped.sum - before._2
    assert(skipped > read,
      s"dictionary must refute the non-MMM bands (read=$read skipped=$skipped)")
    // IN over two modes still prunes the bands holding neither
    val before2 = graft.sources.FourMcScanMetrics.blocksSkipped.sum
    val got2 = table.filter(col("mode").isin("MMM", "CCC")).agg(count(lit(1))).head().getLong(0)
    assert(got2 == rows.count(r => r.getString(1) == "MMM" || r.getString(1) == "CCC").toLong)
    assert(graft.sources.FourMcScanMetrics.blocksSkipped.sum > before2)
  }

  test("StringStartsWith prunes by dictionary membership") {
    val n = 20000
    val rows = (0 until n).map { i =>
      val m = if (i < n / 2) Seq("apple", "zebra")(i % 2) else Seq("melon", "nacho")(i % 2)
      Row(i.toLong, m, i.toLong)
    }
    val dir = tmpDir()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.format("4mc").option("payload", "csv")
      .option("blockBytes", (8 * 1024).toString).save(dir)
    val table = spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir)
    val before = (graft.sources.FourMcScanMetrics.blocksRead.sum,
      graft.sources.FourMcScanMetrics.blocksSkipped.sum)
    // 'mel%' is inside [apple, zebra] — the first half's zones keep it, the
    // dictionaries refute it
    val got = table.filter(col("mode").startsWith("mel")).count()
    assert(got == rows.count(_.getString(1).startsWith("mel")).toLong)
    val read = graft.sources.FourMcScanMetrics.blocksRead.sum - before._1
    val skipped = graft.sources.FourMcScanMetrics.blocksSkipped.sum - before._2
    assert(skipped > 0, s"prefix probe must skip the apple/zebra half (read=$read skipped=$skipped)")
  }

  test("fsck verifies columnar per-stream checksums (clean pass + injected corruption)") {
    val n = 20000
    val rows = (0 until n).map(i => Row(i.toLong, s"m${i % 3}", i.toLong))
    val dir = tmpDir()
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.format("4mc").option("payload", "csv")
      .option("layout", "columnar").option("blockBytes", (16 * 1024).toString).save(dir)
    val clean = graft.ops.Fsck.fsck(spark, dir).collect()
    assert(clean.forall(r => r.getAs[Boolean]("footer_ok") && r.getAs[Int]("n_corrupt_blocks") == 0),
      clean.mkString(";"))
    // flip one byte inside a column stream (past the dir of block 1)
    val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".4mc")).head
    val idx = FourMcReader.readIndex(McInput.local(part.toPath))
    val target = idx.blockOffsets(1) + 12 + ColumnarBlocks.dirLen(3) + 10
    val raf = new java.io.RandomAccessFile(part, "rw")
    raf.seek(target); val b = raf.read(); raf.seek(target); raf.write(b ^ 0x2f); raf.close()
    // whole-payload checksum catches it; if the flip ever collided, the
    // per-stream sums are the second line of defense fsck now walks
    val dirty = graft.ops.Fsck.fsck(spark, dir).collect()
    assert(dirty.exists(r => r.getAs[Int]("n_corrupt_blocks") > 0), dirty.mkString(";"))
  }
}
