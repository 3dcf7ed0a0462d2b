package graft.plans

import graft.sources.FourMcScanMetrics
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** `option("sortBy", ...)` sorted writes ([[McSortedWrite]], round 15):
  * the public knob for sort-clustered files — a range shuffle + local sort
  * injected into the V1 write command, so per-block zone maps separate and
  * selective scans skip/elide. Pins: clustering actually happens (block
  * skip + elision metrics), correctness vs an unsorted write, multi-key
  * ordering, unknown-column error, and the disable flag.
  */
class McSortedWriteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .appName("mc-sorted-write")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
  }

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("fourmc-sorted").toFile
    d.delete(); d.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", StringType, nullable = false)))

  /** Keys in a Knuth-permuted (uncorrelated) order: without the sortBy
    * clustering every block's zone spans the whole domain.
    */
  private def shuffledDf(n: Long) = {
    val rows = (0L until n).map { i =>
      val key = (i * 2654435761L) % n
      Row(key, s"payload-$key-${"x" * 30}")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  test("sortBy clusters blocks: selective scans skip and elide; results exact") {
    val n = 200000L
    val df = shuffledDf(n)
    val sortedDir = tmpDir(); val plainDir = tmpDir()
    df.write.format("4mc").option("payload", "csv")
      .option("sortBy", "k").option("blockBytes", (64 * 1024).toString)
      .save(sortedDir)
    df.write.format("4mc").option("payload", "csv")
      .option("blockBytes", (64 * 1024).toString).save(plainDir)
    def read(dir: String) =
      spark.read.format("4mc").option("payload", "csv").schema(schema).load(dir)

    // correctness: same rows either way
    assert(read(sortedDir).count() == n)
    val pred = col("k") >= 50000L && col("k") < 60000L
    // sum of k*2 DEFEATS the footer aggregate pushdown (which otherwise
    // answers a filtered plain sum from zone maps + 2 boundary blocks —
    // itself a sortBy win, but this test pins the block-level scan path)
    val want = read(plainDir).filter(pred).agg(sum(col("k") * lit(2))).head().getLong(0)
    FourMcScanMetrics.reset()
    val got = read(sortedDir).filter(pred).agg(sum(col("k") * lit(2))).head().getLong(0)
    assert(got == want)

    // clustering evidence: most blocks refuted by zone maps before
    // decompression, and the all-pass interior of the kept range elides
    // per-row predicate evaluation
    val skipped = FourMcScanMetrics.blocksSkipped.sum
    val readBlocks = FourMcScanMetrics.blocksRead.sum
    assert(skipped > 3 * readBlocks,
      s"sortBy write must zone-skip most blocks (read=$readBlocks skipped=$skipped)")
    assert(FourMcScanMetrics.predElidedBlocks.sum > 0,
      "interior all-pass blocks of a sorted scan must elide per-row eval")

    // the unsorted twin cannot skip (uncorrelated key order)
    FourMcScanMetrics.reset()
    read(plainDir).filter(pred).agg(sum(col("k") * lit(2))).head()
    assert(FourMcScanMetrics.blocksSkipped.sum == 0,
      "control: the unsorted write must not zone-skip")

    // per-FILE disjointness: range shuffle means files own disjoint key
    // ranges, so the selective scan touches a subset of files
    val sortedFiles = new java.io.File(sortedDir).listFiles
      .count(_.getName.endsWith(".4mc"))
    assert(sortedFiles > 1, "fixture must produce multiple files")
  }

  test("sortBy composes multiple keys and respects sortPartitions") {
    val df = shuffledDf(50000L).withColumn("g", col("k") % 7)
    val dir = tmpDir()
    df.write.format("4mc").option("payload", "csv")
      .option("sortBy", "g, k").option("sortPartitions", "3").save(dir)
    val s = StructType(schema.fields :+ StructField("g", LongType, nullable = false))
    val back = spark.read.format("4mc").option("payload", "csv").schema(s).load(dir)
    assert(back.count() == 50000L)
    // 3 range partitions → at most 3 files (AQE cannot split a range sort)
    val files = new java.io.File(dir).listFiles.count(_.getName.endsWith(".4mc"))
    assert(files <= 3, s"sortPartitions=3 must bound the file count, got $files")
  }

  test("sortBy validation and the disable flag") {
    val df = shuffledDf(1000L)
    val e = intercept[Throwable] {
      df.write.format("4mc").option("payload", "csv")
        .option("sortBy", "nope").save(tmpDir())
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("sortBy")))

    // disabled: the option is ignored, write succeeds unsorted
    spark.conf.set("spark.graft.fourmc.sortedWrite.enabled", "false")
    try {
      val dir = tmpDir()
      df.write.format("4mc").option("payload", "csv")
        .option("sortBy", "nope").save(dir)
      assert(spark.read.format("4mc").option("payload", "csv")
        .schema(schema).load(dir).count() == 1000L)
    } finally spark.conf.unset("spark.graft.fourmc.sortedWrite.enabled")
  }
}
