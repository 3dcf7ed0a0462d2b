package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Compaction: many tiny files in, few uniform files out, every row
  * preserved, codec upgradable in flight, output still splittable.
  */
class CompactSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").appName("compact-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def freshDir(): String = {
    val d = Files.createTempDirectory("compact").toFile
    d.delete(); d.getAbsolutePath
  }

  test("text compaction: 40 tiny lz4 files -> few zstd files, rows preserved") {
    import spark.implicits._
    val inDir = freshDir(); val outDir = freshDir()
    val lines = (0 until 40000).map(i => s"row-$i|${"x" * 40}")
    lines.toDF("value").repartition(40).write.format("4mc")
      .option("codec", "lz4-fast").save(inDir)
    val (nIn, nOut, rows) = Compact.compactText(spark, inDir, outDir,
      codec = "zstd-3", targetFileBytes = 1L * 1024 * 1024)
    assert(nIn == 40)
    assert(nOut < 8, s"expected few output files, got $nOut")
    assert(rows == lines.length.toLong)
    // codec upgraded: output files carry the 4mz extension
    val outs = new java.io.File(outDir).listFiles.map(_.getName).filter(_.startsWith("part-"))
    assert(outs.nonEmpty && outs.forall(_.endsWith(".4mz")))
    // content identical
    val back = spark.read.format("4mc").load(outDir).as[String].collect()
    assert(back.sorted.toSeq == lines.sorted)
  }

  test("csv compaction preserves typed rows AND the metadata layers (stats + blooms)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val inDir = freshDir(); val outDir = freshDir()
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType), StructField("s", StringType)))
    val n = 200000L
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(0L until n, 20).map { i =>
        org.apache.spark.sql.Row((i * 2654435761L) % n, i / 8.0, s"pad${"x" * 30}")
      }, schema)
    df.write.format("4mc").option("payload", "csv").option("codec", "lz4-fast").save(inDir)
    assert(new java.io.File(inDir).listFiles.count(_.getName.endsWith(".4mc")) == 20)
    val (nIn, nOut, rows) = Compact.compactCsv(spark, inDir, outDir, schema,
      codec = "zstd-3", targetFileBytes = 16L * 1024 * 1024, bloomColumns = Some("k"))
    assert(nIn == 20 && nOut < 4 && rows == n)
    // the compacted files carry a fresh stats segment (v2, with sums) AND blooms
    val f = new java.io.File(outDir).listFiles.filter(_.getName.endsWith(".4mz")).head
    val in = graft.format.McInput.local(f.toPath)
    try {
      val idx = graft.format.FourMcReader.readIndex(in)
      assert(idx.stats.isDefined && idx.stats.get.nCols == 3, "compacted stats segment missing")
      assert(idx.stats.get.sumAt(0), "v2 sums missing on compacted output")
      assert(idx.blooms.isDefined && idx.blooms.get.ordOf(0) >= 0, "compacted blooms missing")
    } finally in.close()
    // a point lookup on the compacted archive prunes via the fresh blooms
    val back = spark.read.format("4mc").option("payload", "csv").schema(schema).load(outDir)
    graft.sources.FourMcScanMetrics.reset()
    val hit = back.filter(org.apache.spark.sql.functions.col("k") === 123321L).collect()
    assert(hit.length == 1)
    assert(graft.sources.FourMcScanMetrics.blocksSkipped.sum() > 0,
      "compacted archive must keep point-lookup pruning")
  }

  test("binary compaction preserves every record") {
    import spark.implicits._
    val inDir = freshDir(); val outDir = freshDir()
    val recs = (0 until 5000).map { i =>
      val a = new Array[Byte](60)
      a(0) = (i >> 8).toByte; a(1) = i.toByte; a
    }
    recs.toDF("value").repartition(25).write.format("4mc")
      .option("payload", "binary").option("codec", "lz4-fast").save(inDir)
    val (nIn, nOut, rows) = Compact.compactBinary(spark, inDir, outDir,
      codec = "lz4-high", targetFileBytes = 4L * 1024 * 1024)
    assert(nIn == 25 && nOut < 5 && rows == recs.length.toLong)
    val back = spark.read.format("4mc").option("payload", "binary").load(outDir)
      .as[Array[Byte]].collect()
    assert(back.map(_.toSeq).sorted(Ordering.Implicits.seqOrdering[Seq, Byte]).toSeq ==
      recs.map(_.toSeq).sorted(Ordering.Implicits.seqOrdering[Seq, Byte]))
  }
}
