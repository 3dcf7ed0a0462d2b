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
