package graft.hadoop

import graft.format.{FourMcWriter, McCodec}
import graft.hadoop.mapreduce.{FourMcTextInputFormat, FourMzTextInputFormat}

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** RDD-API parity (reference `Readme.md:110-138`): `sc.newAPIHadoopFile` over
  * a multi-block container must parallelize on block-aligned splits and read
  * the same line multiset as the DataFrame path.
  */
class InputFormatSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("inputformat-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** ~9 MiB of distinct lines -> 3 container blocks at the fixed 4 MiB block
    * size, written as ONE file so split math is observable.
    */
  private def writeBig(ext: String, codec: McCodec): (String, Seq[String]) = {
    val dir = Files.createTempDirectory("if4mc").toString
    val f = new java.io.File(dir, s"big$ext")
    val w = new FourMcWriter(new java.io.BufferedOutputStream(Files.newOutputStream(f.toPath), 1 << 16), codec)
    // incompressible tails: the COMPRESSED file must span several MiB for
    // the byte-range splitter to fan out
    val lines = (0 until 120000).map { i =>
      val r = new scala.util.Random(i)
      s"line-$i-" + r.alphanumeric.take(64).mkString
    }
    lines.foreach { l => val b = (l + "\n").getBytes("UTF-8"); w.write(b, 0, b.length) }
    w.close()
    (f.getAbsolutePath, lines)
  }

  test("newAPIHadoopFile reproduces the reference snippet: >1 block-aligned splits, exact lines") {
    val (file, lines) = writeBig(".4mc", McCodec.Lz4Fast)
    val conf = new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration)
    // 2 MiB max split: the byte-range splitter must fan out, and the reader
    // must align ranges to container blocks without dropping/duplicating
    conf.setLong("mapreduce.input.fileinputformat.split.maxsize", 2L * 1024 * 1024)
    val rdd = spark.sparkContext.newAPIHadoopFile(
      file, classOf[FourMcTextInputFormat], classOf[LongWritable], classOf[Text], conf)
    assert(rdd.getNumPartitions > 1, s"expected >1 splits, got ${rdd.getNumPartitions}")
    val got = rdd.map { case (_, t) => t.toString }.collect()
    assert(got.length == lines.length)
    assert(got.sorted.toSeq == lines.sorted)
    // same multiset as the DataFrame path over the same file
    val viaDf = spark.read.format("4mc").load(file).collect().map(_.getString(0))
    assert(got.sorted.toSeq == viaDf.sorted.toSeq)
    // keys are block header offsets: non-decreasing within a partition and
    // all >= first block position (12 = container header length)
    val keys = rdd.map { case (k, _) => k.get() }.collect()
    assert(keys.forall(_ >= 12L))
    assert(keys.distinct.length >= 2, "multi-block file must yield >1 distinct block-offset keys")
  }

  test("FourMzTextInputFormat reads zstd containers and skips non-container files") {
    val (file, lines) = writeBig(".4mz", McCodec.Zstd1)
    val dir = new java.io.File(file).getParent
    // droppings a real job leaves behind: must be skipped, not parsed
    Files.writeString(new java.io.File(dir, "_SUCCESS").toPath, "")
    Files.writeString(new java.io.File(dir, "notes.txt").toPath, "not a container")
    val rdd = spark.sparkContext.newAPIHadoopFile(
      dir, classOf[FourMzTextInputFormat], classOf[LongWritable], classOf[Text],
      spark.sparkContext.hadoopConfiguration)
    val got = rdd.map { case (_, t) => t.toString }.collect()
    assert(got.sorted.toSeq == lines.sorted)
  }
}
