package graft.hadoop

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** A11 parity: the Hadoop CompressionCodec surface the reference exposes
  * (`TestTextInput.java:58-76`, `TestProtobufInput.java:115`) — any job's
  * text output compressed to 4mc/4mz via a codec class, read back by both
  * the generic text reader (extension-discovered codec) and the splittable
  * `format("4mc")` reader (byte-compatibility of the produced container).
  */
class HadoopCodecSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("hadoop-codec-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("fourmc-codec").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val lines = (0 until 50000).map(i => s"line-$i|${"x" * (i % 40)}")

  test("rdd.saveAsTextFile(codec) writes .4mz readable by text and 4mc readers") {
    import spark.implicits._
    val dir = tmpDir()
    spark.sparkContext.parallelize(lines, 3)
      .saveAsTextFile(dir, classOf[FourMzHighCodec])
    val names = new java.io.File(dir).listFiles.map(_.getName).filter(_.startsWith("part-"))
    assert(names.nonEmpty && names.forall(_.endsWith(".4mz")), names.mkString(","))
    // generic text read: codec found via ServiceLoader by extension
    val viaText = spark.read.text(dir).as[String].collect()
    assert(viaText.sorted.toSeq == lines.sorted)
    // splittable container reader: same bytes, block-parallel path
    val viaFourMc = spark.read.format("4mc").load(dir).as[String].collect()
    assert(viaFourMc.sorted.toSeq == lines.sorted)
  }

  test("df.write.option(compression, codec class).text writes .4mc") {
    import spark.implicits._
    val dir = tmpDir()
    lines.toDF("value").repartition(2)
      .write.option("compression", classOf[FourMcCodec].getName).text(dir)
    val names = new java.io.File(dir).listFiles.map(_.getName).filter(_.startsWith("part-"))
    assert(names.nonEmpty && names.forall(_.endsWith(".4mc")), names.mkString(","))
    val back = spark.read.text(dir).as[String].collect()
    assert(back.sorted.toSeq == lines.sorted)
    assert(spark.read.format("4mc").load(dir).count() == lines.length)
  }

  test("codec factory discovers 4mc/4mz by extension; any level decodes any file") {
    val factory = new CompressionCodecFactory(spark.sparkContext.hadoopConfiguration)
    val mc = factory.getCodec(new Path("/x/part-0000.4mc"))
    val mz = factory.getCodec(new Path("/x/part-0000.4mz"))
    assert(mc != null && mc.isInstanceOf[GraftContainerCodec], s"got $mc")
    assert(mz != null && mz.isInstanceOf[GraftContainerCodec], s"got $mz")
    // magic-driven decode: an LZ4-family codec instance reads a zstd container
    val payload = lines.mkString("\n").getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val cos = new FourMzUltraCodec().createOutputStream(bos)
    cos.write(payload); cos.finish(); cos.close()
    val cis = new FourMcCodec().createInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
    val got = cis.readAllBytes()
    assert(java.util.Arrays.equals(got, payload))
  }

  test("empty partitions produce valid empty containers, not 0-byte files") {
    import spark.implicits._
    val dir = tmpDir()
    // 8 partitions, only 3 rows -> most partitions are empty
    spark.sparkContext.parallelize(Seq("a", "b", "c"), 8)
      .saveAsTextFile(dir, classOf[FourMcCodec])
    val parts = new java.io.File(dir).listFiles.filter(_.getName.startsWith("part-"))
    assert(parts.length == 8)
    assert(parts.forall(_.length() > 0), "empty partition left a 0-byte file")
    val back = spark.read.text(dir).as[String].collect()
    assert(back.sorted.toSeq == Seq("a", "b", "c"))
    // a genuinely 0-byte .4mc file reads as empty, not as an error
    val zero = new java.io.File(dir, "zero.4mc")
    zero.createNewFile()
    val cis = new FourMcCodec().createInputStream(new java.io.FileInputStream(zero))
    assert(cis.read() == -1)
  }

  test("corrupt block payload fails the codec input stream") {
    val payload = ("abc" * 100000).getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val cos = new FourMcHighCodec().createOutputStream(bos)
    cos.write(payload); cos.finish(); cos.close()
    val bytes = bos.toByteArray
    bytes(40) = (bytes(40) ^ 0x5a).toByte // inside first block payload
    val cis = new FourMcCodec().createInputStream(new java.io.ByteArrayInputStream(bytes))
    val e = intercept[java.io.IOException](cis.readAllBytes())
    assert(e.getMessage.contains("checksum") || e.getMessage.contains("corrupt"))
  }
}
