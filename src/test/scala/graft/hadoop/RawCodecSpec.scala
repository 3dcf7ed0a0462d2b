package graft.hadoop

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** A13 parity: the raw (container-less) block codec families and the
  * standard-frame `.zst` codec (`Lz4Codec.java:54-164`,
  * `ZstdCodec.java:170-171`, `ZstCodec.java:47-166`).
  */
class RawCodecSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("raw-codec-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("rawcodec").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val lines = (0 until 30000).map(i => s"raw-$i-${"pad" * (i % 13)}")

  test("raw lz4 and zstd block codecs roundtrip through saveAsTextFile") {
    import spark.implicits._
    for ((cls, ext) <- Seq(
        (classOf[Lz4RawCodec], ".lz4_fast"),
        (classOf[ZstdRawHighCodec], ".zstd_high"))) {
      val dir = tmpDir()
      spark.sparkContext.parallelize(lines, 2).saveAsTextFile(dir, cls)
      val names = new java.io.File(dir).listFiles.map(_.getName).filter(_.startsWith("part-"))
      assert(names.nonEmpty && names.forall(_.endsWith(ext)), names.mkString(","))
      val back = spark.read.text(dir).as[String].collect()
      assert(back.sorted.toSeq == lines.sorted, cls.getName)
    }
  }

  test("incompressible data passes through raw blocks stored plain") {
    val rnd = new scala.util.Random(7)
    val payload = new Array[Byte](1 << 20)
    rnd.nextBytes(payload)
    val bos = new java.io.ByteArrayOutputStream()
    val cos = new Lz4RawCodec().createOutputStream(bos)
    cos.write(payload); cos.finish(); cos.close()
    assert(bos.size() >= payload.length) // plain + 8B framing
    val cis = new Lz4RawCodec().createInputStream(new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(java.util.Arrays.equals(cis.readAllBytes(), payload))
  }

  test(".zst codec roundtrips and interops with the system zstd tool") {
    import spark.implicits._
    val dir = tmpDir()
    lines.toDF("value").coalesce(1)
      .write.option("compression", classOf[ZstCodec].getName).text(dir)
    val f = new java.io.File(dir).listFiles.find(_.getName.endsWith(".zst")).get
    // spark reads its own output back by extension
    val back = spark.read.text(dir).as[String].collect()
    assert(back.sorted.toSeq == lines.sorted)
    // the frames are STANDARD zstd: the system tool decodes them — but only
    // assert that where a system tool exists (the JVM round-trip above is
    // the unconditional part of this test)
    val zstdAvailable =
      try { new ProcessBuilder("zstd", "-V").start().waitFor() == 0 }
      catch { case _: java.io.IOException => false }
    assume(zstdAvailable, "system zstd binary not installed; skipping interop half")
    val out = Files.createTempFile("zstcheck", ".txt")
    val p = new ProcessBuilder("zstd", "-d", "-f", f.getAbsolutePath, "-o", out.toString)
      .redirectErrorStream(true).start()
    assert(p.waitFor() == 0, "system zstd failed to decode our .zst output")
    val decoded = new String(Files.readAllBytes(out), "UTF-8").split("\n").filter(_.nonEmpty)
    assert(decoded.sorted.toSeq == lines.sorted)
    // and we decode frames produced by the system tool
    val plain = Files.createTempFile("zstsrc", ".txt")
    Files.write(plain, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    val zfile = new java.io.File(plain.toString + ".zst")
    val p2 = new ProcessBuilder("zstd", "-f", plain.toString, "-o", zfile.toString)
      .redirectErrorStream(true).start()
    assert(p2.waitFor() == 0)
    val cis = new ZstCodec().createInputStream(new java.io.FileInputStream(zfile))
    val roundtrip = new String(cis.readAllBytes(), "UTF-8")
    assert(roundtrip == lines.mkString("", "\n", "\n"))
  }
}
