package graft.hadoop

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{LongWritable, SequenceFile, Text}
import org.apache.hadoop.io.SequenceFile.CompressionType
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Reference parity (`Readme.md:95-101`): the codecs compress "any Hadoop
  * Writable stream" — SequenceFiles and intermediate M/R data — not just
  * text output.
  */
class SequenceFileSpec extends AnyFunSuite {

  private def roundtrip(ct: CompressionType,
                        codec: org.apache.hadoop.io.compress.CompressionCodec = new FourMzMediumCodec): Unit = {
    val conf = new Configuration()
    val p = new Path(Files.createTempDirectory("seq4mc").toString, s"data-$ct.seq")
    val w = SequenceFile.createWriter(
      conf,
      SequenceFile.Writer.file(p),
      SequenceFile.Writer.keyClass(classOf[LongWritable]),
      SequenceFile.Writer.valueClass(classOf[Text]),
      SequenceFile.Writer.compression(ct, codec)
    )
    val n = 20000
    (0 until n).foreach(i => w.append(new LongWritable(i.toLong), new Text(s"value-$i-${"x" * (i % 20)}")))
    w.close()

    val r = new SequenceFile.Reader(conf, SequenceFile.Reader.file(p))
    try {
      val k = new LongWritable()
      val v = new Text()
      var i = 0
      while (r.next(k, v)) {
        assert(k.get() == i.toLong)
        assert(v.toString == s"value-$i-${"x" * (i % 20)}")
        i += 1
      }
      assert(i == n)
    } finally r.close()
  }

  test("SequenceFile RECORD compression with the 4mz codec round-trips") {
    roundtrip(CompressionType.RECORD)
  }

  test("SequenceFile BLOCK compression with the 4mz codec round-trips") {
    roundtrip(CompressionType.BLOCK)
  }

  // .zst: the reader calls resetState() at every compressed-segment
  // boundary — a stale decoder there desyncs the stream (the r3 no-op bug)
  test("SequenceFile RECORD compression with the .zst codec round-trips") {
    roundtrip(CompressionType.RECORD, new ZstCodec)
  }

  test("SequenceFile BLOCK compression with the .zst codec round-trips") {
    roundtrip(CompressionType.BLOCK, new ZstCodec)
  }
}
