package graft.format

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path}
import scala.util.Random

class FormatCoreSpec extends AnyFunSuite {

  private def writeFile(data: Array[Byte], codec: McCodec): Path = {
    val p = Files.createTempFile("fmt", codec.fileExtension)
    val w = new FourMcWriter(Files.newOutputStream(p), codec)
    w.write(data, 0, data.length)
    w.close()
    p
  }

  private def readAll(p: Path): Array[Byte] = {
    val in = McInput.local(p)
    try {
      val idx = FourMcReader.readIndex(in)
      assert(FourMcReader.readHeader(in) == idx.zstd)
      val out = new ByteArrayOutputStream()
      var pos = if (idx.numBlocks > 0) idx.blockOffsets(0) else idx.eosPos
      var done = pos >= idx.eosPos
      while (!done) {
        val (data, nxt) = FourMcReader.readBlock(in, idx.zstd, pos)
        if (data == null) done = true
        else { out.write(data); pos = nxt; if (pos >= idx.eosPos) done = true }
      }
      out.toByteArray
    } finally in.close()
  }

  private val rnd = new Random(42)
  private def textPayload(n: Int): Array[Byte] = {
    val sb = new StringBuilder
    while (sb.length < n) sb.append(s"line-${rnd.nextInt(1000)} lorem ipsum dolor sit amet\n")
    sb.toString.getBytes("UTF-8").take(n)
  }

  for (codec <- McCodec.all) {
    test(s"round-trip ${codec.name}: text, empty, 1B, 4MiB, 4MiB+1, incompressible") {
      val payloads = Seq(
        textPayload(100000),
        Array.empty[Byte],
        Array[Byte](65),
        textPayload(FourMc.MaxBlockSize),
        textPayload(FourMc.MaxBlockSize + 1),
        { val a = new Array[Byte](300000); rnd.nextBytes(a); a }, // store-plain path
        new Array[Byte](50000) // all zeros, highly compressible
      )
      for (data <- payloads) {
        val p = writeFile(data, codec)
        val back = readAll(p)
        assert(back.sameElements(data), s"${codec.name} payload len ${data.length}")
        Files.delete(p)
      }
    }
  }

  test("multi-block file has expected block count and index") {
    val data = textPayload(10 * 1024 * 1024) // 10 MiB -> 3 blocks
    val p = writeFile(data, McCodec.Lz4Fast)
    val in = McInput.local(p)
    val idx = FourMcReader.readIndex(in)
    assert(idx.numBlocks == 3)
    assert(idx.blockOffsets(0) == 12)
    assert(!idx.zstd)
    in.close(); Files.delete(p)
  }

  test("incompressible blocks are stored plain (file ~= payload size)") {
    val data = new Array[Byte](1024 * 1024); rnd.nextBytes(data)
    val p = writeFile(data, McCodec.Zstd3)
    assert(Files.size(p) < data.length + 100) // header+blockhdr+eos+footer overhead only
    assert(readAll(p).sameElements(data))
    Files.delete(p)
  }

  test("corruption in header / block / footer is detected") {
    val data = textPayload(200000)
    for (region <- Seq("header", "block", "footer")) {
      val p = writeFile(data, McCodec.Lz4Fast)
      val bytes = Files.readAllBytes(p)
      val idx = region match {
        case "header" => 5
        case "block"  => 200 // inside first block payload
        case "footer" => bytes.length - 6
      }
      bytes(idx) = (bytes(idx) ^ 0x35).toByte
      Files.write(p, bytes)
      val in = McInput.local(p)
      intercept[java.io.IOException] {
        FourMcReader.readHeader(in)
        val i = FourMcReader.readIndex(in)
        var pos = i.blockOffsets(0)
        var cont = true
        while (cont) {
          val (d, n) = FourMcReader.readBlock(in, i.zstd, pos)
          if (d == null) cont = false else pos = n
        }
      }
      in.close(); Files.delete(p)
    }
  }

  test("big footer (>1000 blocks) exercises tail re-read") {
    val p = Files.createTempFile("fmt", ".4mc")
    val w = new FourMcWriter(Files.newOutputStream(p), McCodec.Lz4Fast)
    val chunk = new Array[Byte](1000)
    rnd.nextBytes(chunk) // incompressible -> plain 1000-byte blocks
    for (_ <- 0 until 1200) { w.write(chunk, 0, chunk.length); w.flushBlock() }
    w.close()
    val in = McInput.local(p)
    val idx = FourMcReader.readIndex(in)
    assert(idx.numBlocks == 1200)
    // footer is larger than the 4 KiB read-ahead
    assert(FourMc.FooterFixedLen + 4 * 1200 > 4096)
    in.close(); Files.delete(p)
  }

  test("line iterator split-invariance: any byte-range partition yields identical lines") {
    val lines = (0 until 50000).map(i => s"row-$i,${rnd.nextInt(100)},${rnd.alphanumeric.take(rnd.nextInt(80)).mkString}")
    val data = (lines.mkString("\n") + "\n").getBytes("UTF-8")
    val p = Files.createTempFile("fmt", ".4mc")
    val w = new FourMcWriter(Files.newOutputStream(p), McCodec.Lz4Fast)
    // small blocks to get many block boundaries
    var off = 0
    while (off < data.length) {
      val n = math.min(64 * 1024, data.length - off)
      w.write(data, off, n); w.flushBlock(); off += n
    }
    w.close()
    val in = McInput.local(p)
    val idx = FourMcReader.readIndex(in)
    val fileLen = Files.size(p)
    def readSplits(bounds: Seq[Long]): Seq[String] =
      bounds.sliding(2).flatMap { case Seq(s, e) =>
        new FourMcLineIterator(in, idx, s, e).map(t => new String(t._2, "UTF-8"))
      }.toSeq
    val whole = readSplits(Seq(0L, fileLen))
    assert(whole == lines, "single split must read every line in order")
    for (nSplits <- Seq(2, 3, 7, 13)) {
      val step = fileLen / nSplits
      val bounds = (0 until nSplits).map(i => i * step).map(_.toLong) :+ fileLen
      assert(readSplits(bounds) == lines, s"$nSplits even splits")
    }
    // adversarial: split boundaries exactly on block starts and odd offsets
    val bb = (0L +: idx.blockOffsets.toSeq.filter(_ % 3 == 0) :+ fileLen).distinct.sorted
    assert(readSplits(bb).sorted == lines.sorted, "block-start-aligned bounds")
    in.close(); Files.delete(p)
  }

  test("lines spanning block boundaries survive") {
    // one huge line bigger than a block
    val big = "X" * (5 * 1024 * 1024)
    val data = (s"first\n$big\nlast\n").getBytes("UTF-8")
    val p = writeFile(data, McCodec.Lz4Fast)
    val in = McInput.local(p)
    val idx = FourMcReader.readIndex(in)
    val got = new FourMcLineIterator(in, idx, 0, Files.size(p)).map(t => new String(t._2)).toSeq
    assert(got == Seq("first", big, "last"))
    in.close(); Files.delete(p)
  }

  test("crlf handling: trailing \\r stripped") {
    val data = "a\r\nb\nc\r\n".getBytes("UTF-8")
    val p = writeFile(data, McCodec.Zstd1)
    val in = McInput.local(p)
    val idx = FourMcReader.readIndex(in)
    val got = new FourMcLineIterator(in, idx, 0, Files.size(p)).map(t => new String(t._2)).toSeq
    assert(got == Seq("a", "b", "c"))
    in.close(); Files.delete(p)
  }

  test("empty file: header+eos+footer, zero blocks, zero lines") {
    val p = writeFile(Array.empty, McCodec.Lz4Fast)
    assert(Files.size(p) == 44) // 12 + 12 + 20
    val in = McInput.local(p)
    val idx = FourMcReader.readIndex(in)
    assert(idx.numBlocks == 0)
    val got = new FourMcLineIterator(in, idx, 0, 44)
    assert(!got.hasNext)
    in.close(); Files.delete(p)
  }
}
