package graft.format

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Byte-layout golden test: a 4mc file assembled field-by-field from the
  * public spec (`/root/reference/4mc-format-spec:17-35`) — NOT via our writer
  * — must decode, and our writer must reproduce it byte-for-byte. Catches the
  * "writer and reader agree on the wrong layout" failure mode.
  */
class GoldenBytesSpec extends AnyFunSuite {

  private def be(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  test("hand-assembled one-plain-block 4mc file decodes per spec") {
    val payload = "hello world\n".getBytes("UTF-8") // 12 B, stored plain
    val headerFirst8 = be(0x344d4300) ++ be(1)
    val header = headerFirst8 ++ be(FourMc.xxhash32(headerFirst8, 0, 8))
    // block: uncompressedSize | compressedSize (== → plain) | xxhash32(payload)
    val block = be(payload.length) ++ be(payload.length) ++
      be(FourMc.xxhash32(payload, 0, payload.length)) ++ payload
    val eos = be(0) ++ be(0) ++ be(0)
    // footer: size | version | delta(=12, first block offset) | size | magic | checksum
    val footerSize = 20 + 4 * 1
    val footerBody = be(footerSize) ++ be(1) ++ be(12) ++ be(footerSize) ++ be(0x344d4300)
    val footer = footerBody ++ be(FourMc.xxhash32(footerBody, 0, footerBody.length))
    val bytes = header ++ block ++ eos ++ footer

    val p = Files.createTempFile("golden", ".4mc")
    Files.write(p, bytes)
    val in = McInput.local(p)
    val idx = FourMcReader.readIndex(in)
    assert(!idx.zstd && idx.numBlocks == 1 && idx.blockOffsets(0) == 12)
    assert(!FourMcReader.readHeader(in))
    val (data, _) = FourMcReader.readBlock(in, idx.zstd, 12)
    assert(new String(data, "UTF-8") == "hello world\n")
    in.close()

    // our writer reproduces the identical bytes (store-plain because the
    // payload is too short for lz4 to shrink)
    val p2 = Files.createTempFile("golden2", ".4mc")
    val w = new FourMcWriter(Files.newOutputStream(p2), McCodec.Lz4Fast)
    w.write(payload, 0, payload.length); w.close()
    assert(Files.readAllBytes(p2).sameElements(bytes))
    Files.delete(p); Files.delete(p2)
  }

  test("4mz magic per spec") {
    val p = Files.createTempFile("golden", ".4mz")
    val w = new FourMcWriter(Files.newOutputStream(p), McCodec.Zstd3)
    w.write("x".getBytes, 0, 1); w.close()
    val bytes = Files.readAllBytes(p)
    assert(((bytes(0) & 0xff) << 24 | (bytes(1) & 0xff) << 16 |
      (bytes(2) & 0xff) << 8 | (bytes(3) & 0xff)) == 0x344d5a00)
    Files.delete(p)
  }
}
