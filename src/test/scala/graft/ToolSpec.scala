package graft

import graft.format.{FourMcReader, McInput}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** CLI flag parity with the reference tool (`native/4mccli.c:226-255`):
  * overwrite refusal without -f, forced stdout via -c, -V/-h exit 0, -q
  * silence. Driven in-process through Tool.run (sys.exit-free).
  */
class ToolSpec extends AnyFunSuite {

  private def tmpInput(): Path = {
    val dir = Files.createTempDirectory("toolspec")
    val f = dir.resolve("data.txt")
    Files.writeString(f, (0 until 2000).map(i => s"row-$i").mkString("\n"))
    f
  }

  private def capturingStd[A](body: => A): (A, Array[Byte], String) = {
    val outBuf = new java.io.ByteArrayOutputStream()
    val errBuf = new java.io.ByteArrayOutputStream()
    val (po, pe) = (System.out, System.err)
    System.setOut(new java.io.PrintStream(outBuf, true))
    System.setErr(new java.io.PrintStream(errBuf, true))
    try { val a = body; (a, outBuf.toByteArray, errBuf.toString("UTF-8")) }
    finally { System.setOut(po); System.setErr(pe) }
  }

  test("aggregated switches and free-form levels parse like the reference; -l errors") {
    val in = tmpInput()
    val out = in.resolveSibling("data.txt.4mz")
    // "-zf4" == "-z -f -4" (reference char-walk, 4mccli.c:206-224)
    assert(Tool.run(Array("-q", "-zf4", in.toString)) == 0)
    val agg = Files.readAllBytes(out)
    assert(Tool.run(Array("-q", "-z", "-f", "-4", in.toString)) == 0)
    assert(Files.readAllBytes(out).toSeq == agg.toSeq,
      "aggregated and separated flags must produce identical output")
    // any digit run is a level; >=4 clamps to ultra exactly like the
    // reference compressor mapping (4mc.c:411-419)
    assert(Tool.run(Array("-q", "-zf12", in.toString)) == 0)
    assert(Files.readAllBytes(out).toSeq == agg.toSeq)
    // -l (Linux-kernel legacy LZ4): accepted like the reference (whose
    // flag is dead code — the encoder always writes the container); a
    // non-quiet compress notes the substitution on stderr
    val (rcL, _, errL) = capturingStd(Tool.run(Array("-lf", in.toString)))
    assert(rcL == 0)
    assert(errL.contains("legacy"), s"expected a legacy substitution note, got: $errL")
    assert(Files.exists(in.resolveSibling("data.txt.4mc")),
      "-l compress must produce the standard container like the reference")
    // unknown flag inside an aggregate still errors
    val (rcX, _, errX) = capturingStd(Tool.run(Array("-zfx", in.toString)))
    assert(rcX == 1 && errX.contains("unknown flag"))
  }

  test("refuses to overwrite an existing output without -f, overwrites with -f") {
    val in = tmpInput()
    val out = in.resolveSibling("data.txt.4mc")
    assert(Tool.run(Array("-q", in.toString)) == 0)
    val firstBytes = Files.readAllBytes(out)
    // second run must refuse AND leave the file untouched
    val (rc, _, err) = capturingStd(Tool.run(Array("-q", in.toString)))
    assert(rc == 1, "existing output must be an error without -f")
    assert(err.contains("-f"), s"error should point at -f, got: $err")
    assert(Files.readAllBytes(out).toSeq == firstBytes.toSeq)
    // -f overwrites (use a higher level so content provably changed)
    assert(Tool.run(Array("-q", "-f", "-3", in.toString)) == 0)
    assert(Files.exists(out))
    // decompress path honors the same semantics toward the .txt target
    assert(Tool.run(Array("-q", "-d", out.toString)) == 1, "decode onto existing input must fail")
    assert(Tool.run(Array("-q", "-d", "-f", out.toString)) == 0)
    assert(Files.readString(in).startsWith("row-0"))
  }

  test("-c forces container output to stdout") {
    val in = tmpInput()
    val (rc, outBytes, _) = capturingStd(Tool.run(Array("-q", "-c", in.toString)))
    assert(rc == 0)
    val f = Files.createTempFile("stdout", ".4mc")
    Files.write(f, outBytes)
    val mc = McInput.local(f)
    try {
      val idx = FourMcReader.readIndex(mc)
      val (block, _) = FourMcReader.readBlock(mc, idx.zstd, idx.blockOffsets(0))
      assert(new String(block, "UTF-8") == Files.readString(in))
    } finally mc.close()
  }

  test("-i integrity scan: clean file exits 0, corrupt payload exits 1, no decode needed") {
    val in = tmpInput()
    val out = in.resolveSibling("data.txt.4mc")
    assert(Tool.run(Array("-q", "-f", in.toString)) == 0)
    // clean scan passes and reports block counts
    val (rc0, _, err0) = capturingStd(Tool.run(Array("-i", out.toString)))
    assert(rc0 == 0 && err0.contains("footer_ok=true"), err0)
    // flip a payload byte -> checksum-walk fails WITHOUT needing a decode
    val raf = new java.io.RandomAccessFile(out.toFile, "rw")
    try {
      raf.seek(20)
      val b = raf.read(); raf.seek(20); raf.write(b ^ 0x08)
    } finally raf.close()
    val (rc1, _, err1) = capturingStd(Tool.run(Array("-i", out.toString)))
    assert(rc1 == 1 && err1.contains("corrupt=1"), err1)
  }

  test("-m writes a directory manifest; non-dir input fails") {
    val in = tmpInput()
    val dir = in.getParent
    assert(Tool.run(Array("-q", "-f", in.toString)) == 0)
    val (rc, _, _) = capturingStd(Tool.run(Array("-m", dir.toString)))
    assert(rc == 0)
    val mf = dir.resolve(graft.format.McManifest.FileName)
    assert(java.nio.file.Files.exists(mf))
    // text-payload files carry no stats segment: a valid, empty manifest
    val m = graft.format.McManifest.parse(java.nio.file.Files.readAllBytes(mf)).get
    assert(m.entries.isEmpty)
    // -m on a FILE is a usage error
    val (rcBad, _, _) = capturingStd(Tool.run(Array("-m", in.toString)))
    assert(rcBad == 1)
  }

  test("-V and -h exit 0 and print; unknown flag exits 1") {
    val (rcV, outV, _) = capturingStd(Tool.run(Array("-V")))
    assert(rcV == 0 && new String(outV).contains("4mc"))
    val (rcH, outH, _) = capturingStd(Tool.run(Array("-h")))
    assert(rcH == 0 && new String(outH).contains("usage"))
    val (rcX, _, errX) = capturingStd(Tool.run(Array("-x", "nope")))
    assert(rcX == 1 && errX.contains("unknown flag"))
  }

  test("legacy kernel-LZ4 frames decode by magic (interop with the system lz4 -l)") {
    // fixture generated by the standard lz4 CLI's legacy mode — gated on
    // the binary being installed, like the .zst interop test
    val lz4Available =
      try { new ProcessBuilder("lz4", "-V").start().waitFor() == 0 }
      catch { case _: java.io.IOException => false }
    assume(lz4Available, "system lz4 binary not installed; skipping legacy interop")
    val dir = Files.createTempDirectory("toolspec-legacy")
    val plain = dir.resolve("plain.txt")
    // > 8 MiB so the legacy frame carries MULTIPLE blocks (fixed 8 MiB
    // decompressed block size), exercising the block loop
    val sb = new StringBuilder
    var i = 0
    while (sb.length < 9 * 1024 * 1024) { sb.append(s"legacy-line-$i-${i * 2654435761L}\n"); i += 1 }
    Files.writeString(plain, sb.toString)
    val lz4File = dir.resolve("plain.txt.lz4")
    assert(new ProcessBuilder("lz4", "-l", "-q", plain.toString, lz4File.toString)
      .inheritIO().start().waitFor() == 0)
    // -t test decode
    val (rcT, outT, _) = capturingStd(Tool.run(Array("-t", lz4File.toString)))
    assert(rcT == 0 && new String(outT).contains("legacy"))
    // -d full decode, default output name drops .lz4
    val decoded = dir.resolve("plain.txt.dec")
    assert(Tool.run(Array("-q", "-d", lz4File.toString, decoded.toString)) == 0)
    assert(java.util.Arrays.equals(Files.readAllBytes(plain), Files.readAllBytes(decoded)),
      "legacy decode must round-trip the system lz4 -l output byte-exactly")
    // stdin pipe decode too (magic-sniffed, no extension available)
    val (rcP, outP, _) = capturingStd {
      val prevIn = System.in
      try {
        System.setIn(Files.newInputStream(lz4File))
        Tool.run(Array("-q", "-d", "-", "-"))
      } finally System.setIn(prevIn)
    }
    assert(rcP == 0)
    assert(java.util.Arrays.equals(outP, Files.readAllBytes(plain)),
      "stdin legacy decode must match")
  }

  test("-q silences status output; default prints it") {
    val in = tmpInput()
    val (rcQ, outQ, errQ) = capturingStd(Tool.run(Array("-q", "-t", in.toString + {
      Tool.run(Array("-q", in.toString)); ".4mc"
    })))
    assert(rcQ == 0)
    assert(outQ.isEmpty && errQ.isEmpty, s"quiet run should print nothing, got '${new String(outQ)}' / '$errQ'")
    val (rcL, outL, _) = capturingStd(Tool.run(Array("-t", in.toString + ".4mc")))
    assert(rcL == 0 && new String(outL).contains("OK"))
  }
}
