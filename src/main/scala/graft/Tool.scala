package graft

import graft.format._
import java.nio.file.{Files, Path, Paths}

/** CLI compress/decompress for 4mc/4mz files — the analog of the reference's
  * `4mc` tool (`native/4mccli.c:170-361`): level flags `-1..-4`, `-z` for
  * ZSTD, `-d` to decode, auto extension handling, plus the reference's
  * control flags (`4mccli.c:226-255`): `-f` overwrite, `-c` force stdout,
  * `-t` test, `-v`/`-q` display level, `-V`/`-h` version/usage.
  *
  * Switches aggregate exactly like the reference's char-walk parser
  * (`4mccli.c:206-224`): `-zf4` == `-z -f -4`, and any digit run is a level
  * (`-12` clamps to ultra). `-l` (Linux-kernel legacy LZ4 frames,
  * `4mccli.c:232-234`) is accepted like the reference — whose flag is
  * DEAD code: its encoder always writes the container — and this tool
  * additionally DECODES legacy frames for real, auto-detected by magic
  * (`-d old.lz4` just works; round 15).
  *
  * Usage:
  *   graft.Tool [-z] [-s] [-1|-2|-3|-4] [-d] [-t] [-f] [-c] [-v|-q] input [output]
  *     -z  use ZSTD container (.4mz); default LZ4 (.4mc)
  *     -s  ZSTD full-frame stream (.zst, NOT splittable) — the reference's
  *         ZstCodec family (`ZstCodec.java:47-51`); for data exchange with
  *         standard zstd tooling, not for parallel scans
  *     -1..-4  level fast/medium/high/ultra (compress only)
  *     -d  decompress ("-" as input/output = stdin/stdout)
  *     -t  test integrity (decode, discard output)
  *     -f  overwrite the output file if it exists (refused otherwise)
  *     -c  write to stdout (implies keeping the input file)
  *     -v  verbose; -q  suppress status messages
  *     -V / -h  print version / usage and exit 0
  */
object Tool {

  private final class CliError(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new CliError(msg)

  private val Version = "4mc-graft 1.0 (pure-JVM 4mc/4mz container tool)"
  private val Usage =
    """usage: 4mc [-z] [-s] [-1|-2|-3|-4] [-d] [-t] [-i] [-f] [-c] [-v|-q] input [output]
      |  -z zstd container (.4mz)   -s zstd full-frame stream (.zst)
      |  -1..-4 compression level   -d decompress   -t test integrity (full decode)
      |  -i integrity scan only (checksum walk, no decompression)
      |  -l accept legacy kernel-LZ4 flag (decode auto-detects legacy frames)
      |  -m write/refresh a directory's _graft_manifest (input is a DIR)
      |  -f force overwrite         -c force stdout
      |  -v verbose                 -q quiet        -V version   -h help""".stripMargin

  def main(args: Array[String]): Unit = sys.exit(run(args))

  /** Parse + execute; returns the process exit code (0 ok, 1 error). Kept
    * sys.exit-free so the suite can drive it in-process.
    */
  def run(args: Array[String]): Int = {
    var zstd = false; var level = 1; var decode = false; var testOnly = false
    var zstStream = false; var force = false; var toStdout = false; var quiet = false
    var integrityOnly = false; var legacyFlag = false; var manifestOnly = false
    val paths = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      // Char-walk parser mirroring the reference CLI (`4mccli.c:206-255`):
      // switches aggregate ("-zf4" == "-z -f -4") and any digit run is a
      // compression level ("-12" == level 12). Levels clamp like the
      // reference's compressor mapping (<=1 fast, 2 medium, 3 high, >=4
      // ultra, `4mc.c:411-419`).
      args.foreach { arg =>
        if (arg == "-") paths += "-"
        else if (arg == "--help") { System.out.println(Usage); return 0 }
        else if (arg.startsWith("-")) {
          var i = 1
          while (i < arg.length) {
            val c = arg(i)
            if (c.isDigit) {
              var lvl = 0
              while (i < arg.length && arg(i).isDigit) {
                lvl = math.min(lvl * 10 + (arg(i) - '0'), 99); i += 1
              }
              i -= 1
              level = math.max(1, math.min(lvl, 4))
            } else c match {
              case 'z' => zstd = true
              case 's' => zstStream = true
              case 'd' => decode = true
              case 't' => testOnly = true
              case 'i' => integrityOnly = true
              case 'm' => manifestOnly = true
              case 'f' => force = true
              case 'c' => toStdout = true
              case 'v' => quiet = false
              case 'q' => quiet = true
              case 'V' => System.out.println(Version); return 0
              case 'h' | 'H' => System.out.println(Usage); return 0
              case 'l' =>
                // reference `-l` parses the Linux-kernel legacy-LZ4 flag but
                // never USES it (`4mccli.c:172,234` — the variable is dead;
                // its encoder always writes the 4mc container). We match
                // accept-on-compress (with a note instead of silence) and go
                // one better on DECODE: legacy frames are auto-detected by
                // magic, so `-d`/`-t` read old `.lz4` kernel-format archives
                // with or without the flag ([[legacyLz4Decode]]).
                legacyFlag = true
              case other => fail(s"unknown flag -$other")
            }
            i += 1
          }
        } else paths += arg
      }
      if (paths.isEmpty) fail("no input file given")
      val outArg = if (toStdout) Some("-") else paths.lift(1)
      // extension-driven dispatch like the reference CLI: a .zst input
      // decodes through the full-frame path without needing -s
      val zstByExt = (decode || testOnly) && paths.head.endsWith(".zst")
      if (zstStream || zstByExt) {
        zstFrame(paths.head, outArg, decode || testOnly, level, testOnly, force, quiet)
        return 0
      }
      if (paths.head == "-" || outArg.contains("-")) {
        // stdin/stdout pipeline mode for the container (reference
        // `4mccli.c:282-333`): compress streams through the blockwise writer;
        // decompress uses the sequential (footer-free) block decoder
        containerPipe(paths.head, outArg, decode || testOnly, testOnly, zstd, level, force, quiet)
        return 0
      }
      val in = Paths.get(paths.head)
      if (!Files.exists(in)) fail(s"input not found: $in")

      if (manifestOnly) {
        // write/refresh the directory pruning manifest — the CLI twin of
        // the compaction/batch-commit integration (graft.format.McManifest)
        if (!Files.isDirectory(in)) fail(s"-m expects a directory: $in")
        val n = graft.format.McManifest.write(
          in.toAbsolutePath.toString, new org.apache.hadoop.conf.Configuration())
        if (!quiet) System.err.println(s"manifest: $n entries -> $in/${graft.format.McManifest.FileName}")
        return 0
      }
      if (integrityOnly) {
        // checksum-only walk (no decompression) — the single-file twin of
        // the distributed graft.ops.Fsck sweep; corrupt => exit 1
        val rep = graft.ops.Fsck.checkFile(
          in.toAbsolutePath.toString, Files.size(in),
          new org.apache.hadoop.conf.Configuration())
        if (!quiet)
          System.err.println(
            s"4mc: ${in.getFileName}: footer_ok=${rep.footer_ok} blocks=${rep.n_blocks} " +
              s"corrupt=${rep.n_corrupt_blocks}${if (rep.error.nonEmpty) s" (${rep.error})" else ""}")
        return if (rep.footer_ok && rep.n_corrupt_blocks == 0) 0 else 1
      }
      if (decode || testOnly) decompress(in, outArg.map(Paths.get(_)), testOnly, force, quiet)
      else {
        if (legacyFlag && !quiet)
          System.err.println(
            "4mc: note: -l (legacy kernel LZ4) encode is not a 4mc format; " +
              "writing the standard container (the reference CLI does the same)")
        compress(in, outArg.map(Paths.get(_)), zstd, level, force, quiet)
      }
      0
    } catch {
      case e: CliError => System.err.println(s"4mc: ${e.getMessage}"); 1
      case e: java.io.IOException => System.err.println(s"4mc: ${e.getMessage}"); 1
    }
  }

  /** Reference overwrite semantics (`4mccli.c` overwriteMode): an existing
    * output file is an ERROR unless -f was given.
    */
  private def checkOverwrite(out: Path, force: Boolean): Unit =
    if (!force && Files.exists(out))
      fail(s"output file $out already exists; use -f to overwrite")

  /** Container compress/decompress with "-" as stdin/stdout on either side. */
  private def containerPipe(inPath: String, outPath: Option[String], decode: Boolean,
                            testOnly: Boolean, zstd: Boolean, level: Int,
                            force: Boolean, quiet: Boolean): Unit = {
    val in: java.io.InputStream =
      if (inPath == "-") System.in else Files.newInputStream(Paths.get(inPath))
    val outName = outPath.getOrElse {
      if (inPath == "-") "-"
      else if (decode) {
        if (inPath.endsWith(".4mc") || inPath.endsWith(".4mz")) inPath.dropRight(4)
        else inPath + ".out"
      } else inPath + codecFor(zstd, level).fileExtension
    }
    if (!testOnly && outName != "-") checkOverwrite(Paths.get(outName), force)
    val rawOut: java.io.OutputStream =
      if (testOnly) java.io.OutputStream.nullOutputStream()
      else if (outName == "-") System.out
      else new java.io.BufferedOutputStream(Files.newOutputStream(Paths.get(outName)), 1 << 16)
    val buf = new Array[Byte](1 << 20)
    var total = 0L
    if (decode) {
      // sniff the first 4 bytes: 4mc/4mz container vs standard zstd frame
      val pin = new java.io.PushbackInputStream(in, 4)
      val head = new Array[Byte](4)
      val got = pin.readNBytes(head, 0, 4)
      pin.unread(head, 0, got)
      val isZstFrame = got == 4 &&
        (head(0) & 0xff) == 0x28 && (head(1) & 0xff) == 0xb5 &&
        (head(2) & 0xff) == 0x2f && (head(3) & 0xff) == 0xfd
      if (isLegacyHead(head, got)) {
        // consume the sniffed magic, then stream legacy frames
        pin.skipNBytes(4)
        total = legacyLz4Decode(pin, rawOut)
      } else {
        val src: java.io.InputStream =
          if (isZstFrame) new com.github.luben.zstd.ZstdInputStream(pin)
          else new graft.hadoop.FourMcCompressionInputStream(pin)
        var n = src.read(buf, 0, buf.length)
        while (n > 0) { rawOut.write(buf, 0, n); total += n; n = src.read(buf, 0, buf.length) }
        src.close()
      }
    } else {
      val w = new FourMcWriter(rawOut, codecFor(zstd, level))
      var n = in.read(buf)
      while (n > 0) { w.write(buf, 0, n); total += n; n = in.read(buf) }
      in.close()
      w.finish()
    }
    rawOut.flush()
    if (outName != "-") rawOut.close()
    if (!quiet) System.err.println(
      s"$inPath -> ${if (testOnly) "(test)" else outName} ($total bytes ${if (decode) "out" else "in"})")
  }

  /** Full-frame .zst stream (stdin/stdout capable, interoperable with the
    * standard zstd CLI; single frame, not splittable).
    */
  private def zstFrame(inPath: String, outPath: Option[String], decode: Boolean, level: Int,
                       testOnly: Boolean, force: Boolean, quiet: Boolean): Unit = {
    val zLevel = Seq(1, 3, 6, 12)(math.min(level, 4) - 1)
    val in: java.io.InputStream =
      if (inPath == "-") System.in
      else Files.newInputStream(Paths.get(inPath))
    val outName = outPath.getOrElse {
      if (testOnly) "(test)"
      else if (inPath == "-") "-"
      else if (decode && inPath.endsWith(".zst")) inPath.dropRight(4)
      else inPath + ".zst"
    }
    if (!testOnly && outName != "-" && outName != "(test)") checkOverwrite(Paths.get(outName), force)
    val toStdout = outName == "-"
    val rawOut: java.io.OutputStream =
      if (testOnly) java.io.OutputStream.nullOutputStream()
      else if (toStdout) new graft.hadoop.NonClosingOutputStream(System.out)
      else Files.newOutputStream(Paths.get(outName))
    val (src, dst) =
      if (decode) (new com.github.luben.zstd.ZstdInputStream(in), rawOut)
      else (in, new com.github.luben.zstd.ZstdOutputStream(rawOut, zLevel))
    val buf = new Array[Byte](1 << 16)
    var n = src.read(buf)
    var total = 0L
    while (n > 0) { dst.write(buf, 0, n); total += n; n = src.read(buf) }
    // the no-close stdout wrapper lets dst.close() finish the zstd frame
    // without killing the process's real System.out (Tool.run is in-process)
    src.close(); dst.close()
    if (toStdout) System.out.flush()
    if (outName != "-" && !quiet)
      System.err.println(s"$inPath -> $outName ($total bytes ${if (decode) "out" else "in"})")
  }

  private def codecFor(zstd: Boolean, level: Int): McCodec = (zstd, level) match {
    case (false, 1) => McCodec.Lz4Fast
    case (false, 2) => McCodec.Lz4Medium
    case (false, 3) => McCodec.Lz4High
    case (false, _) => McCodec.Lz4Ultra
    case (true, 1)  => McCodec.Zstd1
    case (true, 2)  => McCodec.Zstd3
    case (true, 3)  => McCodec.Zstd6
    case (true, _)  => McCodec.Zstd12
  }

  private def compress(in: Path, outOpt: Option[Path], zstd: Boolean, level: Int,
                       force: Boolean, quiet: Boolean): Unit = {
    val codec = codecFor(zstd, level)
    val out = outOpt.getOrElse(Paths.get(in.toString + codec.fileExtension))
    checkOverwrite(out, force)
    val t0 = System.nanoTime()
    val w = new FourMcWriter(new java.io.BufferedOutputStream(Files.newOutputStream(out), 1 << 16), codec)
    val inStream = Files.newInputStream(in)
    val buf = new Array[Byte](1 << 20)
    var total = 0L
    var n = inStream.read(buf)
    while (n > 0) { w.write(buf, 0, n); total += n; n = inStream.read(buf) }
    inStream.close(); w.close()
    val secs = (System.nanoTime() - t0) / 1e9
    val outLen = Files.size(out)
    if (!quiet) System.out.println(f"$in -> $out [${codec.name}] $total%d -> $outLen%d bytes " +
      f"(ratio ${total.toDouble / math.max(1, outLen)}%.3f, ${total / 1e6 / secs}%.1f MB/s)")
  }

  /** Legacy (Linux-kernel) LZ4 frame magic, little-endian on disk:
    * `02 21 4C 18`. Public format (lz4 frame spec, "legacy frame"):
    * magic, then blocks of [LE32 compressedSize][LZ4 block bytes], each
    * decompressing to at most 8 MiB; frames may concatenate (a new magic
    * where a size word would be starts the next frame); EOF ends the
    * stream.
    */
  private val LegacyMagic = 0x184C2102
  private val LegacyBlockSize = 8 << 20

  private def isLegacyHead(head: Array[Byte], got: Int): Boolean =
    got >= 4 &&
      (head(0) & 0xff) == 0x02 && (head(1) & 0xff) == 0x21 &&
      (head(2) & 0xff) == 0x4c && (head(3) & 0xff) == 0x18

  /** Decode a legacy LZ4 frame stream (positioned AFTER the first magic);
    * returns decompressed byte count. lz4-java's safe decompressor is the
    * same library the container blocks decode through.
    */
  private def legacyLz4Decode(in: java.io.InputStream, out: java.io.OutputStream): Long = {
    val dec = net.jpountz.lz4.LZ4Factory.fastestInstance().safeDecompressor()
    val word = new Array[Byte](4)
    val dst = new Array[Byte](LegacyBlockSize)
    var src = new Array[Byte](1 << 16)
    var total = 0L
    var done = false
    while (!done) {
      val got = in.readNBytes(word, 0, 4)
      if (got == 0) done = true
      else if (got < 4) fail("legacy lz4: truncated block size word")
      else {
        val v = (word(0) & 0xff) | ((word(1) & 0xff) << 8) |
          ((word(2) & 0xff) << 16) | ((word(3) & 0xff) << 24)
        if (v == LegacyMagic) () // concatenated frame: next word is a size
        else {
          // compressBound(8 MiB) ≈ 8.03 MiB — anything larger is corrupt
          if (v <= 0 || v > LegacyBlockSize + (LegacyBlockSize / 255) + 16)
            fail(f"legacy lz4: implausible block size $v%d")
          if (src.length < v) src = new Array[Byte](v)
          if (in.readNBytes(src, 0, v) != v) fail("legacy lz4: truncated block")
          val n = dec.decompress(src, 0, v, dst, 0)
          out.write(dst, 0, n)
          total += n
        }
      }
    }
    total
  }

  private def decompress(in: Path, outOpt: Option[Path], testOnly: Boolean,
                         force: Boolean, quiet: Boolean): Unit = {
    val out = outOpt.getOrElse {
      val s = in.toString
      if (s.endsWith(".4mc") || s.endsWith(".4mz") || s.endsWith(".lz4")) Paths.get(s.dropRight(4))
      else Paths.get(s + ".out")
    }
    if (!testOnly) checkOverwrite(out, force)
    val t0 = System.nanoTime()
    // magic-dispatch BEFORE the container reader: legacy kernel-LZ4 frames
    // (old `.lz4` archives) have no footer index and decode sequentially
    locally {
      val probe = Files.newInputStream(in)
      val head = new Array[Byte](4)
      val got = probe.readNBytes(head, 0, 4)
      if (isLegacyHead(head, got)) {
        try {
          val os =
            if (testOnly) java.io.OutputStream.nullOutputStream()
            else new java.io.BufferedOutputStream(Files.newOutputStream(out), 1 << 16)
          val total = legacyLz4Decode(new java.io.BufferedInputStream(probe, 1 << 16), os)
          os.close()
          val secs = (System.nanoTime() - t0) / 1e9
          if (quiet) ()
          else if (testOnly)
            System.out.println(f"$in: OK (legacy lz4, $total bytes, ${total / 1e6 / secs}%.1f MB/s)")
          else System.out.println(f"$in -> $out $total bytes (legacy lz4, ${total / 1e6 / secs}%.1f MB/s)")
        } finally probe.close()
        return
      }
      probe.close()
    }
    val mcIn = McInput.local(in)
    try {
      val idx = FourMcReader.readIndex(mcIn)
      FourMcReader.readHeader(mcIn)
      val os =
        if (testOnly) java.io.OutputStream.nullOutputStream()
        else new java.io.BufferedOutputStream(Files.newOutputStream(out), 1 << 16)
      var total = 0L
      var pos = if (idx.numBlocks > 0) idx.blockOffsets(0) else idx.eosPos
      var done = pos >= idx.eosPos
      while (!done) {
        val (data, nxt) = FourMcReader.readBlock(mcIn, idx.zstd, pos)
        if (data == null) done = true
        else { os.write(data); total += data.length; pos = nxt; if (pos >= idx.eosPos) done = true }
      }
      os.close()
      val secs = (System.nanoTime() - t0) / 1e9
      if (quiet) ()
      else if (testOnly) System.out.println(f"$in: OK (${idx.numBlocks} blocks, $total bytes, ${total / 1e6 / secs}%.1f MB/s)")
      else System.out.println(f"$in -> $out $total bytes (${total / 1e6 / secs}%.1f MB/s)")
    } finally mcIn.close()
  }
}
