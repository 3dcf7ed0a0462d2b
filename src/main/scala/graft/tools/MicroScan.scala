package graft.tools

import graft.sources.CsvPayload

/** Micro-benchmark for the shared csv boundary scan (the hot path of every
  * 4mc csv scan): current implementation vs a byte-at-a-time reference,
  * over a lineitem-shaped line (dense delimiters) and a documents-shaped
  * line (long text fields). Run: `sbt "runMain graft.tools.MicroScan"`.
  * Also cross-checks boundary offsets so the two can never drift silently.
  */
object MicroScan {

  /** The pre-SWAR byte-at-a-time scan, kept verbatim as the semantic
    * reference.
    */
  private def scanRef(bytes: Array[Byte], delim: Byte, starts: Array[Int], base: Int,
                      neededFields: Int, totalFields: Int): Unit = {
    val Esc = CsvPayload.Esc
    var f = 1
    starts(base) = 0
    var i = 0
    while (i < bytes.length && f < neededFields) {
      val b = bytes(i)
      if (b == Esc) i += 2
      else {
        if (b == delim) { starts(base + f) = i + 1; f += 1 }
        i += 1
      }
    }
    while (f <= math.min(neededFields, totalFields - 1)) {
      starts(base + f) = bytes.length + 1; f += 1
    }
    if (neededFields == totalFields) starts(base + totalFields) = bytes.length + 1
  }

  def main(args: Array[String]): Unit = {
    val r = new scala.util.Random(42)
    def field(len: Int): String = r.alphanumeric.take(len).mkString
    val lineitem = ((1 to 16).map(_ => field(6)).mkString("|") + "\n").getBytes
    val docs = ((1 to 4).map(_ => field(300)).mkString("|") + "\n").getBytes
    val escaped = ((1 to 8).map(_ => field(10) + "\\|" + field(10)).mkString("|") + "\n").getBytes
    val iters = 3000000

    for {
      (lbl, bytes, total) <- Seq(("lineitem(16x6)", lineitem, 16),
        ("docs(4x300)", docs, 4), ("escaped(8x22)", escaped, 8))
      needed <- Seq(total / 2 + 1, total)
    } {
      val s1 = new Array[Int](total + 1)
      val s2 = new Array[Int](total + 1)
      // equivalence over the fixture (the property suite covers random input)
      CsvPayload.scanBoundaries(bytes, '|'.toByte, s1, 0, needed, total)
      scanRef(bytes, '|'.toByte, s2, 0, needed, total)
      require(s1.toSeq == s2.toSeq, s"boundary drift on $lbl needed=$needed")
      var sink = 0L
      def time(f: () => Unit): Double = {
        var k = 0
        while (k < iters / 3) { f(); k += 1 } // warm
        val t0 = System.nanoTime(); k = 0
        while (k < iters) { f(); k += 1 }
        (System.nanoTime() - t0) / 1e6
      }
      val tCur = time(() => { CsvPayload.scanBoundaries(bytes, '|'.toByte, s1, 0, needed, total); sink += s1(1) })
      val tRef = time(() => { scanRef(bytes, '|'.toByte, s2, 0, needed, total); sink += s2(1) })
      println(f"$lbl%-16s needed=$needed%2d len=${bytes.length}%4d: current=$tCur%7.0f ms  byte-ref=$tRef%7.0f ms  speedup=${tRef / tCur}%.2fx  [$sink]")
    }
  }
}
