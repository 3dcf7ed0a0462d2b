package graft.tools

/** Exhaustive check (one-off experiment, result pinned in PLANS.md):
  * for EVERY finite float f, does parsing Float.toString(f) as a double and
  * narrowing reproduce f bit-exactly? Float.toString emits the shortest
  * uniquely-identifying decimal (≤ 9 significant digits), so a "yes" proves
  * the via-double fast path exact for every token our own writer produces.
  * Runs all 2^31 positive finite floats on all cores (negatives are
  * sign-symmetric for both parse paths).
  */
object FloatViaDouble {
  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    val bad = new java.util.concurrent.atomic.LongAdder
    val firstBad = new java.util.concurrent.atomic.AtomicLong(-1L)
    val threads = Runtime.getRuntime.availableProcessors()
    val chunk = (0x7f800000L / threads + 1).toInt // positive finite bits [0, 0x7f800000)
    val pool = (0 until threads).map { t =>
      val th = new Thread(() => {
        var bits = t.toLong * chunk
        val end = math.min(0x7f800000L, bits + chunk)
        while (bits < end) {
          val f = java.lang.Float.intBitsToFloat(bits.toInt)
          val s = java.lang.Float.toString(f)
          val viaDouble = java.lang.Double.parseDouble(s).toFloat
          if (java.lang.Float.floatToRawIntBits(viaDouble) != bits.toInt) {
            bad.increment()
            firstBad.compareAndSet(-1L, bits)
          }
          bits += 1L
        }
      })
      th.start(); th
    }
    pool.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[float-via-double] checked=${0x7f800000L} bad=${bad.sum()} first=${firstBad.get()} in $secs%.0f s")
  }
}
