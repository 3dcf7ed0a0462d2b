package graft.tools

import graft.{GraftExtensions, Queries, RoundTrip}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** JFR-based hot-frame attribution for the sf5 twin gap (round 12 set-up
  * for the round-13 string-group brief): runs one query shape repeatedly
  * under a Java Flight Recorder ExecutionSample recording and prints the
  * top frames, so "where do the CPUs go" is answered by samples instead of
  * A/B inference. JDK17's jdk.jfr API — no external profiler needed.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *      sbt "runMain graft.tools.JfrProfile <factor> <shape> <reps>"
  * shapes: mc-str | pq-str | mc-int | pq-int | mc-q1 | pq-q1
  */
object JfrProfile {
  def main(args: Array[String]): Unit = {
    val baseSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(50)
    val shape = args.lift(1).getOrElse("mc-str")
    val reps = args.lift(2).flatMap(_.toIntOption).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = RelationalScale.ensureScaled(spark, baseSf, factor)
    val mc = () => RoundTrip.roundTrip(spark, dir, "lineitem", "lz4-fast")
    val pq = () => Queries.table(spark, dir, "lineitem")
    def df() = shape match {
      case "mc-str" => mc().groupBy(col("l_returnflag")).agg(count(lit(1)))
      case "pq-str" => pq().groupBy(col("l_returnflag")).agg(count(lit(1)))
      case "mc-int" => mc().groupBy(col("l_linenumber")).agg(count(lit(1)))
      case "pq-int" => pq().groupBy(col("l_linenumber")).agg(count(lit(1)))
      case "mc-q1"  => Queries.q1Over(mc())
      case "mz-q1"  => Queries.q1Over(RoundTrip.roundTrip(spark, dir, "lineitem", "zstd-3"))
      case "mc-col-q1" => Queries.q1Over(RoundTrip.roundTripColumnar(spark, dir, "lineitem", "lz4-fast"))
      case "mz-col-q1" => Queries.q1Over(RoundTrip.roundTripColumnar(spark, dir, "lineitem", "zstd-3"))
      case _        => Queries.q1Over(pq())
    }
    df().count() // warm: JIT + caches
    df().count()

    val rec = new jdk.jfr.Recording()
    rec.enable("jdk.ExecutionSample").withPeriod(java.time.Duration.ofMillis(2))
    rec.start()
    (1 to reps).foreach(_ => df().count())
    rec.stop()
    val f = java.nio.file.Files.createTempFile("graft-jfr", ".jfr")
    rec.dump(f)
    rec.close()

    // top frames: leaf-biased attribution (top 3 frames of each sample)
    val counts = new java.util.HashMap[String, Integer]()
    var total = 0L
    val rf = new jdk.jfr.consumer.RecordingFile(f)
    try while (rf.hasMoreEvents) {
      val e = rf.readEvent()
      if (e.getEventType.getName == "jdk.ExecutionSample") {
        val st = e.getStackTrace
        if (st != null) {
          total += 1
          val frames = st.getFrames
          val top = math.min(3, frames.size())
          var i = 0
          while (i < top) {
            val m = frames.get(i).getMethod
            if (m != null) {
              val key = s"${m.getType.getName}.${m.getName}"
              counts.merge(key, 1, (a, b) => a + b)
            }
            i += 1
          }
        }
      }
    } finally rf.close()
    import scala.jdk.CollectionConverters._
    println(s"[jfr] shape=$shape samples=$total")
    counts.asScala.toSeq.sortBy(-_._2.toInt).take(30).foreach { case (k, n) =>
      println(f"[jfr] ${100.0 * n.toInt / math.max(1, total)}%6.2f%% $k")
    }
    spark.stop()
  }
}
