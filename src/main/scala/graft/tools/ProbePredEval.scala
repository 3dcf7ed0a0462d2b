package graft.tools

import graft.{GraftExtensions, Queries, RoundTrip}
import graft.sources.FourMcScanMetrics
import org.apache.spark.sql.SparkSession

/** Counter probe for the columnar scan's adaptive predicate elision
  * (r17 follow-up to the JfrProfile mc-col-q1 run): how many batches
  * actually evaluate pushed filters vs skip, and how many blocks the zone
  * maps prove certain, for the q1-shaped dict-columnar twin.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *      sbt "runMain graft.tools.ProbePredEval <factor> <reps>"
  */
object ProbePredEval {
  def main(args: Array[String]): Unit = {
    val baseSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(50)
    val reps = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
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
    def q1() = Queries.q1Over(RoundTrip.roundTripColumnar(spark, dir, "lineitem", "lz4-fast"))
    q1().count() // warm + build the roundtrip
    def snap() = (FourMcScanMetrics.predEvalBatches.sum(),
      FourMcScanMetrics.predSkipBatches.sum(),
      FourMcScanMetrics.predElidedBlocks.sum(),
      FourMcScanMetrics.blocksRead.sum(),
      FourMcScanMetrics.blocksSkipped.sum())
    val b0 = snap()
    var i = 0
    val t0 = System.nanoTime()
    while (i < reps) { q1().count(); i += 1 }
    val secs = (System.nanoTime() - t0) / 1e9
    val b1 = snap()
    println(f"[pred] reps=$reps wall=$secs%.2f s")
    println(s"[pred] evalBatches=${b1._1 - b0._1} skipBatches=${b1._2 - b0._2} " +
      s"elidedBlocks=${b1._3 - b0._3} blocksRead=${b1._4 - b0._4} blocksSkipped=${b1._5 - b0._5}")
    spark.stop()
  }
}
