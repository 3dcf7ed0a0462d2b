package graft.tools

import graft.{Bench, GraftExtensions, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Quick sf5 twin probe: the EXACT Bench sf5 twin protocol (warm both
  * sides, 9 A/B-interleaved samples, median aggregation) over the cached
  * 50x fixture, without the rest of the bench. For iterating on the scan
  * path between full runs.
  *
  * Run: sbt "runMain graft.tools.ProbeSf5Twins [factor] [rounds]"
  */
object ProbeSf5Twins {
  def main(args: Array[String]): Unit = {
    val baseSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(50)
    val rounds = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = RelationalScale.ensureScaled(spark, baseSf, factor)
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val twinPairs = Seq(
      "fourmc_lineitem_q1" -> "q1_pricing_summary",
      "fourmz_lineitem_q1" -> "q1_pricing_summary",
      "fourmc_columnar_q1" -> "q1_pricing_summary",
      "fourmz_columnar_q1" -> "q1_pricing_summary",
      "fourmc_q6_selective" -> "q6_forecast",
      "fourmc_q6_skipped" -> "q6_forecast",
      "fourmc_columnar_q6" -> "q6_forecast",
      "fourmz_columnar_q6" -> "q6_forecast",
      // q1-SHAPED, not q1 (typed date/decimal pricing): the ratio is an
      // informal absolute comparison against parquet q1, as in r13
      "fourmc_date_pricing" -> "q1_pricing_summary",
      "fourmc_columnar_date_pricing" -> "q1_pricing_summary")
    for (r <- 1 to rounds) {
      for ((cn, pn) <- twinPairs) {
        val cf = SparkEntry.queries(cn)
        val pf = SparkEntry.queries(pn)
        timed(cf); timed(pf) // warm both, then alternate
        val samples = (1 to 9).map(_ => (timed(cf), timed(pf)))
        val c = Bench.median(samples.map(_._1))
        val p = Bench.median(samples.map(_._2))
        println(f"[probe r$r] $cn%-22s c=$c%.3f p=$p%.3f ratio=${c / p}%.2f  " +
          f"(c ${samples.map(_._1).min}%.2f-${samples.map(_._1).max}%.2f, " +
          f"p ${samples.map(_._2).min}%.2f-${samples.map(_._2).max}%.2f)")
      }
    }
    spark.stop()
  }
}
