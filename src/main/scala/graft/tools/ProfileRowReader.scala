package graft.tools

import graft.{Bench, GraftExtensions, Queries, RoundTrip}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated row-reader check after the zero-copy slice refactor: the
  * Iterator[(Long, bytes)] mode must not have regressed.
  *
  * Run: SPARK_GRAFT_SF_DIR=<base sf> sbt "runMain graft.tools.ProfileRowReader <factor>"
  */
object ProfileRowReader {
  def main(args: Array[String]): Unit = {
    val baseSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(50)
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
    println(f"[pr] canary ${Bench.spinCanaryMs()}%.0f ms")
    def t3(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[pr] $label%-30s ${ts.min}%.3f s (min of 3)")
    }
    val mc = () => RoundTrip.roundTrip(spark, dir, "lineitem", "lz4-fast")
    spark.conf.set("spark.graft.fourmc.vectorized", "false")
    t3("ROW group rf") { mc().groupBy(col("l_returnflag")).agg(count(lit(1))) }
    t3("ROW q1") { Queries.q1Over(mc()) }
    spark.conf.set("spark.graft.fourmc.vectorized", "true")
    t3("VEC group rf") { mc().groupBy(col("l_returnflag")).agg(count(lit(1))) }
    t3("VEC q1") { Queries.q1Over(mc()) }
    println(f"[pr] canary ${Bench.spinCanaryMs()}%.0f ms")
    spark.stop()
  }
}
