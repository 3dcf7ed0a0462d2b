package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: sf5 q1 twin wall vs `spark.sql.files.maxPartitionBytes` — is the
  * fourmz twin underparallelized at 50× (1.1 GB compressed / 128 MB splits =
  * 9 tasks on 32 cores)? Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProbeSplitSize"`
  */
object ProbeSplitSize {
  def main(args: Array[String]): Unit = {
    val baseSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = RelationalScale.ensureScaled(spark, baseSf, 50)
    def t3(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-44s ${ts.min}%.3f s")
    }
    for (mpb <- Seq(128L << 20, 32L << 20, 16L << 20)) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb.toString)
      val pz = graft.SparkEntry.queries("fourmz_lineitem_q1")(spark, dir).rdd.getNumPartitions
      val pc = graft.SparkEntry.queries("fourmc_lineitem_q1")(spark, dir).rdd.getNumPartitions
      val pp = graft.SparkEntry.queries("q1_pricing_summary")(spark, dir).rdd.getNumPartitions
      t3(s"fourmz q1 mpb=${mpb >> 20}MiB parts=$pz")(
        graft.SparkEntry.queries("fourmz_lineitem_q1")(spark, dir))
      t3(s"fourmc q1 mpb=${mpb >> 20}MiB parts=$pc")(
        graft.SparkEntry.queries("fourmc_lineitem_q1")(spark, dir))
      t3(s"parquet q1 mpb=${mpb >> 20}MiB parts=$pp")(
        graft.SparkEntry.queries("q1_pricing_summary")(spark, dir))
    }
    spark.stop()
  }
}
