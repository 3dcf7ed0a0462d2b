package graft.tools

import graft.{GraftExtensions, Queries, RoundTrip, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Second-stage sf5 q1-twin decomposition (r10 verdict #2). The A tool
  * showed the 1-column sum WINNING vs parquet while the 7-column q1 loses
  * ~1.9×, so the residual is either task-count math (compressed-byte split
  * packing under-parallelizes: raw work is ~1.8× the compressed bytes) or
  * per-column parse cost (strings / dates dominate). This isolates both.
  *
  * Run: SPARK_GRAFT_SF_DIR=<base sf> sbt "runMain graft.tools.ProfileSf5Q1B <factor>"
  */
object ProfileSf5Q1B {
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
    def t3(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[p2] $label%-36s ${ts.min}%.3f s (min of 3)")
    }
    val mc = () => RoundTrip.roundTrip(spark, dir, "lineitem", "lz4-fast")
    val pq = () => Queries.table(spark, dir, "lineitem")
    println(s"[p2] 4mc scan partitions:     ${mc().rdd.getNumPartitions}")
    println(s"[p2] parquet scan partitions: ${pq().rdd.getNumPartitions}")
    println(s"[p2] lineitem schema: ${pq().schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(", ")}")

    // ---- split-size sweep on the container q1 -----------------------------
    for (mb <- Seq(128, 64, 32, 16)) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (mb.toLong * 1024 * 1024).toString)
      t3(s"q1 4mc   maxPartitionBytes=${mb}M") { Queries.q1Over(mc()) }
    }
    for (mb <- Seq(128, 64, 32)) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (mb.toLong * 1024 * 1024).toString)
      t3(s"q1 parquet maxPartitionBytes=${mb}M") { Queries.q1Over(pq()) }
    }
    spark.conf.set("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)

    // ---- per-column-class parse cost on the container ---------------------
    t3("4mc sum qty (1 dbl)") { mc().agg(sum(col("l_quantity"))) }
    t3("4mc sum qty+price+disc+tax (4 dbl)") {
      mc().agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        sum(col("l_discount")), sum(col("l_tax")))
    }
    t3("4mc count returnflag (1 str)") { mc().agg(count(col("l_returnflag"))) }
    t3("4mc group rf/ls count (2 str)") {
      mc().groupBy(col("l_returnflag"), col("l_linestatus")).agg(count(lit(1)))
    }
    t3("4mc max shipdate (1 ts)") { mc().agg(max(col("l_shipdate"))) }
    t3("4mc shipdate filter only") {
      mc().filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .agg(count(lit(1)))
    }
    t3("parquet group rf/ls count (2 str)") {
      pq().groupBy(col("l_returnflag"), col("l_linestatus")).agg(count(lit(1)))
    }
    t3("parquet max shipdate (1 ts)") { pq().agg(max(col("l_shipdate"))) }
    // group-by on a small-cardinality LONG: same agg infrastructure, no
    // string keys — separates hash-agg cost from string-column cost
    t3("4mc group linenumber count (1 int)") {
      mc().groupBy(col("l_linenumber")).agg(count(lit(1)))
    }
    t3("parquet group linenumber count (1 int)") {
      pq().groupBy(col("l_linenumber")).agg(count(lit(1)))
    }
    t3("4mc group rf count (1 str)") {
      mc().groupBy(col("l_returnflag")).agg(count(lit(1)))
    }
    t3("parquet group rf count (1 str)") {
      pq().groupBy(col("l_returnflag")).agg(count(lit(1)))
    }
    spark.stop()
  }
}
