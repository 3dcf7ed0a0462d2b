package graft.tools

import graft.{Queries, RoundTrip}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the events-roundtrip hourly query. */
object ProfileEvents {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val runs = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name median=${runs.sorted.apply(1)}%.3f")
    }
    val rt = RoundTrip.roundTrip(spark, sfDir, "events", "zstd-1", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    time("rt_scan_count")(rt.count())
    time("rt_scan_allcols")(rt.agg(count(col("event_id")), count(col("ts")), count(col("user_id")), count(col("value"))).head().getLong(0))
    time("rt_hourly_full")(RoundTrip.eventsHourlyOverFourMz(spark, sfDir).count())
    time("pq_hourly_full")(Queries.qEventsHourly(spark, sfDir).count())
    time("pq_scan_count")(Queries.events(spark, sfDir).count())
    val li = RoundTrip.roundTrip(spark, sfDir, "lineitem", "lz4-fast")
    time("li_rt_q1")(Queries.q1Over(li).count())
    time("li_pq_q1")(Queries.q1PricingSummary(spark, sfDir).count())
    time("li_rt_scan")(li.agg(count(col("l_quantity")), count(col("l_shipdate"))).head().getLong(0))
    spark.stop()
  }
}
