package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot stress drive: splittable scan of a single large 4mc file —
  * partition fan-out, parallel decompress, agg. Usage: runMain
  * graft.StressCheck /path/file.4mc
  */
object StressCheck {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/big.4mc")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val df = spark.read.format("4mc").load(path)
    val parts = df.rdd.getNumPartitions
    val n = df.count()
    val t1 = System.nanoTime()
    val agg = df.select(length(col("value")).as("l")).agg(sum("l"), max("l")).head()
    val t2 = System.nanoTime()
    println(f"partitions=$parts rows=$n count=${(t1 - t0) / 1e9}%.2fs agg=${(t2 - t1) / 1e9}%.2fs chars=${agg.getLong(0)}")
    spark.stop()
  }
}
