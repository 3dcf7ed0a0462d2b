package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway timing harness for the IVF path: training vs search split. */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
    }
    // warm
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), 5, 16, 14).count()
    for (r <- 0 until 2) {
      println(s"--- run $r")
      t("init-collect") { emb.orderBy(col("vec_id")).limit(16).select(col("embedding")).collect() }
      t("train(iters=3)") { Similarity.trainCentroids(emb, 16, 3) }
      t("train(iters=1)") { Similarity.trainCentroids(emb, 16, 1) }
      t("full ivfTopK+count") {
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), 5, 16, 14).count()
      }
      t("plain scan count") { emb.count() }
      t("scan+decode arrays") { emb.select(sum(element_at(col("embedding"), 1))).collect() }
    }
    spark.stop()
  }
}
