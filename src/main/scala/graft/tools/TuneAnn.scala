package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline tuning probe for the approximate ANN queries: find (bits, tables)
  * and nprobe values whose top-k output EXACTLY matches brute force on the
  * testdata corpus (deterministic hyperplanes/centroids ⇒ reproducible), so
  * the driver can oracle-check them against the brute-force SQL.
  */
object TuneAnn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def proj(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
      df.select(col("qid"), col("rn"), round(col("sim"), 5).as("simr"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.001", "sf0.01", "sf0.1")
    for (sf <- sfs) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet").cache()
      val q = emb.filter(col("vec_id") < 10)
      val exact = proj(Similarity.bruteForceTopK(emb, q, 5))
      for (bits <- Seq(1, 2); tables <- Seq(16, 24, 32, 48)) {
        val t0 = System.nanoTime()
        val got = proj(Similarity.annTopK(emb, q, 5, dim = 64, bits = bits, tables = tables))
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"RESULT lsh $sf b=$bits T=$tables equal=${got == exact} time=$secs%.2f")
      }
      for (nprobe <- Seq(8, 10, 12, 14, 16)) {
        val t0 = System.nanoTime()
        val got = proj(Similarity.ivfTopK(emb, q, 5, nCells = 16, nprobe = nprobe))
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"RESULT ivf $sf nprobe=$nprobe equal=${got == exact} time=$secs%.2f")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
