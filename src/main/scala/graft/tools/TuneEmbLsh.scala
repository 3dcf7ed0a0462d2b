package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline tuning probe for [[Similarity.embeddingDupPairsViaLsh]]: for each
  * (bits, tables) candidate, count missed pairs vs the exact all-pairs
  * formulation and the candidate volume, at each testdata SF. Run manually;
  * not part of the driver surface.
  */
object TuneEmbLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.001", "sf0.01", "sf0.1")
    for (sf <- sfs) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet").cache()
      val n = emb.count()
      val exact = Similarity.embeddingDupPairs(emb, 0.4).select("d1", "d2").cache()
      val nExact = exact.count()
      for (bits <- Seq(2, 3, 4); tables <- Seq(8, 12, 16, 20, 24, 32)) {
        val t0 = System.nanoTime()
        val got = Similarity
          .embeddingDupPairsViaLsh(emb, 0.4, 64, bits, tables)
          .select("d1", "d2")
          .cache()
        val nGot = got.count()
        val missed = exact.except(got).count()
        val secs = (System.nanoTime() - t0) / 1e9
        got.unpersist()
        println(f"RESULT $sf n=$n b=$bits T=$tables pairs=$nGot/$nExact missed=$missed time=$secs%.2f")
      }
      exact.unpersist()
      emb.unpersist()
    }
    spark.stop()
  }
}
