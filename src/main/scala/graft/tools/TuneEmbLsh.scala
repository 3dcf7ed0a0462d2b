package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline tuning probe for [[Similarity.embeddingDupPairsViaLsh]]: for each
  * (bits, tables) candidate, count missed pairs vs the exact all-pairs
  * formulation plus the raw candidate volume, at each testdata SF. Run
  * manually; not part of the driver surface.
  *
  * Usage: TuneEmbLsh [threshold] [sf ...]   (default threshold 0.4)
  */
object TuneEmbLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val threshold = args.headOption.map(_.toDouble).getOrElse(0.4)
    val sfs = if (args.length > 1) args.drop(1).toSeq else Seq("sf0.001", "sf0.01", "sf0.1")
    val grid: Seq[(Int, Int)] =
      if (threshold >= 0.8) for (b <- Seq(6, 8, 10); t <- Seq(4, 6, 8, 10, 12)) yield (b, t)
      else for (b <- Seq(2, 3, 4); t <- Seq(8, 12, 16, 20, 24, 32)) yield (b, t)
    for (sf <- sfs) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet").cache()
      val n = emb.count()
      val exact = Similarity.embeddingDupPairs(emb, threshold).select("d1", "d2").cache()
      val nExact = exact.count()
      for ((bits, tables) <- grid) {
        val t0 = System.nanoTime()
        val cands = Similarity.embeddingLshCandidates(emb, 64, bits, tables).cache()
        val nCand = cands.count()
        val missed = exact.except(cands).count()
        val secs = (System.nanoTime() - t0) / 1e9
        cands.unpersist()
        println(f"RESULT $sf n=$n tau=$threshold b=$bits T=$tables cands=$nCand (n2/2=${n * (n - 1) / 2}) true=$nExact missed=$missed time=$secs%.2f")
      }
      exact.unpersist()
      emb.unpersist()
    }
    spark.stop()
  }
}
