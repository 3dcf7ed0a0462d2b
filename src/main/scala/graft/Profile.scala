package graft

import graft.ops._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for hotspot queries (round tooling, not API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s   rows=$n")
    }
    val docs = Queries.table(spark, sfDir, "documents")
    t("warmup count")(docs.count())
    val posts = Dedup.shinglePostings(docs, "doc_id", "text")
    t("postings materialize")(posts.localCheckpoint(true).count())
    val postsCk = posts.localCheckpoint(true)
    t("postings again (cached)")(postsCk.count())
    val inter = postsCk.as("a")
      .join(postsCk.as("b"), col("a.w") === col("b.w") && col("a.doc") < col("b.doc"))
    t("raw pair rows")(inter.count())
    val grouped = inter.groupBy(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .agg(count(lit(1)).as("inter"))
    t("grouped pairs")(grouped.count())
    t("full ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.6).count())
    spark.stop()
  }
}
