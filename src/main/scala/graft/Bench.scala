package graft

import graft.format._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Per-round benchmark: prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  plus codec-throughput extras matched against BASELINE.md}.
  *
  * Codec numbers are single-threaded over the sf lineitem corpus (the
  * reference's numbers are single-threaded silesia runs, FourMcCodec.java:55-60);
  * query numbers are local[32] wall clock, best of 2 runs (first run pays JVM
  * + codegen warmup and the round-trip cache fill).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- single-threaded codec throughput on the sf corpus ----------------
    val corpus: Array[Byte] = {
      import spark.implicits._
      val li = Queries.table(spark, sfDir, "lineitem")
      val lines = li.select(concat_ws("|", li.columns.map(c => col(c).cast("string")).toIndexedSeq: _*))
        .as[String].collect()
      (lines.mkString("\n") + "\n").getBytes("UTF-8")
    }
    val mb = corpus.length / 1e6
    def timeIt[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def codecBench(codec: McCodec): (Double, Double, Double) = {
      val p = Paths.get(s"/tmp/graft-bench${codec.fileExtension}")
      // warmup once (JIT), then measure
      for (_ <- 0 until 2) {
        val w = new FourMcWriter(Files.newOutputStream(p), codec)
        w.write(corpus, 0, corpus.length); w.close()
      }
      val (_, wSec) = timeIt {
        val w = new FourMcWriter(Files.newOutputStream(p), codec)
        w.write(corpus, 0, corpus.length); w.close()
      }
      val ratio = corpus.length.toDouble / Files.size(p)
      def readAll(): Long = {
        val in = McInput.local(p)
        val idx = FourMcReader.readIndex(in)
        var pos = if (idx.numBlocks > 0) idx.blockOffsets(0) else idx.eosPos
        var total = 0L
        var done = pos >= idx.eosPos
        while (!done) {
          val (d, nxt) = FourMcReader.readBlock(in, idx.zstd, pos)
          if (d == null) done = true
          else { total += d.length; pos = nxt; if (pos >= idx.eosPos) done = true }
        }
        in.close(); total
      }
      readAll() // warmup
      val (_, rSec) = timeIt(readAll())
      Files.deleteIfExists(p)
      (mb / wSec, mb / rSec, ratio)
    }
    val (lz4W, lz4R, lz4Ratio) = codecBench(McCodec.Lz4Fast)
    val (zstdW, zstdR, zstdRatio) = codecBench(McCodec.Zstd3)

    // ---- split parallelism on a single multi-block 4mc file ---------------
    val splitDir = "/tmp/graft-bench-split"
    spark.createDataset(new String(corpus, "UTF-8").linesIterator.toSeq)(
      org.apache.spark.sql.Encoders.STRING
    ).toDF("value").coalesce(1).write.mode("overwrite").format("4mc").save(splitDir)
    spark.conf.set("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
    val nParts = spark.read.format("4mc").load(splitDir).rdd.getNumPartitions
    spark.conf.set("spark.sql.files.maxPartitionBytes", (128 * 1024 * 1024).toString)

    // ---- query wall clock: median of 3 after a warmup run -----------------
    // (run 1 pays JVM/codegen warmup and fills round-trip caches; medians
    // absorb the ±10% scheduler noise local[32] shows at this scale)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def run(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); return -1.0 }
        (System.nanoTime() - t0) / 1e9
      }
      val warm = run()
      val samples = Seq(run(), run(), run())
      name -> (if (warm < 0 || samples.exists(_ < 0)) -1.0 else samples.sorted.apply(1))
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum

    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","corpus_mb":$mb%.1f,"lz4_write_mbps":$lz4W%.0f,"lz4_read_mbps":$lz4R%.0f,"lz4_ratio":$lz4Ratio%.3f,"zstd_write_mbps":$zstdW%.0f,"zstd_read_mbps":$zstdR%.0f,"zstd_ratio":$zstdRatio%.3f,"split_partitions_4mib":$nParts}"""
    )
    spark.stop()
  }
}
