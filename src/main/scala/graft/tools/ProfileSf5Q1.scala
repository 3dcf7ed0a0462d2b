package graft.tools

import graft.{GraftExtensions, Queries, RoundTrip, SparkEntry}
import org.apache.spark.sql.SparkSession

/** sf5 q1-twin profiler (r10 verdict #2: the container twins breach the 2×
  * gate only at 50× facts — "profile the vectorized reader at sf5 before
  * touching anything"). Decomposes the 4mc q1 wall time into:
  *
  *   1. pure block decompress (single-thread, one file),
  *   2. decompress + line split + per-line copy (the FourMcLineIterator),
  *   3. the full DataFrame q1 on 4mc vs parquet (warm, min-of-3).
  *
  * Run: SPARK_GRAFT_SF_DIR=<base sf> sbt "runMain graft.tools.ProfileSf5Q1 <factor>"
  */
object ProfileSf5Q1 {
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
    println(s"[profile] scaled dir: $dir")
    val (rtDir, _) = RoundTrip.ensureRoundTrip(spark, dir, "lineitem", "lz4-fast")
    println(s"[profile] 4mc dir: $rtDir")

    // ---- single-thread reader micro-decomposition on the largest file ----
    val f = new java.io.File(rtDir).listFiles()
      .filter(f => f.getName.endsWith(".4mc")).maxBy(_.length)
    println(f"[profile] file: ${f.getName} ${f.length / 1e6}%.1f MB compressed")
    def withIn[A](body: graft.format.McInput => A): A = {
      val in = graft.format.McInput.local(f.toPath)
      try body(in) finally in.close()
    }
    def t3[A](label: String)(body: => A): Unit = {
      body // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label%-28s ${ts.min}%.3f s (min of 3)")
    }
    withIn { in =>
      val index = graft.format.FourMcReader.readIndex(in)
      var rawBytes = 0L
      t3("decompress only") {
        rawBytes = 0L
        var off = index.blockOffsets(0)
        var ord = 0
        while (ord < index.numBlocks && off < index.eosPos) {
          val (data, nxt) = graft.format.FourMcReader.readBlock(in, index.zstd, off)
          if (data == null) { ord = index.numBlocks }
          else { rawBytes += data.length; off = nxt; ord += 1 }
        }
      }
      println(f"[profile]   raw bytes: ${rawBytes / 1e6}%.1f MB, blocks: ${index.numBlocks}")
      var nLines = 0L
      t3("decompress + line split") {
        nLines = 0L
        val it = new graft.format.FourMcLineIterator(in, index, 0L, Long.MaxValue)
        while (it.hasNext) { it.next(); nLines += 1 }
      }
      println(s"[profile]   lines: $nLines")
    }

    // ---- DataFrame-level q1 twins ----------------------------------------
    def dfT3(label: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      fn(spark, dir).count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label%-28s ${ts.min}%.3f s (min of 3)")
    }
    dfT3("q1 parquet", SparkEntry.queries("q1_pricing_summary"))
    dfT3("q1 4mc", SparkEntry.queries("fourmc_lineitem_q1"))
    dfT3("q1 parquet(2)", SparkEntry.queries("q1_pricing_summary"))
    dfT3("q1 4mc(2)", SparkEntry.queries("fourmc_lineitem_q1"))
    // column-count isolation: a 1-column sum (double parse only) vs q1's 7
    import org.apache.spark.sql.functions._
    def slimT3(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label%-28s ${ts.min}%.3f s (min of 3)")
    }
    slimT3("4mc sum(l_quantity)") {
      RoundTrip.roundTrip(spark, dir, "lineitem", "lz4-fast").agg(sum(col("l_quantity")))
    }
    slimT3("parquet sum(l_quantity)") {
      Queries.table(spark, dir, "lineitem").agg(sum(col("l_quantity")))
    }
    spark.stop()
  }
}
