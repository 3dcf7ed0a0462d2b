package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Array-payload scan throughput probe (round 12): a 1M-row synthetic
  * signature/embedding table (16-long sig + 64-float emb per row) written as
  * 4mc csv and as parquet; times element-mass aggregates over (a) the
  * vectorized 4mc scan, (b) the row-mode 4mc scan
  * (`spark.graft.fourmc.vectorized=false`), (c) the parquet twin. Warmup +
  * min-of-3 per mode, interleaved.
  */
object ProfileArrays {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("profile-arrays")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val base = new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft-profile-arrays-$n")
    val mcDir = new java.io.File(base, "mc").getAbsolutePath
    val pqDir = new java.io.File(base, "pq").getAbsolutePath

    val src = spark.range(0, n, 1, 16).select(
      col("id"),
      expr("transform(sequence(1L, 16L), x -> (id * 2654435761L + x * 40503L) % 1000000007L)").as("sig"),
      expr("transform(sequence(1L, 64L), x -> CAST(sin(id * 0.001 + x) AS FLOAT))").as("emb"))
    if (!new java.io.File(mcDir, "_SUCCESS").exists()) {
      src.write.mode("overwrite").format("4mc").option("payload", "csv").save(mcDir)
      src.write.mode("overwrite").parquet(pqDir)
    }
    val schema = src.schema

    def mc() = spark.read.format("4mc").option("payload", "csv").schema(schema).load(mcDir)
    def pq() = spark.read.parquet(pqDir)

    def agg(df: org.apache.spark.sql.DataFrame): Unit = {
      df.agg(
        sum(expr("aggregate(sig, 0L, (a, x) -> a + x)")),
        sum(expr("aggregate(emb, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))")))
        .collect()
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(mode: String): Double = mode match {
      case "mc-vec" => time(agg(mc()))
      case "mc-row" =>
        spark.conf.set("spark.graft.fourmc.vectorized", "false")
        try time(agg(mc())) finally spark.conf.unset("spark.graft.fourmc.vectorized")
      case _ => time(agg(pq()))
    }
    val modes = Seq("mc-vec", "mc-row", "parquet")
    modes.foreach(run) // warmup
    val samples = (1 to 3).flatMap(_ => modes.map(m => m -> run(m)))
    val best = samples.groupBy(_._1).map { case (m, xs) => m -> xs.map(_._2).min }
    def dirBytes(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
      else f.length()
    val mcBytes = dirBytes(new java.io.File(mcDir))
    val pqBytes = dirBytes(new java.io.File(pqDir))
    println(f"[arrays] rows=$n mcBytes=$mcBytes pqBytes=$pqBytes")
    modes.foreach(m => println(f"[arrays] $m%-8s ${best(m)}%.3f s"))
    println(f"[arrays] vec-vs-row speedup ${best("mc-row") / best("mc-vec")}%.2fx; " +
      f"mc-vec vs parquet ${best("mc-vec") / best("parquet")}%.2fx")
    spark.stop()
  }
}
