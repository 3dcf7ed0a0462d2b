package graft.ops

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for 4mc/4mz directories — the other standing
  * operational chore of a 100 TB archive (streaming ingest and wide writes
  * leave directories of KB-scale files whose per-file open/footer cost
  * dwarfs the data).
  *
  * Shape: one distributed read of the source (the splittable reader makes
  * input file boundaries irrelevant), `repartition(n)` sized from the
  * actual on-disk bytes to hit `targetFileBytes` per output file, one
  * write. Round-robin repartition (not coalesce) so output files are
  * uniform even when input files are wildly skewed; the shuffle it costs
  * is the price of uniformity and is linear in the data. Compression
  * can be upgraded in flight (e.g. lz4-fast ingest → zstd-6 archive).
  */
object Compact {

  /** Compact a text-payload 4mc dir. Returns (files_in, files_out, rows). */
  def compactText(spark: SparkSession, inDir: String, outDir: String,
                  codec: String, targetFileBytes: Long = 512L * 1024 * 1024): (Int, Int, Long) = {
    val (nIn, bytes) = dirStats(spark, inDir)
    val df = spark.read.format("4mc").load(inDir)
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    df.repartition(nOut).write.mode(SaveMode.Overwrite)
      .format("4mc").option("codec", codec).save(outDir)
    val rows = spark.read.format("4mc").load(outDir).count()
    (nIn, countFiles(spark, outDir), rows)
  }

  /** Compact a binary-payload 4mc dir (length-prefixed records). */
  def compactBinary(spark: SparkSession, inDir: String, outDir: String,
                    codec: String, targetFileBytes: Long = 512L * 1024 * 1024): (Int, Int, Long) = {
    val (nIn, bytes) = dirStats(spark, inDir)
    val df = spark.read.format("4mc").option("payload", "binary").load(inDir)
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    df.repartition(nOut).write.mode(SaveMode.Overwrite)
      .format("4mc").option("payload", "binary").option("codec", codec).save(outDir)
    val rows = spark.read.format("4mc").option("payload", "binary").load(outDir).count()
    (nIn, countFiles(spark, outDir), rows)
  }

  private def dirStats(spark: SparkSession, dir: String): (Int, Long) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    var n = 0
    var bytes = 0L
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if ((name.endsWith(".4mc") || name.endsWith(".4mz")) &&
        !name.startsWith("_") && !name.startsWith(".")) {
        n += 1; bytes += st.getLen
      }
    }
    (n, bytes)
  }

  private def countFiles(spark: SparkSession, dir: String): Int = dirStats(spark, dir)._1
}
