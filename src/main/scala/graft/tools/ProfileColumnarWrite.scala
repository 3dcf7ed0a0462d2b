package graft.tools

import graft.Queries
import org.apache.spark.sql.SparkSession

/** Write-amplification measurement for the columnar block layout (r13
  * verdict #1's "documented write-amplification measurement"): writes the
  * same table in both layouts × both codec families and reports wall time,
  * bytes, and the columnar/row size ratio. Single-threaded writes
  * (coalesce(1)) so the time is a codec+layout cost, not a parallelism
  * artifact.
  *
  * Run: sbt "runMain graft.tools.ProfileColumnarWrite [table] [sfDir] [factor]"
  */
object ProfileColumnarWrite {
  def main(args: Array[String]): Unit = {
    val table = args.headOption.getOrElse("lineitem")
    val baseSf = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val factor = args.lift(2).flatMap(_.toIntOption).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (factor > 1) RelationalScale.ensureScaled(spark, baseSf, factor) else baseSf
    val src = Queries.table(spark, dir, table).coalesce(1).cache()
    val srcRows = src.count() // materialize the cache before timing writes
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(sizeOf).sum).getOrElse(0L)
      else f.length()
    def one(layout: String, codec: String, dict: Boolean): (Double, Long) = {
      val out = java.nio.file.Files.createTempDirectory("colwrite").toFile
      out.delete()
      val t0 = System.nanoTime()
      val w = src.write.format("4mc").option("payload", "csv").option("codec", codec)
        .option("layout", layout)
      (if (layout == "columnar") w.option("dictEncode", dict.toString) else w)
        .save(out.getAbsolutePath)
      val secs = (System.nanoTime() - t0) / 1e9
      val bytes = sizeOf(out)
      org.apache.commons.io.FileUtils.deleteQuietly(out)
      (secs, bytes)
    }
    println(s"[colwrite] table=$table rows=$srcRows dir=$dir")
    for (codec <- Seq("lz4-fast", "zstd-3")) {
      // warm one small write so JIT/codegen cost lands outside the timing
      val (rowS, rowB) = { one("rows", codec, dict = false); one("rows", codec, dict = false) }
      val (ncS, ncB) = { one("columnar", codec, dict = false); one("columnar", codec, dict = false) }
      val (colS, colB) = { one("columnar", codec, dict = true); one("columnar", codec, dict = true) }
      println(f"[colwrite] $codec%-8s rows: $rowS%6.2f s ${rowB / 1e6}%9.1f MB   " +
        f"columnar: $ncS%6.2f s ${ncB / 1e6}%9.1f MB (${ncB.toDouble / rowB}%.3f size, ${ncS / rowS}%.2f time)   " +
        f"columnar+dict: $colS%6.2f s ${colB / 1e6}%9.1f MB (${colB.toDouble / rowB}%.3f size, ${colS / rowS}%.2f time)")
    }
    spark.stop()
  }
}
