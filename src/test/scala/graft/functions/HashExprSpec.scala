package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Md5PrefixLongExpr must be bit-identical to the column formulation it
  * replaces — `conv(substring(md5(x), 1, nHex), 16, 10)` — for every prefix
  * width the ops use (1 = span anchors, 8 = md5Bucket, 15 = MinHash/SimHash
  * base hashes), including empty strings, unicode, and NULLs.
  */
class HashExprSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("hash-expr-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def fused(c: org.apache.spark.sql.Column, nHex: Int) =
    column(Md5PrefixLongExpr(expression(c.cast(BinaryType)), nHex))

  private def legacy(c: org.apache.spark.sql.Column, nHex: Int) =
    conv(substring(md5(c.cast(BinaryType)), 1, nHex), 16, 10).cast(LongType)

  test("fused md5 prefix equals conv(substring(md5)) for nHex 1, 8, 15") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val strs = Seq("", " ", "a", "the quick brown fox", "naïve café 中文",
      "0123456789abcdef" * 8) ++
      (0 until 500).map(_ => rng.alphanumeric.take(rng.nextInt(40)).mkString)
    val df = strs.toDF("s")
    for (n <- Seq(1, 8, 15)) {
      val bad = df
        .select(fused($"s", n).as("f"), legacy($"s", n).as("l"))
        .filter($"f" =!= $"l" || $"f".isNull =!= $"l".isNull)
        .count()
      assert(bad == 0L, s"nHex=$n: fused and legacy md5 prefixes diverge")
    }
  }

  test("NULL input yields NULL, and numeric keys bucket identically") {
    import spark.implicits._
    val df = Seq[java.lang.Long](1L, 42L, null, 999999937L).toDF("k")
    val out = df.select(
      (fused($"k".cast(StringType), 8) % 1000).as("f"),
      (legacy($"k".cast(StringType), 8) % 1000).as("l"))
    val rows = out.collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
    assert(rows.count(_.isNullAt(0)) == 1)
  }

  private def legacyWindows(toks: org.apache.spark.sql.Column, k: Int) =
    when(size(toks) < k, array(xxhash64(concat_ws(" ", toks))))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => xxhash64(concat_ws(" ", slice(toks, i, lit(k))))))

  test("token_window_hash equals the slice/concat_ws/xxhash64 formulation") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val texts = Seq("", "one", "a b", "a b c", "naïve café 中文 words here",
      ("tok " * 50).trim) ++
      (0 until 300).map(_ => (0 until rng.nextInt(30))
        .map(_ => rng.alphanumeric.take(1 + rng.nextInt(8)).mkString).mkString(" "))
    val df = texts.toDF("text")
      .select(graft.ops.TextAnalysis.tokens($"text").as("toks"))
    for (k <- Seq(3, 8)) {
      val bad = df
        .select(graft.ops.TextAnalysis.windowHashes($"toks", k).as("f"),
          legacyWindows($"toks", k).as("l"))
        .filter(to_json($"f") =!= to_json($"l"))
        .count()
      assert(bad == 0L, s"k=$k: fused and legacy window hashes diverge")
    }
  }

  test("token_window_hash: null elements follow concat_ws skip-null semantics") {
    val df = spark.range(1).select(
      array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")).as("toks"))
    val rows = df.select(
      graft.ops.TextAnalysis.windowHashes(col("toks"), 3).as("f"),
      legacyWindows(col("toks"), 3).as("l")).collect()
    assert(rows.head.getSeq[Long](0) == rows.head.getSeq[Long](1))
  }

  test("whole-stage codegen and interpreted paths agree") {
    import spark.implicits._
    val df = (0 until 100).map(i => s"doc-$i").toDF("s")
    val withCodegen = df.select(fused($"s", 15).as("h")).collect().map(_.getLong(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(fused($"s", 15).as("h")).collect().map(_.getLong(0))
      assert(withCodegen.toSeq == interp.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
