package graft.functions

import graft.functions.FrequencySketch.topk_freq
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries heavy hitters: exact when capacity covers the cardinality,
  * guaranteed-present + bounded-undercount when it doesn't, and partition-
  * count independent in the exact regime (the merge is the mergeable-
  * summaries combine, not an ad-hoc union).
  */
class FrequencySketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("freq-sketch-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def topkRows(df: org.apache.spark.sql.DataFrame, col: String, k: Int, cap: Int) =
    df.agg(topk_freq(org.apache.spark.sql.functions.col(col), k, cap).as("tk"))
      .select(explode(org.apache.spark.sql.functions.col("tk")).as("e"))
      .select("e.item", "e.cnt")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq

  test("exact regime: counts equal groupBy counts regardless of partitioning") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val items = (0 until 20000).map(_ => s"w${rng.nextInt(40)}")
    val want = items.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(10)
    for (nPart <- Seq(1, 13)) {
      val df = items.toDF("w").repartition(nPart)
      assert(topkRows(df, "w", 10, 64) == want, s"nPart=$nPart")
    }
  }

  test("approximate regime: heavy hitter survives, undercount bounded by N/(capacity+1)") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    // 50k tail items over 5k distinct values + one heavy hitter at 8%
    val tail = (0 until 50000).map(_ => s"t${rng.nextInt(5000)}")
    val heavy = Seq.fill(4300)("HEAVY")
    val all = rng.shuffle(tail ++ heavy)
    val n = all.size
    val cap = 100
    val got = topkRows(all.toDF("w").repartition(7), "w", 5, cap)
    val hh = got.find(_._1 == "HEAVY")
    assert(hh.isDefined, s"heavy hitter missing from $got")
    val bound = n.toLong / (cap + 1)
    assert(hh.get._2 <= 4300L, "MG must never overcount")
    assert(hh.get._2 >= 4300L - bound, s"undercount ${4300L - hh.get._2} exceeds bound $bound")
  }

  test("null values are ignored, k caps the output") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("a"), Some("b"), None, Some("c")).toDF("w")
    val got = topkRows(df, "w", 2, 16)
    assert(got == Seq(("a", 2L), ("b", 1L)))
  }

  test("topk_freq is available in SQL via GraftExtensions") {
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val rows = s2.sql(
        """SELECT e.item, e.cnt FROM (
          |  SELECT explode(topk_freq(w, 2, 16)) AS e FROM VALUES ('x'),('x'),('y'),('x') AS t(w)
          |) ORDER BY e.cnt DESC""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq(("x", 3L), ("y", 1L)))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
