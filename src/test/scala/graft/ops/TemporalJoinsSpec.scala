package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Semantics + plan shape for the temporal joins: as-of picks the latest
  * right row at-or-before each left timestamp per key; the range join finds
  * each in-window pair exactly once; and neither plan contains a nested-loop
  * or cartesian join (the whole point of the compositions).
  */
class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("temporal-joins-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin: latest right at-or-before left, per key, ties include the right row") {
    import spark.implicits._
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:05:00"), 2.0),
      ("A", ts("2024-01-01 10:10:00"), 3.0),
      ("B", ts("2024-01-01 10:07:00"), 9.0)
    ).toDF("sym", "ts", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 10:03:00"), 100L), // after 10:00 quote -> 1.0
      ("A", ts("2024-01-01 10:05:00"), 200L), // exactly at quote -> 2.0 (tie includes right)
      ("A", ts("2024-01-01 10:30:00"), 300L), // after all -> 3.0
      ("B", ts("2024-01-01 10:00:00"), 400L), // before any B quote -> null
      ("C", ts("2024-01-01 12:00:00"), 500L)  // key with no right rows -> null
    ).toDF("sym", "ts", "qty")
    val out = TemporalJoins
      .asofJoin(trades, quotes, Seq("sym"), "ts", "ts", Seq("px"))
      .collect()
      .map(r => (r.getString(0), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .sortBy(_._2)
      .toSeq
    assert(out == Seq(
      ("A", 100L, Some(1.0)),
      ("A", 200L, Some(2.0)),
      ("A", 300L, Some(3.0)),
      ("B", 400L, None),
      ("C", 500L, None)
    ))
  }

  test("asofJoin plan: single shuffle on key, no nested-loop join") {
    import spark.implicits._
    val l = Seq(("A", ts("2024-01-01 10:00:00"), 1L)).toDF("k", "ts", "v")
    val r = Seq(("A", ts("2024-01-01 09:00:00"), 2.0)).toDF("k", "ts", "p")
    val plan = TemporalJoins.asofJoin(l, r, Seq("k"), "ts", "ts", Seq("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ:\n${plan.take(1000)}")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n${plan.take(1000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"asof should be a union+window, not a join:\n${plan.take(1000)}")
  }

  test("rangeJoin: pairs within the bound found exactly once, bounds exclusive/inclusive") {
    import spark.implicits._
    val views = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "ts")
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00")), // dt=0: excluded (strictly after)
      (1L, ts("2024-01-01 10:04:59")), // within 5 min of 10:00
      (1L, ts("2024-01-01 10:05:00")), // exactly 5 min: included (inclusive upper)
      (1L, ts("2024-01-01 10:05:01")), // outside
      (1L, ts("2024-01-01 11:04:00")), // within 5 min of 11:00
      (3L, ts("2024-01-01 10:01:00"))  // other user
    ).toDF("user_id", "ts")
    val pairs = TemporalJoins
      .rangeJoin(views, clicks, Seq("user_id"), "ts", "ts", 5L * 60 * 1000000)
      .select(col("l_user_id"), col("l_ts"), col("r_ts"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString))
      .sortBy(t => (t._1, t._2, t._3))
      .toSeq
    assert(pairs == Seq(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:04:59.0"),
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0"),
      (1L, "2024-01-01 11:00:00.0", "2024-01-01 11:04:00.0")
    ))
  }

  test("rangeJoin plan: equality hash join on (key, bin), no nested loop") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val r = Seq((1L, ts("2024-01-01 10:01:00"))).toDF("user_id", "ts")
    val plan = TemporalJoins.rangeJoin(l, r, Seq("user_id"), "ts", "ts", 300000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ:\n${plan.take(1000)}")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n${plan.take(1000)}")
  }

  test("driver queries return plausible aggregates on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val asof = TemporalJoins.asofPurchaseAttribution(spark, sf).collect()
    assert(asof.nonEmpty)
    asof.foreach { r =>
      val clicks = r.getAs[Long]("n_clicks")
      val attributed = r.getAs[Long]("n_attributed")
      assert(attributed >= 0 && attributed <= clicks)
    }
    val pairs = TemporalJoins.rangeViewClick(spark, sf).collect()
    pairs.foreach(r => assert(r.getAs[Long]("n_pairs") > 0))
  }
}
