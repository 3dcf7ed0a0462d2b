package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal joins Spark lacks as built-ins, expressed as shuffle-friendly
  * compositions (extension scope — the reference has no temporal operators).
  *
  * - [[asofJoin]]: for each left row, the latest right row with
  *   `rightTs <= leftTs` per key — the union + IGNORE NULLS running-last
  *   window formulation. ONE shuffle/sort on (key, ts); never a per-key cross
  *   product, so it survives hot keys with millions of rows.
  * - [[rangeJoin]]: pairs within `(0, maxDelayMicros]` — time-bin bucketing
  *   turns the inequality into an equality join on (key, bin): each left row
  *   probes its own bin and the next, so a pair is found exactly once (the
  *   right row's bin), and Catalyst plans a hash join, not a BNLJ.
  */
object TemporalJoins {

  /** As-of join: left rows gain `payloadCols` from the latest right row at or
    * before the left timestamp (per `keyCols`). Right rows win ties on equal
    * timestamps. Output = left columns + payload columns (null when no right
    * row precedes).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag streams: the right side carries the payload struct, the left side
    // carries its whole row as a struct (avoids key/timestamp name clashes in
    // the union)
    val payload = struct(payloadCols.map(right(_)): _*)
    val lrow = struct(leftCols.map(left(_)): _*)
    val payloadType = right.select(payload.as("p")).schema("p").dataType
    val lrowType = left.select(lrow.as("l")).schema("l").dataType
    val r = right.select(
      keyCols.map(right(_)) ++ Seq(
        right(rightTs).as("__ts"),
        payload.as("__payload"),
        lit(1).as("__is_right"),
        lit(null).cast(lrowType).as("__lrow")
      ): _*
    )
    val l = left.select(
      keyCols.map(left(_)) ++ Seq(
        left(leftTs).as("__ts"),
        lit(null).cast(payloadType).as("__payload"),
        lit(0).as("__is_right"),
        lrow.as("__lrow")
      ): _*
    )
    // one sort covers both the window and tie-break: at equal __ts the right
    // row sorts first (__is_right desc), so an exactly-simultaneous right row
    // IS visible to the left row — standard as-of backward semantics
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select(leftCols.map(c => col(s"__lrow.$c").as(c)) ++
        payloadCols.map(p => col(s"__asof.$p").as(p)): _*)
  }

  /** Bounded range join: (left, right) pairs with the same key and
    * `0 < rightTs - leftTs <= maxDelayMicros` (timestamps compared in
    * microseconds). Left rows probe their own time bin and the next one —
    * correct because the delay bound never spans more than two bins of width
    * `maxDelayMicros`. Returns left.* (aliased `l_`…) + right.* (`r_`…).
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      maxDelayMicros: Long
  ): DataFrame = {
    require(maxDelayMicros > 0, "maxDelayMicros must be positive")
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
    val lKeys = keyCols.map(k => col(s"l_$k"))
    val rKeys = keyCols.map(k => col(s"r_$k"))
    val lMicros = unix_micros(col(s"l_$leftTs"))
    val rMicros = unix_micros(col(s"r_$rightTs"))
    // left probes bin and bin+1; a matching right row is found exactly once,
    // in its OWN bin
    val lBinned = l
      .withColumn("__bin0", floor(lMicros / maxDelayMicros))
      .withColumn("__bin", explode(array(col("__bin0"), col("__bin0") + 1)))
      .drop("__bin0")
    val rBinned = r.withColumn("__bin", floor(rMicros / maxDelayMicros))
    val joinCond = lKeys
      .zip(rKeys)
      .map { case (a, b) => a === b }
      .reduce(_ && _) && lBinned("__bin") === rBinned("__bin") &&
      rMicros > lMicros && rMicros <= lMicros + maxDelayMicros
    lBinned.join(rBinned, joinCond).drop(lBinned("__bin")).drop(rBinned("__bin"))
  }

  // ------------------------------------------------------- driver queries

  /** Purchase attribution: for each click, the user's most recent purchase at
    * or before the click (as-of), aggregated per user. The canonical
    * training-data feature-join shape at 100 TB: one shuffle on (user, ts).
    */
  def asofPurchaseAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val events = graft.Queries.events(spark, sfDir)
    val clicks = events.filter($"event_type" === "click").select($"user_id", $"ts")
    // null-valued purchases are excluded on BOTH sides: the oracle's
    // last_value(... IGNORE NULLS) would otherwise skip past a null-valued
    // purchase that Spark's as-of (which tracks the row, not the value)
    // would pick
    val purchases = events
      .filter($"event_type" === "purchase" && $"value".isNotNull)
      .select($"user_id", $"ts", $"value")
    asofJoin(clicks, purchases, Seq("user_id"), "ts", "ts", Seq("value"))
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_clicks"),
        sum(when($"value".isNotNull, 1L).otherwise(0L)).as("n_attributed"),
        sum(when($"value".isNotNull, $"value".cast(DecimalType(18, 4))))
          .cast(DoubleType).as("attributed_value")
      )
      .orderBy($"user_id")
  }

  val asofPurchaseAttributionSql: String =
    """WITH tagged AS (
      |  SELECT user_id, ts, value AS p_value, 1 AS is_p FROM events
      |  WHERE event_type = 'purchase' AND value IS NOT NULL
      |  UNION ALL
      |  SELECT user_id, ts, NULL, 0 FROM events WHERE event_type = 'click'
      |), attributed AS (
      |  SELECT user_id, is_p,
      |    last_value(p_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, is_p DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS av
      |  FROM tagged)
      |SELECT user_id, COUNT(*) AS n_clicks,
      |  CAST(SUM(CASE WHEN av IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
      |  CAST(SUM(CASE WHEN av IS NOT NULL THEN CAST(av AS DECIMAL(18,4)) END) AS DOUBLE) AS attributed_value
      |FROM attributed WHERE is_p = 0
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** View→click conversions within 5 minutes per user — the bounded range
    * join. Bin-bucketed equality join; the DuckDB oracle states the same
    * inequality directly.
    */
  def rangeViewClick(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val events = graft.Queries.events(spark, sfDir)
    val views = events.filter($"event_type" === "view").select($"user_id", $"ts")
    val clicks = events.filter($"event_type" === "click").select($"user_id", $"ts")
    rangeJoin(views, clicks, Seq("user_id"), "ts", "ts", 5L * 60 * 1000000)
      .groupBy($"l_user_id".as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"user_id")
  }

  val rangeViewClickSql: String =
    """SELECT v.user_id AS user_id, COUNT(*) AS n_pairs
      |FROM events v JOIN events c
      |  ON v.user_id = c.user_id AND v.event_type = 'view' AND c.event_type = 'click'
      |  AND epoch_us(c.ts) > epoch_us(v.ts) AND epoch_us(c.ts) <= epoch_us(v.ts) + 300000000
      |GROUP BY 1 ORDER BY user_id""".stripMargin
}
