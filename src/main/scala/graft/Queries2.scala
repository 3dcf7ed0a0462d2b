package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second tranche of relational coverage: the TPC-H-shaped queries whose
  * operator forms round 3 still lacked — conditional-share ratios (Q8),
  * compound profit expressions (Q9), CASE-bucketed counts (Q12), outer-join
  * count distributions (Q13), max-scalar subqueries (Q15), NOT IN + distinct
  * counts (Q16), HAVING-IN subqueries (Q18), disjunctive predicate pushdown
  * (Q19), correlated-count thresholds (Q22), plus CUBE, pivot, JSON
  * extraction, and INTERSECT.
  *
  * The testdata schema is reduced TPC-H (no partsupp, no
  * l_shipmode/commitdate/receiptdate, no c_phone/p_container), so each query
  * keeps the reference query's operator SHAPE over the columns that exist;
  * the adaptation is noted per query.
  *
  * Float determinism follows Queries.scala: aggregate DECIMAL(18,2)-cast
  * inputs (exact, associative — products stay within precision 38), cast each
  * finished SUM to DOUBLE, and only then combine sums with double arithmetic
  * (ratios, differences), which is order-independent given identical inputs.
  */
object Queries2 {

  private def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Queries.table(spark, sfDir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dbl(c: Column): Column = c.cast(DoubleType)

  /** Q8 market share: fraction of ASIA customers' PROMO-part revenue supplied
    * by NATION_3, per order year. Dims broadcast; the lineitem⋈orders chain
    * shuffles once on orderkey. (No p_container ⇒ p_type filter stands in.)
    */
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val region = table(spark, sfDir, "region").filter($"r_name" === "ASIA")
    val custNation = table(spark, sfDir, "nation")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as("cnk"))
    val suppNation = table(spark, sfDir, "nation")
      .select($"n_nationkey".as("snk"), $"n_name".as("supp_nation"))
    val part = table(spark, sfDir, "part").filter($"p_type" === "PROMO")
    val ord = table(spark, sfDir, "orders")
      .filter(
        $"o_orderdate" >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
          $"o_orderdate" < lit("1998-01-01 00:00:00").cast(TimestampType)
      )
    val rev = dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))
    table(spark, sfDir, "lineitem")
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(table(spark, sfDir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(custNation), $"c_nationkey" === $"cnk")
      .join(broadcast(table(spark, sfDir, "supplier")), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(suppNation), $"s_nationkey" === $"snk")
      .groupBy(year($"o_orderdate").cast(LongType).as("o_year"))
      .agg(
        (dbl(sum(when($"supp_nation" === "NATION_3", rev).otherwise(lit(0).cast(DecimalType(18, 2))))) /
          dbl(sum(rev))).as("mkt_share"),
        count(lit(1)).as("n_items")
      )
      .orderBy($"o_year")
  }

  val q8Sql: String =
    """SELECT EXTRACT(year FROM o_orderdate) AS o_year,
      |  CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |JOIN region ON n2.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1 ORDER BY o_year""".stripMargin

  /** Q9 product profit: for 'red'-named parts, profit = revenue − qty·retail/2
    * (no partsupp ⇒ half retail price stands in for supplycost), by supplier
    * nation and year. The two SUMs stay exact decimal; they combine in double
    * space only after the cast.
    */
  def q9ProfitNation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val part = table(spark, sfDir, "part").filter($"p_name".contains("red"))
    val suppNation = table(spark, sfDir, "nation")
      .select($"n_nationkey".as("snk"), $"n_name".as("nation"))
    table(spark, sfDir, "lineitem")
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .join(table(spark, sfDir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(table(spark, sfDir, "supplier")), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(suppNation), $"s_nationkey" === $"snk")
      .groupBy($"nation", year($"o_orderdate").cast(LongType).as("o_year"))
      .agg(
        (dbl(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))) -
          dbl(sum(dec($"l_quantity") * dec($"p_retailprice"))) / 2.0).as("profit"),
        count(lit(1)).as("n_items")
      )
      .orderBy($"nation", $"o_year".desc)
  }

  val q9Sql: String =
    """SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / 2.0 AS profit,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** Q12 shipping classes: returned lineitems bucketed by line status, with
    * urgent-vs-other order counts via CASE aggregation. (No l_shipmode ⇒
    * l_returnflag='R' stands in for the shipmode IN filter.)
    */
  def q12PriorityClass(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    table(spark, sfDir, "lineitem")
      .filter($"l_returnflag" === "R")
      .join(table(spark, sfDir, "orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_linestatus")
      .agg(
        sum(when($"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when($"o_orderpriority" =!= "1-URGENT" && $"o_orderpriority" =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count")
      )
      .orderBy($"l_linestatus")
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_returnflag = 'R'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Q13 customer order distribution: LEFT OUTER join with a predicate on the
    * right side, per-customer counts, then the count-of-counts histogram.
    * Two shuffles (custkey, then c_count) — both shrink monotonically.
    */
  def q13OrderDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ord = table(spark, sfDir, "orders").filter($"o_orderstatus" =!= "P")
    table(spark, sfDir, "customer")
      .join(ord, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'P'
      |  GROUP BY c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q15 top supplier: revenue per supplier for 1996Q1, keep the max-revenue
    * supplier(s) via a broadcast scalar subquery. Double equality is safe:
    * both sides derive from the same exact-decimal sum.
    */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val revenue = table(spark, sfDir, "lineitem")
      .filter(
        $"l_shipdate" >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
          $"l_shipdate" < lit("1996-04-01 00:00:00").cast(TimestampType)
      )
      .groupBy($"l_suppkey")
      .agg(dbl(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))).as("total_revenue"))
    val maxRev = revenue.agg(max($"total_revenue").as("max_revenue"))
    revenue
      .crossJoin(broadcast(maxRev))
      .filter($"total_revenue" === $"max_revenue")
      .join(broadcast(table(spark, sfDir, "supplier")), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  val q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** Q16 supplier variety: distinct suppliers per (brand, type) for selected
    * sizes, excluding negative-balance suppliers via NOT IN ≡ left-anti
    * (suppkey is non-null, so the forms coincide). (No partsupp ⇒ lineitem
    * provides the part–supplier pairs; no comment ⇒ acctbal<0 stands in.)
    */
  def q16SupplierVariety(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sizes = Seq(1, 4, 9, 16, 25, 36, 49)
    val part = table(spark, sfDir, "part")
      .filter($"p_brand" =!= "Brand#1" && $"p_size".isin(sizes: _*))
    val badSupp = table(spark, sfDir, "supplier").filter($"s_acctbal" < 0).select($"s_suppkey")
    table(spark, sfDir, "lineitem")
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .join(broadcast(badSupp), $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type")
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type
      |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin

  /** Q18 large orders: orders whose lineitem quantity sum exceeds 300 (the
    * HAVING-IN subquery), joined back to customer. The per-order aggregate IS
    * the semi-join side — one shuffle on orderkey, no row re-expansion.
    */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val big = table(spark, sfDir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(dbl(sum(dec($"l_quantity"))).as("sum_qty"))
      .filter($"sum_qty" > 300.0)
    big
      .join(table(spark, sfDir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(table(spark, sfDir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(20)
  }

  val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty FROM (
      |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300.0) big
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** Q19 disjunctive predicates: revenue under an OR of brand/size/quantity
    * conjunctions. Catalyst extracts the common join key and pushes the
    * per-branch part filters below the broadcast join.
    */
  def q19Disjunctive(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    table(spark, sfDir, "lineitem")
      .join(broadcast(table(spark, sfDir, "part")), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) && $"l_quantity".between(1, 20)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 25) && $"l_quantity".between(10, 30))
      )
      .agg(
        dbl(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))).as("revenue"),
        count(lit(1)).as("n_items")
      )
  }

  val q19Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)""".stripMargin

  /** Q22 wealthy low-activity customers: acctbal above the positive-balance
    * average (broadcast scalar subquery) and fewer than 5 orders (correlated
    * count ≡ outer-join count), bucketed by the last digit of the customer id.
    * (Every synthetic customer has orders, so Q22's NOT EXISTS arm would be
    * vacuous; the <5-orders threshold keeps the correlated-count shape live.
    * No c_phone ⇒ the name digit stands in for the country code.)
    */
  def q22WealthyInactive(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = table(spark, sfDir, "customer")
    val thr = cust
      .filter($"c_acctbal" > 0)
      .agg((dbl(sum(dec($"c_acctbal"))) / count(lit(1))).as("avg_bal"))
    val ordCount = table(spark, sfDir, "orders")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"))
    cust
      .crossJoin(broadcast(thr))
      .filter($"c_acctbal" > $"avg_bal")
      .join(ordCount, $"c_custkey" === $"o_custkey", "left_outer")
      .filter(coalesce($"n_orders", lit(0L)) < 5)
      .groupBy(substring($"c_name", 18, 1).as("bucket"))
      .agg(count(lit(1)).as("numcust"), dbl(sum(dec($"c_acctbal"))).as("totacctbal"))
      .orderBy($"bucket")
  }

  val q22Sql: String =
    """SELECT substring(c_name, 18, 1) AS bucket, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |                   FROM customer WHERE c_acctbal > 0)
      |  AND (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) < 5
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  /** CUBE grouping sets — all four (returnflag, linestatus) marginals in one
    * pass (complements qRollupRevenue's ROLLUP).
    */
  def qCubeRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    table(spark, sfDir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(dbl(sum(dec($"l_extendedprice"))).as("revenue"), count(lit(1)).as("n"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, COUNT(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Pivot: quantity by returnflag × linestatus as columns. Pivot is
    * conditional aggregation under the hood — the explicit value list keeps
    * the schema static (no driver-side distinct scan).
    */
  def qPivotStatus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    table(spark, sfDir, "lineitem")
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dbl(sum(dec($"l_quantity"))))
      .orderBy($"l_returnflag")
  }

  val qPivotSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
      |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O"
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Semi-structured: extract the numeric k from the events props JSON and
    * aggregate per k%10 bucket. get_json_object is codegen'd (Jackson-based,
    * no UDF); the cast-to-long mirrors DuckDB's json_extract_string cast.
    */
  def qJsonProps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Queries.events(spark, sfDir)
      .withColumn("k", get_json_object($"props", "$.k").cast(LongType))
      .groupBy(($"k" % 10).as("k_bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        dbl(sum($"value".cast(DecimalType(18, 4)))).as("sum_value")
      )
      .orderBy($"k_bucket")
  }

  val qJsonSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin

  /** Explicit GROUPING SETS with grouping() indicators — the general form
    * underlying rollup/cube: (returnflag), (linestatus), and the grand total
    * in one pass, each row tagged with which keys are aggregated away.
    */
  def qGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    table(spark, sfDir, "lineitem").createOrReplaceTempView("graft_li_gs")
    val out = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM graft_li_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    spark.catalog.dropTempView("graft_li_gs")
    out
  }

  val qGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Exact interpolated percentiles (median / p90) of quantity per return
    * flag — Spark's `percentile` and DuckDB's `quantile_cont` share the
    * (1−f)·a + f·b interpolation on sorted exact values.
    */
  def qPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    table(spark, sfDir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n")
      )
      .orderBy($"l_returnflag")
  }

  val qPercentilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS p50_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** INTERSECT set op: nations present on both the customer and supplier side
    * (complements qNationsExcept's EXCEPT).
    */
  def qIntersectNations(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val custNations = table(spark, sfDir, "customer").select($"c_nationkey".as("nationkey"))
    val suppNations = table(spark, sfDir, "supplier").select($"s_nationkey".as("nationkey"))
    custNations
      .intersect(suppNations)
      .join(broadcast(table(spark, sfDir, "nation")), $"nationkey" === $"n_nationkey")
      .select($"n_name")
      .orderBy($"n_name")
  }

  val qIntersectSql: String =
    """SELECT n_name FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT
      |  SELECT s_nationkey AS nationkey FROM supplier) t
      |JOIN nation ON nationkey = n_nationkey ORDER BY n_name""".stripMargin

  /** Sequential window functions beyond top-k: per-customer ROWS-frame
    * running spend, lag-based order gap, and the first order crossing a
    * cumulative threshold (running sum → filter → row_number). Every window
    * is partitioned by o_custkey — at 100 TB each customer's timeline sorts
    * inside its own shuffle partition; there is no global-order window
    * anywhere. Decimal accumulation keeps the running sum order-independent
    * of FP rounding; cast to double only at the output edge.
    */
  def qWindowRunning(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(spark, sfDir, "orders")
      .withColumn("running_spend", sum($"o_totalprice".cast(DecimalType(18, 2))).over(wcum))
      .withColumn(
        "gap_days",
        coalesce(datediff($"o_orderdate", lag($"o_orderdate", 1).over(w)).cast(LongType), lit(-1L)))
      .filter($"running_spend" >= 300000)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select(
        $"o_custkey",
        $"o_orderkey".as("crossing_order"),
        $"running_spend".cast(DoubleType).as("running_spend"),
        $"gap_days")
      .orderBy($"o_custkey")
  }

  val qWindowRunningSql: String =
    """WITH runs AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) AS running,
      |    COALESCE(date_diff('day',
      |      CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
      |      CAST(o_orderdate AS DATE)), -1) AS gap_days
      |  FROM orders
      |), crossed AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rk
      |  FROM runs WHERE running >= 300000
      |)
      |SELECT o_custkey, o_orderkey AS crossing_order,
      |  CAST(running AS DOUBLE) AS running_spend, gap_days
      |FROM crossed WHERE rk = 1 ORDER BY o_custkey""".stripMargin
}
