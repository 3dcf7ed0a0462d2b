package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Final TPC-H tranche — Q2, Q11, Q20, Q21 — completing the 22-query set
  * (the other 18 live in Queries.scala / Queries2.scala). These four share
  * one missing input: `partsupp` doesn't exist in the reduced schema, so —
  * exactly like Q9/Q16 before them — lineitem supplies the part–supplier
  * association, and the per-query stand-ins are documented inline.
  *
  * Shapes covered that the surface previously lacked:
  *   - Q2: correlated MIN scalar subquery (min-cost supplier per part)
  *   - Q11: HAVING against a scalar fraction of a re-aggregated total
  *   - Q20: nested IN chain collapsed to semi joins
  *   - Q21: double-correlated EXISTS / NOT EXISTS, rewritten as one
  *     per-order aggregation (the classic distributed Q21 rewrite)
  *
  * Float determinism follows Queries2: exact DECIMAL(18,2) aggregation,
  * cast to DOUBLE only after the sum is finished. Q2's `supply_cost` is a
  * MIN over per-row double divisions — MIN is order-independent and IEEE
  * division is bit-identical across engines, so no decimal detour needed.
  */
object Queries3 {

  private def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Queries.table(spark, sfDir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dbl(c: Column): Column = c.cast(DoubleType)

  /** Q2 minimum-cost supplier: for each STANDARD small part, the European
    * supplier(s) offering it at the lowest unit cost. (No partsupp ⇒
    * `supply_cost` := MIN(l_extendedprice / l_quantity) observed per
    * (part, supplier).) The correlated `= (SELECT MIN …)` becomes a window
    * MIN over the already-aggregated (part, supplier) table — the window
    * input is |parts × region suppliers|, tiny relative to lineitem, and
    * the aggregation underneath is map-side partial on a broadcast-pruned
    * scan, so the shape holds at 100×.
    */
  def q2MinCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val region = table(spark, sfDir, "region").filter($"r_name" === "EUROPE")
    val euroNation = table(spark, sfDir, "nation")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val euroSupp = table(spark, sfDir, "supplier")
      .join(broadcast(euroNation), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val part = table(spark, sfDir, "part")
      .filter($"p_size" <= 10 && $"p_type" === "STANDARD")
      .select($"p_partkey", $"p_name")
    val cost = table(spark, sfDir, "lineitem")
      .join(broadcast(part.select($"p_partkey")), $"l_partkey" === $"p_partkey", "left_semi")
      .join(broadcast(euroSupp.select($"s_suppkey")), $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min($"l_extendedprice" / $"l_quantity").as("supply_cost"))
    val minPerPart = Window.partitionBy($"l_partkey")
    cost
      .withColumn("min_cost", min($"supply_cost").over(minPerPart))
      .filter($"supply_cost" === $"min_cost")
      .join(broadcast(euroSupp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_name", $"supply_cost")
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  val q2Sql: String =
    """WITH pcost AS (
      |  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supply_cost
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE p_size <= 10 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      |  GROUP BY 1, 2)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
      |FROM pcost c1
      |JOIN supplier ON c1.l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN part ON c1.l_partkey = p_partkey
      |WHERE supply_cost = (SELECT MIN(c2.supply_cost) FROM pcost c2 WHERE c2.l_partkey = c1.l_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** Q11 important stock: parts whose revenue from NATION_7's suppliers
    * exceeds 0.1% of that nation's total. (No partsupp ⇒ revenue stands in
    * for supplycost·availqty.) Both the per-part value and the grand total
    * stay exact decimal until the final compare — a double running sum
    * would make the threshold order-dependent across engines.
    */
  def q11ImportantParts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val suppN = table(spark, sfDir, "supplier")
      .join(
        broadcast(table(spark, sfDir, "nation").filter($"n_name" === "NATION_7")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val rev = dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))
    val v = table(spark, sfDir, "lineitem")
      .join(broadcast(suppN), $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey")
      .agg(sum(rev).as("dval"))
    val total = v.agg(dbl(sum($"dval")).as("total"))
    v.crossJoin(broadcast(total))
      .filter(dbl($"dval") > lit(0.001) * $"total")
      .select($"l_partkey", dbl($"dval").as("part_value"))
      .orderBy($"part_value".desc, $"l_partkey")
  }

  val q11Sql: String =
    """WITH v AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS dval
      |  FROM lineitem
      |  WHERE l_suppkey IN (
      |    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |    WHERE n_name = 'NATION_7')
      |  GROUP BY 1)
      |SELECT l_partkey, CAST(dval AS DOUBLE) AS part_value
      |FROM v
      |WHERE CAST(dval AS DOUBLE) > 0.001 * (SELECT CAST(SUM(dval) AS DOUBLE) FROM v)
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  /** Q20 potential part promotion: NATION_4 suppliers who shipped more than
    * 20 units of some red part during 1997. (No partsupp/availqty ⇒ the
    * shipped-quantity aggregate IS the availability signal.) The nested
    * IN-chain is two broadcast semi joins plus one partial-agg shuffle on
    * (suppkey, partkey) — no row re-expansion anywhere.
    */
  def q20PromotionSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val redParts = table(spark, sfDir, "part")
      .filter($"p_name".startsWith("red"))
      .select($"p_partkey")
    val qualified = table(spark, sfDir, "lineitem")
      .filter(
        $"l_shipdate" >= lit("1997-01-01 00:00:00").cast(TimestampType) &&
          $"l_shipdate" < lit("1998-01-01 00:00:00").cast(TimestampType))
      .join(broadcast(redParts), $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(dbl(sum(dec($"l_quantity"))).as("qty"))
      .filter($"qty" > 20.0)
      .select($"l_suppkey")
    table(spark, sfDir, "supplier")
      .join(
        broadcast(table(spark, sfDir, "nation").filter($"n_name" === "NATION_4")),
        $"s_nationkey" === $"n_nationkey")
      .join(qualified, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  val q20Sql: String =
    """SELECT s_suppkey, s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_4' AND s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 20.0)
      |ORDER BY s_suppkey""".stripMargin

  /** Q21 suppliers who kept orders waiting: NATION_2 suppliers whose
    * lineitem was the ONLY late one in a multi-supplier finalized order.
    * (No receipt/commit dates ⇒ late := shipped more than 90 days after
    * the order date.)
    *
    * The reference shape is a double-correlated EXISTS / NOT EXISTS; per-row
    * subqueries don't distribute, so this uses the standard rewrite: collapse
    * the joined stream once to (order, supplier, late-row count), then the
    * EXISTS pair is a per-order census over that collapsed table
    * (`ns > 1 && nls = 1`) and numwait is a sum of the already-counted late
    * rows — one lineitem scan, no countDistinct Expand, every aggregate
    * partial map-side.
    */
  def q21WaitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = table(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(
        table(spark, sfDir, "orders")
          .filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .withColumn("late", $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
    // ONE pass over the joined stream: collapse to (order, supplier) first —
    // countDistinct would Expand the full stream ×2 and the late rows would
    // need a second lineitem scan; this partial-aggregated collapse feeds
    // both the per-order supplier census and the per-supplier late-row count.
    val perOrderSupp = li
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(sum(when($"late", 1L).otherwise(0L)).as("n_late_rows"))
    val soloLateOrders = perOrderSupp
      .groupBy($"l_orderkey")
      .agg(
        count(lit(1)).as("ns"),
        count(when($"n_late_rows" > 0, lit(1))).as("nls"))
      .filter($"ns" > 1 && $"nls" === 1)
      .select($"l_orderkey".as("wait_orderkey"))
    val numwait = perOrderSupp
      .filter($"n_late_rows" > 0)
      .join(soloLateOrders, $"l_orderkey" === $"wait_orderkey")
      .groupBy($"l_suppkey")
      .agg(sum($"n_late_rows").as("numwait"))
    table(spark, sfDir, "supplier")
      .join(
        broadcast(table(spark, sfDir, "nation").filter($"n_name" === "NATION_2")),
        $"s_nationkey" === $"n_nationkey")
      .join(numwait, $"s_suppkey" === $"l_suppkey")
      // final GROUP BY s_name, exactly like the SQL form: two suppliers
      // sharing a name must merge their counts (the datagen happens to make
      // s_name unique, but the rewrite must not depend on that)
      .groupBy($"s_name")
      .agg(sum($"numwait").as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }

  val q21Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin
}
