package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1-by-replication for the RELATIONAL bench section: the fact tables
  * (lineitem, orders) replicate `factor`× with order keys shifted into
  * disjoint bands (joins stay key-correct: every lineitem row still matches
  * exactly its order), dimensions copy as-is. Per-customer/part/supplier
  * fan-in grows `factor`× — which is the point: broadcast-vs-SMJ flips, AQE
  * coalescing, and skew handling only show up when the fact side outgrows
  * the dims, exactly what a 10× fact scale-up produces.
  *
  * This is a TIMING corpus, not an oracle corpus: the driver's correctness
  * gate stays at sf0.01 against DuckDB; the sf1 section's gate is plan
  * shape + the < 2× parquet-twin ratio at 10× the data.
  */
object RelationalScale {

  /** Tables the TPC-H 22 + the lineitem/orders round-trip twins read. */
  private val FactTables = Seq("lineitem", "orders")
  private val DimTables = Seq("region", "nation", "customer", "supplier", "part")

  /** Generate (or reuse) a scaled sf dir; returns its path. Key-shift
    * offset is one band per replica, sized by the base max(o_orderkey)+1 so
    * replica key ranges never collide.
    */
  def ensureScaled(spark: SparkSession, baseSf: String, factor: Int): String = {
    val key = java.lang.Integer.toHexString(baseSf.hashCode)
    val dir = s"/tmp/graft-sfscale/g1-$key/x$factor"
    def exists(t: String): Boolean = new java.io.File(s"$dir/$t.parquet/_SUCCESS").exists()

    if (!(FactTables ++ DimTables).forall(exists)) {
      val band = spark.read.parquet(s"$baseSf/orders.parquet")
        .agg(max(col("o_orderkey"))).head().getLong(0) + 1L
      val reps = broadcast(spark.range(factor).select(col("id").as("rep")))
      for (t <- DimTables if !exists(t))
        spark.read.parquet(s"$baseSf/$t.parquet")
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      if (!exists("orders")) {
        val o = spark.read.parquet(s"$baseSf/orders.parquet")
        o.crossJoin(reps)
          .select((col("o_orderkey") + col("rep") * band).as("o_orderkey") +:
            o.columns.filterNot(_ == "o_orderkey").map(col).toIndexedSeq: _*)
          .repartition(8 * factor)
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      }
      if (!exists("lineitem")) {
        val li = spark.read.parquet(s"$baseSf/lineitem.parquet")
        li.crossJoin(reps)
          .select((col("l_orderkey") + col("rep") * band).as("l_orderkey") +:
            li.columns.filterNot(_ == "l_orderkey").map(col).toIndexedSeq: _*)
          .repartition(8 * factor)
          .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      }
    }
    dir
  }
}
