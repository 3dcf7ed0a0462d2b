package graft.tools

import graft.{GraftExtensions, SparkEntry}
import org.apache.spark.sql.SparkSession

/** r10 verdict #6: q18/q21's executed join strategies at 50x facts had not
  * been audited. Runs each query at the given factors and prints the FINAL
  * (post-AQE) plan's join/exchange/aggregate skeleton plus wall time.
  *
  * Run: SPARK_GRAFT_SF_DIR=<base sf> sbt "runMain graft.tools.AuditSf5Plans q18_large_orders q21_waiting_suppliers"
  */
object AuditSf5Plans {
  def main(args: Array[String]): Unit = {
    val baseSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q18_large_orders", "q21_waiting_suppliers")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (factor <- Seq(10, 50); name <- names) {
      val dir = RelationalScale.ensureScaled(spark, baseSf, factor)
      val fn = SparkEntry.queries(name)
      val df = fn(spark, dir)
      val t0 = System.nanoTime()
      df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      // post-execution: AdaptiveSparkPlan is finalized — the skeleton below
      // is what actually ran
      val plan = df.queryExecution.executedPlan.toString
      val skeleton = plan.linesIterator.filter { l =>
        val t = l.trim.stripPrefix("+- ").stripPrefix(":- ").stripPrefix("*(").dropWhile(c => c.isDigit || c == ')' || c == ' ')
        Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
          "BroadcastNestedLoop", "Exchange", "AQEShuffleRead", "HashAggregate",
          "ObjectHashAggregate", "SortAggregate", "CartesianProduct").exists(l.contains) &&
          !l.contains("Exchange hashpartitioning") || l.contains("Join")
      }.map(_.takeWhile(_ != '[').trim).take(40).mkString("\n    ")
      println(f"[audit] $name @ ${factor}x: $secs%.2f s")
      val joins = plan.linesIterator.flatMap { l =>
        Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
          "BroadcastNestedLoopJoin", "CartesianProduct")
          .find(l.contains).map(j => j + l.dropWhile(_ != '[').takeWhile(_ != ']').take(70))
      }.toSeq
      joins.foreach(j => println(s"[audit]   join: $j"))
      val nExch = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      val nSkew = plan.linesIterator.count(_.contains("skewed"))
      println(s"[audit]   exchanges=$nExch skew-handled=$nSkew")
    }
    spark.stop()
  }
}
