package graft.tools

import graft.JobCount

/** Regenerates `src/test/resources/job_baseline.tsv` — the per-query Spark
  * job counts JobCountSpec guards against. Run after an INTENTIONAL plan
  * change (new exchange, new broadcast, a planner rule that adds a bounded
  * eager job) and commit the diff: the review of that diff is the audit.
  *
  *   sbt "Test/runMain graft.tools.JobBaselineGen"
  */
object JobBaselineGen {
  def main(args: Array[String]): Unit = {
    val spark = JobCount.newSession("job-baseline-gen")
    spark.sparkContext.setLogLevel("WARN")
    val rows = JobCount.audited.map { case (name, fn) =>
      val j =
        try JobCount.measure(spark, name, fn)
        catch {
          case e: Throwable =>
            System.err.println(s"[job-baseline] $name failed: ${e.getMessage}")
            -1
        }
      println(s"[job-baseline] $name\t$j")
      s"$name\t$j"
    }
    val out = java.nio.file.Paths.get(JobCount.BaselinePath)
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (rows.filterNot(_.endsWith("\t-1")).mkString("", "\n", "\n")).getBytes("UTF-8"))
    println(s"[job-baseline] wrote ${rows.size} rows to ${JobCount.BaselinePath}")
    spark.stop()
  }
}
