package graft.tools

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Failure-row diagnosability of the stress harness (r16 verdict #1a): an op
  * that throws must land in the artifact as `secs: -1` WITH the exception
  * class + message (and root cause) in its `error` field — previously the
  * cause went only to stderr and was lost with the driver log.
  */
class StressPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    SparkSession
      .builder()
      .master("local[2]")
      .appName("stress-pipeline-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  test("failed op records the exception class, message, and root cause") {
    val r = StressPipeline.timed(spark, "boom") {
      throw new RuntimeException(
        "outer wrapper", new IllegalStateException("executor heap exhausted"))
    }
    assert(r.secs == -1.0)
    assert(r.error != null)
    assert(r.error.contains("java.lang.RuntimeException"))
    assert(r.error.contains("outer wrapper"))
    assert(r.error.contains("java.lang.IllegalStateException"))
    assert(r.error.contains("executor heap exhausted"))
  }

  test("successful op carries no error field") {
    val r = StressPipeline.timed(spark, "ok")(42L)
    assert(r.secs >= 0)
    assert(r.rows == 42L)
    assert(r.error == null)
  }

  test("toJson emits the error field escaped, and omits it when absent") {
    val fail = StressPipeline.OpResult("bad", -1.0, -1L, 0.0,
      error = "path \"C:\\x\"\nline2")
    val ok = StressPipeline.OpResult("good", 1.0, 5L, 0.0)
    val json = StressPipeline.toJson(StressPipeline.StressReport(
      1, 1, 0L, 0L, 0.0, 0.0, 0L, Nil, Seq(fail, ok)))
    assert(json.contains(""""error":"path \"C:\\x\"\nline2""""))
    // the error key appears exactly once (the ok row omits it)
    assert(json.sliding(8).count(_ == """"error":""") == 1)
    // the artifact stays machine-parseable
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(json)
    assert(tree.path("ops").path("bad").path("error").asText.startsWith("path \"C:\\x\""))
    assert(!tree.path("ops").path("good").has("error"))
  }
}
