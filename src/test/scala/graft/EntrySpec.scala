package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() on sf0.001 returns rows. */
class EntrySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("entry-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("entry returns non-empty flagship result") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("sum_qty"))
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every BroadcastNestedLoopJoin in the registered surface is disclosed and bounded") {
    val sf = "/root/testdata/sf0.001"
    // A BNLJ is acceptable ONLY when its broadcast side is bounded by
    // construction. Each allowed query carries the plan marker that proves
    // its bound; any query not listed here that plans a BNLJ fails — no
    // undisclosed cartesians can enter the surface.
    val scalarAgg = (p: String) => p.contains("keys=[]") // 1-row aggregate broadcast
    val allowedBnlj: Map[String, String => Boolean] = Map(
      // scalar-subquery thresholds (avg/sum over the whole table → one row)
      "q_parts_above_avg" -> scalarAgg,
      "q11_important_parts" -> scalarAgg,
      "q22_wealthy_inactive" -> scalarAgg,
      // corpus-stats broadcast rows (N, avgdl, total-token mass …)
      "tfidf_top_terms" -> scalarAgg,
      "bm25_top_docs" -> scalarAgg,
      "mixture_weights" -> scalarAgg,
      "mixture_resample" -> scalarAgg,
      "quality_curriculum" -> scalarAgg,
      "unigram_logprob" -> scalarAgg,
      "bigram_logprob" -> scalarAgg,
      "dsir_select" -> scalarAgg,
      // 10 probe vectors broadcast against the corpus
      "ann_brute_force" -> (_.contains("LessThan(vec_id,10)")),
      // same bounded probe set, corpus read from the 4mc container
      "ann_brute_force_fourmc" -> (_.contains("LessThan(vec_id,10)")),
      "ann_hard_negatives" -> (_.contains("LessThan(vec_id,10)")),
      // 10 probe LUTs broadcast against the corpus CODES (mSub-byte rows)
      "ann_pq" -> (_.contains("LessThan(vec_id,10)")),
      // the disclosed exact-baseline cartesian: sample cap pushed to BOTH scans
      "dedup_embedding_pairs_exact_baseline" -> { p =>
        p.linesIterator.count(l => l.contains("PushedFilters") &&
          l.contains(s"LessThan(vec_id,${PipelineQueries.EmbeddingBaselineSampleCap}")) >= 2
      }
    )
    // streaming_* construct by draining a stream — their result is a tiny
    // local batch, no join planning to audit; everything else is swept.
    val audited = SparkEntry.queries.filterNot(_._1.startsWith("streaming_"))
    val offenders = audited.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (!plan.contains("BroadcastNestedLoopJoin")) None
      else allowedBnlj.get(name) match {
        case Some(boundMarker) if boundMarker(plan) => None
        case Some(_) => Some(s"$name (bound marker missing from plan)")
        case None    => Some(s"$name (undisclosed BNLJ)")
      }
    }
    assert(offenders.isEmpty, s"BNLJ audit failed: ${offenders.mkString(", ")}")
  }
}
