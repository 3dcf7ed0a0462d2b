package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Deterministic sampling and split assignment for training corpora.
  *
  * `rand()`-based sampling is unusable in a 100-TB pipeline: re-running a
  * failed stage, backfilling a partition, or auditing a sample months later
  * must pick the SAME rows. The standard fix is a keyed hash bucket — here
  * the first 8 hex chars of md5(key) reduced mod `mod` — which is
  * reproducible across runs, engines (any system with md5 computes the same
  * bucket, which is what makes the DuckDB oracle exact), and data layouts.
  *
  * Shape at 100 TB: the bucket is a narrow map-only expression (md5 of a
  * short key string, no shuffle); sampling is a plain filter that pushes
  * into the scan's data filters, and split assignment is a groupBy over a
  * 3-value derived column — both partial-agg friendly.
  */
object Sampling {

  /** Uniform bucket in [0, mod) from md5(key): the first 8 hex chars are a
    * uniform 32-bit value for any non-degenerate key distribution.
    */
  def md5Bucket(key: Column, mod: Int): Column = {
    require(mod > 0, s"mod must be positive, got $mod")
    conv(substring(md5(key.cast(StringType)), 1, 8), 16, 10).cast(LongType) % mod
  }

  /** DuckDB mirror of [[md5Bucket]] for a BIGINT key column. */
  def md5BucketSql(keyCol: String, mod: Int): String =
    s"CAST('0x' || substr(md5(CAST($keyCol AS VARCHAR)), 1, 8) AS BIGINT) % $mod"

  /** Bernoulli sample at `pct`% (deterministic; 0 <= pct <= 100). */
  def sampled(key: Column, pct: Column): Column = md5Bucket(key, 100) < pct

  /** Train/val/test assignment: bucket < trainPct -> "train",
    * < trainPct+valPct -> "val", else "test".
    */
  def splitAssignment(key: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be <= 100")
    val b = md5Bucket(key, 100)
    when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test")
  }

  def splitAssignmentSql(keyCol: String, trainPct: Int, valPct: Int): String =
    s"""CASE WHEN ${md5BucketSql(keyCol, 100)} < $trainPct THEN 'train'
       |     WHEN ${md5BucketSql(keyCol, 100)} < ${trainPct + valPct} THEN 'val'
       |     ELSE 'test' END""".stripMargin
}
