package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for joins at corpus scale (SURVEY §7 "salt hot bands").
  *
  * AQE's skew-join split handles most cases at runtime; salting is for the
  * structural case AQE can't fix — a replicated/broadcast-unfriendly join
  * where a handful of keys carry a large share of rows (hot LSH bands,
  * boilerplate shingles, null-ish default keys).
  */
object Skew {

  /** Salted inner equi-join on `key`: the large side gets a random salt in
    * [0, factor), the small side is replicated `factor` times, and the join
    * key becomes (key, salt) — a hot key's rows spread over `factor`
    * reducers instead of one straggler.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0)
    val salted = large.withColumn("_salt", (rand(42) * factor).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    salted
      .join(replicated, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Top-`n` heaviest keys of `df` by count — the measurement step before
    * deciding to salt, cap, or broadcast.
    */
  def hotKeys(df: DataFrame, key: String, n: Int): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key).asc) // key tiebreak: deterministic under count ties
      .limit(n)
}
