package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (the prompt's "bucketing for co-located joins"):
  * write both sides bucketed+sorted on the join key and the sort-merge join
  * runs with ZERO exchange — at 100 TB the difference between a full
  * re-shuffle of the fact table per join and none.
  *
  * Spark's bucketing lives in the table catalog (`bucketBy` requires
  * `saveAsTable`), so this helper manages managed tables.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCol: String,
      numBuckets: Int
  ): Unit = {
    val spark = df.sparkSession
    // The default catalog is in-memory, so a crashed JVM leaves the managed
    // table's warehouse directory on disk with no catalog entry; saveAsTable
    // then fails with LOCATION_ALREADY_EXISTS even in overwrite mode. The
    // table names here are graft-owned, so reclaiming the orphan is safe.
    if (!spark.catalog.tableExists(tableName)) {
      // defaultTablePath resolves current database and <db>.db nesting —
      // string-concatenating <warehouse>/<name> is only right for the
      // default database
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
      val loc = new org.apache.hadoop.fs.Path(spark.sessionState.catalog.defaultTablePath(ident))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName) // managed table under spark.sql.warehouse.dir
  }

  /** Join two bucketed tables on their bucket key — no Exchange when both
    * sides share the bucket count (verify with
    * `plan.toString.contains("Exchange") == false`).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
