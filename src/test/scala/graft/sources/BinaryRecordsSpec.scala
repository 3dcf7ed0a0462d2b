package graft.sources

import graft.sources.BinaryRecords.User
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The reference's protobuf-over-4mc example pipeline, typed end-to-end
  * (C2 explode, C3 tag counts, C4 sort, C5 compressed sink, C6 filter).
  */
class BinaryRecordsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("binary-records")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("typed user records round-trip through 4mc binary and drive the tag pipeline") {
    import spark.implicits._
    val users = (0 until 5000).map { i =>
      User(s"u$i", s"name$i", if (i % 2 == 0) "A" else "B", 1000000000L + i,
        (0 until i % 4).map(t => s"tag${(i + t) % 7}"))
    }
    val dir = Files.createTempDirectory("users4mc").toString + "/users"
    BinaryRecords.writeUsers(users.toDS(), dir, "zstd-3")

    val back = BinaryRecords.readUsers(spark, dir)
    assert(back.count() == 5000)
    assert(back.collect().sortBy(_.userId).toSeq == users.sortBy(_.userId))

    val counts = BinaryRecords.tagCounts(back).collect()
    val expected = users.filter(_.tags.nonEmpty).flatMap(_.tags)
      .groupBy(identity).map { case (t, l) => (t, l.size.toLong) }
      .toSeq.sortBy { case (t, n) => (-n, t) }
    assert(counts.map(r => (r.getString(0), r.getLong(1))).toSeq == expected)

    // C5: compressed sink of the result, read back
    val outDir = Files.createTempDirectory("tagcounts").toString + "/out"
    BinaryRecords.tagCounts(back)
      .select(concat_ws("|", $"tag", $"cnt").as("value"))
      .write.format("4mc").option("codec", "zstd-6").save(outDir)
    assert(spark.read.format("4mc").load(outDir).count() == expected.size)
  }

  test("GraftExtensions registers vec_* for a fresh session") {
    spark.sparkContext // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate() // new session over the existing context
      val got = s2.sql(
        "SELECT vec_dot(array(cast(2.0 as float), cast(3.0 as float)), " +
          "array(cast(4.0 as float), cast(5.0 as float))) AS d").head().getDouble(0)
      assert(got == 23.0)
      // proto_struct in SQL: 0x089601 = field 1 varint 150 (the spec example)
      val pid = s2.sql(
        "SELECT proto_struct(X'089601', '1:id:long').id AS id").head().getLong(0)
      assert(pid == 150L)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("sql surface: USING 4mc table + vec_cosine function") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val dir = Files.createTempDirectory("sqltbl").toString + "/t"
    (0 until 100).map(i => s"v$i").toDF("value").write.format("4mc").save(dir)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW t4mc USING `4mc` OPTIONS (path '$dir')")
    assert(spark.sql("SELECT count(*) FROM t4mc").head().getLong(0) == 100)
    val sim = spark.sql(
      "SELECT vec_cosine(array(cast(1.0 as float), cast(0.0 as float)), " +
        "array(cast(1.0 as float), cast(0.0 as float))) AS s").head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }
}
