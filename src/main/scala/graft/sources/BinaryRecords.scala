package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed binary records over the 4mc binary payload — the analog of the
  * reference's Elephant-Bird protobuf integration
  * (`examples/.../FourMcEbProtoInputFormat.java:34-58`, schema
  * `examples/src/main/resources/user.proto:7-14`): a message with scalar
  * fields and a repeated field, carried as length-prefixed binary records
  * inside container blocks and decoded to a typed Dataset.
  *
  * The wire format is a minimal deterministic tag-free encoding (this engine
  * has no protobuf runtime); swapping `encode`/`decode` for generated
  * protobuf code changes nothing else.
  */
object BinaryRecords {

  /** FIXTURES.md §2: User { userId, name, type, birthDate, tags[] } */
  case class User(
      userId: String,
      name: String,
      utype: String,
      birthDate: Long,
      tags: Seq[String]
  )

  private def writeStr(out: java.io.DataOutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8"); out.writeInt(b.length); out.write(b)
  }
  private def readStr(in: java.io.DataInputStream): String = {
    val b = new Array[Byte](in.readInt()); in.readFully(b); new String(b, "UTF-8")
  }

  def encode(u: User): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    writeStr(out, u.userId); writeStr(out, u.name); writeStr(out, u.utype)
    out.writeLong(u.birthDate)
    out.writeInt(u.tags.length)
    u.tags.foreach(writeStr(out, _))
    out.flush(); bos.toByteArray
  }

  def decode(b: Array[Byte]): User = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(b))
    val id = readStr(in); val name = readStr(in); val t = readStr(in)
    val bd = in.readLong()
    val n = in.readInt()
    User(id, name, t, bd, (0 until n).map(_ => readStr(in)))
  }

  /** Write a typed Dataset as 4mc binary records. */
  def writeUsers(users: Dataset[User], dir: String, codec: String = "lz4-fast"): Unit = {
    import users.sparkSession.implicits._
    users.map(encode).toDF("value")
      .write.mode("overwrite").format("4mc")
      .option("payload", "binary").option("codec", codec).save(dir)
  }

  /** Splittable typed scan back out of the container. */
  def readUsers(spark: SparkSession, dir: String): Dataset[User] = {
    import spark.implicits._
    spark.read.format("4mc").option("payload", "binary").load(dir)
      .select("value").as[Array[Byte]].map(decode)
  }

  /** The reference's Spark example pipeline (TestProtobufInput.java:88-115):
    * filter empty-tag users (C6), explode tags (C2), count per tag (C3),
    * sort desc (C4), ready for a compressed sink (C5).
    */
  def tagCounts(users: Dataset[User]): DataFrame = {
    import users.sparkSession.implicits._
    users
      .filter(u => u.tags.nonEmpty)
      .flatMap(_.tags)
      .toDF("tag")
      .groupBy($"tag")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tag")
  }
}
