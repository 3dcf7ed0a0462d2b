package graft.sources

import graft.format._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.{
  FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile
}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import java.util.concurrent.ConcurrentHashMap

/** Splittable Spark source/sink for the 4mc/4mz container.
  *
  * `spark.read.format("4mc").load(path)` → `[value: string]`
  * (`option("withOffsets", true)` adds `offset: long` = file offset of the
  * line's block, the analog of the reference's `LongWritable` key,
  * `FourMcLineRecordReader.java:54-57`).
  *
  * `option("payload", "binary")` reads/writes length-prefixed binary records
  * (`[value: binary]`) — records never span blocks, so splits stay
  * block-aligned (the Elephant-Bird-protobuf analog, SURVEY §2 A3/A10).
  *
  * `df.write.format("4mc").option("codec", "zstd-6").save(path)` — codec is a
  * writer-side choice; readers auto-detect LZ4 vs ZSTD from the magic.
  *
  * Splittability is the whole point (reference `Readme.md:110-138`): the
  * footer block index lets ANY byte-range split map deterministically to a
  * disjoint set of 4 MiB blocks, so a 100 TB directory fans out to
  * `totalBytes / maxSplitBytes` parallel tasks with no external index file.
  */
class FourMcFileFormat extends FileFormat with DataSourceRegister with Serializable {

  override def shortName(): String = "4mc"
  override def toString: String = "4MC"

  override def inferSchema(
      sparkSession: SparkSession,
      options: Map[String, String],
      files: Seq[FileStatus]
  ): Option[StructType] = {
    if (options.getOrElse("payload", "text") == "csv") return None // user-provided schema
    val valueType =
      if (options.getOrElse("payload", "text") == "binary") BinaryType else StringType
    val base = StructType(Seq(StructField("value", valueType, nullable = false)))
    if (options.get("withOffsets").exists(_.toBoolean))
      Some(StructType(StructField("offset", LongType, nullable = false) +: base.fields))
    else Some(base)
  }

  override def isSplitable(
      sparkSession: SparkSession,
      options: Map[String, String],
      path: Path
  ): Boolean = true

  override def buildReader(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration
  ): PartitionedFile => Iterator[InternalRow] = {
    val broadcastConf = sparkSession.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    val payload = options.getOrElse("payload", "text")
    val binary = payload == "binary"

    if (payload == "csv") {
      // typed delimited parse INSIDE the reader: only the required columns
      // are converted (projection pushdown into the parse), the rest of each
      // line is skipped byte-wise — the roundtrip fast path
      val delim = options.getOrElse("delimiter", "|").charAt(0).toByte
      val tsFmt = options.getOrElse("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSS")
      val fieldIdx = requiredSchema.fields.map(f => dataSchema.fieldIndex(f.name))
      val fieldTypes = requiredSchema.fields.map(_.dataType)
      val nFields = requiredSchema.length
      val totalFields = dataSchema.length
      (file: PartitionedFile) => {
        val conf = broadcastConf.value.value
        val in = FourMcFileFormat.openInput(file, conf)
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        val index = FourMcFileFormat.cachedIndex(file, in)
        val fmt = java.time.format.DateTimeFormatter.ofPattern(tsFmt)
          .withZone(java.time.ZoneOffset.UTC)
        val lines = new FourMcLineIterator(in, index, file.start, file.start + file.length)
        val starts = new Array[Int](totalFields + 1)
        lines.map { case (_, bytes) =>
          // locate field boundaries in one pass
          var f = 1
          starts(0) = 0
          var i = 0
          while (i < bytes.length && f < totalFields) {
            if (bytes(i) == delim) { starts(f) = i + 1; f += 1 }
            i += 1
          }
          starts(totalFields) = bytes.length + 1
          while (f < totalFields) { starts(f) = bytes.length + 1; f += 1 } // missing fields -> empty
          val row = new GenericInternalRow(nFields)
          var k = 0
          while (k < nFields) {
            val src = fieldIdx(k)
            val s = starts(src)
            val e = math.min(starts(src + 1) - 1, bytes.length)
            val v: Any =
              if (s >= e) null
              else if (fieldTypes(k) == StringType) UTF8String.fromBytes(bytes, s, e - s)
              else {
                val str = new String(bytes, s, e - s, "UTF-8")
                fieldTypes(k) match {
                  case LongType      => java.lang.Long.parseLong(str)
                  case IntegerType   => java.lang.Integer.parseInt(str)
                  case DoubleType    => java.lang.Double.parseDouble(str)
                  case FloatType     => java.lang.Float.parseFloat(str)
                  case BooleanType   => java.lang.Boolean.parseBoolean(str)
                  case TimestampType | TimestampNTZType =>
                    val inst = java.time.Instant.from(fmt.parse(str))
                    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
                  case dt => throw new UnsupportedOperationException(s"csv payload type $dt")
                }
              }
            row.update(k, v)
            k += 1
          }
          row: InternalRow
        }
      }
    } else {
      val wantOffset = requiredSchema.fieldNames.contains("offset")
      val wantValue = requiredSchema.fieldNames.contains("value")
      val offsetFirst = requiredSchema.fieldNames.headOption.contains("offset")
      val nFields = requiredSchema.length

      (file: PartitionedFile) => {
        val conf = broadcastConf.value.value
        val in = FourMcFileFormat.openInput(file, conf)
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        val index = FourMcFileFormat.cachedIndex(file, in)
        val raw: Iterator[(Long, Array[Byte])] =
          if (binary) new FourMcRecordIterator(in, index, file.start, file.start + file.length)
          else new FourMcLineIterator(in, index, file.start, file.start + file.length)
        raw.map { case (off, bytes) =>
          val row = new GenericInternalRow(nFields)
          if (nFields > 0) {
            val v: Any = if (binary) bytes else UTF8String.fromBytes(bytes)
            if (wantOffset && wantValue) {
              if (offsetFirst) { row.update(0, off); row.update(1, v) }
              else { row.update(0, v); row.update(1, off) }
            } else if (wantOffset) row.update(0, off)
            else if (wantValue) row.update(0, v)
          }
          row: InternalRow
        }
      }
    }
  }

  override def prepareWrite(
      sparkSession: SparkSession,
      job: Job,
      options: Map[String, String],
      dataSchema: StructType
  ): OutputWriterFactory = {
    val codecName = options.getOrElse("codec", "lz4-fast")
    val codec = McCodec(codecName) // validate eagerly on the driver
    val payload = options.getOrElse("payload", "text")
    val binary = payload == "binary"
    val csv = payload == "csv"
    require(
      csv || dataSchema.length == 1,
      s"4mc sink expects exactly one column (got ${dataSchema.fieldNames.mkString(", ")}); " +
        "serialize rows to a single string/binary column first, or use payload=csv"
    )
    val delim = options.getOrElse("delimiter", "|")
    val tsFmt = options.getOrElse("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSS")
    val ext = codec.fileExtension
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String = ext
      override def newInstance(
          path: String,
          schema: StructType,
          context: TaskAttemptContext
      ): OutputWriter =
        if (csv) new FourMcCsvOutputWriter(path, context, McCodec(codecName), schema, delim, tsFmt)
        else new FourMcOutputWriter(path, context, McCodec(codecName), binary)
    }
  }

  override def supportDataType(dataType: DataType): Boolean = dataType match {
    case StringType | BinaryType | LongType | IntegerType | DoubleType | FloatType |
        BooleanType | TimestampType | TimestampNTZType =>
      true
    case _ => false
  }
}

object FourMcFileFormat {
  // Executor-side footer-index cache: one footer read per (file, size) per
  // executor instead of per split — the analog of the reference's per-file
  // index cache (FourMcInputFormat.java:132-148).
  private val indexCache = new ConcurrentHashMap[(String, Long), FourMcIndex]()

  private[sources] def cachedIndex(file: PartitionedFile, in: McInput): FourMcIndex = {
    if (indexCache.size > 4096) indexCache.clear()
    indexCache.computeIfAbsent(
      (file.urlEncodedPath, file.fileSize),
      _ => FourMcReader.readIndex(in)
    )
  }

  private[sources] def openInput(file: PartitionedFile, conf: Configuration): McInput = {
    val path = file.toPath
    val fs = path.getFileSystem(conf)
    val stream = fs.open(path)
    val len = file.fileSize
    new McInput {
      def length: Long = len
      def readFully(pos: Long, buf: Array[Byte], off: Int, n: Int): Unit =
        stream.readFully(pos, buf, off, n)
      def close(): Unit = stream.close()
    }
  }
}

/** Length-prefixed binary records; a record never spans blocks, so the
  * split's records are exactly those of its owned blocks [firstBlock >= start,
  * firstBlock >= end).
  */
final class FourMcRecordIterator(
    in: McInput,
    index: FourMcIndex,
    splitStart: Long,
    splitEnd: Long
) extends Iterator[(Long, Array[Byte])] {
  private val alignedStart = index.nextBlockAt(math.max(splitStart, FourMc.HeaderLen.toLong))
  private val alignedEnd =
    if (splitEnd >= index.eosPos) index.eosPos else index.nextBlockAt(splitEnd)
  private var pos = alignedStart
  private var block: Array[Byte] = _
  private var blockOff = 0
  private var blockFileOff = alignedStart

  private def ensureBlock(): Boolean = {
    while (block == null || blockOff >= block.length) {
      if (pos >= alignedEnd) return false
      val (data, nxt) = FourMcReader.readBlock(in, index.zstd, pos)
      if (data == null) return false
      block = data; blockOff = 0; blockFileOff = pos; pos = nxt
    }
    true
  }

  override def hasNext: Boolean = ensureBlock()

  override def next(): (Long, Array[Byte]) = {
    if (!hasNext) throw new NoSuchElementException
    if (blockOff + 4 > block.length)
      throw new java.io.IOException(s"truncated 4mc binary record header at $blockFileOff+$blockOff")
    val len = ((block(blockOff) & 0xff) << 24) | ((block(blockOff + 1) & 0xff) << 16) |
      ((block(blockOff + 2) & 0xff) << 8) | (block(blockOff + 3) & 0xff)
    blockOff += 4
    if (len < 0 || blockOff + len > block.length)
      throw new java.io.IOException(s"corrupt 4mc binary record length $len at $blockFileOff")
    val rec = java.util.Arrays.copyOfRange(block, blockOff, blockOff + len)
    blockOff += len
    (blockFileOff, rec)
  }
}

/** Typed csv-payload writer: serializes InternalRow fields directly into
  * delimited lines (the inverse of the projection-pruned csv reader). Nulls
  * become empty fields.
  */
final class FourMcCsvOutputWriter(
    val path: String,
    context: TaskAttemptContext,
    codec: McCodec,
    schema: StructType,
    delim: String,
    tsFmt: String
) extends OutputWriter {
  private val fsPath = new Path(path)
  private val out = {
    val fs = fsPath.getFileSystem(context.getConfiguration)
    new FourMcWriter(new java.io.BufferedOutputStream(fs.create(fsPath, false), 1 << 16), codec)
  }
  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern(tsFmt)
    .withZone(java.time.ZoneOffset.UTC)
  private val sb = new java.lang.StringBuilder(256)

  override def write(row: InternalRow): Unit = {
    sb.setLength(0)
    var i = 0
    while (i < schema.length) {
      if (i > 0) sb.append(delim)
      if (!row.isNullAt(i)) {
        schema.fields(i).dataType match {
          case StringType  => sb.append(row.getUTF8String(i).toString)
          case LongType    => sb.append(row.getLong(i))
          case IntegerType => sb.append(row.getInt(i))
          case DoubleType  => sb.append(row.getDouble(i))
          case FloatType   => sb.append(row.getFloat(i))
          case BooleanType => sb.append(row.getBoolean(i))
          case TimestampType | TimestampNTZType =>
            val micros = row.getLong(i)
            sb.append(fmt.format(java.time.Instant.ofEpochSecond(
              Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)))
          case dt => throw new UnsupportedOperationException(s"csv payload type $dt")
        }
      }
      i += 1
    }
    sb.append('\n')
    val bytes = sb.toString.getBytes("UTF-8")
    out.write(bytes, 0, bytes.length)
  }

  override def close(): Unit = out.close()
}

final class FourMcOutputWriter(
    val path: String,
    context: TaskAttemptContext,
    codec: McCodec,
    binary: Boolean
) extends OutputWriter {
  private val fsPath = new Path(path)
  private val out = {
    val fs = fsPath.getFileSystem(context.getConfiguration)
    new FourMcWriter(new java.io.BufferedOutputStream(fs.create(fsPath, false), 1 << 16), codec)
  }
  private val newline = Array[Byte]('\n')

  override def write(row: InternalRow): Unit = {
    if (binary) {
      val bytes = row.getBinary(0)
      val max = FourMc.MaxBlockSize - 4
      require(bytes.length <= max, s"4mc binary record ${bytes.length} B exceeds block capacity $max B; chunk large payloads")
      // flush so the record never spans blocks (keeps splits record-aligned)
      if (out.pendingBytes + 4 + bytes.length > FourMc.MaxBlockSize) out.flushBlock()
      val hdr = Array[Byte](
        ((bytes.length >>> 24) & 0xff).toByte, ((bytes.length >>> 16) & 0xff).toByte,
        ((bytes.length >>> 8) & 0xff).toByte, (bytes.length & 0xff).toByte
      )
      out.write(hdr, 0, 4)
      out.write(bytes, 0, bytes.length)
    } else {
      val bytes = row.getUTF8String(0).getBytes
      out.write(bytes, 0, bytes.length)
      out.write(newline, 0, 1)
    }
  }

  override def close(): Unit = out.close()
}
