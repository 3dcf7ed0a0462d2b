package graft.hadoop.mapreduce

import graft.format.{FourMcLineIterator, FourMcReader, McInput}

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}

import scala.jdk.CollectionConverters._

/** RDD-API parity with the reference's published Spark usage
  * (`/root/reference/Readme.md:110-138`,
  * `java/hadoop-4mc/.../mapreduce/FourMcTextInputFormat.java:46-51`): a user
  * porting that snippet verbatim —
  *
  * {{{
  * sc.newAPIHadoopFile(path, classOf[FourMcTextInputFormat],
  *   classOf[LongWritable], classOf[Text], sc.hadoopConfiguration)
  * }}}
  *
  * — gets the same block-aligned parallelism as the DataFrame path: splits
  * are standard FileInputFormat byte ranges, and the record reader aligns
  * them to container blocks through the SAME [[FourMcLineIterator]], so any
  * partition of the byte range yields every line exactly once. Key = file
  * offset (compressed coordinates) of the block the line starts in, like the
  * reference's LongWritable key.
  *
  * Directory listings skip non-container files (reference
  * `FourMcInputFormatUtil.java:50-62`) instead of failing the job on
  * `_SUCCESS` markers and the like.
  */
class FourMcTextInputFormat extends FileInputFormat[LongWritable, Text] {

  override def isSplitable(context: JobContext, file: Path): Boolean = true

  override protected def listStatus(job: JobContext): java.util.List[FileStatus] = {
    val all = super.listStatus(job).asScala
    all.filter { st =>
      val n = st.getPath.getName
      st.isDirectory || n.endsWith(".4mc") || n.endsWith(".4mz")
    }.asJava
  }

  override def createRecordReader(
      split: InputSplit,
      context: TaskAttemptContext
  ): RecordReader[LongWritable, Text] = new FourMcLineRecordReader
}

/** 4mz alias — the container magic dispatches the codec, so both formats
  * share one reader (reference ships FourMzTextInputFormat as a separate
  * class name; we keep the name for drop-in parity).
  */
class FourMzTextInputFormat extends FourMcTextInputFormat

/** One byte-range split of a 4mc/4mz file as (blockOffset, line) records. */
class FourMcLineRecordReader extends RecordReader[LongWritable, Text] {

  private var in: McInput = _
  private var it: FourMcLineIterator = _
  private var start = 0L
  private var length = 0L
  private val key = new LongWritable
  private val value = new Text

  override def initialize(genericSplit: InputSplit, context: TaskAttemptContext): Unit = {
    val split = genericSplit.asInstanceOf[FileSplit]
    val path = split.getPath
    // raw fs: the container's per-block xxhash32 already covers integrity
    // (same rationale as the DataFrame reader's openInput)
    val fs = path.getFileSystem(context.getConfiguration) match {
      case cfs: org.apache.hadoop.fs.ChecksumFileSystem => cfs.getRawFileSystem
      case other                                        => other
    }
    val len = fs.getFileStatus(path).getLen
    val stream = fs.open(path)
    in = new McInput {
      def length: Long = len
      def readFully(pos: Long, buf: Array[Byte], off: Int, n: Int): Unit =
        stream.readFully(pos, buf, off, n)
      def close(): Unit = stream.close()
    }
    val index = FourMcReader.readIndex(in)
    start = split.getStart
    length = split.getLength
    it = new FourMcLineIterator(in, index, start, start + length)
  }

  override def nextKeyValue(): Boolean =
    if (it != null && it.hasNext) {
      val (k, line) = it.next()
      key.set(k)
      value.set(line, 0, line.length)
      true
    } else false

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: Text = value

  override def getProgress: Float =
    if (length <= 0L) 1.0f
    else math.min(1.0f, (it.progressPos - start).toFloat / length.toFloat)

  override def close(): Unit = if (in != null) in.close()
}
