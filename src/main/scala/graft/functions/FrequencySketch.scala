package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra-Gries heavy-hitters summary: at most `capacity` counters; every
  * item with frequency > N/(capacity+1) is guaranteed present, and each
  * reported count undercounts the true frequency by at most N/(capacity+1).
  * Exact when the column's distinct count never exceeds `capacity`.
  *
  * Mergeable (Agarwal et al., "Mergeable Summaries", PODS'12): partials
  * combine by counter addition followed by a trim back to `capacity` that
  * subtracts the (capacity+1)-th largest count — so Catalyst runs it as a
  * standard partial/final aggregate: each partition ships `capacity`
  * counters, never rows. The scale path for "top domains / top tokens /
  * top licenses over 100 TB" where exact groupBy output would itself be
  * huge.
  */
case class FrequencySketch(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k > 0 && capacity >= k, s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_freq requires a STRING column, got ${child.dataType.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("cnt", LongType))),
    containsNull = false
  )

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** Misra-Gries update: increment a tracked item, start tracking below
    * capacity, otherwise decrement all (implemented lazily at trim time via
    * the merge-style subtraction for O(1) amortized updates).
    */
  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow
  ): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String]
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None =>
        if (buf.size < capacity) buf.update(item.clone(), 1L)
        else {
          // classic MG decrement step: all counters drop by 1, zeros evicted;
          // the arriving item is absorbed by the decrement
          val dead = buf.iterator.filter(_._2 <= 1).map(_._1).toList
          buf.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(buf.remove)
        }
    }
    buf
  }

  /** Mergeable-summaries combine: add counters, then trim to `capacity` by
    * subtracting the (capacity+1)-th largest combined count.
    */
  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]
  ): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (item, c) => buf.update(item, buf.getOrElse(item, 0L) + c) }
    if (buf.size > capacity) {
      val counts = buf.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(capacity) // (capacity+1)-th largest
      val dead = buf.iterator.filter(_._2 <= cut).map(_._1).toList
      buf.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Top-k by (count desc, item asc) — the item tiebreak keeps the result
    * deterministic across partitionings.
    */
  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    implicit val utf8Ord: Ordering[UTF8String] =
      Ordering.comparatorToOrdering(java.util.Comparator.naturalOrder[UTF8String]())
    val top = buf.toArray
      .sortBy { case (item, c) => (-c, item) }
      .take(k)
    new GenericArrayData(top.map { case (item, c) =>
      new GenericInternalRow(Array[Any](item, c))
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequencySketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequencySketch =
    copy(inputAggBufferOffset = newOffset)
  override def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FrequencySketch =
    copy(child = newChildren.head)
  override def prettyName: String = "topk_freq"
}

object FrequencySketch {

  /** DataFrame API: `topk_freq(col, k, capacity)` → `array<struct<item,cnt>>`. */
  def topk_freq(c: Column, k: Int, capacity: Int): Column =
    ColumnBridge.column(
      FrequencySketch(ColumnBridge.expression(c), k, capacity).toAggregateExpression())
}
