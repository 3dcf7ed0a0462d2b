package graft.functions

import graft.functions.ProtoWire._

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** `proto_struct(binary)` — decode a protobuf wire-format message to a
  * typed struct per a plan-time field spec (the compiled-proto analog).
  * Single pass over the bytes, unknown fields skipped, last-wins for
  * repeated scalars (proto3 semantics), absent fields null.
  *
  * Decode produces an InternalRow, so codegen falls back to eval — fine off
  * the relational hot path; the expensive part (container scan + split
  * planning) stays in the columnar reader.
  */
case class ProtoStructExpr(child: Expression, spec: String)
    extends UnaryExpression
    with CodegenFallback {

  @transient private lazy val fields: Seq[Field] = parseSpec(spec)
  @transient private lazy val byNo: Map[Int, (Int, Field)] =
    fields.zipWithIndex.map { case (f, i) => f.no -> (i, f) }.toMap

  override def prettyName: String = "proto_struct"

  override def dataType: DataType = StructType(parseSpec(spec).map { f =>
    val dt = f.kind match {
      case KLong      => LongType
      case KInt       => IntegerType
      case KBool      => BooleanType
      case KString    => StringType
      case KBytes     => BinaryType
      case KDouble    => DoubleType
      case KFloat     => FloatType
      case KRepString => ArrayType(StringType)
      case KRepLong   => ArrayType(LongType)
      case KRepBytes  => ArrayType(BinaryType)
    }
    StructField(f.name, dt, nullable = true)
  })

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"proto_struct expects binary input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val r = new Reader(input.asInstanceOf[Array[Byte]])
    val out = new Array[Any](fields.length)
    val reps = new Array[ArrayBuffer[Any]](fields.length)
    while (r.hasMore) {
      val k = r.readVarint()
      val no = (k >>> 3).toInt
      val wt = (k & 7).toInt
      byNo.get(no) match {
        case None => r.skip(wt)
        // wire-type mismatch (schema drift / wrong spec): skip by the ACTUAL
        // wire type — decoding by the expected kind would desynchronize the
        // rest of the message. Exception: repeated varints also accept wire
        // type 2 (proto3's default PACKED encoding).
        case Some((_, f)) if wt != ProtoWire.wireTypeOf(f.kind) &&
            !(f.kind == KRepLong && wt == 2) => r.skip(wt)
        case Some((i, f)) =>
          f.kind match {
            case KLong   => out(i) = r.readVarint()
            case KInt    => out(i) = r.readVarint().toInt
            case KBool   => out(i) = r.readVarint() != 0L
            case KDouble => out(i) = java.lang.Double.longBitsToDouble(r.readFixed64())
            case KFloat  => out(i) = java.lang.Float.intBitsToFloat(r.readFixed32())
            case KString =>
              val (off, len) = r.readDelimited()
              out(i) = UTF8String.fromBytes(r.bytes, off, len)
            case KBytes =>
              val (off, len) = r.readDelimited()
              out(i) = java.util.Arrays.copyOfRange(r.bytes, off, off + len)
            case KRepString =>
              val (off, len) = r.readDelimited()
              if (reps(i) == null) reps(i) = new ArrayBuffer[Any](4)
              reps(i) += UTF8String.fromBytes(r.bytes, off, len)
            case KRepBytes =>
              val (off, len) = r.readDelimited()
              if (reps(i) == null) reps(i) = new ArrayBuffer[Any](4)
              reps(i) += java.util.Arrays.copyOfRange(r.bytes, off, off + len)
            case KRepLong =>
              if (reps(i) == null) reps(i) = new ArrayBuffer[Any](4)
              if (wt == 2) {
                // packed run: a bounded sub-reader over the delimited window
                // (concatenates with any unpacked occurrences, per spec)
                val (off, len) = r.readDelimited()
                val sub = new Reader(r.bytes, off, off + len)
                while (sub.hasMore) reps(i) += sub.readVarint()
              } else reps(i) += r.readVarint()
          }
      }
    }
    var i = 0
    while (i < fields.length) {
      if (reps(i) != null) out(i) = new GenericArrayData(reps(i).toArray)
      i += 1
    }
    InternalRow.fromSeq(out.toIndexedSeq)
  }

  override protected def withNewChildInternal(newChild: Expression): ProtoStructExpr =
    copy(child = newChild)
}

object ProtoFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Decode a protobuf wire-format binary column to a struct column. */
  def proto_struct(bin: Column, spec: String): Column =
    column(ProtoStructExpr(expression(bin), spec))
}
