package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy min-rank BPE segmentation of a token column (SURVEY §2 D4+): the
  * learned merge table rides into codegen as a reference object and every
  * row segments independently — map-only, no shuffle, whole-stage codegen
  * unbroken (the generated code calls one JVM method on the reference; the
  * work is inherent string manipulation, not expression-tree overhead).
  * Returns array<string> of subword units; null in, null out.
  */
case class BpeEncodeExpr(
    child: Expression,
    pairsA: Array[String],
    pairsB: Array[String],
    endMarker: Boolean
) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(pairsA.length == pairsB.length, "merge pair arrays must align")

  override def prettyName: String = "bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode expects string, got $other")
    }

  @transient private lazy val ranks: Map[(String, String), Int] =
    pairsA.indices.map(i => (pairsA(i), pairsB(i)) -> i).toMap

  /** Called from both eval and the generated code. */
  def encodeUtf8(tok: UTF8String): GenericArrayData = {
    val syms = graft.ops.Bpe.encodeWord(tok.toString, ranks, endMarker)
    new GenericArrayData(syms.map(UTF8String.fromString(_)).toArray[Any])
  }

  override def nullSafeEval(v: Any): Any = encodeUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", this, classOf[BpeEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encodeUtf8($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
