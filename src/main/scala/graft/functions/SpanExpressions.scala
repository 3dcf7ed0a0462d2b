package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Map-side island discovery for exact-substring span dedup
  * ([[graft.ops.Spans]]).
  *
  * Input: the per-document array of k-span hashes (`ws(i)` = hash of the
  * k-token window starting at position i+1). With the global hot-span key
  * set (spans seen in ≥ 2 distinct documents) broadcast as a sorted long
  * array, the duplicated start positions AND their interval union (islands)
  * are computable entirely inside the row — a 300-token verbatim quote
  * leaves this expression as ONE (s, e) run, not 300−k+1 start positions
  * riding a per-doc window exchange. This replaces the explode → broadcast
  * semi join → window(partitionBy doc) pipeline of the fixed-k path with
  * zero post-aggregation shuffle: the only exchanges left in the whole op
  * are the two hot-key aggregates.
  *
  * Island rule (identical to [[graft.ops.Spans.removeDupSpans]]): a
  * duplicated start p opens interval [p, p+k−1] (unclipped; the doc-end
  * clip happens downstream where n_tokens is in hand); a new island begins
  * when the next duplicated start leaves ≥ 1 uncovered token, i.e.
  * start > prevMaxStart + k.
  *
  * The hot set rides a Spark BROADCAST (not a closure/reference literal):
  * the generated code re-reads `bc.value()` so the task binary carries only
  * the broadcast handle, and every task on an executor shares one array.
  */
case class SpanRunsExpr(
    child: Expression,
    hotBc: Broadcast[Array[Long]],
    k: Int
) extends UnaryExpression {
  override def prettyName: String = "span_runs"

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("s", LongType, nullable = false),
      StructField("e", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_runs expects array<long> span hashes, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    SpanRunsExpr.findRuns(v.asInstanceOf[ArrayData], hotBc.value, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one static call keeps whole-stage codegen alive; the loop lives in a
    // plain JVM method (same shape the JIT compiles either way)
    val bcRef = ctx.addReferenceObj("hotBc", hotBc, classOf[Broadcast[Array[Long]]].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.SpanRunsExpr.findRuns(
         |  $a, (long[]) $bcRef.value(), $k);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SpanRunsExpr {

  /** Binary search membership in a sorted long array. */
  def contains(sorted: Array[Long], w: Long): Boolean = {
    var lo = 0
    var hi = sorted.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = sorted(mid)
      if (v == w) return true
      if (v < w) lo = mid + 1 else hi = mid - 1
    }
    false
  }

  /** Merged islands of duplicated starts: array of struct(s, e) rows.
    * Null entries are positions excluded up front (anchor sampling) — never
    * members, but they keep the index↔position alignment.
    */
  def findRuns(ws: ArrayData, hot: Array[Long], k: Int): ArrayData = {
    val n = ws.numElements()
    var buf: java.util.ArrayList[InternalRow] = null
    var runS = -1L
    var runMaxStart = -1L
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i) && contains(hot, ws.getLong(i))) {
        val p = i + 1L
        if (runS < 0) { runS = p; runMaxStart = p }
        else if (p > runMaxStart + k) { // gap: close the island
          if (buf == null) buf = new java.util.ArrayList[InternalRow](4)
          buf.add(InternalRow(runS, runMaxStart + (k - 1)))
          runS = p; runMaxStart = p
        } else runMaxStart = p
      }
      i += 1
    }
    if (runS >= 0) {
      if (buf == null) buf = new java.util.ArrayList[InternalRow](1)
      buf.add(InternalRow(runS, runMaxStart + (k - 1)))
    }
    if (buf == null) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(buf.toArray)
  }
}
