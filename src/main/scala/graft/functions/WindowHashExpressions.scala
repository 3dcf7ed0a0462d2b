package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** xxhash64 of every space-joined `k`-token window of a token array — the
  * fused twin of the repo's window-hash idiom
  *
  * {{{
  *   when(size(toks) < k, array(xxhash64(concat_ws(" ", toks))))
  *     .otherwise(transform(sequence(1, size(toks) - (k - 1)),
  *       i => xxhash64(concat_ws(" ", slice(toks, i, lit(k))))))
  * }}}
  *
  * which is the hot loop of span postings (k = 8), span hash arrays, and
  * 3-gram shingle postings: per WINDOW it allocates a k-element slice array
  * plus a joined UTF8String before hashing it, i.e. O(tokens × k) bytes of
  * garbage per document.
  *
  * This expression joins the tokens ONCE per row into a scratch buffer with
  * single-space separators and hashes each window as a contiguous slice of
  * that buffer — zero per-window allocation. Bit identity with the column
  * formulation: the joined document bytes between the start of token i and
  * the end of token i+k−1 are exactly `concat_ws(" ", slice(toks, i, k))`,
  * and the hash is the same `XXH64.hashUnsafeBytes(…, seed = 42)` Spark's
  * `xxhash64` applies to a string column (asserted in HashExprSpec).
  * The short-document convention (< k tokens ⇒ one whole-text window,
  * including 0 tokens ⇒ hash of "") is preserved. Null ELEMENTS take a slow
  * path replicating concat_ws's skip-nulls semantics (tokenizers here never
  * produce them; correctness is kept anyway); a null ARRAY is null.
  */
case class TokenWindowHashExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"window length must be positive, got $k")

  override def prettyName: String = "token_window_hash"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"token_window_hash expects array<string> tokens, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    TokenWindowHashExpr.hashWindows(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.TokenWindowHashExpr.hashWindows($a, $k);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenWindowHashExpr {
  private val Seed = 42L // Spark's xxhash64 seed

  def hashWindows(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    var hasNull = false
    var total = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) hasNull = true
      else total += toks.getUTF8String(i).numBytes()
      i += 1
    }
    if (hasNull) return slowPath(toks, k)
    val sepCount = math.max(0, n - 1)
    val bufLen = total + sepCount
    if (bufLen > Int.MaxValue - 16)
      throw new IllegalArgumentException(s"token window join overflows a byte buffer ($bufLen)")
    val buf = new Array[Byte](bufLen.toInt)
    // starts(i) = offset of token i in the joined buffer; starts(n) = len + 1
    // so that window end = starts(i + k) - 1 uniformly (one virtual trailing
    // separator past the end)
    val starts = new Array[Int](n + 1)
    var o = 0
    i = 0
    while (i < n) {
      starts(i) = o
      val s = toks.getUTF8String(i)
      val len = s.numBytes()
      s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + o)
      o += len
      if (i < n - 1) { buf(o) = ' '; o += 1 }
      i += 1
    }
    starts(n) = bufLen.toInt + 1
    if (n < k) {
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, bufLen.toInt, Seed)
      return new GenericArrayData(Array[Any](h))
    }
    val m = n - k + 1
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      val s = starts(i)
      val e = starts(i + k) - 1
      out(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET + s, e - s, Seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Null elements present: replicate concat_ws semantics (nulls skipped
    * together with their separator) window by window.
    */
  private def slowPath(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    def joinHash(from: Int, until: Int): Long = {
      var len = 0
      var cnt = 0
      var i = from
      while (i < until) {
        if (!toks.isNullAt(i)) { len += toks.getUTF8String(i).numBytes(); cnt += 1 }
        i += 1
      }
      val buf = new Array[Byte](len + math.max(0, cnt - 1))
      var o = 0
      var emitted = 0
      i = from
      while (i < until) {
        if (!toks.isNullAt(i)) {
          if (emitted > 0) { buf(o) = ' '; o += 1 }
          val s = toks.getUTF8String(i)
          s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + o)
          o += s.numBytes()
          emitted += 1
        }
        i += 1
      }
      XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, buf.length, Seed)
    }
    if (n < k) return new GenericArrayData(Array[Any](joinHash(0, n)))
    val m = n - k + 1
    val out = new Array[Long](m)
    var i = 0
    while (i < m) { out(i) = joinHash(i, i + k); i += 1 }
    new GenericArrayData(out)
  }
}
