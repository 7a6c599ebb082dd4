package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Shared helper for the interpreted and generated paths (top-level object
 * with no companion class ⇒ Scala emits STATIC forwarders — see
 * [[NormalizeTextUtil]]).
 */
object CharGramsUtil {

  /**
   * Every sliding window of `k` characters (Unicode code points — the same
   * unit Spark's `substring` counts) over `s`, in position order:
   * exactly `transform(sequence(1, length(s)-k+1), i -> substring(s, i, k))`
   * for `length(s) >= k`, computed in ONE pass over the bytes. The builtin
   * shape re-scans the string from byte 0 on every `substring(s, i, k)`
   * call to find code point `i` — O(len²) byte work per document, the
   * measured hot spot of the gram-emission dedup family (round-18). Here
   * the code-point byte offsets are walked once and every gram is a
   * zero-copy slice of the shared byte array (`UTF8String.fromBytes` with
   * offset) — O(len) walk, O(len·k/slice-header) bytes.
   *
   * Strings shorter than `k` produce an EMPTY array (the builtin shape is
   * only ever evaluated behind a `length(text) >= k` filter — this
   * expression keeps that contract explicit instead of inheriting
   * `sequence(1, n<1)`'s descending-range surprise).
   */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // one pass: byte offset of every code point start, plus the end
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      nChars += 1
    }
    val n = nChars - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    if (nBytes == nChars) {
      // ASCII fast path: char index == byte index
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        out(j) = UTF8String.fromBytes(bytes, j, k)
        j += 1
      }
      new GenericArrayData(out)
    } else {
      val offs = new Array[Int](nChars + 1)
      var c = 0
      i = 0
      while (i < nBytes) {
        offs(c) = i
        i += UTF8String.numBytesForFirstByte(bytes(i))
        c += 1
      }
      offs(nChars) = nBytes
      val out = new Array[Any](n)
      var j = 0
      while (j < n) {
        out(j) = UTF8String.fromBytes(bytes, offs(j), offs(j + k) - offs(j))
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}

/**
 * `char_grams(string, k) -> array<string>` — all sliding `k`-code-point
 * windows of a text, one linear pass (contract and the O(len²)→O(len)
 * rationale in [[CharGramsUtil.compute]]). A native expression with
 * codegen: gram emission sits on every document of the winnowing /
 * exact-substring dedup family, inside the scan's WholeStageCodegen span.
 * Null in → null out. `k` is a plan-time constant (≥ 1).
 */
case class CharGrams(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"char_grams needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_grams expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_grams"

  override protected def nullSafeEval(input: Any): Any =
    CharGramsUtil.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.CharGramsUtil.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object CharGrams {
  /** Column surface: `CharGrams(col("text"), 20)`. */
  def apply(c: Column, k: Int): Column =
    Shims.column(new CharGrams(Shims.expression(c), k))
}
