package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Text-canonicalization helpers shared by the interpreted and generated
 * code paths. A top-level object with no companion class, so Scala emits
 * STATIC forwarders — the generated Java calls
 * `graft.expr.NormalizeTextUtil.normalize(x)` directly, no MODULE$
 * plumbing inside the codegen template.
 */
object NormalizeTextUtil {

  /** C0/C1-ish controls we strip: everything below 0x20 except \t \n \r,
    * plus DEL. Kept chars then feed the whitespace collapse. */
  @inline private def isStrippedControl(c: Char): Boolean =
    (c < 0x20 && c != '\t' && c != '\n' && c != '\r') || c == 0x7f

  @inline private def isCollapsedSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /**
   * Canonical text form for fingerprinting/dedup keys:
   * NFC → strip controls ([\x00-\x08\x0B\x0C\x0E-\x1F\x7F]) → collapse
   * every [ \t\n\r]+ run to ONE space → trim. One char pass after the
   * (skipped-when-already-normalized) NFC step; no regex in the hot path.
   * Unicode spaces beyond ASCII (NBSP etc.) are deliberately NOT collapsed
   * — both engines' `\s` classes exclude them, keeping the oracle exact.
   */
  def normalize(s: UTF8String): UTF8String = {
    val raw = s.toString
    val nfc =
      if (Normalizer.isNormalized(raw, Normalizer.Form.NFC)) raw
      else Normalizer.normalize(raw, Normalizer.Form.NFC)
    val n = nfc.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = nfc.charAt(i)
      if (isStrippedControl(c)) ()
      else if (isCollapsedSpace(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /**
   * Accent folding for search/matching keys: NFD, then drop combining
   * marks (Unicode category Mn), then NFC re-compose of what remains —
   * é→e, ü→u, ñ→n; characters with no decomposition pass through.
   */
  def stripAccents(s: UTF8String): UTF8String = {
    val raw = s.toString
    val nfd = Normalizer.normalize(raw, Normalizer.Form.NFD)
    val n = nfd.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}

/**
 * `norm_text(string) -> string` — the canonical-text expression behind
 * exact-dedup fingerprints and quality heuristics (NFC + control strip +
 * whitespace collapse + trim; exact contract in
 * [[NormalizeTextUtil.normalize]]). A native expression with codegen:
 * the normalization runs inside the WholeStageCodegen span of the scan
 * that feeds it, never through UDF boxing — at 100 TB this sits on every
 * document of every dedup/quality pass. Null in → null out.
 */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"norm_text expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "norm_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeTextUtil.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NormalizeTextUtil.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/**
 * `strip_accents(string) -> string` — NFD + drop combining marks + NFC
 * (contract in [[NormalizeTextUtil.stripAccents]]); the match-key fold for
 * entity resolution and search. Codegen'd like [[NormalizeText]].
 */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeTextUtil.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NormalizeTextUtil.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
