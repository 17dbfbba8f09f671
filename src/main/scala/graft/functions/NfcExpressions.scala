package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftExpressionBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression — the encoding-
  * hygiene pass (ftfy/CLD-style cleanup stage) web corpora need before
  * any hash-keyed operator: the SAME visible text arrives composed from
  * one crawler and decomposed from another (é as U+00E9 vs e+U+0301),
  * and every fingerprint-keyed op in this engine (line/span/shingle
  * dedup, decontamination, winnowing) would treat them as different
  * bytes. Normalizing to NFC up front makes "equal text" mean equal
  * bytes corpus-wide.
  *
  * Spark ships no normalizer function, so this wraps
  * `java.text.Normalizer` (Unicode-stable: NFC of assigned codepoints
  * never changes across versions, which is also why DuckDB's
  * utf8proc-based `nfc_normalize` agrees bit-for-bit — the
  * `text_nfc_normalize` oracle row gates composition, canonical
  * reordering, singleton mapping, and Hangul jamo composition against
  * it). Map-side, no shuffle; the fast path verifies already-normalized
  * input (the overwhelming case — all-ASCII never allocates a copy). */
object NfcExpressions {
  def nfc(text: Column): Column =
    GraftExpressionBridge.column(
      NfcNormalize(GraftExpressionBridge.expression(text)))

  /** Accent folding: NFD → drop the Mark categories (Mn/Mc/Me, the
    * utf8proc STRIPMARK set — so DuckDB's `strip_accents` restates it
    * exactly, category-based, NOT combining-class-based) → NFC
    * recompose. The search-normalization form ("café" matches "cafe");
    * base letters that are not mark decompositions (ß, ł, ø) stay. */
  def stripAccents(text: Column): Column =
    GraftExpressionBridge.column(
      StripAccents(GraftExpressionBridge.expression(text)))
}

/** Static kernels, callable from generated code. */
object Nfc {
  private val FormC = java.text.Normalizer.Form.NFC
  private val FormD = java.text.Normalizer.Form.NFD

  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, FormC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, FormC))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    // ASCII has no marks and is NFD==NFC: zero-allocation fast path
    if (s.numBytes == s.numChars) return s
    val nfd = java.text.Normalizer.normalize(s.toString, FormD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, FormC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc expects string, got ${t.sql}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    Nfc.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.Nfc.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_strip_accents expects string, got ${t.sql}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_strip_accents"

  override def nullSafeEval(input: Any): Any =
    Nfc.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.Nfc.stripAccents($c);")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
