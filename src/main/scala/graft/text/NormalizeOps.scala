package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode/whitespace text normalization — the C4/CCNet-style cleanup
  * pass that runs BEFORE tokenization, dedup and quality scoring so
  * cosmetically-different bytes ("curly" quotes, NBSP, CRLF, control
  * chars, run-on blank lines) can't split otherwise-identical
  * documents across dedup buckets or skew token statistics.
  *
  * Engine shape: one narrow regexp cascade per document (same shape as
  * [[PiiOps.redactPii]]) — no shuffle, no UDF, scales with executors.
  * Patterns are dialect-portable (literal unicode chars + \x hex
  * classes, no lookarounds) so the SAME strings drive Java regex and
  * the RE2 oracle; the stage list is the single source for both (the
  * [[PiiOps.Stages]] discipline).
  */
object NormalizeOps {

  /** (name, pattern, replacement) stages in application order. Order is
    * load-bearing: CRLF folds before blank-line collapsing sees the
    * \n runs, control-strip runs before whitespace collapsing so a
    * stripped char can't bridge two space runs into one. */
  val Stages: Seq[(String, String, String)] = Seq(
    ("crlf", "\r\n?", "\n"),
    ("ctrl", "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
    ("squote", "[‘’]", "'"),
    ("dquote", "[“”„]", "\""),
    ("nbsp", " ", " "),
    ("dash", "[–—]", "-"),
    ("ellipsis", "…", "..."),
    ("hspace", "[ \\t]+", " "),
    ("newlines", "\n{3,}", "\n\n"))

  /** True Unicode normalization (java.text.Normalizer) of a string
    * column — the combining-mark/compatibility pass the regex cascade
    * above cannot express: decomposed `e` + U+0301 composes to é under
    * every form, and NFKC/NFKD additionally fold compatibility
    * characters (ﬁ → fi, fullwidth Ａ → A, ① → 1, ² → 2). Run this
    * BEFORE [[normalizeText]] so byte-different but canonically-equal
    * documents land in the same dedup buckets.
    *
    * A codegen'd per-row kernel (same shape as
    * [[graft.text.TextKernels]]): `isNormalized` fast-path skips the
    * realloc for already-normal text, which is nearly all of a real
    * web corpus. No SQL mirror exists (DuckDB has no NFC function), so
    * the oracle row (t83) pins the semantics by CONSTRUCTION: planted
    * combining-mark/compatibility fixtures whose normal forms are
    * known codepoint sequences the oracle rebuilds literally. */
  def unicodeNormalized(c: Column, form: String = "NFKC"): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(c), form))

  /** Adds `text_uni` (the `form`-normalized text) and `changed`
    * (whether normalization altered any codepoint). Null text
    * normalizes to the empty string, matching [[normalizeText]]'s
    * null contract. Idempotent by the Unicode stability guarantee
    * (proven in spec). */
  def unicodeNormalize(df: DataFrame, idCol: String, textCol: String,
      form: String = "NFKC"): DataFrame = {
    val start = coalesce(col(textCol), lit(""))
    val norm = unicodeNormalized(start, form)
    df.select(col(idCol), norm.as("text_uni"),
      (norm =!= start).as("changed"))
  }

  /** Adds `text_norm` (the normalized, trimmed text) and `changed`
    * (whether any stage fired). Idempotent: normalizing normalized
    * text is the identity (proven in spec). */
  def normalizeText(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val start: Column = coalesce(col(textCol), lit(""))
    val cleaned = Stages.foldLeft(start) { case (cur, (_, pat, rep)) =>
      regexp_replace(cur, pat, rep)
    }
    df.select(col(idCol), trim(cleaned).as("text_norm"),
      (trim(cleaned) =!= start).as("changed"))
  }

  /** Static kernel behind [[UnicodeNormalize]]. formId is the ordinal
    * of [[UnicodeNormalize.Forms]] — an int so the codegen call site
    * stays a compile-time literal. */
  def normalizeKernel(s: UTF8String, formId: Int): UTF8String = {
    val form = UnicodeNormalize.Forms(formId)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

/** Codegen'd `java.text.Normalizer` normalization of a string column.
  * `form` is one of NFC / NFD / NFKC / NFKD. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  private val formId: Int = UnicodeNormalize.FormNames.indexOf(form)
  require(formId >= 0,
    s"unknown normalization form '$form' (want NFC|NFD|NFKC|NFKD)")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"UnicodeNormalize requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    NormalizeOps.normalizeKernel(input.asInstanceOf[UTF8String], formId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.text.NormalizeOps.normalizeKernel($c, $formId)")
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val FormNames: Seq[String] = Seq("NFC", "NFD", "NFKC", "NFKD")
  val Forms: Array[java.text.Normalizer.Form] = Array(
    java.text.Normalizer.Form.NFC, java.text.Normalizer.Form.NFD,
    java.text.Normalizer.Form.NFKC, java.text.Normalizer.Form.NFKD)
}
