package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
