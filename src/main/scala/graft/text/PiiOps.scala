package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction over a text column — the standard
  * pre-training hygiene pass (BigScience/ROOTS-style rule-based PII):
  * match well-formed emails, IPv4 addresses, SSNs, E.164 phone numbers
  * and PAN-length digit runs, count them, and replace each with a
  * category placeholder.
  *
  * Engine shape: one narrow regexp cascade per document — no shuffle,
  * no UDF, whole-stage codegen'd `regexp_count`/`regexp_replace`. At
  * 100 TB this is a pure map stage that scales with executors.
  *
  * The patterns are deliberately dialect-portable (ASCII classes,
  * `\b`, non-capturing quantifiers only — no lookarounds, no
  * backrefs) so the SAME strings run under Java regex (Spark) and
  * RE2 (DuckDB/the oracle) with identical semantics — the discipline
  * [[UrlOps.TrackingParamPattern]] and the BPE pretokenizer follow.
  */
object PiiOps {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  /** E.164-style: '+' then 7-15 digits. */
  val PhonePattern = "\\+[0-9]{7,15}\\b"
  /** Unpunctuated PAN-length digit run (13-16 digits). */
  val CardPattern = "\\b[0-9]{13,16}\\b"

  /** (category, pattern, placeholder) stages in redaction order. The
    * order is load-bearing: each stage counts and replaces on the text
    * as redacted so far, so overlapping matchers (a 13-digit E.164
    * phone is also a PAN-length digit run) attribute each span to
    * exactly one category — the earliest stage that claims it. */
  val Stages: Seq[(String, String, String)] = Seq(
    ("email", EmailPattern, "[EMAIL]"),
    ("ip", Ipv4Pattern, "[IP]"),
    ("ssn", SsnPattern, "[SSN]"),
    ("phone", PhonePattern, "[PHONE]"),
    ("card", CardPattern, "[CARD]"))

  /** Adds per-category match counts (`n_email`, `n_ip`, `n_ssn`,
    * `n_phone`, `n_card`), their total `n_pii`, and the
    * placeholder-redacted text (`text_redacted`). Placeholders contain
    * no digits, so later stages can never re-match an earlier stage's
    * replacement. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val start: Column = coalesce(col(textCol), lit(""))
    val (redacted, counts) =
      Stages.foldLeft((start, Seq.empty[(String, Column)])) {
        case ((cur, acc), (name, pat, rep)) =>
          val n = regexp_count(cur, lit(pat)).cast("long")
          (regexp_replace(cur, pat, rep), acc :+ (name -> n))
      }
    df.select(
      (col(idCol) +: counts.map { case (n, c) => c.as(s"n_$n") }) :+
        counts.map(_._2).reduce(_ + _).as("n_pii") :+
        redacted.as("text_redacted"): _*)
  }
}
