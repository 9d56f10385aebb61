package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML -> text extraction — the first stage of a crawl-derived
  * training-data pipeline (C4/CCNet start from markup, not clean
  * text): drop non-content blocks (comments, script, style), convert
  * block-level tags to line structure, strip the remaining markup,
  * decode the high-frequency entities, and collapse the whitespace
  * the markup left behind.
  *
  * Engine shape: one narrow regexp cascade per document (the
  * [[NormalizeOps]] / [[PiiOps]] discipline) — no shuffle, no UDF, no
  * DOM allocation; scales with executors. The stage list is the
  * single pattern source for Spark AND the DuckDB oracle, and every
  * pattern keeps to the Java-regex/RE2 common dialect (inline (?is)
  * flags, lazy quantifiers, ASCII \b — no lookarounds, no
  * backreferences).
  *
  * Honest boundary (documented, like the media codecs): this is
  * tag-structural extraction, not boilerplate REMOVAL — nav bars and
  * footers survive as text lines (trafilatura-class content scoring
  * needs a DOM and is out of regex reach), and entity decoding covers
  * the named entities that dominate real markup plus the apostrophe
  * reference; arbitrary numeric character references pass through
  * unchanged. Pipe the output through [[NormalizeOps]] +
  * [[TextOps.lineFilter]] for the C4-style line-level cleanup. */
object HtmlOps {

  /** (name, pattern, replacement) in application order. Order is
    * load-bearing: comments/script/style must vanish BEFORE tag
    * stripping (their bodies are not content); block tags become
    * newlines before the generic strip so paragraph structure
    * survives; `&amp;` decodes LAST so `&amp;lt;` becomes the literal
    * text `&lt;` instead of double-decoding to `<`. */
  val Stages: Seq[(String, String, String)] = Seq(
    ("comment", "(?s)<!--.*?-->", ""),
    ("script", "(?is)<script\\b[^>]*>.*?</script>", ""),
    ("style", "(?is)<style\\b[^>]*>.*?</style>", ""),
    ("block", "(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|th|td|blockquote|section|article|header|footer)\\b[^>]*/?>", "\n"),
    ("tag", "<[^>]+>", ""),
    ("lt", "&lt;", "<"),
    ("gt", "&gt;", ">"),
    ("quot", "&quot;", "\""),
    ("apos", "&(?:apos|#39);", "'"),
    ("nbsp", "&nbsp;", " "),
    ("amp", "&amp;", "&"),
    ("hspace", "[ \\t]+", " "),
    // two passes, not one alternation: replacement text is never
    // rescanned, so "a \n b" under a single "\n +| +\n" rule would
    // keep its leading space — splitting the rule makes both sides
    // deterministic in one application each
    ("lineltrim", "[ ]+\n", "\n"),
    ("linertrim", "\n[ ]+", "\n"),
    // line-oriented output: every block boundary is ONE line break
    // (adjacent close+open tags would otherwise leave \n\n between
    // every block), and boundary newlines strip so the final trim
    // (space-only in both engines) yields clean text
    ("newlines", "\n{2,}", "\n"),
    ("lead", "^\n+", ""),
    ("tail", "\n+$", ""))

  /** Adds `text_html` (the extracted text, trimmed) and `changed`
    * (whether any stage fired — false means the input was already
    * plain text). Null input extracts to the empty string. */
  def extractText(df: DataFrame, idCol: String,
      htmlCol: String): DataFrame = {
    val start: Column = coalesce(col(htmlCol), lit(""))
    val cleaned = Stages.foldLeft(start) { case (cur, (_, pat, rep)) =>
      regexp_replace(cur, pat, rep)
    }
    df.select(col(idCol), trim(cleaned).as("text_html"),
      (trim(cleaned) =!= start).as("changed"))
  }

  /** Block boundary tags for [[extractMainText]]'s segmentation —
    * [[Stages]]' block alternation plus the structural containers
    * (nav/aside/main/body/html), since main-content scoring wants a
    * boundary at every DOM sectioning element. */
  val BlockBoundaryPattern: String =
    "(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|th|td|blockquote|" +
      "section|article|header|footer|nav|aside|main|body|html)\\b[^>]*/?>"

  /** Anchor elements, inner text as group 1 — the link-density
    * numerator. Lazy quantifier + inline flags only (RE2-safe). */
  val AnchorPattern: String = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** Entity-decode suffix of [[Stages]] (order preserved: `&amp;`
    * last so `&amp;lt;` yields literal "&lt;"). Public so the oracle
    * mirror interpolates the SAME pattern list. */
  val EntityStages: Seq[(String, String, String)] =
    Stages.filter(s => Set("lt", "gt", "quot", "apos", "nbsp", "amp")(s._1))

  /** Main-content extraction — the boilerplate-REMOVING upgrade of
    * [[extractText]] (trafilatura's core heuristic, DOM-free): split
    * the page into blocks at sectioning-tag boundaries, score each
    * block by text length and LINK DENSITY (chars of anchor text /
    * chars of block text — navigation, footers and related-links rails
    * are short and link-saturated; article bodies are long and link-
    * sparse), and keep only blocks with `len >= minChars` and
    * `linkChars <= maxLinkDensity * len`. Returns (idCol, text_main,
    * n_blocks, n_kept) with kept blocks entity-decoded and joined by
    * blank lines.
    *
    * Still one narrow per-row expression cascade — block splitting and
    * scoring are array HOFs over the row's own markup, no DOM, no
    * shuffle, no UDF; every regex keeps to the Java/RE2 common dialect
    * so the DuckDB mirror replays the scoring bit-for-bit. The honest
    * boundary shrinks to: no per-node DOM walk, so scoring granularity
    * is the sectioning-tag block, not arbitrary subtrees. */
  def extractMainText(df: DataFrame, idCol: String, htmlCol: String,
      minChars: Int = 25, maxLinkDensity: Double = 0.4): DataFrame = {
    require(minChars >= 0 && maxLinkDensity >= 0,
      s"need minChars/maxLinkDensity >= 0, got $minChars/$maxLinkDensity")
    val pre = Stages.take(3).foldLeft(coalesce(col(htmlCol), lit(""))) {
      case (cur, (_, pat, rep)) => regexp_replace(cur, pat, rep)
    }
    val blocks = split(regexp_replace(pre, BlockBoundaryPattern, "\u0001"),
      "\u0001")
    def ws(c: Column): Column =
      trim(regexp_replace(c, "[ \\t\\r\\n]+", " "))
    val scored = transform(blocks, b => {
      val text = ws(regexp_replace(b, "<[^>]+>", ""))
      val linkTxt = ws(regexp_replace(
        concat_ws(" ", regexp_extract_all(b, lit(AnchorPattern), lit(1))),
        "<[^>]+>", ""))
      struct(text.as("t"), length(text).as("len"),
        length(linkTxt).as("lc"))
    })
    val nonEmpty = filter(scored, s => s.getField("len") > 0)
    val kept = filter(nonEmpty, s =>
      s.getField("len") >= minChars &&
        s.getField("lc").cast("double") <=
          lit(maxLinkDensity) * s.getField("len"))
    val joined = array_join(transform(kept, s => s.getField("t")), "\n\n")
    val decoded = EntityStages.foldLeft(joined) {
      case (cur, (_, pat, rep)) => regexp_replace(cur, pat, rep)
    }
    df.select(col(idCol), decoded.as("text_main"),
      size(nonEmpty).cast("long").as("n_blocks"),
      size(kept).cast("long").as("n_kept"))
  }
}
