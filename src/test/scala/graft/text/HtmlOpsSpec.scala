package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class HtmlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def extract(cases: (Long, String)*): Map[Long, (String, Boolean)] = {
    import spark.implicits._
    HtmlOps.extractText(cases.toDF("id", "h"), "id", "h")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getBoolean(2))).toMap
  }

  test("script/style/comment bodies vanish, block tags become lines") {
    val got = extract(
      1L -> ("<html><head><script>if (a < b) { x(); }</script>" +
        "<style>p > a { color: red }</style></head>" +
        "<body><h1>Title</h1><p>one</p><p>two</p>" +
        "<!-- hidden --><div>three</div></body></html>"),
      2L -> "<ul><li>a</li><li>b</li></ul>",
      3L -> "<p>self<br/>closing</p>",
      4L -> "already plain text",
      5L -> "",
      6L -> null)
    assert(got(1L) == ("Title\none\ntwo\nthree", true),
      "script '<' and style '>' bodies must not leak into text")
    assert(got(2L) == ("a\nb", true))
    assert(got(3L) == ("self\nclosing", true))
    assert(got(4L) == ("already plain text", false))
    assert(got(5L) == ("", false))
    assert(got(6L) == ("", false), "null html extracts to empty")
  }

  test("entity decoding: common named entities; &amp; decodes last") {
    val got = extract(
      1L -> "<p>a &lt;b&gt; &quot;c&quot; it&#39;s d&nbsp;e &amp; f</p>",
      // double-encoded markup must become the LITERAL entity text,
      // never a live tag: &amp;lt;script&amp;gt; -> "&lt;script&gt;"
      2L -> "<p>&amp;lt;script&amp;gt;</p>",
      3L -> "<p>x &#12345; y</p>") // numeric refs pass through (documented)
    assert(got(1L)._1 == "a <b> \"c\" it's d e & f")
    assert(got(2L)._1 == "&lt;script&gt;")
    assert(got(3L)._1 == "x &#12345; y")
  }

  test("attributed and uppercase tags strip; whitespace collapses") {
    val got = extract(
      1L -> "<P CLASS=\"x\">A</P>\n\n\n\n<DIV data-k=\"v > w\">B</DIV>",
      2L -> "<span style=\"a\">in  line</span>   text\t tabs",
      3L -> "<p>  padded  </p><p>  lines  </p>")
    // note: the DIV's quoted '>' ends the tag match early ([^>]+ is
    // attribute-quote-blind) leaving ' w\">' as text — the documented
    // regex-not-DOM boundary; the mainstream attribute shapes parse
    assert(got(1L)._1.startsWith("A"))
    assert(got(2L)._1 == "in line text tabs")
    assert(got(3L)._1 == "padded\nlines")
  }

  test("extractMainText keeps long link-sparse blocks, drops boilerplate") {
    import spark.implicits._
    val article = "This is the real article body with enough characters " +
      "to clear the floor and it cites <a href=\"/r\">one reference</a> only."
    val page =
      "<html><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/b\">Blog</a> <a href=\"/c\">Contact us</a></nav>" +
        s"<p>$article</p>" +
        "<aside><a href=\"/1\">First related link</a> <a href=\"/2\">Second related link</a></aside>" +
        "<footer>short footer</footer>" +
      "</body></html>"
    val got = HtmlOps.extractMainText(
        Seq((1L, page), (2L, "<div><a href=\"/x\">all link soup in this whole block of text</a></div>"),
          (3L, null.asInstanceOf[String])).toDF("id", "h"), "id", "h")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val (txt1, blocks1, kept1) = got(1L)
    assert(blocks1 == 4L && kept1 == 1L,
      s"nav/aside/footer must drop, article must survive: $got")
    assert(txt1.startsWith("This is the real article body"))
    assert(txt1.contains("one reference"), "inline anchor TEXT is content")
    assert(!txt1.contains("Home") && !txt1.contains("related link") &&
      !txt1.contains("short footer"))
    // a long but fully-link block fails the density gate
    val (txt2, blocks2, kept2) = got(2L)
    assert(blocks2 == 1L && kept2 == 0L && txt2 == "")
    // null input: zero blocks, empty main text
    assert(got(3L) == (("", 0L, 0L)))
  }

  test("extractMainText decodes entities in kept blocks only at the end") {
    import spark.implicits._
    val got = HtmlOps.extractMainText(
      Seq((1L, "<p>salt &amp; pepper, fish &amp;amp; chips, plus filler " +
        "to get past the length floor</p>")).toDF("id", "h"), "id", "h")
      .collect().head.getString(1)
    assert(got.contains("salt & pepper"))
    assert(got.contains("fish &amp; chips"), "&amp; must decode exactly once")
  }

  test("composes with NormalizeOps and lineFilter downstream") {
    import spark.implicits._
    val html = Seq((1L,
      "<body><p>“Smart” quotes…</p><p>ok line here</p></body>"))
      .toDF("id", "h")
    val text = HtmlOps.extractText(html, "id", "h")
      .select(col("id"), col("text_html").as("t"))
    val norm = NormalizeOps.normalizeText(text, "id", "t")
    assert(norm.collect()(0).getString(1) == "\"Smart\" quotes...\nok line here")
  }
}
