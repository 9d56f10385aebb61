package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rec(headers: Seq[(String, String)], payload: String): String = {
    val h = headers.map { case (k, v) => s"$k: $v\r\n" }.mkString
    val len = payload.getBytes(StandardCharsets.UTF_8).length
    s"WARC/1.0\r\n${h}Content-Length: $len\r\n\r\n$payload\r\n\r\n"
  }

  test("build -> parse round trip recovers every field") {
    import spark.implicits._
    val docs = Seq((7L, "hello <b>world</b>"), (8L, "")).toDF("doc_id", "text")
    val parsed = Warc.parseWarcRecords(
        Warc.buildWarc(docs, "doc_id", "text"), "warc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4),
        if (r.isNullAt(5)) -1 else r.getInt(5), r.getString(6)))
      .sortBy(t => (t._1, t._2))
    assert(parsed.length == 4)
    val (_, _, t0, u0, _, s0, b0) = parsed(0)
    assert(t0 == "warcinfo" && u0 == null && s0 == -1 && b0 == null)
    val (_, _, t1, u1, l1, s1, b1) = parsed(1)
    assert(t1 == "response" && u1 == "https://example.com/doc/7" && s1 == 200)
    assert(b1 == "<html><body>hello <b>world</b></body></html>")
    assert(l1 == Warc.HttpHead.getBytes(StandardCharsets.UTF_8).length +
      b1.getBytes(StandardCharsets.UTF_8).length)
    // the empty doc still yields a well-formed empty-body response
    assert(parsed(3)._7 == "<html><body></body></html>")
  }

  test("foreign WARC framing parses: extra headers, any order, 404s") {
    // NOT built by buildWarc: reordered headers, extra fields, a 404
    // status, and a request record the parser must pass through
    val raw =
      rec(Seq("WARC-Date" -> "2026-08-14T00:00:00Z",
          "WARC-Record-ID" -> "<urn:x:1>",
          "Content-Type" -> "application/http; msgtype=response",
          "WARC-Target-URI" -> "https://a.example/x",
          "WARC-Type" -> "response"),
        "HTTP/1.1 404 Not Found\r\nServer: z\r\n\r\ngone") +
      rec(Seq("WARC-Type" -> "request",
          "WARC-Target-URI" -> "https://a.example/x"),
        "GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n")
    val got = Warc.parseRecords(raw.getBytes(StandardCharsets.UTF_8))
    assert(got.length == 2)
    assert(got(0).warcType.contains("response") &&
      got(0).httpStatus.contains(404) && got(0).bodyText.contains("gone"))
    assert(got(1).warcType.contains("request") &&
      got(1).httpStatus.isEmpty && got(1).bodyText.isEmpty,
      "a request payload is not an HTTP response message")
  }

  test("malformed framing fails closed, keeping prior records") {
    val good = rec(Seq("WARC-Type" -> "warcinfo"), "software: x\r\n")
    // lying Content-Length pointing past the end of the buffer
    val liar = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999\r\n\r\nshort"
    val got = Warc.parseRecords((good + liar).getBytes(StandardCharsets.UTF_8))
    assert(got.length == 1 && got(0).warcType.contains("warcinfo"))
    // garbage start: no records at all
    assert(Warc.parseRecords("not a warc".getBytes).isEmpty)
    // missing Content-Length: fail closed at that record
    val noLen = "WARC/1.0\r\nWARC-Type: metadata\r\n\r\nbody\r\n\r\n"
    assert(Warc.parseRecords((good + noLen).getBytes).length == 1)
  }

  test("warc.gz: concatenated gzip members inflate; truncation keeps prefix") {
    def gzip(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes(StandardCharsets.UTF_8)); g.close()
      bo.toByteArray
    }
    // Common Crawl framing: one gzip member PER RECORD, concatenated
    val r1 = rec(Seq("WARC-Type" -> "warcinfo"), "software: x\r\n")
    val r2 = rec(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://gz.example/y"),
      "HTTP/1.1 200 OK\r\n\r\nzipped body")
    val gz = gzip(r1) ++ gzip(r2)
    val got = Warc.parseRecords(gz)
    assert(got.length == 2)
    assert(got(1).targetUri.contains("https://gz.example/y") &&
      got(1).bodyText.contains("zipped body"))
    // truncated second member: first record survives (fail closed)
    val trunc = gzip(r1) ++ gzip(r2).dropRight(7)
    val kept = Warc.parseRecords(trunc)
    assert(kept.nonEmpty && kept.head.warcType.contains("warcinfo"))
    // non-gzip input is untouched by the inflate path
    assert(Warc.parseRecords(r1.getBytes(StandardCharsets.UTF_8)).length == 1)
  }

  test("chunked transfer bodies decode; malformed chunking keeps prefix") {
    val chunked = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5\r\nhello\r\n7;ext=1\r\n, world\r\n0\r\nX-Trailer: t\r\n\r\n"
    val got = Warc.parseRecords(rec(Seq("WARC-Type" -> "response",
      "WARC-Target-URI" -> "https://c.example/z"), chunked)
      .getBytes(StandardCharsets.UTF_8))
    assert(got.length == 1 && got(0).bodyText.contains("hello, world"),
      s"got ${got.headOption.flatMap(_.bodyText)}")
    // malformed size line: keep the chunks decoded so far
    val bad = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5\r\nhello\r\nzz\r\nnope\r\n"
    val kept = Warc.parseRecords(rec(Seq("WARC-Type" -> "response"), bad)
      .getBytes(StandardCharsets.UTF_8))
    assert(kept.length == 1 && kept(0).bodyText.contains("hello"))
  }

  test("composes with HtmlOps: WARC -> http body -> extracted text") {
    import spark.implicits._
    val docs = Seq((1L, "A &amp; B")).toDF("doc_id", "text")
    val bodies = Warc.parseWarcRecords(
        Warc.buildWarc(docs, "doc_id", "text"), "warc_id", "payload")
      .filter(col("warc_type") === "response")
      .select(col("warc_id"), col("body_text"))
    val textOut = graft.text.HtmlOps.extractText(bodies, "warc_id", "body_text")
      .collect()(0)
    assert(textOut.getString(1) == "A & B")
  }
}
