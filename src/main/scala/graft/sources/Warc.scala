package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) — the container Common Crawl and
  * every crawl-derived corpus actually ship: length-prefixed records
  * (`WARC/1.0` + headers + `Content-Length` octets of payload),
  * response records wrapping raw HTTP messages whose bodies are the
  * HTML that [[graft.text.HtmlOps]] extracts.
  *
  * Same architecture as the [[graft.multimodal.Media]] containers:
  * [[buildWarc]] emits a structurally valid file per document from a
  * deterministic construction rule, [[parseWarcRecords]] is a real
  * pure-JVM record walk (header block scan + Content-Length-delimited
  * payload slices + HTTP status/header/body split — byte-offset
  * arithmetic, not regex over the whole file), and the t88 oracle
  * recomputes every parsed field from the construction rule, so the
  * build->parse pair is a hash-gated round trip. Per-partition
  * `mapPartitions`, no shuffle; a real crawl file drops in because
  * the parser reads only the WARC/HTTP framing, not our builder's
  * choices.
  *
  * .warc.gz input (Common Crawl's concatenated-gzip-member framing)
  * is inflated transparently ([[gunzipAll]] — GZIPInputStream walks
  * the member chain); plain input passes through untouched.
  *
  * Chunked HTTP bodies (`Transfer-Encoding: chunked`) are decoded
  * ([[dechunk]] — hex-size framing, extensions and trailers ignored,
  * malformed framing keeps the decoded prefix).
  *
  * Boundary: records without Content-Length are skipped (the WARC
  * spec requires the header; real crawls comply). */
object Warc {

  private val Crlf = "\r\n"
  /** The HTTP response head every built record carries — ONE source
    * for builder, parser tests and the SQL mirror (interpolated into
    * the oracle, never retyped). */
  val HttpHead: String =
    s"HTTP/1.1 200 OK${Crlf}Content-Type: text/html$Crlf$Crlf"
  val WarcinfoBody: String = s"software: graft$Crlf"

  /** One WARC file per row: a warcinfo record then a response record
    * whose HTTP body is `<html><body>` text `</body></html>` at
    * `https://example.com/doc/<id>`. Deterministic — the t88 oracle
    * rebuilds every field from this rule. Returns (idCol, payload). */
  def buildWarc(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("warc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = Encoders.row(schema)
    df.select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val body = s"<html><body>${r.getString(1)}</body></html>"
          val http = HttpHead + body
          val sb = new StringBuilder
          def record(headers: Seq[(String, String)], payload: String): Unit = {
            sb.append("WARC/1.0").append(Crlf)
            headers.foreach { case (k, v) =>
              sb.append(k).append(": ").append(v).append(Crlf) }
            sb.append("Content-Length: ")
              .append(payload.getBytes(StandardCharsets.UTF_8).length)
              .append(Crlf).append(Crlf)
            sb.append(payload).append(Crlf).append(Crlf)
          }
          record(Seq(
            "WARC-Type" -> "warcinfo",
            "WARC-Record-ID" -> s"<urn:graft:$id-0>"), WarcinfoBody)
          record(Seq(
            "WARC-Type" -> "response",
            "WARC-Target-URI" -> s"https://example.com/doc/$id",
            "WARC-Record-ID" -> s"<urn:graft:$id-1>",
            "Content-Type" -> "application/http; msgtype=response"), http)
          Row(id, sb.toString.getBytes(StandardCharsets.UTF_8))
        }
      }(enc)
  }

  /** Walk the records of a WARC payload column: one output row per
    * record — (idCol, rec_idx, warc_type, target_uri, content_length,
    * http_status, body_text). `http_status`/`body_text` are null for
    * non-HTTP records; `body_text` is the HTTP body decoded as UTF-8
    * (the input to [[graft.text.HtmlOps.extractText]]). Malformed
    * framing fails closed: the walk stops at the first record whose
    * header block or length field doesn't parse. */
  def parseWarcRecords(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("warc_id", LongType, nullable = false),
      StructField("rec_idx", IntegerType, nullable = false),
      StructField("warc_type", StringType, nullable = true),
      StructField("target_uri", StringType, nullable = true),
      StructField("content_length", LongType, nullable = false),
      StructField("http_status", IntegerType, nullable = true),
      StructField("body_text", StringType, nullable = true)))
    val enc = Encoders.row(schema)
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          parseRecords(bytes).zipWithIndex.map { case (rec, i) =>
            Row(id, i, rec.warcType.orNull, rec.targetUri.orNull,
              rec.contentLength,
              rec.httpStatus.map(Int.box).orNull, rec.bodyText.orNull)
          }
        }
      }(enc)
  }

  /** HTTP/1.1 chunked-transfer decode (hex-size line + chunk + CRLF,
    * terminated by a 0 chunk; chunk extensions after ';' and trailer
    * headers ignored). Malformed framing fails closed to the chunks
    * decoded so far. */
  private[sources] def dechunk(bytes: Array[Byte], start: Int,
      end: Int): String = {
    val sb = new java.lang.StringBuilder
    var p = start
    var ok = true
    while (ok && p < end) {
      var e = p
      while (e + 1 < end && !(bytes(e) == '\r' && bytes(e + 1) == '\n')) e += 1
      if (e + 1 >= end) ok = false
      else {
        val sizeLine = new String(bytes, p, e - p,
          StandardCharsets.US_ASCII).trim
        val hexPart = sizeLine.takeWhile(c => c != ';')
        val size = try Integer.parseInt(hexPart.trim, 16)
          catch { case _: NumberFormatException => -1 }
        if (size < 0) ok = false
        else if (size == 0) { p = end; ok = false } // terminal chunk
        else {
          val cs = e + 2
          if (cs + size > end) ok = false
          else {
            sb.append(new String(bytes, cs, size, StandardCharsets.UTF_8))
            p = cs + size + 2 // skip the chunk's trailing CRLF
          }
        }
      }
    }
    sb.toString
  }

  /** Crawl-to-corpus in one call: WARC records -> HTTP response
    * bodies -> [[graft.text.HtmlOps.extractText]] ->
    * [[graft.text.NormalizeOps.normalizeText]]. Returns (idCol, text)
    * — the clean-text frame the dedup/quality/sampling tier consumes.
    * Every stage is narrow, so the whole chain is one pass over the
    * payload bytes with zero shuffles (t90 pins it end-to-end against
    * a DuckDB re-derivation of all three stages). Insert
    * `NormalizeOps.unicodeNormalize` between the two text stages when
    * the crawl needs NFC/NFKC (kept out of the default chain because
    * it has no SQL mirror). */
  def toCorpus(warcDf: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val bodies = parseWarcRecords(warcDf, idCol, payloadCol)
      .filter(col("warc_type") === "response" && col("body_text").isNotNull)
      .select(col("warc_id").as(idCol), col("body_text"))
    val html = graft.text.HtmlOps.extractText(bodies, idCol, "body_text")
    graft.text.NormalizeOps.normalizeText(html, idCol, "text_html")
      .select(col(idCol), col("text_norm").as("text"))
  }

  private[sources] case class WarcRecord(warcType: Option[String],
      targetUri: Option[String], contentLength: Long,
      httpStatus: Option[Int], bodyText: Option[String])

  /** Inflate a concatenated-gzip-member buffer (the .warc.gz framing:
    * each record its own member) to the plain byte stream. Plain
    * (non-gzip) input passes through untouched, so [[parseRecords]]
    * accepts either framing transparently. Truncated/corrupt gzip
    * fails closed to the bytes inflated so far — the same
    * keep-prior-records contract as the record walk itself.
    * GZIPInputStream already handles member concatenation (it reads
    * subsequent members until actual EOF). */
  private[sources] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 ||
        (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b) return bytes
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = new Array[Byte](8192)
    try {
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch {
      case _: java.io.IOException => () // truncated/corrupt: keep prefix
    } finally in.close()
    out.toByteArray
  }

  /** Pure record walk over the raw bytes; gzip-framed input
    * ([[gunzipAll]]) is inflated first. */
  private[sources] def parseRecords(raw: Array[Byte]): Seq[WarcRecord] = {
    val bytes = gunzipAll(raw)
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    val n = bytes.length
    def lineEnd(from: Int): Int = { // index of CR in CRLF, or -1
      var i = from
      while (i + 1 < n && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < n) i else -1
    }
    def str(from: Int, until: Int): String =
      new String(bytes, from, until - from, StandardCharsets.UTF_8)
    while (pos + 8 <= n && str(pos, pos + 8).startsWith("WARC/")) {
      val verEnd = lineEnd(pos)
      if (verEnd < 0) return out.toSeq
      var hp = verEnd + 2
      var wtype: Option[String] = None
      var uri: Option[String] = None
      var clen = -1L
      var done = false
      while (!done) {
        val he = lineEnd(hp)
        if (he < 0) return out.toSeq
        if (he == hp) { done = true; hp += 2 } // blank line: headers end
        else {
          val line = str(hp, he)
          val ci = line.indexOf(':')
          if (ci > 0) {
            val k = line.substring(0, ci).trim
            val v = line.substring(ci + 1).trim
            k.toLowerCase match {
              case "warc-type" => wtype = Some(v)
              case "warc-target-uri" => uri = Some(v)
              case "content-length" =>
                clen = try v.toLong catch { case _: NumberFormatException => -1L }
              case _ => ()
            }
          }
          hp = he + 2
        }
      }
      if (clen < 0 || hp + clen > n) return out.toSeq // fail closed
      val payloadStart = hp
      val payloadEnd = hp + clen.toInt
      // HTTP message payloads: status line + headers + CRLFCRLF + body
      val isHttp = payloadEnd - payloadStart >= 5 &&
        str(payloadStart, payloadStart + 5) == "HTTP/"
      var status: Option[Int] = None
      var body: Option[String] = None
      if (isHttp) {
        val sl = lineEnd(payloadStart)
        if (sl > 0) {
          val parts = str(payloadStart, sl).split(" ")
          if (parts.length >= 2)
            status = parts(1).toIntOption
        }
        // walk the header block: find the blank line, note chunking
        var bp = payloadStart
        var found = -1
        var chunked = false
        while (found < 0 && bp < payloadEnd) {
          val he = lineEnd(bp)
          if (he < 0 || he >= payloadEnd) bp = payloadEnd
          else if (he == bp) { found = bp + 2 }
          else {
            if (str(bp, he).toLowerCase
                .replace(" ", "") == "transfer-encoding:chunked")
              chunked = true
            bp = he + 2
          }
        }
        if (found >= 0) body = Some(
          if (chunked) dechunk(bytes, found, payloadEnd)
          else str(found, payloadEnd))
      }
      out += WarcRecord(wtype, uri, clen, status, body)
      pos = payloadEnd
      // consume the record separator (two CRLFs) when present
      var skips = 0
      while (skips < 2 && pos + 1 < n &&
          bytes(pos) == '\r' && bytes(pos + 1) == '\n') {
        pos += 2; skips += 1
      }
    }
    out.toSeq
  }
}
