package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled single-pass kernels for the text hot path.
  *
  * The HOF formulation (`filter(split(lower(...)))` +
  * `transform(sequence(...), element_at...)`) is interpreted by Catalyst —
  * every element access walks an expression tree — and dominated the t04/
  * t05 bench profile. These kernels do the same work in one compiled pass
  * over the UTF-8 bytes and are invoked from whole-stage-codegen'd
  * expressions ([[Tokens]], [[Shingles]]) via a static call, the same
  * shape Spark's own `StaticInvoke` emits.
  *
  * Semantics are bit-identical to the HOF versions (the external DuckDB
  * oracle pins them): tokens are maximal runs of ASCII `[a-z0-9]` in the
  * lowercased text — any other codepoint separates, and multi-byte UTF-8
  * sequences only contain bytes >= 0x80, so byte-scanning the lowercased
  * bytes matches the regex `[^a-z0-9]+` split exactly.
  */
object TextKernels {

  private val EMPTY = new GenericArrayData(Array.empty[Any])

  /** Token [start, end) byte offsets in one pass. */
  private def tokenSpans(bytes: Array[Byte]): (Array[Int], Int) = {
    // worst case: ceil(len/2) single-byte tokens -> 2*ceil(len/2) <= len+1
    val spans = new Array[Int](bytes.length + 2)
    var nTok = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      val b = bytes(i)
      val isTok = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (isTok) {
        val start = i
        i += 1
        while (i < len && {
          val c = bytes(i); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) i += 1
        spans(2 * nTok) = start; spans(2 * nTok + 1) = i
        nTok += 1
      } else i += 1
    }
    (spans, nTok)
  }

  /** Lowercased alphanumeric tokens (= filter(split(lower(s), "[^a-z0-9]+"),
    * _ != "")). */
  def tokens(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val (spans, nTok) = tokenSpans(bytes)
    if (nTok == 0) return EMPTY
    val out = new Array[Any](nTok)
    var t = 0
    while (t < nTok) {
      val s = spans(2 * t); val e = spans(2 * t + 1)
      out(t) = UTF8String.fromBytes(bytes, s, e - s)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** FNV-1a over a byte range — the probe hash of [[ProfileTable]] and
    * [[gateStats]]' top-count table (an execution detail only: hash
    * collisions are resolved by byte comparison, so the hash choice can
    * never change a result). */
  private[text] def hashBytes(bytes: Array[Byte], s: Int, e: Int): Int = {
    var h = 0x811c9dc5
    var i = s
    while (i < e) { h = (h ^ (bytes(i) & 0xff)) * 0x01000193; i += 1 }
    h & 0x7fffffff
  }

  private def spanEq(bytes: Array[Byte], s1: Int, e1: Int, s2: Int,
      e2: Int): Boolean = {
    if (e1 - s1 != e2 - s2) return false
    var i = 0
    val len = e1 - s1
    while (i < len) {
      if (bytes(s1 + i) != bytes(s2 + i)) return false
      i += 1
    }
    true
  }

  /** Exact multiset count of the most frequent token — one open-addressed
    * linear-probing pass over the token spans (counts are exact; the
    * table is an execution detail). Equals
    * `array_max(transform(array_distinct(w), t -> size(filter(w, x -> x = t))))`
    * in O(n) instead of O(n * n_distinct). */
  private def topCount(bytes: Array[Byte], spans: Array[Int],
      nTok: Int): Long = {
    var cap = 8
    while (cap < nTok * 2) cap <<= 1
    val mask = cap - 1
    val slot = new Array[Int](cap) // 1-based token index; 0 = empty
    val cnt = new Array[Int](cap)
    var best = 0
    var t = 0
    while (t < nTok) {
      val s = spans(2 * t); val e = spans(2 * t + 1)
      var i = hashBytes(bytes, s, e) & mask
      var done = false
      while (!done) {
        val o = slot(i)
        if (o == 0) {
          slot(i) = t + 1; cnt(i) = 1
          if (best < 1) best = 1
          done = true
        } else if (spanEq(bytes, spans(2 * (o - 1)), spans(2 * (o - 1) + 1),
            s, e)) {
          cnt(i) += 1
          if (cnt(i) > best) best = cnt(i)
          done = true
        } else i = (i + 1) & mask
      }
      t += 1
    }
    best.toLong
  }

  /** [[GateStats]]' one-pass kernel: tokenize (identical to [[tokens]]),
    * then per row emit `[n_tokens, top_count, hits_0 .. hits_{k-1}]` as
    * longs — n_tokens the token count, top_count the exact multiset
    * count of the most frequent token (computed ONLY when `minTokens <=
    * n <= maxTokens` and n > 0, else 0 — callers gate on the same
    * condition, so the value is never read outside it), and hits_i the
    * multiset count of tokens present in profile i. No token array is
    * materialized: membership and counting run over byte spans of the
    * lowercased text. */
  def gateStats(text: UTF8String, minTokens: Long, maxTokens: Long,
      table: ProfileTable): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val (spans, nTok) = tokenSpans(bytes)
    val out = new Array[Long](2 + table.nLangs)
    out(0) = nTok.toLong
    var t = 0
    while (t < nTok) {
      val m = table.lookupMask(bytes, spans(2 * t), spans(2 * t + 1))
      if (m != 0) {
        var l = 0
        while (l < table.nLangs) {
          if ((m & (1 << l)) != 0) out(2 + l) += 1
          l += 1
        }
      }
      t += 1
    }
    if (nTok > 0 && nTok >= minTokens && nTok <= maxTokens)
      out(1) = topCount(bytes, spans, nTok)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** n-word shingles: space-joined windows of [[tokens]]; empty array for
    * docs with fewer than n tokens. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val (spans, nTok) = tokenSpans(bytes)
    if (nTok < n) return EMPTY
    val out = new Array[Any](nTok - n + 1)
    var i = 0
    while (i < nTok - n + 1) {
      var size = n - 1 // separating spaces
      var k = 0
      while (k < n) { size += spans(2 * (i + k) + 1) - spans(2 * (i + k)); k += 1 }
      val buf = new Array[Byte](size)
      var pos = 0
      k = 0
      while (k < n) {
        if (k > 0) { buf(pos) = ' '; pos += 1 }
        val s = spans(2 * (i + k)); val l = spans(2 * (i + k) + 1) - s
        System.arraycopy(bytes, s, buf, pos, l)
        pos += l
        k += 1
      }
      out(i) = UTF8String.fromBytes(buf)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd tokenizer: array of lowercased alphanumeric tokens. */
case class Tokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"Tokens requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.tokens($c)")
  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

/** Prepared membership table for [[GateStats]]: every profile word in one
  * open-addressed byte-wise hash set with a per-word language bitmask
  * (bit i = the word belongs to profile i). Built once on the driver and
  * shipped to generated code as a codegen reference object; top-level
  * (not nested in the object) so its name is a plain Java class name in
  * generated sources. */
final class ProfileTable(profiles: Array[Array[String]]) extends Serializable {
  val nLangs: Int = profiles.length
  require(nLangs <= 30, s"ProfileTable holds masks in an Int: $nLangs langs")
  private val cap = {
    val nWords = profiles.map(_.length).sum
    var c = 8
    while (c < nWords * 4) c <<= 1
    c
  }
  private val mask = cap - 1
  private val words = new Array[Array[Byte]](cap)
  private val masks = new Array[Int](cap)
  profiles.zipWithIndex.foreach { case (ws, l) =>
    ws.foreach { w =>
      val b = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = TextKernels.hashBytes(b, 0, b.length) & mask
      var done = false
      while (!done) {
        if (words(i) == null) {
          words(i) = b; masks(i) = 1 << l; done = true
        } else if (java.util.Arrays.equals(words(i), b)) {
          masks(i) |= 1 << l; done = true
        } else i = (i + 1) & mask
      }
    }
  }
  /** Bitmask of profiles containing bytes[s, e), 0 when none. */
  def lookupMask(bytes: Array[Byte], s: Int, e: Int): Int = {
    var i = TextKernels.hashBytes(bytes, s, e) & mask
    while (words(i) != null) {
      val w = words(i)
      if (w.length == e - s) {
        var j = 0
        var same = true
        while (same && j < w.length) {
          if (w(j) != bytes(s + j)) same = false else j += 1
        }
        if (same) return masks(i)
      }
      i = (i + 1) & mask
    }
    0
  }
}

/** Codegen'd one-pass quality-gate statistics over the raw text column:
  * `[n_tokens, top_count, hits_per_profile...]` — see
  * [[TextKernels.gateStats]]. Replaces the interpreted
  * (CodegenFallback) HOF formulation
  * `array_max(transform(array_distinct(w), t -> size(filter(w, ...))))` +
  * one `size(filter(w, array_contains(...)))` per language that every
  * curation-composing row previously paid. */
case class GateStats(child: Expression, minTokens: Long, maxTokens: Long,
    profiles: Seq[Seq[String]]) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"GateStats requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  @transient private lazy val table =
    new ProfileTable(profiles.map(_.toArray).toArray)
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.gateStats(input.asInstanceOf[UTF8String], minTokens,
      maxTokens, table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("profileTable", table,
      classOf[ProfileTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.text.TextKernels.gateStats($c, ${minTokens}L, ${maxTokens}L, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): GateStats =
    copy(child = newChild)
}

/** Codegen'd n-word shingler over the raw text column. */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"Shingles requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}
