package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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
