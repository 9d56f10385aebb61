package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rank-greedy BPE application — the merge-depth-proof twin of
  * [[TextOps.bpeTokenize]]'s chained-replace fold.
  *
  * The chained fold is the right shape at shallow depth (each merge is
  * one codegen'd literal replace; measured linear 2.0 -> 4.2 s from 16
  * -> 126 merges on 5k docs, BASELINE.md "BPE merge-count scale") but
  * WRONG at realistic depth: 30k+ replaces blow the codegen method
  * budget and pay 30k whole-document scans per row. This kernel is the
  * documented upgrade — per PRETOKEN, repeatedly merge the
  * lowest-rank adjacent symbol pair present in the table (all
  * occurrences, leftmost-first) until none remains: the GPT-2
  * `encoder.py` application semantics. (The reference library has no
  * tokenizer — this operator belongs to the training-data extension
  * surface.) Cost per document is
  * O(symbols x merges-APPLIED) with O(1) expression nodes and O(table)
  * broadcast state, independent of table depth.
  *
  * Equivalence contract (BpeSpec pins it): for TRAINED tables — where
  * every merge's two sides are single symbols or products of
  * earlier-ranked merges, which is what [[TextOps.bpeTrainMerges]] /
  * [[TextOps.bpeTrainMergesDriver]] produce by construction — the
  * greedy result is bit-identical to the chained-replace fold, so the
  * same DuckDB oracle mirrors both. For arbitrary (non-trained)
  * tables the two genuinely diverge (a low-rank merge whose sides only
  * materialize via a higher-rank merge is applied here, skipped by the
  * fold); the greedy semantics is authoritative — it is what reference
  * BPE encoders implement.
  */
object BpeApply {

  private val Pretoken = java.util.regex.Pattern.compile(TextOps.BpePattern)

  /** Compiled merge table: (left, right) -> rank, plus the encode
    * kernel. Built once per plan and shipped to executors as one
    * reference object (~bytes per merge — a 32k-merge tokenizer is a
    * sub-MB broadcast, the model-sized-state pattern). */
  final class MergeTable(merges: Seq[(String, String)]) extends Serializable {
    // Two-level map keyed (left -> right -> rank): unambiguous for ANY
    // symbol content (a single concatenated-string key needs a
    // separator, and no separator byte is safe -- crawled text can
    // carry any code point into a symbol) and allocation-free on the
    // hot lookup path.
    private val rank =
      new java.util.HashMap[String, java.util.HashMap[String, Integer]](
        math.max(16, merges.size * 2))
    merges.iterator.zipWithIndex.foreach { case ((l, r), i) =>
      // first occurrence wins, matching the fold (a duplicated pair's
      // second replace is a no-op: the pattern no longer occurs)
      rank.computeIfAbsent(l, _ => new java.util.HashMap[String, Integer](4))
        .putIfAbsent(r, Integer.valueOf(i))
    }

    private def lookup(l: String, r: String): Integer = {
      val m = rank.get(l)
      if (m == null) null else m.get(r)
    }

    /** Greedy merge of one pretoken's symbol array in place; returns
      * the surviving symbol count. */
    private def mergeSyms(syms: Array[String], n0: Int): Int = {
      var n = n0
      while (n >= 2) {
        var best = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i < n - 1) {
          val r = lookup(syms(i), syms(i + 1))
          if (r != null && r < bestRank) { bestRank = r; best = i }
          i += 1
        }
        if (best < 0) return n
        val l = syms(best)
        val r = syms(best + 1)
        val lr = l + r
        var w = 0
        var j = 0
        while (j < n) {
          if (j < n - 1 && syms(j) == l && syms(j + 1) == r) {
            syms(w) = lr; j += 2
          } else { syms(w) = syms(j); j += 1 }
          w += 1
        }
        n = w
      }
      n
    }

    /** Pretokenize with [[TextOps.BpePattern]], map pretoken spaces to
      * the visible-space mark, split to code-point symbols, greedy-
      * merge, emit all surviving symbols single-space-joined — the
      * same output contract as the chained fold's
      * trim(regexp_replace(...)) tail. */
    def encode(text: UTF8String): UTF8String = {
      val s = text.toString
      val m = Pretoken.matcher(s)
      val sb = new java.lang.StringBuilder(s.length + (s.length >> 1))
      var syms = new Array[String](16)
      while (m.find()) {
        val tok = m.group().replace(' ', TextOps.BpeSpaceMark.charAt(0))
        if (tok.length > syms.length) syms = new Array[String](tok.length)
        var i = 0
        var n = 0
        while (i < tok.length) {
          val cp = tok.codePointAt(i)
          val w = Character.charCount(cp)
          syms(n) = tok.substring(i, i + w)
          n += 1
          i += w
        }
        val kept = mergeSyms(syms, n)
        var k = 0
        while (k < kept) {
          if (sb.length > 0) sb.append(' ')
          sb.append(syms(k))
          k += 1
        }
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

/** `BpeEncode(text, merges)`: string -> space-joined BPE symbols via
  * the rank-greedy kernel; stays inside whole-stage codegen (the table
  * rides along as a codegen reference object, like Spark's own
  * StaticInvoke targets). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val table = new BpeApply.MergeTable(merges)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BpeEncode requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    table.encode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeApply.MergeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** [[BpeEncode]] with the merge table shipped as a TorrentBroadcast —
  * the expression serializes only the broadcast handle, so a
  * production-depth table (30-50k merges) distributes once per
  * application instead of riding every plan's task binaries
  * (`UnigramEncodeBroadcast`'s pattern; identical output,
  * spec-pinned). */
case class BpeEncodeBroadcast(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[BpeApply.MergeTable])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BpeEncodeBroadcast requires a string input, got " +
        child.dataType.catalogString)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    bc.value.encode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTableBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((${classOf[BpeApply.MergeTable].getName}) $ref.value()).encode($c);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeBroadcast =
    copy(child = newChild)
}
