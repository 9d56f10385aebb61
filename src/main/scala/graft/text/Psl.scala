package graft.text

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registrable-domain derivation against the FULL public-suffix list
  * (publicsuffix.org, MPL 2.0 — bundled verbatim as
  * `resources/graft/public_suffix_list.dat`, 9 506 rules), replacing
  * the 21-entry curated heuristic that mis-derived the long tail
  * (`com.ua`, `co.il`, `*.ck`, ...) on real crawls.
  *
  * Implements the published PSL algorithm exactly:
  *   1. Of all rules matching the host (labels compared right-to-left,
  *      `*` matching exactly one label), an exception rule (`!`)
  *      prevails; its public suffix is the rule minus its leftmost
  *      label.
  *   2. Otherwise the prevailing rule is the matching rule with the
  *      most labels; if no rule matches, the default rule `*` applies
  *      (the bare TLD is the public suffix).
  *   3. The registrable domain is the public suffix plus one more
  *      label; a host that IS a public suffix (or shorter) has none —
  *      we return null, which fail-closes `co.uk`, bare TLDs, and
  *      single-label intranet hosts (`localhost`) out of a web corpus.
  *
  * The lookup is a compiled per-row kernel ([[PslDomain]]) called from
  * whole-stage codegen — three static hash-set probes per candidate
  * suffix, at most [[Psl.maxRuleLabels]] (file-derived; 5 for the
  * bundled list) candidates per host, no
  * join, no shuffle, no per-row regex. The DuckDB oracle re-derives
  * the same algorithm in SQL over the same bundled data file
  * (`read_text` + suffix/base joins), so any drift in rule parsing or
  * precedence hash-fails t62 rather than hiding.
  *
  * Precondition: the host is already lowercased (canonicalizeUrls
  * lowercases scheme+host before deriving the domain); rules are
  * stored as published, which is lowercase.
  */
object Psl {

  /** (exact rules, wildcard bases = rule minus "*.", exception rules
    * minus "!"), parsed once from the bundled list. */
  private val (exactRules, wildcardBases, exceptionRules, parsedMaxRuleLabels): (
      java.util.HashSet[String], java.util.HashSet[String],
      java.util.HashSet[String], Int) = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "bundled public_suffix_list.dat missing from classpath")
    val exact = new java.util.HashSet[String](16384)
    val wild = new java.util.HashSet[String](256)
    val exc = new java.util.HashSet[String](16)
    // Each rule is stored in BOTH its published (unicode) and its
    // punycoded (IDN.toASCII) form when they differ, so hosts arrive
    // in either representation and still match — the official test
    // vectors require 食狮.公司.cn and xn--85x722f.xn--55qx5d.cn to
    // derive the same way.
    def add(set: java.util.HashSet[String], rule: String): Unit = {
      set.add(rule)
      try {
        val ascii = java.net.IDN.toASCII(rule)
        if (ascii != rule) set.add(ascii)
      } catch { case _: IllegalArgumentException => () }
    }
    // Deepest candidate-suffix depth any rule can match at: an exact
    // or exception rule of L labels matches an L-label suffix; a
    // wildcard rule "*.base" matches at (labels(base) + 1). Derived
    // while parsing so a PSL data-file refresh with a deeper rule
    // can never silently truncate the per-host candidate loop.
    var maxLabels = 1
    def labelCount(rule: String): Int = rule.count(_ == '.') + 1
    val src = scala.io.Source.fromInputStream(in, StandardCharsets.UTF_8.name())
    try {
      for (line <- src.getLines()) {
        val s = line.trim
        if (s.nonEmpty && !s.startsWith("//")) {
          if (s.startsWith("!")) {
            add(exc, s.substring(1))
            maxLabels = math.max(maxLabels, labelCount(s.substring(1)))
          } else if (s.startsWith("*.")) {
            add(wild, s.substring(2))
            maxLabels = math.max(maxLabels, labelCount(s.substring(2)) + 1)
          } else {
            add(exact, s)
            maxLabels = math.max(maxLabels, labelCount(s))
          }
        }
      }
    } finally src.close()
    (exact, wild, exc, maxLabels)
  }

  /** Deepest candidate depth in the bundled list — bounds the
    * per-host candidate loop. Derived from the parsed file (not
    * hand-pinned) so a data refresh with a deeper rule widens the
    * loop automatically; the DuckDB mirrors interpolate this SAME
    * value into their `LEAST(len(y), N)` candidate bound, so Spark
    * and oracle can never disagree on it. */
  val maxRuleLabels: Int = parsedMaxRuleLabels

  def ruleCounts: (Int, Int, Int) =
    (exactRules.size, wildcardBases.size, exceptionRules.size)

  /** Registrable domain of an already-lowercased host, or null when
    * the host has none (it is itself a public suffix, a bare TLD, or a
    * single label). Pure function of (host, bundled PSL). */
  def registrableDomain(host: UTF8String): UTF8String = {
    if (host == null) return null
    val h = host.toString
    if (h.isEmpty) return null
    val labels = h.split('.')
    val n = labels.length
    if (n == 0) return null
    // an empty label (leading dot, consecutive dots) is not a valid
    // host — no registrable domain (official vectors: '.com' -> null)
    var li = 0
    while (li < n) {
      if (labels(li).isEmpty) return null
      li += 1
    }
    var psLen = 0 // best prevailing-rule label count so far
    var excLen = -1 // exception rule match (prevails over everything)
    val maxI = math.min(n, maxRuleLabels)
    var suffix = labels(n - 1)
    var prevSuffix: String = null // suffix of length i-1 = wildcard base
    var i = 1
    while (i <= maxI && excLen < 0) {
      if (exceptionRules.contains(suffix)) excLen = i - 1
      else {
        if (exactRules.contains(suffix) && i > psLen) psLen = i
        if (i >= 2 && wildcardBases.contains(prevSuffix) && i > psLen)
          psLen = i
      }
      if (i < maxI) {
        prevSuffix = suffix
        suffix = labels(n - i - 1) + "." + suffix
      }
      i += 1
    }
    val ps = if (excLen >= 0) excLen else math.max(psLen, 1) // default rule *
    if (n <= ps) null
    else {
      val sb = new java.lang.StringBuilder
      var j = n - ps - 1
      while (j < n) {
        if (j > n - ps - 1) sb.append('.')
        sb.append(labels(j))
        j += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

/** `PslDomain(host)`: string → nullable string, codegen'd static call
  * into [[Psl.registrableDomain]] — stays inside whole-stage codegen
  * like [[Tokens]]/[[Shingles]]. */
case class PslDomain(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"PslDomain requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Psl.registrableDomain(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.text.Psl.registrableDomain($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(newChild: Expression): PslDomain =
    copy(child = newChild)
}
