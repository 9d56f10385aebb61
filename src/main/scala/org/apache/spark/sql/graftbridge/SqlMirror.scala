package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{CaseWhenOtherwise, ColumnNode, Literal, UnresolvedAttribute, UnresolvedFunction}

/** Renders a Column's node tree as ANSI/DuckDB SQL text with the same
  * operation grouping, for external-oracle verification of expression
  * cascades that are DECLARED once in Scala (e.g. the hpxeos phase
  * variable pipelines) — the SQL mirror is derived from the very same
  * Column tree the Spark plan executes, so the two sides cannot drift.
  *
  * Lives beside [[Bridge]]: the ColumnNode vocabulary is `private[sql]`
  * in Spark 4's API, so the renderer needs an `org.apache.spark.sql`
  * subpackage.
  *
  * Supported surface: column refs, numeric/string/boolean literals,
  * arithmetic and comparison operators, boolean connectives,
  * LEAST/GREATEST/ABS/SQRT/COALESCE/POWER, and CASE WHEN — the
  * vocabulary of the petrology Column cascades. Anything else throws
  * (an oracle that silently mis-renders is worse than none).
  *
  * Numeric literals are cast to DOUBLE explicitly: DuckDB parses bare
  * decimal text as DECIMAL, and decimal arithmetic rounds differently
  * from the IEEE doubles Spark computes.
  */
object SqlMirror {

  def render(c: Column): String = renderNode(c.node)

  private val infixOps = Map(
    "+" -> "+", "-" -> "-", "*" -> "*", "/" -> "/",
    ">" -> ">", ">=" -> ">=", "<" -> "<", "<=" -> "<=",
    "=" -> "=", "==" -> "=", "and" -> "AND", "or" -> "OR")

  private val namedFns = Set(
    "least", "greatest", "abs", "sqrt", "coalesce", "power", "pow",
    "round", "floor", "ceil", "ln", "exp")

  private def renderNode(n: ColumnNode): String = n match {
    case UnresolvedAttribute(nameParts, _, _, _) =>
      "\"" + nameParts.mkString(".").replace("\"", "\"\"") + "\""
    case Literal(value, _, _) => renderLiteral(value)
    case UnresolvedFunction(fn, Seq(l, r), _, _, _, _) if infixOps.contains(fn) =>
      s"(${renderNode(l)} ${infixOps(fn)} ${renderNode(r)})"
    case UnresolvedFunction("negative", Seq(x), _, _, _, _) =>
      s"(- ${renderNode(x)})"
    case UnresolvedFunction("not", Seq(x), _, _, _, _) =>
      s"(NOT ${renderNode(x)})"
    case UnresolvedFunction(fn, args, _, _, _, _) if namedFns.contains(fn) =>
      val name = if (fn == "pow") "POWER" else fn.toUpperCase
      s"$name(${args.map(renderNode).mkString(", ")})"
    case CaseWhenOtherwise(branches, otherwise, _) =>
      val whens = branches
        .map { case (c, v) => s"WHEN ${renderNode(c)} THEN ${renderNode(v)}" }
        .mkString(" ")
      val els = otherwise.map(e => s" ELSE ${renderNode(e)}").getOrElse("")
      s"(CASE $whens$els END)"
    case other =>
      throw new IllegalArgumentException(
        s"SqlMirror cannot render node: ${other.getClass.getSimpleName} ($other)")
  }

  private def renderLiteral(v: Any): String = v match {
    case d: Double => s"(($d)::DOUBLE)"
    case f: Float => s"(($f)::DOUBLE)"
    case i: Int => i.toString
    case l: Long => l.toString
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: Boolean => b.toString.toUpperCase
    case null => "NULL"
    case other =>
      throw new IllegalArgumentException(s"SqlMirror literal: $other")
  }
}
