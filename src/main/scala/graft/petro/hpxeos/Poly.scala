package graft.petro.hpxeos

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parser + Catalyst compiler for THERMOCALC axfile compiled-polynomial
  * notation (reference: src/petropandas/hpxeos/polynomial.py:1-122).
  *
  * Grammar: `name nTerms { nFactors { const nPairs (coeff var)* }* }*`;
  * value = sum over terms of (product over factors of
  * (const + sum coeff*var)); fraction tokens like `-2/3`; `%` comments.
  *
  * The reference interprets parsed polynomials per call over pandas
  * Series; here each polynomial compiles ONCE on the driver into a
  * Column expression tree — zero runtime interpretation, whole-stage
  * codegen'd like any other arithmetic.
  */
object Poly {

  final case class Factor(const: Double, pairs: Seq[(Double, String)])
  type Term = Seq[Factor]
  type Polynomial = Seq[Term]

  private val pName = """^p\((\w+)\)$""".r

  private def parseNumber(tok: String): Double =
    if (tok.contains("/")) {
      val Array(n, d) = tok.split("/", 2)
      n.toDouble / d.toDouble
    } else tok.toDouble

  private def tokenize(text: String): Array[String] =
    text.linesIterator
      .map(_.takeWhile(_ != '%').trim)
      .filter(_.nonEmpty)
      .flatMap(_.split("\\s+"))
      .toArray

  /** Parse every named polynomial, preserving declaration order. */
  def parse(text: String): Seq[(String, Polynomial)] = {
    val toks = tokenize(text)
    var pos = 0
    def next(): String = { val t = toks(pos); pos += 1; t }
    val out = scala.collection.mutable.ListBuffer.empty[(String, Polynomial)]
    while (pos < toks.length) {
      val name = next()
      val nTerms = next().toInt
      val terms = (0 until nTerms).map { _ =>
        val nFactors = next().toInt
        (0 until nFactors).map { _ =>
          val const = parseNumber(next())
          val nPairs = next().toInt
          val pairs = (0 until nPairs).map(_ => (parseNumber(next()), next()))
          Factor(const, pairs)
        }
      }
      out += name -> terms
    }
    out.toSeq
  }

  /** Compile one polynomial to a Column over variable columns, mirroring
    * the reference's evaluation order (factor = const then +coeff*var
    * sequentially; term = running product; total = running sum). */
  def compile(p: Polynomial, vars: String => Column): Column = {
    val terms = p.map { factors =>
      factors.map { f =>
        f.pairs.foldLeft(lit(f.const)) { case (acc, (coeff, v)) =>
          acc + lit(coeff) * vars(v)
        }
      }.reduceLeft(_ * _)
    }
    terms.reduceLeftOption(_ + _).getOrElse(lit(0.0))
  }

  /** Parse + compile every polynomial in `text`; `p(name)` unwraps to
    * `name` (reference: polynomial.py:107-122). */
  def compileAll(text: String, vars: String => Column): Seq[(String, Column)] =
    parse(text).map { case (name, poly) =>
      val colName = name match { case pName(n) => n; case other => other }
      colName -> compile(poly, vars)
    }

  /** Render one polynomial as SQL text with the same operation grouping
    * as [[compile]] (for external-oracle verification). */
  def toSql(p: Polynomial, vars: String => String): String = {
    val terms = p.map { factors =>
      factors.map { f =>
        f.pairs.foldLeft(f.const.toString) { case (acc, (coeff, v)) =>
          s"($acc + $coeff * ${vars(v)})"
        }
      }.reduceLeft((a, b) => s"($a * $b)")
    }
    terms.reduceLeftOption((a, b) => s"($a + $b)").getOrElse("0.0")
  }

  def toSqlAll(text: String, vars: String => String): Seq[(String, String)] =
    parse(text).map { case (name, poly) =>
      val colName = name match { case pName(n) => n; case other => other }
      colName -> toSql(poly, vars)
    }
}
