package graft.petro.hpxeos

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.petro.{MineralSpec, Minerals, Units}

/** One THERMOCALC a-x solution-phase model
  * (reference: src/petropandas/hpxeos/base.py:47-153).
  *
  * Pipeline: APFU composition -> site fractions -> independent variables
  * (+ caller-supplied order parameters, default 0 = fully disordered) ->
  * p(end-member) polynomials. Every stage is a narrow projection; the
  * polynomials compile to Column trees on the driver ([[Poly]]).
  */
abstract class Phase {
  def abbreviation: String
  /** site -> cation columns occupying it (declaration order matters). */
  def sites: Seq[(String, Seq[String])]
  def endMemberNames: Seq[String]
  def optionalColumns: Set[String] = Set.empty
  def orderParameterNames: Seq[String] = Nil
  /** petropandas Mineral metadata driving the oxide->APFU pipeline. */
  def mineral: MineralSpec
  /** verbatim axfile p(...) block */
  def pBlock: String
  /** verbatim axfile sf block (transcription check; not used by proportions) */
  def sfBlock: String = ""

  def siteFractions(comp: String => Column, siteTotal: String => Column): Seq[(String, Column)]
  def variables(sf: String => Column, order: String => Column): Seq[(String, Column)]

  /** Default for an unsupplied order parameter — 0 (fully disordered)
    * unless a phase defines a composition-dependent default (e.g.
    * magnetite's Q). Evaluated over the site-fraction columns. */
  def orderDefault(name: String, sf: String => Column): Column = lit(0.0)

  /** Required composition columns = all site cations minus optional. */
  def requiredColumns: Set[String] =
    sites.flatMap(_._2).toSet -- optionalColumns

  /** End-member molar proportions from an APFU composition frame
    * (reference: base.py:112-127). `validate=true` reproduces the
    * reference's sum-to-1 check as one aggregate action. */
  def proportions(apfu: DataFrame, carry: Seq[String] = Nil,
      orderParameters: Map[String, Either[Double, Column]] = Map.empty,
      validate: Boolean = false): DataFrame = {
    val present = apfu.columns.toSet
    val missing = requiredColumns -- present
    require(missing.isEmpty,
      s"$abbreviation composition is missing required columns: ${missing.toSeq.sorted}")
    def comp(c: String): Column = if (present(c)) col(c) else lit(0.0)
    val totals: Map[String, Column] = sites.map { case (s, cats) =>
      s -> cats.map(comp).reduceLeft(_ + _)
    }.toMap
    val sfExprs = siteFractions(comp, totals)
    val sfDf = apfu.select(carry.map(col) ++ sfExprs.map { case (n, c) => c.as(n) }: _*)
    def order(name: String): Column = orderParameters.get(name) match {
      case Some(Left(v)) => lit(v)
      case Some(Right(c)) => c
      case None => orderDefault(name, col)
    }
    val varExprs = variables(col, order)
    val orderExtra = orderParameterNames.filterNot(n => varExprs.exists(_._1 == n))
      .map(n => n -> order(n))
    val varDf = sfDf.select(carry.map(col) ++
      (varExprs ++ orderExtra).map { case (n, c) => c.as(n) }: _*)
    val polys = Poly.compileAll(pBlock, col).toMap
    val props = varDf.select(carry.map(col) ++
      endMemberNames.map(n => polys(n).as(n)): _*)
    if (validate) {
      val sum = endMemberNames.map(col).reduceLeft(_ + _)
      val bad = props.select(max(abs(sum - 1.0)).as("dev")).collect()(0)
      val dev = if (bad.isNullAt(0)) 0.0 else bad.getDouble(0)
      require(!dev.isNaN && dev < 1e-8,
        s"$abbreviation end-member proportions do not sum to 1 (max dev $dev)")
    }
    props
  }

  /** End-member percentages from an oxide wt% frame via the mineral
    * APFU pipeline (reference: base.py:129-153). */
  def endMembers(df: DataFrame, carry: Seq[String] = Nil,
      units: Units = Units.WtPct,
      orderParameters: Map[String, Either[Double, Column]] = Map.empty,
      validate: Boolean = false): DataFrame = {
    val apfu = Minerals.rawApfu(mineral, df, carry, units)
    val props = proportions(apfu, carry, orderParameters, validate)
    props.select(carry.map(col) ++
      endMemberNames.map(n => (col(n) * 100.0).as(n)): _*)
  }

  /** The axfile's sf-block occupancies from a variables frame —
    * a transcription check (reference: e.g. metapelite/garnet.py:117-120). */
  def siteOccupancies(varsDf: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val polys = Poly.compileAll(sfBlock, col)
    varsDf.select(carry.map(col) ++ polys.map { case (n, c) => c.as(n) }: _*)
  }
}
