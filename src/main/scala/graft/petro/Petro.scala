package graft.petro

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.chem.Chem

/** Unit state of a petro table (reference keeps this in df.attrs:
  * src/petropandas/_accessors.py:146-147; Spark has no frame metadata that
  * survives transformations, so it lives in [[PetroFrame]]). */
sealed trait Units
object Units {
  case object WtPct extends Units
  case object Moles extends Units
  case object Apfu extends Units
}

/** Driver-side chemical classification of a DataFrame's columns
  * (reference: src/petropandas/_core.py:49-69 `_oxide_cols`/`_formula_cols`).
  * Classification is plan-build-time metadata resolution — nothing here
  * runs per row. */
final case class ChemSchema(cols: Seq[String]) {
  lazy val formulaCols: Seq[String] = cols.filter(Chem.isFormula)
  lazy val oxideCols: Seq[String] = cols.filter(Chem.isOxide)
  lazy val elemCols: Seq[String] = formulaCols.filterNot(oxideCols.contains)
}
object ChemSchema {
  def of(df: DataFrame): ChemSchema = ChemSchema(df.schema.fieldNames.toSeq)
}

/** Pure Column-cascade implementations of the reference's unit-conversion
  * algebra (src/petropandas/_calc.py). Every function is a narrow
  * projection — no shuffles, whole-stage-codegen friendly; per-column
  * constants (molecular weights, cation/oxygen counts) are embedded as
  * literals and constant-folded by Catalyst.
  *
  * Conventions:
  *  - `carry` = key/metadata columns preserved through the projection
  *    (the Spark analogue of the pandas index).
  *  - Row sums (`sum(axis=1)`) are horizontal expressions
  *    (`cols.reduce(_+_)`), NOT aggregations.
  *  - pandas `replace(0,1)` divide guards are reproduced with `when`.
  */
object Convert {

  /** Row-wise sum of the given columns of `df` as a single expression. */
  def rowSum(cols: Seq[String]): Column =
    if (cols.isEmpty) lit(0.0) else cols.map(col).reduce(_ + _)

  private def safeDenom(c: Column): Column = when(c === 0.0, 1.0).otherwise(c)

  /** Cleaning contract (reference: src/petropandas/_accessors.py:96-129):
    * trim column names, apply EMPA aliases, then fillna(0) + clip(lower=0)
    * on formula columns only. Idempotent. */
  def clean(df: DataFrame): DataFrame = {
    val trimmed = df.columns.foldLeft(df) { (d, c) =>
      val t = Chem.aliases.getOrElse(c.trim, c.trim)
      if (t != c) d.withColumnRenamed(c, t) else d
    }
    val schema = ChemSchema.of(trimmed)
    val exprs = trimmed.columns.map { c =>
      if (schema.formulaCols.contains(c))
        greatest(coalesce(nanvl(col(c).cast("double"), lit(0.0)), lit(0.0)), lit(0.0)).as(c)
      else col(c)
    }
    trimmed.select(exprs.toSeq: _*)
  }

  /** wt% -> molar proportions: col / MW (reference: _calc.py:57-68). */
  def toMoles(df: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val s = ChemSchema.of(df)
    df.select(carry.map(col) ++ s.formulaCols.map(c => (col(c) / lit(Chem.mw(c))).as(c)): _*)
  }

  /** molar proportions -> wt%: col * MW (reference: _calc.py:71-82). */
  def toOxides(df: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val s = ChemSchema.of(df)
    df.select(carry.map(col) ++ s.formulaCols.map(c => (col(c) * lit(Chem.mw(c))).as(c)): _*)
  }

  /** Normalise formula columns so each row sums to 100
    * (reference: _calc.py:432-443). Note: no divide guard in the
    * reference (0-row -> NaN); we reproduce numpy semantics (0/0 -> NaN)
    * rather than SQL null. */
  def normalize(df: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val s = ChemSchema.of(df)
    val total = rowSum(s.formulaCols)
    // numpy: x/0 -> inf/nan; Spark double div by zero -> null. Keep the
    // reference's observable behavior for the common case (total>0) and
    // map the degenerate total==0 row to NaN like pandas would.
    val exprs = s.formulaCols.map { c =>
      when(total === 0.0, lit(Double.NaN)).otherwise(col(c) / total * 100.0).as(c)
    }
    df.select(carry.map(col) ++ exprs: _*)
  }

  /** moles x cations-per-formula-unit (reference: _calc.py:197-210). */
  def cationMoles(df: DataFrame, units: Units, carry: Seq[String] = Nil): DataFrame = {
    val s = ChemSchema.of(df)
    val exprs = s.oxideCols.map { c =>
      (molesOf(c, units) * lit(Chem.cationsPer(c))).as(c)
    }
    df.select(carry.map(col) ++ exprs: _*)
  }

  /** moles x oxygens-per-formula-unit (reference: _calc.py:213-226). */
  def oxygenMoles(df: DataFrame, units: Units, carry: Seq[String] = Nil): DataFrame = {
    val s = ChemSchema.of(df)
    val exprs = s.oxideCols.map { c =>
      (molesOf(c, units) * lit(Chem.oxygensPer(c))).as(c)
    }
    df.select(carry.map(col) ++ exprs: _*)
  }

  private def molesOf(c: String, units: Units): Column = units match {
    case Units.Moles => col(c)
    case _ => col(c) / lit(Chem.mw(c))
  }

  /** Oxides -> atoms-per-formula-unit with ion-named output columns
    * (reference: _calc.py:252-310). Exactly one of nOxygens/nCations.
    * Non-oxide formula columns (F, Cl) pass through as plain moles. */
  def toApfu(
      df: DataFrame,
      nOxygens: Option[Double] = None,
      nCations: Option[Double] = None,
      units: Units = Units.WtPct,
      carry: Seq[String] = Nil
  ): DataFrame = {
    require(nOxygens.isDefined != nCations.isDefined,
      "Specify exactly one of nOxygens or nCations")
    val s = ChemSchema.of(df)
    val oxides = s.oxideCols
    val elems = s.elemCols
    val factor: Column =
      if (oxides.isEmpty) lit(1.0)
      else nOxygens match {
        case Some(nOxy) =>
          val oxySum = oxides.map(c => molesOf(c, units) * lit(Chem.oxygensPer(c))).reduce(_ + _)
          lit(nOxy) / oxySum
        case None =>
          val catSum = oxides.map(c => molesOf(c, units) * lit(Chem.cationsPer(c))).reduce(_ + _)
          lit(nCations.get) / catSum
      }
    val oxideExprs = oxides.map { c =>
      (molesOf(c, units) * lit(Chem.cationsPer(c)) * factor).as(Chem.oxideToIonCol(c))
    }
    val elemExprs = elems.map(c => molesOf(c, units).as(c))
    df.select(carry.map(col) ++ oxideExprs ++ elemExprs: _*)
  }

  /** Charge-normalised cation moles, oxide-named output — chlorite's
    * 28-charge convention (reference: _calc.py:313-345). */
  def toApfuByCharge(
      df: DataFrame,
      targetCharges: Double,
      units: Units = Units.WtPct,
      carry: Seq[String] = Nil
  ): DataFrame = {
    val base = if (units == Units.WtPct) df else toOxides(df, carry)
    val s = ChemSchema.of(base)
    val oxides = s.oxideCols
    val totalCharges = oxides.map { c =>
      (col(c) / lit(Chem.mw(c))) * lit(Chem.cationsPer(c) * Chem.chargeOf(Chem.elementOf(c)))
    }.reduce(_ + _)
    val factor = lit(targetCharges) / totalCharges
    val exprs = oxides.map { c =>
      ((col(c) / lit(Chem.mw(c))) * lit(Chem.cationsPer(c)) * factor).as(c)
    }
    base.select(carry.map(col) ++ exprs: _*)
  }

  /** APFU -> oxide wt% (reference: _calc.py:348-429). `total` rescales
    * each row's oxide sum to the analytical total (column or literal). */
  def fromApfu(
      df: DataFrame,
      nOxygens: Option[Double] = None,
      nCations: Option[Double] = None,
      total: Option[Column] = None,
      carry: Seq[String] = Nil
  ): DataFrame = {
    require(nOxygens.isDefined != nCations.isDefined,
      "Specify exactly one of nOxygens or nCations")
    val s = ChemSchema.of(df)
    // ion col -> (oxide, catPer, oxyPer); later ions overwrite earlier
    // for the same oxide, as in the reference's dict build.
    val ionCols = s.formulaCols.flatMap { c =>
      Chem.parseIon(c).map { case (el, charge) =>
        val oxide = Chem.ionToOxide(el, charge)
        val catPer = if (charge % 2 == 0) 1.0 else 2.0
        val oxyPer = if (charge % 2 == 0) charge / 2.0 else charge.toDouble
        (c, oxide, catPer, oxyPer)
      }
    }
    val byOxide = scala.collection.mutable.LinkedHashMap.empty[String, (String, Double, Double)]
    ionCols.foreach { case (c, oxide, catPer, oxyPer) => byOxide(oxide) = (c, catPer, oxyPer) }
    if (byOxide.isEmpty) return df.select(carry.map(col): _*)
    def propMoles(e: (String, Double, Double)): Column = col(e._1) / lit(e._2)
    val totalRef = byOxide.values.map { e =>
      propMoles(e) * lit(if (nOxygens.isDefined) e._3 else e._2)
    }.reduce(_ + _)
    val factor = lit(nOxygens.getOrElse(nCations.get)) / safeDenom(totalRef)
    val wtExprs = byOxide.toSeq.map { case (oxide, e) =>
      (propMoles(e) * factor * lit(Chem.mw(oxide))).as(oxide)
    }
    val projected = df.select(carry.map(col) ++ wtExprs: _*)
    total match {
      case None => projected
      case Some(t) =>
        val oxNames = byOxide.keys.toSeq
        val rowTotal = safeDenom(rowSum(oxNames))
        projected.select(carry.map(col) ++ oxNames.map(c => (col(c) / rowTotal * t).as(c)): _*)
    }
  }

  /** FeO wt% -> Fe2O3 wt%, additive merge, FeO dropped
    * (reference: _calc.py:633-662). */
  def feoToFe2o3(df: DataFrame): DataFrame = {
    if (!df.columns.contains("FeO")) return df
    val conv = col("FeO") / lit(Chem.mw("FeO")) * 0.5 * lit(Chem.mw("Fe2O3"))
    val merged =
      if (df.columns.contains("Fe2O3")) df.withColumn("Fe2O3", col("Fe2O3") + conv)
      else df.withColumn("Fe2O3", conv)
    merged.drop("FeO")
  }

  /** Fe2O3 wt% -> FeO wt%, additive merge, Fe2O3 dropped
    * (reference: _calc.py:665-694). */
  def fe2o3ToFeo(df: DataFrame): DataFrame = {
    if (!df.columns.contains("Fe2O3")) return df
    val conv = col("Fe2O3") / lit(Chem.mw("Fe2O3")) * 2.0 * lit(Chem.mw("FeO"))
    val merged =
      if (df.columns.contains("FeO")) df.withColumn("FeO", col("FeO") + conv)
      else df.withColumn("FeO", conv)
    merged.drop("Fe2O3")
  }

  /** Fe2O3 moles merged into FeO (1 -> 2), Fe2O3 dropped
    * (reference: _calc.py:888-914). */
  def reduceMoles(df: DataFrame): DataFrame = {
    if (!df.columns.contains("Fe2O3")) return df
    val conv = col("Fe2O3") * 2.0
    val merged =
      if (df.columns.contains("FeO")) df.withColumn("FeO", col("FeO") + conv)
      else df.withColumn("FeO", conv)
    merged.drop("Fe2O3")
  }

  /** THERMOCALC oxygen-excess FeO split in mole space
    * (reference: _calc.py:845-885). `oExcess` is mol%; Fe3+ = 2*o_moles
    * clipped to [0, FeO]. */
  def oxidizeMoles(df: DataFrame, oExcess: Column, valueCols: Seq[String]): DataFrame = {
    if (!df.columns.contains("FeO")) return df
    // Idempotence is value-aware, matching the reference (_calc.py:870):
    // skip only when an Fe2O3 column exists AND carries a positive value
    // somewhere; an all-zero Fe2O3 column (analyses reporting
    // Fe2O3 = 0.0) is re-oxidized, overwriting it. The single-row
    // max aggregate is a driver-side constant decision — the same class
    // as the hpxeos Σ=1 validation.
    if (df.columns.contains("Fe2O3")) {
      val m = df.agg(max(nanvl(col("Fe2O3"), lit(0.0)))).collect()(0)
      if (!m.isNullAt(0) && m.getDouble(0) > 0.0) return df
    }
    val total = rowSum(valueCols)
    val oMol = oExcess / 100.0 * total
    val fe3 = least(greatest(lit(2.0) * oMol, lit(0.0)), col("FeO"))
    df.withColumn("Fe2O3", fe3 / 2.0)
      .withColumn("FeO", col("FeO") - fe3)
  }

  /** Apatite correction: CaO -= (10/3)*mol(P2O5)*MW(CaO); P2O5 := 0
    * (reference: _calc.py:1015-1049). */
  def apatiteCorrection(df: DataFrame): DataFrame = {
    if (!df.columns.contains("P2O5")) return df
    val caoConsumedMoles = (col("P2O5") / lit(Chem.mw("P2O5"))) * lit(10.0 / 3.0)
    val d =
      if (df.columns.contains("CaO"))
        df.withColumn("CaO", col("CaO") - caoConsumedMoles * lit(Chem.mw("CaO")))
      else df
    d.withColumn("P2O5", lit(0.0))
  }

  /** Molar alumina saturation indices A/NK and A/CNK
    * (reference: _calc.py:922-952). */
  def aluminaSaturation(df: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    def m(c: String): Column =
      if (df.columns.contains(c)) col(c) / lit(Chem.mw(c)) else lit(0.0)
    val al = m("Al2O3"); val nk = m("Na2O") + m("K2O"); val cnk = m("CaO") + nk
    df.select(carry.map(col) ++ Seq(
      (al / safeDenom(nk)).as("A/NK"),
      (al / safeDenom(cnk)).as("A/CNK")): _*)
  }

  /** Shand classification from saturation indices
    * (reference: src/petropandas/_accessors.py:640-661). */
  def shandClass(ank: Column, acnk: Column): Column =
    when(acnk >= 1.0, "peraluminous")
      .when(ank < 1.0, "peralkaline")
      .otherwise("metaluminous")

  /** Common bulk-rock oxide ratios; only ratios whose inputs exist are
    * emitted (reference: _calc.py:955-1012). */
  def oxideRatios(df: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val has = df.columns.toSet
    val out = scala.collection.mutable.ListBuffer.empty[Column]
    if (has("FeO") && has("Fe2O3")) out += (col("FeO") + lit(0.8998) * col("Fe2O3")).as("FeOT")
    else if (has("FeO")) out += col("FeO").as("FeOT")
    if (has("MgO") && has("FeO")) {
      val mgMol = col("MgO") / lit(Chem.mw("MgO"))
      val feMol = col("FeO") / lit(Chem.mw("FeO"))
      out += (mgMol / safeDenom(mgMol + feMol)).as("Mg#")
    }
    if (has("Na2O") && has("K2O")) out += (col("Na2O") + col("K2O")).as("Na2O+K2O")
    if (has("K2O") && has("Na2O")) out += (col("K2O") / safeDenom(col("Na2O"))).as("K2O/Na2O")
    if (has("CaO") && has("Na2O")) out += (col("CaO") / safeDenom(col("Na2O"))).as("CaO/Na2O")
    if (has("SiO2")) out += col("SiO2").as("SiO2")
    if (has("TiO2")) out += col("TiO2").as("TiO2")
    df.select(carry.map(col) ++ out: _*)
  }
}

/** Valence splitting: Fe3+/Fe2+, Mn3+/Mn2+, Ti3+/Ti4+
  * (reference: src/petropandas/_calc.py:703-842). Pure cascades. */
object Valence {

  /** element -> (lowCharge, highCharge); Ti splits 4+ -> 3+ (low=4+). */
  val pairs: Map[String, (Int, Int)] =
    Map("Fe" -> (2, 3), "Mn" -> (2, 3), "Ti" -> (4, 3))

  /** Droop (1987) high-charge estimate: F = 2*nOxy*(1 - idealCat/S)
    * (reference: _calc.py:710-731). */
  def droopHigh(apfuSum: Column, totalApfu: Column, nOxygens: Double, idealCations: Double): Column = {
    val f = lit(2.0 * nOxygens) * (lit(1.0) - lit(idealCations) / apfuSum)
    val high = when(apfuSum === 0.0, 0.0).otherwise(greatest(f, lit(0.0)))
    val low = greatest(totalApfu - high, lit(0.0))
    totalApfu - low
  }

  /** Schumacher (1991) high-charge estimate (reference: _calc.py:734-780).
    * `apfuCols` are the value columns of the APFU frame. */
  def schumacherHigh(
      apfuCols: Seq[String], element: String,
      nOxygens: Double, idealCations: Double): Column = {
    val apfuSum = Convert.rowSum(apfuCols)
    val norm = lit(idealCations) / when(apfuSum === 0.0, 1.0).otherwise(apfuSum)
    val oxyPerCation: Seq[(String, Double)] = apfuCols.flatMap { c =>
      Chem.parseIon(c) match {
        case Some((_, chg)) => Some(c -> chg / 2.0)
        case None if Chem.isOxide(c) =>
          Some(c -> (2.0 * Chem.oxygensPer(c)) / Chem.cationsPer(c) / 2.0)
        case None => None
      }
    }
    val oxyFromCations = oxyPerCation.map { case (c, w) => col(c) * norm * lit(w) }
      .reduceOption(_ + _).getOrElse(lit(0.0))
    val highApfu = greatest(lit(2.0) * (lit(nOxygens) - oxyFromCations), lit(0.0))
    val highScaled = highApfu / norm
    val totalCol = Chem.detectCol(apfuCols, element)
    val high = greatest(highScaled, lit(0.0))
    val low = greatest(col(totalCol) - high, lit(0.0))
    col(totalCol) - low
  }

  /** Split the total-element APFU column into low/high charge ion columns
    * (reference: _calc.py:783-842). Renames total col -> low ion and
    * inserts the high ion right after it. Idempotent when both ion
    * columns already exist; KeyError (missing element) surfaces as
    * NoSuchElementException for the caller to tolerate. */
  def splitValence(
      df: DataFrame, apfuCols: Seq[String], element: String, method: String,
      nOxygens: Double, idealCations: Double): DataFrame = {
    require(pairs.contains(element), s"Unknown element $element")
    val (lowC, highC) = pairs(element)
    val lowIon = Chem.ionName(element, lowC)
    val highIon = Chem.ionName(element, highC)
    if (apfuCols.contains(lowIon) && apfuCols.contains(highIon)) return df
    val totalCol = Chem.detectCol(apfuCols, element) // throws if absent
    val high0 = method match {
      case "droop" =>
        droopHigh(Convert.rowSum(apfuCols), col(totalCol), nOxygens, idealCations)
      case "schumacher" =>
        schumacherHigh(apfuCols, element, nOxygens, idealCations)
      case other => throw new IllegalArgumentException(s"Unknown method $other")
    }
    val low = greatest(col(totalCol) - high0, lit(0.0))
    val high = col(totalCol) - low
    // Reference fidelity (_calc.py:835-842): the result RENAMES the total
    // column to the low ion and inserts the high ion after it — the low
    // column keeps the TOTAL element APFU, it is never reduced by the
    // high estimate. The reference's own goldens depend on this (e.g.
    // amphibole T-site sums, chloritoid Cld dominance), so we reproduce
    // it even though it double-counts the split element.
    val exprs = df.columns.toSeq.flatMap { c =>
      if (c == totalCol) Seq(col(totalCol).as(lowIon), high.as(highIon))
      else Seq(col(c))
    }
    df.select(exprs: _*)
  }
}
