package graft.petro

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.chem.Chem

/** The engine's frame abstraction: a DataFrame plus the unit state the
  * reference keeps in `df.attrs` (petro_units / petro_n_oxygens /
  * petro_n_cations / petro_total — reference:
  * src/petropandas/_accessors.py:146-147,495-511). Spark has no frame
  * metadata that survives transformations, so the state is explicit
  * here and the analytical total is carried as a REAL column
  * (`__petro_total`) through the plan instead of a side-channel Series.
  *
  * Construction always applies the cleaning contract once (idempotent —
  * tracked by `cleaned`), mirroring `_needs_cleanup`
  * (_accessors.py:96-98).
  */
final case class PetroFrame(
    df: DataFrame,
    units: Units = Units.WtPct,
    nOxygens: Option[Double] = None,
    nCations: Option[Double] = None,
    carry: Seq[String] = Nil) {

  import PetroFrame.TotalCol

  def schema: ChemSchema = ChemSchema.of(df)

  private def valueCols: Seq[String] =
    df.columns.toSeq.filterNot(c => carry.contains(c) || c == TotalCol)

  // ---- projections (P1-P4) -------------------------------------------------

  /** P1: wt% oxide projection (converting back from the current units). */
  def oxides: PetroFrame = units match {
    case Units.WtPct =>
      copy(df = df.select((carry.map(col) ++ schema.oxideCols.map(col)): _*))
    case Units.Moles =>
      copy(df = Convert.toOxides(df, carry), units = Units.WtPct)
    case Units.Apfu => convert(Units.WtPct)
  }

  /** P2: canonical-order oxide projection. */
  def oxidesSorted: PetroFrame = {
    val o = oxides
    val ordered = Chem.sortOxideColumns(ChemSchema.of(o.df).oxideCols)
    o.copy(df = o.df.select((carry.map(col) ++ ordered.map(col)): _*))
  }

  /** P3: molar proportions. */
  def moles: PetroFrame = convert(Units.Moles)

  /** P4: all formula columns (bulk projection), in wt%. */
  def bulk: PetroFrame = {
    val o = if (units == Units.WtPct) this else convert(Units.WtPct)
    o.copy(df = o.df.select((carry.map(col) ++ ChemSchema.of(o.df).formulaCols.map(col)): _*))
  }

  // ---- selection (P5-P7) ---------------------------------------------------

  /** P5: pattern filter on a metadata column. The reference's
    * `select(str)` delegates to pandas `.str.contains(arg)`, which is
    * REGEX by default (_accessors.py:421) — so `"Grt|Amp"` is an
    * alternation, not a literal. `rlike` has the same unanchored
    * find-anywhere semantics as `re.search`. */
  def select(pattern: String, on: String): PetroFrame =
    copy(df = df.filter(col(on).cast("string").rlike(pattern)))

  /** P5 (literal variant): plain substring match, for callers that do
    * not want regex interpretation (pandas `str.contains(..., regex=False)`). */
  def selectLiteral(contains: String, on: String): PetroFrame =
    copy(df = df.filter(col(on).cast("string").contains(contains)))

  /** P6: membership filter. */
  def selectIn(values: Seq[String], on: String): PetroFrame =
    copy(df = df.filter(col(on).isin(values: _*)))

  /** P7: boolean-predicate filter. */
  def where(predicate: Column): PetroFrame = copy(df = df.filter(predicate))

  // ---- conversions (U8 dispatcher; reference: _calc.py:119-194) ------------

  def cations(nOxy: Option[Double] = None, nCat: Option[Double] = None): PetroFrame = {
    if (units == Units.Apfu) return this
    // remember the analytical total for the apfu -> wt% round trip
    val oxCols = schema.oxideCols
    val withTotal =
      if (oxCols.nonEmpty && units == Units.WtPct)
        df.withColumn(TotalCol, Convert.rowSum(oxCols))
      else df
    val a = Convert.toApfu(withTotal, nOxy, nCat, units,
      carry = carry ++ (if (withTotal.columns.contains(TotalCol)) Seq(TotalCol) else Nil))
    PetroFrame(a, Units.Apfu, nOxy, nCat, carry)
  }

  def convert(to: Units, nOxy: Option[Double] = None,
      nCat: Option[Double] = None): PetroFrame = {
    val rOxy = nOxy.orElse(nOxygens)
    val rCat = nCat.orElse(nCations)
    (units, to) match {
      case (a, b) if a == b => this
      case (Units.WtPct, Units.Moles) =>
        copy(df = Convert.toMoles(df, carry), units = Units.Moles)
      case (Units.Moles, Units.WtPct) =>
        copy(df = Convert.toOxides(df, carry), units = Units.WtPct)
      case (_, Units.Apfu) => cations(rOxy, rCat)
      case (Units.Apfu, t) =>
        val total =
          if (df.columns.contains(TotalCol)) Some(col(TotalCol)) else None
        val innerCarry = carry ++ (if (total.isDefined) Seq(TotalCol) else Nil)
        val wt = Convert.fromApfu(df, rOxy, rCat, total, innerCarry)
          .drop(TotalCol)
        val asWt = PetroFrame(wt, Units.WtPct, rOxy, rCat, carry)
        if (t == Units.WtPct) asWt else asWt.convert(t)
    }
  }

  /** U3: normalize rows to 100. */
  def normalized: PetroFrame = copy(df = Convert.normalize(df, carry))

  // ---- valence round-trips (V4/V5; reference: _accessors.py:295-364) -------

  /** V4: wt% -> APFU -> valence split -> back to wt% preserving the
    * original analytical total. */
  def splitValence(element: String, method: String, nOxy: Double,
      idealCations: Double): PetroFrame = {
    val apfu = cations(Some(nOxy))
    val split = Valence.splitValence(apfu.df,
      apfu.valueCols, element, method, nOxy, idealCations)
    apfu.copy(df = split).convert(Units.WtPct)
  }

  /** V5: mole-space oxygen-excess oxidation round trip. */
  def oxidize(oExcess: Double): PetroFrame = {
    val m = convert(Units.Moles)
    val ox = Convert.oxidizeMoles(m.df, lit(oExcess), m.valueCols)
    m.copy(df = ox).convert(units)
  }

  /** V5: Fe2O3 -> FeO merge in mole space, back to original units. */
  def reduced: PetroFrame = {
    val m = convert(Units.Moles)
    m.copy(df = Convert.reduceMoles(m.df)).convert(units)
  }

  // ---- accessor-surface parity: the remaining user-facing verbs of the
  // reference's oxides/bulk/mineral accessors, delegating to the
  // operator objects (reference: _accessors.py method list) -----------------

  /** U12: apatite-bound Ca removed, P2O5 zeroed (oxides.apatite_correction). */
  def apatiteCorrection: PetroFrame = {
    val wt = if (units == Units.WtPct) this else convert(Units.WtPct)
    wt.copy(df = Convert.apatiteCorrection(wt.df))
  }

  /** G1/G2: column means, overall or grouped (oxides.mean(groupby=...)). */
  def mean(groupBy: Option[String] = None): DataFrame = {
    val aggs = valueCols.map(c => avg(col(c)).as(c))
    groupBy match {
      case Some(g) => df.groupBy(col(g)).agg(aggs.head, aggs.tail: _*)
      case None => df.agg(aggs.head, aggs.tail: _*)
    }
  }

  /** U13/U14: A/NK + A/CNK, optionally with the Shand class column
    * (bulk.alumina_saturation). */
  def aluminaSaturation(classify: Boolean = false): DataFrame = {
    val as = Convert.aluminaSaturation(requireWt.df, carry)
    if (!classify) as
    else as.withColumn("shand", Convert.shandClass(col("A/NK"), col("A/CNK")))
  }

  /** U15 (bulk.oxide_ratios). */
  def oxideRatios: DataFrame = Convert.oxideRatios(requireWt.df, carry)

  /** C1 (bulk.cipw_simple). */
  def cipwSimple: DataFrame = Cipw.cipwNormSimple(requireWt.df, carry)

  /** C2 (bulk.cipw). */
  def cipw(normsum: Boolean = false, cancrinite: Boolean = false,
      spinel: Boolean = false): DataFrame =
    Cipw.cipwNorm(requireWt.df, carry, normsum, cancrinite, spinel)

  /** C3 (bulk.cipwhb). */
  def cipwHb(normsum: Boolean = false, cancrinite: Boolean = false,
      spinel: Boolean = false): DataFrame =
    Cipw.cipwNormHb(requireWt.df, carry, normsum, cancrinite, spinel)

  /** P8 (bulk.reframe): keep the listed formula columns, re-deriving the
    * schema classification. */
  def reframe(columns: Seq[String]): PetroFrame =
    copy(df = Thermo.reframe(df, columns, carry))

  /** A4 (mineral.apfu). */
  def apfu(spec: MineralSpec): DataFrame =
    Minerals.apfu(spec, requireWt.df, carry)

  /** A3 (mineral.site_allocations). */
  def siteAllocations(spec: MineralSpec): DataFrame =
    Minerals.siteAllocations(spec, requireWt.df, carry)

  /** E1-E16 (mineral.end_members). */
  def endMembers(spec: MineralSpec): DataFrame =
    Minerals.endMembers(spec, requireWt.df, carry)

  /** A5 (mineral.check_stoichiometry). */
  def checkStoichiometry(spec: MineralSpec): DataFrame =
    Stoich.checkStoichiometry(spec, requireWt.df, carry)

  /** S7 (bulk.TCbulk): header + per-row formatted bulk lines. */
  def tcBulk(labelCol: Column,
      system: String = PPConfig.defaultSystem,
      oxygen: Double = PPConfig.defaultOxygen,
      h2o: Double = PPConfig.defaultH2O): (String, DataFrame) =
    Thermo.tcBulk(requireWt.df, labelCol, system, oxygen, h2o, carry)

  /** S8 (bulk.Perplexbulk): component-list block per row. */
  def perplexBulk(system: String = PPConfig.defaultSystem,
      oxygen: Double = PPConfig.defaultOxygen,
      h2o: Double = PPConfig.defaultH2O): DataFrame =
    Thermo.perplexBulk(requireWt.df, system, oxygen, h2o, carry)

  /** S9 (bulk.MAGEMin): bulk line per row. */
  def magemin(labelCol: Column, db: String = PPConfig.defaultDb,
      sysIn: String = PPConfig.defaultSysIn,
      oxygen: Double = PPConfig.defaultOxygen,
      h2o: Double = PPConfig.defaultH2O): DataFrame =
    Thermo.magemim(requireWt.df, labelCol, db, sysIn, oxygen, h2o, carry = carry)

  private def requireWt: PetroFrame =
    if (units == Units.WtPct) this else convert(Units.WtPct)
}

object PetroFrame {
  val TotalCol = "__petro_total"

  /** Entry point: clean (trim/alias/fill/clip) exactly once. */
  def apply(df: DataFrame, carry: Seq[String]): PetroFrame =
    new PetroFrame(Convert.clean(df), Units.WtPct, None, None, carry)

  def clean(df: DataFrame, carry: Seq[String] = Nil): PetroFrame = apply(df, carry)
}
