package graft.petro

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.chem.Chem

/** Crystallographic site definition (reference: src/petropandas/_minerals.py:
  * site_definitions class attrs). */
final case class SiteDef(name: String, capacity: Double, priority: Seq[String])

/** Valence split request (reference: _minerals.py valence_splits). */
final case class ValenceSplit(
    element: String, method: String,
    nOxygens: Option[Double] = None, idealCations: Option[Double] = None)

/** Stateless mineral configuration (reference: _minerals.py:29-64).
  * `preprocess` is the `_preprocess_oxides` hook; `chargeBasis` replaces
  * oxygen normalization with charge normalization (chlorite). */
final case class MineralSpec(
    name: String,
    nOxygens: Double,
    idealCations: Option[Double],
    valenceSplits: Seq[ValenceSplit],
    sites: Seq[SiteDef],
    totalRange: (Double, Double) = (98.5, 101.5),
    preprocess: DataFrame => DataFrame = identity,
    chargeBasis: Option[Double] = None)

/** Mineral structural-formula pipelines as Column cascades.
  *
  * All of the reference's per-row loops (greedy site allocation,
  * sequential end-member extraction) are unrolled at plan-build time into
  * `least`/`greatest` expression trees — the site/ion lists are static per
  * mineral, so the runtime plan is a single narrow Project per pipeline,
  * fully whole-stage-codegen'd. No UDFs anywhere (the reference's only
  * numerical solve, GarnetFe3 lstsq, becomes a constant pseudo-inverse
  * linear map — see [[Minerals.garnetFe3EndMembers]]).
  */
object Minerals {

  import Convert.rowSum

  // ---- specs (reference: _minerals.py classes) -----------------------------

  val Grt = MineralSpec("Garnet", 12, Some(8),
    Seq(ValenceSplit("Fe", "droop")),
    Seq(
      SiteDef("Z", 3.0, Seq("Si{4+}", "Al{3+}")),
      SiteDef("Y", 2.0, Seq("Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{3+}")),
      SiteDef("X", 3.0, Seq("Fe{2+}", "Mg{2+}", "Ca{2+}", "Mn{2+}"))),
    totalRange = (99.0, 101.0))

  val GrtFe3 = Grt.copy(name = "GarnetFe3")

  val Fsp = MineralSpec("Feldspar", 8, Some(5), Nil,
    Seq(
      SiteDef("T", 4.0, Seq("Si{4+}", "Al{3+}")),
      SiteDef("M", 1.0, Seq("Ca{2+}", "Na{+}", "K{+}"))),
    totalRange = (99.0, 101.0))

  val Cpx = MineralSpec("Clinopyroxene", 6, Some(4),
    Seq(ValenceSplit("Fe", "droop")),
    Seq(
      SiteDef("T", 2.0, Seq("Si{4+}", "Al{3+}")),
      SiteDef("M1", 1.0, Seq("Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{3+}", "Mg{2+}", "Fe{2+}")),
      SiteDef("M2", 1.0, Seq("Ca{2+}", "Na{+}", "Mn{2+}", "Fe{2+}", "Mg{2+}"))),
    totalRange = (99.0, 101.0))

  val Opx = MineralSpec("Orthopyroxene", 6, Some(4),
    Seq(ValenceSplit("Fe", "droop")),
    Seq(
      SiteDef("T", 2.0, Seq("Si{4+}", "Al{3+}")),
      SiteDef("M1", 1.0, Seq("Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{3+}", "Mg{2+}", "Fe{2+}")),
      SiteDef("M2", 1.0, Seq("Ca{2+}", "Mn{2+}", "Fe{2+}", "Mg{2+}"))),
    totalRange = (99.0, 101.0))

  val Ms = MineralSpec("Muscovite", 11, Some(7), Nil,
    Seq(
      SiteDef("T", 4.0, Seq("Si{4+}", "Al{3+}")),
      SiteDef("I", 1.0, Seq("K{+}", "Na{+}", "Ca{2+}", "Ba{2+}")),
      SiteDef("O", 2.0, Seq("Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{2+}", "Mg{2+}", "Mn{2+}"))),
    totalRange = (94.0, 97.0))

  val Bt = MineralSpec("Biotite", 11, Some(7), Nil,
    Seq(
      SiteDef("T", 4.0, Seq("Si{4+}", "Al{3+}")),
      SiteDef("I", 1.0, Seq("K{+}", "Na{+}", "Ba{2+}")),
      SiteDef("O", 3.0, Seq("Mg{2+}", "Fe{2+}", "Al{3+}", "Ti{4+}", "Cr{3+}", "Mn{2+}"))),
    totalRange = (94.0, 97.0))

  val St = MineralSpec("Staurolite", 48, None, Nil,
    Seq(
      SiteDef("T", 8.0, Seq("Si{4+}", "Al{3+}")),
      SiteDef("M", 12.0, Seq("Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{2+}", "Mg{2+}", "Mn{2+}", "Zn{2+}"))),
    totalRange = (99.0, 101.0))

  val Chl = MineralSpec("Chlorite", 14, None, Nil,
    Seq(
      SiteDef("T", 4.0, Seq("Si{4+}", "Al{3+}")),
      SiteDef("M", 6.0, Seq("Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{2+}", "Mg{2+}", "Mn{2+}"))),
    totalRange = (85.0, 90.0), chargeBasis = Some(28.0))

  val Ep = MineralSpec("Epidote", 12.5, Some(8), Nil,
    Seq(
      SiteDef("A", 2.0, Seq("Ca{2+}", "Mn{2+}", "Sr{2+}")),
      SiteDef("M", 3.0, Seq("Al{3+}", "Fe{3+}", "Ti{3+}", "V{3+}", "Cr{3+}", "Mn{3+}", "Fe{2+}", "Mg{2+}")),
      SiteDef("T", 3.0, Seq("Si{4+}"))),
    totalRange = (99.0, 101.0), preprocess = Convert.feoToFe2o3)

  val Amp = MineralSpec("Amphibole", 23, Some(15),
    Seq(ValenceSplit("Fe", "schumacher")),
    Seq(
      SiteDef("A", 1.0, Seq("K{+}", "Na{+}")),
      SiteDef("B", 2.0, Seq("Na{+}", "Ca{2+}", "Mn{2+}", "Fe{2+}", "Mg{2+}")),
      SiteDef("C", 5.0, Seq("Mg{2+}", "Fe{2+}", "Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{3+}", "Mn{2+}", "Na{+}")),
      SiteDef("T", 8.0, Seq("Si{4+}", "Al{3+}"))),
    totalRange = (96.0, 99.0))

  val Ttn = MineralSpec("Titanite", 5, Some(3), Nil,
    Seq(
      SiteDef("A", 1.0, Seq("Ca{2+}", "Sr{2+}", "Mn{2+}", "Na{+}")),
      SiteDef("B", 1.0, Seq("Ti{4+}", "Al{3+}", "Fe{3+}", "Sn{4+}", "Nb{5+}", "Zr{4+}", "Cr{3+}", "V{3+}", "Mg{2+}")),
      SiteDef("T", 1.0, Seq("Si{4+}", "P{5+}"))),
    totalRange = (99.0, 101.0), preprocess = Convert.feoToFe2o3)

  val Cld = MineralSpec("Chloritoid", 12, Some(8),
    Seq(ValenceSplit("Fe", "droop")),
    Seq(
      SiteDef("T", 2.0, Seq("Si{4+}", "Al{3+}")),
      SiteDef("M1", 6.0, Seq("Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{3+}", "Fe{2+}", "Mg{2+}", "Mn{2+}"))),
    totalRange = (99.0, 101.0))

  val Crd = MineralSpec("Cordierite", 18, Some(11), Nil,
    Seq(
      SiteDef("T1", 6.0, Seq("Si{4+}", "Al{3+}")),
      SiteDef("T2", 3.0, Seq("Al{3+}", "Ti{4+}")),
      SiteDef("B", 2.0, Seq("Fe{2+}", "Mg{2+}", "Mn{2+}")),
      SiteDef("A", 1.0, Seq("Na{+}", "K{+}", "Ca{2+}"))),
    totalRange = (97.0, 99.0))

  val Ilm = MineralSpec("Ilmenite", 3, Some(2),
    Seq(ValenceSplit("Fe", "droop")),
    Seq(
      SiteDef("A", 1.0, Seq("Fe{2+}", "Mg{2+}", "Mn{2+}", "Fe{3+}")),
      SiteDef("B", 1.0, Seq("Ti{4+}", "Fe{3+}", "Al{3+}", "Cr{3+}"))),
    totalRange = (93.0, 100.5))

  val Spl = MineralSpec("Spinel", 4, Some(3),
    Seq(ValenceSplit("Fe", "droop")),
    Seq(
      SiteDef("T", 1.0, Seq("Mg{2+}", "Fe{2+}", "Zn{2+}", "Mn{2+}", "Fe{3+}", "Al{3+}", "Cr{3+}", "Ti{4+}")),
      SiteDef("M", 2.0, Seq("Al{3+}", "Cr{3+}", "Fe{3+}", "Ti{4+}", "Mg{2+}", "Fe{2+}", "Mn{2+}"))),
    totalRange = (93.0, 100.5), preprocess = Convert.fe2o3ToFeo)

  val all: Seq[MineralSpec] =
    Seq(Grt, GrtFe3, Fsp, Cpx, Opx, Ms, Bt, St, Chl, Ep, Amp, Ttn, Cld, Crd, Ilm, Spl)

  // ---- helpers -------------------------------------------------------------

  /** Zero-default column lookup (reference `Mineral._col`,
    * _minerals.py:102-105). */
  private def zc(df: DataFrame)(name: String): Column =
    if (df.columns.contains(name)) col(name) else lit(0.0)

  private def clip0(c: Column): Column = greatest(c, lit(0.0))

  /** pandas `x/total.replace(0,1)*100 .where(total>0, 0)` idiom
    * (e.g. _minerals.py:290-298). */
  private def pct(x: Column, total: Column): Column =
    when(total > 0.0, x / when(total === 0.0, 1.0).otherwise(total) * 100.0)
      .otherwise(0.0)

  private def frac(x: Column, total: Column): Column =
    when(total > 0.0, x / when(total === 0.0, 1.0).otherwise(total)).otherwise(0.0)

  /** Sequential let-bindings: each (name, expr) becomes a real column in
    * its own Project layer, so later bindings and the final select
    * reference it by NAME instead of re-inlining its whole subtree.
    * Composing Columns in Scala duplicates shared subtrees textually —
    * the cpx/spinel cascades reached 17k/40k expression nodes that way,
    * and plan/codegen cost (not data) dominated their runtime. Identical
    * arithmetic in identical operand order, so results are bit-identical. */
  private def bind(df: DataFrame, binds: (String, Column)*): DataFrame =
    binds.foldLeft(df) { case (d, (n, e)) => d.withColumn(n, e) }

  def valueCols(df: DataFrame, carry: Seq[String]): Seq[String] =
    df.columns.toSeq.filterNot(carry.contains)

  // ---- A1: raw APFU pipeline (reference: _minerals.py:83-100) --------------

  def rawApfu(spec: MineralSpec, df: DataFrame, carry: Seq[String] = Nil,
      units: Units = Units.WtPct): DataFrame = {
    val oxideDf = if (units == Units.Moles) Convert.toOxides(df, carry) else df
    val pre = spec.preprocess(oxideDf)
    val apfu = spec.chargeBasis match {
      case Some(tc) =>
        val cm = Convert.toApfuByCharge(pre, tc, Units.WtPct, carry)
        // rename oxide-named columns to ion notation (Chlorite._raw_apfu,
        // _minerals.py:893-897)
        valueCols(cm, carry).foldLeft(cm) { (d, c) =>
          d.withColumnRenamed(c, Chem.oxideToIonCol(c))
        }
      case None =>
        Convert.toApfu(pre, nOxygens = Some(spec.nOxygens), units = Units.WtPct, carry = carry)
    }
    applyValenceSplits(spec, apfu, carry)
  }

  /** Apply each valence split in order; missing element is tolerated
    * (reference: _minerals.py:165-189). */
  def applyValenceSplits(spec: MineralSpec, apfu: DataFrame, carry: Seq[String]): DataFrame =
    spec.valenceSplits.foldLeft(apfu) { (d, vs) =>
      val nOxy = vs.nOxygens.getOrElse(spec.nOxygens)
      val idealCat = vs.idealCations.orElse(spec.idealCations).getOrElse(
        throw new IllegalArgumentException(
          s"ideal_cations must be set for split of ${vs.element}"))
      try Valence.splitValence(d, valueCols(d, carry), vs.element, vs.method, nOxy, idealCat)
      catch { case _: NoSuchElementException => d }
    }

  // ---- A2/A3: greedy sequential site allocation ---------------------------

  /** Flattened site-allocation column name ("Z:Si{4+}", "Z:_unallocated").
    * The reference uses pandas MultiIndex columns (_minerals.py:191-218);
    * we flatten with ':' (never appears in formula names). */
  def siteCol(site: String, ion: String): String = s"$site:$ion"

  /** Greedy sequential site allocation, one Project layer per take.
    * The single-select form re-inlined the remaining/pool chains into
    * every later take (the chain doubles per ion — site C of amphibole
    * alone is 2^8 copies); naming each take keeps the chains as plain
    * column references, O(k^2) small nodes instead of O(2^k).
    * Returns the frame with the apfu columns STILL PRESENT plus the
    * "site:ion"/"site:_unallocated" take columns (in allocation order)
    * — callers project what they need. */
  def allocateSitesKeepAll(spec: MineralSpec, apfu: DataFrame,
      carry: Seq[String] = Nil): (DataFrame, Seq[String]) = {
    val ions = valueCols(apfu, carry)
    val pool = scala.collection.mutable.Map[String, Column](
      ions.map(c => c -> col(c)): _*)
    var d = apfu
    val ordered = scala.collection.mutable.ListBuffer.empty[String]
    spec.sites.foreach { site =>
      var remaining: Column = lit(site.capacity)
      site.priority.foreach { ion =>
        if (pool.contains(ion)) {
          val tc = siteCol(site.name, ion)
          d = d.withColumn(tc, least(pool(ion), remaining))
          ordered += tc
          pool(ion) = pool(ion) - col(tc)
          remaining = remaining - col(tc)
        }
      }
      val uc = siteCol(site.name, "_unallocated")
      d = d.withColumn(uc, remaining)
      ordered += uc
    }
    (d, ordered.toSeq)
  }

  def allocateSites(spec: MineralSpec, apfu: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val (d, ordered) = allocateSitesKeepAll(spec, apfu, carry)
    d.select(carry.map(col) ++ ordered.map(col): _*)
  }

  def siteAllocations(spec: MineralSpec, df: DataFrame, carry: Seq[String] = Nil,
      units: Units = Units.WtPct): DataFrame =
    allocateSites(spec, rawApfu(spec, df, carry, units), carry)

  /** A4: site-filtered APFU — per-ion sum of allocated amounts across
    * sites, excluding `_unallocated` (reference: _minerals.py:107-127). */
  def apfu(spec: MineralSpec, df: DataFrame, carry: Seq[String] = Nil,
      units: Units = Units.WtPct): DataFrame = {
    val sf = siteAllocations(spec, df, carry, units)
    val byIon = scala.collection.mutable.LinkedHashMap.empty[String, List[String]]
    valueCols(sf, carry).foreach { c =>
      val Array(_, ion) = c.split(":", 2)
      if (ion != "_unallocated") byIon(ion) = byIon.getOrElse(ion, Nil) :+ c
    }
    // pandas groupby(level=1) sorts ion keys lexicographically
    val exprs = byIon.toSeq.sortBy(_._1).map { case (ion, cols) =>
      cols.map(col).reduce(_ + _).as(ion)
    }
    sf.select(carry.map(col) ++ exprs: _*)
  }

  // ---- end members ---------------------------------------------------------

  /** Dispatch to the per-mineral end-member cascade. */
  def endMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String] = Nil,
      units: Units = Units.WtPct): DataFrame = spec.name match {
    case "Garnet" => garnetEndMembers(spec, df, carry, units)
    case "GarnetFe3" => garnetFe3EndMembers(spec, df, carry, units)
    case "Feldspar" => feldsparEndMembers(spec, df, carry, units)
    case "Clinopyroxene" => cpxEndMembers(spec, df, carry, units)
    case "Orthopyroxene" => opxEndMembers(spec, df, carry, units)
    case "Muscovite" => muscoviteEndMembers(spec, df, carry, units)
    case "Biotite" => biotiteEndMembers(spec, df, carry, units)
    case "Staurolite" => stauroliteEndMembers(spec, df, carry, units)
    case "Chlorite" => chloriteEndMembers(spec, df, carry, units)
    case "Epidote" => epidoteEndMembers(spec, df, carry, units)
    case "Amphibole" => amphiboleEndMembers(spec, df, carry, units)
    case "Titanite" => titaniteEndMembers(spec, df, carry, units)
    case "Chloritoid" => chloritoidEndMembers(spec, df, carry, units)
    case "Cordierite" => cordieriteEndMembers(spec, df, carry, units)
    case "Ilmenite" => ilmeniteEndMembers(spec, df, carry, units)
    case "Spinel" => spinelEndMembers(spec, df, carry, units)
    case other => throw new IllegalArgumentException(
      s"$other does not define end-member calculations")
  }

  /** E1 Garnet — Locock-style sequential allocation
    * (reference: _minerals.py:251-299). */
  def garnetEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val a = rawApfu(spec, df, carry, units)
    val z = zc(a) _
    val ca = clip0(z("Ca{2+}")); val mg = clip0(z("Mg{2+}"))
    val fe2 = clip0(z("Fe{2+}")); val fe3 = clip0(z("Fe{3+}"))
    val mn = clip0(z("Mn{2+}")); val cr = clip0(z("Cr{3+}"))
    val b = bind(a,
      "_uvr" -> least(cr / 2.0, ca / 3.0),
      "_caR1" -> clip0(ca - col("_uvr") * 3.0),
      "_adr" -> least(fe3 / 2.0, col("_caR1") / 3.0),
      "_caR2" -> clip0(col("_caR1") - col("_adr") * 3.0),
      "_grs" -> clip0(col("_caR2") / 3.0),
      "_prp" -> clip0(mg / 3.0), "_alm" -> clip0(fe2 / 3.0),
      "_sps" -> clip0(mn / 3.0),
      "_total" -> (col("_uvr") + col("_adr") + col("_grs") + col("_prp") +
        col("_alm") + col("_sps")))
    val total = col("_total")
    b.select(carry.map(col) ++ Seq(
      pct(col("_prp"), total).as("Prp"), pct(col("_alm"), total).as("Alm"),
      pct(col("_sps"), total).as("Sps"), pct(col("_grs"), total).as("Grs"),
      pct(col("_adr"), total).as("Adr"), pct(col("_uvr"), total).as("Uvr")): _*)
  }

  /** E2 GarnetFe3 — least-squares end members (reference:
    * _minerals.py:310-380). The reference solves a per-row lstsq against a
    * constant 7x6 ideal-cation matrix; because the matrix is constant and
    * full-rank, the solution is the constant linear map pinv(A)=(AtA)^-1 At
    * applied to the cation vector — precomputed here on the driver, so the
    * whole operator stays a codegen'd Column cascade (no UDF). */
  def garnetFe3EndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val oxideDf = if (units == Units.Moles) Convert.toOxides(df, carry) else df
    val a = Convert.toApfu(oxideDf, nOxygens = Some(spec.nOxygens), carry = carry)
    val z = zc(a) _
    val feCols = valueCols(a, carry).filter(c => Chem.elementOf(c) == "Fe")
    val feTotal = if (feCols.isEmpty) lit(0.0) else feCols.map(col).reduce(_ + _)
    // b = [Ca, Mg, Fe, Cr, Mn, Al, Si]
    val b: Seq[Column] = Seq(
      z("Ca{2+}"), z("Mg{2+}"), feTotal, z("Cr{3+}"), z("Mn{2+}"),
      z("Al{3+}"), z("Si{4+}"))
    val names = Seq("Prp", "Alm", "Sps", "Grs", "Adr", "Uvr")
    // A rows: [Ca Mg Fe Cr Mn Al Si] per end member (transposed to 7x6).
    val aM: Array[Array[Double]] = Array(
      Array(0, 3, 0, 0, 0, 2, 3), // Prp
      Array(0, 0, 3, 0, 0, 2, 3), // Alm
      Array(0, 0, 0, 0, 3, 2, 3), // Sps
      Array(3, 0, 0, 0, 0, 2, 3), // Grs
      Array(3, 0, 2, 0, 0, 0, 3), // Adr
      Array(3, 0, 0, 2, 0, 0, 3)  // Uvr
    ).map(_.map(_.toDouble))
    val pinv = LinAlg.pseudoInverseOfTranspose(aM) // 6x7
    val raw: Seq[Column] = names.indices.map { i =>
      clip0(b.indices.map(j => b(j) * lit(pinv(i)(j))).reduce(_ + _))
    }
    val total = raw.reduce(_ + _)
    val safe = when(total === 0.0, 1.0).otherwise(total)
    a.select(carry.map(col) ++ names.zip(raw).map { case (n, x) =>
      (x / safe * 100.0).as(n)
    }: _*)
  }

  /** E3 Feldspar — M-site fractions (reference: _minerals.py:403-417). */
  def feldsparEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val sf = siteAllocations(spec, df, carry, units)
    val mIons = Seq("Ca{2+}", "Na{+}", "K{+}").filter(i => sf.columns.contains(siteCol("M", i)))
    val mTotal = mIons.map(i => col(siteCol("M", i))).reduceOption(_ + _).getOrElse(lit(0.0))
    val mapping = Map("Ca{2+}" -> "An", "Na{+}" -> "Ab", "K{+}" -> "Or")
    // no divide guard in the reference: 0/0 -> NaN (numpy semantics)
    val safe = when(mTotal === 0.0, lit(Double.NaN)).otherwise(mTotal)
    sf.select(carry.map(col) ++ mIons.map { i =>
      (col(siteCol("M", i)) / safe * 100.0).as(mapping(i))
    }: _*)
  }

  /** E4 Clinopyroxene — IMA/Morimoto sequential allocation
    * (reference: _minerals.py:466-519). */
  def cpxEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val a = rawApfu(spec, df, carry, units)
    val z = zc(a) _
    val si = z("Si{4+}"); val al = z("Al{3+}"); val cr = z("Cr{3+}")
    val fe3 = z("Fe{3+}"); val fe2 = z("Fe{2+}"); val mg = z("Mg{2+}")
    val ca = z("Ca{2+}"); val na = z("Na{+}")
    val mgFe = mg + fe2
    val mgFeSafe = when(mgFe === 0.0, 1.0).otherwise(mgFe)
    val b = bind(a,
      "_alIv" -> least(clip0(lit(2.0) - si), al),
      "_alVi" -> clip0(al - col("_alIv")),
      "_krs" -> least(na, cr),
      "_ae" -> least(clip0(na - col("_krs")), fe3),
      "_jd" -> least(clip0(na - col("_krs") - col("_ae")), col("_alVi")),
      "_cats" -> least(clip0(col("_alVi") - col("_jd")) / 2.0, ca),
      "_caRem" -> clip0(ca - col("_cats")),
      "_di" -> least(col("_caRem") * mg / mgFeSafe, mg),
      "_hd" -> least(col("_caRem") * fe2 / mgFeSafe, fe2),
      "_wo" -> clip0(col("_caRem") - col("_di") - col("_hd")),
      "_en" -> (clip0(mg - col("_di")) / 2.0),
      "_fs" -> (clip0(fe2 - col("_hd")) / 2.0),
      "_raw" -> (col("_krs") + col("_ae") + col("_jd") + col("_cats") +
        col("_wo") + col("_di") + col("_hd") + col("_en") + col("_fs")))
    val raw = col("_raw")
    b.select(carry.map(col) ++ Seq(
      pct(col("_jd"), raw).as("Jd"), pct(col("_ae"), raw).as("Ae"),
      pct(col("_di"), raw).as("Di"), pct(col("_hd"), raw).as("Hd"),
      pct(col("_krs"), raw).as("Kosmochlor"),
      pct(col("_cats"), raw).as("CaTs"), pct(col("_wo"), raw).as("Wo"),
      pct(col("_en"), raw).as("En"), pct(col("_fs"), raw).as("Fs")): _*)
  }

  /** E5 Orthopyroxene — sequential allocation, NOT normalized to 100
    * (reference: _minerals.py:554-608). */
  def opxEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val a = rawApfu(spec, df, carry, units)
    val has = a.columns.toSet
    val si0 = if (has("Si{4+}")) clip0(col("Si{4+}")) else lit(0.0)
    val al0 = if (has("Al{3+}")) clip0(col("Al{3+}")) else lit(0.0)
    val mgts = clip0(al0 - (lit(2.0) - si0))
    val tSi = least(si0, lit(2.0))
    val tAl = least(al0 - mgts, lit(2.0) - tSi)
    // pool after T-site
    val pool = scala.collection.mutable.Map[String, Column]()
    a.columns.filterNot(carry.contains).foreach(c => pool(c) = col(c))
    if (has("Si{4+}")) pool("Si{4+}") = col("Si{4+}") - tSi
    if (has("Al{3+}")) pool("Al{3+}") = col("Al{3+}") - tAl
    var m1Rem: Column = lit(1.0)
    Seq("Al{3+}", "Ti{4+}", "Cr{3+}", "Fe{3+}", "Mg{2+}", "Fe{2+}").foreach { ion =>
      if (pool.contains(ion)) {
        val take = least(pool(ion), m1Rem)
        pool(ion) = pool(ion) - take
        m1Rem = m1Rem - take
      }
    }
    def pooled(n: String): Column = pool.get(n).map(clip0).getOrElse(lit(0.0))
    val ca = pooled("Ca{2+}"); val mn = pooled("Mn{2+}")
    val fe2 = pooled("Fe{2+}"); val mg = pooled("Mg{2+}")
    val wo = ca
    val enFsCap = clip0(lit(1.0) - wo - mn)
    val mgFe = mg + fe2
    val mgFeSafe = when(mgFe === 0.0, 1.0).otherwise(mgFe)
    val en = enFsCap * (mg / mgFeSafe)
    val fs = enFsCap * (fe2 / mgFeSafe)
    a.select(carry.map(col) ++ Seq(
      (mgts * 100.0).as("MgTs"), (wo * 100.0).as("Wo"),
      (en * 100.0).as("En"), (fs * 100.0).as("Fs")): _*)
  }

  /** E6 Muscovite — MinPlot dioctahedral mica
    * (reference: _minerals.py:654-705). */
  def muscoviteEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val a = rawApfu(spec, df, carry, units)
    val z = zc(a) _
    val si = z("Si{4+}"); val al = z("Al{3+}"); val ti = z("Ti{4+}")
    val cr = z("Cr{3+}"); val fe = z("Fe{2+}"); val mn = z("Mn{2+}")
    val mg = z("Mg{2+}"); val k = z("K{+}"); val na = z("Na{+}"); val ca = z("Ca{2+}")
    val alIv = least(clip0(lit(4.0) - si), al)
    val alVi = al - alIv
    val mSum = alVi + ti + cr + fe + mn + mg
    val xTri = least(clip0(mSum - 2.0), lit(1.0))
    val xDi = lit(1.0) - xTri
    val xm = least(clip0(alVi - 1.0), lit(1.0))
    val xCel = lit(1.0) - xm
    val mgFe = mg + fe
    val xMg = when(mgFe > 0.0, mg / when(mgFe === 0.0, 1.0).otherwise(mgFe)).otherwise(0.0)
    val xMgCel = xMg * xCel
    val xFeCel = xCel - xMgCel
    val alkali = k + na + ca
    val xMpm = alkali * xm
    val xPrl = xm - xMpm
    val alkSafe = when(alkali === 0.0, 1.0).otherwise(alkali)
    val xMs = when(alkali > 0.0, k / alkSafe * xMpm).otherwise(0.0)
    val xPg = when(alkali > 0.0, na / alkSafe * xMpm).otherwise(0.0)
    val xMrg = when(alkali > 0.0, ca / alkSafe * xMpm).otherwise(0.0)
    a.select(carry.map(col) ++ Seq(
      (xMgCel * xDi * 100.0).as("Al-Celadonite"),
      (xFeCel * xDi * 100.0).as("Fe-Al-Celadonite"),
      (xPrl * xDi * 100.0).as("Pyrophyllite"),
      (xMrg * xDi * 100.0).as("Margarite"),
      (xPg * xDi * 100.0).as("Paragonite"),
      (xMs * xDi * 100.0).as("Muscovite"),
      (xTri * 100.0).as("Trioctahedral")): _*)
  }

  /** E7 Biotite — MinPlot trioctahedral mica
    * (reference: _minerals.py:752-789). */
  def biotiteEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val a = rawApfu(spec, df, carry, units)
    val z = zc(a) _
    val si = z("Si{4+}"); val al = z("Al{3+}"); val ti = z("Ti{4+}")
    val cr = z("Cr{3+}"); val fe = z("Fe{2+}"); val mn = z("Mn{2+}"); val mg = z("Mg{2+}")
    val alIv = least(clip0(lit(4.0) - si), al)
    val alVi = al - alIv
    val mSum = alVi + ti + cr + fe + mn + mg
    val xTri = least(clip0(mSum - 2.0), lit(1.0))
    val xDi = lit(1.0) - xTri
    val xPhlAnn = least(clip0(si - 2.0), lit(1.0))
    val xSidEas = lit(1.0) - xPhlAnn
    val mgFe = mg + fe
    val xMg = when(mgFe > 0.0, mg / when(mgFe === 0.0, 1.0).otherwise(mgFe)).otherwise(0.0)
    val xPhl = xPhlAnn * xMg * xTri
    val xAnn = (xPhlAnn - xPhlAnn * xMg) * xTri
    val xEas = xSidEas * xMg * xTri
    val xSid = (xSidEas - xSidEas * xMg) * xTri
    a.select(carry.map(col) ++ Seq(
      (xPhl * 100.0).as("Phlogopite"), (xAnn * 100.0).as("Annite"),
      (xEas * 100.0).as("Eastonite"), (xSid * 100.0).as("Siderophyllite"),
      (xDi * 100.0).as("Dioctahedral")): _*)
  }

  /** E8 Staurolite — R2+ fractions (reference: _minerals.py:835-848). */
  def stauroliteEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val a = rawApfu(spec, df, carry, units)
    val z = zc(a) _
    val fe = z("Fe{2+}"); val mg = z("Mg{2+}"); val zn = z("Zn{2+}"); val mn = z("Mn{2+}")
    val r2 = fe + mg + zn + mn
    a.select(carry.map(col) ++ Seq(
      pct(fe, r2).as("Fe-Staurolite"), pct(mg, r2).as("Mg-Staurolite"),
      pct(zn, r2).as("Zn-Staurolite"), pct(mn, r2).as("Mn-Staurolite")): _*)
  }

  /** E9 Chlorite — MinPlot with 28-charge APFU
    * (reference: _minerals.py:899-919). */
  def chloriteEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val a = rawApfu(spec, df, carry, units)
    val z = zc(a) _
    val si = z("Si{4+}"); val fe = z("Fe{2+}"); val mg = z("Mg{2+}")
    val r2 = mg + fe
    val xMg = when(r2 > 0.0, mg / when(r2 === 0.0, 1.0).otherwise(r2)).otherwise(0.0)
    val xNormal = least(clip0(si - 2.0), lit(1.0))
    val xTsch = lit(1.0) - xNormal
    a.select(carry.map(col) ++ Seq(
      (xNormal * xMg * 100.0).as("Clinochlore"),
      (xNormal * (lit(1.0) - xMg) * 100.0).as("Chamosite"),
      (xTsch * xMg * 100.0).as("Mg-Sudoite"),
      (xTsch * (lit(1.0) - xMg) * 100.0).as("Fe-Sudoite")): _*)
  }

  /** E10 Epidote — M-site trivalent fractions
    * (reference: _minerals.py:978-999). */
  def epidoteEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val a = rawApfu(spec, df, carry, units)
    val z = zc(a) _
    val al = z("Al{3+}"); val fe3 = z("Fe{3+}"); val mn3 = z("Mn{3+}")
    val v3 = z("V{3+}"); val cr3 = z("Cr{3+}")
    val m = al + fe3 + mn3 + v3 + cr3
    a.select(carry.map(col) ++ Seq(
      pct(al, m).as("Clinozoisite"), pct(fe3, m).as("Epidote"),
      pct(mn3, m).as("Piemontite"), pct(v3, m).as("Mukhinite"),
      pct(cr3, m).as("Tawmawite")): _*)
  }

  /** E11 Amphibole — group classification x binary mixing factors
    * (reference: _minerals.py:1055-1132). */
  def amphiboleEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val sf = siteAllocations(spec, df, carry, units)
    def s(site: String, ion: String): Column =
      if (sf.columns.contains(siteCol(site, ion))) col(siteCol(site, ion)) else lit(0.0)
    val aTotal = s("A", "K{+}") + s("A", "Na{+}")
    val naB = s("B", "Na{+}"); val caB = s("B", "Ca{2+}")
    val mgC = s("C", "Mg{2+}"); val fe2C = s("C", "Fe{2+}")
    val alT = s("T", "Al{3+}")
    def b2d(c: Column): Column = when(c, 1.0).otherwise(0.0)
    val isCalcic = b2d(caB >= naB)
    val isSodicCalcic = b2d((naB > caB) && (caB > 0.0))
    val isSodic = b2d((naB > 0.0) && (caB === 0.0))
    val mgFeC = mgC + fe2C
    val mgFeSafe = when(mgFeC === 0.0, 1.0).otherwise(mgFeC)
    val b = bind(sf,
      "_isCalcic" -> isCalcic, "_isSodicCalcic" -> isSodicCalcic,
      "_isSodic" -> isSodic,
      "_xMg" -> (mgC / mgFeSafe), "_xFe" -> (fe2C / mgFeSafe),
      "_xTsch" -> least(alT / 8.0, lit(1.0)),
      "_xEd" -> least(aTotal, lit(1.0)))
    val cal = col("_isCalcic"); val sodCal = col("_isSodicCalcic")
    val sod = col("_isSodic")
    val xMg = col("_xMg"); val xFe = col("_xFe")
    val xTschermak = col("_xTsch"); val xEdenite = col("_xEd")
    val one = lit(1.0)
    val out = Seq(
      ("Tremolite", cal * xMg * (one - xEdenite) * (one - xTschermak)),
      ("Actinolite", cal * xFe * (one - xEdenite) * (one - xTschermak)),
      ("Edenite", cal * xMg * xEdenite * (one - xTschermak)),
      ("Ferro-Edenite", cal * xFe * xEdenite * (one - xTschermak)),
      ("Pargasite", cal * xMg * xEdenite * xTschermak),
      ("Ferro-Pargasite", cal * xFe * xEdenite * xTschermak),
      ("Tschermakite", cal * (one - xEdenite) * xTschermak),
      ("Richterite", sodCal * xMg * (one - xTschermak)),
      ("Winchite", sodCal * xFe * (one - xTschermak)),
      ("Glaucophane", sod * xMg * xTschermak),
      ("Ferro-Glaucophane", sod * xFe * xTschermak),
      ("Riebeckite", sod * xFe * (one - xTschermak)),
      ("Magnesio-Riebeckite", sod * xMg * (one - xTschermak)))
    b.select(carry.map(col) ++ out.map { case (n, x) => (x * 100.0).as(n) }: _*)
  }

  /** E12 Titanite — B-site fractions (reference: _minerals.py:1200-1225). */
  def titaniteEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val a = rawApfu(spec, df, carry, units)
    val z = zc(a) _
    val ti = z("Ti{4+}"); val al = z("Al{3+}"); val fe3 = z("Fe{3+}")
    val sn = z("Sn{4+}"); val nb = z("Nb{5+}"); val zr = z("Zr{4+}")
    val cr = z("Cr{3+}"); val v = z("V{3+}"); val mg = z("Mg{2+}")
    val b = ti + al + fe3 + sn + nb + zr + cr + v + mg
    val other = nb + zr + cr + v + mg
    a.select(carry.map(col) ++ Seq(
      pct(ti, b).as("Ttn"), pct(al, b).as("Al-Ttn"), pct(fe3, b).as("Fe-Ttn"),
      pct(sn, b).as("Mal"), pct(other, b).as("Other")): _*)
  }

  /** E13 Chloritoid — M1 R2+ fractions (reference: _minerals.py:1274-1287). */
  def chloritoidEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val a = rawApfu(spec, df, carry, units)
    val z = zc(a) _
    val fe2 = z("Fe{2+}"); val mg = z("Mg{2+}"); val mn = z("Mn{2+}")
    val r2 = fe2 + mg + mn
    a.select(carry.map(col) ++ Seq(
      pct(fe2, r2).as("Cld"), pct(mg, r2).as("Mgcld"), pct(mn, r2).as("Mncld")): _*)
  }

  /** E14 Cordierite — A-site channel filling + B-site R2+ fractions
    * (reference: _minerals.py:1336-1357). */
  def cordieriteEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val a = rawApfu(spec, df, carry, units)
    val z = zc(a) _
    val fe = z("Fe{2+}"); val mg = z("Mg{2+}"); val mn = z("Mn{2+}")
    val na = z("Na{+}"); val k = z("K{+}"); val ca = z("Ca{2+}")
    val r2 = fe + mg + mn
    val xFe = frac(fe, r2); val xMg = frac(mg, r2); val xMn = frac(mn, r2)
    val aTotal = least(na + k + ca, lit(1.0))
    val bFrac = lit(1.0) - aTotal
    a.select(carry.map(col) ++ Seq(
      (aTotal * 100.0).as("H₂O-Crd"), (xMg * bFrac * 100.0).as("Mg-Crd"),
      (xFe * bFrac * 100.0).as("Fe-Crd"), (xMn * bFrac * 100.0).as("Mn-Crd")): _*)
  }

  /** E15 Ilmenite — A x B site-fraction products from capacity-clipped
    * allocations (reference: _minerals.py:1408-1451). */
  def ilmeniteEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val sf = siteAllocations(spec, df, carry, units)
    def s(site: String, ion: String): Column =
      if (sf.columns.contains(siteCol(site, ion))) col(siteCol(site, ion)) else lit(0.0)
    val fe2A = s("A", "Fe{2+}"); val fe3A = s("A", "Fe{3+}")
    val mgA = s("A", "Mg{2+}"); val mnA = s("A", "Mn{2+}")
    val tiB = s("B", "Ti{4+}"); val fe3B = s("B", "Fe{3+}")
    val alB = s("B", "Al{3+}"); val crB = s("B", "Cr{3+}")
    val b1 = bind(sf,
      "_aTot" -> (fe2A + fe3A + mgA + mnA),
      "_bTot" -> (tiB + fe3B + alB + crB))
    val b2 = bind(b1,
      "_xFe2A" -> frac(fe2A, col("_aTot")), "_xMgA" -> frac(mgA, col("_aTot")),
      "_xMnA" -> frac(mnA, col("_aTot")), "_xFe3A" -> frac(fe3A, col("_aTot")),
      "_xTiB" -> frac(tiB, col("_bTot")), "_xFe3B" -> frac(fe3B, col("_bTot")),
      "_xCrB" -> frac(crB, col("_bTot")))
    val b3 = bind(b2,
      "_ilm" -> (col("_xFe2A") * col("_xTiB")),
      "_gk" -> (col("_xMgA") * col("_xTiB")),
      "_pph" -> (col("_xMnA") * col("_xTiB")),
      "_hem" -> (col("_xFe3A") * col("_xFe3B")),
      "_chr" -> (col("_xFe3A") * col("_xCrB")),
      "_total" -> (col("_ilm") + col("_gk") + col("_pph") + col("_hem") + col("_chr")))
    val total = col("_total")
    b3.select(carry.map(col) ++ Seq(
      pct(col("_ilm"), total).as("Ilm"), pct(col("_gk"), total).as("Gk"),
      pct(col("_pph"), total).as("Pph"), pct(col("_hem"), total).as("Hem"),
      pct(col("_chr"), total).as("Chr")): _*)
  }

  /** E16 Spinel — inverse-spinel T x M^2 fraction products
    * (reference: _minerals.py:1529-1582). */
  def spinelEndMembers(spec: MineralSpec, df: DataFrame, carry: Seq[String],
      units: Units): DataFrame = {
    val a = rawApfu(spec, df, carry, units)
    val z = zc(a) _
    val mg = z("Mg{2+}"); val fe2 = z("Fe{2+}"); val zn = z("Zn{2+}")
    val mn = z("Mn{2+}"); val fe3 = z("Fe{3+}"); val al = z("Al{3+}")
    val cr = z("Cr{3+}"); val ti = z("Ti{4+}")
    val b1 = bind(a,
      "_tTot" -> (mg + fe2 + zn + mn + fe3 + al + cr + ti),
      "_mTot" -> (al + cr + fe3 + ti + mg + fe2 + mn))
    val b2 = bind(b1,
      "_xMgT" -> frac(mg, col("_tTot")), "_xFe2T" -> frac(fe2, col("_tTot")),
      "_xZnT" -> frac(zn, col("_tTot")), "_xMnT" -> frac(mn, col("_tTot")),
      "_xMgM" -> frac(mg, col("_mTot")), "_xAlM" -> frac(al, col("_mTot")),
      "_xCrM" -> frac(cr, col("_mTot")), "_xFe3M" -> frac(fe3, col("_mTot")),
      "_xTiM" -> frac(ti, col("_mTot")), "_xFe2M" -> frac(fe2, col("_mTot")),
      "_xMnM" -> frac(mn, col("_mTot")))
    val b3 = bind(b2,
      "_spl" -> (col("_xMgT") * col("_xAlM") * col("_xAlM")),
      "_herc" -> (col("_xFe2T") * col("_xAlM") * col("_xAlM")),
      "_chrm" -> (col("_xFe2T") * col("_xCrM") * col("_xCrM")),
      "_mtc" -> (col("_xFe2T") * col("_xFe3M") * col("_xFe3M")),
      "_gahn" -> (col("_xZnT") * col("_xAlM") * col("_xAlM")),
      "_frank" -> (col("_xFe2T") * col("_xTiM") * col("_xFe2M")),
      "_jac" -> (col("_xMnT") * col("_xAlM") * col("_xAlM")),
      "_ulv" -> (col("_xMgT") * col("_xTiM") * col("_xMgM")),
      "_spss" -> (col("_xMnT") * col("_xMnM") * col("_xMnM")),
      "_total" -> (col("_spl") + col("_herc") + col("_chrm") + col("_mtc") +
        col("_gahn") + col("_frank") + col("_jac") + col("_ulv") + col("_spss")))
    val total = col("_total")
    b3.select(carry.map(col) ++ Seq(
      pct(col("_spl"), total).as("Spl"), pct(col("_herc"), total).as("Herc"),
      pct(col("_chrm"), total).as("Chrm"), pct(col("_mtc"), total).as("Mtc"),
      pct(col("_gahn"), total).as("Gahn"), pct(col("_frank"), total).as("Frank"),
      pct(col("_jac"), total).as("Jac"), pct(col("_ulv"), total).as("Ulv"),
      pct(col("_spss"), total).as("Spss")): _*)
  }
}

/** Tiny dense linear algebra for driver-side constant precomputation. */
object LinAlg {
  /** Given A (m x n, m >= n, full column rank), return pinv(A) = (AtA)^-1 At
    * as an n x m matrix, via Gauss-Jordan on the n x n normal matrix. */
  def pseudoInverseOfTranspose(a: Array[Array[Double]]): Array[Array[Double]] = {
    // `a` is given row-per-end-member (n x m); treat columns as A's columns:
    // A = a^T (m x n). AtA = a * a^T (n x n). pinv = (AtA)^-1 * a.
    val n = a.length; val m = a(0).length
    val ata = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- 0 until n)
      ata(i)(j) = (0 until m).map(k => a(i)(k) * a(j)(k)).sum
    val inv = invert(ata)
    val out = Array.ofDim[Double](n, m)
    for (i <- 0 until n; j <- 0 until m)
      out(i)(j) = (0 until n).map(k => inv(i)(k) * a(k)(j)).sum
    out
  }

  def invert(mIn: Array[Array[Double]]): Array[Array[Double]] = {
    val n = mIn.length
    val m = mIn.map(_.clone())
    val inv = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (c <- 0 until n) {
      val piv = (c until n).maxBy(r => math.abs(m(r)(c)))
      require(math.abs(m(piv)(c)) > 1e-12, "singular matrix")
      val tmp = m(c); m(c) = m(piv); m(piv) = tmp
      val tmp2 = inv(c); inv(c) = inv(piv); inv(piv) = tmp2
      val p = m(c)(c)
      for (j <- 0 until n) { m(c)(j) /= p; inv(c)(j) /= p }
      for (r <- 0 until n if r != c) {
        val f = m(r)(c)
        if (f != 0.0) for (j <- 0 until n) {
          m(r)(j) -= f * m(c)(j); inv(r)(j) -= f * inv(c)(j)
        }
      }
    }
    inv
  }
}
