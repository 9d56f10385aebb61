package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.chem.Chem
import graft.petro.{Cipw, Convert, Minerals, PetroFrame, Stoich, Thermo, Units}

/** Petro-operator query track for the DuckDB oracle.
  *
  * The domain operators (SURVEY.md §2.3-§2.6) run over a synthetic
  * oxide table derived deterministically from `lineitem` numerics, so the
  * oracle can verify the *arithmetic semantics* of every cascade. The
  * oracle SQL is generated from the same driver-side constants
  * (molecular weights etc.) the Spark cascades embed — both sides see
  * bit-identical literals; computed outputs are rounded to 6 decimals on
  * both sides to absorb summation-order effects.
  */
object PetroQueries {

  /** Synthetic oxide columns (plausible wt% ranges) from lineitem. */
  val OXIDES: Seq[String] = Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO",
    "MnO", "Na2O", "K2O", "TiO2", "Cr2O3", "P2O5")

  def oxFrame(s: SparkSession, dir: String): DataFrame = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    li.select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
      col("l_returnflag").as("grp"),
      col("l_quantity").as("wt"),
      (lit(35.0) + col("l_quantity") * 0.3).as("SiO2"),
      (lit(15.0) + col("l_discount") * 50.0).as("Al2O3"),
      (lit(18.0) + (col("l_partkey") % 10).cast("double") * 1.1).as("FeO"),
      (lit(2.0) + (col("l_suppkey") % 5).cast("double") * 1.3).as("MgO"),
      (lit(1.0) + col("l_tax") * 25.0).as("CaO"),
      (lit(0.5) + (col("l_linenumber") % 3).cast("double") * 0.7).as("MnO"),
      (lit(0.1) + col("l_discount") * 10.0).as("Na2O"),
      (lit(0.05) + col("l_tax") * 5.0).as("K2O"),
      (lit(0.3) + (col("l_orderkey") % 7).cast("double") * 0.1).as("TiO2"),
      ((col("l_partkey") % 3).cast("double") * 0.15).as("Cr2O3"),
      (lit(0.1) + (col("l_suppkey") % 4).cast("double") * 0.05).as("P2O5"))
  }

  /** Same synthetic table in DuckDB SQL (identical literals + op order). */
  val OX_SQL: String =
    """SELECT l_orderkey*10 + l_linenumber AS id, l_returnflag AS grp,
       l_quantity AS wt,
       35.0::DOUBLE + l_quantity*0.3::DOUBLE AS "SiO2",
       15.0::DOUBLE + l_discount*50.0::DOUBLE AS "Al2O3",
       18.0::DOUBLE + (l_partkey % 10)*1.1::DOUBLE AS "FeO",
       2.0::DOUBLE + (l_suppkey % 5)*1.3::DOUBLE AS "MgO",
       1.0::DOUBLE + l_tax*25.0::DOUBLE AS "CaO",
       0.5::DOUBLE + (l_linenumber % 3)*0.7::DOUBLE AS "MnO",
       0.1::DOUBLE + l_discount*10.0::DOUBLE AS "Na2O",
       0.05::DOUBLE + l_tax*5.0::DOUBLE AS "K2O",
       0.3::DOUBLE + (l_orderkey % 7)*0.1::DOUBLE AS "TiO2",
       (l_partkey % 3)*0.15::DOUBLE AS "Cr2O3",
       0.1::DOUBLE + (l_suppkey % 4)*0.05::DOUBLE AS "P2O5" FROM lineitem"""

  // ---- SQL generation helpers (constants interpolated from Chem) ----------

  private def qi(c: String): String = "\"" + c + "\""
  private def molesSql(c: String): String = s"(${qi(c)} / ${Chem.mw(c)})"
  private val ionCols: Seq[String] = OXIDES.map(Chem.oxideToIonCol)
  private val oxySumSql: String =
    OXIDES.map(c => s"${molesSql(c)} * ${Chem.oxygensPer(c)}").mkString(" + ")
  /** SELECT list for to_apfu(n_oxygens=12) over the ox CTE. */
  private val apfuSelectSql: String = OXIDES.map { c =>
    s"${molesSql(c)} * ${Chem.cationsPer(c)} * (12.0 / ($oxySumSql)) AS ${qi(Chem.oxideToIonCol(c))}"
  }.mkString(", ")

  /** Droop split exprs over the apfu CTE (garnet: nOxy=12, ideal=8). */
  private val apfuSumSql: String = ionCols.map(qi).mkString(" + ")
  private val droopHighSql: String = {
    val f = s"24.0 * (1.0 - 8.0 / ($apfuSumSql))"
    s"CASE WHEN ($apfuSumSql) = 0.0 THEN 0.0 ELSE GREATEST($f, 0.0) END"
  }
  private val feLowSql = s"""GREATEST("Fe{2+}" - $droopHighSql, 0.0)"""
  private val feHighSql = s""""Fe{2+}" - $feLowSql"""
  /** SELECT list producing the split apfu columns (order preserved).
    * Reference fidelity (_calc.py:835-842): the low column keeps the
    * TOTAL element APFU (rename only); only the high column is the
    * split estimate. */
  private val splitSelectSql: String = ionCols.flatMap { c =>
    if (c == "Fe{2+}") Seq(s""""Fe{2+}" AS "Fe{2+}"""", s"""$feHighSql AS "Fe{3+}"""")
    else Seq(s"${qi(c)} AS ${qi(c)}")
  }.mkString(", ")

  private def roundAll(df: DataFrame, carry: Seq[String], scale: Int = 6): DataFrame =
    df.select(carry.map(col) ++
      df.columns.filterNot(carry.contains).map(c => round(col(c), scale).as(c)): _*)

  private def wrap(inner: String): String =
    s"""WITH ox AS ($OX_SQL) $inner"""

  // ---- queries -------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // U2: wt% -> molar proportions
    "p01_moles" -> ((s, dir) => {
      val m = Convert.toMoles(oxFrame(s, dir), Seq("id"))
      roundAll(m, Seq("id")).orderBy("id")
    }),

    // U3: row-normalize to 100
    "p02_normalize" -> ((s, dir) => {
      val n = Convert.normalize(oxFrame(s, dir).drop("grp", "wt"), Seq("id"))
      roundAll(n, Seq("id")).orderBy("id")
    }),

    // U5: oxides -> APFU (12 oxygens, garnet basis), ion-named output
    "p03_apfu_garnet" -> ((s, dir) => {
      val a = Convert.toApfu(oxFrame(s, dir).drop("grp", "wt"),
        nOxygens = Some(12.0), carry = Seq("id"))
      roundAll(a, Seq("id")).orderBy("id")
    }),

    // V1+V3: Droop Fe3+ split on garnet APFU
    "p04_droop_split" -> ((s, dir) => {
      val a = Minerals.rawApfu(Minerals.Grt, oxFrame(s, dir).drop("grp", "wt"),
        carry = Seq("id"))
      roundAll(a, Seq("id")).orderBy("id")
    }),

    // E1: garnet end members (flagship cascade)
    "p05_garnet_endmembers" -> ((s, dir) => {
      val e = Minerals.endMembers(Minerals.Grt, oxFrame(s, dir).drop("grp", "wt"),
        carry = Seq("id"))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // U13+U14: alumina saturation + Shand classification
    "p06_alumina_shand" -> ((s, dir) => {
      val ox = oxFrame(s, dir)
      val as = Convert.aluminaSaturation(ox, Seq("id"))
      as.select(col("id"),
        round(col("A/NK"), 6).as("ank"),
        round(col("A/CNK"), 6).as("acnk"),
        Convert.shandClass(col("A/NK"), col("A/CNK")).as("shand"))
        .orderBy("id")
    }),

    // U15: oxide ratios
    "p07_oxide_ratios" -> ((s, dir) => {
      val r = Convert.oxideRatios(oxFrame(s, dir).drop("grp", "wt"), Seq("id"))
      roundAll(r, Seq("id")).orderBy("id")
    }),

    // U9: FeO -> Fe2O3 stoichiometric recompute
    "p08_feo_to_fe2o3" -> ((s, dir) => {
      val d = Convert.feoToFe2o3(oxFrame(s, dir))
      d.select(col("id"), round(col("Fe2O3"), 6).as("Fe2O3")).orderBy("id")
    }),

    // U12: apatite correction
    "p09_apatite_correction" -> ((s, dir) => {
      val d = Convert.apatiteCorrection(oxFrame(s, dir))
      d.select(col("id"), round(col("CaO"), 6).as("CaO"), col("P2O5"))
        .orderBy("id")
    }),

    // G2: grouped mean of oxide columns
    "p10_group_mean" -> ((s, dir) => {
      val ox = oxFrame(s, dir)
      ox.groupBy("grp")
        .agg(round(avg("SiO2"), 6).as("SiO2"), round(avg("Al2O3"), 6).as("Al2O3"),
          round(avg("FeO"), 6).as("FeO"), round(avg("CaO"), 6).as("CaO"))
        .orderBy("grp")
    }),

    // G3: weighted mean (sum(w*x)/sum(w)) per group
    "p11_weighted_mean" -> ((s, dir) => {
      val ox = oxFrame(s, dir)
      ox.groupBy("grp")
        .agg(
          round(sum(col("SiO2") * col("wt")) / sum(col("wt")), 6).as("SiO2"),
          round(sum(col("FeO") * col("wt")) / sum(col("wt")), 6).as("FeO"),
          round(sum(col("MgO") * col("wt")) / sum(col("wt")), 6).as("MgO"))
        .orderBy("grp")
    }),

    // U6: charge-normalized APFU (chlorite 28-charge convention)
    "p12_apfu_by_charge" -> ((s, dir) => {
      val a = Convert.toApfuByCharge(oxFrame(s, dir).drop("grp", "wt"),
        targetCharges = 28.0, carry = Seq("id"))
      roundAll(a, Seq("id")).orderBy("id")
    }),

    // C1: simple CIPW norm (branch-free cascade; full oracle)
    "p13_cipw_simple" -> ((s, dir) => {
      val n = Cipw.cipwNormSimple(oxWithFe2O3(s, dir), carry = Seq("id"))
      roundAll(n, Seq("id")).orderBy("id")
    }),

    // C2: GCDkit CIPW norm (Dataset.map row function; full oracle via a
    // branch-mirroring CASE-cascade SQL)
    "p14_cipw_gcdkit" -> ((s, dir) => {
      val n = Cipw.cipwNorm(oxWithFe2O3(s, dir), carry = Seq("id"),
        normsum = true, completeResults = true)
      roundAll(n, Seq("id")).orderBy("id")
    }),

    // C2+G5: the zero-column-pruning path of the GCDkit norm — drops
    // all-zero minerals after a driver-side max-abs aggregate
    "p53_cipw_pruned" -> ((s, dir) => {
      val n = Cipw.cipwNorm(oxWithFe2O3(s, dir), carry = Seq("id"),
        normsum = true, completeResults = false)
      roundAll(n, Seq("id")).orderBy("id")
    }),

    // C3: CIPWhb norm (hornblende/biotite recasting; full oracle)
    "p15_cipw_hb" -> ((s, dir) => {
      val n = Cipw.cipwNormHb(oxWithFe2O3(s, dir), carry = Seq("id"),
        normsum = true, completeResults = true)
      roundAll(n, Seq("id")).orderBy("id")
    }),

    // A5-A13: stoichiometry scoring (incl. greedy site allocation A2)
    "p16_stoich_garnet" -> ((s, dir) => {
      val r = Stoich.checkStoichiometry(Minerals.Grt,
        oxFrame(s, dir).drop("grp", "wt"), carry = Seq("id"))
      roundAll(r, Seq("id")).orderBy("id")
    }),

    // A2/A3: raw site allocations (capacity-clipped greedy cascade)
    "p17_site_allocation" -> ((s, dir) => {
      val sf = Minerals.siteAllocations(Minerals.Grt,
        oxFrame(s, dir).drop("grp", "wt"), carry = Seq("id"))
      roundAll(sf, Seq("id")).orderBy("id")
    }),

    // S10: shared thermo prep (Fe2O3 merge, apatite, H2O deficit, molar
    // rescale to 100 - O, reframe to system component order)
    "p18_tcbulk_prep" -> ((s, dir) => {
      val prep = Thermo.thermoBulkPrep(oxWithFe2O3(s, dir),
        Thermo.tcSystems("MnNCKFMASHTO"), carry = Seq("id"))
      roundAll(prep, Seq("id")).orderBy("id")
    }),

    // S7: THERMOCALC bulk script line formatting
    "p19_tcbulk_lines" -> ((s, dir) => {
      val (_, lines) = Thermo.tcBulk(oxWithFe2O3(s, dir),
        labelCol = col("id").cast("string"), carry = Seq("id"))
      lines.select("id", "line").orderBy("id")
    }),

    // S8: PerpleX thermodynamic component block (begin/end-wrapped
    // per-component lines; same shared prep as p18/p19 but with the
    // oxygen budget doubled for O2)
    "p81_perplex_block" -> ((s, dir) => {
      Thermo.perplexBulk(oxWithFe2O3(s, dir), carry = Seq("id"))
        .select("id", "block").orderBy("id")
    }),

    // S9: MAGEMin bulk input line formatting (db=mp shares the
    // MnNCKFMASHTO component SET with p18/p19 — identical prep numbers,
    // mp component order + the label;comment;db;sysIn;[oxides];[values];
    // line shape of _accessors.py:890-949)
    "p83_magemin_lines" -> ((s, dir) => {
      Thermo.magemim(oxWithFe2O3(s, dir), labelCol = col("id").cast("string"),
          db = "mp", carry = Seq("id"))
        .select("id", "line").orderBy("id")
    }),

    // U8: convert-dispatcher round trip — wt% -> APFU(12 O) -> wt%,
    // restoring the remembered analytical total through the TotalCol
    // carry; both engines run the FULL cascade (never shortcut to
    // identity), so the oracle verifies the dispatcher arithmetic
    "p84_convert_roundtrip" -> ((s, dir) => {
      val pf = PetroFrame.clean(oxFrame(s, dir).drop("grp", "wt"), Seq("id"))
      val rt = pf.convert(Units.Apfu, nOxy = Some(12.0)).convert(Units.WtPct)
      roundAll(rt.df, Seq("id")).orderBy("id")
    }),

    // G6: profile auto-split — optimal contiguous 2-way partition of
    // column means (1-D Jenks) across per-grp groups; output is the
    // per-column axis assignment, anchored so OXIDES.head is 'primary'
    "p82_auto_split" -> ((s, dir) => {
      val ox = oxFrame(s, dir)
      val groups = Seq("A", "N", "R").map(g =>
        ox.filter(col("grp") === g).drop("grp", "id", "wt"))
      val sec = graft.petro.PlotData.autoSplit(groups, Some(OXIDES))
      import s.implicits._
      OXIDES.map(c => (c, if (sec.contains(c)) "secondary" else "primary"))
        .toDF("col_name", "axis").orderBy("col_name")
    }),

    // T1-T3: hpxeos a-x phase pipeline (polynomial DSL compiled to
    // Columns) — metapelite garnet end members
    "p20_tc_garnet" -> ((s, dir) => {
      val e = graft.petro.hpxeos.Metapelite.TcGarnet.endMembers(
        oxFrame(s, dir).drop("grp", "wt"), carry = Seq("id"))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // G6/plot-track: ternary barycentric projection
    "p21_ternary" -> ((s, dir) => {
      val t = graft.petro.PlotData.ternary(oxFrame(s, dir), "CaO", "FeO", "MgO",
        carry = Seq("id"))
      roundAll(t, Seq("id")).orderBy("id")
    }),

    // X5: pandas.eval-style expression bridge (missing name -> 0)
    "p22_expr_eval" -> ((s, dir) => {
      val ox = oxFrame(s, dir)
      ox.select(col("id"),
        round(graft.petro.PlotData.evalExpr(ox, "SiO2+Al2O3"), 6).as("sum_sial"),
        round(graft.petro.PlotData.evalExpr(ox, "CaO + XyzO"), 6).as("ca_missing"))
        .orderBy("id")
    }),

    // E3: feldspar end members (M-site fractions)
    "p23_fsp_endmembers" -> ((s, dir) => {
      val e = Minerals.endMembers(Minerals.Fsp, oxFrame(s, dir).drop("grp", "wt"),
        carry = Seq("id"))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // E4: clinopyroxene IMA cascade (rows-only)
    "p24_cpx_endmembers" -> ((s, dir) => {
      val e = Minerals.endMembers(Minerals.Cpx, oxFrame(s, dir).drop("grp", "wt"),
        carry = Seq("id"))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // E11+V2: amphibole end members via Schumacher split (rows-only)
    "p25_amp_endmembers" -> ((s, dir) => {
      val e = Minerals.endMembers(Minerals.Amp, oxFrame(s, dir).drop("grp", "wt"),
        carry = Seq("id"))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // E16+V6: spinel end members with Fe2O3->FeO preprocess (rows-only)
    "p26_spl_endmembers" -> ((s, dir) => {
      val e = Minerals.endMembers(Minerals.Spl, oxWithFe2O3(s, dir),
        carry = Seq("id"))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // E2: GarnetFe3 least-squares end members via precomputed
    // pseudo-inverse (rows-only)
    "p27_grtfe3_endmembers" -> ((s, dir) => {
      val e = Minerals.endMembers(Minerals.GrtFe3, oxFrame(s, dir).drop("grp", "wt"),
        carry = Seq("id"))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // T7 hb: the largest a-x model (11 members, 5 order parameters) —
    // exercises the Schumacher split + explicit order state under the
    // hash gate
    "p28_tc_amphibole" -> ((s, dir) => {
      val e = graft.petro.hpxeos.Metabasite.TcAmphibole.endMembers(
        oxFrame(s, dir).drop("grp", "wt"), carry = Seq("id"),
        orderParameters = Map("z" -> Left(0.05), "a" -> Left(0.1),
          "k" -> Left(0.3), "Q1" -> Left(0.02), "Q2" -> Left(-0.02)))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // T7 chl: 28-charge APFU basis + QAl/Q1/Q4 order parameters
    "p29_tc_chlorite" -> ((s, dir) => {
      val e = graft.petro.hpxeos.Metapelite.TcChlorite.endMembers(
        oxFrame(s, dir).drop("grp", "wt"), carry = Seq("id"),
        orderParameters = Map("QAl" -> Left(0.2), "Q1" -> Left(0.1),
          "Q4" -> Left(-0.1)))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // T7 g_W24: igneous garnet — the coupled Mg-Ti substitution case
    "p30_tc_garnet_w24" -> ((s, dir) => {
      val e = graft.petro.hpxeos.Igneous.TcGarnetW24.endMembers(
        oxFrame(s, dir).drop("grp", "wt"), carry = Seq("id"))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // T7 dio: omphacite — trivalent-pool f ratio + Q/Qaf/Qfm order state
    "p31_tc_omphacite" -> ((s, dir) => {
      val e = graft.petro.hpxeos.Metabasite.TcOmphacite.endMembers(
        oxFrame(s, dir).drop("grp", "wt"), carry = Seq("id"),
        orderParameters = Map("Q" -> Left(0.05), "Qaf" -> Left(0.02),
          "Qfm" -> Left(-0.03)))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // T7 spl_T21: three simultaneous normal/inverse order parameters +
    // the Fe2O3->FeO preprocess
    "p32_tc_spinel_t21" -> ((s, dir) => {
      val e = graft.petro.hpxeos.Igneous.TcSpinelT21.endMembers(
        oxWithFe2O3(s, dir), carry = Seq("id"),
        orderParameters = Map("Q1" -> Left(0.5), "Q2" -> Left(0.2),
          "Q3" -> Left(-0.1)))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // T7 cpx_W24: the largest pyroxene model (10 members, 8 mass-balance
    // variables + Q)
    "p33_tc_cpx_w24" -> ((s, dir) => {
      val e = graft.petro.hpxeos.Igneous.TcClinopyroxeneW24.endMembers(
        oxFrame(s, dir).drop("grp", "wt"), carry = Seq("id"),
        orderParameters = Map("Q" -> Left(0.05)))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // T7 ilm_W24: two independent order parameters (Q for Fe, Qt for Ti)
    // with measured Fe3+ via the Fe2O3 column
    "p34_tc_ilm_w24" -> ((s, dir) => {
      val e = graft.petro.hpxeos.Igneous.TcIlmeniteW24.endMembers(
        oxWithFe2O3(s, dir), carry = Seq("id"),
        orderParameters = Map("Q" -> Left(0.1), "Qt" -> Left(0.05)))
      roundAll(e, Seq("id")).orderBy("id")
    }),

    // E5: orthopyroxene pool cascade (Wo/En/Fs + Mg-Tschermak, NOT
    // normalized to 100)
    "p35_opx_endmembers" -> em(Minerals.Opx),
    // E6: muscovite MinPlot dioctahedral mica cascade
    "p36_ms_endmembers" -> em(Minerals.Ms),
    // E7: biotite MinPlot trioctahedral mica cascade
    "p37_bt_endmembers" -> em(Minerals.Bt),
    // E8: staurolite R2+ fractions at the 48-oxygen basis
    "p38_st_endmembers" -> em(Minerals.St),
    // E9: chlorite MinPlot with the 28-charge APFU basis (U6 under E9)
    "p39_chl_endmembers" -> em(Minerals.Chl),
    // E10: epidote M-site trivalent fractions (12.5 oxygens, FeO->Fe2O3
    // preprocess)
    "p40_ep_endmembers" -> em(Minerals.Ep),
    // E12: titanite B-site fractions (FeO->Fe2O3 preprocess)
    "p41_ttn_endmembers" -> em(Minerals.Ttn),
    // E13: chloritoid M1 R2+ fractions over the droop-split APFU
    "p42_cld_endmembers" -> em(Minerals.Cld),
    // E14: cordierite channel filling + B-site R2+ fractions
    "p43_crd_endmembers" -> em(Minerals.Crd),
    // E15: ilmenite A x B site-fraction products over capacity-clipped
    // allocations
    "p44_ilm_endmembers" -> em(Minerals.Ilm),

    // T7 ksp/plc: the two C-1 single-site ternary feldspar models
    // (metapelite kfeldspar_cbar1 / plagioclase_cbar1)
    "p45_tc_ksp" -> tc(graft.petro.hpxeos.Metapelite.TcKFeldsparCbar1),
    "p46_tc_plc" -> tc(graft.petro.hpxeos.Metapelite.TcPlagioclaseCbar1),
    // T7 sa: sapphirine — explicit order state Q
    "p47_tc_sapphirine" -> tc(graft.petro.hpxeos.Metapelite.TcSapphirine,
      Map("Q" -> Left(0.04))),
    // T7 mt1: magnetite — pins the composition-dependent Q default
    // (orderDefault = 2x/(2+x), the only non-zero default in the set)
    "p48_tc_magnetite" -> tc(graft.petro.hpxeos.Metapelite.TcMagnetite),
    // T7 ol: metabasite olivine — the smallest model (1 variable)
    "p49_tc_olivine" -> tc(graft.petro.hpxeos.Metabasite.TcOlivine),
    // T7 abc: peristerite — charge-coupled two-member binary
    "p50_tc_peristerite" -> tc(graft.petro.hpxeos.Metabasite.TcPeristerite),
    // T7 pli: plagioclase I-1 ternary
    "p51_tc_pli" -> tc(graft.petro.hpxeos.Metabasite.TcPlagioclaseIbar1),
    // T7 opx_W24: igneous orthopyroxene (9 members, 8 variables)
    "p52_tc_opx_w24" -> tc(graft.petro.hpxeos.Igneous.TcOrthopyroxeneW24,
      Map("Q" -> Left(0.05))),

    // T7 p54-p76: the remaining 23 a-x phases at default (disordered)
    // order states; each oracle is auto-derived from the phase's own
    // Column trees by [[tcAutoSql]]/[[SqlMirror]], closing the full
    // 39-phase registry under the hash gate.
    "p54_tc_biotite_mp" -> tc(graft.petro.hpxeos.Metapelite.TcBiotite),
    "p55_tc_pl4tr" -> tc(graft.petro.hpxeos.Metapelite.TcPl4tr),
    "p56_tc_k4tr" -> tc(graft.petro.hpxeos.Metapelite.TcK4tr),
    "p57_tc_chloritoid" -> tc(graft.petro.hpxeos.Metapelite.TcChloritoid),
    "p58_tc_staurolite" -> tc(graft.petro.hpxeos.Metapelite.TcStaurolite),
    "p59_tc_cordierite" -> tc(graft.petro.hpxeos.Metapelite.TcCordierite),
    "p60_tc_muscovite" -> tc(graft.petro.hpxeos.Metapelite.TcMuscovite),
    "p61_tc_margarite" -> tc(graft.petro.hpxeos.Metapelite.TcMargarite),
    "p62_tc_epidote" -> tc(graft.petro.hpxeos.Metapelite.TcEpidote),
    "p63_tc_opx_mp" -> tc(graft.petro.hpxeos.Metapelite.TcOrthopyroxene),
    "p64_tc_ilmm_mp" -> tc(graft.petro.hpxeos.Metapelite.TcIlmeniteMixed),
    "p65_tc_spinel_mp" -> tc(graft.petro.hpxeos.Metapelite.TcSpinel),
    "p66_tc_ilmenite_mp" -> tc(graft.petro.hpxeos.Metapelite.TcIlmenite),
    "p67_tc_augite" -> tc(graft.petro.hpxeos.Metabasite.TcAugite),
    "p68_tc_garnet_mb" -> tc(graft.petro.hpxeos.Metabasite.TcGarnet),
    "p69_tc_biotite_mb" -> tc(graft.petro.hpxeos.Metabasite.TcBiotite),
    "p70_tc_muscovite_mb" -> tc(graft.petro.hpxeos.Metabasite.TcMuscovite),
    "p71_tc_chlorite_mb" -> tc(graft.petro.hpxeos.Metabasite.TcChlorite),
    "p72_tc_opx_mb" -> tc(graft.petro.hpxeos.Metabasite.TcOrthopyroxene),
    "p73_tc_ilmm_mb" -> tc(graft.petro.hpxeos.Metabasite.TcIlmeniteMixed),
    "p74_tc_olivine_h18" -> tc(graft.petro.hpxeos.Igneous.TcOlivineH18),
    "p75_tc_biotite_g25" -> tc(graft.petro.hpxeos.Igneous.TcBiotiteG25),
    "p76_tc_cordierite_g25" -> tc(graft.petro.hpxeos.Igneous.TcCordieriteG25),

    // G1: overall per-oxide mean (1-row frame)
    "p77_overall_mean" -> ((s, dir) => {
      val means = OXIDES.map(c => round(avg(c), 6).as(c))
      oxFrame(s, dir).agg(means.head, means.tail: _*)
    }),

    // U7: APFU(12 ox) -> oxide wt% inverse (from_apfu round trip)
    "p78_from_apfu" -> ((s, dir) => {
      val apfu = Convert.toApfu(oxFrame(s, dir).drop("grp", "wt"),
        nOxygens = Some(12.0), carry = Seq("id"))
      val back = Convert.fromApfu(apfu, nOxygens = Some(12.0), carry = Seq("id"))
      roundAll(back, Seq("id")).orderBy("id")
    }),

    // U10: molar Fe2O3 -> FeO merge (reduce_moles)
    "p79_reduce_moles" -> ((s, dir) => {
      val m = Convert.toMoles(oxWithFe2O3(s, dir), Seq("id"))
      roundAll(Convert.reduceMoles(m), Seq("id")).orderBy("id")
    }),

    // U11: THERMOCALC oxygen-excess FeO split in mole space (oxidize_moles)
    "p80_oxidize_moles" -> ((s, dir) => {
      val m = Convert.toMoles(oxFrame(s, dir), Seq("id"))
      val vals = m.columns.filterNot(_ == "id").toSeq
      roundAll(Convert.oxidizeMoles(m, lit(1.5), vals), Seq("id")).orderBy("id")
    })
  )

  /** Shared shape of the hpxeos phase queries: synthetic oxides through
    * Phase.endMembers at an explicit (or default) order state. */
  private def tc(phase: graft.petro.hpxeos.Phase,
      ops: Map[String, Either[Double, org.apache.spark.sql.Column]] = Map.empty)
      : (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = phase.endMembers(oxFrame(s, dir).drop("grp", "wt"),
        carry = Seq("id"), orderParameters = ops)
      roundAll(e, Seq("id")).orderBy("id")
    }

  /** Shared shape of the end-member queries: the synthetic oxide frame
    * through Minerals.endMembers for one spec, rounded + ordered. */
  private def em(spec: graft.petro.MineralSpec): (SparkSession, String) => DataFrame =
    (s, dir) => {
      val e = Minerals.endMembers(spec, oxFrame(s, dir).drop("grp", "wt"),
        carry = Seq("id"))
      roundAll(e, Seq("id")).orderBy("id")
    }

  /** ox frame + a synthetic Fe2O3 derived from Al2O3 (so the CIPW Mt/Hm
    * branches are exercised); both sides compute it from the same bits. */
  def oxWithFe2O3(s: SparkSession, dir: String): DataFrame =
    oxFrame(s, dir).drop("grp", "wt")
      .withColumn("Fe2O3", (col("Al2O3") - lit(15.0)) * 0.4 + 0.5)

  private val OX2_SQL =
    s"""SELECT *, ("Al2O3" - 15.0::DOUBLE) * 0.4::DOUBLE + 0.5::DOUBLE AS "Fe2O3" FROM ox"""

  val oracle: Map[String, String] = {
    val molesSel = OXIDES.map(c => s"ROUND(${molesSql(c)}, 6) AS ${qi(c)}").mkString(", ")
    val totalSql = OXIDES.map(qi).mkString(" + ")
    val normSel = OXIDES.map { c =>
      s"ROUND(CASE WHEN ($totalSql) = 0.0 THEN 'NaN'::DOUBLE ELSE ${qi(c)} / ($totalSql) * 100.0 END, 6) + 0.0 AS ${qi(c)}"
    }.mkString(", ")
    val apfuRounded = ionCols.map(c => s"ROUND(${qi(c)}, 6) AS ${qi(c)}").mkString(", ")
    val splitCols = ionCols.flatMap(c => if (c == "Fe{2+}") Seq("Fe{2+}", "Fe{3+}") else Seq(c))
    val splitRounded = splitCols.map(c => s"ROUND(${qi(c)}, 6) AS ${qi(c)}").mkString(", ")

    // garnet end-member cascade over the split apfu
    val gEm = {
      def g(c: String) = s"GREATEST(${qi(c)}, 0.0)"
      val pre = s"""SELECT id, ${g("Ca{2+}")} AS ca, ${g("Mg{2+}")} AS mg,
        ${g("Fe{2+}")} AS fe2, ${g("Fe{3+}")} AS fe3, ${g("Mn{2+}")} AS mn,
        ${g("Cr{3+}")} AS cr FROM spl"""
      val steps = """SELECT id, LEAST(cr / 2.0, ca / 3.0) AS uvr,
        GREATEST(ca - LEAST(cr / 2.0, ca / 3.0) * 3.0, 0.0) AS car1,
        mg, fe2, fe3, mn, ca, cr FROM pre"""
      val steps2 = """SELECT id, uvr, LEAST(fe3 / 2.0, car1 / 3.0) AS adr,
        GREATEST(car1 - LEAST(fe3 / 2.0, car1 / 3.0) * 3.0, 0.0) AS car2,
        mg, fe2, mn FROM st1"""
      val steps3 = """SELECT id, uvr, adr, GREATEST(car2 / 3.0, 0.0) AS grs,
        GREATEST(mg / 3.0, 0.0) AS prp, GREATEST(fe2 / 3.0, 0.0) AS alm,
        GREATEST(mn / 3.0, 0.0) AS sps FROM st2"""
      def pct(x: String) =
        s"ROUND(CASE WHEN (uvr + adr + grs + prp + alm + sps) > 0.0 THEN $x / " +
          "(CASE WHEN (uvr + adr + grs + prp + alm + sps) = 0.0 THEN 1.0 ELSE " +
          "(uvr + adr + grs + prp + alm + sps) END) * 100.0 ELSE 0.0 END, 6)"
      s"""pre AS ($pre), st1 AS ($steps), st2 AS ($steps2), st3 AS ($steps3)
        SELECT id, ${pct("prp")} AS "Prp", ${pct("alm")} AS "Alm",
        ${pct("sps")} AS "Sps", ${pct("grs")} AS "Grs",
        ${pct("adr")} AS "Adr", ${pct("uvr")} AS "Uvr" FROM st3 ORDER BY id"""
    }

    // alumina saturation
    val alSat = {
      val al = s"""("Al2O3" / ${Chem.mw("Al2O3")})"""
      val na = s"""("Na2O" / ${Chem.mw("Na2O")})"""
      val k = s"""("K2O" / ${Chem.mw("K2O")})"""
      val ca = s"""("CaO" / ${Chem.mw("CaO")})"""
      s"""SELECT id, $al AS al, ($na + $k) AS nk, ($ca + ($na + $k)) AS cnk FROM ox"""
    }

    // oxide ratios
    val ratios = {
      val mgMol = s"""("MgO" / ${Chem.mw("MgO")})"""
      val feMol = s"""("FeO" / ${Chem.mw("FeO")})"""
      s"""SELECT id, ROUND("FeO", 6) AS "FeOT",
        ROUND($mgMol / (CASE WHEN ($mgMol + $feMol) = 0.0 THEN 1.0 ELSE ($mgMol + $feMol) END), 6) AS "Mg#",
        ROUND("Na2O" + "K2O", 6) AS "Na2O+K2O",
        ROUND("K2O" / (CASE WHEN "Na2O" = 0.0 THEN 1.0 ELSE "Na2O" END), 6) AS "K2O/Na2O",
        ROUND("CaO" / (CASE WHEN "Na2O" = 0.0 THEN 1.0 ELSE "Na2O" END), 6) AS "CaO/Na2O",
        ROUND("SiO2", 6) AS "SiO2", ROUND("TiO2", 6) AS "TiO2"
        FROM ox ORDER BY id"""
    }

    // charge-normalized apfu (28 charges)
    val chargeSel = {
      val chargeSum = OXIDES.map { c =>
        s"${molesSql(c)} * ${Chem.cationsPer(c) * Chem.chargeOf(Chem.elementOf(c))}"
      }.mkString(" + ")
      OXIDES.map { c =>
        s"ROUND(${molesSql(c)} * ${Chem.cationsPer(c)} * (28.0 / ($chargeSum)), 6) AS ${qi(c)}"
      }.mkString(", ")
    }

    Map(
      "p01_moles" -> wrap(s"SELECT id, $molesSel FROM ox ORDER BY id"),
      "p02_normalize" -> wrap(s"SELECT id, $normSel FROM ox ORDER BY id"),
      "p03_apfu_garnet" -> wrap(
        s", apfu AS (SELECT id, $apfuSelectSql FROM ox) SELECT id, $apfuRounded FROM apfu ORDER BY id"),
      "p04_droop_split" -> wrap(
        s""", apfu AS (SELECT id, $apfuSelectSql FROM ox),
           spl AS (SELECT id, $splitSelectSql FROM apfu)
           SELECT id, $splitRounded FROM spl ORDER BY id"""),
      "p05_garnet_endmembers" -> wrap(
        s""", apfu AS (SELECT id, $apfuSelectSql FROM ox),
           spl AS (SELECT id, $splitSelectSql FROM apfu), $gEm"""),
      "p06_alumina_shand" -> wrap(
        s""", sat AS ($alSat)
           SELECT id,
           ROUND(al / (CASE WHEN nk = 0.0 THEN 1.0 ELSE nk END), 6) AS ank,
           ROUND(al / (CASE WHEN cnk = 0.0 THEN 1.0 ELSE cnk END), 6) AS acnk,
           CASE WHEN al / (CASE WHEN cnk = 0.0 THEN 1.0 ELSE cnk END) >= 1.0 THEN 'peraluminous'
                WHEN al / (CASE WHEN nk = 0.0 THEN 1.0 ELSE nk END) < 1.0 THEN 'peralkaline'
                ELSE 'metaluminous' END AS shand
           FROM sat ORDER BY id"""),
      "p07_oxide_ratios" -> wrap(ratios),
      "p08_feo_to_fe2o3" -> wrap(
        s"""SELECT id, ROUND(("FeO" / ${Chem.mw("FeO")}) * 0.5 * ${Chem.mw("Fe2O3")}, 6) AS "Fe2O3"
           FROM ox ORDER BY id"""),
      "p09_apatite_correction" -> wrap(
        s"""SELECT id, ROUND("CaO" - (("P2O5" / ${Chem.mw("P2O5")}) * ${10.0 / 3.0}) * ${Chem.mw("CaO")}, 6) AS "CaO",
           CAST(0.0 AS DOUBLE) AS "P2O5" FROM ox ORDER BY id"""),
      "p10_group_mean" -> wrap(
        """SELECT grp, ROUND(AVG("SiO2"), 6) AS "SiO2", ROUND(AVG("Al2O3"), 6) AS "Al2O3",
           ROUND(AVG("FeO"), 6) AS "FeO", ROUND(AVG("CaO"), 6) AS "CaO"
           FROM ox GROUP BY grp ORDER BY grp"""),
      "p11_weighted_mean" -> wrap(
        """SELECT grp, ROUND(SUM("SiO2" * wt) / SUM(wt), 6) AS "SiO2",
           ROUND(SUM("FeO" * wt) / SUM(wt), 6) AS "FeO",
           ROUND(SUM("MgO" * wt) / SUM(wt), 6) AS "MgO"
           FROM ox GROUP BY grp ORDER BY grp"""),
      "p12_apfu_by_charge" -> wrap(s"SELECT id, $chargeSel FROM ox ORDER BY id"),
      "p13_cipw_simple" -> wrap(cipwSimpleSql),
      "p14_cipw_gcdkit" -> wrap(cipwGcdkitSql),
      "p53_cipw_pruned" -> wrap(cipwGcdkitSqlKeep(Some(Seq(
        "Q", "C", "Or", "Ab", "An", "Hy", "Ol", "Mt", "Il", "Ap")))),
      "p15_cipw_hb" -> wrap(cipwHbSql),
      "p24_cpx_endmembers" -> wrap(cpxEndmemberSql),
      "p25_amp_endmembers" -> wrap(ampEndmemberSql),
      "p26_spl_endmembers" -> wrap(splEndmemberSql),
      "p27_grtfe3_endmembers" -> wrap(grtFe3EndmemberSql),
      "p35_opx_endmembers" -> wrap(opxEndmemberSql),
      "p36_ms_endmembers" -> wrap(msEndmemberSql),
      "p37_bt_endmembers" -> wrap(btEndmemberSql),
      "p38_st_endmembers" -> wrap(stEndmemberSql),
      "p39_chl_endmembers" -> wrap(chlEndmemberSql),
      "p40_ep_endmembers" -> wrap(epEndmemberSql),
      "p41_ttn_endmembers" -> wrap(ttnEndmemberSql),
      "p42_cld_endmembers" -> wrap(cldEndmemberSql),
      "p43_crd_endmembers" -> wrap(crdEndmemberSql),
      "p44_ilm_endmembers" -> wrap(ilmEndmemberSql),
      "p45_tc_ksp" -> wrap(tcKspSql),
      "p46_tc_plc" -> wrap(tcPlcSql),
      "p47_tc_sapphirine" -> wrap(tcSapphirineSql),
      "p48_tc_magnetite" -> wrap(tcMagnetiteSql),
      "p49_tc_olivine" -> wrap(tcOlivineSql),
      "p50_tc_peristerite" -> wrap(tcPeristeriteSql),
      "p51_tc_pli" -> wrap(tcPliSql),
      "p52_tc_opx_w24" -> wrap(tcOpxW24Sql),
      "p54_tc_biotite_mp" -> wrap(tcAutoSql(graft.petro.hpxeos.Metapelite.TcBiotite)),
      "p55_tc_pl4tr" -> wrap(tcAutoSql(graft.petro.hpxeos.Metapelite.TcPl4tr)),
      "p56_tc_k4tr" -> wrap(tcAutoSql(graft.petro.hpxeos.Metapelite.TcK4tr)),
      "p57_tc_chloritoid" -> wrap(tcAutoSql(graft.petro.hpxeos.Metapelite.TcChloritoid)),
      "p58_tc_staurolite" -> wrap(tcAutoSql(graft.petro.hpxeos.Metapelite.TcStaurolite)),
      "p59_tc_cordierite" -> wrap(tcAutoSql(graft.petro.hpxeos.Metapelite.TcCordierite)),
      "p60_tc_muscovite" -> wrap(tcAutoSql(graft.petro.hpxeos.Metapelite.TcMuscovite)),
      "p61_tc_margarite" -> wrap(tcAutoSql(graft.petro.hpxeos.Metapelite.TcMargarite)),
      "p62_tc_epidote" -> wrap(tcAutoSql(graft.petro.hpxeos.Metapelite.TcEpidote,
        preprocessFeoToFe2o3 = true)),
      "p63_tc_opx_mp" -> wrap(tcAutoSql(graft.petro.hpxeos.Metapelite.TcOrthopyroxene)),
      "p64_tc_ilmm_mp" -> wrap(tcAutoSql(graft.petro.hpxeos.Metapelite.TcIlmeniteMixed)),
      "p65_tc_spinel_mp" -> wrap(tcAutoSql(graft.petro.hpxeos.Metapelite.TcSpinel)),
      "p66_tc_ilmenite_mp" -> wrap(tcAutoSql(graft.petro.hpxeos.Metapelite.TcIlmenite)),
      "p67_tc_augite" -> wrap(tcAutoSql(graft.petro.hpxeos.Metabasite.TcAugite)),
      "p68_tc_garnet_mb" -> wrap(tcAutoSql(graft.petro.hpxeos.Metabasite.TcGarnet)),
      "p69_tc_biotite_mb" -> wrap(tcAutoSql(graft.petro.hpxeos.Metabasite.TcBiotite)),
      "p70_tc_muscovite_mb" -> wrap(tcAutoSql(graft.petro.hpxeos.Metabasite.TcMuscovite)),
      "p71_tc_chlorite_mb" -> wrap(tcAutoSql(graft.petro.hpxeos.Metabasite.TcChlorite)),
      "p72_tc_opx_mb" -> wrap(tcAutoSql(graft.petro.hpxeos.Metabasite.TcOrthopyroxene)),
      "p73_tc_ilmm_mb" -> wrap(tcAutoSql(graft.petro.hpxeos.Metabasite.TcIlmeniteMixed)),
      "p74_tc_olivine_h18" -> wrap(tcAutoSql(graft.petro.hpxeos.Igneous.TcOlivineH18)),
      "p75_tc_biotite_g25" -> wrap(tcAutoSql(graft.petro.hpxeos.Igneous.TcBiotiteG25)),
      "p76_tc_cordierite_g25" -> wrap(tcAutoSql(graft.petro.hpxeos.Igneous.TcCordieriteG25)),
      "p77_overall_mean" -> wrap(
        s"SELECT ${OXIDES.map(c => s"ROUND(AVG(${qi(c)}), 6) AS ${qi(c)}").mkString(", ")} FROM ox"),
      "p78_from_apfu" -> {
        // mirror fromApfu: moles = ion/catPer; factor = 12/Σ(moles*oxyPer)
        // with the =0 -> 1 divide guard; wt = moles * factor * MW(oxide)
        val totalRef = OXIDES.map { c =>
          s"(${qi(Chem.oxideToIonCol(c))} / ${Chem.cationsPer(c)}) * ${Chem.oxygensPer(c)}"
        }.mkString(" + ")
        val denom = s"(CASE WHEN ($totalRef) = 0.0 THEN 1.0 ELSE ($totalRef) END)"
        val sel = OXIDES.map { c =>
          s"ROUND((${qi(Chem.oxideToIonCol(c))} / ${Chem.cationsPer(c)}) * (12.0 / $denom) * ${Chem.mw(c)}, 6) AS ${qi(c)}"
        }.mkString(", ")
        wrap(s", apfu AS (SELECT id, $apfuSelectSql FROM ox) SELECT id, $sel FROM apfu ORDER BY id")
      },
      "p79_reduce_moles" -> {
        val others = OXIDES.filterNot(_ == "FeO")
          .map(c => s"ROUND(${molesSql(c)}, 6) AS ${qi(c)}").mkString(", ")
        wrap(s""", ox2 AS ($OX2_SQL)
          SELECT id, $others,
            ROUND(${molesSql("FeO")} + ${molesSql("Fe2O3")} * 2.0, 6) AS "FeO"
          FROM ox2 ORDER BY id""")
      },
      "p80_oxidize_moles" -> {
        val tot = OXIDES.map(molesSql).mkString(" + ")
        val fe3 = s"LEAST(GREATEST(2.0 * (1.5::DOUBLE / 100.0 * ($tot)), 0.0), ${molesSql("FeO")})"
        val others = OXIDES.filterNot(_ == "FeO")
          .map(c => s"ROUND(${molesSql(c)}, 6) AS ${qi(c)}").mkString(", ")
        wrap(s"""SELECT id, $others,
            ROUND(${molesSql("FeO")} - $fe3, 6) AS "FeO",
            ROUND($fe3 / 2.0, 6) AS "Fe2O3"
          FROM ox ORDER BY id""")
      },
      "p28_tc_amphibole" -> wrap(tcAmphiboleSql),
      "p29_tc_chlorite" -> wrap(tcChloriteSql),
      "p30_tc_garnet_w24" -> wrap(tcGarnetW24Sql),
      "p31_tc_omphacite" -> wrap(tcOmphaciteSql),
      "p32_tc_spinel_t21" -> wrap(tcSpinelT21Sql),
      "p33_tc_cpx_w24" -> wrap(tcCpxW24Sql),
      "p34_tc_ilm_w24" -> wrap(tcIlmW24Sql),
      "p16_stoich_garnet" -> wrap(stoichGarnetSql),
      "p17_site_allocation" -> wrap(siteAllocQuerySql),
      "p18_tcbulk_prep" -> wrap(s"$tcPrepCtes SELECT id, $tcPrepSelect FROM pr3 ORDER BY id"),
      "p20_tc_garnet" -> wrap(tcGarnetSql),
      "p21_ternary" -> wrap(
        s"""SELECT id,
           ROUND("CaO" / (("CaO" + "FeO") + "MgO"), 6) AS f_top,
           ROUND("FeO" / (("CaO" + "FeO") + "MgO"), 6) AS f_left,
           ROUND("MgO" / (("CaO" + "FeO") + "MgO"), 6) AS f_right,
           ROUND(("MgO" / (("CaO" + "FeO") + "MgO") - "FeO" / (("CaO" + "FeO") + "MgO")) * ${1.0 / math.sqrt(3.0)}, 6) AS x,
           ROUND("CaO" / (("CaO" + "FeO") + "MgO"), 6) AS y
           FROM ox ORDER BY id"""),
      "p22_expr_eval" -> wrap(
        """SELECT id, ROUND("SiO2" + "Al2O3", 6) AS sum_sial,
           ROUND("CaO" + 0.0, 6) AS ca_missing FROM ox ORDER BY id"""),
      "p23_fsp_endmembers" -> wrap(fspEndmemberSql),
      "p19_tcbulk_lines" -> wrap(
        s"""$tcPrepCtes SELECT id, printf('bulk${tcSysCols.map(_ => " %6.3f").mkString}  %% %s',
           ${tcSysCols.map(c => s"pr_${san(c)}").mkString(", ")}, id::VARCHAR) AS line
           FROM pr3 ORDER BY id"""),
      "p81_perplex_block" -> {
        // PerpleX component order = tc order with O -> O2; oxygen budget
        // doubled (oxygenMult = 2). Lines joined with newlines inside a
        // begin/end wrapper, matching Thermo.perplexBulk's emitted text.
        val cols = tcSysCols.map(c => if (c == "O") "O2" else c)
        val lineFor = cols.map { c =>
          s"printf('%-6s1 %8.5f      0.00000      0.00000     molar amount', '$c', pr_${san(if (c == "O2") "O" else c)})"
        }.mkString(" || chr(10) || ")
        wrap(s"""${tcPrepCtesAt(oxygen = 0.01, oxygenMult = 2.0)}
          SELECT id, 'begin thermodynamic component list' || chr(10) ||
            $lineFor || chr(10) || 'end thermodynamic component list' AS block
          FROM pr3 ORDER BY id""")
      },
      "p83_magemin_lines" -> {
        // db=mp component set == MnNCKFMASHTO -> the shared prep CTEs
        // apply verbatim; only the emit order + line format differ.
        val mpCols = Thermo.magemimSystems("mp")
        val oxides = mpCols.mkString(", ")
        val fmt = mpCols.map(_ => "%.4f").mkString(", ")
        wrap(s"""$tcPrepCtes
          SELECT id, id::VARCHAR || ';petropandas;mp;mol;[$oxides];[' ||
            printf('$fmt', ${mpCols.map(c => s"pr_${san(c)}").mkString(", ")})
            || '];' AS line
          FROM pr3 ORDER BY id""")
      },
      "p84_convert_roundtrip" -> {
        // full wt% -> apfu(12 O) -> wt% cascade with the analytical-total
        // rescale, mirroring PetroFrame.convert's TotalCol round trip
        val totSql = OXIDES.map(qi).mkString(" + ")
        val totalRef = OXIDES.map { c =>
          s"(${qi(Chem.oxideToIonCol(c))} / ${Chem.cationsPer(c)}) * ${Chem.oxygensPer(c)}"
        }.mkString(" + ")
        val denom = s"(CASE WHEN ($totalRef) = 0.0 THEN 1.0 ELSE ($totalRef) END)"
        val wtSel = OXIDES.map { c =>
          s"(${qi(Chem.oxideToIonCol(c))} / ${Chem.cationsPer(c)}) * (12.0 / $denom) * ${Chem.mw(c)} AS ${qi(c)}"
        }.mkString(", ")
        val sumWt = OXIDES.map(qi).mkString(" + ")
        val denom2 = s"(CASE WHEN ($sumWt) = 0.0 THEN 1.0 ELSE ($sumWt) END)"
        val finalSel = OXIDES.map { c =>
          s"ROUND(${qi(c)} / $denom2 * tot, 6) AS ${qi(c)}"
        }.mkString(", ")
        wrap(s""", apfu AS (SELECT id, ($totSql) AS tot, $apfuSelectSql FROM ox),
          wt AS (SELECT id, tot, $wtSel FROM apfu)
          SELECT id, $finalSel FROM wt ORDER BY id""")
      },
      "p82_auto_split" -> {
        // 1-D Jenks mirror: per-column global means (the union of the
        // per-grp groups), contiguous split over sorted means minimizing
        // summed population variance, first minimal k on ties, secondary
        // side = the one NOT containing OXIDES.head.
        val meansSql = OXIDES.map(c =>
          s"""SELECT '$c' AS col_name, AVG(${qi(c)}) AS m FROM ox""")
          .mkString(" UNION ALL ")
        wrap(s""", means AS ($meansSql),
          sorted AS (SELECT col_name, m,
            ROW_NUMBER() OVER (ORDER BY m, col_name) AS rn FROM means),
          ks AS (SELECT unnest(generate_series(1, ${OXIDES.length - 1})) AS k),
          splits AS (SELECT k,
              (SELECT COALESCE(var_pop(m), 0.0) FROM sorted WHERE rn <= k) +
              (SELECT COALESCE(var_pop(m), 0.0) FROM sorted WHERE rn > k) AS v
            FROM ks),
          best AS (SELECT k FROM splits ORDER BY v, k LIMIT 1),
          anchor AS (SELECT rn AS a_rn FROM sorted WHERE col_name = '${OXIDES.head}')
          SELECT s.col_name,
            CASE WHEN (s.rn <= b.k) = (a.a_rn <= b.k)
              THEN 'primary' ELSE 'secondary' END AS axis
          FROM sorted s, best b, anchor a
          ORDER BY col_name""")
      }
    )
  }

  // ---- thermo prep SQL mirror (MnNCKFMASHTO over ox+Fe2O3) -----------------

  private def san(c: String): String = c.toLowerCase.replaceAll("[^a-z0-9]", "")
  private def tcSysCols = Seq("H2O", "SiO2", "Al2O3", "CaO", "MgO", "FeO",
    "K2O", "Na2O", "TiO2", "MnO", "O")

  private def tcPrepCtes: String = tcPrepCtesAt(oxygen = 0.01, oxygenMult = 1.0)

  /** Shared thermo-prep SQL mirror, parameterized by the oxygen budget:
    * THERMOCALC reserves `oxygen * 1.0` wt for the O component; PerpleX
    * reserves `oxygen * 2.0` for O2 (Thermo.thermoBulkPrep oxygenMult).
    * The scaled components land in pr3 as pr_<oxide> + pr_o. */
  private def tcPrepCtesAt(oxygen: Double, oxygenMult: Double): String = {
    def mw(c: String) = Chem.mw(c)
    // work columns after Fe2O3 merge + apatite, in ox order minus Fe2O3
    val workCols = Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "MnO", "Na2O",
      "K2O", "TiO2", "Cr2O3", "P2O5")
    val totalSql = workCols.map(c => s"w_${san(c)}").mkString(" + ")
    // system intersection in work order, then H2O appended
    val useCols = Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "MnO", "Na2O",
      "K2O", "TiO2", "H2O")
    val molesSel = useCols.map(c => s"w_${san(c)} / ${mw(c)} AS m_${san(c)}").mkString(", ")
    val total2 = useCols.map(c => s"m_${san(c)}").mkString(" + ")
    val target = 100.0 - oxygen * oxygenMult
    val scaledSel = useCols.map(c => s"m_${san(c)} / ($total2) * $target AS pr_${san(c)}").mkString(", ")
    s""", ox2 AS ($OX2_SQL),
      wk AS (SELECT id,
        "SiO2" AS w_sio2, "Al2O3" AS w_al2o3,
        "FeO" + ("Fe2O3" / ${mw("Fe2O3")}) * 2.0 * ${mw("FeO")} AS w_feo,
        "MgO" AS w_mgo,
        "CaO" - (("P2O5" / ${mw("P2O5")}) * ${10.0 / 3.0}) * ${mw("CaO")} AS w_cao,
        "MnO" AS w_mno, "Na2O" AS w_na2o, "K2O" AS w_k2o, "TiO2" AS w_tio2,
        "Cr2O3" AS w_cr2o3, CAST(0.0 AS DOUBLE) AS w_p2o5 FROM ox2),
      pr1 AS (SELECT *, GREATEST(100.0 - ($totalSql), 0.0) AS w_h2o FROM wk),
      pr2 AS (SELECT id, $molesSel FROM pr1),
      pr3 AS (SELECT id, $scaledSel, CAST(${oxygen * oxygenMult} AS DOUBLE) AS pr_o FROM pr2)"""
  }

  private def tcPrepSelect: String =
    tcSysCols.map(c => s"""ROUND(pr_${san(c)}, 6) AS ${qi(c)}""").mkString(", ")

  /** Oracle for p20: hpxeos metapelite garnet — site fractions ->
    * variables -> p(...) polynomials rendered to SQL by the same parser
    * that compiles them to Columns. */
  private def tcGarnetSql: String = {
    val sf = s"""SELECT id,
      "Mg{2+}" / ((("Mg{2+}" + "Fe{2+}") + "Mn{2+}") + "Ca{2+}") AS xmgx,
      "Fe{2+}" / ((("Mg{2+}" + "Fe{2+}") + "Mn{2+}") + "Ca{2+}") AS xfex,
      "Mn{2+}" / ((("Mg{2+}" + "Fe{2+}") + "Mn{2+}") + "Ca{2+}") AS xmnx,
      "Ca{2+}" / ((("Mg{2+}" + "Fe{2+}") + "Mn{2+}") + "Ca{2+}") AS xcax,
      "Al{3+}" / ("Al{3+}" + "Fe{3+}") AS xaly,
      "Fe{3+}" / ("Al{3+}" + "Fe{3+}") AS xfe3y FROM spl"""
    val vars = """SELECT id, xfex / (xfex + xmgx) AS x, xcax AS z,
      xmnx AS m, xfe3y AS f FROM sfr"""
    val varMap = Map("x" -> "x", "z" -> "z", "m" -> "m", "f" -> "f")
    val polys = graft.petro.hpxeos.Poly.toSqlAll(
      graft.petro.hpxeos.Metapelite.TcGarnet.pBlock, varMap)
    val sel = polys.map { case (n, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n"""" }
      .mkString(", ")
    s""", apfu AS (SELECT id, $apfuSelectSql FROM ox),
      spl AS (SELECT id, $splitSelectSql FROM apfu),
      sfr AS ($sf), vars AS ($vars)
      SELECT id, $sel FROM vars ORDER BY id"""
  }

  /** SQL mirror of the greedy site-allocation cascade over a frame of
    * ion columns: one CTE per (site, ion) step, updating the shared pool
    * and the site remainder exactly like Minerals.allocateSitesKeepAll.
    * Returns (cteChain, lastCte, takes as (site, ion, colName), unallocs
    * as (site, colOrLiteral)). */
  private def allocCtes(spec: graft.petro.MineralSpec, ions: Seq[String],
      fromCte: String)
      : (String, String, Seq[(String, String, String)], Seq[(String, String)]) = {
    var pool: Map[String, String] = ions.map(i => i -> qi(i)).toMap
    val ctes = scala.collection.mutable.ListBuffer.empty[String]
    val takes = scala.collection.mutable.ListBuffer.empty[(String, String, String)]
    val unallocs = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var prev = fromCte
    var k = 0
    spec.sites.foreach { site =>
      var rem: String = site.capacity.toString
      site.priority.foreach { ion =>
        if (pool.contains(ion)) {
          k += 1
          val p = pool(ion)
          val take = s"LEAST($p, $rem)"
          ctes += s"c$k AS (SELECT *, $take AS t$k, $p - $take AS p$k, $rem - $take AS r$k FROM $prev)"
          prev = s"c$k"
          pool += ion -> s"p$k"
          rem = s"r$k"
          takes += ((site.name, ion, s"t$k"))
        }
      }
      unallocs += ((site.name, rem))
    }
    (ctes.mkString(", "), prev, takes.toSeq, unallocs.toSeq)
  }

  private def splitCols: Seq[String] =
    ionCols.flatMap(c => if (c == "Fe{2+}") Seq("Fe{2+}", "Fe{3+}") else Seq(c))

  /** Oracle for p16: the 6 applicable garnet criteria. */
  private def stoichGarnetSql: String = {
    val oxtSql = OXIDES.map(qi).mkString(" + ")
    val apfu2 = s"SELECT id, ($oxtSql) AS oxt, $apfuSelectSql FROM ox"
    val spl2b = s"SELECT id, oxt, $splitSelectSql FROM apfu2"
    val (chain, last, takes, unallocs) = allocCtes(Minerals.Grt, splitCols, "spl2")
    val sSum = splitCols.map(qi).mkString(" + ")
    val charges = splitCols.map { c =>
      s"${qi(c)} * ${Chem.parseIon(c).map(_._2.toDouble).getOrElse(0.0)}"
    }.mkString(" + ")
    val trap = "CASE WHEN oxt >= 99.0 AND oxt <= 101.0 THEN 1.0 " +
      "WHEN oxt < 99.0 THEN GREATEST((oxt - 97.5) / 1.5, 0.0) " +
      "ELSE GREATEST((102.5 - oxt) / 1.5, 0.0) END"
    val caps = Minerals.Grt.sites.map(_.capacity)
    val meanCap = caps.sum / caps.length
    val meanUnalloc = s"(${unallocs.map(_._2).mkString(" + ")}) / ${unallocs.length.toDouble}"
    val allocated = takes.map(_._3).mkString(" + ")
    s""", apfu2 AS ($apfu2), spl2 AS ($spl2b), $chain
      SELECT id,
        ROUND($trap, 6) AS analytical_total,
        ROUND(GREATEST(1.0 - ABS(($sSum) - 8.0) / 8.0, 0.0), 6) AS cation_deviation,
        ROUND(EXP(-ABS(($charges) - 24.0) / 0.5), 6) AS charge_balance,
        ROUND(CASE WHEN "Fe{3+}" >= 0.0 AND "Fe{2+}" >= 0.0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END, 6) AS "fe3+_validity",
        ROUND(GREATEST(1.0 - ($meanUnalloc) / $meanCap, 0.0), 6) AS site_vacancies,
        ROUND(GREATEST(1.0 - GREATEST((($sSum) - ($allocated)) / (CASE WHEN ($sSum) = 0.0 THEN 1.0 ELSE ($sSum) END), 0.0), 0.0), 6) AS leftover_cations
      FROM $last ORDER BY id"""
  }

  /** Oracle for p23: feldspar end members — 8-oxygen APFU (no valence
    * split), greedy allocation over Fsp sites, M-site fractions. */
  private def fspEndmemberSql: String = {
    val apfu8 = OXIDES.map { c =>
      s"${molesSql(c)} * ${Chem.cationsPer(c)} * (8.0 / ($oxySumSql)) AS ${qi(Chem.oxideToIonCol(c))}"
    }.mkString(", ")
    val (chain, last, takes, _) = allocCtes(Minerals.Fsp, ionCols, "apfu8")
    val m = takes.filter(_._1 == "M") // (site, ion, takeCol) in priority order
    val mTotal = m.map(_._3).mkString(" + ")
    val safe = s"(CASE WHEN ($mTotal) = 0.0 THEN 'NaN'::DOUBLE ELSE ($mTotal) END)"
    val names = Map("Ca{2+}" -> "An", "Na{+}" -> "Ab", "K{+}" -> "Or")
    val sel = m.map { case (_, ion, t) =>
      s"""ROUND($t / $safe * 100.0, 6) + 0.0 AS "${names(ion)}""""
    }.mkString(", ")
    s""", apfu8 AS (SELECT id, $apfu8 FROM ox), $chain
      SELECT id, $sel FROM $last ORDER BY id"""
  }

  /** Oracle for p17: raw garnet site allocations. */
  private def siteAllocQuerySql: String = {
    val apfu2 = s"SELECT id, $apfuSelectSql FROM ox"
    val spl2 = s"SELECT id, $splitSelectSql FROM apfu2"
    val (chain, last, takes, unallocs) = allocCtes(Minerals.Grt, splitCols, "spl2")
    val cols = (takes.map { case (s0, i, t) => s"""ROUND($t, 6) AS "$s0:$i"""" } ++
      unallocs.map { case (s0, r) => s"""ROUND($r, 6) AS "$s0:_unallocated"""" })
      .mkString(", ")
    s""", apfu2 AS ($apfu2), spl2 AS ($spl2), $chain
      SELECT id, $cols FROM $last ORDER BY id"""
  }

  /** DuckDB mirror of Cipw.cipwNormSimple over the ox+Fe2O3 table —
    * same staging, groupings, and MW literals as the Column cascade. */
  private def cipwSimpleSql: String = {
    def mw(c: String) = Chem.mw(c)
    s""", ox2 AS ($OX2_SQL),
      mol AS (SELECT id,
        "SiO2" / ${mw("SiO2")} AS si, "TiO2" / ${mw("TiO2")} AS ti,
        "Al2O3" / ${mw("Al2O3")} AS al, "Fe2O3" / ${mw("Fe2O3")} AS fe3,
        "FeO" / ${mw("FeO")} AS feo, "MgO" / ${mw("MgO")} AS mgo,
        "CaO" / ${mw("CaO")} AS cao, "Na2O" / ${mw("Na2O")} AS nao,
        "K2O" / ${mw("K2O")} AS k2o, "P2O5" / ${mw("P2O5")} AS p2o5,
        "Cr2O3" / ${mw("Cr2O3")} AS cr2o3 FROM ox2),
      s1 AS (SELECT id, p2o5 AS ap, cao - 3.0 * p2o5 AS cao1, ti AS il,
        fe3 AS mt, cr2o3 AS cr, feo - ti - fe3 - cr2o3 AS feo3,
        k2o AS orm, al - k2o AS al1, si - 6.0 * k2o AS si1, nao AS ab,
        mgo FROM mol),
      s2 AS (SELECT *, al1 - ab AS al2, si1 - 6.0 * ab AS si2 FROM s1),
      s3 AS (SELECT *, LEAST(GREATEST(al2, 0.0), cao1) AS an FROM s2),
      s4 AS (SELECT *, al2 - an AS al3, si2 - 2.0 * an AS si3,
        cao1 - an AS cao2 FROM s3),
      s5 AS (SELECT *, GREATEST(al3, 0.0) AS c,
        LEAST(GREATEST(cao2, 0.0), GREATEST(mgo, 0.0)) AS di FROM s4),
      s6 AS (SELECT *, mgo - di AS mgo1, si3 - 2.0 * di AS si4 FROM s5),
      s7 AS (SELECT *, GREATEST(mgo1, 0.0) AS hymg0, GREATEST(feo3, 0.0) AS hyfe0
        FROM s6),
      s8 AS (SELECT *, hymg0 + hyfe0 AS hyt0,
        LEAST(hymg0 + hyfe0, GREATEST(si4, 0.0)) AS hyt FROM s7),
      s9 AS (SELECT *, hyt / (CASE WHEN hyt = 0.0 THEN 1.0 ELSE hyt END) AS scale
        FROM s8),
      s10 AS (SELECT *, hymg0 * scale AS hymg, hyfe0 * scale AS hyfe FROM s9)
      SELECT id,
        ROUND(ap * ${mw("Ca3(PO4)2")}, 6) AS "Ap",
        ROUND(il * ${mw("FeTiO3")}, 6) AS "Il",
        ROUND(mt * ${mw("Fe3O4")}, 6) AS "Mt",
        ROUND(cr * ${mw("FeCr2O4")}, 6) AS "Crn",
        ROUND(orm * ${mw("K2Al2Si6O16")}, 6) AS "Or",
        ROUND(ab * ${mw("Na2Al2Si6O16")}, 6) AS "Ab",
        ROUND(an * ${mw("CaAl2Si2O8")}, 6) AS "An",
        ROUND(c * ${mw("Al2O3")}, 6) AS "C",
        ROUND(di * ${mw("CaMgSi2O6")}, 6) AS "Di",
        ROUND(hymg * ${mw("MgSiO3")} + hyfe * ${mw("FeSiO3")}, 6) AS "Hy",
        ROUND(GREATEST(si4 - hymg - hyfe, 0.0) * ${mw("SiO2")}, 6) AS "Q"
      FROM s10 ORDER BY id"""
  }

  // ---- GCDkit CIPW / CIPWhb oracle SQL (mirrors Cipw.cipwRow/cipwHbRow) ----
  //
  // Each imperative if/else of the row functions becomes one CTE stage of
  // CASE expressions carrying the exact same arithmetic per branch (same
  // operand order and grouping, so the doubles are bit-identical before
  // ROUND). The early-exit silica-deficit cascade threads a `dn*` done
  // flag: once a stage's return-branch fires, every later stage is an
  // identity. Flags in this run: normsum=true, cancrinite=false,
  // spinel=false (matching the p14/p15 query invocations).

  /** Shared _cipw_common_allocations mirror (Cipw.commonAllocations;
    * reference _calc.py:1195-1316). Ends at CTE k10 with columns:
    * ap, fr, py, cc, il, orr, ks, ab0, ca3, ti1, fe2c, al2, na1, si2,
    * plus untouched mol columns (fe3, mg). H2O/CO2/F/S are absent from
    * the ox table so their moles are literal 0. */
  private def cipwCommonCtes: String = {
    def mw(c: String) = Chem.mw(c)
    s""", ox2 AS ($OX2_SQL),
      mol AS (SELECT id,
        "SiO2" / ${mw("SiO2")} AS si, "TiO2" / ${mw("TiO2")} AS ti,
        "Al2O3" / ${mw("Al2O3")} AS al, "Fe2O3" / ${mw("Fe2O3")} AS fe3,
        "FeO" / ${mw("FeO")} + "MnO" / ${mw("MnO")} AS fe2,
        "MgO" / ${mw("MgO")} AS mg, "CaO" / ${mw("CaO")} AS ca,
        "Na2O" / ${mw("Na2O")} AS na, "K2O" / ${mw("K2O")} AS k,
        0.0::DOUBLE AS co2, "P2O5" / ${mw("P2O5")} AS p,
        0.0::DOUBLE AS fl, 0.0::DOUBLE AS s FROM ox2),
      k01 AS (SELECT *, CASE WHEN ca >= 10.0/3*p THEN p ELSE 3.0/10*ca END AS ap FROM mol),
      k02 AS (SELECT *,
        CASE WHEN ca >= 10.0/3*p THEN ca - ap*10/3 ELSE 0.0 END AS ca1,
        CASE WHEN fl >= 2.0/3*ap THEN fl - 2.0/3*ap ELSE 0.0 END AS fl1 FROM k01),
      k03 AS (SELECT *,
        CASE WHEN ca1 >= 0.5*fl1 THEN 0.5*fl1 ELSE ca1 END AS fr,
        CASE WHEN fe2 >= 0.5*s THEN 0.5*s ELSE fe2 END AS py FROM k02),
      k04 AS (SELECT *,
        CASE WHEN ca1 >= 0.5*fl1 THEN ca1 - fr ELSE 0.0 END AS ca2,
        CASE WHEN fe2 >= 0.5*s THEN fe2 - py ELSE 0.0 END AS fe2b FROM k03),
      k05 AS (SELECT *, CASE WHEN ca2 >= co2 THEN co2 ELSE ca2 END AS cc FROM k04),
      k06 AS (SELECT *,
        CASE WHEN ca2 >= co2 THEN ca2 - cc ELSE 0.0 END AS ca3,
        CASE WHEN fe2b >= ti THEN ti ELSE fe2b END AS il FROM k05),
      k07 AS (SELECT *,
        CASE WHEN fe2b >= ti THEN fe2b - il ELSE 0.0 END AS fe2c,
        CASE WHEN fe2b >= ti THEN 0.0 ELSE ti - il END AS ti1,
        CASE WHEN al >= k THEN k ELSE al END AS orr FROM k06),
      k08 AS (SELECT *,
        CASE WHEN al >= k THEN al - orr ELSE 0.0 END AS al1,
        CASE WHEN al >= k THEN 0.0 ELSE k - orr END AS ks FROM k07),
      k09 AS (SELECT *, si - 6*orr - ks AS si1,
        CASE WHEN al1 >= na THEN na ELSE al1 END AS ab0 FROM k08),
      k10 AS (SELECT *,
        CASE WHEN al1 >= na THEN al1 - ab0 ELSE 0.0 END AS al2,
        CASE WHEN al1 >= na THEN 0.0 ELSE na - ab0 END AS na1,
        si1 - 6*ab0 AS si2 FROM k09)"""
  }

  /** p14 oracle: Cipw.cipwRow with normsum=true (reference
    * _cipw_norm_row, _calc.py:1319-1473 + _cipw_final:1167-1192). */
  private def cipwGcdkitSql: String = cipwGcdkitSqlKeep(None)

  /** p14 oracle, optionally restricted to a kept-column subset — the
    * oracle twin of the G5 zero-column pruning path (p53). The pruning
    * decision is data-dependent but deterministic for the synthetic
    * table (verified identical at sf0.001/sf0.01), so the oracle can
    * name the kept set statically. */
  private def cipwGcdkitSqlKeep(keep: Option[Seq[String]]): String = {
    def nm(c: String) = Cipw.normMw(c)
    // total over CIPW_RESULT_NAMES order minus the excluded sub-splits
    def tot(p: String) = Seq("q", "c", "or", "ab", "an", "lc", "ne", "kp",
      "nc", "ac", "ns", "ks", "di", "wo", "hy", "ol", "dcs", "mt", "il",
      "hm", "tn", "pf", "ru", "ap", "fr", "py", "cc", "sp")
      .map(p + _).mkString(" + ")
    val outNames = Seq(
      "Q" -> "n_q", "C" -> "n_c", "Or" -> "n_or", "Ab" -> "n_ab",
      "An" -> "n_an", "Lc" -> "n_lc", "Ne" -> "n_ne", "Kp" -> "n_kp",
      "Nc" -> "n_nc", "Ac" -> "n_ac", "Ns" -> "n_ns", "Ks" -> "n_ks",
      "Di" -> "n_di", "MgDi" -> "n_mgdi", "FeDi" -> "n_fedi",
      "Wo" -> "n_wo", "Hy" -> "n_hy", "En" -> "n_en", "Fs" -> "n_fs",
      "Ol" -> "n_ol", "Fo" -> "n_fo", "Fa" -> "n_fa", "Dcs" -> "n_dcs",
      "Mt" -> "n_mt", "Il" -> "n_il", "Hm" -> "n_hm", "Tn" -> "n_tn",
      "Pf" -> "n_pf", "Ru" -> "n_ru", "Ap" -> "n_ap", "Fr" -> "n_fr",
      "Py" -> "n_py", "Cc" -> "n_cc", "Sp" -> "n_sp", "MgSp" -> "n_mgsp",
      "FeSp" -> "n_fesp")
    val sel = outNames
      .filter { case (n0, _) => keep.forall(_.contains(n0)) }
      .map { case (n0, v) => s"""ROUND($v, 6) AS "$n0"""" }
      .mkString(", ")
    s"""$cipwCommonCtes,
      r11 AS (SELECT *, CASE WHEN na1 >= fe3 THEN fe3 ELSE na1 END AS ac FROM k10),
      r12 AS (SELECT *,
        CASE WHEN na1 >= fe3 THEN na1 - ac ELSE 0.0 END AS na2,
        CASE WHEN na1 >= fe3 THEN 0.0 ELSE fe3 - ac END AS fe3a FROM r11),
      r13 AS (SELECT *, na2 AS nsv, si2 - 4*ac - na2 AS si3 FROM r12),
      r14 AS (SELECT *, CASE WHEN al2 >= ca3 THEN ca3 ELSE al2 END AS an FROM r13),
      r15 AS (SELECT *,
        CASE WHEN al2 >= ca3 THEN al2 - an ELSE 0.0 END AS cv,
        CASE WHEN al2 >= ca3 THEN 0.0 ELSE ca3 - an END AS ca4,
        si3 - 2*an AS si4 FROM r14),
      r16 AS (SELECT *, CASE WHEN ca4 >= ti1 THEN ti1 ELSE ca4 END AS tn FROM r15),
      r17 AS (SELECT *,
        CASE WHEN ca4 >= ti1 THEN ca4 - tn ELSE 0.0 END AS ca5,
        CASE WHEN ca4 >= ti1 THEN 0.0 ELSE ti1 - tn END AS ru,
        si4 - tn AS si5 FROM r16),
      r18 AS (SELECT *, CASE WHEN fe3a >= fe2c THEN fe2c ELSE fe3a END AS mt FROM r17),
      r19 AS (SELECT *,
        CASE WHEN fe3a >= fe2c THEN fe3a - mt ELSE 0.0 END AS hm,
        CASE WHEN fe3a >= fe2c THEN 0.0 ELSE fe2c - mt END AS fe2d FROM r18),
      r20 AS (SELECT *, fe2d / (fe2d + mg) AS fer, mg / (fe2d + mg) AS mgr,
        fe2d + mg AS femg FROM r19),
      r21 AS (SELECT *, CASE WHEN ca5 >= femg THEN femg ELSE ca5 END AS di FROM r20),
      r22 AS (SELECT *,
        CASE WHEN ca5 >= femg THEN ca5 - femg ELSE 0.0 END AS wo,
        CASE WHEN ca5 >= femg THEN 0.0 ELSE femg - ca5 END AS hy FROM r21),
      r23 AS (SELECT *, CASE WHEN ca5 >= femg THEN si5 - 2*di - wo
        ELSE si5 - 2*di - hy END AS si6 FROM r22),
      r24 AS (SELECT *, CASE WHEN si6 >= 0 THEN si6 ELSE 0.0 END AS q,
        si6 >= 0 AS dn0, ABS(si6) AS d0 FROM r23),
      r25 AS (SELECT *,
        CASE WHEN dn0 THEN 0.0 WHEN d0 <= hy/2 THEN d0 ELSE hy/2 END AS ol1,
        CASE WHEN dn0 THEN hy WHEN d0 <= hy/2 THEN hy - 2*d0 ELSE 0.0 END AS hy1,
        d0 - hy/2 AS d1, dn0 OR d0 <= hy/2 AS dn1 FROM r24),
      r26 AS (SELECT *,
        CASE WHEN dn1 THEN 0.0 WHEN d1 <= tn THEN d1 ELSE tn END AS pf,
        CASE WHEN dn1 THEN tn WHEN d1 <= tn THEN tn - d1 ELSE 0.0 END AS tn1,
        d1 - tn AS d2, dn1 OR d1 <= tn AS dn2 FROM r25),
      r27 AS (SELECT *,
        CASE WHEN dn2 THEN 0.0 WHEN d2 <= 4*ab0 THEN d2/4 ELSE ab0 END AS ne,
        CASE WHEN dn2 THEN ab0 WHEN d2 <= 4*ab0 THEN ab0 - d2/4 ELSE 0.0 END AS ab1,
        d2 - 4*ab0 AS d3, dn2 OR d2 <= 4*ab0 AS dn3 FROM r26),
      r28 AS (SELECT *,
        CASE WHEN dn3 THEN 0.0 WHEN d3 <= 2*orr THEN d3/2 ELSE orr END AS lc,
        CASE WHEN dn3 THEN orr WHEN d3 <= 2*orr THEN orr - d3/2 ELSE 0.0 END AS or1,
        d3 - 2*orr AS d4, dn3 OR d3 <= 2*orr AS dn4 FROM r27),
      r29 AS (SELECT *,
        CASE WHEN dn4 THEN 0.0 WHEN d4 < wo/2 THEN d4 ELSE wo/2 END AS dcs1,
        CASE WHEN dn4 THEN wo WHEN d4 < wo/2 THEN wo - 2*d4 ELSE 0.0 END AS wo1,
        d4 - wo/2 AS d5, dn4 OR d4 < wo/2 AS dn5 FROM r28),
      r30 AS (SELECT *,
        CASE WHEN dn5 THEN dcs1 WHEN d5 <= di THEN dcs1 + d5/2 ELSE dcs1 + di/2 END AS dcs2,
        CASE WHEN dn5 THEN ol1 WHEN d5 <= di THEN ol1 + d5/2 ELSE ol1 + di/2 END AS ol2,
        CASE WHEN dn5 THEN di WHEN d5 <= di THEN di - d5 ELSE 0.0 END AS di1,
        d5 - di AS d6, dn5 OR d5 <= di AS dn6 FROM r29),
      r31 AS (SELECT *,
        CASE WHEN dn6 THEN 0.0 ELSE d6/2 END AS kp,
        CASE WHEN dn6 THEN lc ELSE lc - d6/2 END AS lc1 FROM r30),
      r32 AS (SELECT *, mgr*hy1 AS en, fer*hy1 AS fs, mgr*ol2 AS fo,
        fer*ol2 AS fa, mgr*di1 AS mgdi, fer*di1 AS fedi FROM r31),
      r33 AS (SELECT *,
        q * ${nm("Q")} AS w_q, cv * ${nm("C")} AS w_c,
        or1 * ${nm("Or")} AS w_or, ab1 * ${nm("Ab")} AS w_ab,
        an * ${nm("An")} AS w_an, lc1 * ${nm("Lc")} AS w_lc,
        ne * ${nm("Ne")} AS w_ne, kp * ${nm("Kp")} AS w_kp,
        0.0::DOUBLE AS w_nc, ac * ${nm("Ac")} AS w_ac,
        nsv * ${nm("Ns")} AS w_ns, ks * ${nm("Ks")} AS w_ks,
        mgdi * ${nm("MgDi")} AS w_mgdi, fedi * ${nm("FeDi")} AS w_fedi,
        wo1 * ${nm("Wo")} AS w_wo, en * ${nm("En")} AS w_en,
        fs * ${nm("Fs")} AS w_fs, fo * ${nm("Fo")} AS w_fo,
        fa * ${nm("Fa")} AS w_fa, dcs2 * ${nm("Dcs")} AS w_dcs,
        mt * ${nm("Mt")} AS w_mt, il * ${nm("Il")} AS w_il,
        hm * ${nm("Hm")} AS w_hm, tn1 * ${nm("Tn")} AS w_tn,
        pf * ${nm("Pf")} AS w_pf, ru * ${nm("Ru")} AS w_ru,
        ap * ${nm("Ap")} AS w_ap, fr * ${nm("Fr")} AS w_fr,
        py * ${nm("Py")} AS w_py, cc * ${nm("Cc")} AS w_cc,
        0.0::DOUBLE AS w_mgsp, 0.0::DOUBLE AS w_fesp FROM r32),
      r34 AS (SELECT *, w_mgdi + w_fedi AS w_di, w_en + w_fs AS w_hy,
        w_fo + w_fa AS w_ol, w_mgsp + w_fesp AS w_sp FROM r33),
      r35 AS (SELECT *, ${tot("w_")} AS total FROM r34),
      r36 AS (SELECT *,
        w_q*100/total AS n_q, w_c*100/total AS n_c, w_or*100/total AS n_or,
        w_ab*100/total AS n_ab, w_an*100/total AS n_an, w_lc*100/total AS n_lc,
        w_ne*100/total AS n_ne, w_kp*100/total AS n_kp, w_nc*100/total AS n_nc,
        w_ac*100/total AS n_ac, w_ns*100/total AS n_ns, w_ks*100/total AS n_ks,
        w_di*100/total AS n_di, w_mgdi*100/total AS n_mgdi,
        w_fedi*100/total AS n_fedi, w_wo*100/total AS n_wo,
        w_hy*100/total AS n_hy, w_en*100/total AS n_en, w_fs*100/total AS n_fs,
        w_ol*100/total AS n_ol, w_fo*100/total AS n_fo, w_fa*100/total AS n_fa,
        w_dcs*100/total AS n_dcs, w_mt*100/total AS n_mt, w_il*100/total AS n_il,
        w_hm*100/total AS n_hm, w_tn*100/total AS n_tn, w_pf*100/total AS n_pf,
        w_ru*100/total AS n_ru, w_ap*100/total AS n_ap, w_fr*100/total AS n_fr,
        w_py*100/total AS n_py, w_cc*100/total AS n_cc, w_sp*100/total AS n_sp,
        w_mgsp*100/total AS n_mgsp, w_fesp*100/total AS n_fesp FROM r35)
      SELECT id, $sel, ROUND(${tot("n_")}, 6) AS "Total"
      FROM r36 ORDER BY id"""
  }

  // ---- end-member oracle SQL (p24-p27) -------------------------------------

  /** APFU SELECT list at an arbitrary oxygen basis over a CTE of oxide
    * columns (defaults to the standard set; pass `cols` in the frame's
    * column order so the oxygen-sum matches the Spark plan op order). */
  private def apfuSelAt(nOxy: Double, cols: Seq[String] = OXIDES): String = {
    val oxySum = cols.map(c => s"${molesSql(c)} * ${Chem.oxygensPer(c)}").mkString(" + ")
    cols.map { c =>
      s"${molesSql(c)} * ${Chem.cationsPer(c)} * ($nOxy / ($oxySum)) AS ${qi(Chem.oxideToIonCol(c))}"
    }.mkString(", ")
  }

  /** Droop Fe split SELECT list at arbitrary (nOxygens, idealCations)
    * over a CTE of ion columns (mirrors Valence.droopHigh + splitValence:
    * low column keeps the TOTAL, _calc.py:835-842). */
  private def droopSplitSel(nOxy: Double, ideal: Double): String = {
    val f = s"${2.0 * nOxy} * (1.0 - $ideal / ($apfuSumSql))"
    val high = s"CASE WHEN ($apfuSumSql) = 0.0 THEN 0.0 ELSE GREATEST($f, 0.0) END"
    val low = s"""GREATEST("Fe{2+}" - $high, 0.0)"""
    ionCols.flatMap { c =>
      if (c == "Fe{2+}") Seq(s""""Fe{2+}" AS "Fe{2+}"""", s""""Fe{2+}" - $low AS "Fe{3+}"""")
      else Seq(s"${qi(c)} AS ${qi(c)}")
    }.mkString(", ")
  }

  private def pctSql(x: String, total: String): String =
    s"CASE WHEN $total > 0.0 THEN $x / (CASE WHEN $total = 0.0 THEN 1.0 ELSE $total END) * 100.0 ELSE 0.0 END"
  private def fracSql(x: String, total: String): String =
    s"CASE WHEN $total > 0.0 THEN $x / (CASE WHEN $total = 0.0 THEN 1.0 ELSE $total END) ELSE 0.0 END"

  /** p24 oracle: Minerals.cpxEndMembers (IMA/Morimoto cascade) over the
    * 6-oxygen droop-split APFU. */
  private def cpxEndmemberSql: String = {
    val sel = Seq("jd" -> "Jd", "ae" -> "Ae", "di" -> "Di", "hd" -> "Hd",
      "krs" -> "Kosmochlor", "cats" -> "CaTs", "wo" -> "Wo", "en" -> "En",
      "fs" -> "Fs")
      .map { case (v, n) => s"""ROUND(${pctSql(v, "rawt")}, 6) AS "$n"""" }
      .mkString(", ")
    s""", apfu6 AS (SELECT id, ${apfuSelAt(6.0)} FROM ox),
      spl6 AS (SELECT id, ${droopSplitSel(6.0, 4.0)} FROM apfu6),
      x1 AS (SELECT *, LEAST(GREATEST(2.0 - "Si{4+}", 0.0), "Al{3+}") AS aliv FROM spl6),
      x2 AS (SELECT *, GREATEST("Al{3+}" - aliv, 0.0) AS alvi,
        LEAST("Na{+}", "Cr{3+}") AS krs FROM x1),
      x3 AS (SELECT *, LEAST(GREATEST("Na{+}" - krs, 0.0), "Fe{3+}") AS ae FROM x2),
      x4 AS (SELECT *, LEAST(GREATEST("Na{+}" - krs - ae, 0.0), alvi) AS jd FROM x3),
      x5 AS (SELECT *, GREATEST(alvi - jd, 0.0) AS alvirem FROM x4),
      x6 AS (SELECT *, LEAST(alvirem / 2.0, "Ca{2+}") AS cats FROM x5),
      x7 AS (SELECT *, GREATEST("Ca{2+}" - cats, 0.0) AS carem,
        "Mg{2+}" + "Fe{2+}" AS mgfe FROM x6),
      x8 AS (SELECT *, CASE WHEN mgfe = 0.0 THEN 1.0 ELSE mgfe END AS mgfesafe FROM x7),
      x9 AS (SELECT *, LEAST(carem * "Mg{2+}" / mgfesafe, "Mg{2+}") AS di,
        LEAST(carem * "Fe{2+}" / mgfesafe, "Fe{2+}") AS hd FROM x8),
      x10 AS (SELECT *, GREATEST(carem - di - hd, 0.0) AS wo,
        GREATEST("Mg{2+}" - di, 0.0) / 2.0 AS en,
        GREATEST("Fe{2+}" - hd, 0.0) / 2.0 AS fs FROM x9),
      x11 AS (SELECT *, krs + ae + jd + cats + wo + di + hd + en + fs AS rawt FROM x10)
      SELECT id, $sel FROM x11 ORDER BY id"""
  }

  /** 23-oxygen APFU + Schumacher (1991) Fe split CTE chain (ends at a6
    * with id + split ion columns); oxygens carried per cation = charge/2. */
  private def ampSplitCtes: String = {
    val oxyFromCations = ionCols.map { c =>
      val w = Chem.parseIon(c).map(_._2 / 2.0).get
      s"${qi(c)} * nrm * $w"
    }.mkString(" + ")
    // low column keeps the TOTAL (reference _calc.py:835-842)
    val splitSel = ionCols.flatMap { c =>
      if (c == "Fe{2+}")
        Seq(s""""Fe{2+}" AS "Fe{2+}"""",
          s""""Fe{2+}" - GREATEST("Fe{2+}" - hs, 0.0) AS "Fe{3+}"""")
      else Seq(s"${qi(c)} AS ${qi(c)}")
    }.mkString(", ")
    s"""apfu23 AS (SELECT id, ${apfuSelAt(23.0)} FROM ox),
      a1 AS (SELECT *, $apfuSumSql AS ssum FROM apfu23),
      a2 AS (SELECT *, 15.0 / (CASE WHEN ssum = 0.0 THEN 1.0 ELSE ssum END) AS nrm FROM a1),
      a3 AS (SELECT *, $oxyFromCations AS oxyc FROM a2),
      a4 AS (SELECT *, GREATEST(2.0 * (23.0 - oxyc), 0.0) / nrm AS hsc FROM a3),
      a5 AS (SELECT *, "Fe{2+}" - GREATEST("Fe{2+}" - GREATEST(hsc, 0.0), 0.0) AS hs FROM a4),
      a6 AS (SELECT id, $splitSel FROM a5)"""
  }

  /** p25 oracle: Minerals.amphiboleEndMembers — Schumacher Fe split over
    * the 23-oxygen APFU, greedy A/B/C/T allocation, then the group
    * classification x binary mixing factors. */
  private def ampEndmemberSql: String = {
    val (chain, last, takes, _) = allocCtes(Minerals.Amp, splitCols, "a6")
    def t(site: String, ion: String): String =
      takes.find(x => x._1 == site && x._2 == ion).get._3
    val out = Seq(
      "Tremolite" -> "iscal * xmg * (1.0 - xed) * (1.0 - xts)",
      "Actinolite" -> "iscal * xfe * (1.0 - xed) * (1.0 - xts)",
      "Edenite" -> "iscal * xmg * xed * (1.0 - xts)",
      "Ferro-Edenite" -> "iscal * xfe * xed * (1.0 - xts)",
      "Pargasite" -> "iscal * xmg * xed * xts",
      "Ferro-Pargasite" -> "iscal * xfe * xed * xts",
      "Tschermakite" -> "iscal * (1.0 - xed) * xts",
      "Richterite" -> "issc * xmg * (1.0 - xts)",
      "Winchite" -> "issc * xfe * (1.0 - xts)",
      "Glaucophane" -> "issod * xmg * xts",
      "Ferro-Glaucophane" -> "issod * xfe * xts",
      "Riebeckite" -> "issod * xfe * (1.0 - xts)",
      "Magnesio-Riebeckite" -> "issod * xmg * (1.0 - xts)")
      .map { case (n, e) => s"""ROUND(($e) * 100.0, 6) + 0.0 AS "$n"""" }
      .mkString(", ")
    s""", $ampSplitCtes,
      $chain,
      z1 AS (SELECT *, ${t("A", "K{+}")} + ${t("A", "Na{+}")} AS atot,
        ${t("B", "Na{+}")} AS nab, ${t("B", "Ca{2+}")} AS cab,
        ${t("C", "Mg{2+}")} AS mgc, ${t("C", "Fe{2+}")} AS fe2c,
        ${t("T", "Al{3+}")} AS alt FROM $last),
      z2 AS (SELECT *,
        CASE WHEN cab >= nab THEN 1.0 ELSE 0.0 END AS iscal,
        CASE WHEN nab > cab AND cab > 0.0 THEN 1.0 ELSE 0.0 END AS issc,
        CASE WHEN nab > 0.0 AND cab = 0.0 THEN 1.0 ELSE 0.0 END AS issod,
        mgc + fe2c AS mgfec FROM z1),
      z3 AS (SELECT *,
        mgc / (CASE WHEN mgfec = 0.0 THEN 1.0 ELSE mgfec END) AS xmg,
        fe2c / (CASE WHEN mgfec = 0.0 THEN 1.0 ELSE mgfec END) AS xfe,
        LEAST(alt / 8.0, 1.0) AS xts, LEAST(atot, 1.0) AS xed FROM z2)
      SELECT id, $out FROM z3 ORDER BY id"""
  }

  /** p26 oracle: Minerals.spinelEndMembers — Fe2O3->FeO preprocess,
    * 4-oxygen droop-split APFU, inverse-spinel T x M^2 products. */
  private def splEndmemberSql: String = {
    def mw(c: String) = Chem.mw(c)
    val oxmSel = OXIDES.map { c =>
      if (c == "FeO")
        s""""FeO" + "Fe2O3" / ${mw("Fe2O3")} * 2.0 * ${mw("FeO")} AS "FeO""""
      else s"${qi(c)} AS ${qi(c)}"
    }.mkString(", ")
    def i(c: String) = qi(c)
    val out = Seq("spl" -> "Spl", "herc" -> "Herc", "chrm" -> "Chrm",
      "mtc" -> "Mtc", "gahn" -> "Gahn", "frank" -> "Frank", "jac" -> "Jac",
      "ulv" -> "Ulv", "spss" -> "Spss")
      .map { case (v, n) => s"""ROUND(${pctSql(v, "total")}, 6) AS "$n"""" }
      .mkString(", ")
    s""", ox2 AS ($OX2_SQL),
      oxm AS (SELECT id, $oxmSel FROM ox2),
      apfu4 AS (SELECT id, ${apfuSelAt(4.0)} FROM oxm),
      spl4 AS (SELECT id, ${droopSplitSel(4.0, 3.0)} FROM apfu4),
      y1 AS (SELECT *,
        ${i("Mg{2+}")} + ${i("Fe{2+}")} + 0.0 + ${i("Mn{2+}")} + ${i("Fe{3+}")} + ${i("Al{3+}")} + ${i("Cr{3+}")} + ${i("Ti{4+}")} AS ttot,
        ${i("Al{3+}")} + ${i("Cr{3+}")} + ${i("Fe{3+}")} + ${i("Ti{4+}")} + ${i("Mg{2+}")} + ${i("Fe{2+}")} + ${i("Mn{2+}")} AS mtot FROM spl4),
      y2 AS (SELECT *,
        ${fracSql(i("Mg{2+}"), "ttot")} AS xmgt, ${fracSql(i("Fe{2+}"), "ttot")} AS xfe2t,
        0.0::DOUBLE AS xznt, ${fracSql(i("Mn{2+}"), "ttot")} AS xmnt,
        ${fracSql(i("Mg{2+}"), "mtot")} AS xmgm, ${fracSql(i("Al{3+}"), "mtot")} AS xalm,
        ${fracSql(i("Cr{3+}"), "mtot")} AS xcrm, ${fracSql(i("Fe{3+}"), "mtot")} AS xfe3m,
        ${fracSql(i("Ti{4+}"), "mtot")} AS xtim, ${fracSql(i("Fe{2+}"), "mtot")} AS xfe2m,
        ${fracSql(i("Mn{2+}"), "mtot")} AS xmnm FROM y1),
      y3 AS (SELECT *, xmgt * xalm * xalm AS spl, xfe2t * xalm * xalm AS herc,
        xfe2t * xcrm * xcrm AS chrm, xfe2t * xfe3m * xfe3m AS mtc,
        xznt * xalm * xalm AS gahn, xfe2t * xtim * xfe2m AS frank,
        xmnt * xalm * xalm AS jac, xmgt * xtim * xmgm AS ulv,
        xmnt * xmnm * xmnm AS spss FROM y2),
      y4 AS (SELECT *, spl + herc + chrm + mtc + gahn + frank + jac + ulv + spss AS total FROM y3)
      SELECT id, $out FROM y4 ORDER BY id"""
  }

  // ---- hpxeos phase oracle SQL (p45-p52) -----------------------------------

  /** Ternary feldspar A-site fraction SQL (site order Na, Ca, K). */
  private def fspASite(frac: String): String = {
    val tot = s"""(("Na{+}" + "Ca{2+}") + "K{+}")"""
    s"""${qi(frac)} / $tot"""
  }

  /** p45/p46/p51 oracles: single-site ternary feldspars — 8-oxygen APFU
    * (no split), A-site fractions, 2-variable polynomials. */
  private def ternaryFspSql(phase: graft.petro.hpxeos.Phase,
      vars: Seq[(String, String)], tag: String): String = {
    val varSel = vars.map { case (v, ion) => s"${fspASite(ion)} AS $v" }.mkString(", ")
    val varMap = vars.map { case (v, _) => v -> v }.toMap
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, varMap)
    val sel = polys.map { case (n0, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n0"""" }
      .mkString(", ")
    s""", apfu8$tag AS (SELECT id, ${apfuSelAt(8.0)} FROM ox),
      vars$tag AS (SELECT id, $varSel FROM apfu8$tag)
      SELECT id, $sel FROM vars$tag ORDER BY id"""
  }

  private def tcKspSql: String = ternaryFspSql(
    graft.petro.hpxeos.Metapelite.TcKFeldsparCbar1,
    Seq("na" -> "Na{+}", "ca" -> "Ca{2+}"), "ks")

  private def tcPlcSql: String = ternaryFspSql(
    graft.petro.hpxeos.Metapelite.TcPlagioclaseCbar1,
    Seq("ca" -> "Ca{2+}", "k" -> "K{+}"), "pc")

  private def tcPliSql: String = ternaryFspSql(
    graft.petro.hpxeos.Metabasite.TcPlagioclaseIbar1,
    Seq("ca" -> "Ca{2+}", "k" -> "K{+}"), "pi")

  /** p47 oracle: sapphirine at Q=0.04 — 20-oxygen droop-split APFU
    * (ideal 5 cations), x/y/f variables. */
  private def tcSapphirineSql: String = {
    val phase = graft.petro.hpxeos.Metapelite.TcSapphirine
    val varMap = Map("x" -> "x", "y" -> "y", "f" -> "f", "Q" -> "0.04::DOUBLE")
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, varMap)
    val sel = polys.map { case (n0, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n0"""" }
      .mkString(", ")
    s""", apfu20 AS (SELECT id, ${apfuSelAt(20.0)} FROM ox),
      spl20 AS (SELECT id, ${droopSplitSel(20.0, 5.0)} FROM apfu20),
      varsa AS (SELECT id, "Fe{2+}" / ("Fe{2+}" + "Mg{2+}") AS x,
        "Al{3+}" + "Si{4+}" - 10.0 AS y, "Fe{3+}" AS f FROM spl20)
      SELECT id, $sel FROM varsa ORDER BY id"""
  }

  /** p48 oracle: magnetite with the composition-dependent default order
    * state Q = 2x/(2+x) — 4-oxygen droop-split APFU (ideal 3). */
  private def tcMagnetiteSql: String = {
    val phase = graft.petro.hpxeos.Metapelite.TcMagnetite
    val varMap = Map("x" -> "x", "Q" -> "qq")
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, varMap)
    val sel = polys.map { case (n0, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n0"""" }
      .mkString(", ")
    s""", apfu4m AS (SELECT id, ${apfuSelAt(4.0)} FROM ox),
      spl4m AS (SELECT id, ${droopSplitSel(4.0, 3.0)} FROM apfu4m),
      varmt AS (SELECT id, 1.0 - "Ti{4+}" AS x,
        2.0 * (1.0 - "Ti{4+}") / (2.0 + (1.0 - "Ti{4+}")) AS qq FROM spl4m)
      SELECT id, $sel FROM varmt ORDER BY id"""
  }

  /** p49 oracle: metabasite olivine — 4-oxygen APFU (no split), the
    * one-variable fo/fa binary. */
  private def tcOlivineSql: String = {
    val phase = graft.petro.hpxeos.Metabasite.TcOlivine
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, Map("x" -> "x"))
    val sel = polys.map { case (n0, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n0"""" }
      .mkString(", ")
    s""", apfu4l AS (SELECT id, ${apfuSelAt(4.0)} FROM ox),
      varol AS (SELECT id, "Fe{2+}" / ("Mg{2+}" + "Fe{2+}") AS x FROM apfu4l)
      SELECT id, $sel FROM varol ORDER BY id"""
  }

  /** p50 oracle: peristerite — 8-oxygen APFU, Na/Ca binary A site. */
  private def tcPeristeriteSql: String = {
    val phase = graft.petro.hpxeos.Metabasite.TcPeristerite
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, Map("ca" -> "ca"))
    val sel = polys.map { case (n0, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n0"""" }
      .mkString(", ")
    s""", apfu8ab AS (SELECT id, ${apfuSelAt(8.0)} FROM ox),
      varab AS (SELECT id, "Ca{2+}" / ("Na{+}" + "Ca{2+}") AS ca FROM apfu8ab)
      SELECT id, $sel FROM varab ORDER BY id"""
  }

  /** p52 oracle: igneous orthopyroxene W24 at Q=0.05 — 6-oxygen
    * droop-split APFU (ideal 4), 8 mass-balance variables. */
  private def tcOpxW24Sql: String = {
    val phase = graft.petro.hpxeos.Igneous.TcOrthopyroxeneW24
    val varMap = Map("x" -> "x", "y" -> "y", "c" -> "c", "j" -> "j",
      "f" -> "f", "t" -> "t", "cr" -> "cr", "Q" -> "0.05::DOUBLE")
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, varMap)
    val sel = polys.map { case (n0, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n0"""" }
      .mkString(", ")
    s""", apfu6w AS (SELECT id, ${apfuSelAt(6.0)} FROM ox),
      spl6w AS (SELECT id, ${droopSplitSel(6.0, 4.0)} FROM apfu6w),
      varow AS (SELECT id, "Fe{2+}" / ("Fe{2+}" + "Mg{2+}") AS x,
        2.0 - "Si{4+}" AS y, "Ca{2+}" AS c, "Na{+}" AS j, "Fe{3+}" AS f,
        "Ti{4+}" AS t, "Cr{3+}" AS cr FROM spl6w)
      SELECT id, $sel FROM varow ORDER BY id"""
  }

  // ---- generic hpxeos phase oracle SQL (p54-p76) ---------------------------

  /** Charge-basis APFU SELECT list (to_apfu_by_charge; mirrors p12/p29). */
  private def chargeApfuSel(tcCharge: Double, cols: Seq[String] = OXIDES): String = {
    val chargeSum = cols.map { c =>
      s"${molesSql(c)} * ${Chem.cationsPer(c) * Chem.chargeOf(Chem.elementOf(c))}"
    }.mkString(" + ")
    cols.map { c =>
      s"${molesSql(c)} * ${Chem.cationsPer(c)} * ($tcCharge / ($chargeSum)) AS ${qi(Chem.oxideToIonCol(c))}"
    }.mkString(", ")
  }

  /** Generic a-x phase oracle: mirrors [[graft.petro.hpxeos.Phase.proportions]]
    * by composing the phase's own siteFractions/variables Column trees into
    * single expressions over the APFU CTE columns and rendering them to
    * DuckDB SQL with [[SqlMirror]] — the oracle is derived from the very
    * Column trees the Spark plan executes, so the mirror cannot drift from
    * the implementation (only the shared APFU/droop prelude is restated).
    * The APFU CTE shape comes from the MineralSpec: oxygen or charge
    * basis, optional droop Fe split; `preprocessFeoToFe2o3` mirrors the
    * one non-identity preprocess hook reachable from oxFrame (epidote —
    * fe2o3ToFeo hooks are no-ops because ox has no Fe2O3 column). */
  private def tcAutoSql(phase: graft.petro.hpxeos.Phase,
      ops: Map[String, Double] = Map.empty,
      preprocessFeoToFe2o3: Boolean = false): String = {
    val spec = phase.mineral
    val oxides: Seq[String] =
      if (preprocessFeoToFe2o3) OXIDES.filterNot(_ == "FeO") :+ "Fe2O3" else OXIDES
    val oxCte =
      if (preprocessFeoToFe2o3) {
        val others = OXIDES.filterNot(_ == "FeO").map(qi).mkString(", ")
        val conv = s"""("FeO" / ${Chem.mw("FeO")}) * 0.5 * ${Chem.mw("Fe2O3")}"""
        Seq(s"""oxp AS (SELECT id, $others, $conv AS "Fe2O3" FROM ox)""")
      } else Nil
    val oxSrc = if (preprocessFeoToFe2o3) "oxp" else "ox"
    val split = spec.valenceSplits.nonEmpty
    val apfuSel = spec.chargeBasis match {
      case Some(tcCharge) => chargeApfuSel(tcCharge, oxides)
      case None => apfuSelAt(spec.nOxygens, oxides)
    }
    val aCte = s"a1 AS (SELECT id, $apfuSel FROM $oxSrc)"
    val sCte = if (split) {
      val vs = spec.valenceSplits.head
      val nOxy = vs.nOxygens.getOrElse(spec.nOxygens)
      val ideal = vs.idealCations.orElse(spec.idealCations).getOrElse(
        sys.error(s"${spec.name}: droop split without ideal cations"))
      Seq(s"s1 AS (SELECT id, ${droopSplitSel(nOxy, ideal)} FROM a1)")
    } else Nil
    val apfuSrc = if (split) "s1" else "a1"
    // present ions mirror rawApfu's output columns for this spec
    val present: Set[String] = oxides.map(Chem.oxideToIonCol).toSet ++
      (if (split) Set("Fe{3+}") else Set.empty)
    def comp(c: String): org.apache.spark.sql.Column =
      if (present(c)) col(c) else lit(0.0)
    val totals: Map[String, org.apache.spark.sql.Column] =
      phase.sites.map { case (st, cats) =>
        st -> cats.map(comp).reduceLeft(_ + _)
      }.toMap
    val sfMap = phase.siteFractions(comp, totals).toMap
    def order(name: String): org.apache.spark.sql.Column = ops.get(name) match {
      case Some(v) => lit(v)
      case None => phase.orderDefault(name, n => sfMap(n))
    }
    val varExprs = phase.variables(n => sfMap(n), order)
    val orderExtra = phase.orderParameterNames
      .filterNot(n => varExprs.exists(_._1 == n)).map(n => n -> order(n))
    val allVars = varExprs ++ orderExtra
    val varSel = allVars
      .map { case (n, c) => s"${org.apache.spark.sql.graftbridge.SqlMirror.render(c)} AS ${qi(n)}" }
      .mkString(", ")
    val varNames = allVars.map(_._1).toSet
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, n => {
      require(varNames(n), s"${spec.name}: pBlock references unknown var $n")
      qi(n)
    })
    // `+ 0.0` canonicalizes IEEE -0.0 to +0.0 on the DuckDB side: DuckDB's
    // ROUND preserves the sign of a tiny negative rounded to zero, while
    // Spark's round (BigDecimal HALF_UP) never emits -0.0. Without it the
    // driver's raw hash diverges on rows where a proportion lands exactly on
    // zero (r4: p65_tc_spinel_mp, 31,810/60,000 rows differed only in the
    // zero sign bit). Applied to every percent-emitting generator below.
    val sel = polys.map { case (n, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n"""" }
      .mkString(", ")
    val ctes = oxCte ++ Seq(aCte) ++ sCte :+ s"v1 AS (SELECT id, $varSel FROM $apfuSrc)"
    s""", ${ctes.mkString(",\n      ")}
      SELECT id, $sel FROM v1 ORDER BY id"""
  }

  // ---- end-member oracle SQL (p35-p44) -------------------------------------

  /** p35 oracle: Minerals.opxEndMembers — 6-oxygen droop-split APFU,
    * T-site Si/Al fill with the Mg-Tschermak correction, M1 pool
    * cascade, then Wo/En/Fs from the leftover pool (not normalized). */
  private def opxEndmemberSql: String = {
    // M1 cascade over (Al, Ti, Cr, Fe3, Mg, Fe2) in spec order; pool for
    // Al starts after the T-site take, others at the raw ion column.
    val m1 = Seq("Al{3+}" -> "pal0", "Ti{4+}" -> null, "Cr{3+}" -> null,
      "Fe{3+}" -> null, "Mg{2+}" -> null, "Fe{2+}" -> null)
    val ctes = scala.collection.mutable.ListBuffer.empty[String]
    var prev = "o4"
    var rem = "rem0"
    var k = 0
    val poolOut = scala.collection.mutable.Map.empty[String, String]
    m1.foreach { case (ion, pre) =>
      k += 1
      val p = if (pre != null) pre else qi(ion)
      val take = s"LEAST($p, $rem)"
      ctes += s"om$k AS (SELECT *, $take AS tk$k, $p - $take AS pl$k, $rem - $take AS rm$k FROM $prev)"
      prev = s"om$k"
      rem = s"rm$k"
      poolOut(ion) = s"pl$k"
    }
    s""", apfu6o AS (SELECT id, ${apfuSelAt(6.0)} FROM ox),
      spl6o AS (SELECT id, ${droopSplitSel(6.0, 4.0)} FROM apfu6o),
      o1 AS (SELECT *, GREATEST("Si{4+}", 0.0) AS si0,
        GREATEST("Al{3+}", 0.0) AS al0 FROM spl6o),
      o2 AS (SELECT *, GREATEST(al0 - (2.0 - si0), 0.0) AS mgts,
        LEAST(si0, 2.0) AS tsi FROM o1),
      o3 AS (SELECT *, LEAST(al0 - mgts, 2.0 - tsi) AS tal FROM o2),
      o4 AS (SELECT *, "Al{3+}" - tal AS pal0, 1.0::DOUBLE AS rem0 FROM o3),
      ${ctes.mkString(", ")},
      o5 AS (SELECT *, GREATEST("Ca{2+}", 0.0) AS ca, GREATEST("Mn{2+}", 0.0) AS mn,
        GREATEST(${poolOut("Fe{2+}")}, 0.0) AS fe2p,
        GREATEST(${poolOut("Mg{2+}")}, 0.0) AS mgp FROM $prev),
      o6 AS (SELECT *, ca AS wo, GREATEST(1.0 - ca - mn, 0.0) AS enfscap,
        mgp + fe2p AS mgfe FROM o5),
      o7 AS (SELECT *, enfscap * (mgp / (CASE WHEN mgfe = 0.0 THEN 1.0 ELSE mgfe END)) AS en,
        enfscap * (fe2p / (CASE WHEN mgfe = 0.0 THEN 1.0 ELSE mgfe END)) AS fs FROM o6)
      SELECT id, ROUND(mgts * 100.0, 6) + 0.0 AS "MgTs", ROUND(wo * 100.0, 6) + 0.0 AS "Wo",
        ROUND(en * 100.0, 6) + 0.0 AS "En", ROUND(fs * 100.0, 6) + 0.0 AS "Fs"
      FROM o7 ORDER BY id"""
  }

  /** Shared mica head: 11-oxygen APFU -> Al(IV)/Al(VI), octahedral sum,
    * tri/dioctahedral fractions, Mg#. */
  private def micaCtes(tag: String): String =
    s"""apfu11$tag AS (SELECT id, ${apfuSelAt(11.0)} FROM ox),
      ${tag}1 AS (SELECT *, LEAST(GREATEST(4.0 - "Si{4+}", 0.0), "Al{3+}") AS aliv FROM apfu11$tag),
      ${tag}2 AS (SELECT *, "Al{3+}" - aliv AS alvi FROM ${tag}1),
      ${tag}3 AS (SELECT *, alvi + "Ti{4+}" + "Cr{3+}" + "Fe{2+}" + "Mn{2+}" + "Mg{2+}" AS msum,
        "Mg{2+}" + "Fe{2+}" AS mgfe FROM ${tag}2),
      ${tag}4 AS (SELECT *, LEAST(GREATEST(msum - 2.0, 0.0), 1.0) AS xtri,
        CASE WHEN mgfe > 0.0 THEN "Mg{2+}" / (CASE WHEN mgfe = 0.0 THEN 1.0 ELSE mgfe END) ELSE 0.0 END AS xmg
        FROM ${tag}3),
      ${tag}5 AS (SELECT *, 1.0 - xtri AS xdi FROM ${tag}4)"""

  /** p36 oracle: Minerals.muscoviteEndMembers (MinPlot dioctahedral). */
  private def msEndmemberSql: String =
    s""", ${micaCtes("mu")},
      mu6 AS (SELECT *, LEAST(GREATEST(alvi - 1.0, 0.0), 1.0) AS xm,
        "K{+}" + "Na{+}" + "Ca{2+}" AS alkali FROM mu5),
      mu7 AS (SELECT *, 1.0 - xm AS xcel, alkali * xm AS xmpm,
        CASE WHEN alkali = 0.0 THEN 1.0 ELSE alkali END AS alksafe FROM mu6),
      mu8 AS (SELECT *, xmg * xcel AS xmgcel, xm - xmpm AS xprl,
        CASE WHEN alkali > 0.0 THEN "K{+}" / alksafe * xmpm ELSE 0.0 END AS xms,
        CASE WHEN alkali > 0.0 THEN "Na{+}" / alksafe * xmpm ELSE 0.0 END AS xpg,
        CASE WHEN alkali > 0.0 THEN "Ca{2+}" / alksafe * xmpm ELSE 0.0 END AS xmrg
        FROM mu7),
      mu9 AS (SELECT *, xcel - xmgcel AS xfecel FROM mu8)
      SELECT id,
        ROUND(xmgcel * xdi * 100.0, 6) + 0.0 AS "Al-Celadonite",
        ROUND(xfecel * xdi * 100.0, 6) + 0.0 AS "Fe-Al-Celadonite",
        ROUND(xprl * xdi * 100.0, 6) + 0.0 AS "Pyrophyllite",
        ROUND(xmrg * xdi * 100.0, 6) + 0.0 AS "Margarite",
        ROUND(xpg * xdi * 100.0, 6) + 0.0 AS "Paragonite",
        ROUND(xms * xdi * 100.0, 6) + 0.0 AS "Muscovite",
        ROUND(xtri * 100.0, 6) + 0.0 AS "Trioctahedral"
      FROM mu9 ORDER BY id"""

  /** p37 oracle: Minerals.biotiteEndMembers (MinPlot trioctahedral). */
  private def btEndmemberSql: String =
    s""", ${micaCtes("bi")},
      bi6 AS (SELECT *, LEAST(GREATEST("Si{4+}" - 2.0, 0.0), 1.0) AS xphlann FROM bi5),
      bi7 AS (SELECT *, 1.0 - xphlann AS xsideas FROM bi6)
      SELECT id,
        ROUND(xphlann * xmg * xtri * 100.0, 6) + 0.0 AS "Phlogopite",
        ROUND((xphlann - xphlann * xmg) * xtri * 100.0, 6) + 0.0 AS "Annite",
        ROUND(xsideas * xmg * xtri * 100.0, 6) + 0.0 AS "Eastonite",
        ROUND((xsideas - xsideas * xmg) * xtri * 100.0, 6) + 0.0 AS "Siderophyllite",
        ROUND(xdi * 100.0, 6) + 0.0 AS "Dioctahedral"
      FROM bi7 ORDER BY id"""

  /** p38 oracle: Minerals.stauroliteEndMembers — R2+ fractions at the
    * 48-oxygen basis (ZnO absent from the table -> literal 0). */
  private def stEndmemberSql: String = {
    val r2 = s""""Fe{2+}" + "Mg{2+}" + 0.0 + "Mn{2+}""""
    s""", apfu48 AS (SELECT id, ${apfuSelAt(48.0)} FROM ox),
      st1 AS (SELECT *, $r2 AS r2 FROM apfu48)
      SELECT id,
        ROUND(${pctSql(qi("Fe{2+}"), "r2")}, 6) AS "Fe-Staurolite",
        ROUND(${pctSql(qi("Mg{2+}"), "r2")}, 6) AS "Mg-Staurolite",
        ROUND(${pctSql("0.0", "r2")}, 6) AS "Zn-Staurolite",
        ROUND(${pctSql(qi("Mn{2+}"), "r2")}, 6) AS "Mn-Staurolite"
      FROM st1 ORDER BY id"""
  }

  /** p39 oracle: Minerals.chloriteEndMembers — 28-charge APFU basis
    * (toApfuByCharge + ion rename), MinPlot normal/Tschermak split. */
  private def chlEndmemberSql: String = {
    val chargeSum = OXIDES.map { c =>
      s"${molesSql(c)} * ${Chem.cationsPer(c) * Chem.chargeOf(Chem.elementOf(c))}"
    }.mkString(" + ")
    val ionSel = OXIDES.map { c =>
      s"${molesSql(c)} * ${Chem.cationsPer(c)} * (28.0 / ($chargeSum)) AS ${qi(Chem.oxideToIonCol(c))}"
    }.mkString(", ")
    s""", capfu AS (SELECT id, $ionSel FROM ox),
      ch1 AS (SELECT *, "Mg{2+}" + "Fe{2+}" AS r2 FROM capfu),
      ch2 AS (SELECT *,
        CASE WHEN r2 > 0.0 THEN "Mg{2+}" / (CASE WHEN r2 = 0.0 THEN 1.0 ELSE r2 END) ELSE 0.0 END AS xmg,
        LEAST(GREATEST("Si{4+}" - 2.0, 0.0), 1.0) AS xnormal FROM ch1),
      ch3 AS (SELECT *, 1.0 - xnormal AS xtsch FROM ch2)
      SELECT id,
        ROUND(xnormal * xmg * 100.0, 6) + 0.0 AS "Clinochlore",
        ROUND(xnormal * (1.0 - xmg) * 100.0, 6) + 0.0 AS "Chamosite",
        ROUND(xtsch * xmg * 100.0, 6) + 0.0 AS "Mg-Sudoite",
        ROUND(xtsch * (1.0 - xmg) * 100.0, 6) + 0.0 AS "Fe-Sudoite"
      FROM ch3 ORDER BY id"""
  }

  /** Preprocessed-oxide CTE for the FeO->Fe2O3 minerals (Ep, Ttn):
    * additive merge into Fe2O3, FeO dropped, Fe2O3 appended last —
    * matching Convert.feoToFe2o3's column order. */
  private def feCols: Seq[String] = OXIDES.filterNot(_ == "FeO") :+ "Fe2O3"
  private def feOxCte(name: String): String = {
    val sel = OXIDES.filterNot(_ == "FeO").map(c => s"${qi(c)} AS ${qi(c)}") :+
      s""""FeO" / ${Chem.mw("FeO")} * 0.5 * ${Chem.mw("Fe2O3")} AS "Fe2O3""""
    s"""$name AS (SELECT id, ${sel.mkString(", ")} FROM ox)"""
  }

  /** p40 oracle: Minerals.epidoteEndMembers — M-site trivalent fractions
    * at 12.5 oxygens (Mn{3+}/V{3+} absent -> literal 0). */
  private def epEndmemberSql: String = {
    val m = s""""Al{3+}" + "Fe{3+}" + 0.0 + 0.0 + "Cr{3+}""""
    s""", ${feOxCte("oxep")},
      apfuep AS (SELECT id, ${apfuSelAt(12.5, feCols)} FROM oxep),
      ep1 AS (SELECT *, $m AS m FROM apfuep)
      SELECT id,
        ROUND(${pctSql(qi("Al{3+}"), "m")}, 6) AS "Clinozoisite",
        ROUND(${pctSql(qi("Fe{3+}"), "m")}, 6) AS "Epidote",
        ROUND(${pctSql("0.0", "m")}, 6) AS "Piemontite",
        ROUND(${pctSql("0.0", "m")}, 6) AS "Mukhinite",
        ROUND(${pctSql(qi("Cr{3+}"), "m")}, 6) AS "Tawmawite"
      FROM ep1 ORDER BY id"""
  }

  /** p41 oracle: Minerals.titaniteEndMembers — B-site fractions at 5
    * oxygens (Sn/Nb/Zr/V absent -> literal 0). */
  private def ttnEndmemberSql: String = {
    val b = s""""Ti{4+}" + "Al{3+}" + "Fe{3+}" + 0.0 + 0.0 + 0.0 + "Cr{3+}" + 0.0 + "Mg{2+}""""
    val other = s"""0.0 + 0.0 + "Cr{3+}" + 0.0 + "Mg{2+}""""
    s""", ${feOxCte("oxtt")},
      apfutt AS (SELECT id, ${apfuSelAt(5.0, feCols)} FROM oxtt),
      tt1 AS (SELECT *, $b AS b, $other AS oth FROM apfutt)
      SELECT id,
        ROUND(${pctSql(qi("Ti{4+}"), "b")}, 6) AS "Ttn",
        ROUND(${pctSql(qi("Al{3+}"), "b")}, 6) AS "Al-Ttn",
        ROUND(${pctSql(qi("Fe{3+}"), "b")}, 6) AS "Fe-Ttn",
        ROUND(${pctSql("0.0", "b")}, 6) AS "Mal",
        ROUND(${pctSql("oth", "b")}, 6) AS "Other"
      FROM tt1 ORDER BY id"""
  }

  /** p42 oracle: Minerals.chloritoidEndMembers — M1 R2+ fractions over
    * the 12-oxygen droop-split APFU (ideal 8 cations). */
  private def cldEndmemberSql: String =
    s""", apfu12c AS (SELECT id, ${apfuSelAt(12.0)} FROM ox),
      spl12c AS (SELECT id, ${droopSplitSel(12.0, 8.0)} FROM apfu12c),
      cd1 AS (SELECT *, "Fe{2+}" + "Mg{2+}" + "Mn{2+}" AS r2 FROM spl12c)
      SELECT id,
        ROUND(${pctSql(qi("Fe{2+}"), "r2")}, 6) AS "Cld",
        ROUND(${pctSql(qi("Mg{2+}"), "r2")}, 6) AS "Mgcld",
        ROUND(${pctSql(qi("Mn{2+}"), "r2")}, 6) AS "Mncld"
      FROM cd1 ORDER BY id"""

  /** p43 oracle: Minerals.cordieriteEndMembers — A-site channel filling
    * + B-site R2+ fractions at 18 oxygens. */
  private def crdEndmemberSql: String =
    s""", apfu18 AS (SELECT id, ${apfuSelAt(18.0)} FROM ox),
      cr1 AS (SELECT *, "Fe{2+}" + "Mg{2+}" + "Mn{2+}" AS r2,
        LEAST("Na{+}" + "K{+}" + "Ca{2+}", 1.0) AS atot FROM apfu18),
      cr2 AS (SELECT *, 1.0 - atot AS bfrac FROM cr1)
      SELECT id,
        ROUND(atot * 100.0, 6) + 0.0 AS "H₂O-Crd",
        ROUND(${fracSql(qi("Mg{2+}"), "r2")} * bfrac * 100.0, 6) + 0.0 AS "Mg-Crd",
        ROUND(${fracSql(qi("Fe{2+}"), "r2")} * bfrac * 100.0, 6) + 0.0 AS "Fe-Crd",
        ROUND(${fracSql(qi("Mn{2+}"), "r2")} * bfrac * 100.0, 6) + 0.0 AS "Mn-Crd"
      FROM cr2 ORDER BY id"""

  /** p44 oracle: Minerals.ilmeniteEndMembers — greedy A/B allocation over
    * the 3-oxygen droop-split APFU (ideal 2), A x B fraction products. */
  private def ilmEndmemberSql: String = {
    val (chain, last, takes, _) = allocCtes(Minerals.Ilm, splitCols, "spl3i")
    def t(site: String, ion: String): String =
      takes.find(x => x._1 == site && x._2 == ion).get._3
    val out = Seq("ilm" -> "Ilm", "gk" -> "Gk", "pph" -> "Pph",
      "hem" -> "Hem", "chr" -> "Chr")
      .map { case (v, n) => s"""ROUND(${pctSql(v, "total")}, 6) AS "$n"""" }
      .mkString(", ")
    s""", apfu3i AS (SELECT id, ${apfuSelAt(3.0)} FROM ox),
      spl3i AS (SELECT id, ${droopSplitSel(3.0, 2.0)} FROM apfu3i),
      $chain,
      il1 AS (SELECT *,
        ${t("A", "Fe{2+}")} + ${t("A", "Fe{3+}")} + ${t("A", "Mg{2+}")} + ${t("A", "Mn{2+}")} AS atot,
        ${t("B", "Ti{4+}")} + ${t("B", "Fe{3+}")} + ${t("B", "Al{3+}")} + ${t("B", "Cr{3+}")} AS btot
        FROM $last),
      il2 AS (SELECT *,
        ${fracSql(t("A", "Fe{2+}"), "atot")} AS xfe2a, ${fracSql(t("A", "Mg{2+}"), "atot")} AS xmga,
        ${fracSql(t("A", "Mn{2+}"), "atot")} AS xmna, ${fracSql(t("A", "Fe{3+}"), "atot")} AS xfe3a,
        ${fracSql(t("B", "Ti{4+}"), "btot")} AS xtib, ${fracSql(t("B", "Fe{3+}"), "btot")} AS xfe3b,
        ${fracSql(t("B", "Cr{3+}"), "btot")} AS xcrb FROM il1),
      il3 AS (SELECT *, xfe2a * xtib AS ilm, xmga * xtib AS gk, xmna * xtib AS pph,
        xfe3a * xfe3b AS hem, xfe3a * xcrb AS chr FROM il2),
      il4 AS (SELECT *, ilm + gk + pph + hem + chr AS total FROM il3)
      SELECT id, $out FROM il4 ORDER BY id"""
  }

  /** p28 oracle: Metabasite.TcAmphibole.endMembers at the explicit order
    * state (z=0.05, a=0.1, k=0.3, Q1=0.02, Q2=-0.02) — Schumacher-split
    * 23-oxygen APFU -> mass-balance variables -> the 11 p(...) axfile
    * polynomials rendered by Poly.toSqlAll. */
  private def tcAmphiboleSql: String = {
    val phase = graft.petro.hpxeos.Metabasite.TcAmphibole
    val varMap = Map("x" -> "x", "y" -> "y", "f" -> "f", "t" -> "t",
      "c" -> "c", "z" -> "0.05::DOUBLE", "a" -> "0.1::DOUBLE",
      "k" -> "0.3::DOUBLE", "Q1" -> "0.02::DOUBLE", "Q2" -> "(-0.02)::DOUBLE")
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, varMap)
    val sel = polys.map { case (n, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n"""" }
      .mkString(", ")
    s""", $ampSplitCtes,
      sfr AS (SELECT id, "Fe{2+}" AS sfe, "Mg{2+}" AS smg,
        "Fe{3+}" AS sfe3, "Ti{4+}" AS sti, "Ca{2+}" AS sca,
        "Al{3+}" - (8.0 - "Si{4+}") AS salm2 FROM a6),
      vars AS (SELECT id, sfe / (sfe + smg) AS x, salm2 / 2.0 AS y,
        sfe3 / 2.0 AS f, sti / 2.0 AS t, sca / 2.0 AS c FROM sfr)
      SELECT id, $sel FROM vars ORDER BY id"""
  }

  /** p29 oracle: Metapelite.TcChlorite.endMembers at QAl=0.2, Q1=0.1,
    * Q4=-0.1 — 28-positive-charge APFU basis (no Fe2O3 in the table so
    * f=0), octahedral-Al mass balance, 8 p(...) polynomials. */
  private def tcChloriteSql: String = {
    val phase = graft.petro.hpxeos.Metapelite.TcChlorite
    val chargeSum = OXIDES.map { c =>
      s"${molesSql(c)} * ${Chem.cationsPer(c) * Chem.chargeOf(Chem.elementOf(c))}"
    }.mkString(" + ")
    val chargeApfuSel = OXIDES.map { c =>
      s"${molesSql(c)} * ${Chem.cationsPer(c)} * (28.0 / ($chargeSum)) AS ${qi(Chem.oxideToIonCol(c))}"
    }.mkString(", ")
    val varMap = Map("x" -> "x", "y" -> "y", "f" -> "0.0::DOUBLE", "m" -> "m",
      "QAl" -> "0.2::DOUBLE", "Q1" -> "0.1::DOUBLE", "Q4" -> "(-0.1)::DOUBLE")
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, varMap)
    val sel = polys.map { case (n, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n"""" }
      .mkString(", ")
    s""", chapfu AS (SELECT id, $chargeApfuSel FROM ox),
      sfr AS (SELECT id, "Fe{2+}" AS sfe, "Mg{2+}" AS smg, "Mn{2+}" AS smn,
        "Al{3+}" - (4.0 - "Si{4+}") AS saloct FROM chapfu),
      vars AS (SELECT id, sfe / (sfe + smg) AS x, saloct / 2.0 AS y,
        smn / 5.0 AS m FROM sfr)
      SELECT id, $sel FROM vars ORDER BY id"""
  }

  /** p30 oracle: Igneous.TcGarnetW24.endMembers — default (no order
    * parameters); the M1 Mg pool subtracts the Ti-coupled M2 Mg. */
  private def tcGarnetW24Sql: String = {
    val phase = graft.petro.hpxeos.Igneous.TcGarnetW24
    val varMap = Map("x" -> "x", "c" -> "c", "f" -> "f", "cr" -> "cr", "t" -> "t")
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, varMap)
    val sel = polys.map { case (n, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n"""" }
      .mkString(", ")
    s""", apfu AS (SELECT id, $apfuSelectSql FROM ox),
      spl AS (SELECT id, $splitSelectSql FROM apfu),
      vars AS (SELECT id,
        "Fe{2+}" / ("Fe{2+}" + ("Mg{2+}" - "Ti{4+}")) AS x,
        "Ca{2+}" / 3.0 AS c, "Fe{3+}" / 2.0 AS f,
        "Cr{3+}" / 2.0 AS cr, "Ti{4+}" / 2.0 AS t FROM spl)
      SELECT id, $sel FROM vars ORDER BY id"""
  }

  /** p31 oracle: Metabasite.TcOmphacite.endMembers at Q=0.05, Qaf=0.02,
    * Qfm=-0.03 — f is a ratio over the M1 trivalent sub-pool. */
  private def tcOmphaciteSql: String = {
    val phase = graft.petro.hpxeos.Metabasite.TcOmphacite
    val varMap = Map("x" -> "x", "f" -> "f", "j" -> "j",
      "Q" -> "0.05::DOUBLE", "Qaf" -> "0.02::DOUBLE", "Qfm" -> "(-0.03)::DOUBLE")
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, varMap)
    val sel = polys.map { case (n, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n"""" }
      .mkString(", ")
    s""", apfu6d AS (SELECT id, ${apfuSelAt(6.0)} FROM ox),
      spl6d AS (SELECT id, ${droopSplitSel(6.0, 4.0)} FROM apfu6d),
      vars AS (SELECT id,
        "Fe{2+}" / ("Fe{2+}" + "Mg{2+}") AS x,
        "Fe{3+}" / ("Al{3+}" + "Fe{3+}") AS f,
        "Na{+}" AS j FROM spl6d)
      SELECT id, $sel FROM vars ORDER BY id"""
  }

  /** p32 oracle: Igneous.TcSpinelT21.endMembers at Q1=0.5, Q2=0.2,
    * Q3=-0.1 — Fe2O3 merged into FeO, then 4-oxygen droop-split APFU. */
  private def tcSpinelT21Sql: String = {
    def mw(c: String) = Chem.mw(c)
    val phase = graft.petro.hpxeos.Igneous.TcSpinelT21
    val varMap = Map("x" -> "x", "y" -> "y", "c" -> "c", "t" -> "t",
      "Q1" -> "0.5::DOUBLE", "Q2" -> "0.2::DOUBLE", "Q3" -> "(-0.1)::DOUBLE")
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, varMap)
    val sel = polys.map { case (n, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n"""" }
      .mkString(", ")
    val oxmSel = OXIDES.map { c =>
      if (c == "FeO")
        s""""FeO" + "Fe2O3" / ${mw("Fe2O3")} * 2.0 * ${mw("FeO")} AS "FeO""""
      else s"${qi(c)} AS ${qi(c)}"
    }.mkString(", ")
    s""", ox2 AS ($OX2_SQL),
      oxms AS (SELECT id, $oxmSel FROM ox2),
      apfu4s AS (SELECT id, ${apfuSelAt(4.0)} FROM oxms),
      spl4s AS (SELECT id, ${droopSplitSel(4.0, 3.0)} FROM apfu4s),
      vars AS (SELECT id,
        "Fe{2+}" / ("Fe{2+}" + "Mg{2+}") AS x,
        "Fe{3+}" / ("Al{3+}" + "Fe{3+}") AS y,
        "Cr{3+}" / 2.0 AS c, "Ti{4+}" AS t FROM spl4s)
      SELECT id, $sel FROM vars ORDER BY id"""
  }

  /** p33 oracle: Igneous.TcClinopyroxeneW24.endMembers at Q=0.05 —
    * eight mass-balance variables over the 6-oxygen droop-split APFU. */
  private def tcCpxW24Sql: String = {
    val phase = graft.petro.hpxeos.Igneous.TcClinopyroxeneW24
    val varMap = Map("x" -> "x", "y" -> "y", "o" -> "o", "n" -> "n",
      "f" -> "f", "t" -> "t", "cr" -> "cr", "k" -> "k", "Q" -> "0.05::DOUBLE")
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, varMap)
    val sel = polys.map { case (n0, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n0"""" }
      .mkString(", ")
    s""", apfu6c AS (SELECT id, ${apfuSelAt(6.0)} FROM ox),
      spl6c AS (SELECT id, ${droopSplitSel(6.0, 4.0)} FROM apfu6c),
      vars AS (SELECT id,
        "Fe{2+}" / ("Fe{2+}" + "Mg{2+}") AS x,
        2.0 - "Si{4+}" AS y,
        1.0 - "Ca{2+}" - "Na{+}" - "K{+}" AS o,
        "Na{+}" AS n, "Fe{3+}" AS f, "Ti{4+}" AS t,
        "Cr{3+}" AS cr, "K{+}" AS k FROM spl6c)
      SELECT id, $sel FROM vars ORDER BY id"""
  }

  /** p34 oracle: Igneous.TcIlmeniteW24.endMembers at Q=0.1, Qt=0.05 —
    * 3-oxygen APFU over the ox+Fe2O3 table (no valence split; Fe3+ comes
    * from the measured Fe2O3 column). */
  private def tcIlmW24Sql: String = {
    val phase = graft.petro.hpxeos.Igneous.TcIlmeniteW24
    val varMap = Map("i" -> "i", "m" -> "m",
      "Q" -> "0.1::DOUBLE", "Qt" -> "0.05::DOUBLE")
    val polys = graft.petro.hpxeos.Poly.toSqlAll(phase.pBlock, varMap)
    val sel = polys.map { case (n0, sql) => s"""ROUND(($sql) * 100.0, 6) + 0.0 AS "$n0"""" }
      .mkString(", ")
    s""", ox2 AS ($OX2_SQL),
      apfu3i AS (SELECT id, ${apfuSelAt(3.0, OXIDES :+ "Fe2O3")} FROM ox2),
      vars AS (SELECT id,
        1.0 - "Fe{3+}" / 2.0 AS i,
        "Mg{2+}" / ("Fe{2+}" + "Mg{2+}") AS m FROM apfu3i)
      SELECT id, $sel FROM vars ORDER BY id"""
  }

  /** p27 oracle: Minerals.garnetFe3EndMembers — the constant pinv(A)
    * linear map over the 12-oxygen APFU (same pseudo-inverse doubles as
    * the Column cascade, computed by the same LinAlg code). */
  private def grtFe3EndmemberSql: String = {
    // [Ca Mg Fe Cr Mn Al Si] rows per end member (Minerals.garnetFe3EndMembers)
    val aM: Array[Array[Double]] = Array(
      Array(0, 3, 0, 0, 0, 2, 3), Array(0, 0, 3, 0, 0, 2, 3),
      Array(0, 0, 0, 0, 3, 2, 3), Array(3, 0, 0, 0, 0, 2, 3),
      Array(3, 0, 2, 0, 0, 0, 3), Array(3, 0, 0, 2, 0, 0, 3)
    ).map(_.map(_.toDouble))
    val pinv = graft.petro.LinAlg.pseudoInverseOfTranspose(aM)
    val bCols = Seq("Ca{2+}", "Mg{2+}", "Fe{2+}", "Cr{3+}", "Mn{2+}",
      "Al{3+}", "Si{4+}")
    val names = Seq("Prp", "Alm", "Sps", "Grs", "Adr", "Uvr")
    val rawSel = names.indices.map { i =>
      val sum = bCols.indices.map(j => s"${qi(bCols(j))} * ${pinv(i)(j)}")
        .mkString(" + ")
      s"GREATEST($sum, 0.0) AS raw$i"
    }.mkString(", ")
    val totalSum = names.indices.map(i => s"raw$i").mkString(" + ")
    val out = names.zipWithIndex.map { case (n, i) =>
      s"""ROUND(raw$i / (CASE WHEN total = 0.0 THEN 1.0 ELSE total END) * 100.0, 6) + 0.0 AS "$n""""
    }.mkString(", ")
    s""", apfu12g AS (SELECT id, $apfuSelectSql FROM ox),
      g1 AS (SELECT *, $rawSel FROM apfu12g),
      g2 AS (SELECT *, $totalSum AS total FROM g1)
      SELECT id, $out FROM g2 ORDER BY id"""
  }

  /** p15 oracle: Cipw.cipwHbRow with normsum=true (reference
    * _cipwhb_norm_row, _calc.py:1516-1735 + _cipwhb_final:1479-1513).
    * The final recomputes En/Fs/Fo/Fa/MgDi/FeDi from Hy/Ol/Di — all 0 in
    * CIPWhb — so those and their composites are literal zeros here
    * ("structural fidelity to GCDkit's CIPWhb.r", _calc.py:1482-1485). */
  private def cipwHbSql: String = {
    def nm(c: String) = Cipw.normMw(c)
    // CIPWHB_RESULT_NAMES order minus excluded composites
    def tot(p: String) = Seq("q", "c", "or", "ab", "an", "lc", "ne", "kp",
      "nc", "ac", "ns", "ks", "mgdi", "fedi", "wo", "en", "fs", "fo", "fa",
      "dcs", "mt", "il", "hm", "tn", "pf", "ru", "ap", "fr", "py", "cc",
      "mgsp", "fesp", "mgbi", "febi", "mgact", "feact", "mged", "feed", "ri")
      .map(p + _).mkString(" + ")
    val outNames = Seq(
      "Q" -> "n_q", "C" -> "n_c", "Or" -> "n_or", "Ab" -> "n_ab",
      "An" -> "n_an", "Lc" -> "n_lc", "Ne" -> "n_ne", "Kp" -> "n_kp",
      "Nc" -> "n_nc", "Ac" -> "n_ac", "Ns" -> "n_ns", "Ks" -> "n_ks",
      "Di" -> "n_di", "MgDi" -> "n_mgdi", "FeDi" -> "n_fedi",
      "Wo" -> "n_wo", "Hy" -> "n_hy", "En" -> "n_en", "Fs" -> "n_fs",
      "Ol" -> "n_ol", "Fo" -> "n_fo", "Fa" -> "n_fa", "Dcs" -> "n_dcs",
      "Mt" -> "n_mt", "Il" -> "n_il", "Hm" -> "n_hm", "Tn" -> "n_tn",
      "Pf" -> "n_pf", "Ru" -> "n_ru", "Ap" -> "n_ap", "Fr" -> "n_fr",
      "Py" -> "n_py", "Cc" -> "n_cc", "Sp" -> "n_sp", "MgSp" -> "n_mgsp",
      "FeSp" -> "n_fesp", "Bi" -> "n_bi", "MgBi" -> "n_mgbi",
      "FeBi" -> "n_febi", "Hbl" -> "n_hbl", "Act" -> "n_act",
      "MgAct" -> "n_mgact", "FeAct" -> "n_feact", "Ed" -> "n_ed",
      "MgEd" -> "n_mged", "FeEd" -> "n_feed", "Ri" -> "n_ri")
    val sel = outNames.map { case (n0, v) => s"""ROUND($v, 6) AS "$n0"""" }
      .mkString(", ")
    s"""$cipwCommonCtes,
      h11 AS (SELECT *, CASE WHEN fe3 <= fe2c/3
          THEN (CASE WHEN na1 <= fe3 THEN na1 ELSE fe3 END)
          ELSE (CASE WHEN na1 <= fe2c/3 THEN na1 ELSE fe2c/3 END) END AS ri
        FROM k10),
      h12 AS (SELECT *,
        CASE WHEN (fe3 <= fe2c/3 AND na1 <= fe3)
          OR (fe3 > fe2c/3 AND na1 <= fe2c/3) THEN 0.0 ELSE na1 - ri END AS na2,
        CASE WHEN fe3 <= fe2c/3 AND na1 > fe3 THEN 0.0 ELSE fe3 - ri END AS fe3r,
        CASE WHEN fe3 > fe2c/3 AND na1 > fe2c/3 THEN 0.0 ELSE fe2c - 3*ri END AS fe2r,
        si2 - 8*ri AS si3 FROM h11),
      h13 AS (SELECT *, na2 AS nsv, si3 - na2 AS si4 FROM h12),
      h14 AS (SELECT *, CASE WHEN fe3r >= fe2r THEN fe2r ELSE fe3r END AS mt FROM h13),
      h15 AS (SELECT *,
        CASE WHEN fe3r >= fe2r THEN fe3r - mt ELSE 0.0 END AS hm,
        CASE WHEN fe3r >= fe2r THEN 0.0 ELSE fe2r - mt END AS fe2s FROM h14),
      h16 AS (SELECT *, fe2s / (fe2s + mg) AS fer, mg / (fe2s + mg) AS mgr,
        fe2s + mg AS femg0 FROM h15),
      h17 AS (SELECT *, CASE WHEN al2 >= ca3 THEN ca3 ELSE al2 END AS an FROM h16),
      h18 AS (SELECT *,
        CASE WHEN al2 >= ca3 THEN al2 - an ELSE 0.0 END AS cv,
        CASE WHEN al2 >= ca3 THEN 0.0 ELSE ca3 - an END AS ca4,
        si4 - 2*an AS si5 FROM h17),
      h19 AS (SELECT *,
        CASE WHEN femg0 <= 6*orr THEN 1.0/6*mgr*femg0 ELSE mgr*orr END AS mgbi,
        CASE WHEN femg0 <= 6*orr THEN 1.0/6*fer*femg0 ELSE fer*orr END AS febi
        FROM h18),
      h20 AS (SELECT *,
        CASE WHEN femg0 <= 6*orr THEN orr - mgbi - febi ELSE 0.0 END AS or1,
        CASE WHEN femg0 <= 6*orr THEN 0.0 ELSE femg0 - 6*(febi + mgbi) END AS femg1
        FROM h19),
      h21 AS (SELECT *,
        CASE WHEN femg1 <= 5.0/2*ca4 THEN 1.0/5*mgr*femg1 ELSE 0.5*mgr*ca4 END AS mgact,
        CASE WHEN femg1 <= 5.0/2*ca4 THEN 1.0/5*fer*femg1 ELSE 0.5*fer*ca4 END AS feact
        FROM h20),
      h22 AS (SELECT *,
        CASE WHEN femg1 <= 5.0/2*ca4 THEN ca4 - 2*(mgact + feact) ELSE 0.0 END AS ca5,
        CASE WHEN femg1 <= 5.0/2*ca4 THEN 0.0 ELSE femg1 - 5*(feact + mgact) END AS femg2
        FROM h21),
      h23 AS (SELECT *,
        CASE WHEN femg1 <= 5.0/2*ca4 THEN ca5 ELSE 0.0 END AS wo,
        CASE WHEN femg1 <= 5.0/2*ca4 THEN 0.0 ELSE mgr*femg2 END AS en0,
        CASE WHEN femg1 <= 5.0/2*ca4 THEN 0.0 ELSE fer*femg2 END AS fs0 FROM h22),
      h24 AS (SELECT *, CASE WHEN femg1 <= 5.0/2*ca4
          THEN si5 - 8*(feact + mgact) - wo
          ELSE si5 - 8*(mgact + feact) - en0 - fs0 END AS si6 FROM h23),
      h25 AS (SELECT *, CASE WHEN si6 >= 0 THEN si6 ELSE 0.0 END AS q,
        si6 >= 0 AS dn0, ABS(si6) AS d0 FROM h24),
      h26 AS (SELECT *,
        (mgact + feact) >= 2*ab0 AS conde,
        (mgact + feact) >= 2*ab0 AND ab0 >= d0/8 AS eb1,
        NOT ((mgact + feact) >= 2*ab0) AND (mgact + feact) >= d0/4 AS eb3
        FROM h25),
      h27 AS (SELECT *,
        CASE WHEN dn0 THEN 0.0 WHEN eb1 OR eb3 THEN mgr*d0/8
          WHEN conde THEN mgr*ab0 ELSE 0.5*mgact END AS mged,
        CASE WHEN dn0 THEN 0.0 WHEN eb1 OR eb3 THEN fer*d0/8
          WHEN conde THEN fer*ab0 ELSE 0.5*feact END AS feed FROM h26),
      h28 AS (SELECT *,
        CASE WHEN dn0 THEN mgact WHEN NOT conde AND NOT eb3 THEN 0.0
          ELSE mgact - 2*mged END AS mgact1,
        CASE WHEN dn0 THEN feact WHEN NOT conde AND NOT eb3 THEN 0.0
          ELSE feact - 2*feed END AS feact1,
        CASE WHEN dn0 THEN ab0 WHEN conde AND NOT eb1 THEN 0.0
          ELSE ab0 - (mged + feed) END AS ab1,
        d0 - 8*(mged + feed) AS d1, dn0 OR eb1 OR eb3 AS dn1 FROM h27),
      h29 AS (SELECT *,
        CASE WHEN dn1 THEN 0.0 WHEN d1 <= 0.5*(en0 + fs0) THEN mgr*d1
          ELSE 0.5*en0 END AS fo,
        CASE WHEN dn1 THEN 0.0 WHEN d1 <= 0.5*(en0 + fs0) THEN fer*d1
          ELSE 0.5*fs0 END AS fa,
        d1 - 0.5*(en0 + fs0) AS d2,
        dn1 OR d1 <= 0.5*(en0 + fs0) AS dn2 FROM h28),
      h30 AS (SELECT *,
        (fo + fa) <= 0.5*cv AS conds,
        (fo + fa) <= 0.5*cv AND (fo + fa) >= d2 AS sb1,
        NOT ((fo + fa) <= 0.5*cv) AND cv >= 2*d2 AS sb3 FROM h29),
      h31 AS (SELECT *,
        CASE WHEN dn2 THEN 0.0 WHEN sb1 OR sb3 THEN 2*mgr*d2
          WHEN conds THEN 2*fo ELSE 2*mgr*cv END AS mgsp,
        CASE WHEN dn2 THEN 0.0 WHEN sb1 OR sb3 THEN 2*fer*d2
          WHEN conds THEN 2*fa ELSE 2*fer*cv END AS fesp FROM h30),
      h32 AS (SELECT *,
        CASE WHEN dn2 THEN cv WHEN sb1 OR sb3 THEN cv - 2*d2
          WHEN conds THEN cv - 2*(fo + fa) ELSE 0.0 END AS c1,
        CASE WHEN conds THEN d2 - (fo + fa) ELSE d2 - 0.5*cv END AS d3,
        dn2 OR sb1 OR sb3 AS dn3 FROM h31),
      h33 AS (SELECT *,
        CASE WHEN dn3 THEN 0.0 WHEN d3 <= 4*ab1 THEN d3/4 ELSE ab1 END AS ne,
        CASE WHEN dn3 THEN ab1 WHEN d3 <= 4*ab1 THEN ab1 - d3/4 ELSE 0.0 END AS ab2
        FROM h32),
      h34 AS (SELECT *,
        q * ${nm("Q")} AS w_q, c1 * ${nm("C")} AS w_c,
        or1 * ${nm("Or")} AS w_or, ab2 * ${nm("Ab")} AS w_ab,
        an * ${nm("An")} AS w_an, 0.0::DOUBLE AS w_lc,
        ne * ${nm("Ne")} AS w_ne, 0.0::DOUBLE AS w_kp,
        0.0::DOUBLE AS w_nc, 0.0::DOUBLE AS w_ac,
        nsv * ${nm("Ns")} AS w_ns, ks * ${nm("Ks")} AS w_ks,
        0.0::DOUBLE AS w_mgdi, 0.0::DOUBLE AS w_fedi,
        wo * ${nm("Wo")} AS w_wo,
        0.0::DOUBLE AS w_en, 0.0::DOUBLE AS w_fs,
        0.0::DOUBLE AS w_fo, 0.0::DOUBLE AS w_fa,
        0.0::DOUBLE AS w_dcs,
        mt * ${nm("Mt")} AS w_mt, il * ${nm("Il")} AS w_il,
        hm * ${nm("Hm")} AS w_hm, 0.0::DOUBLE AS w_tn,
        0.0::DOUBLE AS w_pf, 0.0::DOUBLE AS w_ru,
        ap * ${nm("Ap")} AS w_ap, fr * ${nm("Fr")} AS w_fr,
        py * ${nm("Py")} AS w_py, cc * ${nm("Cc")} AS w_cc,
        mgsp * ${nm("MgSp")} AS w_mgsp, fesp * ${nm("FeSp")} AS w_fesp,
        mgbi * ${nm("MgBi")} AS w_mgbi, febi * ${nm("FeBi")} AS w_febi,
        mgact1 * ${nm("MgAct")} AS w_mgact, feact1 * ${nm("FeAct")} AS w_feact,
        mged * ${nm("MgEd")} AS w_mged, feed * ${nm("FeEd")} AS w_feed,
        ri * ${nm("Ri")} AS w_ri FROM h33),
      h35 AS (SELECT *, 0.0::DOUBLE AS w_di, 0.0::DOUBLE AS w_hy,
        0.0::DOUBLE AS w_ol, w_mgsp + w_fesp AS w_sp,
        w_mgbi + w_febi AS w_bi, w_mgact + w_feact AS w_act,
        w_mged + w_feed AS w_ed FROM h34),
      h36 AS (SELECT *, w_act + w_ed + w_ri AS w_hbl FROM h35),
      h37 AS (SELECT *, ${tot("w_")} AS total FROM h36),
      h38 AS (SELECT *,
        w_q*100/total AS n_q, w_c*100/total AS n_c, w_or*100/total AS n_or,
        w_ab*100/total AS n_ab, w_an*100/total AS n_an, w_lc*100/total AS n_lc,
        w_ne*100/total AS n_ne, w_kp*100/total AS n_kp, w_nc*100/total AS n_nc,
        w_ac*100/total AS n_ac, w_ns*100/total AS n_ns, w_ks*100/total AS n_ks,
        w_di*100/total AS n_di, w_mgdi*100/total AS n_mgdi,
        w_fedi*100/total AS n_fedi, w_wo*100/total AS n_wo,
        w_hy*100/total AS n_hy, w_en*100/total AS n_en, w_fs*100/total AS n_fs,
        w_ol*100/total AS n_ol, w_fo*100/total AS n_fo, w_fa*100/total AS n_fa,
        w_dcs*100/total AS n_dcs, w_mt*100/total AS n_mt, w_il*100/total AS n_il,
        w_hm*100/total AS n_hm, w_tn*100/total AS n_tn, w_pf*100/total AS n_pf,
        w_ru*100/total AS n_ru, w_ap*100/total AS n_ap, w_fr*100/total AS n_fr,
        w_py*100/total AS n_py, w_cc*100/total AS n_cc, w_sp*100/total AS n_sp,
        w_mgsp*100/total AS n_mgsp, w_fesp*100/total AS n_fesp,
        w_bi*100/total AS n_bi, w_mgbi*100/total AS n_mgbi,
        w_febi*100/total AS n_febi, w_hbl*100/total AS n_hbl,
        w_act*100/total AS n_act, w_mgact*100/total AS n_mgact,
        w_feact*100/total AS n_feact, w_ed*100/total AS n_ed,
        w_mged*100/total AS n_mged, w_feed*100/total AS n_feed,
        w_ri*100/total AS n_ri FROM h37)
      SELECT id, $sel, ROUND(${tot("n_")}, 6) AS "Total"
      FROM h38 ORDER BY id"""
  }
}
