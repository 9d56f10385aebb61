package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.chem.Chem
import graft.petro.{Cipw, Convert, Minerals, Stoich, Thermo, Units}

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
  /** SELECT list producing the split apfu columns (order preserved). */
  private val splitSelectSql: String = ionCols.flatMap { c =>
    if (c == "Fe{2+}") Seq(s"""$feLowSql AS "Fe{2+}"""", s"""$feHighSql AS "Fe{3+}"""")
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

    // C2: GCDkit CIPW norm (Dataset.map row function; rows-only check)
    "p14_cipw_gcdkit" -> ((s, dir) => {
      Cipw.cipwNorm(oxWithFe2O3(s, dir), carry = Seq("id"),
          normsum = true, completeResults = true)
        .orderBy("id")
    }),

    // C3: CIPWhb norm (hornblende/biotite recasting; rows-only check)
    "p15_cipw_hb" -> ((s, dir) => {
      Cipw.cipwNormHb(oxWithFe2O3(s, dir), carry = Seq("id"),
          normsum = true, completeResults = true)
        .orderBy("id")
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
    })
  )

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
      s"ROUND(CASE WHEN ($totalSql) = 0.0 THEN 'NaN'::DOUBLE ELSE ${qi(c)} / ($totalSql) * 100.0 END, 6) AS ${qi(c)}"
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
           FROM pr3 ORDER BY id""")
    )
  }

  // ---- thermo prep SQL mirror (MnNCKFMASHTO over ox+Fe2O3) -----------------

  private def san(c: String): String = c.toLowerCase.replaceAll("[^a-z0-9]", "")
  private def tcSysCols = Seq("H2O", "SiO2", "Al2O3", "CaO", "MgO", "FeO",
    "K2O", "Na2O", "TiO2", "MnO", "O")

  private def tcPrepCtes: String = {
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
    val target = 100.0 - 0.01 * 1.0
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
      pr3 AS (SELECT id, $scaledSel, CAST(0.01 AS DOUBLE) AS pr_o FROM pr2)"""
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
    val sel = polys.map { case (n, sql) => s"""ROUND(($sql) * 100.0, 6) AS "$n"""" }
      .mkString(", ")
    s""", apfu AS (SELECT id, $apfuSelectSql FROM ox),
      spl AS (SELECT id, $splitSelectSql FROM apfu),
      sfr AS ($sf), vars AS ($vars)
      SELECT id, $sel FROM vars ORDER BY id"""
  }

  /** SQL mirror of the greedy site-allocation cascade over a frame of
    * ion columns: one CTE per (site, ion) step, updating the shared pool
    * and the site remainder exactly like Minerals.siteAllocationExprs.
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
      s"""ROUND($t / $safe * 100.0, 6) AS "${names(ion)}""""
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
}
