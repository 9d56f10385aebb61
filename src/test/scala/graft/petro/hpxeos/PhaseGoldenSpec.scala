package graft.petro.hpxeos

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Per-phase numeric goldens captured by RUNNING the reference hpxeos
  * models on the input frames of tests/test_tc_minerals.py (default
  * order parameters). Negative proportions are legitimate in a-x models
  * (disordered end members); values pin the whole pipeline — APFU,
  * valence-split quirk, site fractions, polynomial evaluation. */
class PhaseGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def frame(cols: Seq[String], vals: Seq[Double]): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(vals: _*)), 1), schema)
  }

  def check(phase: Phase, df: DataFrame, expect: Map[String, Double]): Unit = {
    val r = phase.endMembers(df).collect()(0)
    val cols = phase.endMemberNames
    val got = cols.zipWithIndex.map { case (c, i) => c -> r.getDouble(i) }.toMap
    expect.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 5e-4, s"${phase.abbreviation}.$k: ${got(k)} vs reference $v")
    }
  }

  test("metapelite bi matches reference (test_tc_minerals BI_DF)") {
    check(Metapelite.TcBiotite,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "TiO2", "MnO", "K2O", "Na2O"),
        Seq(35.0, 18.0, 22.0, 10.0, 3.0, 0.3, 9.0, 0.3)),
      Map("phl" -> 26.9364, "annm" -> 55.241, "obi" -> -23.5724,
        "east" -> 23.7438, "tbi" -> 17.0128, "fbi" -> 0.0, "mmbi" -> 0.6385))
  }

  test("metapelite cd matches reference (CD_DF)") {
    check(Metapelite.TcCordierite,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO"),
        Seq(48.0, 34.0, 10.0, 8.0, 0.0)),
      Map("crd" -> 58.7806, "fcrd" -> 41.2194, "hcrd" -> 0.0, "mncd" -> 0.0))
  }

  test("metapelite chl matches reference (CHL_DF)") {
    check(Metapelite.TcChlorite,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO"),
        Seq(25.0, 22.0, 18.0, 18.0, 0.3)),
      Map("clin" -> -26.2473, "afchl" -> 33.7553, "ames" -> 72.0667,
        "daph" -> 25.7044, "ochl1" -> 10.0387, "ochl4" -> -15.8608,
        "f3clin" -> 0.0, "mmchl" -> 0.543))
  }

  test("metapelite ctd matches reference (CTD_DF)") {
    check(Metapelite.TcChloritoid,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO"),
        Seq(25.0, 40.0, 22.0, 5.0, 0.5)),
      Map("mctd" -> -171.9036, "fctd" -> 70.021, "mnct" -> 1.6117,
        "ctdo" -> 200.2709))
  }

  test("metapelite ep matches reference (EP_DF)") {
    check(Metapelite.TcEpidote,
      frame(Seq("SiO2", "Al2O3", "FeO", "CaO"),
        Seq(38.0, 25.0, 10.0, 23.0)),
      Map("cz" -> 66.789, "ep" -> 0.0, "fep" -> 33.211))
  }

  test("metapelite mu matches reference (MU_DF)") {
    check(Metapelite.TcMuscovite,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "K2O"),
        Seq(45.0, 35.0, 3.0, 1.0, 0.2, 1.0, 10.0)),
      Map("mu" -> 6.2283, "cel" -> 22.1302, "fcel" -> 37.2447,
        "pa" -> 13.0034, "mat" -> 1.4372, "fmu" -> 19.9562))
  }

  test("metapelite ma matches reference (MA_DF)") {
    check(Metapelite.TcMargarite,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "K2O"),
        Seq(30.0, 50.0, 2.0, 0.5, 12.0, 0.5, 0.1)),
      Map("mut" -> -41.958, "celt" -> 9.1342, "fcelt" -> 20.497,
        "pat" -> 6.9471, "ma" -> 92.1387, "fmu" -> 13.241))
  }

  test("metapelite sp matches reference (SP_DF)") {
    check(Metapelite.TcSpinel,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "Fe2O3", "TiO2"),
        Seq(0.5, 55.0, 35.0, 5.0, 3.0, 1.5)),
      Map("herc" -> 73.833, "sp" -> 19.7441, "mt" -> 3.1648, "usp" -> 3.2582))
  }

  test("metapelite st matches reference (ST_DF)") {
    check(Metapelite.TcStaurolite,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO", "TiO2"),
        Seq(28.0, 53.0, 13.0, 2.0, 0.3, 0.8)),
      Map("mstm" -> -148.6676, "fst" -> 77.0647, "mnstm" -> 1.8012,
        "msto" -> 158.13, "mstt" -> 11.6717))
  }

  test("metapelite opx matches reference (OPX_DF)") {
    check(Metapelite.TcOrthopyroxene,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "TiO2", "MnO"),
        Seq(50.0, 3.0, 20.0, 24.0, 1.0, 0.2, 0.5)),
      Map("en" -> 49.3036, "fs" -> 26.6485, "fm" -> 3.6714,
        "mgts" -> 1.2579, "fopx" -> 14.2947, "mnopx" -> 0.796, "odi" -> 4.0279))
  }

  test("metabasite aug matches reference (CPX_DF)") {
    check(Metabasite.TcAugite,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "TiO2"),
        Seq(50.0, 5.0, 8.0, 12.0, 20.0, 3.0, 0.5)),
      Map("di" -> 70.3794, "cenh" -> -2.2791, "cfs" -> 18.3046,
        "jdm" -> -3.3079, "acmm" -> 25.3251, "ocats" -> 0.0,
        "dcats" -> 10.7349, "fmc" -> -19.157))
  }

  // ---- Mn-free metabasite variants + remaining metapelite/igneous ----------

  lazy val garnetNoMn = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO"),
    Seq(38.5, 22.1, 28.3, 5.2, 3.8))
  lazy val biNoMn = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "TiO2", "K2O", "Na2O"),
    Seq(35.0, 18.0, 22.0, 10.0, 3.0, 9.0, 0.3))
  lazy val ilmMixed = frame(Seq("TiO2", "FeO", "Fe2O3", "MgO", "MnO"),
    Seq(50.0, 40.0, 4.0, 2.0, 2.0))

  test("metabasite g (Mn-free) matches reference") {
    check(Metabasite.TcGarnet, garnetNoMn,
      Map("py" -> 21.8421, "alm" -> 66.686, "gr" -> 11.472, "kho" -> 0.0))
  }

  test("metabasite bi (Mn-free) matches reference") {
    check(Metabasite.TcBiotite, biNoMn,
      Map("phl" -> 26.1727, "annm" -> 55.241, "obi" -> -22.939,
        "east" -> 24.4829, "tbi" -> 17.0424, "fbi" -> 0.0))
  }

  test("metabasite mu matches reference (mam member name)") {
    check(Metabasite.TcMuscovite,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "K2O"),
        Seq(45.0, 35.0, 3.0, 1.0, 0.2, 1.0, 10.0)),
      Map("mu" -> 6.2283, "cel" -> 22.1302, "fcel" -> 37.2447,
        "pa" -> 13.0034, "mam" -> 1.4372, "fmu" -> 19.9562))
  }

  test("metabasite chl (Mn-free) matches reference") {
    check(Metabasite.TcChlorite,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO"), Seq(25.0, 22.0, 18.0, 18.0)),
      Map("clin" -> -26.0895, "afchl" -> 33.7966, "ames" -> 72.5954,
        "daph" -> 26.0895, "ochl1" -> 9.8487, "ochl4" -> -16.2407,
        "f3clin" -> 0.0))
  }

  test("metabasite opx (Mn-free) matches reference") {
    check(Metabasite.TcOrthopyroxene,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "TiO2"),
        Seq(50.0, 3.0, 20.0, 24.0, 1.0, 0.2)),
      Map("en" -> 50.8261, "fs" -> 27.2167, "fm" -> 3.3534,
        "mgts" -> 1.7933, "fopx" -> 12.7719, "odi" -> 4.0386))
  }

  test("metabasite ilmm matches reference (geik, no pnt)") {
    check(Metabasite.TcIlmeniteMixed, ilmMixed,
      Map("oilm" -> 0.0, "dilm" -> 88.5813, "dhem" -> 3.8304, "geik" -> 7.5882))
  }

  test("metapelite ilm matches reference (measured Fe3+)") {
    check(Metapelite.TcIlmenite,
      frame(Seq("TiO2", "FeO", "Fe2O3"), Seq(52.0, 44.0, 4.0)),
      Map("oilm" -> 0.0, "dilm" -> 96.2234, "dhem" -> 3.7766))
  }

  test("metapelite ilmm matches reference (geik + pnt)") {
    check(Metapelite.TcIlmeniteMixed, ilmMixed,
      Map("oilm" -> 0.0, "dilm" -> 84.27, "dhem" -> 3.8304,
        "geik" -> 7.5882, "pnt" -> 4.3114))
  }

  test("metapelite sa matches reference at default Q") {
    check(Metapelite.TcSapphirine,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO"), Seq(13.0, 62.0, 8.0, 17.0)),
      Map("spr4" -> -27.5618, "spr5" -> 26.857, "fspm" -> -1.3943,
        "spro" -> 22.2802, "ospr" -> 79.8189))
  }

  test("igneous ol_H18 matches reference") {
    check(Igneous.TcOlivineH18,
      frame(Seq("SiO2", "FeO", "MgO", "CaO", "MnO"),
        Seq(39.0, 18.0, 42.0, 0.3, 0.2)),
      Map("mont" -> 0.8234, "fa" -> 19.3825, "fo" -> 79.9537, "cfm" -> -0.1596))
  }

  test("igneous bi_G25 matches reference (est member name)") {
    check(Igneous.TcBiotiteG25, biNoMn,
      Map("phl" -> 26.1727, "annm" -> 55.241, "obi" -> -22.939,
        "est" -> 24.4829, "tbi" -> 17.0424, "fbi" -> 0.0))
  }

  test("igneous cd_G25 matches reference") {
    check(Igneous.TcCordieriteG25,
      frame(Seq("SiO2", "Al2O3", "FeO", "MgO"), Seq(48.0, 34.0, 10.0, 8.0)),
      Map("crd" -> 58.7806, "fcrd" -> 41.2194, "hcrd" -> 0.0))
  }
}
