package graft.petro

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Parity with reference tests/test_stoichiometry.py. */
class StoichSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def frame(cols: Seq[String], rows: Seq[Seq[Double]]): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*)), 1), schema)
  }

  def collectMaps(df: DataFrame): Seq[Map[String, Double]] =
    df.collect().toSeq.map { r =>
      df.columns.zipWithIndex.map { case (c, i) =>
        c -> (if (r.isNullAt(i)) Double.NaN else r.getDouble(i))
      }.toMap
    }

  // conftest garnet_multi (:112) rows 0-2
  lazy val garnetMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO"),
    Seq(Seq(36.50, 20.50, 25.00, 15.00, 1.50, 1.00),
      Seq(38.20, 22.10, 18.50, 2.00, 12.00, 3.00),
      Seq(35.80, 21.00, 28.00, 8.00, 6.00, 1.50)))
  lazy val diopside = frame(Seq("SiO2", "MgO", "CaO"), Seq(Seq(55.49, 18.61, 25.90)))
  lazy val sanidine = frame(Seq("SiO2", "Al2O3", "K2O"), Seq(Seq(64.76, 18.31, 16.89)))
  lazy val fePyroxene = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "TiO2"),
    Seq(Seq(52.00, 4.50, 8.50, 15.00, 18.00, 1.50, 0.50)))
  lazy val staurolite = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "ZnO", "MnO"),
    Seq(Seq(27.5, 54.0, 13.0, 1.8, 0.5, 0.3)))

  test("trapezoid golden values (test_stoichiometry.py:32-56)") {
    import org.apache.spark.sql.functions._
    val vals = Seq(100.0, 99.0, 101.0, 97.5, 102.5, 95.0, 98.25, 101.75)
    val df = frame(Seq("v"), vals.map(Seq(_)))
    val got = df.select(Stoich.trapezoid(col("v"), 99.0, 101.0).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got(0) == 1.0 && got(1) == 1.0 && got(2) == 1.0)
    assert(got(3) == 0.0 && got(4) == 0.0 && got(5) == 0.0)
    assert(math.abs(got(6) - 0.5) < 1e-10 && math.abs(got(7) - 0.5) < 1e-10)
  }

  test("garnet shape: 6 criteria, no tetrahedral (test_stoichiometry.py:64-87)") {
    val r = Stoich.checkStoichiometry(Minerals.Grt, garnetMulti)
    assert(r.columns.toSet == Set("analytical_total", "cation_deviation",
      "charge_balance", "fe3+_validity", "site_vacancies", "leftover_cations"))
    assert(r.count() == 3)
  }

  test("cpx has fe3 column; fsp on sanidine does not (test_stoichiometry.py:70-80)") {
    assert(Stoich.checkStoichiometry(Minerals.Cpx, fePyroxene)
      .columns.contains("fe3+_validity"))
    assert(!Stoich.checkStoichiometry(Minerals.Fsp, sanidine)
      .columns.contains("fe3+_validity"))
    assert(Stoich.checkStoichiometry(Minerals.Fsp, sanidine)
      .columns.contains("tetrahedral_fill"))
  }

  test("staurolite: no cation_deviation (test_stoichiometry.py:81-83)") {
    assert(!Stoich.checkStoichiometry(Minerals.St, staurolite)
      .columns.contains("cation_deviation"))
  }

  test("diopside scores high (test_stoichiometry.py:101-109)") {
    val m = collectMaps(Stoich.checkStoichiometry(Minerals.Cpx, diopside)).head
    assert(m("cation_deviation") > 0.9)
    assert(m("charge_balance") > 0.8)
  }

  test("all scores in [0,1] (test_stoichiometry.py:116-120)") {
    for (df <- Seq(garnetMulti, fePyroxene, diopside)) {
      val spec = if (df == fePyroxene || df == diopside) Minerals.Cpx else Minerals.Grt
      collectMaps(Stoich.checkStoichiometry(spec, df)).foreach { m =>
        m.foreach { case (k, v) =>
          assert(v >= -1e-12 && v <= 1.0 + 1e-12, s"$k = $v")
        }
      }
    }
  }

  // conftest fixture compositions for the per-mineral sweep
  lazy val amphibole = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "K2O", "MnO", "Cr2O3"),
    Seq(Seq(43.0, 1.5, 11.0, 12.0, 13.0, 11.5, 1.5, 0.8, 0.2, 0.1)))
  lazy val biotite = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "K2O", "TiO2", "MnO", "Na2O", "BaO"),
    Seq(Seq(42.70, 11.70, 0.50, 29.10, 10.70, 0.20, 0.05, 0.10, 0.00)))
  lazy val chlorite = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "Cr2O3", "TiO2"),
    Seq(Seq(26.0, 21.0, 20.0, 18.0, 0.1, 0.1)))
  lazy val chloritoid = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO", "TiO2"),
    Seq(Seq(24.5, 39.5, 22.0, 5.0, 3.0, 0.3)))
  lazy val cordierite = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO", "Na2O", "K2O", "CaO"),
    Seq(Seq(48.0, 32.5, 5.0, 10.5, 0.3, 0.5, 0.1, 0.1)))
  lazy val epidote = frame(
    Seq("SiO2", "Al2O3", "FeO", "CaO", "MnO", "TiO2"),
    Seq(Seq(37.5, 23.0, 12.5, 22.5, 0.2, 0.1)))
  lazy val ilmenite = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "MgO", "MnO", "Cr2O3"),
    Seq(Seq(0.00, 52.66, 0.00, 47.34, 0.00, 0.00, 0.00)))
  lazy val spinelFix = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "Fe2O3", "Cr2O3", "MgO", "MnO", "ZnO"),
    Seq(Seq(0.00, 0.20, 55.00, 10.00, 3.00, 5.00, 25.00, 0.30, 0.50)))
  lazy val titanite = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "CaO", "MnO", "MgO"),
    Seq(Seq(30.48, 40.83, 0.00, 0.00, 28.69, 0.00, 0.00)))

  test("per-mineral column shapes (test_stoichiometry.py:129-241)") {
    def cols(spec: graft.petro.MineralSpec, df: DataFrame): Set[String] =
      Stoich.checkStoichiometry(spec, df).columns.toSet
    val amp = cols(Minerals.Amp, amphibole)
    assert(amp("analytical_total") && amp("cation_deviation"))
    val bt = cols(Minerals.Bt, biotite)
    assert(bt("analytical_total"))
    val chl = cols(Minerals.Chl, chlorite)
    assert(chl("analytical_total") && !chl("cation_deviation"))
    assert(cols(Minerals.Cld, chloritoid)("fe3+_validity"))
    assert(cols(Minerals.Crd, cordierite)("tetrahedral_fill"))
    // FeO -> Fe2O3 preprocess gives epidote and ilmenite an Fe{3+} column
    assert(cols(Minerals.Ep, epidote)("fe3+_validity"))
    assert(cols(Minerals.Ilm, ilmenite)("fe3+_validity"))
    assert(cols(Minerals.Ms, frame(Seq("SiO2", "Al2O3", "K2O", "FeO", "MgO", "Na2O"),
      Seq(Seq(46.0, 36.0, 10.5, 1.5, 0.8, 1.2))))("analytical_total"))
    assert(cols(Minerals.Spl, spinelFix)("analytical_total"))
    assert(cols(Minerals.Ttn, titanite)("analytical_total"))
    // every emitted score stays in [0, 1] across the sweep
    Seq(Minerals.Amp -> amphibole, Minerals.Bt -> biotite, Minerals.Chl -> chlorite,
      Minerals.Cld -> chloritoid, Minerals.Crd -> cordierite, Minerals.Ep -> epidote,
      Minerals.Ilm -> ilmenite, Minerals.Spl -> spinelFix, Minerals.Ttn -> titanite)
      .foreach { case (spec, df) =>
        collectMaps(Stoich.checkStoichiometry(spec, df)).foreach(_.foreach {
          case (c, v) => assert(v >= -1e-9 && v <= 1 + 1e-9, s"${spec.name}.$c = $v")
        })
      }
  }

  test("analytical total ranges per mineral (test_stoichiometry.py:243-263)") {
    assert(Minerals.Grt.totalRange == ((99.0, 101.0)))
    assert(Minerals.Chl.totalRange == ((85.0, 90.0)))
    assert(Minerals.Amp.totalRange == ((96.0, 99.0)))
    assert(Minerals.Spl.totalRange == ((93.0, 100.5)))
    assert(Minerals.Crd.totalRange == ((97.0, 99.0)))
    assert(Minerals.Ms.totalRange == ((94.0, 97.0)))
    assert(Minerals.Bt.totalRange == ((94.0, 97.0)))
  }
}
