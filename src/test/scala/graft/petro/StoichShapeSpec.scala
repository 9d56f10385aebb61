package graft.petro

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** check_stoichiometry multi-row shape matrix — parity with reference
  * tests/test_stoichiometry.py:193-235 (TestCheckStoichiometryMinerals
  * multi-row cases) on the exact conftest.py fixture compositions.
  * The (rows, criteria-columns) shape is asserted per mineral: which
  * criteria a spec emits is itself part of the contract (Fe-split
  * minerals add fe3+_validity, T-site minerals add tetrahedral_fill,
  * no-ideal-cations specs omit cation_deviation). */
class StoichShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def frame(cols: Seq[String], rows: Seq[Seq[Double]]): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*)), 1), schema)
  }

  def shape(spec: MineralSpec, df: DataFrame): (Long, Int) = {
    val r = Stoich.checkStoichiometry(spec, df)
    (r.count(), r.columns.length)
  }

  // conftest.py multi-row fixtures, transcribed column-for-column
  lazy val amphiboleMulti = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "K2O", "MnO", "Cr2O3"),
    Seq(Seq(43.0, 1.5, 11.0, 12.0, 13.0, 11.5, 1.5, 0.8, 0.2, 0.1),
      Seq(54.0, 0.2, 2.5, 8.0, 20.0, 12.0, 0.5, 0.1, 0.1, 0.0),
      Seq(56.0, 0.1, 9.0, 10.0, 14.0, 2.0, 6.5, 0.1, 0.1, 0.0)))
  lazy val clinopyroxeneMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "TiO2"),
    Seq(Seq(52.00, 4.50, 8.50, 15.00, 18.00, 1.50, 0.50),
      Seq(48.50, 8.00, 12.00, 10.00, 20.00, 0.50, 1.00),
      Seq(54.00, 2.00, 5.00, 18.00, 15.00, 3.00, 0.20)))
  lazy val feldsparMulti = frame(
    Seq("SiO2", "Al2O3", "CaO", "Na2O", "K2O"),
    Seq(Seq(64.76, 18.31, 0.00, 1.50, 16.89),
      Seq(52.00, 30.00, 13.00, 3.50, 0.50),
      Seq(68.00, 19.50, 0.50, 11.00, 0.80)))
  lazy val orthopyroxeneMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "TiO2"),
    Seq(Seq(50.00, 3.00, 15.00, 30.00, 1.50, 0.50),
      Seq(48.00, 5.00, 25.00, 18.00, 3.00, 1.00),
      Seq(52.00, 1.50, 8.00, 35.00, 1.00, 0.20)))
  lazy val muscoviteMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "TiO2", "Na2O", "K2O", "BaO"),
    Seq(Seq(45.00, 35.00, 3.00, 1.00, 0.50, 0.50, 10.00, 0.10),
      Seq(42.00, 30.00, 8.00, 3.00, 1.50, 0.30, 9.50, 0.20),
      Seq(48.00, 38.00, 1.50, 0.50, 0.30, 0.80, 11.00, 0.05)))
  lazy val biotiteMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "K2O", "TiO2", "MnO", "Na2O", "BaO"),
    Seq(Seq(43.00, 12.50, 3.00, 28.00, 10.50, 1.00, 0.10, 0.10, 0.00),
      Seq(36.00, 14.00, 28.00, 5.00, 9.80, 3.50, 0.50, 0.05, 0.00),
      Seq(36.50, 17.50, 5.00, 18.00, 10.20, 1.00, 0.10, 0.10, 0.00)))
  lazy val chloriteMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "Cr2O3", "TiO2"),
    Seq(Seq(26.0, 21.0, 8.0, 30.0, 0.1, 0.1),
      Seq(24.0, 22.0, 28.0, 10.0, 0.2, 0.3),
      Seq(30.0, 28.0, 5.0, 20.0, 0.0, 0.1)))
  lazy val epidoteMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "CaO", "MnO", "TiO2"),
    Seq(Seq(37.5, 23.0, 12.5, 22.5, 0.2, 0.1),
      Seq(38.5, 30.0, 2.0, 23.5, 0.1, 0.1),
      Seq(36.0, 20.0, 8.0, 21.0, 12.0, 0.3)))
  lazy val titaniteMulti = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "CaO", "MnO", "MgO", "SnO2", "Nb2O5"),
    Seq(Seq(30.48, 40.83, 0.00, 0.00, 28.69, 0.00, 0.00, 0.00, 0.00),
      Seq(29.50, 35.00, 6.00, 0.50, 28.00, 0.10, 0.05, 0.00, 0.00),
      Seq(30.00, 36.00, 1.50, 4.00, 28.50, 0.20, 0.10, 0.00, 0.00)))
  lazy val chloritoidMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO", "TiO2"),
    Seq(Seq(24.5, 39.5, 22.0, 5.0, 3.0, 0.3),
      Seq(25.0, 40.0, 8.0, 18.0, 1.0, 0.5),
      Seq(23.0, 38.0, 18.0, 3.0, 14.0, 0.2)))
  lazy val cordieriteMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO", "Na2O", "K2O", "CaO"),
    Seq(Seq(48.0, 32.5, 5.0, 10.5, 0.3, 0.5, 0.1, 0.1),
      Seq(47.0, 31.0, 14.0, 3.0, 0.5, 0.3, 0.1, 0.1),
      Seq(46.0, 30.0, 6.0, 8.0, 7.0, 0.4, 0.2, 0.1)))
  lazy val ilmeniteMulti = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "MgO", "MnO", "Cr2O3"),
    Seq(Seq(0.00, 52.66, 0.00, 47.34, 0.00, 0.00, 0.00),
      Seq(0.00, 50.00, 0.00, 35.00, 14.00, 0.50, 0.00),
      Seq(0.00, 51.00, 0.00, 38.00, 0.50, 10.00, 0.00)))
  lazy val spinelMulti = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "Fe2O3", "Cr2O3", "MgO", "MnO", "ZnO"),
    Seq(Seq(0.00, 0.20, 55.00, 10.00, 3.00, 5.00, 25.00, 0.30, 0.50),
      Seq(0.00, 0.50, 30.00, 25.00, 5.00, 3.00, 5.00, 0.20, 0.30),
      Seq(0.00, 0.30, 15.00, 15.00, 8.00, 45.00, 10.00, 0.10, 0.10)))
  lazy val stauroliteMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "ZnO", "MnO", "TiO2"),
    Seq(Seq(28.0, 53.0, 13.0, 2.5, 1.5, 0.3, 0.7),
      Seq(29.0, 55.0, 5.0, 8.0, 0.2, 0.5, 0.3),
      Seq(27.5, 51.0, 10.0, 2.0, 7.0, 1.0, 0.5)))
  lazy val feGarnetMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "Cr2O3", "CaO", "MgO", "MnO"),
    Seq(Seq(36.00, 0.00, 27.90, 0.00, 33.00, 0.00, 0.00),
      Seq(38.00, 20.00, 20.00, 0.00, 3.00, 12.00, 2.00),
      Seq(37.00, 5.00, 8.00, 10.00, 28.00, 7.00, 0.50)))

  test("amphibole_multi -> (3, 7) (test_stoichiometry.py:193-195)") {
    assert(shape(Minerals.Amp, amphiboleMulti) == ((3L, 7)))
  }
  test("clinopyroxene_multi -> (3, 7) (test_stoichiometry.py:197-199)") {
    assert(shape(Minerals.Cpx, clinopyroxeneMulti) == ((3L, 7)))
  }
  test("feldspar_multi -> (3, 6) (test_stoichiometry.py:201-203)") {
    assert(shape(Minerals.Fsp, feldsparMulti) == ((3L, 6)))
  }
  test("biotite_multi -> (3, 6) (test_stoichiometry.py:205-207)") {
    assert(shape(Minerals.Bt, biotiteMulti) == ((3L, 6)))
  }
  test("chlorite_multi -> (3, 5) (test_stoichiometry.py:209-211)") {
    assert(shape(Minerals.Chl, chloriteMulti) == ((3L, 5)))
  }
  test("epidote_multi -> (3, 7) (test_stoichiometry.py:213-215)") {
    assert(shape(Minerals.Ep, epidoteMulti) == ((3L, 7)))
  }
  test("titanite_multi -> (3, 7) (test_stoichiometry.py:217-219)") {
    assert(shape(Minerals.Ttn, titaniteMulti) == ((3L, 7)))
  }
  test("chloritoid_multi -> (3, 7) (test_stoichiometry.py:221-223)") {
    assert(shape(Minerals.Cld, chloritoidMulti) == ((3L, 7)))
  }
  test("cordierite_multi -> (3, 6) (test_stoichiometry.py:225-227)") {
    assert(shape(Minerals.Crd, cordieriteMulti) == ((3L, 6)))
  }
  test("ilmenite_multi -> (3, 6) (test_stoichiometry.py:229-231)") {
    assert(shape(Minerals.Ilm, ilmeniteMulti) == ((3L, 6)))
  }
  test("spinel_multi -> (3, 7) (test_stoichiometry.py:233-235)") {
    assert(shape(Minerals.Spl, spinelMulti) == ((3L, 7)))
  }
  test("muscovite_multi: 3 rows with tetrahedral_fill (test_stoichiometry.py:168-171)") {
    val r = Stoich.checkStoichiometry(Minerals.Ms, muscoviteMulti)
    assert(r.count() == 3 && r.columns.contains("tetrahedral_fill"))
  }
  test("orthopyroxene_multi: 3 rows with tetrahedral_fill (test_stoichiometry.py:173-176)") {
    val r = Stoich.checkStoichiometry(Minerals.Opx, orthopyroxeneMulti)
    assert(r.count() == 3 && r.columns.contains("tetrahedral_fill"))
  }
  test("staurolite_multi: 3 rows with tetrahedral_fill, no cation_deviation") {
    val r = Stoich.checkStoichiometry(Minerals.St, stauroliteMulti)
    assert(r.count() == 3)
    assert(r.columns.contains("tetrahedral_fill"))
    assert(!r.columns.contains("cation_deviation"))
  }

  test("fe_garnet_multi: every score in [0, 1] (test_stoichiometry.py:113-117)") {
    val r = Stoich.checkStoichiometry(Minerals.Grt, feGarnetMulti)
    r.collect().foreach { row =>
      r.columns.zipWithIndex.foreach { case (c, i) =>
        if (!row.isNullAt(i)) {
          val v = row.getDouble(i)
          assert(v >= -1e-12 && v <= 1.0 + 1e-12, s"$c = $v")
        }
      }
    }
  }

  test("fe3+_validity is 1.0 when the split is non-negative (test_stoichiometry.py:109-111)") {
    val fePyroxene = frame(
      Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "TiO2"),
      Seq(Seq(52.00, 4.50, 8.50, 15.00, 18.00, 1.50, 0.50)))
    val m = Stoich.checkStoichiometry(Minerals.Cpx, fePyroxene).collect()(0)
    val r = Stoich.checkStoichiometry(Minerals.Cpx, fePyroxene)
    val idx = r.columns.indexOf("fe3+_validity")
    assert(m.getDouble(idx) == 1.0)
  }

  test("trapezoid custom margin (test_stoichiometry.py:52-54)") {
    import org.apache.spark.sql.functions._
    val df = frame(Seq("v"), Seq(Seq(98.0)))
    val got = df.select(
      Stoich.trapezoid(col("v"), 99.0, 101.0, margin = 1.0).as("m1"),
      Stoich.trapezoid(col("v"), 99.0, 101.0, margin = 2.0).as("m2"))
      .collect()(0)
    assert(got.getDouble(0) == 0.0)
    assert(math.abs(got.getDouble(1) - 0.5) < 1e-10)
  }

  test("garnet analytical_total is 1.0 inside (99, 101) (test_stoichiometry.py:94-99)") {
    val garnetMulti = frame(
      Seq("SiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO"),
      Seq(Seq(36.50, 20.50, 25.00, 15.00, 1.50, 1.00), // total 99.5 -> in range
        Seq(38.20, 22.10, 18.50, 2.00, 12.00, 3.00),
        Seq(35.80, 21.00, 28.00, 8.00, 6.00, 1.50)))
    val r = Stoich.checkStoichiometry(Minerals.Grt, garnetMulti)
    val idx = r.columns.indexOf("analytical_total")
    val totals = Seq(99.5, 95.8, 100.3)
    r.collect().zip(totals).foreach { case (row, total) =>
      if (total >= 99.0 && total <= 101.0)
        assert(row.getDouble(idx) == 1.0, s"total $total should score 1.0")
    }
  }
}
