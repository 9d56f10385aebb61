package graft.petro

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Parity with reference tests/test_calc.py (the _calc.py unit
  * conversions and valence machinery) on the conftest fixtures — one
  * test per reference case or tight case group. */
class CalcParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def dbl(cols: String*)(rows: Seq[Double]*): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r.map(_.asInstanceOf[Any]): _*)), 1), schema)
  }
  def row0(df: DataFrame): Map[String, Double] = {
    val r = df.collect()(0)
    df.columns.zipWithIndex.collect {
      case (c, i) if df.schema(i).dataType == DoubleType && !r.isNullAt(i) =>
        c -> r.getDouble(i)
    }.toMap
  }

  lazy val diopside = dbl("SiO2", "MgO", "CaO")(Seq(55.49, 18.61, 25.90))
  lazy val sanidine = dbl("SiO2", "Al2O3", "K2O")(Seq(64.76, 18.31, 16.89))
  lazy val fePyroxene = dbl("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "TiO2")(
    Seq(52.00, 4.50, 8.50, 15.00, 18.00, 1.50, 0.50))
  lazy val mnGarnet = dbl("SiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO")(
    Seq(36.50, 20.50, 25.00, 15.00, 1.50, 1.00))
  lazy val tiRutile = dbl("SiO2", "Al2O3", "FeO", "MgO", "CaO", "TiO2", "Na2O")(
    Seq(40.00, 12.00, 10.00, 8.00, 10.00, 18.00, 2.00))

  test("to_moles diopside SiO2 (test_calc.py:27-36)") {
    val m = row0(Convert.toMoles(diopside))
    assert(math.abs(m("SiO2") - 0.9235) < 0.001)
    assert(Convert.toMoles(fePyroxene).columns.toSet == fePyroxene.columns.toSet)
  }

  test("to_oxides round trips to_moles exactly (test_calc.py:38-47)") {
    val back = row0(Convert.toOxides(Convert.toMoles(fePyroxene)))
    val orig = row0(fePyroxene)
    orig.foreach { case (k, v) => assert(math.abs(back(k) - v) < 1e-9, k) }
  }

  test("cation_moles / oxygen_moles diopside (test_calc.py:50-64)") {
    val cm = row0(Convert.cationMoles(diopside, Units.WtPct))
    assert(math.abs(cm("SiO2") - 0.9235) < 0.001)
    assert(math.abs(cm("CaO") - 0.4618) < 0.001)
    val om = row0(Convert.oxygenMoles(diopside, Units.WtPct))
    assert(math.abs(om("SiO2") - 1.847) < 0.002)
  }

  test("to_apfu diopside on 6-oxygen and 4-cation bases (test_calc.py:67-81)") {
    for (a <- Seq(
        Convert.toApfu(diopside, nOxygens = Some(6.0)),
        Convert.toApfu(diopside, nCations = Some(4.0)))) {
      val m = row0(a)
      assert(math.abs(m("Si{4+}") - 2.00) < 0.01)
      assert(math.abs(m("Mg{2+}") - 1.00) < 0.01)
      assert(math.abs(m("Ca{2+}") - 1.00) < 0.01)
    }
  }

  test("to_apfu requires exactly one basis (test_calc.py:82-86)") {
    intercept[IllegalArgumentException] { Convert.toApfu(diopside) }
    intercept[IllegalArgumentException] {
      Convert.toApfu(diopside, nOxygens = Some(6.0), nCations = Some(4.0))
    }
  }

  test("to_apfu sanidine on 8 oxygens (test_calc.py:88-92)") {
    val m = row0(Convert.toApfu(sanidine, nOxygens = Some(8.0)))
    assert(math.abs(m("Si{4+}") - 3.00) < 0.01)
    assert(math.abs(m("Al{3+}") - 1.00) < 0.01)
    assert(math.abs(m("K{+}") - 1.00) < 0.01)
  }

  test("to_apfu from moles equals to_apfu from wt% (test_calc.py:94-98)") {
    val fromWt = row0(Convert.toApfu(diopside, nOxygens = Some(6.0)))
    val fromMoles = row0(Convert.toApfu(
      Convert.toMoles(diopside), nOxygens = Some(6.0), units = Units.Moles))
    fromWt.foreach { case (k, v) => assert(math.abs(fromMoles(k) - v) < 1e-9, k) }
  }

  test("to_apfu emits ion-notation column names only (test_calc.py:100-104)") {
    Convert.toApfu(fePyroxene, nOxygens = Some(6.0)).columns.foreach { c =>
      assert(c.contains("{") && c.contains("}"), s"expected ion name, got $c")
    }
  }

  test("normalize sums to 100 (test_calc.py:107-111)") {
    assert(math.abs(row0(Convert.normalize(fePyroxene)).values.sum - 100.0) < 1e-9)
  }

  for ((elName, fixtureName, nOxy, ideal, lowIon, highIon) <- Seq(
      ("Fe", "fe_pyroxene", 6.0, 4.0, "Fe{2+}", "Fe{3+}"),
      ("Mn", "mn_garnet", 12.0, 8.0, "Mn{2+}", "Mn{3+}"),
      ("Ti", "ti_rutile", 6.0, 4.0, "Ti{4+}", "Ti{3+}"));
      method <- Seq("droop", "schumacher")) {
    test(s"split_valence $method $elName on $fixtureName (test_calc.py:113-168)") {
      val base = elName match {
        case "Fe" => fePyroxene
        case "Mn" => mnGarnet
        case _ => tiRutile
      }
      val apfu = Convert.toApfu(base, nOxygens = Some(nOxy))
      val split = Valence.splitValence(
        apfu, apfu.columns.toSeq, elName, method, nOxy, ideal)
      val m = row0(split)
      assert(m.contains(lowIon) && m.contains(highIon))
      assert(m(lowIon) >= 0.0 && m(highIon) >= 0.0)
    }
  }

  test("split_valence rejects unknown element and method (test_calc.py:170-179)") {
    val apfu = Convert.toApfu(fePyroxene, nOxygens = Some(6.0))
    intercept[IllegalArgumentException] {
      Valence.splitValence(apfu, apfu.columns.toSeq, "X", "droop", 6.0, 4.0)
    }
    intercept[IllegalArgumentException] {
      Valence.splitValence(apfu, apfu.columns.toSeq, "Fe", "bad", 6.0, 4.0)
    }
  }

  test("oxidize_moles: split conserves FeO-equivalent iron (test_calc.py:182-195)") {
    val moles = Convert.toMoles(fePyroxene)
    val vals = moles.columns.toSeq
    val totalFeo = row0(moles)("FeO")
    val r = row0(Convert.oxidizeMoles(moles, lit(0.05), vals))
    assert(r("FeO") >= 0 && r("Fe2O3") >= 0)
    assert(math.abs(r("FeO") + 2.0 * r("Fe2O3") - totalFeo) < 1e-12)
    assert(math.abs(r("Fe2O3") - 0.000876) < 0.0001)
  }

  test("oxidize_moles: zero excess yields zero Fe2O3 (test_calc.py:197-202)") {
    val moles = Convert.toMoles(fePyroxene)
    val r = row0(Convert.oxidizeMoles(moles, lit(0.0), moles.columns.toSeq))
    assert(math.abs(r("Fe2O3")) < 1e-15)
  }

  test("oxidize_moles: large excess clips at total FeO (test_calc.py:204-211)") {
    val moles = Convert.toMoles(fePyroxene)
    val m = row0(moles)
    val oMax = m("FeO") / (2.0 * m.values.sum / 100.0)
    val r = row0(Convert.oxidizeMoles(moles, lit(oMax), moles.columns.toSeq))
    assert(math.abs(r("FeO")) < 1e-12)
    assert(math.abs(r("Fe2O3") - m("FeO") / 2.0) < 0.0001)
  }

  test("oxidize_moles is idempotent (test_calc.py:213-217)") {
    val moles = Convert.toMoles(fePyroxene)
    val first = Convert.oxidizeMoles(moles, lit(0.05), moles.columns.toSeq)
    val second = Convert.oxidizeMoles(first, lit(0.05), first.columns.toSeq)
    val a = row0(first); val b = row0(second)
    a.foreach { case (k, v) => assert(math.abs(b(k) - v) < 1e-12, k) }
  }

  test("oxidize_moles: no iron passes through unchanged (test_calc.py:228-231)") {
    val r = row0(Convert.oxidizeMoles(diopside, lit(0.05), diopside.columns.toSeq))
    val orig = row0(diopside)
    assert(r == orig)
  }

  test("feo_to_fe2o3: converts and drops FeO (test_calc.py:250-257)") {
    val df = dbl("SiO2", "FeO")(Seq(50.0, 10.0))
    val r = row0(Convert.feoToFe2o3(df))
    assert(!r.contains("FeO"))
    // 10 / MW(FeO) * 0.5 * MW(Fe2O3) = 10 * 1.11134... wait: factor ~1.1113
    assert(math.abs(r("Fe2O3") - 10.0 / 71.844 * 0.5 * 159.687) < 1e-9)
  }

  test("feo_to_fe2o3 merges with existing Fe2O3; no-iron passthrough (test_calc.py:259-270)") {
    val df = dbl("SiO2", "FeO", "Fe2O3")(Seq(50.0, 10.0, 2.0))
    val r = row0(Convert.feoToFe2o3(df))
    assert(math.abs(r("Fe2O3") - (2.0 + 10.0 / 71.844 * 0.5 * 159.687)) < 1e-9)
    val noFe = dbl("SiO2", "MgO")(Seq(50.0, 10.0))
    assert(row0(Convert.feoToFe2o3(noFe)) == row0(noFe))
  }

  test("fe2o3_to_feo: converts, merges, passthrough (test_calc.py:279-304)") {
    val df = dbl("SiO2", "Fe2O3")(Seq(50.0, 10.0))
    val r = row0(Convert.fe2o3ToFeo(df))
    assert(!r.contains("Fe2O3"))
    assert(math.abs(r("FeO") - 10.0 / 159.687 * 2.0 * 71.844) < 1e-9)
    val merged = row0(Convert.fe2o3ToFeo(dbl("FeO", "Fe2O3")(Seq(5.0, 10.0))))
    assert(math.abs(merged("FeO") - (5.0 + 10.0 / 159.687 * 2.0 * 71.844)) < 1e-9)
    val noFe = dbl("SiO2", "MgO")(Seq(50.0, 10.0))
    assert(row0(Convert.fe2o3ToFeo(noFe)) == row0(noFe))
  }

  test("reduce_moles: 1 Fe2O3 mole -> 2 FeO moles (test_calc.py:307-331)") {
    val df = dbl("SiO2", "Fe2O3")(Seq(0.8, 0.1))
    val r = row0(Convert.reduceMoles(df))
    assert(!r.contains("Fe2O3") && math.abs(r("FeO") - 0.2) < 1e-12)
    val merged = row0(Convert.reduceMoles(dbl("FeO", "Fe2O3")(Seq(0.05, 0.1))))
    assert(math.abs(merged("FeO") - 0.25) < 1e-12)
    val noFe = dbl("SiO2", "MgO")(Seq(0.8, 0.2))
    assert(row0(Convert.reduceMoles(noFe)) == row0(noFe))
  }

  test("from_apfu restores diopside wt% on the oxygen basis (test_calc.py:351-376)") {
    val apfu = Convert.toApfu(diopside, nOxygens = Some(6.0))
    // proportions are restored; absolute scale needs the analytical total
    val back = row0(Convert.fromApfu(apfu, nOxygens = Some(6.0)))
    val orig = row0(diopside)
    val scale = orig("SiO2") / back("SiO2")
    Seq("MgO", "CaO").foreach { c =>
      assert(math.abs(back(c) * scale - orig(c)) < 1e-6, c)
    }
    // and with the total carried, the round trip is exact
    val total = orig.values.sum
    val exact = row0(Convert.fromApfu(apfu, nOxygens = Some(6.0),
      total = Some(lit(total))))
    orig.foreach { case (k, v) => assert(math.abs(exact(k) - v) < 1e-9, k) }
  }

  test("from_apfu on the cation basis round-trips sanidine (test_calc.py:357-370)") {
    val apfu = Convert.toApfu(sanidine, nCations = Some(5.0))
    val orig = row0(sanidine)
    val exact = row0(Convert.fromApfu(apfu, nCations = Some(5.0),
      total = Some(lit(orig.values.sum))))
    orig.foreach { case (k, v) => assert(math.abs(exact(k) - v) < 1e-9, k) }
  }

  test("molecular weights over a column list (test_calc.py:234-247)") {
    import graft.chem.Chem
    val expected = Map("SiO2" -> 60.084, "MgO" -> 40.304, "CaO" -> 56.077,
      "FeO" -> 71.844, "Al2O3" -> 101.960, "Na2O" -> 61.979)
    expected.foreach { case (c, v) => assert(math.abs(Chem.mw(c) - v) < 0.01, c) }
  }

  test("convert dispatcher: wt -> apfu -> moles -> wt round trip (test_calc.py:393-507)") {
    val pf = PetroFrame.clean(diopside, carry = Nil)
    val orig = row0(pf.df)
    // wt -> apfu (6 oxygens) -> moles -> wt, all through the dispatcher
    val rt = pf.convert(Units.Apfu, nOxy = Some(6.0))
      .convert(Units.Moles).convert(Units.WtPct)
    val back = row0(rt.df.drop(PetroFrame.TotalCol))
    orig.foreach { case (k, v) => assert(math.abs(back(k) - v) < 1e-6, k) }
    // same-unit convert is identity
    val same = pf.convert(Units.WtPct)
    assert(row0(same.df) == orig)
  }

  test("from_apfu requires exactly one basis (test_calc.py:377-382)") {
    val apfu = Convert.toApfu(diopside, nOxygens = Some(6.0))
    intercept[IllegalArgumentException] { Convert.fromApfu(apfu) }
    intercept[IllegalArgumentException] {
      Convert.fromApfu(apfu, nOxygens = Some(6.0), nCations = Some(4.0))
    }
  }
}
