package graft.petro

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.chem.Chem

/** Parity port of the reference single-column (Series accessor) tests
  * (reference: tests/test_series.py). The Series accessor's per-column
  * metadata is [[Chem]] here; the column arithmetic is the same
  * expression [[Convert]] applies frame-wide. */
class SeriesParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("is_oxide on a named column (test_series.py:11-18)") {
    assert(Chem.isOxide("SiO2"))
    assert(!Chem.isOxide("label"))
  }

  test("element of a named column (test_series.py:21-32)") {
    assert(Chem.elementOf("SiO2") == "Si")
    assert(Chem.elementOf("FeO") == "Fe")
    // unknown name -> no element (accessor returns None)
    assert(Chem.elementOf("total") == "")
  }

  test("molecular weight of a named column (test_series.py:35-42)") {
    assert(math.abs(Chem.mw("SiO2") - 60.084) < 0.01)
    assert(!Chem.isFormula("total"), "mw undefined for non-formula names")
  }

  test("to_mole: wt% / MW (test_series.py:45-49)") {
    val out = Seq(55.49).toDF("SiO2")
      .select((col("SiO2") / Chem.mw("SiO2")).as("m"))
      .collect()(0).getDouble(0)
    assert(math.abs(out - 0.9235) < 0.001)
  }

  test("to_cation: diopside Si APFU from oxygen basis (test_series.py:52-58)") {
    // APFU = wt%/MW * cations * (n_oxygens / total_oxygens)
    val out = Seq(55.49).toDF("SiO2")
      .select((col("SiO2") / Chem.mw("SiO2") * Chem.cationsPer("SiO2")
        * (lit(6.0) / lit(2.7706))).as("apfu"))
      .collect()(0).getDouble(0)
    assert(math.abs(out - 2.00) < 0.02)
  }
}
