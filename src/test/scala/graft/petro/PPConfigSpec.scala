package graft.petro

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** PPConfig parity (reference: tests/test_config.py — defaults,
  * mutation, reset) plus the documented divergence: this engine reads
  * the config at CALL time, not at function-definition time. */
class PPConfigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("defaults match the reference (test_config.py:7-21)") {
    PPConfig.reset()
    assert(PPConfig.defaultSystem == "MnNCKFMASHTO")
    assert(PPConfig.defaultOxygen == 0.01)
    assert(PPConfig.defaultH2O == -1.0)
    assert(PPConfig.defaultDb == "mp")
    assert(PPConfig.defaultSysIn == "mol")
  }

  test("mutation + reset restores every default (test_config.py:24-62)") {
    PPConfig.defaultSystem = "KFMASH"
    PPConfig.defaultOxygen = 0.9
    PPConfig.defaultH2O = 99.0
    PPConfig.defaultDb = "ig"
    PPConfig.defaultSysIn = "wt"
    assert(PPConfig.defaultSystem == "KFMASH" && PPConfig.defaultDb == "ig")
    PPConfig.reset()
    assert(PPConfig.defaultSystem == "MnNCKFMASHTO")
    assert(PPConfig.defaultOxygen == 0.01)
    assert(PPConfig.defaultH2O == -1.0)
    assert(PPConfig.defaultDb == "mp")
    assert(PPConfig.defaultSysIn == "mol")
  }

  test("sinks read the config at call time (documented divergence)") {
    import spark.implicits._
    val df = Seq((55.0, 16.0, 4.0, 6.0, 7.0, 3.0, 2.0, 1.0, 0.1))
      .toDF("SiO2", "Al2O3", "MgO", "FeO", "CaO", "Na2O", "K2O", "TiO2", "MnO")
    PPConfig.reset()
    val before = Thermo.tcBulk(df, labelCol = lit("x"))._1
    PPConfig.defaultSystem = "KFMASH"
    try {
      val after = Thermo.tcBulk(df, labelCol = lit("x"))._1
      // the header lists the system's component columns: MnNCKFMASHTO
      // carries MnO, KFMASH does not
      assert(before.contains("MnO") && !after.contains("MnO"),
        s"sink ignored a config change made after definition: $after")
    } finally PPConfig.reset()
  }
}
