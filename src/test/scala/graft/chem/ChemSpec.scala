package graft.chem

import org.scalatest.funsuite.AnyFunSuite

/** Parity port of the reference core tests
  * (reference: tests/test_core.py). */
class ChemSpec extends AnyFunSuite {
  import Chem._

  test("is_oxide") {
    assert(isOxide("SiO2")); assert(isOxide("FeO")); assert(isOxide("Al2O3"))
    assert(isOxide("H2O")); assert(isOxide("P2O5")); assert(isOxide("CO2"))
    assert(isOxide("Y2O3")); assert(isOxide("ZnO")); assert(isOxide("Cr2O3"))
    assert(!isOxide("label")); assert(!isOxide("total")); assert(!isOxide("FeO*"))
    assert(!isOxide("Mineral")); assert(!isOxide("Sample"))
    assert(!isOxide("F")); assert(!isOxide("Cl")) // formulas but not oxides
  }

  test("is_formula") {
    assert(isFormula("F")); assert(isFormula("Cl")); assert(isFormula("S"))
    assert(isFormula("Fe{2+}")); assert(isFormula("Na{+}"))
    assert(!isFormula("Label")); assert(!isFormula("Total"))
    assert(!isFormula("Analysis_ID")); assert(!isFormula("Intrusion"))
    assert(!isFormula("Na2O+K2O")); assert(!isFormula("Mg#"))
    assert(!isFormula("A/CNK")); assert(!isFormula(""))
  }

  test("parenthesized formulas (fluorapatite)") {
    val f = parseFormula("Ca5(PO4)3F").get
    assert(f.atoms("Ca") == 5.0); assert(f.atoms("P") == 3.0)
    assert(f.atoms("O") == 12.0); assert(f.atoms("F") == 1.0)
  }

  test("element_of / cations_per / oxygens_per") {
    assert(elementOf("SiO2") == "Si"); assert(elementOf("Fe2O3") == "Fe")
    assert(elementOf("Al2O3") == "Al"); assert(elementOf("Na2O") == "Na")
    assert(cationsPer("SiO2") == 1.0 && oxygensPer("SiO2") == 2.0)
    assert(cationsPer("Al2O3") == 2.0 && oxygensPer("Al2O3") == 3.0)
    assert(cationsPer("FeO") == 1.0 && oxygensPer("FeO") == 1.0)
  }

  test("MW matches periodictable within 0.01") {
    assert(math.abs(mw("SiO2") - 60.084) < 0.01)
    assert(math.abs(mw("FeO") - 71.844) < 0.01)
    assert(math.abs(mw("Al2O3") - 101.960) < 0.01)
    assert(math.abs(mw("MgO") - 40.304) < 0.01)
    assert(math.abs(mw("CaO") - 56.077) < 0.01)
    assert(math.abs(mw("Na2O") - 61.979) < 0.01)
    assert(math.abs(mw("K2O") - 94.196) < 0.01)
    assert(math.abs(mw("P2O5") - 141.944) < 0.01)
    assert(math.abs(mw("TiO2") - 79.865) < 0.01)
    assert(math.abs(mw("Fe2O3") - 159.687) < 0.01)
  }

  test("ion name formatting") {
    assert(ionName("Fe", 2) == "Fe{2+}"); assert(ionName("Fe", 3) == "Fe{3+}")
    assert(ionName("Si", 4) == "Si{4+}"); assert(ionName("Na", 1) == "Na{+}")
    assert(ionName("O", -2) == "O{2-}")
  }

  test("ion parsing") {
    assert(parseIon("Fe{2+}").contains(("Fe", 2)))
    assert(parseIon("Fe{3+}").contains(("Fe", 3)))
    assert(parseIon("Si{4+}").contains(("Si", 4)))
    assert(parseIon("Na{+}").contains(("Na", 1)))
    assert(parseIon("O{2-}").contains(("O", -2)))
    assert(parseIon("FeO").isEmpty)
    assert(parseIon("label").isEmpty)
  }

  test("ion to oxide") {
    assert(ionToOxide("Fe", 2) == "FeO"); assert(ionToOxide("Fe", 3) == "Fe2O3")
    assert(ionToOxide("Si", 4) == "SiO2"); assert(ionToOxide("Na", 1) == "Na2O")
    assert(ionToOxide("P", 5) == "P2O5"); assert(ionToOxide("Ti", 4) == "TiO2")
    assert(ionToOxide("Ca", 2) == "CaO"); assert(ionToOxide("Al", 3) == "Al2O3")
  }

  test("oxide to ion col") {
    assert(oxideToIonCol("SiO2") == "Si{4+}")
    assert(oxideToIonCol("Fe2O3") == "Fe{3+}")
    assert(oxideToIonCol("FeO") == "Fe{2+}")
    assert(oxideToIonCol("Na2O") == "Na{+}")
    assert(oxideToIonCol("K2O") == "K{+}")
    assert(oxideToIonCol("P2O5") == "P{5+}")
    assert(oxideToIonCol("H2O") == "H{+}")
  }

  test("detect_col over oxide and ion spellings") {
    assert(detectCol(Seq("SiO2", "FeO", "MgO"), "Fe") == "FeO")
    assert(detectCol(Seq("Si{4+}", "Fe{2+}", "Mg{2+}"), "Fe") == "Fe{2+}")
    intercept[NoSuchElementException] { detectCol(Seq("SiO2", "MgO"), "Fe") }
  }

  test("aliases") {
    assert(aliases("FeOT") == "FeO"); assert(aliases("H2O+") == "H2O")
    assert(aliases("Fe2O3(T)") == "Fe2O3"); assert(aliases("FeO*") == "FeO")
  }

  test("detect_cols returns every matching spelling in column order") {
    assert(detectCols(Seq("Fe{2+}", "Fe{3+}", "Si{4+}"), "Fe") ==
      Seq("Fe{2+}", "Fe{3+}"))
    assert(detectCols(Seq("FeO", "SiO2"), "Fe") == Seq("FeO"))
  }

  test("canonical oxide column ordering") {
    val cols = Seq("ZnO", "SiO2", "Label", "F", "CaO", "BaO", "Al2O3")
    assert(Chem.sortOxideColumns(cols) ==
      Seq("SiO2", "Al2O3", "CaO", "BaO", "ZnO", "F", "Label"))
  }
}
